"""The jit-compiled batched detector pipeline."""

from truely_tpu.pipeline.pyramid import pyramid_schedule  # noqa: F401
from truely_tpu.pipeline.mtcnn import detect_faces, MTCNNParams  # noqa: F401
from truely_tpu.pipeline.detector import Detector, VideoAnalysis  # noqa: F401
