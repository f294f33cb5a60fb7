"""The jit-compiled batched detector pipeline."""

from truely_tpu.pipeline.pyramid import pyramid_schedule  # noqa: F401
from truely_tpu.pipeline.mtcnn import detect_faces, MTCNNParams, Detections  # noqa: F401
from truely_tpu.pipeline.detector import Detector, VideoAnalysis, FrameRecord  # noqa: F401
from truely_tpu.pipeline.batch import analyze_videos, BatchVideoResult  # noqa: F401
from truely_tpu.pipeline.streaming import (  # noqa: F401
    MultiFaceStreamEvent, StreamEvent, StreamScheduler,
)
from truely_tpu.pipeline.tracks import (  # noqa: F401
    TrackState, init_track_state, track_step, track_timeline, track_scores,
)
