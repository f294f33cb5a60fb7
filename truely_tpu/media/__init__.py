"""Host-side media: decode, encode, annotation overlay, acquisition."""

from truely_tpu.media.decode import VideoReader, VideoMeta  # noqa: F401
from truely_tpu.media.encode import VideoWriter  # noqa: F401
from truely_tpu.media.overlay import annotate_frame  # noqa: F401
