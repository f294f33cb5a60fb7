"""TPU-native compute ops: resize, crop-resize, NMS, box algebra, temporal scan."""

from truely_tpu.ops.temporal import (  # noqa: F401
    temporal_consistency,
    TemporalResult,
    TemporalState,
    init_temporal_state,
    resettable_run_length,
    weighted_score,
)
from truely_tpu.ops.resize import (  # noqa: F401
    resize_area,
    resize_bilinear,
    crop_resize_area,
    crop_resize_bilinear,
    integral_image,
)
from truely_tpu.ops.boxes import (  # noqa: F401
    bbreg,
    rerec,
    clip_boxes,
    pad_crop_bounds,
    box_area,
    iou_matrix,
)
from truely_tpu.ops.nms import (  # noqa: F401
    nms_masked,
    nms_masked_batch,
    topk_select,
)

# Pallas variants (TPU-compiled; interpret=True runs anywhere) are imported
# lazily by their users to keep CPU-only imports light:
#   truely_tpu.ops.nms_pallas.nms_masked_batch_pallas
#   truely_tpu.ops.crop_pallas.crop_resize_bilinear_pallas
