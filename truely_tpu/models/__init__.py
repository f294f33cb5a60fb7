"""Pure-function JAX models: MTCNN cascade nets, FaceNet embedder, landmark head."""

from truely_tpu.models.mtcnn_nets import (  # noqa: F401
    init_pnet, apply_pnet,
    init_rnet, apply_rnet,
    init_onet, apply_onet,
)
from truely_tpu.models.inception_resnet_v1 import (  # noqa: F401
    init_inception_resnet_v1, apply_inception_resnet_v1,
)
from truely_tpu.models.landmark68 import init_landmark68, apply_landmark68  # noqa: F401
from truely_tpu.models.weights import (  # noqa: F401
    save_params, load_params, convert_torch_state_dict,
)
