"""Device ops: fused preprocessing and Pallas TPU kernels.

The reference has no native/custom ops (SURVEY.md §2.9); this package is the
rebuild's performance layer — on-device normalization fused into the train
step, device-side DAE occlusion, and a tiled Pallas pairwise-distance kernel
for KNN evaluation and priors-style losses.
"""

from srl_zoo_tpu.ops.preproc import normalize_images, denormalize_images, occlude  # noqa: F401
from srl_zoo_tpu.ops.pairwise import pairwise_sqdist  # noqa: F401
from srl_zoo_tpu.ops.gather_norm import gather_normalize  # noqa: F401
