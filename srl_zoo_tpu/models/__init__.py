"""Model zoo (Flax): encoders, decoders, dynamics heads, composite module.

Reference layer L2 (SURVEY.md §2.7/§2.8): models/models.py (CustomCNN, ResNet
encoder, MLP, linear), models/autoencoders.py, models/vae.py,
models/forward_inverse.py, models/priors.py (discriminator),
models/triplet.py, models/modules.py (SRLModules / SRLModulesSplit).

All modules are NHWC (TPU-native layout); parameters live in float32 with an
optional bfloat16 compute dtype for the MXU.
"""

from srl_zoo_tpu.models.encoders import (  # noqa: F401
    CustomCNN, DenseEncoder, LinearEncoder, make_encoder)
from srl_zoo_tpu.models.resnet import ResNet18  # noqa: F401
from srl_zoo_tpu.models.decoders import CNNDecoder, DenseDecoder  # noqa: F401
from srl_zoo_tpu.models.heads import (  # noqa: F401
    ForwardModel, InverseModel, RewardModel, Discriminator)
from srl_zoo_tpu.models.srl_modules import SRLModules  # noqa: F401
