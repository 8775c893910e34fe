"""Loss zoo (reference: losses/losses.py + LossManager).

Pure functions over model outputs and batch tensors; the registry assembles
the weighted total inside the single jitted train step.
"""

from srl_zoo_tpu.losses import functions  # noqa: F401
from srl_zoo_tpu.losses.registry import compute_total_loss  # noqa: F401
