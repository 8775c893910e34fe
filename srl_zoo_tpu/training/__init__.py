"""Training runtime: functional train step, learner, checkpointing, metrics.

Reference layer L3 (SURVEY.md §2.5): models/learner.py ``SRL4robotics`` +
models/base_learner.py. The per-minibatch Python loop with .backward() becomes
one jit-compiled, donated, mesh-sharded train step.
"""

from srl_zoo_tpu.training.learner import SRL4robotics  # noqa: F401
from srl_zoo_tpu.training.state import TrainState, create_train_state  # noqa: F401
