"""Device-mesh parallelism (the rebuild's one first-class scaling strategy).

The reference is single-process, single-device (SURVEY.md §2.10 — no
DP/TP/PP, no comm backend). Here training is data-parallel over a 1-D
``jax.sharding.Mesh``: the batch is sharded over the 'data' axis, params are
replicated, and XLA inserts the gradient all-reduce over ICI. Multi-host
(DCN) attaches via ``jax.distributed.initialize`` + per-host data feeding.
There is nothing to shard but the batch at this model scale (<= ResNet-18),
so TP/PP/SP/EP are intentionally out of scope.
"""

from srl_zoo_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding, make_mesh, replicated_sharding, shard_batch,
    initialize_distributed)
