"""Mesh-sharded HBM frame store: 8x cache capacity on an 8-chip mesh.

The default device cache replicates the frame store on every chip
(data/device_cache.py) — simple, zero-collective gathers, but it wastes
(d-1)/d of aggregate HBM on a d-chip mesh. This module shards the store's
leading (frame) axis over the data mesh and serves arbitrary-index batch
gathers with one reduce-scatter:

  1. all_gather the per-device index shards -> every device sees all B
     indices (B ints — negligible),
  2. each device gathers the rows it OWNS (one jnp.take on its local shard,
     zeros elsewhere; every global index has exactly one owner),
  3. psum_scatter over the batch axis sums the one-hot contributions and
     leaves each device exactly its B/d output rows.

Communication: each batch row crosses ICI once (B*H*W*C bytes
reduce-scattered) — e.g. a 512x224x224x3 uint8 batch is 77 MB over >100 GB/s
ICI ≈ sub-ms, vs 8x the HBM capacity. The TPU-native trade (SURVEY.md §2.10:
lay out shardings so collectives ride ICI).

Single-device meshes degenerate to a plain local take (no collectives).
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from srl_zoo_tpu.parallel.mesh import DATA_AXIS


def shard_frames(frames: np.ndarray, mesh: Mesh) -> jax.Array:
    """Upload a frame store sharded over the mesh's data axis (leading dim
    zero-padded to a multiple of the device count)."""
    n_dev = mesh.devices.size
    n = frames.shape[0]
    pad = (-n) % n_dev
    if pad:
        frames = np.concatenate(
            [frames, np.zeros((pad,) + frames.shape[1:], frames.dtype)])
    return jax.device_put(np.ascontiguousarray(frames),
                          NamedSharding(mesh, P(DATA_AXIS)))


def gather_sharded(frames: jax.Array, idx: jax.Array, mesh: Mesh
                   ) -> jax.Array:
    """Gather ``frames[idx]`` from a store sharded over the data axis.

    ``idx`` is (B,) int32 sharded (or shardable) over the data axis; returns
    (B, ...) rows sharded the same way. Works under jit on any mesh size.
    """
    if mesh.devices.size == 1:
        return jnp.take(frames, idx, axis=0)

    n_local = frames.shape[0] // mesh.devices.size

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(DATA_AXIS), P(DATA_AXIS)),
             out_specs=P(DATA_AXIS))
    def _gather(local_frames, local_idx):
        all_idx = jax.lax.all_gather(local_idx, DATA_AXIS, tiled=True)
        lo = jax.lax.axis_index(DATA_AXIS) * n_local
        rel = all_idx - lo
        owned = (rel >= 0) & (rel < n_local)
        rows = jnp.take(local_frames, jnp.clip(rel, 0, n_local - 1), axis=0)
        expand = (slice(None),) + (None,) * (rows.ndim - 1)
        contrib = jnp.where(owned[expand], rows,
                            jnp.zeros((), rows.dtype))
        return jax.lax.psum_scatter(contrib, DATA_AXIS,
                                    scatter_dimension=0, tiled=True)

    return _gather(frames, idx)


def build_sharded_cache(dataset, mesh: Mesh, needs_view2: bool
                        ) -> Dict[str, jax.Array]:
    """Sharded-store variant of device_cache.build_cache: the HBM budget
    becomes mesh-aggregate instead of per-chip."""
    cache = {"frames": shard_frames(np.asarray(dataset.frames), mesh)}
    if needs_view2:
        cache["frames_2"] = shard_frames(np.asarray(dataset.frames_2), mesh)
    return cache
