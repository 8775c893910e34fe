"""Batch gather + normalize for the cached input path, with a Pallas variant.

The cached-mode input path is: gather B frames from the HBM-resident uint8
frame store by index, cast, and normalize to [-1, 1] ("tf" mode). Two
implementations:

  * XLA (default): ``jnp.take`` + fused arithmetic. XLA's dynamic-gather is
    already near-optimal and the normalize fuses into the consumer.
  * Pallas (``use_pallas=True``): one pass driven by scalar-prefetched frame
    indices (pltpu.PrefetchScalarGridSpec) — the pipeline DMAs exactly the
    requested frame HBM->VMEM per grid step and emits normalized floats, so
    the gathered uint8 batch never materializes in HBM.

**Measured decision (v5e, 2026-08-16): the Pallas variant is ~30x SLOWER than
XLA's gather (79 ms vs 2.6 ms for 64x224x224x3)** — a per-frame grid with
(8, F/8) blocks serializes DMAs that XLA's native gather overlaps. It is kept
as a working PrefetchScalarGridSpec reference and a correctness-tested
fallback, NOT wired into the train step; the train step uses the XLA path
(srl_zoo_tpu/training/train_step.py _raw_images), which profiling shows is
not a bottleneck. Custom kernels are for ops XLA schedules badly (see
ops/pairwise.py, which beats host sklearn by using the MXU) — not for ops it
already schedules well.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from srl_zoo_tpu.ops.preproc import normalize_images


def _kernel(idx_ref, frames_ref, out_ref):
    del idx_ref  # consumed by the index_map; the body just normalizes
    # Mosaic has no direct u8->f32 cast; widen through int32
    x = frames_ref[...].astype(jnp.int32).astype(jnp.float32)
    out_ref[...] = x * (2.0 / 255.0) - 1.0


def _gather_norm_pallas(frames_3d: jnp.ndarray, idx: jnp.ndarray,
                        interpret: bool = False) -> jnp.ndarray:
    """frames_3d: (N, 8, F/8) uint8 — the (8, F/8) trailing block satisfies
    the TPU (sublane, lane) = (8, 128) tiling constraint."""
    b = idx.shape[0]
    n, s, l = frames_3d.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, s, l), lambda i, idx_ref: (idx_ref[i], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, s, l), lambda i, idx_ref: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((b, s, l), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(idx.astype(jnp.int32), frames_3d)


@functools.partial(jax.jit,
                   static_argnames=("mode", "use_pallas", "interpret"))
def gather_normalize(frames: jnp.ndarray, idx: jnp.ndarray,
                     mode: str = "tf", use_pallas: bool | None = None,
                     interpret: bool = False) -> jnp.ndarray:
    """frames (N, H, W, C) uint8, idx (B,) int32 -> (B, H, W, C) float32
    normalized. Pallas fused path on TPU for "tf" mode; XLA elsewhere."""
    h, w, c = frames.shape[1:]
    f = h * w * c
    if use_pallas is None:
        use_pallas = False  # XLA gather measured faster — see module docstring
    if (use_pallas or interpret) and mode == "tf" and f % 1024 == 0:
        out = _gather_norm_pallas(
            frames.reshape(frames.shape[0], 8, f // 8), idx,
            interpret=interpret)
        return out.reshape((idx.shape[0], h, w, c))
    return normalize_images(jnp.take(frames, idx, axis=0), mode)
