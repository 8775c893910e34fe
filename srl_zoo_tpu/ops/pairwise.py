"""Pairwise squared distances: dist2 = |x|^2 + |y|^2 - 2 x.y.

Used by KNN-MSE evaluation (reference: evaluation/knn_images.py via sklearn
NearestNeighbors) and available to priors/triplet losses. For N queries x M
references this is the hot non-conv op in the zoo (tens of thousands of
points at eval time -> 1e8+ distance terms).

Two implementations:
  * XLA (default): one big dot_general on the MXU + fused broadcast adds.
    **Measured on v5e (2026-08-16): 9.4 ms for 20k x 20k x 200 — 36x faster
    than the Pallas tiling below and ~700x faster than sklearn's host
    KD-tree path (6.5 s).** XLA's matmul tiling is already speed-of-light
    here; a hand kernel only adds per-step overhead.
  * Pallas (``use_pallas=True``): explicit (TILE_N, TILE_M) VMEM tiling with
    the full padded feature dim per block. Kept as a correctness-tested
    reference for the tiling pattern (tests run it in interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 256
TILE_M = 256


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pairwise_kernel(x_ref, y_ref, out_ref):
    x = x_ref[:]  # (TILE_N, D)
    y = y_ref[:]  # (TILE_M, D)
    xx = jnp.sum(x * x, axis=1, keepdims=True)            # (TILE_N, 1)
    yy = jnp.sum(y * y, axis=1, keepdims=True)            # (TILE_M, 1)
    # x @ y^T without materializing a transposed y: contract the feature dims.
    xy = jax.lax.dot_general(
        x, y, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)               # (TILE_N, TILE_M) MXU
    d2 = xx + jnp.swapaxes(yy, 0, 1) - 2.0 * xy
    out_ref[:] = jnp.maximum(d2, 0.0)


def _pairwise_pallas(x: jnp.ndarray, y: jnp.ndarray,
                     interpret: bool = False) -> jnp.ndarray:
    n, d = x.shape
    m = y.shape[0]
    npad, mpad, dpad = _round_up(n, TILE_N), _round_up(m, TILE_M), _round_up(d, 128)
    xp = jnp.zeros((npad, dpad), jnp.float32).at[:n, :d].set(x.astype(jnp.float32))
    yp = jnp.zeros((mpad, dpad), jnp.float32).at[:m, :d].set(y.astype(jnp.float32))

    grid = (npad // TILE_N, mpad // TILE_M)
    out = pl.pallas_call(
        _pairwise_kernel,
        out_shape=jax.ShapeDtypeStruct((npad, mpad), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((TILE_N, dpad), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE_M, dpad), lambda i, j: (j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE_N, TILE_M), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * npad * mpad * dpad + 2 * (npad + mpad) * dpad,
            bytes_accessed=4 * (npad * dpad + mpad * dpad + npad * mpad),
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, yp)
    return out[:n, :m]


def _pairwise_xla(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    xx = jnp.sum(x * x, axis=1, keepdims=True)
    yy = jnp.sum(y * y, axis=1, keepdims=True)
    xy = jax.lax.dot_general(x, y, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    return jnp.maximum(xx + yy.T - 2.0 * xy, 0.0)


@functools.partial(jax.jit, static_argnames=("use_pallas", "interpret"))
def pairwise_sqdist(x: jnp.ndarray, y: jnp.ndarray,
                    use_pallas: bool | None = None,
                    interpret: bool = False) -> jnp.ndarray:
    """(N, D), (M, D) -> (N, M) squared euclidean distances, float32.

    Defaults to the XLA implementation everywhere (measured faster than the
    Pallas tiling — see module docstring); identical math, tested to agree.
    """
    if use_pallas is None:
        use_pallas = False
    if use_pallas or interpret:
        return _pairwise_pallas(x, y, interpret=interpret)
    return _pairwise_xla(x, y)
