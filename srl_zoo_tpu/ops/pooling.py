"""Max-pool backward alternatives — measured, NOT enabled.

VERDICT r1 flagged select-and-scatter (max-pool backward) at 13.9% of the
cached train step and proposed two semantics-preserving replacements. Both
were built and measured on the real chip (bs 512, 112x112x64 bf16, the hot
pool of BASELINE config 1, relu+pool fwd+bwd, device_get-fenced, 2026-08-16):

  * XLA ``nn.max_pool`` (select-and-scatter backward):   **18.6 ms**
  * ``max_pool_tree`` (9 strided slices + maximum chain;
    backward = dense selects + pad-adds):                 65.4 ms  (3.5x worse)
  * ``max_pool_argmax`` (custom_vjp: argmax cached in
    forward, one-hot scatter via lax.pad in backward):    61.9 ms  (3.3x worse)

Why they lose: both alternatives materialize ~9 full-resolution
intermediates (the window stack / the per-offset gradient planes) in a step
that is already HBM-bandwidth-bound; select-and-scatter's single fused pass
reads x and writes the gradient once, which is within ~2x of the traffic
roof. The models therefore keep ``nn.max_pool``. These implementations are
retained as verified references (forward bit-identical to ``nn.max_pool``,
see tests/test_ops.py) in case a future geometry changes the calculus.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _same_pads(size: int, window: int, stride: int):
    out = -(-size // stride)
    pad = max((out - 1) * stride + window - size, 0)
    return out, (pad // 2, pad - pad // 2)


def max_pool_tree(x: jnp.ndarray, window=(3, 3), strides=(2, 2),
                  padding="SAME") -> jnp.ndarray:
    """Max pool as a chain of strided-slice maximums. Forward bit-identical
    to ``flax.linen.max_pool``; backward avoids select-and-scatter (dense
    selects + pad-adds) but measured 3.5x SLOWER — see module docstring."""
    wh, ww = window
    sh, sw = strides
    H, W = x.shape[1], x.shape[2]
    if padding == "SAME":
        oh, pad_h = _same_pads(H, wh, sh)
        ow, pad_w = _same_pads(W, ww, sw)
    else:
        pad_h, pad_w = padding
        oh = (H + pad_h[0] + pad_h[1] - wh) // sh + 1
        ow = (W + pad_w[0] + pad_w[1] - ww) // sw + 1
    neg = jnp.finfo(x.dtype).min
    xp = jnp.pad(x, ((0, 0), pad_h, pad_w, (0, 0)), constant_values=neg)
    out = None
    for dy in range(wh):
        for dx in range(ww):
            s = jax.lax.slice(
                xp, (0, dy, dx, 0),
                (xp.shape[0], dy + (oh - 1) * sh + 1,
                 dx + (ow - 1) * sw + 1, xp.shape[3]),
                (1, sh, sw, 1))
            out = s if out is None else jnp.maximum(out, s)
    return out


@jax.custom_vjp
def max_pool_argmax(x: jnp.ndarray) -> jnp.ndarray:
    """3x3/2 SAME max pool with argmax indices cached in the forward pass and
    a one-hot lax.pad scatter in the backward. Measured 3.3x slower than
    XLA's select-and-scatter — see module docstring."""
    return _mpa_fwd(x)[0]


def _mpa_windows(xp, oh, ow):
    views = []
    for dy in range(3):
        for dx in range(3):
            views.append(jax.lax.slice(
                xp, (0, dy, dx, 0),
                (xp.shape[0], dy + (oh - 1) * 2 + 1,
                 dx + (ow - 1) * 2 + 1, xp.shape[3]),
                (1, 2, 2, 1)))
    return jnp.stack(views, axis=-1)


def _mpa_fwd(x):
    H, W = x.shape[1], x.shape[2]
    oh, pad_h = _same_pads(H, 3, 2)
    ow, pad_w = _same_pads(W, 3, 2)
    neg = jnp.finfo(x.dtype).min
    xp = jnp.pad(x, ((0, 0), pad_h, pad_w, (0, 0)), constant_values=neg)
    w = _mpa_windows(xp, oh, ow)
    idx = jnp.argmax(w, axis=-1).astype(jnp.int8)
    return jnp.max(w, axis=-1), (idx, H, W)


def _mpa_bwd(res, g):
    idx, H, W = res
    oh, pad_h = _same_pads(H, 3, 2)
    ow, pad_w = _same_pads(W, 3, 2)
    Hp, Wp = H + sum(pad_h), W + sum(pad_w)
    total = None
    k = 0
    for dy in range(3):
        for dx in range(3):
            contrib = jnp.where(idx == k, g, 0)
            # transpose of the strided slice: interior-pad by the stride,
            # offset by (dy, dx) inside the padded frame
            plane = jax.lax.pad(
                contrib, jnp.array(0, g.dtype),
                ((0, 0, 0),
                 (dy, Hp - (dy + (oh - 1) * 2 + 1), 1),
                 (dx, Wp - (dx + (ow - 1) * 2 + 1), 1),
                 (0, 0, 0)))
            total = plane if total is None else total + plane
            k += 1
    return (jax.lax.slice(
        total, (0, pad_h[0], pad_w[0], 0),
        (total.shape[0], pad_h[0] + H, pad_w[0] + W, total.shape[3])),)


max_pool_argmax.defvjp(_mpa_fwd, _mpa_bwd)
