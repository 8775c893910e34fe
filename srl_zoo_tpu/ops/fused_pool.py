"""Fused ReLU + 3x3/2 max-pool with a Pallas backward (no select-and-scatter).

**Status: measured, NOT enabled — the fifth and final select-and-scatter
attack; XLA keeps winning the total.** Measured on the real v5e chip
(2026-08-16, 25 async dispatches per device_get fence, null RTT subtracted):

    geometry (bf16)            XLA fwd  Pallas fwd | XLA fwd+bwd  Pallas
    512x112x112x64 'SAME'       1.63      5.92     |    9.85       11.07
    512x 28x 28x64 'SAME'       ~0.2      ~0.4     |    ~0.6        ~0.4 (noise)
    256x112x112x64 (1,1) pads   0.82      2.96     |    4.76        5.63

The *backward alone* WINS 1.6x (5.15 ms vs XLA's select-and-scatter 8.2 ms
at the hot geometry) — the gather-formulated VJP reading a 0.2 GB int8
argmax plane beats SAS re-reading the 1.47 GB relu plane. But the forward
pays for producing that argmax: the v5e VPU has no 16-bit compares (bf16
`cmpf` and i16 `cmpi` both fail to legalize), so any argmax bookkeeping
forces a 32-bit relayout of the whole input that XLA's reduce_window forward
never does. Best total 11.07 vs 9.85 ms -> the models keep
nn.relu + nn.max_pool, and this op stays a correctness-tested reference
(exact forward AND exact tie-routing parity, verified compiled-on-TPU).

What it computes (reference: models/models.py CustomCNN's max-pool after
ReLU; upstream is torch — this is the TPU-native fusion of the same math):

    y = max_pool_3x3_stride2(relu(x))        # NHWC, static pads

plus an int8 argmax plane (window-raster first-match; sentinel 9 when the
window max is <= 0, i.e. relu clamps it). The custom VJP routes the cotangent
straight to the argmax position — exactly the gradient of
``max_pool(relu(x))``: a positive window max implies the selected position
has x > 0 (relu passes the gradient); a non-positive max means relu kills it.

Mosaic techniques established here (kept because they transfer):

* **Packed parity layout** — Mosaic cannot stride-2-slice a VMEM vector, so
  (B, H, W, C) is bitcast (pure row-major reinterpretation, free in XLA) to
  (B, H/2, 2, W/2, 2C): every 3x3-window view becomes a unit-stride slice
  (row parity = an axis index, column parity = a lane-half select) and the
  minor dim doubles to 128, one full VPU lane width.
* **Offset-0 slice discipline** — slice-then-pad, one-sided pads: a value
  whose layout carries a non-zero sublane/lane offset forces a relayout in
  every consuming op; pads of lane-sliced values are rejected outright.
* **Bit-packed argmax** — compare+select chains materialize VMEM
  intermediates (2.5-4x slower than max chains, which register-fuse); the
  argmax instead rides in the value: each f32 view ORs `8 - k` into its 15
  zero mantissa LSBs and one plain `maximum` chain returns max and
  raster-first argmax together, exactly (analysis in `_fwd_kernel`).
* **Mask/data tiling must match** — an f32-tiled (8,128) mask cannot select
  int8/bf16-tiled data; convert once at block edges.

HBM traffic per fwd+bwd pair at the hot geometry (512x112x112x64 bf16):

    XLA:    fwd  read x, write relu(x) [SAS operand], write y       ~3.3 GB
    (9.85)  bwd  SAS: read relu(x)+g, write d(relu); relu-bwd pass  ~6.2 GB
    fused:  fwd  read x, write y + idx(int8)                        ~2.0 GB
    (11.07) bwd  read g + idx, write dx                             ~2.0 GB

i.e. the fused pair moves 2.4x less HBM but loses anyway: both kernels are
VPU-bound (the raw DMA pipeline at this geometry is 2.65 ms/direction), so
the step's limiting resource is not what this fusion saves. If a future
geometry (larger C, deeper batch) or a Mosaic release with 16-bit compares
changes that, the backward's 1.6x is waiting.

The kernel covers the geometries the models actually pool (H, W even,
pad_lo in {0,1}, output = H/2 x W/2 — true for 112x112 and 28x28 under both
'SAME' and the ResNet-18 explicit (1,1) padding); anything else (e.g. the
tiny 7x7 third pool, ~6 MB of traffic) falls back to the XLA composition.
Full measurement log in docs/PERF.md.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SENTINEL = 9  # idx value meaning "window max <= 0: relu kills the gradient"


def _out_size(size: int, pad: tuple[int, int]) -> int:
    return (size + pad[0] + pad[1] - 3) // 2 + 1


def _same_pads(size: int) -> tuple[int, int]:
    """3x3/2 'SAME' (lo, hi) pads — delegates to the canonical math in
    ops/pooling (this module's fixed window/stride applied)."""
    from srl_zoo_tpu.ops.pooling import _same_pads as _xla_same_pads
    return _xla_same_pads(size, 3, 2)[1]


def _resolve_pads(h: int, w: int, padding) -> tuple[tuple[int, int], tuple[int, int]]:
    if padding == "SAME":
        return _same_pads(h), _same_pads(w)
    (ph, pw) = padding
    return (int(ph[0]), int(ph[1])), (int(pw[0]), int(pw[1]))


def _packable(h: int, w: int, pads) -> bool:
    return (h % 2 == 0 and w % 2 == 0
            and pads[0][0] in (0, 1) and pads[1][0] in (0, 1)
            and _out_size(h, pads[0]) == h // 2
            and _out_size(w, pads[1]) == w // 2)


def _batch_block(h: int, w: int, c: int, b: int) -> int:
    """Images per grid step: keep the input-plane block around <= ~2 MB."""
    per_image = h * w * c * 2  # bf16 input plane dominates
    bb = max(1, (2 * 1024 * 1024) // per_image)
    while b % bb:
        bb -= 1
    return bb


def _shift_sp(arr, ti, tj, fill):
    """out[m_i, m_j] = arr[m_i + ti, m_j + tj], out-of-range -> fill.

    Slice-THEN-pad: the slice starts at offset <= max(0, t), and the pad
    (a concat) produces a fresh offset-0 layout — padding first would leave
    every consumer operating on offset layouts, which Mosaic realigns with
    a relayout per op (measured). Identity when ti == tj == 0."""
    if ti == 0 and tj == 0:
        return arr
    b, h2, w2, cc = arr.shape
    s = jax.lax.slice(arr, (0, max(0, ti), max(0, tj), 0),
                      (b, h2 + min(0, ti), w2 + min(0, tj), cc))
    return jnp.pad(s, ((0, 0), (max(0, -ti), max(0, ti)),
                       (max(0, -tj), max(0, tj)), (0, 0)),
                   constant_values=fill)


# ---------------------------------------------------------------------------
# forward: y = relu(maxpool(x)), idx = first-match argmax (or sentinel)
# ---------------------------------------------------------------------------

def _fwd_kernel(xq_ref, y_ref, idx_ref, *, pads, c):
    """Max + argmax as ONE pure `maximum` chain via mantissa bit-packing.

    Mosaic register-fuses slice+max chains (measured: a 9-view bf16 max
    chain costs ~0.2 ms over the raw copy at the hot geometry) but compare+
    select pairs — the textbook running-argmax — each materialize a VMEM
    intermediate and relayout (measured 2.5-4x slower). So the argmax rides
    inside the value: every view is bf16 upcast to f32 (15 zero mantissa
    LSBs), and view k ORs `8 - k` into bits 0-3. A plain maximum chain then
    yields both the max (high bits, exact) and the raster-FIRST argmax on
    positive ties (equal values differ only in the packed bits; larger
    packed = smaller k wins). Ties among negatives resolve "wrong", but a
    non-positive window max means relu kills the gradient — the sentinel
    path — so the routed index is never consumed. The +-0.0 and denormal
    edge cases also land in the sentinel. The perturbation (< 2^-19
    relative) cannot flip an inequality between distinct bf16 values
    (>= 2^-8 apart) and vanishes in the f32->bf16 store rounding.
    """
    xq = xq_ref[:]                      # (bb, H2, 2, W2, 2C) packed bf16
    h2, w2 = xq.shape[1], xq.shape[3]
    ph_lo, pw_lo = pads[0][0], pads[1][0]
    # pad the W2 axis once in bf16 (one-sided: slices at sublane offset 0 —
    # non-zero offsets force a relayout on every consuming op), then ONE
    # wholesale f32 convert (each bf16->f32 convert is itself a relayout).
    # The pad value finfo.min has a non-saturated exponent, so the OR below
    # leaves it a valid huge negative (it can never become a NaN).
    xqf = jnp.pad(xq, ((0, 0), (0, 0), (0, 0), (pw_lo, 1 - pw_lo), (0, 0)),
                  constant_values=jnp.asarray(jnp.finfo(xq.dtype).min,
                                              xq.dtype)).astype(jnp.float32)
    xqb = jax.lax.bitcast_convert_type(xqf, jnp.uint32)

    def view(k):
        dy, dx = k // 3, k % 3
        ri, si = (dy - ph_lo) % 2, (dy - ph_lo) // 2   # row parity/shift
        rj, sj = (dx - pw_lo) % 2, (dx - pw_lo) // 2   # lane half/col shift
        lo = max(si, 0)               # row slice clamps; out-of-range rows
        hi = min(si, 0)               # are re-padded below with finfo.min
        s = jax.lax.slice(
            xqb, (0, lo, ri, pw_lo + sj, rj * c),
            (xqb.shape[0], h2 + hi, ri + 1, pw_lo + sj + w2, (rj + 1) * c))
        v = s[:, :, 0] | jnp.uint32(8 - k)
        if lo or hi:
            v = jnp.pad(v, ((0, 0), (-hi, lo), (0, 0), (0, 0)),
                        constant_values=jnp.uint32(0xFF7FFFFF))  # finfo.min
        return jax.lax.bitcast_convert_type(v, jnp.float32)

    m = view(0)
    for k in range(1, 9):
        m = jnp.maximum(m, view(k))
    bits = jax.lax.bitcast_convert_type(m, jnp.uint32)
    kprime = bits & jnp.uint32(15)
    mval = jax.lax.bitcast_convert_type(bits ^ kprime, jnp.float32)
    pos = mval > 0
    y_ref[:] = jnp.where(pos, mval, jnp.asarray(0.0, jnp.float32)
                         ).astype(y_ref.dtype)
    idx_ref[:] = jnp.where(
        pos, jnp.uint32(8) - kprime, jnp.uint32(_SENTINEL)).astype(jnp.int8)


# ---------------------------------------------------------------------------
# backward: dx from (g, idx) — gather formulation, parity assembly in VMEM
# ---------------------------------------------------------------------------

def _bwd_kernel(g_ref, idx_ref, dxq_ref, *, pads, c):
    # f32 compute for the same packed-bf16 compare / mask-layout reasons as
    # the forward; contribution sums gain precision over a bf16 accumulate
    g = g_ref[:].astype(jnp.float32)   # (bb, OH, OW, C)
    idx = idx_ref[:].astype(g.dtype)   # one int8->f32 conversion per block
    ph_lo, pw_lo = pads[0][0], pads[1][0]

    # the nine (dy, dx) terms share only four distinct output shifts —
    # shift g/idx once per shift (identity for the zero shift, which covers
    # six of the nine terms), then one compare+select per term; the idx
    # shift fills with -1 so out-of-range never matches a window index
    groups: dict = {}
    for dy in range(3):
        ri, si = (dy - ph_lo) % 2, (dy - ph_lo) // 2
        for dx in range(3):
            rj, sj = (dx - pw_lo) % 2, (dx - pw_lo) // 2
            groups.setdefault((-si, -sj), []).append((3 * dy + dx, ri, rj))

    planes = {}
    for (ti, tj), members in groups.items():
        gs = _shift_sp(g, ti, tj, 0.0)
        ms = _shift_sp(idx, ti, tj, -1.0)
        for k, ri, rj in members:
            contrib = jnp.where(ms == jnp.asarray(k, g.dtype), gs,
                                jnp.asarray(0, g.dtype))
            key = (ri, rj)
            planes[key] = contrib if key not in planes else planes[key] + contrib

    # write each parity plane straight into its packed slot (axis-2 index =
    # row parity, lane half = column parity): Mosaic rejects concatenating
    # vectors whose shifted-slice layouts carry different sublane offsets
    for ri in (0, 1):
        for rj in (0, 1):
            dxq_ref[:, :, ri, :, rj * c:(rj + 1) * c] = (
                planes[(ri, rj)].astype(dxq_ref.dtype))


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------

def _fwd_pallas(x, pads, interpret):
    b, h, w, c = x.shape
    h2, w2 = h // 2, w // 2
    bb = _batch_block(h, w, c, b)
    xq = x.reshape(b, h2, 2, w2, 2 * c)    # row-major bitcast, free
    kern = functools.partial(_fwd_kernel, pads=pads, c=c)
    y, idx = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((b, h2, w2, c), x.dtype),
                   jax.ShapeDtypeStruct((b, h2, w2, c), jnp.int8)),
        grid_spec=pl.GridSpec(
            grid=(b // bb,),
            in_specs=[pl.BlockSpec((bb, h2, 2, w2, 2 * c),
                                   lambda i: (i, 0, 0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=(
                pl.BlockSpec((bb, h2, w2, c), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bb, h2, w2, c), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)),
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * b * h2 * w2 * c,
            bytes_accessed=x.size * x.dtype.itemsize
            + b * h2 * w2 * c * (x.dtype.itemsize + 1),
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(xq)
    return y, idx


def _bwd_pallas(g, idx, x_shape, pads, interpret):
    b, h, w, c = x_shape
    h2, w2 = h // 2, w // 2
    bb = _batch_block(h, w, c, b)
    kern = functools.partial(_bwd_kernel, pads=pads, c=c)
    dxq = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, h2, 2, w2, 2 * c), g.dtype),
        grid_spec=pl.GridSpec(
            grid=(b // bb,),
            in_specs=[
                pl.BlockSpec((bb, h2, w2, c), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bb, h2, w2, c), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((bb, h2, 2, w2, 2 * c),
                                   lambda i: (i, 0, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=40 * b * h2 * w2 * c,
            bytes_accessed=g.size * g.dtype.itemsize + idx.size
            + b * h * w * c * g.dtype.itemsize,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(g, idx)
    return dxq.reshape(b, h, w, c)         # bitcast back


# ---------------------------------------------------------------------------
# public op
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _relu_max_pool_fused(x, pads, interpret):
    return _fwd_pallas(x, pads, interpret)[0]


def _rmp_fwd(x, pads, interpret):
    y, idx = _fwd_pallas(x, pads, interpret)
    return y, (idx, x.shape)


def _rmp_bwd(pads, interpret, res, g):
    idx, x_shape = res
    return (_bwd_pallas(g, idx, x_shape, pads, interpret),)


_relu_max_pool_fused.defvjp(_rmp_fwd, _rmp_bwd)


def relu_max_pool_reference(x, padding="SAME"):
    """XLA composition (relu -> max_pool) — exactly what the models compose
    without fusion; the numerics the fused kernel must match, and the
    non-TPU / non-packable execution path."""
    import flax.linen as nn
    return nn.max_pool(nn.relu(x), (3, 3), strides=(2, 2), padding=padding)


def relu_max_pool(x, padding="SAME", use_pallas: bool | None = None,
                  interpret: bool = False):
    """relu followed by 3x3 stride-2 max pool, NHWC.

    ``use_pallas=None`` resolves to the XLA composition — the measured
    winner at every model geometry (module docstring). The fused Pallas
    kernel is explicit opt-in (``use_pallas=True``) and requires a packable
    geometry; it is numerically identical: tested, including tie gradients
    and the relu-clamped no-gradient case.
    """
    pads = _resolve_pads(x.shape[1], x.shape[2], padding)
    if use_pallas is None:
        use_pallas = False  # XLA wins the fwd+bwd total — measured, PERF.md
    # the bit-packed argmax needs the >= 13 zero mantissa LSBs of a 16-bit
    # float upcast to f32; raw f32 inputs would be corrupted by the OR
    if (x.dtype not in (jnp.bfloat16, jnp.float16)
            or not _packable(x.shape[1], x.shape[2], pads)
            or not (use_pallas or interpret)):
        return relu_max_pool_reference(x, padding)
    return _relu_max_pool_fused(x, pads, interpret)
