"""k-nearest-neighbour indices: fused distance + streaming top-k.

Feeds KNN-MSE evaluation (reference: evaluation/knn_images.py — sklearn
NearestNeighbors.kneighbors). The metric needs only the k smallest-distance
indices per query, yet the obvious TPU path (ops/pairwise.py matmul ->
lax.top_k) materializes the full (Q, N) distance matrix in HBM and runs a
width-N top_k over it — for 100k points that is ~40 GB of distances written
and re-read, plus a sort-like top_k, for a (Q, k) result that fits in L1.

Four implementations, measured on the real chip (numbers in docs/PERF.md
attempt 8; ``pallas_t`` is the winner and knn.py's default on TPU):

* ``full``  — the baseline: pairwise_sqdist + lax.top_k(-d2, k).
* ``blocked`` — pure XLA: lax.scan over reference tiles; per-tile
  lax.top_k (width ``tile`` instead of N) merged into a running (Q, k)
  buffer via a width-2k top_k. Same distance traffic as ``full`` (XLA still
  materializes each (Q, tile) block) but the top_k becomes cheap.
* ``pallas`` — the fused kernel: grid (query_tiles, ref_tiles), one MXU
  block-matmul per (i, j), running best-k kept in VMEM and merged in-place
  with k iterative min-extractions (k is tiny and static; a full sort is
  wasted work). The (TQ, TR) distance block never leaves VMEM, so HBM
  traffic drops from O(Q·N) distances to O(N·D·Q/TQ) operand streaming —
  the kernel's floor is re-reading the reference matrix once per query
  tile.
* ``pallas_t`` — the same fusion with the block matmul emitted TRANSPOSED
  so every extraction reduces across sublanes (the VPU's fast direction)
  instead of lanes. 2.1x the full baseline at N=20k (10.7 vs 22.7 ms) and
  2.8x at N=100k (170 vs 472 ms), measured k=6 D=200 f32; holds k <= 8.

All return identical indices (modulo matmul-precision tie flips — on-chip
agreement with ``full`` measured 1.0 at default precision) — tested against
each other and NumPy in tests/test_ops.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from srl_zoo_tpu.ops.pairwise import pairwise_sqdist

# Lane width of the running best-k buffers; k must stay well under this.
_KP = 128
_BIG = float(jnp.finfo(jnp.float32).max)  # python literal: kernels may close over it


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# full: the pre-attempt-8 baseline
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("k",))
def _topk_full(q: jnp.ndarray, refs: jnp.ndarray, k: int):
    d2 = pairwise_sqdist(q, refs)
    neg, idx = jax.lax.top_k(-d2, k)
    return -neg, idx.astype(jnp.int32)


# ---------------------------------------------------------------------------
# blocked: XLA scan over reference tiles, narrow top_k + running merge
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("k", "tile"))
def _topk_blocked(q: jnp.ndarray, refs: jnp.ndarray, k: int,
                  tile: int = 2048):
    qn, n = q.shape[0], refs.shape[0]
    npad = _round_up(n, tile)
    q = q.astype(jnp.float32)
    refs_p = jnp.full((npad, refs.shape[1]), 0.0, jnp.float32
                      ).at[:n].set(refs.astype(jnp.float32))
    # padded rows must never win: give them +inf distance via the mask below
    tiles = refs_p.reshape(npad // tile, tile, refs.shape[1])
    offs = jnp.arange(npad // tile, dtype=jnp.int32) * tile

    qq = jnp.sum(q * q, axis=1, keepdims=True)

    def body(carry, xs):
        best_d, best_i = carry
        rt, off = xs
        rr = jnp.sum(rt * rt, axis=1)
        xy = jax.lax.dot_general(q, rt, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        d2 = jnp.maximum(qq + rr[None, :] - 2.0 * xy, 0.0)
        col = off + jnp.arange(tile, dtype=jnp.int32)
        d2 = jnp.where(col[None, :] < n, d2, _BIG)
        nd, ni = jax.lax.top_k(-d2, k)
        pool_d = jnp.concatenate([best_d, -nd], axis=1)
        pool_i = jnp.concatenate([best_i, col[ni]], axis=1)
        md, mi = jax.lax.top_k(-pool_d, k)
        best_d = -md
        best_i = jnp.take_along_axis(pool_i, mi, axis=1)
        return (best_d, best_i), None

    init = (jnp.full((qn, k), _BIG), jnp.full((qn, k), -1, jnp.int32))
    (best_d, best_i), _ = jax.lax.scan(body, init, (tiles, offs))
    return best_d, best_i


# ---------------------------------------------------------------------------
# pallas: fused matmul + running best-k, distances never leave VMEM
# ---------------------------------------------------------------------------

def _extract_k(pool_d, pool_i, k, width):
    """k iterative min-extractions from (TQ, width) pools.

    Returns (TQ, k) lists of (value, index) columns in ascending order.
    k is static and tiny (<= ~8) so the unrolled 2-reductions-per-pass loop
    is far cheaper than any sort; argmin is the guide's iota-min trick
    (first matching column wins -> deterministic tie order).
    """
    col = jax.lax.broadcasted_iota(jnp.int32, pool_d.shape, 1)
    out_d, out_i = [], []
    for _ in range(k):
        m = jnp.min(pool_d, axis=1, keepdims=True)          # (TQ, 1)
        is_min = pool_d == m
        a = jnp.min(jnp.where(is_min, col, width), axis=1, keepdims=True)
        sel = col == a
        idx = jnp.min(jnp.where(sel, pool_i, jnp.int32(2 ** 31 - 1)),
                      axis=1, keepdims=True)                 # (TQ, 1)
        out_d.append(m)
        out_i.append(idx)
        pool_d = jnp.where(sel, _BIG, pool_d)
    return out_d, out_i


def _knn_kernel(q_ref, r_ref, qq_ref, rr_ref, od_ref, oi_ref, *, k, n, tr):
    # q_ref/r_ref arrive pre-cast (f32 or bf16); the dot accumulates f32
    # either way (preferred_element_type), so bf16 only loses input mantissa.
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        od_ref[:] = jnp.full(od_ref.shape, _BIG)
        oi_ref[:] = jnp.full(oi_ref.shape, -1, jnp.int32)

    xy = jax.lax.dot_general(
        q_ref[:], r_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                  # (TQ, TR) MXU
    d2 = jnp.maximum(qq_ref[:] + rr_ref[:] - 2.0 * xy, 0.0)
    col = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1) + j * tr
    d2 = jnp.where(col < n, d2, _BIG)                        # mask ref pad

    cd, ci = _extract_k(d2, col, k, d2.shape[1])             # block top-k
    kcol = jax.lax.broadcasted_iota(jnp.int32, (d2.shape[0], _KP), 1)
    cand_d = jnp.full((d2.shape[0], _KP), _BIG)
    cand_i = jnp.full((d2.shape[0], _KP), -1, jnp.int32)
    for s in range(k):
        sel = kcol == s
        cand_d = jnp.where(sel, cd[s], cand_d)
        cand_i = jnp.where(sel, ci[s], cand_i)

    pool_d = jnp.concatenate([od_ref[:], cand_d], axis=1)    # (TQ, 2*_KP)
    pool_i = jnp.concatenate([oi_ref[:], cand_i], axis=1)
    bd, bi = _extract_k(pool_d, pool_i, k, 2 * _KP)
    new_d = jnp.full((d2.shape[0], _KP), _BIG)
    new_i = jnp.full((d2.shape[0], _KP), -1, jnp.int32)
    for s in range(k):
        sel = kcol == s
        new_d = jnp.where(sel, bd[s], new_d)
        new_i = jnp.where(sel, bi[s], new_i)
    od_ref[:] = new_d
    oi_ref[:] = new_i


@functools.partial(jax.jit,
                   static_argnames=("k", "tq", "tr", "compute_dtype",
                                    "interpret"))
def _topk_pallas(q: jnp.ndarray, refs: jnp.ndarray, k: int,
                 tq: int = 512, tr: int = 4096,
                 compute_dtype=jnp.float32,
                 interpret: bool = False):
    qn, d = q.shape
    n = refs.shape[0]
    qpad, npad, dpad = _round_up(qn, tq), _round_up(n, tr), _round_up(d, 128)
    qp = jnp.zeros((qpad, dpad), jnp.float32).at[:qn, :d].set(
        q.astype(jnp.float32))
    rp = jnp.zeros((npad, dpad), jnp.float32).at[:n, :d].set(
        refs.astype(jnp.float32))
    qq = jnp.sum(qp * qp, axis=1, keepdims=True)             # (qpad, 1)
    rr = jnp.sum(rp * rp, axis=1)[None, :]                   # (1, npad)
    qp = qp.astype(compute_dtype)
    rp = rp.astype(compute_dtype)

    grid = (qpad // tq, npad // tr)
    od, oi = pl.pallas_call(
        functools.partial(_knn_kernel, k=k, n=n, tr=tr),
        out_shape=(jax.ShapeDtypeStruct((qpad, _KP), jnp.float32),
                   jax.ShapeDtypeStruct((qpad, _KP), jnp.int32)),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((tq, dpad), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tr, dpad), lambda i, j: (j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tq, 1), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tr), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((tq, _KP), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tq, _KP), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * qpad * npad * dpad,
            bytes_accessed=4 * (qpad // tq) * npad * dpad + 4 * qpad * dpad,
            transcendentals=0,
        ),
        interpret=interpret,
    )(qp, rp, qq, rr)
    return od[:qn, :k], oi[:qn, :k]


# ---------------------------------------------------------------------------
# pallas, transposed: reductions along SUBLANES (queries live on lanes)
# ---------------------------------------------------------------------------
#
# The lane-oriented kernel above is VPU-bound: its min/argmin passes reduce
# along the lane axis (d2 is (queries=sublanes, refs=lanes)), and cross-lane
# reductions are the VPU's slow direction. Here the block matmul is emitted
# transposed — d2 is (refs=sublanes, queries=lanes) — so every reduction in
# the extraction loop is a cross-sublane one: a rolling elementwise min over
# stacked vector registers. Same math, same outputs (transposed on the way
# out). Running best-k buffers are (_KR, tq) with _KR = 8 sublane rows
# (the f32 min tile), capping k at 8 for this path — knn_topk falls back to
# the lane variant for larger k.

_KR = 8  # sublane rows of the running best-k buffers (f32 min tile height)


def _extract_k_rows(pool_d, pool_i, k, height):
    """k iterative min-extractions along axis 0 of (height, TQ) pools."""
    row = jax.lax.broadcasted_iota(jnp.int32, pool_d.shape, 0)
    out_d, out_i = [], []
    for _ in range(k):
        m = jnp.min(pool_d, axis=0, keepdims=True)           # (1, TQ)
        is_min = pool_d == m
        a = jnp.min(jnp.where(is_min, row, height), axis=0, keepdims=True)
        sel = row == a
        idx = jnp.min(jnp.where(sel, pool_i, jnp.int32(2 ** 31 - 1)),
                      axis=0, keepdims=True)                 # (1, TQ)
        out_d.append(m)
        out_i.append(idx)
        pool_d = jnp.where(sel, _BIG, pool_d)
    return out_d, out_i


def _knn_kernel_t(q_ref, r_ref, od_ref, oi_ref, *, k, n, tr,
                  precision=None):
    # squared norms are computed here from the blocks already in VMEM: a
    # (tr, 1) norm INPUT would be tile-padded to (8, 128) lanes — 2 MB of
    # VMEM per fetch for 16 KB of data (measured OOM at (512, 4096), 100k).
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        od_ref[:] = jnp.full(od_ref.shape, _BIG)
        oi_ref[:] = jnp.full(oi_ref.shape, -1, jnp.int32)

    q = q_ref[:].astype(jnp.float32)
    r = r_ref[:].astype(jnp.float32)
    qq = jnp.sum(q * q, axis=1)[None, :]                     # (1, TQ)
    rr = jnp.sum(r * r, axis=1, keepdims=True)               # (TR, 1)
    xy = jax.lax.dot_general(
        r_ref[:], q_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision)                                 # (TR, TQ) MXU
    d2 = jnp.maximum(rr + qq - 2.0 * xy, 0.0)
    row = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 0) + j * tr
    d2 = jnp.where(row < n, d2, _BIG)                        # mask ref pad

    cd, ci = _extract_k_rows(d2, row, k, d2.shape[0])        # block top-k
    krow = jax.lax.broadcasted_iota(jnp.int32, (_KR, d2.shape[1]), 0)
    cand_d = jnp.full((_KR, d2.shape[1]), _BIG)
    cand_i = jnp.full((_KR, d2.shape[1]), -1, jnp.int32)
    for s in range(k):
        sel = krow == s
        cand_d = jnp.where(sel, cd[s], cand_d)
        cand_i = jnp.where(sel, ci[s], cand_i)

    pool_d = jnp.concatenate([od_ref[:], cand_d], axis=0)    # (2*_KR, TQ)
    pool_i = jnp.concatenate([oi_ref[:], cand_i], axis=0)
    bd, bi = _extract_k_rows(pool_d, pool_i, k, 2 * _KR)
    new_d = jnp.full((_KR, d2.shape[1]), _BIG)
    new_i = jnp.full((_KR, d2.shape[1]), -1, jnp.int32)
    for s in range(k):
        sel = krow == s
        new_d = jnp.where(sel, bd[s], new_d)
        new_i = jnp.where(sel, bi[s], new_i)
    od_ref[:] = new_d
    oi_ref[:] = new_i


@functools.partial(jax.jit,
                   static_argnames=("k", "tq", "tr", "compute_dtype",
                                    "precision", "interpret"))
def _topk_pallas_t(q: jnp.ndarray, refs: jnp.ndarray, k: int,
                   tq: int = 1024, tr: int = 2048,
                   compute_dtype=jnp.float32, precision=None,
                   interpret: bool = False):
    if k > _KR:
        raise ValueError(f"transposed kernel holds k <= {_KR} (got {k})")
    qn, d = q.shape
    n = refs.shape[0]
    qpad, npad, dpad = _round_up(qn, tq), _round_up(n, tr), _round_up(d, 128)
    qp = jnp.zeros((qpad, dpad), jnp.float32).at[:qn, :d].set(
        q.astype(jnp.float32)).astype(compute_dtype)
    rp = jnp.zeros((npad, dpad), jnp.float32).at[:n, :d].set(
        refs.astype(jnp.float32)).astype(compute_dtype)

    grid = (qpad // tq, npad // tr)
    od, oi = pl.pallas_call(
        functools.partial(_knn_kernel_t, k=k, n=n, tr=tr,
                          precision=precision),
        out_shape=(jax.ShapeDtypeStruct((_KR, qpad), jnp.float32),
                   jax.ShapeDtypeStruct((_KR, qpad), jnp.int32)),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((tq, dpad), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tr, dpad), lambda i, j: (j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((_KR, tq), lambda i, j: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_KR, tq), lambda i, j: (0, i),
                             memory_space=pltpu.VMEM),
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * qpad * npad * dpad,
            bytes_accessed=4 * (qpad // tq) * npad * dpad + 4 * qpad * dpad,
            transcendentals=0,
        ),
        interpret=interpret,
    )(qp, rp)
    return od.T[:qn, :k], oi.T[:qn, :k]


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------

def knn_topk_with_dist(q, refs, k: int, impl: str = "auto",
                       interpret: bool = False):
    """(distances, indices), each (Q, k) ascending — see knn_topk.

    Distances are squared Euclidean, computed at the impl's matmul
    precision (bf16-truncated inputs on the MXU by default — the same
    precision the index selection used, so they are self-consistent)."""
    if k > refs.shape[0]:
        raise ValueError(f"k={k} > {refs.shape[0]} reference points")
    if k > 64:
        raise ValueError(f"k={k} too large for the streaming buffers (<=64)")
    if impl == "auto":
        # "axon" is this host's tunneled-TPU plugin name; default_backend()
        # reports "tpu" here but guard both in case a plugin version keeps
        # its own platform string
        if jax.default_backend() in ("tpu", "axon"):
            impl = "pallas_t" if k <= _KR else "pallas"
        else:
            impl = "full"
    if impl == "full":
        return _topk_full(q, refs, k)
    if impl == "blocked":
        return _topk_blocked(q, refs, k)
    if impl == "pallas":
        return _topk_pallas(q, refs, k, interpret=interpret)
    if impl == "pallas_t":
        return _topk_pallas_t(q, refs, k, interpret=interpret)
    raise ValueError(f"unknown impl {impl!r}")


def knn_topk(q, refs, k: int, impl: str = "auto",
             interpret: bool = False) -> jnp.ndarray:
    """Indices (Q, k), ascending distance, of each query's k nearest refs.

    impl: "auto" picks per backend — on TPU the fused Pallas kernel
    ("pallas_t" for k <= 8, else "pallas"; measured fastest, PERF.md
    attempt 8), elsewhere the XLA "full" path (Pallas would need interpret
    mode). Explicit: "pallas_t", "pallas", "blocked", "full".
    """
    return knn_topk_with_dist(q, refs, k, impl=impl, interpret=interpret)[1]


# Padded reference rows for the sharded path: coordinate value large enough
# that a pad row can never be a nearest neighbor, small enough that every
# intermediate (d2 ~ D * _PAD_COORD**2) stays finite in float32.
_PAD_COORD = 1e15


@functools.lru_cache(maxsize=32)
def _sharded_local(mesh, k: int, impl: str, interpret: bool):
    """The per-shard top-k + all_gather program, cached by (mesh, k, impl):
    rebuilding the shard_map closure per call would defeat the pjit cache
    and recompile the Pallas kernel on every knn_mse invocation. The local
    shard size is read from the traced shapes, so one cached program serves
    any reference-set size with the same mesh."""
    from jax.sharding import PartitionSpec as P

    from srl_zoo_tpu.parallel.mesh import DATA_AXIS

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(DATA_AXIS)),
        out_specs=(P(), P()),
        # outputs ARE replicated (all_gather), but the pallas_call inside
        # blocks the static varying-manual-axes proof — vouch manually
        check_vma=False)
    def _local(qs, local_refs):
        ld, li = knn_topk_with_dist(qs, local_refs, k, impl=impl,
                                    interpret=interpret)
        gi = li + jax.lax.axis_index(DATA_AXIS) * local_refs.shape[0]
        # (n_dev, Q, k) candidate lists, replicated after the gather
        return (jax.lax.all_gather(ld, DATA_AXIS),
                jax.lax.all_gather(gi, DATA_AXIS))

    return _local


def knn_topk_sharded(q, refs, k: int, mesh=None, impl: str = "auto",
                     interpret: bool = False,
                     query_chunk: int | None = None) -> jnp.ndarray:
    """knn_topk with the REFERENCE set sharded over a device mesh.

    Each device runs the fused local top-k on its reference shard (queries
    replicated), then the (Q, k) candidate lists ride ICI via all_gather
    and a final width-(devices*k) top_k merges them — reference-side HBM
    scales d-ways, like ops/sharded_store.py does for frames. Falls back to
    the single-device path on 1-device meshes or when a shard would hold
    fewer than k points.

    ``query_chunk`` bounds per-device working memory when the local impl
    materializes its (chunk, n_local) distance block (the XLA "full" path
    on non-TPU backends; the Pallas kernels never materialize it). The
    reference set is padded HOST-side and device_put directly onto the
    sharded layout, so no single device ever stages the whole set."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from srl_zoo_tpu.parallel.mesh import DATA_AXIS, make_mesh

    if mesh is None:
        mesh = make_mesh()
    n_dev = int(mesh.devices.size)
    n, d = refs.shape
    if len(q) == 0:
        return jnp.zeros((0, k), jnp.int32)
    if n_dev == 1 or n // n_dev < k:
        # single-device fallback still honors query_chunk: the XLA "full"
        # impl materializes a (chunk, N) distance block, so an unchunked
        # fallback would quietly void the memory bound the caller asked for
        # (e.g. 100k x 100k f32 = 40 GB at query_chunk=4096)
        if query_chunk is None or len(q) <= query_chunk:
            return knn_topk(q, refs, k, impl=impl, interpret=interpret)
        qc = np.asarray(q, np.float32)
        return jnp.concatenate(
            [knn_topk(qc[s:s + query_chunk], refs, k, impl=impl,
                      interpret=interpret)
             for s in range(0, len(qc), query_chunk)], axis=0)

    npad = _round_up(n, n_dev)
    # host-side pad + direct sharded upload (no device-0 staging of the
    # full set — the point of sharding is that it never fits one device)
    refs_np = np.full((npad, d), _PAD_COORD, np.float32)
    refs_np[:n] = np.asarray(refs, np.float32)
    refs_p = jax.device_put(refs_np, NamedSharding(mesh, P(DATA_AXIS)))

    q = np.asarray(q, np.float32)
    local = _sharded_local(mesh, k, impl, interpret)
    chunk = len(q) if query_chunk is None else max(query_chunk, 1)
    rep = NamedSharding(mesh, P())
    out = []
    for start in range(0, len(q), chunk):
        qs = jax.device_put(jnp.asarray(q[start:start + chunk]), rep)
        ld, gi = local(qs, refs_p)
        qn = qs.shape[0]
        pool_d = jnp.moveaxis(ld, 0, 1).reshape(qn, n_dev * k)
        pool_i = jnp.moveaxis(gi, 0, 1).reshape(qn, n_dev * k)
        neg, sel = jax.lax.top_k(-pool_d, k)      # tiny final merge
        out.append(jnp.take_along_axis(pool_i, sel, axis=1))
    return out[0] if len(out) == 1 else jnp.concatenate(out, axis=0)
