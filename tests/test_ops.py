"""Device ops: normalization round trip, occlusion, Pallas pairwise kernel."""

import jax
import jax.numpy as jnp
import numpy as np

from srl_zoo_tpu.ops.pairwise import _pairwise_pallas, _pairwise_xla, pairwise_sqdist
from srl_zoo_tpu.ops.preproc import (denormalize_images, gaussian_noise,
                                     normalize_images, occlude)


def test_normalize_tf_range():
    obs = jnp.array([[[[0, 128, 255]]]], jnp.uint8)
    x = normalize_images(obs, "tf")
    assert np.isclose(x[0, 0, 0, 0], -1.0)
    assert np.isclose(x[0, 0, 0, 2], 1.0)


def test_normalize_round_trip():
    rng = np.random.RandomState(0)
    obs = jnp.asarray(rng.randint(0, 256, (2, 8, 8, 3), dtype=np.uint8))
    for mode in ("tf", "image_net"):
        x = normalize_images(obs, mode)
        back = denormalize_images(x, mode)
        assert np.allclose(np.asarray(back) * 255.0, np.asarray(obs),
                           atol=0.51), mode


def test_normalize_imagenet_stats():
    obs = jnp.full((1, 2, 2, 3), 255, jnp.uint8)
    x = normalize_images(obs, "image_net")
    expected = (1.0 - np.array([0.485, 0.456, 0.406])) / \
        np.array([0.229, 0.224, 0.225])
    assert np.allclose(np.asarray(x)[0, 0, 0], expected, rtol=1e-4)


def test_occlusion_area_fraction():
    obs = jnp.ones((4, 32, 32, 3))
    out = occlude(jax.random.PRNGKey(0), obs, 0.25)
    frac = 1.0 - np.asarray(out).mean()
    assert 0.15 < frac < 0.35  # ~25% of pixels zeroed per image


def test_occlusion_zero_keeps_most():
    obs = jnp.ones((2, 32, 32, 3))
    out = occlude(jax.random.PRNGKey(0), obs, 0.01)
    assert np.asarray(out).mean() > 0.95


def test_gaussian_noise_stats():
    x = jnp.zeros((1, 64, 64, 3))
    noisy = gaussian_noise(jax.random.PRNGKey(0), x, 0.5)
    assert abs(float(noisy.std()) - 0.5) < 0.05


def _np_pairwise(x, y):
    return ((x[:, None, :] - y[None, :, :]) ** 2).sum(-1)


def test_pairwise_xla_matches_numpy(rng):
    x = rng.randn(17, 5).astype(np.float32)
    y = rng.randn(23, 5).astype(np.float32)
    got = np.asarray(_pairwise_xla(jnp.asarray(x), jnp.asarray(y)))
    assert np.allclose(got, _np_pairwise(x, y), atol=1e-4)


def test_pairwise_pallas_interpret_matches_numpy(rng):
    """The Pallas kernel (interpret mode on CPU) agrees with numpy, including
    non-tile-aligned shapes."""
    x = rng.randn(30, 7).astype(np.float32)
    y = rng.randn(300, 7).astype(np.float32)
    got = np.asarray(_pairwise_pallas(jnp.asarray(x), jnp.asarray(y),
                                      interpret=True))
    assert got.shape == (30, 300)
    assert np.allclose(got, _np_pairwise(x, y), atol=1e-3)


def test_pairwise_dispatch_cpu(rng):
    x = rng.randn(9, 3).astype(np.float32)
    got = np.asarray(pairwise_sqdist(jnp.asarray(x), jnp.asarray(x)))
    assert np.allclose(np.diag(got), 0.0, atol=1e-5)
    assert np.allclose(got, _np_pairwise(x, x), atol=1e-4)


def test_gather_normalize_interpret_matches_xla(rng):
    import jax.numpy as jnp

    from srl_zoo_tpu.ops.gather_norm import gather_normalize
    frames = jnp.asarray(rng.randint(0, 255, (10, 8, 16, 8),
                                     dtype=np.uint8))  # f = 1024
    idx = jnp.asarray(rng.randint(0, 10, 5).astype(np.int32))
    pallas_out = gather_normalize(frames, idx, interpret=True,
                                  use_pallas=True)
    xla_out = gather_normalize(frames, idx, use_pallas=False)
    np.testing.assert_allclose(np.asarray(pallas_out), np.asarray(xla_out),
                               atol=1e-6)


def test_max_pool_alternatives_match_flax():
    """The measured-slower max-pool variants (ops/pooling.py) must stay
    forward-bit-identical to flax's max_pool (they are kept as verified
    reference implementations)."""
    import flax.linen as nn
    import jax.numpy as jnp

    from srl_zoo_tpu.ops.pooling import max_pool_argmax, max_pool_tree

    rng = np.random.RandomState(0)
    for hw in (23, 24, 33):
        x = jnp.asarray(rng.randn(2, hw, hw, 4).astype(np.float32))
        ref = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        assert bool(jnp.all(max_pool_tree(x) == ref))
        assert bool(jnp.all(max_pool_argmax(x) == ref))
    # explicit-padding signature (resnet stem)
    x = jnp.asarray(rng.randn(2, 56, 56, 4).astype(np.float32))
    ref = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
    got = max_pool_tree(x, padding=((1, 1), (1, 1)))
    assert bool(jnp.all(got == ref))


def test_max_pool_argmax_gradient_valid():
    """One-hot backward: gradient lands only on window maxima and sums to the
    upstream gradient's total (each output routes to exactly one input)."""
    import jax
    import jax.numpy as jnp

    from srl_zoo_tpu.ops.pooling import max_pool_argmax

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 8, 8, 2).astype(np.float32))
    y, grad = jax.value_and_grad(lambda x: jnp.sum(max_pool_argmax(x)))(x)
    n_windows = 4 * 4 * 2
    np.testing.assert_allclose(float(jnp.sum(grad)), n_windows, rtol=1e-6)
    assert int(jnp.sum(grad > 0)) <= n_windows


def test_fused_relu_max_pool_forward_exact():
    """ops/fused_pool.py Pallas kernel (interpret mode) must be bit-identical
    to nn.max_pool(nn.relu(x)) on every packable geometry, both pad styles,
    f32 and bf16."""
    import jax.numpy as jnp

    from srl_zoo_tpu.ops.fused_pool import (relu_max_pool,
                                            relu_max_pool_reference)

    rng = np.random.RandomState(0)
    for shape, padding in [((2, 16, 16, 8), "SAME"),
                           ((2, 16, 16, 8), ((1, 1), (1, 1))),
                           ((3, 28, 28, 16), "SAME")]:
        # bf16 exercises the Pallas kernel (the bit-packed argmax needs a
        # 16-bit float input); f32 must take the identical-by-construction
        # XLA fallback
        for dtype in (jnp.bfloat16, jnp.float32):
            x = jnp.asarray(rng.randn(*shape).astype(np.float32), dtype=dtype)
            got = relu_max_pool(x, padding, use_pallas=True, interpret=True)
            ref = relu_max_pool_reference(x, padding)
            assert got.dtype == ref.dtype
            assert bool(jnp.all(got == ref)), (shape, padding, dtype)


def test_fused_relu_max_pool_gradient_routing_exact():
    """Integer inputs AND integer cotangents make every gradient sum exact,
    so any tie-routing difference vs XLA's select-and-scatter (including the
    relu-clamped zero-gradient case) shows as a hard mismatch."""
    import jax
    import jax.numpy as jnp

    from srl_zoo_tpu.ops.fused_pool import (relu_max_pool,
                                            relu_max_pool_reference)

    rng = np.random.RandomState(1)
    for shape, padding in [((2, 16, 16, 8), "SAME"),
                           ((2, 16, 16, 8), ((1, 1), (1, 1)))]:
        # many exact ties (values in {-2..2}) and many relu-clamped windows;
        # bf16 (exact for small ints) so the Pallas path actually runs
        x = jnp.asarray(rng.randint(-2, 3, shape).astype(np.float32),
                        dtype=jnp.bfloat16)
        gs = relu_max_pool_reference(x, padding).shape
        g = jnp.asarray(rng.randint(-8, 9, gs).astype(np.float32),
                        dtype=jnp.bfloat16)
        dref = jax.grad(lambda x: jnp.vdot(
            relu_max_pool_reference(x, padding), g))(x)
        dgot = jax.grad(lambda x: jnp.vdot(
            relu_max_pool(x, padding, use_pallas=True, interpret=True), g))(x)
        assert bool(jnp.all(dref == dgot)), (shape, padding)


def test_fused_relu_max_pool_fallbacks():
    """Non-packable geometries (odd extents) and the measured default
    (use_pallas=None -> XLA, docs/PERF.md) must route to the reference."""
    import jax.numpy as jnp

    from srl_zoo_tpu.ops.fused_pool import (relu_max_pool,
                                            relu_max_pool_reference)

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 7, 7, 4).astype(np.float32))
    ref = relu_max_pool_reference(x, "SAME")
    # odd geometry falls back even with use_pallas=True
    assert bool(jnp.all(relu_max_pool(x, "SAME", use_pallas=True) == ref))
    x = jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32))
    ref = relu_max_pool_reference(x, "SAME")
    assert bool(jnp.all(relu_max_pool(x, "SAME") == ref))  # default = XLA


# ---------------------------------------------------------------------------
# knn_topk: fused distance + streaming top-k (ops/knn_topk.py, attempt 8)
# ---------------------------------------------------------------------------

def _np_knn(q, r, k):
    d2 = ((q[:, None, :] - r[None, :, :]) ** 2).sum(-1)
    return np.argsort(d2, axis=1, kind="stable")[:, :k]


def _assert_knn_matches(got, want, label="", max_flips=2):
    """Index agreement up to a couple of TIE FLIPS: the device impls compute
    matmul-form f32 distances, numpy the subtract-square-sum form — exact
    ties may legitimately resolve differently. A fractional threshold
    ((got == want).mean() > 0.999) allowed ZERO mismatches at these sizes
    (0.001 * n_elements < 1), silently making the checks exact (review r3)."""
    mismatches = int((np.asarray(got) != np.asarray(want)).sum())
    assert mismatches <= max_flips, \
        f"{label}: {mismatches} mismatched indices (> {max_flips})"


def test_knn_topk_full_blocked_match_numpy(rng):
    from srl_zoo_tpu.ops.knn_topk import knn_topk
    q = rng.randn(123, 33).astype(np.float32)
    r = rng.randn(517, 33).astype(np.float32)
    want = _np_knn(q, r, 7)
    for impl in ("full", "blocked"):
        got = np.asarray(knn_topk(q, r, 7, impl=impl))
        _assert_knn_matches(got, want, impl)


def test_knn_topk_pallas_interpret_matches_numpy(rng):
    from srl_zoo_tpu.ops.knn_topk import knn_topk
    # ragged shapes exercise query/ref/feature padding paths
    q = rng.randn(130, 37).astype(np.float32)
    r = rng.randn(1111, 37).astype(np.float32)
    want = _np_knn(q, r, 6)
    for impl in ("pallas", "pallas_t"):
        got = np.asarray(knn_topk(q, r, 6, impl=impl, interpret=True))
        assert (got == want).all(), impl


def test_knn_topk_auto_resolves_off_tpu(rng):
    # on the CPU test backend "auto" must route to the XLA full path
    # (Pallas would need interpret mode); result still correct
    from srl_zoo_tpu.ops.knn_topk import knn_topk
    q = rng.randn(31, 12).astype(np.float32)
    r = rng.randn(257, 12).astype(np.float32)
    got = np.asarray(knn_topk(q, r, 3))
    assert (got == _np_knn(q, r, 3)).all()


def test_knn_topk_pallas_t_k_cap(rng):
    import pytest
    from srl_zoo_tpu.ops.knn_topk import _KR, knn_topk
    q = rng.randn(8, 4).astype(np.float32)
    r = rng.randn(32, 4).astype(np.float32)
    with pytest.raises(ValueError):
        knn_topk(q, r, _KR + 1, impl="pallas_t")


def test_knn_topk_pallas_exact_tiles(rng):
    from srl_zoo_tpu.ops.knn_topk import knn_topk
    q = rng.randn(512, 128).astype(np.float32)
    r = rng.randn(1024, 128).astype(np.float32)
    want = _np_knn(q, r, 5)
    got = np.asarray(knn_topk(q, r, 5, impl="pallas", interpret=True))
    assert (got == want).all()


def test_knn_topk_ascending_and_validates():
    import pytest
    from srl_zoo_tpu.ops.knn_topk import knn_topk
    rng = np.random.RandomState(3)
    q = rng.randn(17, 8).astype(np.float32)
    r = rng.randn(64, 8).astype(np.float32)
    idx = np.asarray(knn_topk(q, r, 4, impl="blocked"))
    d2 = ((q[:, None, :] - r[None, :, :]) ** 2).sum(-1)
    picked = np.take_along_axis(d2, idx, axis=1)
    assert (np.diff(picked, axis=1) >= -1e-6).all()  # ascending distances
    with pytest.raises(ValueError):
        knn_topk(q, r, 100)          # k > number of reference points
    r2 = rng.randn(200, 8).astype(np.float32)
    with pytest.raises(ValueError):
        knn_topk(q, r2, 65)          # k over the streaming-buffer cap
    with pytest.raises(ValueError):
        knn_topk(q, r, 4, impl="nope")


def test_knn_topk_with_dist(rng):
    from srl_zoo_tpu.ops.knn_topk import knn_topk_with_dist
    q = rng.randn(19, 9).astype(np.float32)
    r = rng.randn(131, 9).astype(np.float32)
    d, i = knn_topk_with_dist(q, r, 4)
    want_d = ((q[:, None, :] - r[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(
        np.asarray(d), np.take_along_axis(want_d, np.asarray(i), axis=1),
        rtol=1e-4, atol=1e-4)
    assert (np.diff(np.asarray(d), axis=1) >= -1e-6).all()


def test_knn_topk_sharded_matches_numpy(rng):
    """Reference set sharded over the 8-device mesh; candidates merged via
    all_gather — must agree with the single-device answer. 1003 refs is
    deliberately not divisible by 8 (pad rows must never win)."""
    from srl_zoo_tpu.ops.knn_topk import knn_topk_sharded
    from srl_zoo_tpu.parallel.mesh import make_mesh
    import jax
    assert jax.device_count() == 8
    mesh = make_mesh()
    q = rng.randn(57, 21).astype(np.float32)
    r = rng.randn(1003, 21).astype(np.float32)
    got = np.asarray(knn_topk_sharded(q, r, 5, mesh=mesh))
    # loose like the full/blocked test: matmul-form f32 distances may flip
    # exact ties vs numpy's subtract-square-sum form
    _assert_knn_matches(got, _np_knn(q, r, 5))
    # chunked queries must agree with the one-shot call exactly
    chunked = np.asarray(knn_topk_sharded(q, r, 5, mesh=mesh,
                                          query_chunk=13))
    assert (chunked == got).all()


def test_knn_topk_sharded_small_shard_fallback(rng):
    # 24 refs / 8 devices = 3 < k=5: must fall back to the plain path
    from srl_zoo_tpu.ops.knn_topk import knn_topk_sharded
    from srl_zoo_tpu.parallel.mesh import make_mesh
    q = rng.randn(6, 4).astype(np.float32)
    r = rng.randn(24, 4).astype(np.float32)
    got = np.asarray(knn_topk_sharded(q, r, 5, mesh=make_mesh()))
    _assert_knn_matches(got, _np_knn(q, r, 5))


def test_knn_topk_sharded_fallback_honors_query_chunk(rng):
    """The single-device/small-shard fallback must still chunk queries —
    dropping query_chunk there voids the caller's memory bound (the XLA
    'full' impl materializes a (chunk, N) distance block)."""
    from unittest import mock

    import srl_zoo_tpu.ops.knn_topk as kt
    from srl_zoo_tpu.parallel.mesh import make_mesh

    q = rng.randn(37, 4).astype(np.float32)
    r = rng.randn(24, 4).astype(np.float32)
    seen = []
    real = kt.knn_topk_with_dist

    def spy(qs, refs, k, **kw):
        seen.append(len(qs))
        return real(qs, refs, k, **kw)

    with mock.patch.object(kt, "knn_topk_with_dist", side_effect=spy):
        got = np.asarray(kt.knn_topk_sharded(q, r, 5, mesh=make_mesh(),
                                             query_chunk=10))
    assert max(seen) <= 10 and sum(seen) == 37
    _assert_knn_matches(got, _np_knn(q, r, 5))
    # zero queries stay well-formed on every path
    assert kt.knn_topk_sharded(q[:0], r, 5, mesh=make_mesh(),
                               query_chunk=10).shape == (0, 5)
