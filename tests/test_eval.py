"""Evaluation: KNN-MSE semantics, GTC, reward probe."""

import os

import numpy as np

from srl_zoo_tpu.evaluation.gtc import ground_truth_correlation
from srl_zoo_tpu.evaluation.knn import knn_mse
from srl_zoo_tpu.evaluation.predict_reward import predict_reward_accuracy


def test_knn_mse_perfect_representation(rng):
    """If learned == ground truth, neighbors are true neighbors and KNN-MSE
    is the intrinsic neighborhood spread — identical to the sklearn result."""
    gt = rng.randn(100, 3).astype(np.float32)
    score, queries, neigh = knn_mse(gt, gt, k=3)
    # cross-check against sklearn (the reference implementation)
    from sklearn.neighbors import NearestNeighbors
    nn = NearestNeighbors(n_neighbors=4).fit(gt)
    _, idx = nn.kneighbors(gt)
    ref = np.mean([
        np.mean((gt[i] - gt[[j for j in idx[i] if j != i][:3]]) ** 2)
        for i in range(100)])
    assert np.isclose(score, ref, rtol=1e-4)


def test_knn_mse_scrambled_is_worse(rng):
    gt = rng.randn(200, 2).astype(np.float32)
    good = gt + 0.01 * rng.randn(200, 2).astype(np.float32)
    bad = rng.randn(200, 2).astype(np.float32)
    s_good, _, _ = knn_mse(good, gt, k=5)
    s_bad, _, _ = knn_mse(bad, gt, k=5)
    assert s_good < s_bad


def test_knn_mse_subsampling(rng):
    gt = rng.randn(50, 2).astype(np.float32)
    score, queries, neigh = knn_mse(gt, gt, k=3, n_samples=10, seed=1)
    assert len(queries) == 10 and neigh.shape == (10, 3)


def test_gtc_identity(rng):
    gt = rng.randn(100, 3).astype(np.float32)
    score, corr = ground_truth_correlation(gt, gt)
    assert np.isclose(score, 1.0, atol=1e-6)
    assert corr.shape == (3, 3)
    assert np.allclose(np.diag(corr), 1.0, atol=1e-6)


def test_gtc_linear_transform_is_high(rng):
    gt = rng.randn(200, 2).astype(np.float32)
    learned = gt @ np.array([[2.0, 0.0], [0.0, -3.0]], np.float32) + 1.0
    score, _ = ground_truth_correlation(learned, gt)
    assert score > 0.99


def test_gtc_noise_is_low(rng):
    gt = rng.randn(500, 2).astype(np.float32)
    learned = rng.randn(500, 4).astype(np.float32)
    score, _ = ground_truth_correlation(learned, gt)
    assert score < 0.3


def test_reward_probe_separable(rng):
    states = np.concatenate([rng.randn(50, 2) + 5, rng.randn(50, 2) - 5])
    rewards = np.concatenate([np.ones(50), -np.ones(50)]).astype(np.float32)
    acc = predict_reward_accuracy(states.astype(np.float32), rewards)
    assert acc > 0.9


def test_latent_sweep_grid(synthetic_dataset, trained_ae_cli_run):
    """Latent sweeps decode to the image geometry, one batched call."""
    import jax

    from srl_zoo_tpu.evaluation.enjoy_latent import latent_sweep_grid
    from srl_zoo_tpu.training.learner import SRL4robotics

    ds = synthetic_dataset
    learner = SRL4robotics.load(trained_ae_cli_run)
    cfg = learner.cfg
    states = learner.predict_states(ds)
    variables = {"params": jax.device_get(learner.state.params),
                 "batch_stats": jax.device_get(learner.state.batch_stats)}
    grid = latent_sweep_grid(cfg, variables, states, n_dims=2, n_steps=3)
    assert grid.shape == (2, 3, 32, 32, 3)
    assert 0.0 <= grid.min() and grid.max() <= 1.0


def test_knn_mse_chunked_matches_unchunked(rng):
    gt = rng.randn(150, 3).astype(np.float32)
    s_full, _, n_full = knn_mse(gt, gt, k=4, query_chunk=10**9)
    s_chunk, _, n_chunk = knn_mse(gt, gt, k=4, query_chunk=32)
    assert np.isclose(s_full, s_chunk, rtol=1e-6)
    np.testing.assert_array_equal(n_full, n_chunk)


def test_doctor_cli(synthetic_dataset, capsys):
    """Environment doctor runs end to end and reports dataset fit."""
    from srl_zoo_tpu.utils.doctor import main as doctor_main

    rc = doctor_main(["--data-folder", synthetic_dataset.data_folder,
                      "--skip-bandwidth"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "devices:" in out and "frame store:" in out


def test_knn_mse_tiny_dataset_clamps_k():
    """k is clamped to n-1 on debug-size datasets instead of crashing in
    top_k (review r2)."""
    from srl_zoo_tpu.evaluation.knn import knn_mse
    rng = np.random.RandomState(0)
    s = rng.randn(4, 3).astype(np.float32)
    gt = rng.randn(4, 2).astype(np.float32)
    score, queries, nn = knn_mse(s, gt, k=5)
    assert np.isfinite(score) and nn.shape == (4, 3)


def test_enjoy_latent_cli_single_step(trained_ae_cli_run):
    """--n-steps 1 used to crash: np.atleast_2d TRANSPOSES the squeezed
    (n_dims,) axes array to (1, n_dims) and axes[d, s] walks off axis 0."""
    from srl_zoo_tpu.evaluation.enjoy_latent import main as enjoy_main

    log = trained_ae_cli_run
    out = enjoy_main(["--log-folder", log, "--n-dims", "3", "--n-steps", "1"])
    assert os.path.exists(out)
    # and the normal multi-step grid still renders
    out = enjoy_main(["--log-folder", log, "--n-dims", "2", "--n-steps", "3"])
    assert os.path.exists(out)


def test_gtc_matches_scipy_pearson(rng):
    """Decision #17 (math half): the correlation matrix is the exact Pearson
    correlation — cross-checked entry-by-entry against scipy.stats.pearsonr
    and np.corrcoef (two independent reference implementations), and the GTC
    scalar equals mean-over-gt-dims of max |corr| computed from scipy's
    matrix. The CONVENTION (max-|corr| per gt dim) remains a documented
    design decision; the arithmetic is externally validated."""
    import scipy.stats

    from srl_zoo_tpu.evaluation.gtc import correlation_matrix

    learned = rng.randn(64, 5).astype(np.float32) * 3.0 + 1.0
    gt = rng.randn(64, 3).astype(np.float32)
    gt[:, 0] = learned[:, 2] * -0.5 + 0.1 * gt[:, 0]  # a correlated pair

    corr = correlation_matrix(learned, gt)
    assert corr.shape == (5, 3)
    ref = np.empty_like(corr)
    for i in range(5):
        for j in range(3):
            ref[i, j] = scipy.stats.pearsonr(learned[:, i], gt[:, j])[0]
    np.testing.assert_allclose(corr, ref, rtol=1e-6, atol=1e-9)
    # second independent reference: np.corrcoef's cross block
    full = np.corrcoef(learned.T, gt.T)
    np.testing.assert_allclose(corr, full[:5, 5:], rtol=1e-6, atol=1e-9)

    score, _ = ground_truth_correlation(learned, gt)
    assert np.isclose(score, np.mean(np.max(np.abs(ref), axis=0)))


def test_doctor_diagnoses_hung_link(monkeypatch, capsys):
    """The 2026-08-20 outage mode passes device enumeration but hangs bulk
    transfers; the doctor's link measurement must be BOUNDED and produce the
    transport diagnosis + exit 2, never an infinite hang (it hung for real
    during the outage — fixed the same day)."""
    from srl_zoo_tpu.utils import doctor
    from srl_zoo_tpu.utils import platform as plat

    real = plat.run_bounded

    def fake(fn, timeout_s, what):
        if "link-bandwidth" in what:
            raise plat.BackendInitTimeout(
                f"{what} timed out after {timeout_s}s (simulated outage)")
        return real(fn, timeout_s, what)

    monkeypatch.setattr(plat, "run_bounded", fake)
    rc = doctor.main([])
    out = capsys.readouterr().out
    assert rc == 2
    assert "MEASUREMENT HUNG" in out
    assert "bulk transfers stall" in out
