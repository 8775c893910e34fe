"""Per-loss numerical tests vs hand-computed values (SURVEY.md §4.1)."""

import jax
import jax.numpy as jnp
import numpy as np

from srl_zoo_tpu.losses import functions as F


def test_mse():
    a = jnp.array([[1.0, 2.0]])
    b = jnp.array([[3.0, 4.0]])
    assert np.isclose(F.mse(a, b), 4.0)


def test_kl_closed_form():
    # KL(N(mu, sigma^2) || N(0,1)) per-dim = -0.5*(1 + log s^2 - mu^2 - s^2)
    mu = jnp.array([[0.5, -1.0]])
    logvar = jnp.array([[0.0, jnp.log(4.0)]])
    expected = np.mean([-0.5 * (1 + 0 - 0.25 - 1),
                        -0.5 * (1 + np.log(4.0) - 1.0 - 4.0)])
    assert np.isclose(F.kl_divergence(mu, logvar), expected, rtol=1e-6)


def test_vae_loss_is_recon_plus_beta_kl():
    recon = jnp.zeros((2, 4, 4, 3))
    target = jnp.ones((2, 4, 4, 3))
    mu = jnp.zeros((2, 3))
    logvar = jnp.zeros((2, 3))
    # recon MSE = 1, KL = 0 at (mu=0, logvar=0)
    assert np.isclose(F.vae_loss(recon, target, mu, logvar, beta=7.0), 1.0)


def test_priors_temporal_only():
    # one sample, no valid pairs: only temporal term remains
    s = jnp.array([[0.0, 0.0]])
    sn = jnp.array([[3.0, 4.0]])
    zero_idx = jnp.zeros(1, jnp.int32)
    zero_mask = jnp.zeros(1)
    total, terms = F.robotic_priors_loss(s, sn, zero_idx, zero_mask,
                                         zero_idx, zero_mask)
    assert np.isclose(terms["priors/temporal"], 25.0)
    assert np.isclose(terms["priors/causality"], 0.0)
    assert np.isclose(total, 25.0)


def test_priors_pair_terms_hand_computed():
    # two samples, each the other's partner, all pairs valid
    s = jnp.array([[0.0, 0.0], [1.0, 0.0]])
    sn = jnp.array([[1.0, 0.0], [3.0, 0.0]])  # ds = [1,0], [2,0]
    partners = jnp.array([1, 0], jnp.int32)
    ones = jnp.ones(2)
    total, terms = F.robotic_priors_loss(s, sn, partners, ones,
                                         partners, ones)
    d2 = 1.0  # |s0 - s1|^2
    assert np.isclose(terms["priors/causality"], np.exp(-d2), rtol=1e-6)
    # proportionality: (|ds0| - |ds1|)^2 = (1-2)^2 = 1 for both directions
    assert np.isclose(terms["priors/proportionality"], 1.0, rtol=1e-6)
    # repeatability: exp(-d2) * |ds0 - ds1|^2 = exp(-1) * 1
    assert np.isclose(terms["priors/repeatability"], np.exp(-1.0), rtol=1e-6)
    # temporal: mean(1, 4) = 2.5
    assert np.isclose(terms["priors/temporal"], 2.5)


def test_inverse_ce_uniform():
    logits = jnp.zeros((4, 3))
    actions = jnp.array([0, 1, 2, 0])
    assert np.isclose(F.inverse_model_loss(logits, actions), np.log(3.0),
                      rtol=1e-6)


def test_forward_mse():
    pred = jnp.array([[1.0, 1.0]])
    nxt = jnp.array([[0.0, 0.0]])
    assert np.isclose(F.forward_model_loss(pred, nxt), 1.0)


def test_triplet_margin():
    a = jnp.array([[0.0, 0.0]])
    p = jnp.array([[1.0, 0.0]])   # d_pos = 1
    n = jnp.array([[5.0, 0.0]])   # d_neg = 5
    # 1 - 5 + 1 < 0 -> 0
    assert np.isclose(F.triplet_loss(a, p, n, margin=1.0), 0.0)
    # margin 10: 1 - 5 + 10 = 6
    assert np.isclose(F.triplet_loss(a, p, n, margin=10.0), 6.0)


def test_episode_prior_bce():
    logits = jnp.array([10.0, -10.0])
    labels = jnp.array([1.0, 0.0])
    d_loss, e_loss = F.episode_prior_losses(logits, logits, labels)
    assert d_loss < 1e-3          # perfect discriminator
    assert e_loss > 5.0           # encoder completely fooled = high loss


def test_reward_prior_prefers_correlation():
    rng = np.random.RandomState(0)
    r = jnp.asarray(rng.randn(64).astype(np.float32))
    correlated = jnp.stack([r, r * 2.0], axis=1)
    uncorrelated = jnp.asarray(rng.randn(64, 2).astype(np.float32))
    assert F.reward_prior_loss(correlated, r) < \
        F.reward_prior_loss(uncorrelated, r)


def test_l1_l2_regularization():
    params = {"w": jnp.array([1.0, -2.0]), "b": jnp.array([2.0, 0.0])}
    assert np.isclose(F.l1_regularization(params), (1 + 2 + 2 + 0) / 4)
    assert np.isclose(F.l2_regularization(params), (1 + 4 + 4 + 0) / 4)


def test_masked_mean_ignores_invalid():
    v = jnp.array([1.0, 100.0])
    m = jnp.array([1.0, 0.0])
    assert np.isclose(F._masked_mean(v, m), 1.0)


def test_registry_weights_and_splits():
    from srl_zoo_tpu.config import SRLConfig
    from srl_zoo_tpu.losses.registry import compute_total_loss

    cfg = SRLConfig(state_dim=4,
                    losses=(("forward", 3.0), ("inverse", 2.0)),
                    split_dims=(("forward", 2), ("inverse", 2)),
                    n_actions=2)
    outputs = {
        "state": jnp.ones((2, 4)),
        "next_state": jnp.zeros((2, 4)),
        "forward_pred": jnp.zeros((2, 2)),      # MSE vs next slice (0) = 0
        "inverse_logits": jnp.zeros((2, 2)),    # CE = log 2
    }
    batch = {"actions": jnp.array([0, 1])}
    total, metrics = compute_total_loss(cfg, outputs, batch,
                                        target_obs=None, params={})
    assert np.isclose(metrics["forward"], 0.0)
    assert np.isclose(metrics["inverse"], np.log(2.0), rtol=1e-6)
    assert np.isclose(total, 3.0 * 0.0 + 2.0 * np.log(2.0), rtol=1e-6)


def test_priors_gradient_finite_at_zero_delta():
    """Zero state deltas (wall-blocked agent => identical frames through a
    BatchNorm-free encoder) must not NaN the gradient: the norm terms use a
    safe sqrt (regression for the mlp/linear priors NaN)."""
    import jax

    from srl_zoo_tpu.losses.functions import robotic_priors_loss

    b, d = 8, 4
    rng = np.random.RandomState(0)
    s = jnp.asarray(rng.randn(b, d).astype(np.float32))
    sn = s.at[0].set(s[0])  # row 0: next_state == state exactly
    sn = sn.at[1:].add(0.1 * rng.randn(b - 1, d).astype(np.float32))
    partners = jnp.asarray(rng.randint(0, b, b).astype(np.int32))
    mask = jnp.ones(b, np.float32)

    def loss(s, sn):
        total, _ = robotic_priors_loss(s, sn, partners, mask, partners, mask)
        return total

    gs, gsn = jax.grad(loss, argnums=(0, 1))(s, sn)
    assert np.all(np.isfinite(np.asarray(gs)))
    assert np.all(np.isfinite(np.asarray(gsn)))


def test_triplet_gradient_finite_at_identical_embeddings():
    import jax

    from srl_zoo_tpu.losses.functions import triplet_loss

    a = jnp.ones((4, 3), np.float32)
    g = jax.grad(lambda a: triplet_loss(a, a, a))(a)  # d_pos = d_neg = 0
    assert np.all(np.isfinite(np.asarray(g)))


def test_recompose_epoch_means_mixed_denominators():
    """Composite epoch metrics (priors, total) are rebuilt from the exact
    component means — a composite mixes sample and pair denominators, so no
    single per-batch weighting is exact (VERDICT r4 weak #3)."""
    from srl_zoo_tpu.config import SRLConfig
    from srl_zoo_tpu.losses.registry import recompose_epoch_means

    cfg = SRLConfig(state_dim=4,
                    losses=(("priors", 2.0), ("episode-prior", 0.5)),
                    split_dims=(("priors", -1), ("episode-prior", -1)),
                    n_actions=2, l1_reg=0.1)
    means = {"priors/temporal": 1.0, "priors/causality": 2.0,
             "priors/proportionality": 3.0, "priors/repeatability": 4.0,
             "priors": -99.0,  # stale sample-weighted value, must be rebuilt
             "episode-prior": 0.6, "episode-prior/discriminator": 0.7,
             "l1_reg": 0.25, "total": -99.0}
    out = recompose_epoch_means(cfg, means)
    assert np.isclose(out["priors"], 10.0)
    # discriminator at weight 1, encoder fooling at the loss weight, l1 on top
    assert np.isclose(out["total"], 2.0 * 10.0 + 0.7 + 0.5 * 0.6 + 0.1 * 0.25)
