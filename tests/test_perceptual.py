"""Perceptual-similarity loss coverage (VERDICT r2 weak #1).

Reference: losses/losses.py perceptualSimilarityLoss + train.py --path-to-dae
(DARLA-style: reconstruction error measured in a frozen pretrained-DAE
feature space). Exercises the unit function, the frozen-DAE plumbing
(learner._build_frozen_dae -> train_step dae_feature_fn), and the CLI flag.
"""

import os

import numpy as np
import pytest

from srl_zoo_tpu.config import SRLConfig
from srl_zoo_tpu.training.learner import SRL4robotics


# ---- unit ---------------------------------------------------------------------
def test_perceptual_similarity_loss_unit():
    import jax.numpy as jnp

    from srl_zoo_tpu.losses.functions import perceptual_similarity_loss

    feat = jnp.arange(12.0).reshape(4, 3)
    assert float(perceptual_similarity_loss(feat, feat)) == 0.0
    # plain feature-space MSE
    got = float(perceptual_similarity_loss(feat, feat + 2.0))
    assert got == pytest.approx(4.0)
    # masked rows must not contaminate the mean: row 3 is wildly wrong but
    # invalid (padded eval batch)
    bad = feat.at[3].add(100.0)
    valid = jnp.array([1.0, 1.0, 1.0, 0.0])
    assert float(perceptual_similarity_loss(feat, bad, valid)) == 0.0


def test_perceptual_without_dae_raises(synthetic_dataset, tmp_path):
    """--losses perceptual without --path-to-dae is a clean config error,
    not a trace-time crash (train_step.build_steps guard)."""
    cfg = SRLConfig(state_dim=4, img_height=32, img_width=32, batch_size=16,
                    epochs=1, losses=(("perceptual", 1.0),),
                    split_dims=(("perceptual", -1),),
                    log_folder=str(tmp_path / "noway"))
    with pytest.raises(ValueError, match="path-to-dae"):
        SRL4robotics(cfg, log_folder=cfg.log_folder)


# ---- end to end ---------------------------------------------------------------
@pytest.fixture(scope="module")
def trained_dae(synthetic_dataset, tmp_path_factory):
    """A small trained DAE log folder (exp_config.json + srl_model.msgpack),
    the artifact --path-to-dae points at."""
    log = str(tmp_path_factory.mktemp("dae_log"))
    ds = synthetic_dataset
    cfg = SRLConfig(state_dim=4, img_height=32, img_width=32, batch_size=16,
                    epochs=1, losses=(("dae", 1.0),),
                    split_dims=(("dae", -1),), n_actions=ds.n_actions,
                    device_cache="on", log_folder=log)
    cfg.save(log)
    learner = SRL4robotics(cfg, log_folder=log)
    learner.learn(ds)
    assert os.path.exists(os.path.join(log, "srl_model.msgpack"))
    return log


def test_perceptual_trains_cached(synthetic_dataset, trained_dae, tmp_path):
    """The frozen-DAE plumbing end to end in the production (HBM-cached,
    whole-epoch scan) mode: finite decreasing loss, per-term history key."""
    ds = synthetic_dataset
    cfg = SRLConfig(state_dim=4, img_height=32, img_width=32, batch_size=16,
                    epochs=3, losses=(("perceptual", 1.0),),
                    split_dims=(("perceptual", -1),),
                    n_actions=ds.n_actions, device_cache="on",
                    path_to_dae=trained_dae,
                    log_folder=str(tmp_path / "perc"))
    learner = SRL4robotics(cfg, log_folder=cfg.log_folder)
    metrics = learner.learn(ds)
    assert np.isfinite(metrics["total"])
    assert "perceptual" in metrics
    hist = np.load(tmp_path / "perc" / "loss_history.npz")
    assert "train/perceptual" in hist
    assert np.all(np.isfinite(hist["train/perceptual"]))
    assert hist["train/total"][-1] < hist["train/total"][0]
    states = learner.predict_states(ds)
    assert states.shape == (ds.n_samples, 4)
    assert np.all(np.isfinite(states))


def test_perceptual_combined_with_heads(synthetic_dataset, trained_dae,
                                        tmp_path):
    """perceptual + inverse with splits — the combination path through the
    registry (feature-space recon on its slice, CE on another)."""
    ds = synthetic_dataset
    cfg = SRLConfig(state_dim=6, img_height=32, img_width=32, batch_size=16,
                    epochs=1, losses=(("perceptual", 1.0), ("inverse", 2.0)),
                    split_dims=(("perceptual", 4), ("inverse", 2)),
                    n_actions=ds.n_actions, device_cache="on",
                    path_to_dae=trained_dae,
                    log_folder=str(tmp_path / "perc_inv"))
    learner = SRL4robotics(cfg, log_folder=cfg.log_folder)
    metrics = learner.learn(ds)
    assert np.isfinite(metrics["total"])
    assert "perceptual" in metrics and "inverse" in metrics


def test_perceptual_cli(tmp_path, monkeypatch):
    """The reference's two-stage recipe through train.py: train a DAE, then
    train a second model with --path-to-dae <dae_log>."""
    from srl_zoo_tpu.data.synthetic import generate_dataset
    from train import main as train_main

    data = str(tmp_path / "synth")
    generate_dataset(data, n_episodes=3, episode_len=20, img_size=32, seed=0)
    monkeypatch.chdir(tmp_path)
    dae_log = str(tmp_path / "dae")
    train_main(["--data-folder", data, "--losses", "dae",
                "--state-dim", "4", "-bs", "16", "--epochs", "1",
                "--log-folder", dae_log, "--no-display-plots"])
    perc_log = str(tmp_path / "perc")
    train_main(["--data-folder", data, "--losses", "perceptual",
                "--path-to-dae", dae_log,
                "--state-dim", "4", "-bs", "16", "--epochs", "2",
                "--log-folder", perc_log, "--no-display-plots"])
    hist = np.load(os.path.join(perc_log, "loss_history.npz"))
    assert "train/perceptual" in hist
    assert np.all(np.isfinite(hist["train/perceptual"]))
    out = np.load(os.path.join(perc_log, "states_rewards.npz"))
    assert np.all(np.isfinite(out["states"]))
