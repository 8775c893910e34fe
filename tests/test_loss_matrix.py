"""Matrix regression: every loss family trains one epoch through the full
learner in the production (HBM-cached, whole-epoch scan) mode."""

import numpy as np
import pytest

from srl_zoo_tpu.config import SRLConfig
from srl_zoo_tpu.training.learner import SRL4robotics

SINGLE_VIEW_CASES = [
    (("autoencoder", 1.0),),
    (("vae", 0.5),),
    (("dae", 1.0),),
    (("priors", 1.0),),
    (("forward", 1.0), ("inverse", 2.0), ("reward", 1.0)),
    (("episode-prior", 1.0),),
    (("reward-prior", 1.0),),
    (("autoencoder", 1.0), ("inverse", 2.0)),
]


@pytest.mark.parametrize("losses", SINGLE_VIEW_CASES,
                         ids=lambda l: "+".join(n for n, _ in l))
def test_loss_family_trains_cached(losses, synthetic_dataset, tmp_path):
    ds = synthetic_dataset
    cfg = SRLConfig(state_dim=4, img_height=32, img_width=32, batch_size=16,
                    epochs=1, losses=losses,
                    split_dims=tuple((n, -1) for n, _ in losses),
                    n_actions=ds.n_actions,
                    n_reward_classes=ds.n_reward_classes,
                    device_cache="on",
                    log_folder=str(tmp_path / "run"))
    learner = SRL4robotics(cfg, log_folder=cfg.log_folder)
    metrics = learner.learn(ds)
    assert np.isfinite(metrics["total"])
    states = learner.predict_states(ds)
    assert states.shape == (ds.n_samples, 4)
    assert np.all(np.isfinite(states))


def test_supervised_trains_cached(synthetic_dataset, tmp_path):
    ds = synthetic_dataset
    cfg = SRLConfig(state_dim=2, img_height=32, img_width=32, batch_size=16,
                    epochs=2, losses=(("supervised", 1.0),),
                    split_dims=(("supervised", -1),),
                    n_actions=ds.n_actions, device_cache="on",
                    log_folder=str(tmp_path / "sup"))
    learner = SRL4robotics(cfg, log_folder=cfg.log_folder)
    learner.learn(ds)
    hist = np.load(tmp_path / "sup" / "loss_history.npz")
    assert hist["train/total"][-1] < hist["train/total"][0]


def test_triplet_trains_cached(synthetic_dataset_mv, tmp_path):
    ds = synthetic_dataset_mv
    cfg = SRLConfig(state_dim=4, img_height=32, img_width=32, batch_size=16,
                    epochs=1, losses=(("triplet", 1.0),),
                    split_dims=(("triplet", -1),), multi_view=True,
                    n_actions=ds.n_actions, device_cache="on",
                    log_folder=str(tmp_path / "tri"))
    learner = SRL4robotics(cfg, log_folder=cfg.log_folder)
    metrics = learner.learn(ds)
    assert np.isfinite(metrics["total"])


def test_multiview_six_channel_trains_cached(synthetic_dataset_mv, tmp_path):
    ds = synthetic_dataset_mv
    cfg = SRLConfig(state_dim=4, img_height=32, img_width=32, batch_size=16,
                    epochs=1, losses=(("autoencoder", 1.0),),
                    split_dims=(("autoencoder", -1),), multi_view=True,
                    n_actions=ds.n_actions, device_cache="on",
                    log_folder=str(tmp_path / "mv"))
    learner = SRL4robotics(cfg, log_folder=cfg.log_folder)
    metrics = learner.learn(ds)
    assert np.isfinite(metrics["total"])

def test_mega_combination_with_splits(synthetic_dataset, tmp_path):
    """Everything at once: reconstruction + dynamics heads + priors +
    reward-prior + episode-prior, each routed to its own state slice."""
    ds = synthetic_dataset
    losses = (("autoencoder", 1.0), ("forward", 1.0), ("inverse", 2.0),
              ("reward", 1.0), ("priors", 1.0), ("reward-prior", 1.0),
              ("episode-prior", 1.0))
    splits = (("autoencoder", 6), ("forward", 2), ("inverse", -1),
              ("reward", -1), ("priors", 4), ("reward-prior", 2),
              ("episode-prior", 2))
    cfg = SRLConfig(state_dim=16, img_height=32, img_width=32, batch_size=16,
                    epochs=2, losses=losses, split_dims=splits,
                    n_actions=ds.n_actions,
                    n_reward_classes=ds.n_reward_classes,
                    device_cache="on",
                    log_folder=str(tmp_path / "mega"))
    learner = SRL4robotics(cfg, log_folder=cfg.log_folder)
    metrics = learner.learn(ds)
    assert np.isfinite(metrics["total"])
    hist = np.load(tmp_path / "mega" / "loss_history.npz")
    for name in ("autoencoder", "forward", "inverse", "reward", "priors",
                 "reward-prior", "episode-prior"):
        assert f"train/{name}" in hist, name
    states = learner.predict_states(ds)
    assert states.shape == (ds.n_samples, 16)


def test_dae_gaussian_noise_variant(synthetic_dataset, tmp_path):
    """DAE with the GaussianNoise corruption (reference custom_layers.py)."""
    ds = synthetic_dataset
    cfg = SRLConfig(state_dim=4, img_height=32, img_width=32, batch_size=16,
                    epochs=1, losses=(("dae", 1.0),),
                    split_dims=(("dae", -1),), noise_type="gaussian",
                    noise_std=0.3, device_cache="on",
                    log_folder=str(tmp_path / "gdae"))
    learner = SRL4robotics(cfg, log_folder=cfg.log_folder)
    metrics = learner.learn(ds)
    assert np.isfinite(metrics["total"])


def test_triplet_trains_sharded(synthetic_dataset_mv, tmp_path):
    """Sharded store covers BOTH view stores and the triplet negative
    gathers (arbitrary global indices through reduce-scatter)."""
    ds = synthetic_dataset_mv
    cfg = SRLConfig(state_dim=4, img_height=32, img_width=32, batch_size=16,
                    epochs=1, losses=(("triplet", 1.0),),
                    split_dims=(("triplet", -1),), multi_view=True,
                    n_actions=ds.n_actions, device_cache="sharded",
                    log_folder=str(tmp_path / "tri_sh"))
    learner = SRL4robotics(cfg, log_folder=cfg.log_folder)
    metrics = learner.learn(ds)
    assert np.isfinite(metrics["total"])


def test_priors_trains_hybrid(synthetic_dataset, tmp_path, monkeypatch):
    """Hybrid mode with pair-based losses: hot batches pair within the hot
    partition, cold batches stream with images — both finite and exported."""
    from srl_zoo_tpu.data import device_cache as dc

    ds = synthetic_dataset
    monkeypatch.setattr(dc, "DEFAULT_MAX_BYTES", 32 * 32 * 3 * 48)
    cfg = SRLConfig(state_dim=4, img_height=32, img_width=32, batch_size=8,
                    epochs=2, losses=(("priors", 1.0), ("reward", 1.0)),
                    split_dims=(("priors", -1), ("reward", -1)),
                    n_actions=ds.n_actions,
                    n_reward_classes=ds.n_reward_classes,
                    device_cache="auto",
                    log_folder=str(tmp_path / "pri_hy"))
    learner = SRL4robotics(cfg, log_folder=cfg.log_folder)
    metrics = learner.learn(ds)
    assert learner._cache_hot_n == 48
    assert np.isfinite(metrics["total"])
    states = learner.predict_states(ds)
    assert np.all(np.isfinite(states))


@pytest.mark.parametrize("model_type", ["mlp", "linear"])
def test_nonconv_encoders_train_end_to_end(model_type, synthetic_dataset,
                                           tmp_path):
    """The reference's DenseNetwork/LinearNetwork equivalents through the
    full learner (reference: models/models.py)."""
    ds = synthetic_dataset
    cfg = SRLConfig(state_dim=4, img_height=32, img_width=32, batch_size=16,
                    epochs=1, model_type=model_type,
                    losses=(("priors", 1.0),),
                    split_dims=(("priors", -1),),
                    n_actions=ds.n_actions, device_cache="on",
                    log_folder=str(tmp_path / model_type))
    learner = SRL4robotics(cfg, log_folder=cfg.log_folder)
    metrics = learner.learn(ds)
    assert np.isfinite(metrics["total"])


def test_episode_prior_separate_optimizer(synthetic_dataset, tmp_path):
    """--episode-prior-optimizer separate: the discriminator subtree gets
    its own Adam moments (optax.multi_transform), training stays finite
    (VERDICT r2 next #9) — and the two modes are EXACTLY equivalent at
    equal hyperparameters, because Adam is elementwise: partitioning
    disjoint parameter subtrees across two Adams with the same lr/betas
    changes no update (docs/DESIGN_DECISIONS.md #4, settled empirically in
    round 4: bit-identical loss history here and through 30-epoch
    RESULTS.md runs). The flag stays for upstream-parity diffing — it only
    matters if the discriminator ever gets different hyperparameters."""
    ds = synthetic_dataset
    hists = {}
    for mode in ("separate", "shared"):
        cfg = SRLConfig(state_dim=4, img_height=32, img_width=32,
                        batch_size=16, epochs=1,
                        losses=(("episode-prior", 1.0),
                                ("autoencoder", 1.0)),
                        split_dims=(("episode-prior", -1),
                                    ("autoencoder", -1)),
                        episode_prior_optimizer=mode,
                        n_actions=ds.n_actions, device_cache="on",
                        log_folder=str(tmp_path / f"ep_{mode}"))
        learner = SRL4robotics(cfg, log_folder=cfg.log_folder)
        if mode == "separate":
            # multi_transform wraps the two Adams in a per-label inner state
            import optax
            assert isinstance(learner.state.opt_state,
                              optax.MultiTransformState)
        metrics = learner.learn(ds)
        assert np.isfinite(metrics["total"])
        hists[mode] = np.load(tmp_path / f"ep_{mode}" / "loss_history.npz")
    assert "train/episode-prior/discriminator" in hists["separate"]
    for key in hists["shared"].files:
        np.testing.assert_array_equal(hists["shared"][key],
                                      hists["separate"][key],
                                      err_msg=key)


def test_random_features_cli(tmp_path, monkeypatch):
    """--losses random exports states from the frozen random encoder without
    training (reference: random-features baseline)."""
    import os

    from srl_zoo_tpu.data.synthetic import generate_dataset
    from train import main as train_main

    data = str(tmp_path / "synth")
    generate_dataset(data, n_episodes=3, episode_len=20, img_size=32, seed=0)
    monkeypatch.chdir(tmp_path)
    log = str(tmp_path / "rand")
    train_main(["--data-folder", data, "--losses", "random",
                "--state-dim", "4", "-bs", "16", "--epochs", "5",
                "--log-folder", log, "--no-display-plots"])
    out = np.load(os.path.join(log, "states_rewards.npz"))
    assert np.all(np.isfinite(out["states"]))
    assert os.path.exists(os.path.join(log, "srl_model.msgpack"))


def test_vae_plus_triplet_multiview(synthetic_dataset_mv, tmp_path):
    """Interaction case: reconstruction + metric losses with two views and
    splits (VAE reconstructs the anchor view; triplet uses its slice)."""
    ds = synthetic_dataset_mv
    cfg = SRLConfig(state_dim=8, img_height=32, img_width=32, batch_size=16,
                    epochs=1, losses=(("vae", 1.0), ("triplet", 1.0)),
                    split_dims=(("vae", 4), ("triplet", 4)),
                    multi_view=True, n_actions=ds.n_actions,
                    device_cache="on",
                    log_folder=str(tmp_path / "vt"))
    learner = SRL4robotics(cfg, log_folder=cfg.log_folder)
    metrics = learner.learn(ds)
    assert np.isfinite(metrics["total"])


def test_bfloat16_compute_end_to_end(synthetic_dataset, tmp_path):
    """--dtype bfloat16 (the TPU production dtype) through the full learner:
    finite losses, finite float32 state export."""
    ds = synthetic_dataset
    cfg = SRLConfig(state_dim=8, img_height=32, img_width=32, batch_size=16,
                    epochs=2, compute_dtype="bfloat16",
                    losses=(("autoencoder", 1.0), ("inverse", 1.0),
                            ("reward", 1.0)),
                    split_dims=(("autoencoder", 4), ("inverse", 2),
                                ("reward", 2)),
                    n_actions=ds.n_actions,
                    n_reward_classes=ds.n_reward_classes,
                    device_cache="on",
                    log_folder=str(tmp_path / "bf16"))
    learner = SRL4robotics(cfg, log_folder=cfg.log_folder)
    metrics = learner.learn(ds)
    assert np.isfinite(metrics["total"])
    states = learner.predict_states(ds)
    assert states.dtype == np.float32 and np.all(np.isfinite(states))
    hist = np.load(tmp_path / "bf16" / "loss_history.npz")
    assert hist["train/total"][-1] < hist["train/total"][0]


def test_fuzz_random_loss_combinations(synthetic_dataset, tmp_path):
    """Seeded fuzz over the combinatorial loss space the curated cases can't
    enumerate: random subsets with random weights and random split dims
    either train a finite step or raise a clean ValueError at config time —
    never a trace-time crash."""
    ds = synthetic_dataset
    pool = ["autoencoder", "vae", "dae", "priors", "forward", "inverse",
            "reward", "reward-prior", "episode-prior"]
    rng = np.random.RandomState(20260817)
    state_dim = 8
    ran = 0
    for trial in range(8):
        k = rng.randint(1, 4)
        names = list(rng.choice(pool, size=k, replace=False))
        losses = tuple((n, float(rng.choice([0.5, 1.0, 2.0]))) for n in names)
        if rng.rand() < 0.5:
            split_dims = tuple((n, -1) for n in names)
        else:
            # random explicit splits summing to state_dim (config contract)
            cuts = sorted(rng.choice(np.arange(1, state_dim), size=k - 1,
                                     replace=False)) if k > 1 else []
            sizes = np.diff([0] + list(cuts) + [state_dim])
            split_dims = tuple((n, int(s)) for n, s in zip(names, sizes))
        try:
            cfg = SRLConfig(state_dim=state_dim, img_height=32, img_width=32,
                            batch_size=16, epochs=1, losses=losses,
                            split_dims=split_dims,
                            n_actions=ds.n_actions,
                            n_reward_classes=ds.n_reward_classes,
                            device_cache="on",
                            log_folder=str(tmp_path / f"fuzz{trial}"))
        except ValueError:
            continue  # clean config-time rejection is a valid outcome
        learner = SRL4robotics(cfg, log_folder=cfg.log_folder)
        metrics = learner.learn(ds)
        assert np.isfinite(metrics["total"]), (names, split_dims)
        ran += 1
    assert ran >= 4  # the sampler must actually exercise trainable configs
