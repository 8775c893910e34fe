"""Training runtime: loss decreases, export/reload parity, resume."""

import jax
import numpy as np

from srl_zoo_tpu.config import SRLConfig
from srl_zoo_tpu.training import checkpoint as ckpt
from srl_zoo_tpu.training.learner import SRL4robotics


def _cfg(ds, tmp_path, losses=(("autoencoder", 1.0),), epochs=2, **kw):
    defaults = dict(state_dim=4, img_height=32, img_width=32, batch_size=16,
                    epochs=epochs, learning_rate=3e-3,
                    losses=losses,
                    split_dims=tuple((n, -1) for n, _ in losses),
                    n_actions=ds.n_actions,
                    n_reward_classes=ds.n_reward_classes,
                    data_folder=ds.data_folder,
                    log_folder=str(tmp_path / "run"))
    defaults.update(kw)
    return SRLConfig(**defaults)


def test_ae_loss_decreases(synthetic_dataset, tmp_path):
    cfg = _cfg(synthetic_dataset, tmp_path, epochs=3)
    learner = SRL4robotics(cfg, log_folder=cfg.log_folder)
    learner.learn(synthetic_dataset)
    hist = np.load(tmp_path / "run" / "loss_history.npz")
    train_total = hist["train/total"]
    assert train_total[-1] < train_total[0] * 0.9


def test_export_and_reload_same_states(synthetic_dataset, tmp_path):
    cfg = _cfg(synthetic_dataset, tmp_path, epochs=1)
    learner = SRL4robotics(cfg, log_folder=cfg.log_folder)
    learner.learn(synthetic_dataset)
    cfg.save(cfg.log_folder)
    states = learner.predict_states(synthetic_dataset)
    assert states.shape == (synthetic_dataset.n_samples, cfg.state_dim)

    reloaded = SRL4robotics.load(cfg.log_folder)
    states2 = reloaded.predict_states(synthetic_dataset)
    np.testing.assert_allclose(states, states2, rtol=1e-4, atol=1e-5)


def test_resume_checkpoint_round_trip(synthetic_dataset, tmp_path):
    cfg = _cfg(synthetic_dataset, tmp_path, epochs=1)
    learner = SRL4robotics(cfg, log_folder=cfg.log_folder)
    learner.learn(synthetic_dataset)
    restored = ckpt.restore_train_state(cfg.log_folder,
                                        jax.device_get(learner.state))
    assert restored is not None
    assert int(restored.step) == int(jax.device_get(learner.state.step))
    a = jax.tree_util.tree_leaves(restored.params)
    b = jax.tree_util.tree_leaves(jax.device_get(learner.state.params))
    for x, y in zip(a, b):
        np.testing.assert_allclose(x, y, rtol=1e-6)


def test_metrics_artifacts_written(synthetic_dataset, tmp_path):
    cfg = _cfg(synthetic_dataset, tmp_path, epochs=1)
    learner = SRL4robotics(cfg, log_folder=cfg.log_folder)
    learner.learn(synthetic_dataset)
    run = tmp_path / "run"
    assert (run / "srl_model.msgpack").exists()
    assert (run / "loss_history.npz").exists()
    assert (run / "metrics.jsonl").exists()
    assert (run / "checkpoints" / "state_latest.msgpack").exists()


def test_seed_determinism(synthetic_dataset, tmp_path):
    outs = []
    for run in range(2):
        cfg = _cfg(synthetic_dataset, tmp_path, epochs=1,
                   log_folder=str(tmp_path / f"run{run}"))
        learner = SRL4robotics(cfg, log_folder=cfg.log_folder)
        learner.learn(synthetic_dataset)
        outs.append(learner.predict_states(synthetic_dataset))
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-5, atol=1e-6)


def test_cached_scan_equals_streaming_steps(synthetic_dataset, tmp_path):
    """The cached whole-epoch lax.scan path computes the same gradients as
    per-step streaming batches. Compared under SGD: Adam's early-step
    update is ~lr*sign(grad), which amplifies benign float-reassociation
    differences between the two compiled programs into meaningless noise."""
    import optax

    from srl_zoo_tpu.data import device_cache as dc
    from srl_zoo_tpu.parallel.mesh import (make_mesh, replicated_sharding,
                                           shard_batch, shard_stacked_batch)
    from srl_zoo_tpu.training.learner import _stack_batches
    from srl_zoo_tpu.training.state import create_train_state
    from srl_zoo_tpu.training.train_step import build_steps
    from srl_zoo_tpu.data.loader import DataLoader

    ds = synthetic_dataset
    cfg = _cfg(ds, tmp_path, epochs=1)
    mesh = make_mesh(jax.devices()[:1])
    cache = dc.build_cache(ds, mesh, needs_view2=False)
    idx = ds.training_indices()[:32]
    rng_key = jax.random.PRNGKey(3)

    results = []
    for scan_mode in (False, True):
        model, state, _ = create_train_state(cfg, jax.random.PRNGKey(0))
        tx = optax.sgd(0.05)
        state = state.replace(opt_state=tx.init(state.params))
        ts, _, _, tep, _ = build_steps(cfg, model, tx)
        state = jax.device_put(state, replicated_sharding(mesh))
        if scan_mode:
            loader = DataLoader(ds, idx, cfg, shuffle=False, seed=0,
                                emit_images=False)
            stacked = _stack_batches(list(loader))
            state, _ = tep(state, shard_stacked_batch(stacked, mesh),
                           rng_key, cache)
        else:
            loader = DataLoader(ds, idx, cfg, shuffle=False, seed=0,
                                emit_images=True)
            for batch in loader:
                state, _ = ts(state, shard_batch(batch, mesh), rng_key, None)
        results.append(jax.device_get(state.params))
    for a, b in zip(jax.tree_util.tree_leaves(results[0]),
                    jax.tree_util.tree_leaves(results[1])):
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-5)


def test_cached_reaches_same_quality_as_streaming(synthetic_dataset,
                                                  tmp_path):
    """End to end, both operating modes reach equivalent representations
    (quality-level check; bitwise equality is not defined across the two
    compiled programs under Adam)."""
    from srl_zoo_tpu.evaluation.knn import knn_mse
    scores = {}
    for mode in ("on", "off"):
        cfg = _cfg(synthetic_dataset, tmp_path, epochs=3,
                   log_folder=str(tmp_path / f"cache_{mode}"),
                   device_cache=mode)
        learner = SRL4robotics(cfg, log_folder=cfg.log_folder)
        learner.learn(synthetic_dataset)
        states = learner.predict_states(synthetic_dataset)
        scores[mode], _, _ = knn_mse(
            states, synthetic_dataset.ground_truth_states, k=3)
    assert scores["on"] < 0.05 and scores["off"] < 0.05
    assert abs(scores["on"] - scores["off"]) < 0.02


def test_cached_triplet_and_dae(synthetic_dataset_mv, tmp_path):
    """Cache mode covers triplet (view-2 + negative gathers) and DAE."""
    ds = synthetic_dataset_mv
    cfg = _cfg(ds, tmp_path, losses=(("triplet", 1.0),), epochs=1,
               multi_view=True, device_cache="on",
               log_folder=str(tmp_path / "trip"))
    SRL4robotics(cfg, log_folder=cfg.log_folder).learn(ds)
    cfg = _cfg(ds, tmp_path, losses=(("dae", 1.0),), epochs=1,
               multi_view=False, device_cache="on",
               log_folder=str(tmp_path / "dae"))
    SRL4robotics(cfg, log_folder=cfg.log_folder).learn(ds)


def test_inference_state_encoder(synthetic_dataset, tmp_path):
    """StateEncoder.load reproduces the training-time export exactly."""
    from srl_zoo_tpu.inference import StateEncoder

    ds = synthetic_dataset
    cfg = _cfg(ds, tmp_path, epochs=1, log_folder=str(tmp_path / "inf"))
    learner = SRL4robotics(cfg, log_folder=cfg.log_folder)
    learner.learn(ds)
    cfg.save(cfg.log_folder)
    exported = learner.predict_states(ds)

    enc = StateEncoder.load(cfg.log_folder, max_batch=8)
    # single observation
    s0 = enc.encode(np.asarray(ds.frames[0]))
    assert s0.shape == (cfg.state_dim,)
    np.testing.assert_allclose(s0, exported[0], rtol=1e-4, atol=1e-5)
    # non-multiple-of-max-batch batch (padding path)
    s = enc.encode(np.asarray(ds.frames[:11]))
    np.testing.assert_allclose(s, exported[:11], rtol=1e-4, atol=1e-5)


def test_episode_prior_adversarial_dynamics(synthetic_dataset, tmp_path):
    """The adversarial game reaches its intended equilibrium: the encoder
    makes episodes indistinguishable, so the discriminator's BCE hovers at
    chance (ln 2 ~ 0.693) instead of winning — and nothing diverges."""
    ds = synthetic_dataset
    cfg = _cfg(ds, tmp_path, losses=(("episode-prior", 1.0),), epochs=6,
               log_folder=str(tmp_path / "ep"))
    learner = SRL4robotics(cfg, log_folder=cfg.log_folder)
    learner.learn(ds)
    hist = np.load(tmp_path / "ep" / "loss_history.npz")
    d_loss = hist["train/episode-prior/discriminator"]
    e_loss = hist["train/episode-prior"]
    assert np.all(np.isfinite(hist["train/total"]))
    # neither side collapses: both BCEs stay in a band around chance
    assert 0.5 < d_loss[-1] < 0.9
    assert 0.5 < e_loss[-1] < 0.9
