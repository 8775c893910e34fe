"""Multi-device without a cluster (SURVEY.md §4.4): the DP mesh path on 8
virtual CPU devices must agree with single-device training on the same
global batch."""

import jax
import numpy as np

from srl_zoo_tpu.config import SRLConfig
from srl_zoo_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                       replicated_sharding, shard_batch)
from srl_zoo_tpu.training.state import create_train_state
from srl_zoo_tpu.training.train_step import build_steps


def _cfg(b):
    return SRLConfig(state_dim=8, img_height=32, img_width=32, batch_size=b,
                     losses=(("autoencoder", 1.0), ("inverse", 1.0)),
                     split_dims=(("autoencoder", -1), ("inverse", -1)),
                     n_actions=4, n_reward_classes=3)


def _batch(b, rng):
    return {
        "obs": rng.randint(0, 255, (b, 32, 32, 3), dtype=np.uint8),
        "next_obs": rng.randint(0, 255, (b, 32, 32, 3), dtype=np.uint8),
        "actions": rng.randint(0, 4, (b,)).astype(np.int32),
        "reward_classes": rng.randint(0, 3, (b,)).astype(np.int32),
        "rewards": rng.randn(b).astype(np.float32),
        "valid": np.ones(b, np.float32),
        "indices": np.arange(b, dtype=np.int32),
    }


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def _one_step(devices, batch):
    """One SGD step (SGD, not Adam: Adam's first-step update is
    ~lr*sign(grad), which amplifies benign reduction-order float noise and
    would make cross-mesh comparison meaningless)."""
    import optax

    cfg = _cfg(len(batch["valid"]))
    mesh = make_mesh(devices)
    model, state, _ = create_train_state(cfg, jax.random.PRNGKey(0))
    tx = optax.sgd(0.1)
    state = state.replace(opt_state=tx.init(state.params))
    train_step, eval_step, _, _, _ = build_steps(cfg, model, tx)
    state = jax.device_put(state, replicated_sharding(mesh))
    sharded = shard_batch(batch, mesh)
    state, metrics = train_step(state, sharded, jax.random.PRNGKey(42))
    return (jax.device_get(metrics["total"]),
            jax.device_get(state.params))


def test_dp_mesh_matches_single_device(rng):
    batch = _batch(16, rng)
    loss_1, params_1 = _one_step(jax.devices()[:1], batch)
    loss_8, params_8 = _one_step(jax.devices()[:8], batch)
    assert np.allclose(loss_1, loss_8, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(params_1),
                    jax.tree_util.tree_leaves(params_8)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_batch_sharding_layout(rng):
    mesh = make_mesh(jax.devices())
    batch = _batch(16, rng)
    sharded = shard_batch(batch, mesh)
    sh = sharded["obs"].sharding
    assert sh == batch_sharding(mesh)
    # each device holds 1/8 of the batch
    shard_shape = sh.shard_shape(sharded["obs"].shape)
    assert shard_shape[0] == 2


def test_priors_pair_gather_across_shards(rng):
    """Partner gathers cross device boundaries (global batch semantics)."""
    b = 16
    cfg = SRLConfig(state_dim=4, img_height=32, img_width=32, batch_size=b,
                    losses=(("priors", 1.0),),
                    split_dims=(("priors", -1),), n_actions=4)
    batch = _batch(b, rng)
    # partner i <-> b-1-i: every gather crosses shards on an 8-way mesh
    batch["same_action_partners"] = (b - 1 - np.arange(b)).astype(np.int32)
    batch["same_action_mask"] = np.ones(b, np.float32)
    batch["dissimilar_partners"] = (b - 1 - np.arange(b)).astype(np.int32)
    batch["dissimilar_mask"] = np.ones(b, np.float32)

    results = []
    for devs in (jax.devices()[:1], jax.devices()[:8]):
        mesh = make_mesh(devs)
        model, state, tx = create_train_state(cfg, jax.random.PRNGKey(0))
        train_step, _, _, _, _ = build_steps(cfg, model, tx)
        state = jax.device_put(state, replicated_sharding(mesh))
        _, metrics = train_step(state, shard_batch(batch, mesh),
                                jax.random.PRNGKey(1))
        results.append(float(jax.device_get(metrics["total"])))
    assert np.allclose(results[0], results[1], rtol=1e-5)


def test_epoch_scan_on_mesh(rng):
    """The whole-epoch lax.scan runner compiles and runs over the 8-device
    mesh with the HBM cache (the production configuration)."""
    from srl_zoo_tpu.parallel.mesh import shard_stacked_batch

    b, n_steps = 16, 3
    cfg = _cfg(b)
    mesh = make_mesh(jax.devices())
    model, state, tx = create_train_state(cfg, jax.random.PRNGKey(0))
    _, _, _, train_epoch, eval_epoch = build_steps(cfg, model, tx)
    state = jax.device_put(state, replicated_sharding(mesh))
    frames = rng.randint(0, 255, (40, 32, 32, 3), dtype=np.uint8)
    cache = {"frames": jax.device_put(frames, replicated_sharding(mesh))}
    stacked = {
        "indices": rng.randint(0, 39, (n_steps, b)).astype(np.int32),
        "actions": rng.randint(0, 4, (n_steps, b)).astype(np.int32),
        "reward_classes": rng.randint(0, 3, (n_steps, b)).astype(np.int32),
        "rewards": rng.randn(n_steps, b).astype(np.float32),
        "valid": np.ones((n_steps, b), np.float32),
    }
    sharded = shard_stacked_batch(stacked, mesh)
    state, metrics = train_epoch(state, sharded, jax.random.PRNGKey(1),
                                 cache)
    totals = np.asarray(jax.device_get(metrics["total"]))
    assert totals.shape == (n_steps,)
    assert np.all(np.isfinite(totals))
    assert int(jax.device_get(state.step)) == n_steps
    ev = eval_epoch(state, sharded, jax.random.PRNGKey(2), cache)
    assert np.all(np.isfinite(np.asarray(jax.device_get(ev["total"]))))


def test_sharded_store_gather_matches_take(rng):
    from jax.sharding import NamedSharding, PartitionSpec as P

    from srl_zoo_tpu.ops.sharded_store import gather_sharded, shard_frames

    mesh = make_mesh()
    frames = rng.randint(0, 255, (37, 8, 8, 3)).astype(np.uint8)
    fs = shard_frames(frames, mesh)
    assert fs.shape[0] == 40  # padded to a multiple of 8
    idx = rng.randint(0, 37, 16).astype(np.int32)
    idx_dev = jax.device_put(idx, NamedSharding(mesh, P("data")))
    out = jax.jit(lambda f, i: gather_sharded(f, i, mesh))(fs, idx_dev)
    np.testing.assert_array_equal(np.asarray(jax.device_get(out)),
                                  frames[idx])


def test_sharded_cache_training_matches_replicated(synthetic_dataset,
                                                   tmp_path):
    """device_cache='sharded' (store sharded over the 8-device mesh,
    reduce-scatter gathers) must train bit-identically to the replicated
    cache (ops/sharded_store.py)."""
    from srl_zoo_tpu.config import SRLConfig
    from srl_zoo_tpu.training.learner import SRL4robotics

    ds = synthetic_dataset
    hists = {}
    for mode in ("on", "sharded"):
        cfg = SRLConfig(state_dim=4, img_height=32, img_width=32,
                        batch_size=16, epochs=2, learning_rate=3e-3,
                        losses=(("autoencoder", 1.0), ("inverse", 1.0)),
                        split_dims=(("autoencoder", -1), ("inverse", -1)),
                        n_actions=ds.n_actions,
                        n_reward_classes=ds.n_reward_classes,
                        device_cache=mode,
                        log_folder=str(tmp_path / mode))
        learner = SRL4robotics(cfg, log_folder=cfg.log_folder)
        learner.learn(ds)
        hists[mode] = np.load(tmp_path / mode / "loss_history.npz")

    np.testing.assert_allclose(hists["on"]["train/total"],
                               hists["sharded"]["train/total"], rtol=1e-6)
    np.testing.assert_allclose(hists["on"]["val/total"],
                               hists["sharded"]["val/total"], rtol=1e-6)


def test_mesh_spans_processes_and_local_slicing():
    """shard_array/shard_batch key their multi-process row slicing on
    whether the MESH spans processes, not on jax.process_count(): a
    process-local mesh inside a distributed job must take the plain
    device_put path or each process silently feeds the wrong contiguous
    slice of its own full batch (ADVICE r4)."""
    import numpy as np

    from srl_zoo_tpu.parallel import mesh as pm

    m = pm.make_mesh()
    # single-process run: no mesh here spans processes
    assert pm.mesh_spans_processes(m) is False
    # and even if the global process count were >1 (monkeypatched), a
    # process-local mesh must still take the plain device_put path
    orig = jax.process_count
    try:
        jax.process_count = lambda: 2
        arr = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
        out = pm.shard_array(arr, m)
        np.testing.assert_array_equal(np.asarray(out), arr)
        batch = {"obs": arr, "valid": np.ones(16, np.float32)}
        sharded = pm.shard_batch(batch, m)
        np.testing.assert_array_equal(np.asarray(sharded["obs"]), arr)
    finally:
        jax.process_count = orig


def test_mesh_process_slot_subset_meshes(monkeypatch):
    """Batch slicing is derived from the MESH's own process set (first-
    appearance order along the data axis), not jax.process_count(): a mesh
    spanning a strict subset of a job's processes gets correct halves, and
    a non-member process raises instead of feeding rows it does not own."""
    import types

    import pytest

    from srl_zoo_tpu.parallel import mesh as pm

    class D:
        def __init__(self, p):
            self.process_index = p

    m = types.SimpleNamespace(
        devices=np.array([D(2), D(2), D(5), D(5)], dtype=object))
    monkeypatch.setattr(pm.jax, "process_index", lambda: 2)
    assert pm._mesh_process_slot(m) == (2, 0)
    monkeypatch.setattr(pm.jax, "process_index", lambda: 5)
    assert pm._mesh_process_slot(m) == (2, 1)
    monkeypatch.setattr(pm.jax, "process_index", lambda: 0)
    with pytest.raises(ValueError, match="owns no devices"):
        pm._mesh_process_slot(m)
