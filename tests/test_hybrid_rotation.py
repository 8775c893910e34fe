"""Rotating-residency hybrid cache (data/hybrid.py; VERDICT r3 weak #1 /
next #2).

The store invariant under test everywhere: after any committed rotation, for
every resident row r, the device store's slot ``slot_of[r]`` holds exactly
``dataset.frames[r]`` — whether the bytes arrived via the initial upload, a
cold-batch adoption scatter, the memmap sweep, or a resume replay.
"""

import numpy as np
import pytest

from srl_zoo_tpu.config import SRLConfig
from srl_zoo_tpu.data.hybrid import RotatingHotStore
from srl_zoo_tpu.training.learner import SRL4robotics


def _cfg(ds, tmp_path, name="run", **kw):
    defaults = dict(state_dim=4, img_height=32, img_width=32, batch_size=8,
                    epochs=3, losses=(("autoencoder", 1.0),),
                    split_dims=(("autoencoder", -1),),
                    n_actions=ds.n_actions,
                    n_reward_classes=ds.n_reward_classes,
                    log_folder=str(tmp_path / name))
    defaults.update(kw)
    return SRLConfig(**defaults)


def _store_matches_dataset(store, ds):
    """Every resident row's slot holds that row's exact frame bytes."""
    import jax
    frames = np.asarray(jax.device_get(store.cache["frames"]))
    resident = np.nonzero(store.slot_of >= 0)[0]
    assert len(resident) == store.hot_n
    np.testing.assert_array_equal(frames[store.slot_of[resident]],
                                  np.asarray(ds.frames[resident]))
    if store.needs_view2:
        frames_2 = np.asarray(jax.device_get(store.cache["frames_2"]))
        np.testing.assert_array_equal(frames_2[store.slot_of[resident]],
                                      np.asarray(ds.frames_2[resident]))


def test_window_rotation_determinism(synthetic_dataset, tmp_path):
    """The window schedule is a pure function of (n, hot_n, epoch): an
    incrementally advanced store and a replayed one land on identical slot
    maps and identical device bytes."""
    ds = synthetic_dataset
    cfg = _cfg(ds, tmp_path)
    mesh = SRL4robotics(cfg, log_folder=cfg.log_folder).mesh

    inc = RotatingHotStore(ds, mesh, cfg, hot_n=40)
    for _ in range(5):
        inc.begin_epoch()
        inc.advance()  # no adoption: everything sweeps from the memmap

    rep = RotatingHotStore(ds, mesh, cfg, hot_n=40)
    rep.replay_to(5)

    assert inc.start == rep.start == (5 * (ds.n_samples - 40)) % ds.n_samples
    np.testing.assert_array_equal(inc.slot_of, rep.slot_of)
    _store_matches_dataset(inc, ds)
    _store_matches_dataset(rep, ds)


def test_rotation_covers_every_row(synthetic_dataset, tmp_path):
    """Across a full cycle every row is resident at some epoch and cold at
    some epoch — the uniform-coverage property that fixes the static-prefix
    bias (VERDICT r3 weak #1)."""
    ds = synthetic_dataset
    cfg = _cfg(ds, tmp_path, name="cover")
    mesh = SRL4robotics(cfg, log_folder=cfg.log_folder).mesh
    store = RotatingHotStore(ds, mesh, cfg, hot_n=40)
    n = ds.n_samples
    ever_hot = np.zeros(n, bool)
    ever_cold = np.zeros(n, bool)
    cycle = int(np.ceil(n / (n - 40))) + 1
    for _ in range(cycle):
        res = store.slot_of >= 0
        ever_hot |= res
        ever_cold |= ~res
        store.begin_epoch()
        store.advance()
    assert ever_hot.all() and ever_cold.all()


def test_adoption_scatter_uses_streamed_bytes(synthetic_dataset, tmp_path):
    """maybe_adopt with a device batch must land the entering rows' exact
    bytes in the vacated slots and ignore non-entering rows; rows adopted
    mid-epoch must NOT be re-uploaded by the sweep."""
    import jax

    from srl_zoo_tpu.parallel.mesh import shard_batch

    ds = synthetic_dataset
    cfg = _cfg(ds, tmp_path, name="adopt")
    learner = SRL4robotics(cfg, log_folder=cfg.log_folder)
    store = RotatingHotStore(ds, learner.mesh, cfg, hot_n=40)
    store.begin_epoch()
    entering = store._entering
    assert len(entering) > 0
    # a batch mixing entering rows with already-resident rows
    some = np.concatenate([entering[:4], np.arange(4)]).astype(np.int32)
    batch = {"indices": some,
             "obs": np.asarray(ds.frames[some]),
             "valid": np.ones(len(some), np.float32)}
    sharded = shard_batch(batch, learner.mesh)
    store.maybe_adopt(batch["indices"], sharded)
    assert store._adopted[entering[:4]].all()
    assert not store._adopted[np.arange(4)].any()
    frames = np.asarray(jax.device_get(store.cache["frames"]))
    np.testing.assert_array_equal(
        frames[store._pending_slot[entering[:4]]],
        np.asarray(ds.frames[entering[:4]]))
    store.advance()
    _store_matches_dataset(store, ds)


@pytest.mark.parametrize("losses,fixture", [
    ((("autoencoder", 1.0),), "synthetic_dataset"),
    ((("triplet", 1.0),), "synthetic_dataset_mv"),
])
def test_e2e_hybrid_rotation_store_consistency(losses, fixture, tmp_path,
                                               monkeypatch, request):
    """Full learner runs (AE; triplet multi-view with slot-addressed
    negatives + view-2 adoption) keep the store byte-consistent with the
    dataset after every committed rotation, and train/val losses stay
    finite."""
    from srl_zoo_tpu.data import device_cache as dc

    ds = request.getfixturevalue(fixture)
    needs_view2 = losses[0][0] == "triplet"
    per = 32 * 32 * 3 * (2 if needs_view2 else 1)
    monkeypatch.setattr(dc, "DEFAULT_MAX_BYTES", per * 40)
    cfg = _cfg(ds, tmp_path, name="e2e",
               losses=losses, split_dims=((losses[0][0], -1),),
               multi_view=needs_view2, epochs=3)
    learner = SRL4robotics(cfg, log_folder=cfg.log_folder)
    metrics = learner.learn(ds)
    assert np.isfinite(metrics["total"])
    store = learner._hot_store
    assert store is not None and store.rotate
    assert store.epoch == 3  # one committed rotation per epoch
    assert store.start == (3 * (ds.n_samples - 40)) % ds.n_samples
    _store_matches_dataset(store, ds)
    # export through the rotated window == pure streaming export
    states_hybrid = learner.predict_states(ds)
    learner.cfg = cfg.replace(device_cache="off")
    learner._cache = learner._cache_key = learner._hot_store = None
    learner._cache_hot_n = None
    states_stream = learner.predict_states(ds)
    np.testing.assert_allclose(states_hybrid, states_stream, atol=1e-5)


def test_rotation_off_keeps_static_prefix(synthetic_dataset, tmp_path,
                                          monkeypatch):
    """--no-hybrid-rotation reproduces the round-3 behavior: the window
    stays pinned at the index prefix across epochs."""
    from srl_zoo_tpu.data import device_cache as dc

    ds = synthetic_dataset
    monkeypatch.setattr(dc, "DEFAULT_MAX_BYTES", 32 * 32 * 3 * 40)
    cfg = _cfg(ds, tmp_path, name="static", hybrid_rotation=False, epochs=2)
    learner = SRL4robotics(cfg, log_folder=cfg.log_folder)
    metrics = learner.learn(ds)
    assert np.isfinite(metrics["total"])
    store = learner._hot_store
    assert store is not None and not store.rotate
    assert store.start == 0 and store.epoch == 0
    idx = np.arange(ds.n_samples)
    np.testing.assert_array_equal(store.resident_mask(idx), idx < 40)
    _store_matches_dataset(store, ds)


def test_resume_replays_window(synthetic_dataset, tmp_path, monkeypatch):
    """A resumed hybrid run fast-forwards the window to the recorded epoch:
    finishing 1+2 epochs across two processes leaves the same store position
    as 3 epochs straight through."""
    from srl_zoo_tpu.data import device_cache as dc

    ds = synthetic_dataset
    monkeypatch.setattr(dc, "DEFAULT_MAX_BYTES", 32 * 32 * 3 * 40)
    cfg = _cfg(ds, tmp_path, name="resume", epochs=1)
    learner = SRL4robotics(cfg, log_folder=cfg.log_folder)
    learner.learn(ds)

    cfg3 = cfg.replace(epochs=3)
    cfg3.save(cfg.log_folder)
    learner2 = SRL4robotics(cfg3, log_folder=cfg.log_folder)
    learner2.learn(ds, resume=True)
    store = learner2._hot_store
    assert store.epoch == 3
    assert store.start == (3 * (ds.n_samples - 40)) % ds.n_samples
    _store_matches_dataset(store, ds)
