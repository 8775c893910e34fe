"""Host loader: static shapes, transition validity, per-loss batch fields."""

import numpy as np

from srl_zoo_tpu.config import SRLConfig
from srl_zoo_tpu.data.loader import DataLoader


def _cfg(ds, losses=(("autoencoder", 1.0),), **kw):
    defaults = dict(state_dim=4, img_height=32, img_width=32, batch_size=8,
                    losses=losses,
                    split_dims=tuple((n, -1) for n, _ in losses),
                    n_actions=ds.n_actions,
                    n_reward_classes=ds.n_reward_classes)
    defaults.update(kw)
    return SRLConfig(**defaults)


def test_training_indices_skip_episode_ends(synthetic_dataset):
    ds = synthetic_dataset
    idx = ds.training_indices()
    # no index may point at an episode-final frame
    assert not np.any(ds.episode_starts[idx + 1])
    assert idx.max() < ds.n_samples - 1


def test_static_shapes_and_wraparound(synthetic_dataset):
    ds = synthetic_dataset
    cfg = _cfg(ds)
    idx = ds.training_indices()[:20]  # 20 samples, batch 8 -> 2 full + 1 wrap
    loader = DataLoader(ds, idx, cfg, shuffle=True, seed=0, wraparound=True)
    batches = list(loader)
    assert len(batches) == len(loader) == 3
    for b in batches:
        assert b["obs"].shape == (8, 32, 32, 3)
        assert b["obs"].dtype == np.uint8
        assert b["valid"].sum() == 8


def test_padded_final_batch(synthetic_dataset):
    ds = synthetic_dataset
    cfg = _cfg(ds)
    idx = np.arange(10, dtype=np.int32)
    loader = DataLoader(ds, idx, cfg, shuffle=False, seed=0, wraparound=False)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[1]["valid"].sum() == 2  # 10 = 8 + 2
    # padded entries flagged invalid
    assert np.all(batches[1]["valid"][2:] == 0)


def test_next_obs_is_successor_frame(synthetic_dataset):
    ds = synthetic_dataset
    cfg = _cfg(ds, losses=(("forward", 1.0),))
    idx = ds.training_indices()[:8]
    batch = next(iter(DataLoader(ds, idx, cfg, shuffle=False, seed=0)))
    assert "next_obs" in batch
    for k, i in enumerate(batch["indices"]):
        np.testing.assert_array_equal(batch["next_obs"][k], ds.frames[i + 1])
        np.testing.assert_array_equal(batch["obs"][k], ds.frames[i])


def test_priors_batch_fields(synthetic_dataset):
    ds = synthetic_dataset
    cfg = _cfg(ds, losses=(("priors", 1.0),))
    batch = next(iter(DataLoader(ds, ds.training_indices()[:16], cfg,
                                 shuffle=False, seed=0)))
    b = cfg.batch_size
    for key in ("same_action_partners", "same_action_mask",
                "dissimilar_partners", "dissimilar_mask"):
        assert batch[key].shape == (b,)
    acts = batch["actions"]
    for i in range(b):
        if batch["same_action_mask"][i]:
            assert acts[batch["same_action_partners"][i]] == acts[i]


def test_multiview_six_channels(synthetic_dataset_mv):
    ds = synthetic_dataset_mv
    cfg = _cfg(ds, losses=(("autoencoder", 1.0),), multi_view=True)
    batch = next(iter(DataLoader(ds, ds.training_indices()[:8], cfg,
                                 shuffle=False, seed=0)))
    assert batch["obs"].shape == (8, 32, 32, 6)


def test_triplet_batch(synthetic_dataset_mv):
    ds = synthetic_dataset_mv
    cfg = _cfg(ds, losses=(("triplet", 1.0),), multi_view=True)
    batch = next(iter(DataLoader(ds, ds.training_indices()[:8], cfg,
                                 shuffle=False, seed=0)))
    assert batch["obs"].shape == (8, 32, 32, 3)
    assert batch["pos_obs"].shape == (8, 32, 32, 3)
    assert batch["neg_obs"].shape == (8, 32, 32, 3)
    # positive is the second view of the SAME frame
    for k, i in enumerate(batch["indices"]):
        np.testing.assert_array_equal(batch["pos_obs"][k], ds.frames_2[i])


def test_episode_prior_batch(synthetic_dataset):
    ds = synthetic_dataset
    cfg = _cfg(ds, losses=(("episode-prior", 1.0),))
    batch = next(iter(DataLoader(ds, ds.training_indices()[:8], cfg,
                                 shuffle=False, seed=0)))
    ep_all = ds.episode_ids
    ep = ep_all[batch["indices"]]
    for i in range(8):
        j = batch["episode_partners"][i]
        assert batch["episode_labels"][i] == float(ep[j] == ep[i])


def test_loader_determinism(synthetic_dataset):
    ds = synthetic_dataset
    cfg = _cfg(ds)
    idx = ds.training_indices()
    b1 = list(DataLoader(ds, idx, cfg, shuffle=True, seed=7))
    b2 = list(DataLoader(ds, idx, cfg, shuffle=True, seed=7))
    np.testing.assert_array_equal(b1[0]["indices"], b2[0]["indices"])


def test_reward_arrival_convention(tmp_path):
    """Training-schema convention: rewards[t] = reward received upon ARRIVING
    at frame t, so the loader's rewards[idx+1] read yields the reward of
    transition idx (ADVICE r1: generator/loader previously disagreed)."""
    from srl_zoo_tpu.data.schema import load_dataset
    from srl_zoo_tpu.data.synthetic import generate_dataset

    folder = str(tmp_path / "conv")
    generate_dataset(folder, n_episodes=3, episode_len=30, img_size=16, seed=3)
    ds = load_dataset(folder)

    # episode starts carry reward 0 (no arrival transition)
    assert np.all(ds.rewards[ds.episode_starts] == 0.0)

    # re-simulate the generator's deterministic dynamics (same seed/rng call
    # order) and check rewards[t+1] == reward of the transition t -> t+1.
    rng2 = np.random.RandomState(3)
    moves = 0.08 * np.array([[1, 0], [-1, 0], [0, 1], [0, -1]], np.float32)
    target = np.array([0.85, 0.85], np.float32)
    t = 0
    for _ in range(3):  # n_episodes
        pos = rng2.uniform(0.1, 0.9, size=2).astype(np.float32)
        for step in range(30):  # episode_len
            a = int(rng2.randint(4))
            assert ds.actions[t] == a
            np.testing.assert_allclose(ds.ground_truth_states[t], pos,
                                       atol=1e-6)
            new_pos = pos + moves[a]
            hit_wall = bool(np.any(new_pos < 0.02) or np.any(new_pos > 0.98))
            new_pos = np.clip(new_pos, 0.02, 0.98)
            at_target = bool(np.linalg.norm(new_pos - target) < 0.1)
            r = 1.0 if at_target else (-1.0 if hit_wall else 0.0)
            if step < 29:  # transition t -> t+1 stays within the episode
                assert ds.rewards[t + 1] == r, (t, r, ds.rewards[t + 1])
            pos = new_pos
            t += 1


def test_preprocess_shifts_recorded_rewards(tmp_path):
    """record() stores env.step semantics (reward of acting at frame t);
    preprocess_folder must shift to arrival semantics."""
    from srl_zoo_tpu.data.record import DatasetRecorder
    from srl_zoo_tpu.preprocessing.preprocess import preprocess_folder

    folder = str(tmp_path / "rec")
    rec = DatasetRecorder(folder)
    obs = np.zeros((16, 16, 3), np.uint8)
    for ep in range(2):
        rec.new_episode()
        for t in range(4):
            rec.record(obs, action=t % 2, reward=float(10 * ep + t),
                       ground_truth_state=np.zeros(2, np.float32))
    rec.close()
    preprocess_folder(folder)
    pre = np.load(folder + "/preprocessed_data.npz")
    # arrival convention: [0, r0, r1, r2] per episode (final r3 dropped)
    np.testing.assert_allclose(pre["rewards"],
                               [0, 0, 1, 2, 0, 10, 11, 12])
    np.testing.assert_allclose(pre["episode_starts"],
                               [1, 0, 0, 0, 1, 0, 0, 0])


def test_record_multiview_to_triplet_training(tmp_path):
    """Full multi-view lifecycle: record two camera views -> preprocess
    (images_path_2 + frames_2.npy) -> train triplet on the result."""
    from srl_zoo_tpu.data.record import DatasetRecorder
    from srl_zoo_tpu.data.schema import load_dataset
    from srl_zoo_tpu.preprocessing.preprocess import main as preprocess_main
    from srl_zoo_tpu.training.learner import SRL4robotics

    rng = np.random.RandomState(0)
    folder = str(tmp_path / "mv")
    rec = DatasetRecorder(folder)
    for ep in range(3):
        rec.new_episode()
        for t in range(20):
            obs = rng.randint(0, 255, (32, 32, 3), np.uint8)
            obs2 = rng.randint(0, 255, (32, 32, 3), np.uint8)
            rec.record(obs, action=t % 4, reward=0.0,
                       ground_truth_state=rng.randn(2).astype(np.float32),
                       obs_2=obs2)
    rec.close()
    preprocess_main(["--data-folder", folder, "--img-size", "32"])

    ds = load_dataset(folder)
    assert ds.images_path_2 is not None and ds.frames_2 is not None
    assert ds.frames_2.shape == ds.frames.shape

    cfg = SRLConfig(state_dim=4, img_height=32, img_width=32, batch_size=8,
                    epochs=1, losses=(("triplet", 1.0),),
                    split_dims=(("triplet", -1),), multi_view=True,
                    n_actions=4, log_folder=str(tmp_path / "run"))
    metrics = SRL4robotics(cfg, log_folder=cfg.log_folder).learn(ds)
    assert np.isfinite(metrics["total"])


def test_eval_loader_pairs_fixed_across_epochs(synthetic_dataset):
    """shuffle=False (eval) loaders must draw IDENTICAL pair partners every
    epoch — otherwise best-val selection compares losses over different
    pair sets (review r2). Train loaders still re-draw per epoch."""
    ds = synthetic_dataset
    cfg = SRLConfig(state_dim=4, img_height=32, img_width=32, batch_size=16,
                    epochs=1, losses=(("priors", 1.0),),
                    split_dims=(("priors", -1),),
                    n_actions=ds.n_actions,
                    n_reward_classes=ds.n_reward_classes,
                    data_folder=ds.data_folder)
    idx = ds.training_indices()[:16]
    ev = DataLoader(ds, idx, cfg, shuffle=False, seed=3, wraparound=False,
                    emit_images=False)
    a = [b["same_action_partners"] for b in ev]
    b = [b["same_action_partners"] for b in ev]
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    tr = DataLoader(ds, ds.training_indices(), cfg, shuffle=True, seed=3,
                    wraparound=True, emit_images=False)
    e1 = np.concatenate([b["indices"] for b in tr])
    e2 = np.concatenate([b["indices"] for b in tr])
    assert not np.array_equal(e1, e2)  # train epochs still reshuffle


def test_abandoned_iteration_does_not_leak_producer(synthetic_dataset):
    """Breaking out of a loader mid-epoch must unblock the producer thread
    (it used to stay parked in q.put forever — review r2)."""
    import threading
    import time as _time

    ds = synthetic_dataset
    cfg = SRLConfig(state_dim=4, img_height=32, img_width=32, batch_size=4,
                    epochs=1, losses=(("autoencoder", 1.0),),
                    split_dims=(("autoencoder", -1),),
                    n_actions=ds.n_actions,
                    n_reward_classes=ds.n_reward_classes,
                    data_folder=ds.data_folder)
    loader = DataLoader(ds, ds.training_indices(), cfg, shuffle=False,
                        seed=0, wraparound=False, emit_images=True,
                        prefetch=1)
    assert len(loader) > 3
    before = threading.active_count()
    it = iter(loader)
    next(it)
    it.close()  # abandon mid-epoch; generator finally sets the stop flag
    deadline = _time.time() + 5.0
    while threading.active_count() > before and _time.time() < deadline:
        _time.sleep(0.05)
    assert threading.active_count() <= before


def test_cv2_pool_grows_to_requested_threads():
    """--num-cpu must keep meaning something for the cv2 fallback: the
    shared pool grows to the largest request instead of being pinned at
    whatever size its first caller picked (round-3 review)."""
    from srl_zoo_tpu.data import loader as loader_mod

    old = loader_mod._CV2_POOL
    loader_mod._CV2_POOL = None
    try:
        small = loader_mod._cv2_pool(2)
        assert small._max_workers == 2
        big = loader_mod._cv2_pool(5)
        assert big._max_workers == 5
        assert loader_mod._cv2_pool(3) is big  # never shrinks
    finally:
        loader_mod._cv2_pool(1).shutdown(wait=False)
        loader_mod._CV2_POOL = old


def test_stale_frames_cache_dropped_and_rebuilt(tmp_path, capsys):
    """A frames.npy whose length no longer matches the dataset (re-recorded
    dataset, same resolution) must be (a) DROPPED by load_dataset — kept, it
    would silently gather OOB rows in cached mode (jnp.take fills, uint8 ->
    255 garbage frames) — and (b) flagged stale by the preprocess/pipeline
    rebuild check."""
    from srl_zoo_tpu.data.schema import load_dataset
    from srl_zoo_tpu.data.synthetic import generate_dataset
    from srl_zoo_tpu.preprocessing.preprocess import frames_cache_stale

    folder = str(tmp_path / "ds")
    generate_dataset(folder, n_episodes=2, episode_len=12, img_size=16,
                     seed=0)
    ds = load_dataset(folder)
    assert ds.frames is not None and len(ds.frames) == ds.n_samples

    import os
    fpath = os.path.join(folder, "frames.npy")
    short = np.asarray(ds.frames)[:10].copy()
    n_total = ds.n_samples
    del ds  # release the mmap before overwriting the file
    np.save(fpath, short)  # simulate a stale short cache
    ds2 = load_dataset(folder)
    assert ds2.frames is None  # dropped, not silently kept
    assert "STALE" in capsys.readouterr().out
    assert frames_cache_stale(fpath, 16, n_expected=n_total)
    assert not frames_cache_stale(fpath, 16, n_expected=10)


def test_device_cache_rejects_mismatched_view2(synthetic_dataset_mv):
    """fits()/hybrid_hot_n() must resolution-check frames_2 like frames:
    uploading a stale different-size view-2 store would crash the jitted
    step with an opaque shape error where streaming handles it."""
    import dataclasses

    from srl_zoo_tpu.data import device_cache as dc

    ds = synthetic_dataset_mv
    assert dc.fits(ds, (32, 32), needs_view2=True)
    bad = dataclasses.replace(
        ds, frames_2=np.zeros((ds.n_samples, 16, 16, 3), np.uint8))
    assert not dc.fits(bad, (32, 32), needs_view2=True)
    assert dc.hybrid_hot_n(bad, (32, 32), needs_view2=True) == 0
    # single-view configs never upload view 2 -> unaffected
    assert dc.fits(bad, (32, 32), needs_view2=False)


def test_triplet_neg_pool_override(synthetic_dataset_mv):
    """The hybrid cold phase passes the full split as neg_pool: negatives
    must be drawn from it, not just the loader's own (suffix) indices."""
    ds = synthetic_dataset_mv
    cfg = _cfg(ds, losses=(("triplet", 1.0),), multi_view=True)
    idx = ds.training_indices()
    suffix = idx[len(idx) // 2:]
    loader = DataLoader(ds, suffix, cfg, shuffle=True, seed=0,
                        emit_images=False, neg_pool=idx)
    negs = np.concatenate([b["neg_indices"] for b in loader])
    assert set(negs) - set(suffix.tolist()), \
        "negatives never left the suffix partition"
    assert set(negs) <= set(idx.tolist())


def test_synthetic_interrupted_generation_is_clean(tmp_path):
    """An interrupted generation must leave NO orphaned multi-GiB *.tmp and
    NO fresh npz metadata pointing at a stale/missing frames.npy: the frame
    memmaps are renamed into place first and the npz files are written last,
    so the npz acts as the completion marker (ADVICE r4)."""
    import os

    import pytest

    from srl_zoo_tpu.data import synthetic

    folder = str(tmp_path / "interrupted")

    real = synthetic._generate_into

    def boom(*args, **kwargs):
        real(*args, **kwargs)  # fill the memmaps fully...
        raise RuntimeError("disk died mid-generation (test)")

    orig = synthetic._generate_into
    synthetic._generate_into = boom
    try:
        with pytest.raises(RuntimeError, match="disk died"):
            synthetic.generate_dataset(folder, n_episodes=2, episode_len=8,
                                       img_size=16, seed=0)
    finally:
        synthetic._generate_into = orig

    leftovers = [f for f in os.listdir(folder)
                 if f.endswith((".tmp", ".tmp.npz"))]
    assert leftovers == [], f"orphaned tmp files: {leftovers}"
    # the completion markers were never written — a loader sees "no
    # dataset", not fresh metadata over missing frames
    assert not os.path.exists(os.path.join(folder, "preprocessed_data.npz"))
    assert not os.path.exists(os.path.join(folder, "ground_truth.npz"))
    assert not os.path.exists(os.path.join(folder, "frames.npy"))

    # a rerun over the same folder completes normally
    synthetic.generate_dataset(folder, n_episodes=2, episode_len=8,
                               img_size=16, seed=0)
    assert os.path.exists(os.path.join(folder, "frames.npy"))
    assert os.path.exists(os.path.join(folder, "preprocessed_data.npz"))
