"""Native host runtime: gather / resize / JPEG decode vs numpy & cv2."""

import numpy as np
import pytest

from srl_zoo_tpu import native


def test_gather_matches_numpy(rng, tmp_path):
    frames = rng.randint(0, 255, (20, 8, 8, 3), dtype=np.uint8)
    idx = rng.randint(0, 20, 7).astype(np.int32)
    got = native.gather_frames(frames, idx)
    np.testing.assert_array_equal(got, frames[idx])
    # memmap path (the production fast path)
    path = tmp_path / "frames.npy"
    np.save(path, frames)
    mm = np.load(path, mmap_mode="r")
    np.testing.assert_array_equal(native.gather_frames(mm, idx), frames[idx])


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_gather_out_of_range(rng):
    frames = rng.randint(0, 255, (4, 2, 2, 3), dtype=np.uint8)
    with pytest.raises(IndexError):
        native.gather_frames(frames, np.array([5], np.int32))


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_resize_close_to_cv2(rng):
    import cv2
    imgs = rng.randint(0, 255, (3, 17, 23, 3), dtype=np.uint8)
    got = native.resize_batch(imgs, 8, 8)
    assert got.shape == (3, 8, 8, 3)
    ref = np.stack([cv2.resize(im, (8, 8), interpolation=cv2.INTER_LINEAR)
                    for im in imgs])
    # different corner conventions: allow small differences
    assert np.mean(np.abs(got.astype(int) - ref.astype(int))) < 12


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_jpeg_decode_round_trip(rng, tmp_path):
    import cv2
    paths = []
    originals = []
    for i in range(5):
        # smooth gradient image: JPEG-compressible, so decode ~= original
        yy, xx = np.mgrid[0:32, 0:32]
        img = np.stack([yy * 8, xx * 8, np.full_like(yy, 10 * i)],
                       axis=-1).astype(np.uint8)
        p = str(tmp_path / f"im{i}.jpg")
        cv2.imwrite(p, img[:, :, ::-1],
                    [cv2.IMWRITE_JPEG_QUALITY, 95])  # store as BGR on disk
        paths.append(p)
        originals.append(img)
    got = native.decode_jpeg_batch(paths, 32, 32, n_threads=2)
    assert got.shape == (5, 32, 32, 3)
    for g, o in zip(got, originals):
        assert np.mean(np.abs(g.astype(int) - o.astype(int))) < 5
    # and bit-identical to cv2's own decode of the same files
    ref = np.stack([cv2.imread(p)[:, :, ::-1] for p in paths])
    np.testing.assert_array_equal(got, ref)


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_jpeg_decode_missing_file(tmp_path):
    with pytest.raises(FileNotFoundError):
        native.decode_jpeg_batch([str(tmp_path / "nope.jpg")], 8, 8)


def test_loader_uses_native_jpeg_path(tmp_path, rng):
    """End-to-end: a jpg-only dataset (no frames.npy) loads through the
    native decoder when available, cv2 otherwise."""
    import cv2

    from srl_zoo_tpu.config import SRLConfig
    from srl_zoo_tpu.data.loader import DataLoader
    from srl_zoo_tpu.data.schema import load_dataset
    from srl_zoo_tpu.data.synthetic import generate_dataset

    folder = str(tmp_path / "jpgds")
    generate_dataset(folder, n_episodes=2, episode_len=10, img_size=32,
                     seed=0, save_jpgs=True)
    import os
    os.remove(os.path.join(folder, "frames.npy"))
    ds = load_dataset(folder)
    assert ds.frames is None
    cfg = SRLConfig(state_dim=2, img_height=32, img_width=32, batch_size=4,
                    losses=(("autoencoder", 1.0),),
                    split_dims=(("autoencoder", -1),))
    batch = next(iter(DataLoader(ds, ds.training_indices()[:4], cfg,
                                 shuffle=False, seed=0)))
    assert batch["obs"].shape == (4, 32, 32, 3)
    # decoded jpgs must match the rendered frames up to JPEG loss
    raw = cv2.imread(os.path.join(folder, ds.images_path[batch["indices"][0]]))
    assert np.mean(np.abs(batch["obs"][0].astype(int)
                          - raw[:, :, ::-1].astype(int))) < 8


@pytest.mark.skipif(not native.available(), reason="no native lib")
def test_resize_batch_rejects_degenerate_geometry():
    """The C resize reports bad dims; the wrapper must raise instead of
    returning an uninitialized buffer (review r2)."""
    bad = np.zeros((1, 0, 5, 3), np.uint8)  # sh == 0
    with pytest.raises(ValueError):
        native.resize_batch(bad, 4, 4)
