"""Offline dataset preprocessing.

Reference: preprocessing/preprocess.py — walks per-episode ``record_*``
folders of a recorded dataset, concatenates per-episode arrays into
``preprocessed_data.npz`` (actions, rewards, episode_starts) and
``ground_truth.npz`` (states, image paths), discretizing rewards.

TPU-native addition: ``build_frames_cache`` decodes every JPEG once at the
training resolution into a single ``frames.npy`` uint8 memmap — after this,
epochs never touch the JPEG decoder again (the reference re-decodes every
image every epoch in worker processes; SURVEY.md §3.3).

Usage:
  python -m srl_zoo_tpu.preprocessing.preprocess --data-folder data/foo \
      [--img-size 224] [--no-frames-cache]
"""

from __future__ import annotations

import argparse
import glob
import os
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from srl_zoo_tpu.utils import printGreen, printYellow


def preprocess_folder(data_folder: str) -> None:
    """Concatenate per-episode ``record_*/episode_data.npz`` files into the
    training schema. Each episode npz must hold ``actions`` (T,), ``rewards``
    (T,) and ``ground_truth_states`` (T, d); frames are the sorted
    ``frame*.jpg`` files of the same folder.

    Reward convention: recorded episodes store ``rewards[t]`` = reward of
    acting at frame t (natural env.step semantics — data/record.py). The
    training schema stores the reward of *arriving* at frame t, so the
    loader's ``rewards[idx + 1]`` read yields the reward of transition idx;
    each episode's rewards are therefore shifted right by one here (0 at
    episode start; the final transition's reward has no arrival frame and is
    dropped)."""
    records = sorted(glob.glob(os.path.join(data_folder, "record_*")))
    if not records:
        raise FileNotFoundError(f"No record_* folders in {data_folder}")

    def frame_files(rec: str, suffix: str):
        out = []
        for ext in ("jpg", "png"):
            out += glob.glob(os.path.join(rec, f"frame*{suffix}.{ext}"))
        if not suffix:  # view-1 pattern must not swallow the _2 files
            out = [f for f in out if not
                   os.path.basename(f).split(".")[0].endswith("_2")]
        return sorted(out)

    actions, rewards, episode_starts, states = [], [], [], []
    images, images_2 = [], []
    for rec in records:
        ep_file = os.path.join(rec, "episode_data.npz")
        if not os.path.exists(ep_file):
            printYellow(f"Skipping {rec} (no episode_data.npz)")
            continue
        ep = np.load(ep_file)
        frames = frame_files(rec, "")
        frames_2 = frame_files(rec, "_2")
        t = len(ep["actions"])
        if len(frames) < t:
            raise ValueError(f"{rec}: {len(frames)} frames for {t} steps")
        actions.append(np.asarray(ep["actions"], np.int32))
        ep_rewards = np.asarray(ep["rewards"], np.float32)
        rewards.append(np.concatenate([[0.0], ep_rewards[:-1]]).astype(np.float32))
        starts = np.zeros(t, bool)
        starts[0] = True
        episode_starts.append(starts)
        states.append(np.asarray(ep["ground_truth_states"], np.float32))
        images.extend(os.path.relpath(f, data_folder) for f in frames[:t])
        if frames_2:
            if len(frames_2) < t:
                raise ValueError(f"{rec}: {len(frames_2)} view-2 frames for "
                                 f"{t} steps (record obs_2 every step or "
                                 "never)")
            images_2.extend(os.path.relpath(f, data_folder)
                            for f in frames_2[:t])

    if images_2 and len(images_2) != len(images):
        raise ValueError("some episodes have view-2 frames and some don't — "
                         "multi-view datasets need both views everywhere")

    np.savez(os.path.join(data_folder, "preprocessed_data.npz"),
             actions=np.concatenate(actions),
             rewards=np.concatenate(rewards),
             episode_starts=np.concatenate(episode_starts))
    np.savez(os.path.join(data_folder, "ground_truth.npz"),
             ground_truth_states=np.concatenate(states),
             images_path=np.asarray(images),
             **({"images_path_2": np.asarray(images_2)} if images_2 else {}))
    printGreen(f"Wrote preprocessed_data.npz + ground_truth.npz "
               f"({len(images)} samples, {len(records)} episodes"
               f"{', multi-view' if images_2 else ''})")


def frames_cache_stale(path: str, img_size: int,
                       n_expected: int | None = None) -> bool:
    """Rebuild when missing, recorded at a different resolution, OR holding
    a different number of frames than the dataset (a re-recorded dataset
    leaves a same-resolution stale cache behind; schema.load_dataset drops
    such a cache at runtime, but the preprocess/pipeline entry points
    should REBUILD it). A silently kept wrong frames.npy either disables
    the HBM device cache or, worse, gathers garbage rows. Shared by the
    preprocess CLI and pipeline.check_dataset so both entry points agree."""
    if not os.path.exists(path):
        return True
    try:
        shape = np.load(path, mmap_mode="r").shape
    except (ValueError, OSError) as e:
        # truncated/corrupt frames.npy (e.g. a crash predating the atomic
        # tmp+rename write): rebuild instead of aborting check_dataset
        # (ADVICE r2)
        printYellow(f"{os.path.basename(path)} is unreadable ({e}) — "
                    "rebuilding")
        return True
    if shape[1:3] != (img_size, img_size):
        printYellow(f"{os.path.basename(path)} is {shape[1]}x{shape[2]} "
                    f"but --img-size is {img_size} — rebuilding")
        return True
    if n_expected is not None and shape[0] != n_expected:
        printYellow(f"{os.path.basename(path)} holds {shape[0]} frames but "
                    f"the dataset has {n_expected} samples — rebuilding")
        return True
    return False


def _dataset_length(data_folder: str) -> int | None:
    """Number of samples per ground_truth.npz images_path (the array the
    frames cache is built from), or None when the file is absent."""
    gt_path = os.path.join(data_folder, "ground_truth.npz")
    if not os.path.exists(gt_path):
        return None
    try:
        return len(np.load(gt_path, allow_pickle=True)["images_path"])
    except (ValueError, OSError, KeyError):
        return None


def build_frames_cache(data_folder: str, img_size: int = 224,
                       view_suffix: str = "") -> str:
    """Decode every dataset image once into ``frames{suffix}.npy``
    (N, img_size, img_size, 3) uint8 — the loader's zero-decode fast path."""
    import cv2

    gt = np.load(os.path.join(data_folder, "ground_truth.npz"),
                 allow_pickle=True)
    key = "images_path" + ("_2" if view_suffix else "")
    paths = np.asarray(gt[key]).astype(str)
    out_path = os.path.join(data_folder, f"frames{view_suffix}.npy")
    n = len(paths)
    # build into a temp file and rename on success: a failed rebuild (e.g.
    # a resolution-mismatch rebuild on a dataset whose source JPEGs are
    # gone) must never destroy a previously good frames.npy
    tmp_path = f"{out_path}.{os.getpid()}.tmp"
    out = np.lib.format.open_memmap(tmp_path, mode="w+", dtype=np.uint8,
                                    shape=(n, img_size, img_size, 3))

    # Decode with the SAME preference chain as the streaming loader
    # (data/loader.py _fetch_images: native libjpeg DCT-scale + bilinear for
    # all-JPEG datasets, cv2 INTER_AREA otherwise): the two resamplers
    # differ by multiple intensity levels on a downscale, so building the
    # cache with one and streaming with the other would silently shift
    # exported states between cached-trained and streaming-evaluated runs.
    # Residual caveat (documented): a cache built WITH the native lib then
    # streamed on a host WITHOUT it (or vice versa) still skews — both
    # paths on one host always agree, which is the case that matters.
    from srl_zoo_tpu import native
    from srl_zoo_tpu.data.schema import resolve_image_path
    resolved = [resolve_image_path(data_folder, p) for p in paths]
    n_threads = min(16, (os.cpu_count() or 1) * 4)

    def work(i):
        from srl_zoo_tpu.data.loader import _decode_resize
        out[i] = _decode_resize(resolved[i], (img_size, img_size))

    try:
        done_native = False
        if native.available() and all(p.endswith((".jpg", ".jpeg"))
                                      for p in resolved):
            try:
                chunk = 256  # bound peak memory on large datasets
                for s in range(0, n, chunk):
                    out[s:s + chunk] = native.decode_jpeg_batch(
                        resolved[s:s + chunk], img_size, img_size,
                        n_threads=n_threads)
                done_native = True
            except FileNotFoundError:
                pass  # fall through to cv2 (also handles other formats)
        if not done_native:
            with ThreadPoolExecutor(max_workers=n_threads) as ex:
                list(ex.map(work, range(n)))
        out.flush()
        del out  # release the memmap handle before the rename
        os.replace(tmp_path, out_path)
    except BaseException:
        try:  # POSIX: unlink works with the memmap handle still open
            os.unlink(tmp_path)
        except OSError:
            pass
        raise
    printGreen(f"Wrote {out_path} ({n} frames @ {img_size}x{img_size})")
    return out_path


def main(argv=None):
    from srl_zoo_tpu.utils.platform import honor_env_platform
    honor_env_platform()  # JAX_PLATFORMS must be binding in every CLI
    p = argparse.ArgumentParser(description="Preprocess a recorded dataset")
    p.add_argument("--data-folder", type=str, required=True)
    p.add_argument("--img-size", type=int, default=224)
    p.add_argument("--no-frames-cache", action="store_true",
                   help="Skip building the frames.npy decode cache")
    p.add_argument("--multi-view", action="store_true",
                   help="Also build the second-view frames_2.npy cache")
    args = p.parse_args(argv)

    if not os.path.exists(os.path.join(args.data_folder,
                                       "preprocessed_data.npz")):
        preprocess_folder(args.data_folder)
    else:
        printYellow("preprocessed_data.npz already present — skipping "
                    "episode concatenation")
    n_ds = _dataset_length(args.data_folder)
    if not args.no_frames_cache and \
            frames_cache_stale(os.path.join(args.data_folder, "frames.npy"),
                               args.img_size, n_expected=n_ds):
        build_frames_cache(args.data_folder, args.img_size)
    has_view2 = args.multi_view
    gt_path = os.path.join(args.data_folder, "ground_truth.npz")
    if not has_view2 and os.path.exists(gt_path):
        has_view2 = "images_path_2" in np.load(gt_path, allow_pickle=True)
    if has_view2 and not args.no_frames_cache and \
            frames_cache_stale(
                os.path.join(args.data_folder, "frames_2.npy"),
                args.img_size, n_expected=n_ds):
        build_frames_cache(args.data_folder, args.img_size, view_suffix="_2")


if __name__ == "__main__":
    main()
