"""Dataset on-disk schema and in-memory view.

Reference contract (L0, SURVEY.md §1): a dataset folder contains
  * ``preprocessed_data.npz`` — ``actions`` (N,) int, ``rewards`` (N,) float or
    discretized int, ``episode_starts`` (N,) bool,
    Reward convention: ``rewards[t]`` is the reward received upon ARRIVING at
    frame t (0 at episode start) — so ``rewards[idx + 1]`` is the reward of
    transition idx = (frame idx, action idx, frame idx+1), which is what the
    loader ships for the reward model / causality prior / balanced sampling,
  * ``ground_truth.npz`` — ``ground_truth_states`` (N, d) float,
    ``images_path`` (N,) str (paths relative to the data root),
  * per-episode image folders ``record_*/frame*.jpg``.

TPU-native addition: an optional ``frames.npy`` (N, H, W, 3) uint8 memmap fast
path that skips JPEG decode entirely — on a 1-core host the decoder, not the
chip, is the bottleneck (reference bottleneck per SURVEY.md §3.3).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import numpy as np


@dataclasses.dataclass
class Dataset:
    """In-memory view of a dataset folder (images stay on disk)."""

    data_folder: str
    actions: np.ndarray          # (N,) int32
    rewards: np.ndarray          # (N,) float32 (raw)
    reward_classes: np.ndarray   # (N,) int32 discretized reward class ids
    episode_starts: np.ndarray   # (N,) bool
    ground_truth_states: np.ndarray  # (N, d) float32
    images_path: np.ndarray      # (N,) str, relative to data root parent
    frames: Optional[np.ndarray] = None  # (N, H, W, 3) uint8 memmap fast path
    # second camera view (multi-view / triplet datasets)
    images_path_2: Optional[np.ndarray] = None
    frames_2: Optional[np.ndarray] = None

    @property
    def n_samples(self) -> int:
        return len(self.actions)

    @property
    def n_actions(self) -> int:
        return int(self.actions.max()) + 1

    @property
    def n_reward_classes(self) -> int:
        return int(self.reward_classes.max()) + 1

    @property
    def episode_ids(self) -> np.ndarray:
        """(N,) int32 episode index of each sample, from episode_starts."""
        return np.cumsum(self.episode_starts.astype(np.int32)) - 1

    def training_indices(self) -> np.ndarray:
        """Indices i for which (i, i+1) is a valid within-episode transition.

        The reference trains on (obs, next_obs) pairs and drops episode-final
        frames (reference: models/learner.py minibatch construction).
        """
        n = self.n_samples
        valid = np.ones(n, dtype=bool)
        valid[-1] = False
        # i is invalid if i+1 starts a new episode
        valid[:-1] &= ~self.episode_starts[1:]
        return np.nonzero(valid)[0].astype(np.int32)


def resolve_image_path(data_folder: str, rel: str) -> str:
    """Resolve a recorded image path: reference datasets store paths relative
    either to the dataset folder or to its parent ("data/<ds>/record_x/...").
    THE one resolver — loader, preprocessing and KNN grids all use it so the
    accepted layouts can never diverge."""
    for base in (data_folder, os.path.dirname(data_folder.rstrip("/"))):
        p = os.path.join(base, rel)
        if os.path.exists(p):
            return p
    return rel


def discretize_rewards(rewards: np.ndarray) -> np.ndarray:
    """Map raw rewards to contiguous class ids 0..K-1 by sorted unique value.

    The reference discretizes rewards into classes for the reward model and
    balanced sampling (reference: preprocessing/preprocess.py).
    """
    uniq = np.unique(rewards)
    return np.searchsorted(uniq, rewards).astype(np.int32)


def _load_frames_checked(path: str, n: int):
    """mmap a frames cache, DROPPING it (with a loud hint) on a length
    mismatch. A dataset re-recorded/re-preprocessed to a different length
    can leave a same-resolution stale frames.npy behind; keeping it would
    be silent data corruption in cached mode — the in-jit gather is
    ``jnp.take`` whose out-of-bounds mode FILLS (uint8 -> 255), so every
    sample past the stale length would train on garbage white frames with
    no error raised anywhere."""
    try:
        arr = np.load(path, mmap_mode="r")
    except (ValueError, OSError) as e:
        from srl_zoo_tpu.utils import printYellow
        printYellow(f"{os.path.basename(path)} is unreadable ({e}) — "
                    "ignoring it; re-run preprocessing to rebuild")
        return None
    if len(arr) != n:
        from srl_zoo_tpu.utils import printYellow
        printYellow(
            f"{os.path.basename(path)} holds {len(arr)} frames but the "
            f"dataset has {n} samples — STALE cache ignored (was the "
            "dataset re-recorded?); re-run preprocessing to rebuild it "
            "and restore the HBM-cache fast path")
        return None
    return arr


def load_dataset(data_folder: str, load_frames_memmap: bool = True) -> Dataset:
    """Load a dataset folder following the reference npz schema."""
    pre = np.load(os.path.join(data_folder, "preprocessed_data.npz"))
    gt = np.load(os.path.join(data_folder, "ground_truth.npz"), allow_pickle=True)

    actions = pre["actions"].astype(np.int32)
    rewards = pre["rewards"].astype(np.float32)
    episode_starts = pre["episode_starts"].astype(bool)
    reward_classes = discretize_rewards(rewards)

    gts = gt["ground_truth_states"].astype(np.float32)
    images_path = np.asarray(gt["images_path"]).astype(str)
    images_path_2 = None
    if "images_path_2" in gt:
        images_path_2 = np.asarray(gt["images_path_2"]).astype(str)

    n = len(actions)
    for name, arr in [("rewards", rewards), ("episode_starts", episode_starts),
                      ("ground_truth_states", gts), ("images_path", images_path)]:
        if len(arr) != n:
            raise ValueError(f"Dataset field '{name}' has length {len(arr)}, "
                             f"expected {n} (actions)")

    frames = frames_2 = None
    fpath = os.path.join(data_folder, "frames.npy")
    if load_frames_memmap and os.path.exists(fpath):
        frames = _load_frames_checked(fpath, n)
    fpath2 = os.path.join(data_folder, "frames_2.npy")
    if load_frames_memmap and os.path.exists(fpath2):
        frames_2 = _load_frames_checked(fpath2, n)

    return Dataset(
        data_folder=data_folder,
        actions=actions,
        rewards=rewards,
        reward_classes=reward_classes,
        episode_starts=episode_starts,
        ground_truth_states=gts,
        images_path=images_path,
        frames=frames,
        images_path_2=images_path_2,
        frames_2=frames_2,
    )


def save_states_rewards(log_folder: str, states: np.ndarray,
                        rewards: np.ndarray) -> str:
    """Write the ``states_rewards.npz`` hand-off artifact consumed by
    downstream RL (reference: train.py final export; robotics-rl-srl reads it)."""
    os.makedirs(log_folder, exist_ok=True)
    path = os.path.join(log_folder, "states_rewards.npz")
    np.savez(path, states=np.asarray(states, np.float32),
             rewards=np.asarray(rewards, np.float32))
    return path
