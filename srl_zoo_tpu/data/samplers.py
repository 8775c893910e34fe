"""Host-side pair/index samplers with static output shapes.

Reference: ``findDissimilar`` / ``findSameActions`` in losses/losses.py and the
special minibatch samplers in preprocessing/data_loader.py (priors pairs,
triplet anchors, balanced reward sampling).

TPU-first rework (SURVEY.md §7 "hard parts"): pair mining is data-dependent,
so it stays on the host (NumPy) and ships *fixed-size* partner-index arrays
plus validity masks with each batch — static shapes mean no recompilation and
no data-dependent control flow inside jit.

All samplers are vectorized (no per-element Python loops): with the device
running ~14-17k img/s, a single host core doing O(B) interpreter iterations
per batch would become the pipeline bottleneck at large batch sizes.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def _sample_true_per_row(allowed: np.ndarray, rng: np.random.RandomState
                         ) -> Tuple[np.ndarray, np.ndarray]:
    """For each row of a boolean (B, B) matrix, pick one random True column.

    Returns (choice (B,) int32, mask (B,) float32 — 0 for all-False rows).
    Vectorized via the inverse-CDF trick on row-wise cumulative sums.
    """
    counts = allowed.sum(axis=1)
    mask = counts > 0
    # target rank in [0, counts) per row
    ranks = (rng.rand(len(allowed)) * np.maximum(counts, 1)).astype(np.int64)
    cum = np.cumsum(allowed, axis=1)
    # first column where cum > rank
    choice = np.argmax(cum > ranks[:, None], axis=1)
    return choice.astype(np.int32), mask.astype(np.float32)


def find_same_action_pairs(actions: np.ndarray, rng: np.random.RandomState
                           ) -> Tuple[np.ndarray, np.ndarray]:
    """For each minibatch element i, sample a partner j != i with the same
    action. Returns (partners (B,) int32, mask (B,) float32); mask is 0 where
    no partner exists (that pair contributes nothing to the loss).

    Used by the proportionality and repeatability priors
    (reference: losses/losses.py findSameActions).
    """
    a = np.asarray(actions)
    allowed = a[:, None] == a[None, :]
    np.fill_diagonal(allowed, False)
    return _sample_true_per_row(allowed, rng)


def find_dissimilar_pairs(actions: np.ndarray, reward_classes: np.ndarray,
                          rng: np.random.RandomState
                          ) -> Tuple[np.ndarray, np.ndarray]:
    """For each i, sample j != i with the SAME action but a DIFFERENT reward
    class — the causality prior's pair condition
    (reference: losses/losses.py findDissimilar)."""
    a = np.asarray(actions)
    r = np.asarray(reward_classes)
    allowed = (a[:, None] == a[None, :]) & (r[:, None] != r[None, :])
    np.fill_diagonal(allowed, False)
    return _sample_true_per_row(allowed, rng)


def episode_prior_pairs(episode_ids: np.ndarray, rng: np.random.RandomState
                        ) -> Tuple[np.ndarray, np.ndarray]:
    """For each i, sample a partner j and a label: 1 if (i, j) come from the
    same episode, 0 otherwise — 50/50 when possible. Feeds the episode-prior
    discriminator (reference: losses/losses.py episodePriorLoss)."""
    ep = np.asarray(episode_ids)
    b = len(ep)
    same = ep[:, None] == ep[None, :]
    np.fill_diagonal(same, False)
    diff = ep[:, None] != ep[None, :]

    want_same = rng.rand(b) < 0.5
    same_choice, same_ok = _sample_true_per_row(same, rng)
    diff_choice, diff_ok = _sample_true_per_row(diff, rng)
    # a row with neither a same- nor a different-episode partner exists only
    # at b == 1 — don't pay a third O(B^2) pass for it on real batches
    if b > 1:
        any_choice = np.zeros(b, np.int64)
    else:
        any_choice, _ = _sample_true_per_row(~np.eye(b, dtype=bool), rng)

    use_same = (want_same & (same_ok > 0)) | (diff_ok == 0)
    partners = np.where(use_same & (same_ok > 0), same_choice,
                        np.where(diff_ok > 0, diff_choice, any_choice))
    labels = (ep[partners] == ep).astype(np.float32)
    return partners.astype(np.int32), labels


def triplet_negatives(indices: np.ndarray, episode_ids_all: np.ndarray,
                      pool: np.ndarray, rng: np.random.RandomState,
                      min_gap: int = 10) -> np.ndarray:
    """Sample a negative dataset index for each anchor index: prefer a frame
    from another episode or at least ``min_gap`` steps away in time
    (reference: preprocessing/data_loader.py triplet sampling; anchor=view 1,
    positive=view 2 of the same timestep, negative=distant frame)."""
    idx = np.asarray(indices)
    pool = np.asarray(pool)
    b = len(idx)
    negs = pool[rng.randint(len(pool), size=b)]
    for _ in range(20):
        bad = ((episode_ids_all[negs] == episode_ids_all[idx])
               & (np.abs(negs.astype(np.int64) - idx.astype(np.int64))
                  < min_gap))
        if not bad.any():
            break
        resample = pool[rng.randint(len(pool), size=int(bad.sum()))]
        negs = negs.copy()
        negs[bad] = resample
    return negs.astype(np.int32)


def balanced_reward_indices(indices: np.ndarray, reward_classes: np.ndarray,
                            rng: np.random.RandomState) -> np.ndarray:
    """Oversample minority reward classes so each class appears equally often
    (reference: data_loader BalancedLabelSampler / --balanced-sampling).
    Returns a permuted index array of the same length as ``indices``."""
    classes = reward_classes[indices]
    uniq = np.unique(classes)
    n_per = int(np.ceil(len(indices) / len(uniq)))
    out = []
    for c in uniq:
        pool = indices[classes == c]
        out.append(rng.choice(pool, size=n_per, replace=len(pool) < n_per))
    out = np.concatenate(out)
    # shuffle BEFORE truncating: truncating the class-ordered concatenation
    # would drop rows exclusively from the last (highest-id) class, biasing
    # the "equal counts" guarantee against it every epoch
    rng.shuffle(out)
    out = out[: len(indices)]
    return out.astype(np.int32)
