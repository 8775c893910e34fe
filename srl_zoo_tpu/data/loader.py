"""Host-side minibatch loader with background prefetch.

Reference: ``preprocessing/data_loader.py`` — a multiprocessing loader whose
workers cv2.imread JPEGs, resize to 224x224, normalize to float CHW and push
tensors through a pickle queue (SURVEY.md §3.3 marks it the likely bottleneck).

TPU-first redesign:
  * batches ship as **uint8 NHWC** — 4x less host->device traffic; the
    [-1, 1] / ImageNet normalization is fused into the jitted train step
    (see ops/preproc.py),
  * a ``frames.npy`` memmap fast path skips JPEG decode entirely,
  * decode parallelism uses threads (cv2 releases the GIL), assembly happens
    in a single producer thread feeding a bounded queue — no pickling,
  * all emitted arrays have static shapes: the final partial minibatch is
    wrapped around (train) or padded with a validity mask (eval), so the
    train step compiles exactly once,
  * priors/episode/triplet pair sampling ships fixed-size partner-index
    arrays + masks (see data/samplers.py).
"""

from __future__ import annotations

import os
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Optional

import numpy as np

from srl_zoo_tpu.config import SRLConfig
from srl_zoo_tpu.data import samplers
from srl_zoo_tpu.data.schema import Dataset

_SENTINEL = object()

# ONE process-wide cv2-decode pool, shared by every DataLoader that hits the
# cv2 fallback: a per-loader executor was never shut down, leaking
# num_threads idle threads per loader across pipeline grid cells (loaders
# per run x seeds x cells — ADVICE r2). map() is thread-safe, so concurrent
# producer threads can share it.
_CV2_POOL = None
_CV2_POOL_LOCK = threading.Lock()


def _cv2_pool(num_threads: Optional[int] = None) -> ThreadPoolExecutor:
    """Shared pool, grown (never shrunk) to the largest ``num_threads`` any
    loader asked for — so --num-cpu still means something on wide hosts
    instead of being silently capped by whichever loader built the pool
    first.

    Growth must NEVER shutdown the live pool (another loader's producer may
    be mid-``map()``; shutdown makes its next submit raise). CPython's
    executor spawns threads lazily up to _max_workers, so raising that
    ceiling in place is race-free; if the private attr ever disappears we
    abandon the old pool (bounded leak: one pool per distinct grow event)
    rather than kill in-flight work."""
    global _CV2_POOL
    want = num_threads or min(8, (os.cpu_count() or 1) * 2)
    with _CV2_POOL_LOCK:
        if _CV2_POOL is not None and _CV2_POOL._max_workers < want:
            try:
                _CV2_POOL._max_workers = want
            except AttributeError:  # pragma: no cover — future CPython
                _CV2_POOL = None
        if _CV2_POOL is None:
            _CV2_POOL = ThreadPoolExecutor(
                max_workers=want, thread_name_prefix="cv2-decode")
        return _CV2_POOL


def _decode_resize(path: str, hw) -> np.ndarray:
    import cv2
    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(f"Could not read image: {path}")
    img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    if img.shape[:2] != hw:
        img = cv2.resize(img, (hw[1], hw[0]), interpolation=cv2.INTER_AREA)
    return img


class DataLoader:
    """Iterates minibatch dicts of numpy arrays (uint8 images, int/float meta).

    Emitted keys (shape-static; presence depends on config):
      obs (B,H,W,C) u8; next_obs (B,H,W,C) u8; pos_obs/neg_obs (B,H,W,3) u8
      (triplet); actions, reward_classes (B,) i32; rewards (B,) f32;
      gt_states (B,d) f32 (supervised); indices (B,) i32; valid (B,) f32;
      same_action_partners/mask, dissimilar_partners/mask (priors);
      episode_partners, episode_labels (episode-prior).
    """

    def __init__(self, dataset: Dataset, indices: np.ndarray, cfg: SRLConfig,
                 shuffle: bool = True, seed: int = 0, wraparound: bool = True,
                 num_threads: Optional[int] = None, prefetch: int = 3,
                 max_queue_len: Optional[int] = None,
                 emit_images: bool = True,
                 neg_pool: Optional[np.ndarray] = None,
                 slot_map: Optional[np.ndarray] = None):
        """``emit_images=False`` is the HBM-cache mode: batches carry only
        index arrays and metadata; the jitted step gathers pixels from the
        device-resident frame store (data/device_cache.py).

        ``slot_map`` (rotating hybrid cache, data/hybrid.py) maps global row
        indices to store slots; when given, cached batches additionally carry
        ``cache_slots`` / ``next_cache_slots`` / ``neg_cache_slots`` and the
        jitted step gathers by slot instead of by global index. Cold (-1)
        entries clamp to slot 0 — they only ever appear on loss-masked pad
        rows.

        ``neg_pool`` is the index pool triplet negatives are drawn from
        (default: this loader's own indices). The hybrid cold phase passes
        the FULL training split here: its negatives are decoded from disk by
        index, so restricting them to the cold partition would needlessly
        bias negatives toward a temporal suffix of the dataset. (The hot
        phase has no such freedom — its negative gather must hit the
        resident prefix.)"""
        self.ds = dataset
        self.indices = np.asarray(indices, np.int32)
        self.cfg = cfg
        self.emit_images = emit_images
        self.shuffle = shuffle
        self.seed = seed
        self.wraparound = wraparound
        self.prefetch = prefetch
        self.num_threads = num_threads or min(8, (os.cpu_count() or 1) * 2)
        self._epoch = 0
        self._hw = (cfg.img_height, cfg.img_width)
        self._max_queue = max_queue_len
        self._neg_pool = np.asarray(neg_pool, np.int32) \
            if neg_pool is not None else self.indices
        self._episode_ids = dataset.episode_ids
        # snapshot: the learner mutates its slot map at epoch boundaries and
        # a lazily-consumed producer thread must not observe the mutation
        self._slot_map = np.array(slot_map, np.int32) \
            if slot_map is not None else None

    def _slots(self, idx: np.ndarray) -> np.ndarray:
        return np.maximum(self._slot_map[idx], 0).astype(np.int32)

    def __len__(self) -> int:
        b = self.cfg.batch_size
        n = len(self.indices)
        if n <= b:
            return 1
        return (n + b - 1) // b  # final batch wraps (train) or pads (eval)

    # ---- image fetch --------------------------------------------------------
    def _fetch_images(self, idx: np.ndarray, view: int = 0) -> np.ndarray:
        from srl_zoo_tpu import native

        frames = self.ds.frames if view == 0 else self.ds.frames_2
        if frames is not None:
            out = native.gather_frames(frames, idx)
            if out.shape[1:3] != self._hw:
                out = self._resize_batch(out)
            return out
        paths_arr = self.ds.images_path if view == 0 else self.ds.images_path_2
        if paths_arr is None:
            raise ValueError(f"Dataset has no view-{view} images")
        paths = [self._resolve(paths_arr[i]) for i in idx]
        if native.available() and all(p.endswith((".jpg", ".jpeg"))
                                      for p in paths):
            try:
                return native.decode_jpeg_batch(paths, *self._hw,
                                                n_threads=self.num_threads)
            except FileNotFoundError:
                pass  # fall through to cv2, which also handles other formats
        imgs = list(_cv2_pool(self.num_threads).map(
            lambda p: _decode_resize(p, self._hw), paths))
        return np.stack(imgs)

    def _resize_batch(self, imgs: np.ndarray) -> np.ndarray:
        from srl_zoo_tpu import native
        h, w = self._hw
        return native.resize_batch(imgs, h, w)

    def _resolve(self, rel: str) -> str:
        from srl_zoo_tpu.data.schema import resolve_image_path
        return resolve_image_path(self.ds.data_folder, rel)

    def _observation(self, idx: np.ndarray) -> np.ndarray:
        """3-channel (or 6-channel stacked multi-view) uint8 observation."""
        obs = self._fetch_images(idx, view=0)
        if self.cfg.multi_view and not self.cfg.use_triplet:
            obs2 = self._fetch_images(idx, view=1)
            obs = np.concatenate([obs, obs2], axis=-1)
        return obs

    # ---- batch assembly ------------------------------------------------------
    def _make_batch(self, idx: np.ndarray, valid: np.ndarray,
                    rng: np.random.RandomState) -> Dict[str, np.ndarray]:
        cfg = self.cfg
        ds = self.ds
        # THE reward-convention invariant (schema.py): rewards[t] is the
        # reward upon ARRIVING at frame t, so transition idx reads idx+1 —
        # derived once here for every consumer below
        nxt = np.minimum(idx + 1, ds.n_samples - 1)
        batch: Dict[str, np.ndarray] = {
            "indices": idx.astype(np.int32),
            "valid": valid.astype(np.float32),
            "actions": ds.actions[idx],
            "reward_classes": ds.reward_classes[nxt],
            "rewards": ds.rewards[nxt],
        }
        if self.emit_images:
            batch["obs"] = self._observation(idx)
        if cfg.needs_next_obs and self.emit_images:
            batch["next_obs"] = self._observation(nxt)
        if not self.emit_images and self._slot_map is not None:
            batch["cache_slots"] = self._slots(idx)
            if cfg.needs_next_obs:
                batch["next_cache_slots"] = self._slots(nxt)
        if cfg.use_triplet:
            negs = samplers.triplet_negatives(idx, self._episode_ids,
                                              self._neg_pool, rng)
            if self.emit_images:
                batch["pos_obs"] = self._fetch_images(idx, view=1)
                batch["neg_obs"] = self._fetch_images(negs, view=0)
            elif self._slot_map is not None:
                batch["neg_cache_slots"] = self._slots(negs)
            else:
                batch["neg_indices"] = negs.astype(np.int32)
        if cfg.use_priors:
            sp, sm = samplers.find_same_action_pairs(ds.actions[idx], rng)
            dp, dm = samplers.find_dissimilar_pairs(
                ds.actions[idx], ds.reward_classes[nxt], rng)
            batch["same_action_partners"], batch["same_action_mask"] = sp, sm
            batch["dissimilar_partners"], batch["dissimilar_mask"] = dp, dm
        if cfg.use_episode_prior:
            ep, el = samplers.episode_prior_pairs(self._episode_ids[idx], rng)
            batch["episode_partners"], batch["episode_labels"] = ep, el
        if cfg.use_supervised:
            batch["gt_states"] = ds.ground_truth_states[idx]
        return batch

    def _epoch_indices(self, rng: np.random.RandomState) -> np.ndarray:
        idx = self.indices
        if self.cfg.balanced_sampling and self.shuffle:
            # oversample by the reward class of the *resulting* transition
            # (same rewards[idx+1] convention as _make_batch)
            rc = self.ds.reward_classes[np.minimum(idx + 1,
                                                   self.ds.n_samples - 1)]
            order = samplers.balanced_reward_indices(
                np.arange(len(idx), dtype=np.int32), rc, rng)
            idx = idx[order]
        elif self.shuffle:
            idx = idx[rng.permutation(len(idx))]
        return idx

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        # Eval loaders (shuffle=False) keep a FIXED rng across epochs so
        # priors/triplet/episode pair draws are identical every validation
        # pass — otherwise best-val selection would compare losses over
        # different pair sets (pure sampling noise). Train loaders re-draw
        # per epoch, as the reference resamples pairs each epoch.
        rng = np.random.RandomState(
            self.seed + (self._epoch if self.shuffle else 0))
        self._epoch += 1
        order = self._epoch_indices(rng)
        b = self.cfg.batch_size
        n = len(order)
        if n == 0:
            raise ValueError("DataLoader got an empty index set — dataset "
                             "too small for the train/val split?")

        batches_idx = []
        n_full = n // b
        for k in range(n_full):
            idx = order[k * b:(k + 1) * b]
            batches_idx.append((idx, np.ones(b)))
        rem = n - n_full * b
        if rem and not self.wraparound:
            idx = order[n_full * b:]
            pad = np.zeros(b - rem, order.dtype)
            batches_idx.append((np.concatenate([idx, pad]),
                                np.concatenate([np.ones(rem), np.zeros(b - rem)])))
        elif rem and self.wraparound and n >= b:
            idx = np.concatenate([order[n_full * b:], order[:b - rem]])
            batches_idx.append((idx, np.ones(b)))
        elif n < b:
            reps = int(np.ceil(b / max(n, 1)))
            idx = np.tile(order, reps)[:b]
            valid = np.ones(b) if self.wraparound else \
                np.concatenate([np.ones(n), np.zeros(b - n)])
            if not self.wraparound:
                idx = np.concatenate([order, np.zeros(b - n, order.dtype)])
            batches_idx = [(idx, valid)]

        q: queue.Queue = queue.Queue(maxsize=self._max_queue or self.prefetch)
        err = []
        stop = threading.Event()  # set when the consumer abandons iteration

        def _put(item) -> bool:
            """Bounded put that gives up once the consumer is gone — a plain
            q.put would block forever on a full queue, leaking the thread
            and its queued image batches."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for idx, valid in batches_idx:
                    if stop.is_set():
                        return
                    if not _put(self._make_batch(idx, valid, rng)):
                        return
            except Exception as e:  # surface loader errors to the consumer
                err.append(e)
            finally:
                _put(_SENTINEL)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is _SENTINEL:
                    break
                yield item
            t.join()
            if err:
                raise err[0]
        finally:
            stop.set()  # no-op on clean exhaustion; unblocks on abandonment
