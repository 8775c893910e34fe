"""Metrics: per-step jsonl + per-epoch loss history npz.

Reference: models/learner.py accumulates per-loss history and saves it as an
npz for plotting/losses_plot.py. The rebuild keeps that artifact and adds a
flat ``metrics.jsonl`` (step, per-loss values, images/sec/chip) —
SURVEY.md §5 observability row.
"""

from __future__ import annotations

import json
import os
import time
from collections import defaultdict
from typing import Dict

import numpy as np


def _make_tb_writer(log_folder: str):
    """Optional TensorBoard event writer (SRL_ZOO_TENSORBOARD=1 and
    tensorflow importable — it ships with the profiler tooling). Events land
    in <log_folder>/tb; view with `tensorboard --logdir <log_folder>/tb`."""
    if os.environ.get("SRL_ZOO_TENSORBOARD", "0") != "1":
        return None
    try:
        import tensorflow as tf
        return tf.summary.create_file_writer(os.path.join(log_folder, "tb"))
    except Exception:  # tensorflow absent/broken — jsonl+npz still written
        return None


class MetricsLogger:
    def __init__(self, log_folder: str):
        self.log_folder = log_folder
        os.makedirs(log_folder, exist_ok=True)
        self._jsonl = open(os.path.join(log_folder, "metrics.jsonl"), "a")
        self.history: Dict[str, list] = defaultdict(list)
        # a resumed run continues the existing history instead of overwriting
        # loss_history.npz with only the post-resume epochs
        hist_path = os.path.join(log_folder, "loss_history.npz")
        if os.path.exists(hist_path):
            try:
                with np.load(hist_path) as z:
                    for k in z.files:
                        self.history[k] = z[k].tolist()
            except Exception:
                self.history = defaultdict(list)  # corrupt file: start fresh
        self._t0 = time.time()
        self._jsonl_deduped = False
        self._tb = _make_tb_writer(log_folder)

    def log_step(self, step: int, metrics: Dict[str, float], **extra) -> None:
        rec = {"step": int(step), "time": round(time.time() - self._t0, 3)}
        rec.update({k: float(v) for k, v in metrics.items()})
        rec.update({k: (float(v) if isinstance(v, (int, float)) else v)
                    for k, v in extra.items()})
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()

    def _truncate_jsonl(self, epoch: int) -> None:
        """Resume companion to the npz tail-drop below: metrics.jsonl is
        append-only, so without this a resumed run leaves the crashed
        attempt's rows for re-run epochs in place and appends conflicting
        fresh ones — consumers would see two records per epoch with no
        marker of which is authoritative."""
        path = os.path.join(self.log_folder, "metrics.jsonl")
        self._jsonl.close()
        kept = []
        try:
            with open(path) as f:
                for line in f:
                    try:
                        rec = json.loads(line)
                    except json.JSONDecodeError:
                        continue  # torn tail from a crash mid-write
                    if not isinstance(rec.get("epoch"), (int, float)) \
                            or rec["epoch"] < epoch:
                        kept.append(line)
            tmp = f"{path}.{os.getpid()}.tmp"
            with open(tmp, "w") as f:
                f.writelines(kept)
            os.replace(tmp, path)
        finally:
            self._jsonl = open(path, "a")

    def log_epoch(self, epoch: int, train_metrics: Dict[str, float],
                  val_metrics: Dict[str, float]) -> None:
        if not self._jsonl_deduped:
            # first epoch of this process: drop stale jsonl rows from a
            # crashed attempt REGARDLESS of the npz history — a SIGKILLed
            # run flushed jsonl per epoch but never reached save_history(),
            # so the npz-based branch below can't see the re-run epochs
            # (found by tests/test_train.py sigkill durability test)
            self._jsonl_deduped = True
            self._truncate_jsonl(epoch)
        epochs = self.history.get("epoch", [])
        if epochs and epoch <= epochs[-1]:
            # resume re-runs this epoch: drop the stale tail so the curve
            # stays monotone in epoch with one row per epoch
            keep = sum(1 for e in epochs if e < epoch)
            for k in self.history:
                self.history[k] = self.history[k][:keep]
            self._truncate_jsonl(epoch)
        self.history["epoch"].append(epoch)
        for k, v in train_metrics.items():
            self.history[f"train/{k}"].append(float(v))
        for k, v in val_metrics.items():
            self.history[f"val/{k}"].append(float(v))
        if self._tb is not None:
            import tensorflow as tf
            with self._tb.as_default():
                for k, v in train_metrics.items():
                    tf.summary.scalar(f"train/{k}", float(v), step=epoch)
                for k, v in val_metrics.items():
                    tf.summary.scalar(f"val/{k}", float(v), step=epoch)
            self._tb.flush()
        # durable per epoch (atomic tmp+rename, a few KB): a SIGKILL must
        # not silently drop the pre-crash epochs from the curve a resumed
        # run continues
        self.save_history()

    def save_history(self) -> str:
        """Write the loss-history npz the plotting CLI consumes
        (reference loss history artifact)."""
        path = os.path.join(self.log_folder, "loss_history.npz")
        # atomic: save_history also runs on the crash path, and a torn npz
        # would silently reset a resumed run's curve (the loader treats
        # corrupt files as start-fresh)
        tmp = f"{path}.{os.getpid()}.tmp"
        with open(tmp, "wb") as f:  # file handle: savez must not append .npz
            np.savez(f, **{k: np.asarray(v) for k, v in self.history.items()})
        os.replace(tmp, path)
        return path

    def close(self) -> None:
        self._jsonl.close()
