"""Checkpointing: model export + full-state resume, async by default.

Reference: models/learner.py saves the best-validation model as
``srl_model.pth`` (params only, no optimizer state, no mid-run resume).
The rebuild keeps that export contract (``srl_model.msgpack`` +
``exp_config.json``) and adds what the reference lacks (SURVEY.md §5):
full TrainState (params + batch_stats + optimizer + step) checkpoints for
restart-resume.

``AsyncCheckpointer`` overlaps checkpoint IO with training: ``save_*`` takes
an on-device copy (cheap HBM copy, async dispatch — the live state can then
be donated by the next train step without invalidating the snapshot) and a
single worker thread performs the device->host transfer + serialization +
atomic write. Through a slow host link this hides multi-second transfers
behind the next epoch's compute. Latest-wins: a newer snapshot replaces a
queued one of the same kind.
"""

from __future__ import annotations

import json
import os
import threading
from typing import Optional, Tuple

import flax.serialization
import jax
import jax.numpy as jnp

from srl_zoo_tpu.config import SRLConfig
from srl_zoo_tpu.training.state import TrainState, create_train_state

MODEL_FILE = "srl_model.msgpack"
RESUME_DIR = "checkpoints"


# ---- best-model export (the reference's srl_model.pth contract) ---------------
def save_srl_model(log_folder: str, params, batch_stats) -> str:
    os.makedirs(log_folder, exist_ok=True)
    path = os.path.join(log_folder, MODEL_FILE)
    payload = {"params": jax.device_get(params),
               "batch_stats": jax.device_get(batch_stats)}
    # atomic: this runs on the background writer thread and the file is read
    # by resume runs and concurrently running serve.py processes — neither
    # may ever see a torn write
    tmp = f"{path}.{os.getpid()}.tmp"
    with open(tmp, "wb") as f:
        f.write(flax.serialization.to_bytes(payload))
    os.replace(tmp, path)
    return path


def load_srl_model(log_folder: str, cfg: SRLConfig) -> Tuple:
    """Rebuild the model skeleton from exp_config and restore exported
    weights (reference: evaluation/predict_dataset.py reload path).

    Returns (model, state, None): every caller is an inference-time reload
    that only needs params/batch_stats — skipping tx.init avoids allocating
    Adam moments (2x parameter memory) just to throw them away."""
    model, state, tx = create_train_state(cfg, jax.random.PRNGKey(cfg.seed),
                                          with_optimizer=False)
    path = os.path.join(log_folder, MODEL_FILE)
    with open(path, "rb") as f:
        payload = flax.serialization.from_bytes(
            {"params": state.params, "batch_stats": state.batch_stats},
            f.read())
    state = state.replace(params=payload["params"],
                          batch_stats=payload["batch_stats"])
    return model, state, tx


# ---- full-state resume checkpoints ---------------------------------------------
def save_train_state(log_folder: str, state: TrainState,
                     best_val: Optional[float] = None,
                     epoch: Optional[int] = None) -> str:
    ckpt_dir = os.path.join(log_folder, RESUME_DIR)
    os.makedirs(ckpt_dir, exist_ok=True)
    step = int(jax.device_get(state.step))
    path = os.path.join(ckpt_dir, "state_latest.msgpack")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(flax.serialization.to_bytes(jax.device_get(state)))
    os.replace(tmp, path)
    meta = {"step": step}
    if best_val is not None and best_val != float("inf"):
        # persisted so a resumed run keeps selecting against the pre-crash
        # best instead of overwriting srl_model.msgpack on its first epoch
        meta["best_val"] = float(best_val)
    if epoch is not None:
        # epochs COMPLETED — authoritative for resume (the step-count
        # estimate drifts when the rotating hybrid partition makes
        # steps/epoch vary by ±1)
        meta["epoch"] = int(epoch)
    meta_path = os.path.join(ckpt_dir, "meta.json")
    with open(meta_path + ".tmp", "w") as f:
        json.dump(meta, f)
    os.replace(meta_path + ".tmp", meta_path)  # atomic, like the state file
    return path


def load_meta(log_folder: str) -> dict:
    path = os.path.join(log_folder, RESUME_DIR, "meta.json")
    if not os.path.exists(path):
        return {}
    try:
        with open(path) as f:
            return json.load(f)
    except (json.JSONDecodeError, OSError):
        return {}  # torn/unreadable meta must not break crash recovery


def restore_train_state(log_folder: str, template: TrainState
                        ) -> Optional[TrainState]:
    """Restore the latest resume checkpoint into the given state template;
    returns None when there is nothing to resume."""
    path = os.path.join(log_folder, RESUME_DIR, "state_latest.msgpack")
    if not os.path.exists(path):
        return None
    with open(path, "rb") as f:
        raw = f.read()
    try:
        return flax.serialization.from_bytes(template, raw)
    except (ValueError, KeyError, TypeError) as e:
        # a structure mismatch here is almost always a changed optimizer/
        # model flag between the original run and the resume — surface that
        # instead of flax's raw tree-mismatch error
        raise ValueError(
            f"Resume checkpoint in {log_folder} does not match the current "
            "train state structure. --resume requires the SAME model and "
            "optimizer flags as the original run (--model-type, --losses, "
            "--state-dim, --grad-accum, --episode-prior-optimizer, ...); "
            f"underlying error: {type(e).__name__}: {e}") from e


# ---- async writer ----------------------------------------------------------------
def _device_copy(tree):
    """On-device copy of a pytree: new buffers, so later donation of the
    originals cannot invalidate the snapshot. Dispatch is async — this
    returns immediately."""
    return jax.tree_util.tree_map(jnp.copy, tree)


class AsyncCheckpointer:
    """Background writer for resume checkpoints and best-model exports.

    save_state/save_model snapshot on device and return immediately; one
    worker thread drains a latest-wins slot per kind. ``close()`` flushes
    pending writes and re-raises any writer error.
    """

    def __init__(self, log_folder: str):
        self.log_folder = log_folder
        self._lock = threading.Lock()
        self._event = threading.Event()
        self._jobs: dict = {}
        self._stop = False
        self._err: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="srl-ckpt-writer")
        self._thread.start()

    def _run(self):
        while True:
            self._event.wait()
            with self._lock:
                jobs, self._jobs = self._jobs, {}
                stop = self._stop
                self._event.clear()
            for kind, payload in jobs.items():
                try:
                    if kind == "state":
                        state, best_val, epoch = payload
                        save_train_state(self.log_folder,
                                         jax.device_get(state), best_val,
                                         epoch=epoch)
                    elif kind == "model":
                        save_srl_model(self.log_folder, *payload)
                except BaseException as e:  # surfaced in close()
                    self._err = e
            if stop:
                with self._lock:
                    if not self._jobs:
                        return
                self._event.set()  # drain late arrivals before exiting

    def _submit(self, kind: str, payload) -> None:
        if self._err is not None:
            raise RuntimeError("checkpoint writer failed") from self._err
        with self._lock:
            if self._stop:
                # after close() the worker may already be gone — a silently
                # enqueued job would never be written
                raise RuntimeError("checkpoint writer already closed")
            self._jobs[kind] = payload
        self._event.set()

    def save_state(self, state: TrainState,
                   best_val: Optional[float] = None,
                   epoch: Optional[int] = None) -> None:
        self._submit("state", (_device_copy(state), best_val, epoch))

    def save_model(self, params, batch_stats) -> None:
        self._submit("model", (_device_copy(params),
                               _device_copy(batch_stats)))

    def close(self) -> None:
        with self._lock:
            self._stop = True
        self._event.set()
        self._thread.join(timeout=600)
        if self._thread.is_alive():
            # a hung write (dead mount, stuck device_get) must not masquerade
            # as a successful flush — the checkpoint on disk is stale
            raise RuntimeError("checkpoint writer did not flush within 600s")
        if self._err is not None:
            raise RuntimeError("checkpoint writer failed") from self._err
