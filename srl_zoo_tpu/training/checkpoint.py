"""Checkpointing: model export + full-state resume.

Reference: models/learner.py saves the best-validation model as
``srl_model.pth`` (params only, no optimizer state, no mid-run resume).
The rebuild keeps that export contract (``srl_model.msgpack`` +
``exp_config.json``) and adds what the reference lacks (SURVEY.md §5):
full TrainState (params + batch_stats + optimizer + step) checkpoints for
restart-resume, via orbax when available, flax msgpack otherwise.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import flax.serialization
import jax

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
    with open(path, "wb") as f:
        f.write(flax.serialization.to_bytes(payload))
    return path


def load_srl_model(log_folder: str, cfg: SRLConfig) -> Tuple:
    """Rebuild the model skeleton from exp_config and restore exported
    weights (reference: evaluation/predict_dataset.py reload path)."""
    model, state, tx = create_train_state(cfg, jax.random.PRNGKey(cfg.seed))
    path = os.path.join(log_folder, MODEL_FILE)
    with open(path, "rb") as f:
        payload = flax.serialization.from_bytes(
            {"params": state.params, "batch_stats": state.batch_stats},
            f.read())
    state = state.replace(params=payload["params"],
                          batch_stats=payload["batch_stats"])
    return model, state, tx


# ---- full-state resume checkpoints ---------------------------------------------
def save_train_state(log_folder: str, state: TrainState) -> str:
    ckpt_dir = os.path.join(log_folder, RESUME_DIR)
    os.makedirs(ckpt_dir, exist_ok=True)
    step = int(jax.device_get(state.step))
    path = os.path.join(ckpt_dir, "state_latest.msgpack")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(flax.serialization.to_bytes(jax.device_get(state)))
    os.replace(tmp, path)
    with open(os.path.join(ckpt_dir, "meta.json"), "w") as f:
        json.dump({"step": step}, f)
    return path


def restore_train_state(log_folder: str, template: TrainState
                        ) -> Optional[TrainState]:
    """Restore the latest resume checkpoint into the given state template;
    returns None when there is nothing to resume."""
    path = os.path.join(log_folder, RESUME_DIR, "state_latest.msgpack")
    if not os.path.exists(path):
        return None
    with open(path, "rb") as f:
        return flax.serialization.from_bytes(template, f.read())
