"""Inference API: encode observations with a trained SRL model.

This is the hand-off surface downstream RL uses at env-step time (the
reference's companion repo robotics-rl-srl reloads ``srl_model.pth`` and
calls the encoder per observation). Here it is a first-class, jit-compiled
encoder with fixed-batch padding so repeated calls never recompile:

    enc = StateEncoder.load("logs/mobile_robot/<run>")
    state = enc.encode(obs)            # (H, W, 3) or (B, H, W, 3) uint8
"""

from __future__ import annotations

import jax
import numpy as np

from srl_zoo_tpu.config import SRLConfig
from srl_zoo_tpu.models.srl_modules import SRLModules
from srl_zoo_tpu.ops.preproc import normalize_images
from srl_zoo_tpu.training import checkpoint as ckpt


class StateEncoder:
    """Deterministic obs -> state encoder around an exported model."""

    def __init__(self, cfg: SRLConfig, variables, max_batch: int = 32):
        self.cfg = cfg
        self.max_batch = max_batch
        self._variables = variables
        model = SRLModules(cfg)

        def encode(variables, obs_u8):
            obs = normalize_images(obs_u8, cfg.normalize_mode)
            return model.apply(variables, obs, train=False,
                               method=SRLModules.encode)

        self._encode = jax.jit(encode)

    @classmethod
    def load(cls, log_folder: str, max_batch: int = 32) -> "StateEncoder":
        cfg = SRLConfig.load(log_folder)
        _, state, _ = ckpt.load_srl_model(log_folder, cfg)
        return cls(cfg, {"params": state.params,
                         "batch_stats": state.batch_stats}, max_batch)

    def encode(self, obs: np.ndarray) -> np.ndarray:
        """uint8 (H, W, C) or (B, H, W, C) -> float32 (state_dim,) or
        (B, state_dim). Pads to ``max_batch`` so the jitted encoder compiles
        for at most one batch shape (no per-call recompilation)."""
        obs = np.asarray(obs, np.uint8)
        single = obs.ndim == 3
        if single:
            obs = obs[None]
        expected = (self.cfg.img_height, self.cfg.img_width,
                    self.cfg.n_channels)
        if obs.ndim != 4 or obs.shape[1:] != expected:
            raise ValueError(
                f"expected uint8 observations of shape {expected} "
                f"(or batched (B, *{expected})), got {obs.shape}")
        b = len(obs)
        if b == 0:
            # a vectorized-env wrapper with zero active envs: well-formed
            # empty result instead of np.concatenate([]) raising
            return np.zeros((0, self.cfg.state_dim), np.float32)
        out = []
        for start in range(0, b, self.max_batch):
            chunk = obs[start:start + self.max_batch]
            n = len(chunk)
            if n < self.max_batch:
                chunk = np.concatenate(
                    [chunk, np.zeros((self.max_batch - n,) + chunk.shape[1:],
                                     np.uint8)])
            states = np.asarray(jax.device_get(
                self._encode(self._variables, chunk)))[:n]
            out.append(states)
        # honor the float32 contract: a --dtype bfloat16 model returns
        # ml_dtypes.bfloat16 arrays, which torch.from_numpy/sklearn reject
        states = np.concatenate(out).astype(np.float32, copy=False)
        return states[0] if single else states


def load_encoder(log_folder: str, max_batch: int = 32) -> StateEncoder:
    """Convenience alias (mirrors how robotics-rl-srl loads a trained SRL
    model from its log folder)."""
    return StateEncoder.load(log_folder, max_batch)
