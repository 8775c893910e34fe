"""Composite SRL module: encoder + heads selected by the active losses.

Reference: models/modules.py ``SRLModules`` / ``SRLModulesSplit`` — composes
the chosen encoder with a decoder and forward/inverse/reward/discriminator
heads based on the ``--losses`` list, and routes each loss to its slice of the
state vector (SRL Splits).

TPU-first notes:
  * one ``__call__`` computes every output the active losses need, so a train
    step is a single ``apply`` (single BatchNorm mutable update, maximal XLA
    fusion),
  * VAE reparameterization threads an explicit 'sampling' rng
    (reference: models/vae.py reparameterize),
  * slice routing is static (from config), so jit compiles exact gathers.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from srl_zoo_tpu.config import RECONSTRUCTION_LOSSES, SRLConfig
from srl_zoo_tpu.models.decoders import CNNDecoder, DenseDecoder
from srl_zoo_tpu.models.encoders import make_encoder
from srl_zoo_tpu.models.heads import (Discriminator, ForwardModel,
                                      InverseModel, RewardModel)


def slice_state(state: jnp.ndarray, sl) -> jnp.ndarray:
    """The SRL-splits slice: (start, size) of the last axis. Bounds are
    static (from config), so plain basic indexing compiles to a free XLA
    slice. THE one slice helper — losses/registry.py and
    training/train_step.py import it so routing semantics can never
    diverge."""
    start, size = sl
    return state[..., start:start + size]


class SRLModules(nn.Module):
    cfg: SRLConfig

    def setup(self):
        cfg = self.cfg
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        out_dim = 2 * cfg.state_dim if cfg.use_vae else cfg.state_dim
        self.encoder = make_encoder(cfg.model_type, out_dim, dtype=dtype,
                                    bn_momentum=cfg.bn_momentum)

        slices = cfg.slices
        if cfg.use_decoder:
            # one shared slice is guaranteed by SRLConfig.__post_init__
            # (config-time validation); no duplicate check here to drift
            self.recon_slice = next(slices[n] for n in cfg.loss_names
                                    if n in RECONSTRUCTION_LOSSES)
            out_ch = cfg.n_channels
            if cfg.model_type in ("mlp", "linear"):
                self.decoder = DenseDecoder(img_height=cfg.img_height,
                                            img_width=cfg.img_width,
                                            out_channels=out_ch, dtype=dtype)
            else:
                self.decoder = CNNDecoder(img_height=cfg.img_height,
                                          img_width=cfg.img_width,
                                          out_channels=out_ch, dtype=dtype,
                                          bn_momentum=cfg.bn_momentum)
        if cfg.use_forward:
            self.forward_model = ForwardModel(
                state_dim=slices["forward"][1], n_actions=cfg.n_actions,
                mlp=cfg.inverse_model_type == "mlp", dtype=dtype)
        if cfg.use_inverse:
            self.inverse_model = InverseModel(
                n_actions=cfg.n_actions,
                mlp=cfg.inverse_model_type == "mlp", dtype=dtype)
        if cfg.use_reward:
            self.reward_model = RewardModel(
                n_reward_classes=cfg.n_reward_classes, dtype=dtype)
        if cfg.use_episode_prior:
            self.discriminator = Discriminator(dtype=dtype)

    # ---- encoding ------------------------------------------------------------
    def _encode_raw(self, x: jnp.ndarray, train: bool):
        """Run the encoder; split (mu, logvar) when the VAE is active."""
        out = self.encoder(x, train=train)
        if self.cfg.use_vae:
            mu, logvar = jnp.split(out, 2, axis=-1)
            return mu, logvar
        return out, None

    def _reparameterize(self, mu, logvar, train: bool):
        """Sample z on the VAE's state slice; deterministic mu elsewhere
        (reference: models/vae.py reparameterize)."""
        if not (self.cfg.use_vae and train):
            return mu
        start, size = self.cfg.slices["vae"]
        eps = jax.random.normal(self.make_rng("sampling"), mu.shape, mu.dtype)
        z = mu + jnp.exp(0.5 * logvar) * eps
        # only the vae slice is stochastic; other slices stay deterministic
        dim_ids = jax.lax.broadcasted_iota(jnp.int32, mu.shape, len(mu.shape) - 1)
        in_slice = (dim_ids >= start) & (dim_ids < start + size)
        return jnp.where(in_slice, z, mu)

    def encode(self, obs: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """Deterministic state (mu) — the export / downstream-RL path
        (reference: SRLModules.getStates)."""
        mu, _ = self._encode_raw(obs, train)
        return mu

    def discriminate(self, s1: jnp.ndarray, s2: jnp.ndarray) -> jnp.ndarray:
        return self.discriminator(s1, s2)

    # ---- the one-apply forward ------------------------------------------------
    def __call__(self,
                 obs: jnp.ndarray,
                 next_obs: Optional[jnp.ndarray] = None,
                 actions: Optional[jnp.ndarray] = None,
                 pos_obs: Optional[jnp.ndarray] = None,
                 neg_obs: Optional[jnp.ndarray] = None,
                 occluded_obs: Optional[jnp.ndarray] = None,
                 train: bool = True) -> Dict[str, Any]:
        """Compute every tensor the active losses consume.

        ``obs`` (and friends) are already-normalized float NHWC images.
        ``occluded_obs`` is the DAE-corrupted version of obs (the decoder
        reconstructs the clean obs from it).
        """
        cfg = self.cfg
        out: Dict[str, Any] = {}

        enc_in = occluded_obs if (cfg.use_dae and occluded_obs is not None) else obs
        mu, logvar = self._encode_raw(enc_in, train)
        state = self._reparameterize(mu, logvar, train)
        out["mu"], out["logvar"], out["state"] = mu, logvar, state

        if next_obs is not None:
            next_mu, next_logvar = self._encode_raw(next_obs, train)
            out["next_state"] = self._reparameterize(next_mu, next_logvar,
                                                     train)

        if cfg.use_decoder:
            out["recon"] = self.decoder(slice_state(state, self.recon_slice),
                                        train=train)

        if cfg.use_forward:
            sl = cfg.slices["forward"]
            out["forward_pred"] = self.forward_model(
                slice_state(state, sl), actions)
        if cfg.use_inverse:
            sl = cfg.slices["inverse"]
            out["inverse_logits"] = self.inverse_model(
                slice_state(state, sl), slice_state(out["next_state"], sl))
        if cfg.use_reward:
            sl = cfg.slices["reward"]
            out["reward_logits"] = self.reward_model(
                slice_state(state, sl), slice_state(out["next_state"], sl))

        if cfg.use_triplet:
            pos_mu, _ = self._encode_raw(pos_obs, train)
            neg_mu, _ = self._encode_raw(neg_obs, train)
            out["pos_state"], out["neg_state"] = pos_mu, neg_mu

        if cfg.use_episode_prior:
            # Touch the discriminator so lazy init creates its params; the
            # loss-bearing logits are computed in the train step via
            # ``discriminate`` (two applies with parameter-subtree
            # stop-gradients for the adversarial game).
            sl = cfg.slices["episode-prior"]
            s = slice_state(state, sl)
            out["disc_probe"] = self.discriminator(s, s)

        return out
