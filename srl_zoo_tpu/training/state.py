"""Train state: params + BatchNorm stats + optimizer state, as one pytree."""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from srl_zoo_tpu.config import SRLConfig
from srl_zoo_tpu.models.srl_modules import SRLModules


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def make_optimizer(cfg: SRLConfig) -> optax.GradientTransformation:
    """Adam with the reference's defaults (torch Adam betas/eps; reference:
    models/learner.py optimizer construction).

    With ``--episode-prior-optimizer separate`` the discriminator parameter
    subtree gets its OWN Adam (independent first/second moments) via
    optax.multi_transform — the functional equivalent of the separate torch
    optimizer docs/DESIGN_DECISIONS.md #4 suspects upstream used. Both
    transforms still apply in the same jitted step (same compiled program
    shape; no second apply/backward)."""
    adam = optax.adam(cfg.learning_rate, b1=0.9, b2=0.999, eps=1e-8)
    tx: optax.GradientTransformation = adam
    if cfg.use_episode_prior and cfg.episode_prior_optimizer == "separate":
        disc_adam = optax.adam(cfg.learning_rate, b1=0.9, b2=0.999, eps=1e-8)
        tx = optax.multi_transform(
            {"rest": adam, "disc": disc_adam},
            lambda params: {k: ("disc" if k == "discriminator" else "rest")
                            for k in params})
    if cfg.grad_accum > 1:
        # accumulate the RUNNING MEAN of the last grad_accum gradients and
        # apply one Adam update every grad_accum steps: effective batch
        # batch_size*grad_accum at batch_size activation memory. Composes
        # with multi_transform; the update stays one jitted call (zero
        # updates on accumulating steps), so the epoch lax.scan shape is
        # unchanged.
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.grad_accum)
    return tx


def _dummy_batch_args(cfg: SRLConfig, batch_size: int):
    """Positional args for model init, matching SRLModules.__call__."""
    h, w, c = cfg.img_height, cfg.img_width, cfg.n_channels
    obs = jnp.zeros((batch_size, h, w, c), jnp.float32)
    next_obs = obs if cfg.needs_next_obs else None
    actions = jnp.zeros((batch_size,), jnp.int32) if cfg.use_forward else None
    pos = neg = None
    if cfg.use_triplet:
        pos = jnp.zeros((batch_size, h, w, 3), jnp.float32)
        neg = jnp.zeros((batch_size, h, w, 3), jnp.float32)
    occluded = obs if cfg.use_dae else None
    return obs, next_obs, actions, pos, neg, occluded


def create_train_state(cfg: SRLConfig, rng: jax.Array,
                       init_batch_size: int = 2,
                       with_optimizer: bool = True):
    """Build (model, TrainState). Init runs on a tiny batch — BatchNorm and
    shapes are batch-size independent.

    ``with_optimizer=False`` skips make_optimizer/tx.init and returns
    ``tx=None`` with an empty opt_state — inference-time reloads
    (checkpoint.load_srl_model) only need the params/batch_stats template,
    and Adam moments are 2x parameter memory allocated for nothing."""
    model = SRLModules(cfg)
    p_rng, s_rng = jax.random.split(rng)
    args = _dummy_batch_args(cfg, init_batch_size)
    variables = model.init({"params": p_rng, "sampling": s_rng}, *args,
                           train=True)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    if not with_optimizer:
        state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                           batch_stats=batch_stats, opt_state=())
        return model, state, None
    tx = make_optimizer(cfg)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       batch_stats=batch_stats, opt_state=tx.init(params))
    return model, state, tx
