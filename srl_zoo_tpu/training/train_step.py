"""Jitted train/eval/encode steps (the hot path).

Reference: the per-minibatch loop body of models/learner.py — forward both
observations, accumulate weighted losses, backward, Adam step (SURVEY.md
§3.1 hot loop). Rebuilt as a single functional step:

  train_step(state, batch, rng) -> (state, metrics)

* uint8 batches are normalized (and DAE-occluded) on device — fused by XLA
  into the first conv,
* one model apply computes every active output (single BatchNorm update),
* the episode-prior's adversarial pair is realized with parameter-subtree
  stop-gradients (discriminator learns on detached states; encoder fools a
  frozen-for-this-term discriminator) — one optimizer step updates both,
* state is donated (no HBM copy per step); batch arrives sharded over the
  data mesh, XLA inserts the gradient all-reduce over ICI.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from srl_zoo_tpu.config import SRLConfig
from srl_zoo_tpu.losses.registry import compute_total_loss
from srl_zoo_tpu.models.srl_modules import SRLModules, slice_state as _slice_cols
from srl_zoo_tpu.ops.preproc import normalize_images, occlude
from srl_zoo_tpu.training.state import TrainState


def build_steps(cfg: SRLConfig, model: SRLModules, tx,
                dae_feature_fn: Optional[Callable] = None, mesh=None):
    """Returns (train_step, eval_step, encode_step, train_epoch, eval_epoch),
    all jit-compiled. The *_epoch variants scan a whole epoch of stacked
    batches in one device program (cached mode).

    ``dae_feature_fn(normalized_images) -> features`` is the frozen
    pretrained-DAE encoder for the perceptual-similarity loss.
    ``mesh`` is required for ``device_cache='sharded'`` (the frame store is
    sharded over the mesh and gathers ride ICI; ops/sharded_store.py).
    """
    if "perceptual" in cfg.loss_dict and dae_feature_fn is None:
        raise ValueError("perceptual loss requires a frozen DAE "
                         "(--path-to-dae)")

    norm = lambda u8: normalize_images(u8, cfg.normalize_mode)

    if cfg.device_cache == "sharded":
        if mesh is None:
            raise ValueError("device_cache='sharded' needs the mesh at "
                             "build_steps time")
        from srl_zoo_tpu.ops.sharded_store import gather_sharded

        def take_rows(frames, i):
            return gather_sharded(frames, i, mesh)
    else:
        def take_rows(frames, i):
            return jnp.take(frames, i, axis=0)

    def _raw_images(batch: Dict[str, jnp.ndarray], cache):
        """uint8 (obs, next_obs, pos, neg) — from the batch (streaming mode)
        or gathered in-HBM from the dataset cache (indices-only batches,
        see data/device_cache.py)."""
        if cache is None:
            return (batch["obs"],
                    batch.get("next_obs"),
                    batch.get("pos_obs"),
                    batch.get("neg_obs"))
        frames = cache["frames"]
        n = frames.shape[0]
        # rotating hybrid batches (data/hybrid.py) address the store by SLOT
        # (cache_slots / next_cache_slots / neg_cache_slots); full-cache and
        # sharded-store batches address it by global index. Key presence is
        # static per compiled program, so the fast paths are untouched.
        idx = batch.get("cache_slots", batch["indices"])

        def grab(i):
            o = take_rows(frames, i)
            if cfg.multi_view and not cfg.use_triplet:
                o = jnp.concatenate(
                    [o, take_rows(cache["frames_2"], i)], axis=-1)
            return o

        obs = grab(idx)
        next_obs = None
        if cfg.needs_next_obs:
            nxt = batch.get("next_cache_slots")
            next_obs = grab(nxt if nxt is not None
                            else jnp.minimum(idx + 1, n - 1))
        pos = take_rows(cache["frames_2"], idx) if cfg.use_triplet \
            else None
        neg = take_rows(frames, batch.get("neg_cache_slots",
                                          batch.get("neg_indices"))) \
            if cfg.use_triplet else None
        return obs, next_obs, pos, neg

    def _model_inputs(batch: Dict[str, jnp.ndarray], rng: jax.Array, cache):
        """Normalize on device; build the SRLModules.__call__ args."""
        obs_u8, next_u8, pos_u8, neg_u8 = _raw_images(batch, cache)
        obs = norm(obs_u8)
        next_obs = norm(next_u8) if cfg.needs_next_obs else None
        actions = batch["actions"] if cfg.use_forward else None
        pos = norm(pos_u8) if cfg.use_triplet else None
        neg = norm(neg_u8) if cfg.use_triplet else None
        occluded = None
        if cfg.use_dae:
            if cfg.noise_type == "gaussian":
                from srl_zoo_tpu.ops.preproc import gaussian_noise
                occluded = gaussian_noise(rng, obs, cfg.noise_std)
            else:
                occluded = occlude(rng, obs, cfg.occlusion_percentage)
        return obs, (obs, next_obs, actions, pos, neg, occluded)

    def _extras(variables, params, outputs, batch,
                target_obs) -> Dict[str, jnp.ndarray]:
        extras: Dict[str, jnp.ndarray] = {}
        if cfg.use_episode_prior:
            sl = cfg.slices["episode-prior"]
            s1 = _slice_cols(outputs["state"], sl)
            s2 = jnp.take(s1, batch["episode_partners"], axis=0)
            sg = jax.lax.stop_gradient
            # discriminator learns on detached states
            extras["disc_logits_d"] = model.apply(
                variables, sg(s1), sg(s2), method=SRLModules.discriminate)
            # encoder fools a gradient-frozen discriminator
            params_frozen_d = dict(params)
            params_frozen_d["discriminator"] = jax.tree_util.tree_map(
                sg, params["discriminator"])
            vars_frozen = dict(variables)
            vars_frozen["params"] = params_frozen_d
            extras["disc_logits_e"] = model.apply(
                vars_frozen, s1, s2, method=SRLModules.discriminate)
        if "perceptual" in cfg.loss_dict:
            extras["feat_recon"] = dae_feature_fn(outputs["recon"])
            extras["feat_target"] = dae_feature_fn(target_obs)
        return extras

    def _loss_fn(params, batch_stats, batch, rng, train: bool, cache=None):
        occl_rng, sample_rng = jax.random.split(jax.random.fold_in(rng, 1))
        target_obs, args = _model_inputs(batch, occl_rng, cache)
        variables = {"params": params, "batch_stats": batch_stats}
        rngs = {"sampling": sample_rng} if (cfg.use_vae and train) else {}
        if train:
            outputs, mutated = model.apply(variables, *args, train=True,
                                           rngs=rngs,
                                           mutable=["batch_stats"])
            new_batch_stats = mutated.get("batch_stats", batch_stats)
        else:
            outputs = model.apply(variables, *args, train=False, rngs=rngs)
            new_batch_stats = batch_stats
        extras = _extras(variables, params, outputs, batch, target_obs)
        total, metrics = compute_total_loss(cfg, outputs, batch, target_obs,
                                            params, extras)
        return total, (metrics, new_batch_stats)

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray],
                   rng: jax.Array, cache=None
                   ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        rng = jax.random.fold_in(rng, state.step)
        grad_fn = jax.value_and_grad(_loss_fn, has_aux=True)
        (_, (metrics, new_bs)), grads = grad_fn(
            state.params, state.batch_stats, batch, rng, True, cache)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_bs, opt_state=new_opt)
        return new_state, metrics

    def eval_step(state: TrainState, batch: Dict[str, jnp.ndarray],
                  rng: jax.Array, cache=None) -> Dict[str, jnp.ndarray]:
        _, (metrics, _) = _loss_fn(state.params, state.batch_stats, batch,
                                   rng, False, cache)
        return metrics

    def encode_step(state: TrainState, obs_or_idx: jnp.ndarray,
                    cache=None) -> jnp.ndarray:
        """Deterministic states for export (reference:
        predStatesWithDataLoader / SRLModules.getStates). In cached mode
        ``obs_or_idx`` is an int32 index array into the HBM frame store."""
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        if cache is None:
            obs_u8 = obs_or_idx
        else:
            obs_u8 = take_rows(cache["frames"], obs_or_idx)
            if cfg.multi_view and not cfg.use_triplet:
                obs_u8 = jnp.concatenate(
                    [obs_u8, take_rows(cache["frames_2"], obs_or_idx)],
                    axis=-1)
        return model.apply(variables, norm(obs_u8), train=False,
                           method=SRLModules.encode)

    # ---- whole-epoch scan (cached mode): one device program per epoch -------
    # With the dataset resident in HBM, an epoch's host traffic is just the
    # stacked per-step index/meta arrays — so the entire epoch can run as a
    # single jitted lax.scan: no per-step dispatch, no per-step transfers.
    # (Python-loop steps remain the streaming-mode path.)
    _train_step_raw, _eval_step_raw = train_step, eval_step

    def train_epoch(state: TrainState, batches: Dict[str, jnp.ndarray],
                    rng: jax.Array, cache=None):
        """batches: each value stacked to (n_steps, B, ...). Returns
        (state, per-step metrics stacked to (n_steps,)).

        An optional ``step_valid`` (n_steps,) float marks bucket-padding
        steps (learner._stack_batches pads the step axis to a size ladder so
        grids over dataset size reuse ONE compiled program): padded steps are
        lax.cond-skipped — no optimizer update, no state.step increment, zero
        metrics with ``_n_valid`` 0 so the weighted epoch mean ignores them.
        """
        step_valid = batches.get("step_valid")
        if step_valid is None:
            def body(carry, batch):
                return _train_step_raw(carry, batch, rng, cache)
            return jax.lax.scan(body, state, batches)

        data = {k: v for k, v in batches.items() if k != "step_valid"}
        template = jax.tree_util.tree_map(lambda x: x[0], data)
        m_shape = jax.eval_shape(
            lambda c, b: _train_step_raw(c, b, rng, cache)[1],
            state, template)

        def body(carry, xs):
            batch, sv = xs

            def do(c):
                return _train_step_raw(c, batch, rng, cache)

            def skip(c):
                zeros = jax.tree_util.tree_map(
                    lambda s: jnp.zeros(s.shape, s.dtype), m_shape)
                return c, zeros

            return jax.lax.cond(sv > 0, do, skip, carry)

        return jax.lax.scan(body, state, (data, step_valid))

    def eval_epoch(state: TrainState, batches: Dict[str, jnp.ndarray],
                   rng: jax.Array, cache=None):
        """Bucket-padded steps are lax.cond-skipped like in train_epoch —
        the padding already contributed ``_n_valid`` 0 to the weighted mean
        (correctness), but running the full duplicate-of-step-0 forward
        just to discard it wasted up to 33% of cached-mode eval compute
        (the ladder pads by at most a third)."""
        data = {k: v for k, v in batches.items() if k != "step_valid"}
        step_valid = batches.get("step_valid")
        if step_valid is None:
            def body(carry, batch):
                return carry, _eval_step_raw(state, batch, rng, cache)

            _, metrics = jax.lax.scan(body, None, data)
            return metrics

        template = jax.tree_util.tree_map(lambda x: x[0], data)
        m_shape = jax.eval_shape(
            lambda b: _eval_step_raw(state, b, rng, cache), template)
        zeros = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), m_shape)

        def body(carry, xs):
            batch, sv = xs
            return carry, jax.lax.cond(
                sv > 0,
                lambda b: _eval_step_raw(state, b, rng, cache),
                lambda b: zeros, batch)

        _, metrics = jax.lax.scan(body, None, (data, step_valid))
        return metrics

    train_step = jax.jit(train_step, donate_argnums=(0,))
    eval_step = jax.jit(eval_step)
    encode_step = jax.jit(encode_step)
    train_epoch = jax.jit(train_epoch, donate_argnums=(0,))
    eval_epoch = jax.jit(eval_epoch)
    return train_step, eval_step, encode_step, train_epoch, eval_epoch
