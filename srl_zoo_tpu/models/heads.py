"""Dynamics / adversarial heads operating on state slices.

Reference: models/forward_inverse.py (``BaseForwardModel`` s,a -> s';
``BaseInverseModel`` s,s' -> action logits; ``BaseRewardModel`` s,s' -> reward
class logits) and models/priors.py episode-prior ``Discriminator`` (MLP, BCE).
Heads are small MLPs; their input/output widths are fixed by the per-loss
state slices (SRL Splits), which are static config.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class ForwardModel(nn.Module):
    """Predict next state slice from (state slice, one-hot action)."""

    state_dim: int
    n_actions: int
    mlp: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, state: jnp.ndarray, action: jnp.ndarray) -> jnp.ndarray:
        a = jax.nn.one_hot(action, self.n_actions, dtype=state.dtype)
        x = jnp.concatenate([state, a], axis=-1)
        if self.mlp:
            x = nn.relu(nn.Dense(64, dtype=self.dtype)(x))
        return nn.Dense(self.state_dim, dtype=jnp.float32)(x)


class InverseModel(nn.Module):
    """Predict the action taken between two consecutive state slices."""

    n_actions: int
    mlp: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, state: jnp.ndarray, next_state: jnp.ndarray) -> jnp.ndarray:
        x = jnp.concatenate([state, next_state], axis=-1)
        if self.mlp:
            x = nn.relu(nn.Dense(128, dtype=self.dtype)(x))
        return nn.Dense(self.n_actions, dtype=jnp.float32)(x)


class RewardModel(nn.Module):
    """Classify the reward of a transition (s, s')."""

    n_reward_classes: int
    hidden: Sequence[int] = (64, 64)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, state: jnp.ndarray, next_state: jnp.ndarray) -> jnp.ndarray:
        x = jnp.concatenate([state, next_state], axis=-1)
        for h in self.hidden:
            x = nn.relu(nn.Dense(h, dtype=self.dtype)(x))
        return nn.Dense(self.n_reward_classes, dtype=jnp.float32)(x)


class Discriminator(nn.Module):
    """Episode-prior discriminator: does a state pair come from the same
    episode? (reference: models/priors.py)."""

    hidden: Sequence[int] = (64, 64)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, s1: jnp.ndarray, s2: jnp.ndarray) -> jnp.ndarray:
        x = jnp.concatenate([s1, s2], axis=-1)
        for h in self.hidden:
            x = nn.relu(nn.Dense(h, dtype=self.dtype)(x))
        return nn.Dense(1, dtype=jnp.float32)(x)[..., 0]  # (B,) logits
