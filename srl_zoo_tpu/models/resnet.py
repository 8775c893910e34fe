"""ResNet-18 encoder (NHWC, Flax).

Reference: models/models.py ``ConvolutionalNetwork`` wraps torchvision's
ImageNet-pretrained ResNet-18 with the final fc replaced by a ``state_dim``
head. This host has no network access and no checked-in torchvision weights,
so the rebuild trains from scratch by default; torchvision weights CAN be
ported exactly via models/torch_port.py (padding below is torch-style
explicit, not XLA 'SAME', so ported outputs match numerically).
Architecture matches ResNet-18 (BasicBlock x [2,2,2,2]).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        residual = x
        y = nn.Conv(self.features, (3, 3), strides=(self.strides, self.strides),
                    padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype)(x)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.features, (1, 1),
                               strides=(self.strides, self.strides),
                               use_bias=False, dtype=self.dtype)(residual)
            residual = nn.BatchNorm(use_running_average=not train,
                                    dtype=self.dtype)(residual)
        return nn.relu(y + residual)


class ResNet18(nn.Module):
    state_dim: int
    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        features = 64
        for stage, n_blocks in enumerate(self.stage_sizes):
            for block in range(n_blocks):
                strides = 2 if stage > 0 and block == 0 else 1
                x = BasicBlock(features=features, strides=strides,
                               dtype=self.dtype)(x, train=train)
            features *= 2
        x = jnp.mean(x, axis=(1, 2))  # global average pool
        return nn.Dense(self.state_dim, dtype=jnp.float32)(x)
