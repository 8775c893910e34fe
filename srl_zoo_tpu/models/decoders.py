"""Decoders reconstructing frames from a state slice.

Reference: models/autoencoders.py ``CNNAutoEncoder`` / ``DenseAutoEncoder``
decoder halves (Linear from state to a small spatial volume, then
ConvTranspose stack back to 224x224x3) and models/vae.py decoders.
Rebuilt NHWC: five stride-2 ConvTranspose stages (x32 upsampling), so image
sides must be divisible by 32 (224 and 64 both are).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from srl_zoo_tpu.models.batchnorm import BatchNorm
from srl_zoo_tpu.ops.subpixel import SubpixelConvTranspose


class CNNDecoder(nn.Module):
    img_height: int
    img_width: int
    out_channels: int = 3
    dtype: Any = jnp.float32
    # "conv_transpose" (lax.conv_transpose) or "subpixel" (parity conv +
    # depth-to-space, ops/subpixel.py). Parameter trees are identical, so
    # the two load each other's checkpoints; pick by measurement
    # (benchmarks/subpixel_bench.py, docs/PERF.md).
    deconv: str = "conv_transpose"
    # flax convention; 0.9 == torch BatchNorm2d default (decision #23)
    bn_momentum: float = 0.9

    def _deconv(self, idx, features, dtype):
        # Explicit names keep the param tree identical across the two
        # implementations (flax would otherwise auto-name by class).
        name = f"ConvTranspose_{idx}"
        if self.deconv == "subpixel":
            return SubpixelConvTranspose(features, dtype=dtype, name=name)
        return nn.ConvTranspose(features, (4, 4), strides=(2, 2), dtype=dtype,
                                name=name)

    @nn.compact
    def __call__(self, z: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        h0, w0 = self.img_height // 32, self.img_width // 32
        if h0 * 32 != self.img_height or w0 * 32 != self.img_width:
            raise ValueError("CNNDecoder needs image sides divisible by 32, "
                             f"got {self.img_height}x{self.img_width}")
        x = nn.Dense(h0 * w0 * 64, dtype=self.dtype)(z)
        x = nn.relu(x)
        x = x.reshape((z.shape[0], h0, w0, 64))
        for i, features in enumerate((64, 64, 32, 16)):
            x = self._deconv(i, features, self.dtype)(x)
            x = BatchNorm(use_running_average=not train,
                             momentum=self.bn_momentum, dtype=self.dtype)(x)
            x = nn.relu(x)
        x = self._deconv(4, self.out_channels, jnp.float32)(x)
        # tanh keeps reconstructions in the "tf" normalization range [-1, 1]
        return nn.tanh(x)


class DenseDecoder(nn.Module):
    """MLP decoder for mlp/linear model types (reference: DenseAutoEncoder)."""

    img_height: int
    img_width: int
    out_channels: int = 3
    hidden: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype)(z))
        x = nn.Dense(self.img_height * self.img_width * self.out_channels,
                     dtype=jnp.float32)(x)
        x = x.reshape((z.shape[0], self.img_height, self.img_width,
                       self.out_channels))
        return nn.tanh(x)
