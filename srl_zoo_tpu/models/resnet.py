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
from jax import lax

from srl_zoo_tpu.models.batchnorm import BatchNorm


class StemConv(nn.Module):
    """The 7x7 stride-2 stem conv, optionally executed space-to-depth.

    A 3-input-channel conv wastes the MXU's 128-lane contraction axis
    (profiled: the stem's fwd+wgrad fusions are the slowest per-FLOP convs
    in the ResNet step — docs/PERF.md round 3). ``mode="s2d"`` runs the
    ALGEBRAICALLY IDENTICAL convolution on a 2x2 space-to-depth input:

      x[B,H,W,C] -> cells x[B,H/2,W/2,4C]   (channel order (ph, pw, c))
      w[7,7,C,F] -> pad front to 8x8 -> [4,4,4C,F]

    because out[i] = sum_u w[u] x[2i+u-3] regroups, with j'=u+1, into a
    kernel-4 stride-1 conv over cells (k=j'//2) and parities (p=j'%2) with
    asymmetric cell padding (2,1); j'=0 is the zero-pad row (pixel -4,
    never read). Exact — not an approximation; equivalence tested in
    tests/test_models.py. The param is the canonical [7,7,C,F] kernel under
    the same ``Conv_0/kernel`` path either way, so checkpoints and the
    torchvision port (models/torch_port.py) are mode-agnostic; the
    rearrangement is traced per step (9.4k elements — free) and gradients
    flow through it.
    """

    features: int = 64
    mode: str = "direct"  # "direct" | "s2d"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c_in = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (7, 7, c_in, self.features))
        x = x.astype(self.dtype)
        w = kernel.astype(self.dtype)
        even = x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
        if self.mode == "s2d" and even:
            b, h, wd, c = x.shape
            cells = x.reshape(b, h // 2, 2, wd // 2, 2, c)
            cells = cells.transpose(0, 1, 3, 2, 4, 5)
            cells = cells.reshape(b, h // 2, wd // 2, 4 * c)
            w4 = jnp.pad(w, ((1, 0), (1, 0), (0, 0), (0, 0)))
            w4 = w4.reshape(4, 2, 4, 2, c, self.features)
            w4 = w4.transpose(0, 2, 1, 3, 4, 5)
            w4 = w4.reshape(4, 4, 4 * c, self.features)
            return lax.conv_general_dilated(
                cells, w4, window_strides=(1, 1),
                padding=((2, 1), (2, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return lax.conv_general_dilated(
            x, w, window_strides=(2, 2), padding=((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    dtype: Any = jnp.float32
    # flax convention; 0.9 == torch BatchNorm2d default (decision #23)
    bn_momentum: float = 0.9

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        residual = x
        y = nn.Conv(self.features, (3, 3), strides=(self.strides, self.strides),
                    padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype)(x)
        y = BatchNorm(use_running_average=not train,
                         momentum=self.bn_momentum, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype)(y)
        y = BatchNorm(use_running_average=not train,
                         momentum=self.bn_momentum, dtype=self.dtype)(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.features, (1, 1),
                               strides=(self.strides, self.strides),
                               use_bias=False, dtype=self.dtype)(residual)
            residual = BatchNorm(use_running_average=not train,
                                    momentum=self.bn_momentum,
                                    dtype=self.dtype)(residual)
        return nn.relu(y + residual)


class ResNet18(nn.Module):
    state_dim: int
    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    dtype: Any = jnp.float32
    stem: str = "direct"  # "direct" | "s2d" (see StemConv)
    bn_momentum: float = 0.9

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = StemConv(features=64, mode=self.stem, dtype=self.dtype,
                     name="Conv_0")(x)
        x = BatchNorm(use_running_average=not train,
                         momentum=self.bn_momentum, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        features = 64
        for stage, n_blocks in enumerate(self.stage_sizes):
            for block in range(n_blocks):
                strides = 2 if stage > 0 and block == 0 else 1
                x = BasicBlock(features=features, strides=strides,
                               dtype=self.dtype,
                               bn_momentum=self.bn_momentum)(x, train=train)
            features *= 2
        x = jnp.mean(x, axis=(1, 2))  # global average pool
        return nn.Dense(self.state_dim, dtype=jnp.float32)(x)
