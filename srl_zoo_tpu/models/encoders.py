"""Image encoders mapping NHWC frames to a state vector.

Reference: models/models.py — ``CustomCNN`` (conv+BN+ReLU+maxpool stack, FC to
state_dim), ``DenseNetwork`` (MLP on flattened pixels), ``LinearNetwork``
(single linear layer), plus the torchvision ResNet-18 encoder (see resnet.py).
Rebuilt NHWC/Flax-native, 'SAME' padding (XLA-friendly), not a layer-for-layer
port.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from srl_zoo_tpu.models.batchnorm import BatchNorm


class CustomCNN(nn.Module):
    """Three conv+BN+ReLU+maxpool blocks, flatten, dense to ``state_dim``.

    Spatial reduction is 2x per conv and 2x per pool => /64 overall: a 224x224
    input reaches the dense layer at 4x4x64 (a 64x64 input at 1x1x64).
    Reference: models/models.py CustomCNN.
    """

    state_dim: int
    dtype: Any = jnp.float32
    # flax convention ra = m*ra + (1-m)*batch; 0.9 == torch BatchNorm2d's
    # default semantics (design decision #23, torch-validated r5)
    bn_momentum: float = 0.9

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        kernel_sizes = (7, 3, 3)
        for k in kernel_sizes:
            x = nn.Conv(64, (k, k), strides=(2, 2), use_bias=False,
                        dtype=self.dtype)(x)
            x = BatchNorm(use_running_average=not train,
                             momentum=self.bn_momentum,
                             dtype=self.dtype)(x)
            x = nn.relu(x)
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        x = x.reshape((x.shape[0], -1))
        return nn.Dense(self.state_dim, dtype=jnp.float32)(x)


class DenseEncoder(nn.Module):
    """MLP on flattened pixels (reference: models/models.py DenseNetwork)."""

    state_dim: int
    hidden: Sequence[int] = (64, 64)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = x.reshape((x.shape[0], -1))
        for h in self.hidden:
            x = nn.relu(nn.Dense(h, dtype=self.dtype)(x))
        return nn.Dense(self.state_dim, dtype=jnp.float32)(x)


class LinearEncoder(nn.Module):
    """Single linear map on flattened pixels (reference: LinearNetwork)."""

    state_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = x.reshape((x.shape[0], -1))
        return nn.Dense(self.state_dim, dtype=jnp.float32)(x)


def make_encoder(model_type: str, state_dim: int, dtype=jnp.float32,
                 bn_momentum: float = 0.9) -> nn.Module:
    """Encoder factory keyed by the ``--model-type`` flag
    (reference: train.py / models/modules.py model selection)."""
    if model_type == "custom_cnn":
        return CustomCNN(state_dim=state_dim, dtype=dtype,
                         bn_momentum=bn_momentum)
    if model_type == "resnet":
        from srl_zoo_tpu.models.resnet import ResNet18
        # s2d stem: identical convolution, regrouped for the MXU — wins
        # every interleaved A/B rep on the chip (+1.3% mean, docs/PERF.md
        # attempt 7); param tree is mode-agnostic so checkpoints/ports
        # load either way.
        return ResNet18(state_dim=state_dim, dtype=dtype, stem="s2d",
                        bn_momentum=bn_momentum)
    if model_type == "mlp":
        return DenseEncoder(state_dim=state_dim, dtype=dtype)
    if model_type == "linear":
        return LinearEncoder(state_dim=state_dim, dtype=dtype)
    raise ValueError(f"Unknown model type: {model_type}")
