"""On-device image preprocessing, fused into the jitted train step.

Reference behavior: preprocessing/preprocess.py ``preprocessInput`` supports
two normalization modes — "tf" (x/255 -> [-1, 1]) and "image_net"
(per-channel mean/std) — applied on the host per image, and ``deNormalize``
for plotting reconstructions. data_loader.py applies random occlusion noise
for the denoising autoencoder on the host.

TPU-first rework: batches arrive as uint8 NHWC; the cast + normalize (and DAE
occlusion, using an explicit jax.random key) run on device where they fuse
with the first conv via XLA — host->HBM traffic drops 4x and the single host
core does no float math.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# ImageNet statistics (RGB), as in torchvision / reference "image_net" mode.
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def normalize_images(obs: jnp.ndarray, mode: str = "tf",
                     dtype=jnp.float32) -> jnp.ndarray:
    """uint8 NHWC (3 or 6 channels) -> normalized float NHWC."""
    x = obs.astype(dtype)
    if mode == "tf":
        return x * (2.0 / 255.0) - 1.0
    if mode == "image_net":
        c = obs.shape[-1]
        reps = c // 3
        mean = jnp.asarray(IMAGENET_MEAN * reps, dtype) * 255.0
        std = jnp.asarray(IMAGENET_STD * reps, dtype) * 255.0
        return (x - mean) / std
    raise ValueError(f"Unknown normalize mode: {mode}")


def denormalize_images(x: jnp.ndarray, mode: str = "tf") -> jnp.ndarray:
    """Inverse of normalize_images, returning float in [0, 1] (reference:
    preprocessing/utils.py deNormalize — used to plot reconstructions)."""
    if mode == "tf":
        return jnp.clip((x + 1.0) * 0.5, 0.0, 1.0)
    if mode == "image_net":
        c = x.shape[-1]
        reps = c // 3
        mean = jnp.asarray(IMAGENET_MEAN * reps, x.dtype)
        std = jnp.asarray(IMAGENET_STD * reps, x.dtype)
        return jnp.clip(x * std + mean, 0.0, 1.0)
    raise ValueError(f"Unknown normalize mode: {mode}")


def occlude(key: jax.Array, obs: jnp.ndarray,
            occlusion_percentage: float) -> jnp.ndarray:
    """Zero a random square patch covering ~``occlusion_percentage`` of the
    image area, per batch element (denoising-AE corruption; reference:
    data_loader's occlusion augmentation, moved on-device).

    Works on normalized float images; the occluded value is the mode's black
    level approximated by 0 (mid-gray in "tf" mode, matching a zeroed tensor
    after normalization in the reference).
    """
    b, h, w = obs.shape[0], obs.shape[1], obs.shape[2]
    side_h = jnp.asarray(h * jnp.sqrt(occlusion_percentage), jnp.int32)
    side_w = jnp.asarray(w * jnp.sqrt(occlusion_percentage), jnp.int32)
    ky, kx = jax.random.split(key)
    # maxval is EXCLUSIVE: h - side_h + 1 lets the patch reach the bottom/
    # right edge, otherwise border pixels are systematically never occluded
    # (a positional shortcut the denoiser could exploit)
    y0 = jax.random.randint(ky, (b, 1, 1), 0, jnp.maximum(h - side_h + 1, 1))
    x0 = jax.random.randint(kx, (b, 1, 1), 0, jnp.maximum(w - side_w + 1, 1))
    rows = jax.lax.broadcasted_iota(jnp.int32, (b, h, w), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (b, h, w), 2)
    inside = ((rows >= y0) & (rows < y0 + side_h)
              & (cols >= x0) & (cols < x0 + side_w))
    return jnp.where(inside[..., None], jnp.zeros_like(obs), obs)


def gaussian_noise(key: jax.Array, x: jnp.ndarray, stddev: float) -> jnp.ndarray:
    """Additive Gaussian noise (reference: models/custom_layers.py
    GaussianNoise layer, used by the DAE variants)."""
    return x + stddev * jax.random.normal(key, x.shape, x.dtype)
