"""Sub-pixel (depth-to-space) reformulation of the decoder's ConvTranspose.

Motivation (docs/PERF.md "HLO op accounting"): the backward of
``lax.conv_transpose`` materializes spatial ``reverse`` ops over full-size
decoder activations (1.6 ms/step at the bench geometry) and runs its input
gradient as an lhs-dilated conv. A stride-2, kernel-4, SAME transposed conv
is *exactly* equal to a stride-1 kernel-3 regular convolution producing the
four output parities as channels, followed by depth-to-space:

  1-D derivation (k=4, s=2, SAME => pad_before = pad_after = 2,
  transpose_kernel=False, i.e. correlation with W as stored):
      y[2m]   = W[0]·x[m-1] + W[2]·x[m]
      y[2m+1] = W[1]·x[m]   + W[3]·x[m+1]
  Both parities are 2-tap correlations over x; embedding them in one k=3
  kernel (pad 1 each side) gives
      K_even = [W0, W2, 0],   K_odd = [0, W1, W3]
  and in 2-D the four (pi, pj) parities use the outer product of those tap
  maps — a (3, 3, C_in, 4·C_out) kernel. The module below builds that
  kernel on the fly from a parameter stored in the *ConvTranspose layout*
  ((4, 4, C_in, C_out), same names), so checkpoints are interchangeable
  with ``nn.ConvTranspose(features, (4, 4), strides=(2, 2))``.

Reference: models/autoencoders.py decoder halves use exactly this
(k=4, s=2) deconv stack; see srl_zoo_tpu/models/decoders.py.

Measured status (real chip, full CNNDecoder at bs 512 / 224x224 / bf16,
benchmarks/subpixel_bench.py, 2026-08-16): **loses to lax.conv_transpose**
— fwd 8.72 ms vs 4.90, fwd+bwd 16.39 ms vs 9.93. The depth-to-space
relayout adds a full pass over every stage output in both directions and
the 3x3 parity embedding does 9/4 the MACs; together they cost more than
the `reverse` ops they remove. Kept as a measured reference
(``CNNDecoder(deconv="subpixel")``); the default stays "conv_transpose".
See docs/PERF.md "Attempt 6".
"""

from __future__ import annotations

from typing import Any, Sequence, Union

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

# Tap map: _TAPS[parity][a] indexes the padded kernel; index 4 is the
# all-zero pad row/col (the "no tap" slot).
_TAPS = ((0, 2, 4), (4, 1, 3))


def subpixel_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """(4,4,Cin,Cout) ConvTranspose kernel -> (3,3,Cin,4*Cout) conv kernel.

    Output channel layout is (pi, pj, cout) — row parity major — matching
    the depth-to-space reassembly in :class:`SubpixelConvTranspose`.
    """
    if w.shape[:2] != (4, 4):
        raise ValueError(f"subpixel_kernel expects a 4x4 kernel, got {w.shape}")
    w_ext = jnp.pad(w, ((0, 1), (0, 1), (0, 0), (0, 0)))
    ia = jnp.asarray(_TAPS)  # [parity, tap] -> source index (4 == zero)
    # k[pi, a, pj, b, cin, cout] = w_ext[ia[pi, a], ia[pj, b]]
    k = w_ext[ia[:, :, None, None], ia[None, None, :, :]]
    cin, cout = w.shape[2], w.shape[3]
    # -> (a, b, cin, pi, pj, cout) -> (3, 3, cin, 4*cout)
    return k.transpose(1, 3, 4, 0, 2, 5).reshape(3, 3, cin, 4 * cout)


class SubpixelConvTranspose(nn.Module):
    """Drop-in for ``nn.ConvTranspose(features, (4, 4), strides=(2, 2))``.

    Same parameter names/shapes/initializers as flax's ConvTranspose, so a
    model can switch implementation without a checkpoint migration. Only the
    (4, 4)/(2, 2)/SAME geometry the decoders use is supported.
    """

    features: int
    kernel_size: Sequence[int] = (4, 4)
    strides: Sequence[int] = (2, 2)
    use_bias: bool = True
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    kernel_init: Any = nn.initializers.lecun_normal()
    bias_init: Any = nn.initializers.zeros_init()

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if tuple(self.kernel_size) != (4, 4) or tuple(self.strides) != (2, 2):
            raise NotImplementedError(
                "SubpixelConvTranspose supports the decoder geometry "
                "(kernel 4x4, stride 2) only")
        cin = x.shape[-1]
        w = self.param("kernel", self.kernel_init,
                       (4, 4, cin, self.features), self.param_dtype)
        k = subpixel_kernel(w).astype(self.dtype)
        z = lax.conv_general_dilated(
            x.astype(self.dtype), k, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        b, h, wd = z.shape[0], z.shape[1], z.shape[2]
        z = z.reshape(b, h, wd, 2, 2, self.features)
        z = z.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * wd,
                                                  self.features)
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,),
                              self.param_dtype)
            z = z + bias.astype(self.dtype)
        return z
