"""BatchNorm with torch-exact running-variance semantics.

Design decision #23 (docs/DESIGN_DECISIONS.md): the reference's models use
torch ``BatchNorm2d``, whose running-average update folds the UNBIASED batch
variance (divisor n-1) while normalizing the batch itself with the biased
one (divisor n).  Flax's ``nn.BatchNorm`` folds the biased variance — a
~n/(n-1) relative deviation in every running-var update (<=1e-5 at
production geometry, but it was the one documented residual deviation of
the round-5 BN parity work).

This subclass changes ONLY that fold.  The batch statistics, the
normalization arithmetic, the variable collection/names (``batch_stats`` /
``mean``/``var``), the parameter names (``scale``/``bias``) and the flax
momentum convention (ra = m*ra + (1-m)*batch) are all inherited unchanged —
it reuses flax's own ``_compute_stats`` / ``_normalize`` helpers, so the
train-mode forward is bit-identical to ``nn.BatchNorm`` (pinned by
tests/test_models.py::test_torch_batchnorm_forward_bit_identical) and
existing checkpoints / the torchvision porter / the TorchScript exporter
load without change.  The class is named ``BatchNorm`` so flax's automatic
module naming keeps producing ``BatchNorm_<i>`` keys.

Validated against live torch BatchNorm2d running stats in
tests/test_torch_parity.py (step-level agreement under SGD).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax.linen import module as flax_module
from flax.linen import normalization as flax_norm
from flax.linen.module import compact
import flax.linen as nn


class BatchNorm(nn.BatchNorm):
    """``nn.BatchNorm`` with torch's unbiased running-variance fold.

    Restrictions (both unused in this codebase, both checked loudly):
    ``axis_name`` cross-device stat sync and ``mask`` would make the
    element count ``n`` dynamic/global; the unbiased correction here is
    computed from the local static shape only.
    """

    @compact
    def __call__(self, x, use_running_average: bool | None = None, *,
                 mask: jax.Array | None = None):
        if self.axis_name is not None or mask is not None:
            raise NotImplementedError(
                "torch-semantics BatchNorm supports neither axis_name nor "
                "mask (the unbiased-n correction needs a static local "
                "element count); use flax nn.BatchNorm for those.")
        use_running_average = flax_module.merge_param(
            "use_running_average", self.use_running_average,
            use_running_average)
        feature_axes = flax_norm._canonicalize_axes(x.ndim, self.axis)
        reduction_axes = tuple(i for i in range(x.ndim)
                               if i not in feature_axes)
        feature_shape = [x.shape[ax] for ax in feature_axes]

        stats_dtype = (jnp.float32 if self.force_float32_reductions
                       else self.param_dtype)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda s: jnp.zeros(s, stats_dtype),
                                feature_shape)
        ra_var = self.variable("batch_stats", "var",
                               lambda s: jnp.ones(s, stats_dtype),
                               feature_shape)

        if use_running_average:
            mean = (ra_mean.value if self.force_float32_reductions
                    else jnp.asarray(ra_mean.value, self.param_dtype))
            var = (ra_var.value if self.force_float32_reductions
                   else jnp.asarray(ra_var.value, self.param_dtype))
        else:
            mean, var = flax_norm._compute_stats(
                x, reduction_axes, dtype=self.dtype, axis_name=None,
                axis_index_groups=self.axis_index_groups,
                use_fast_variance=self.use_fast_variance, mask=None,
                force_float32_reductions=self.force_float32_reductions)
            if not self.is_initializing():
                # n = elements reduced per feature (N*H*W for NHWC conv
                # activations) — static, so the Bessel factor is a Python
                # float baked into the jitted graph. torch normalizes with
                # the biased variance but tracks the unbiased one
                # (aten/native/Normalization.cpp batch_norm_backward's
                # save_var vs running_var update); n<=1 keeps the biased
                # value (torch errors on that geometry at train time —
                # nothing sensible to track).
                n = 1
                for ax in reduction_axes:
                    n *= x.shape[ax]
                bessel = n / (n - 1) if n > 1 else 1.0
                ra_mean.value = (self.momentum * ra_mean.value +
                                 (1 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value +
                                (1 - self.momentum) * (var * bessel))

        return flax_norm._normalize(
            self, x, mean, var, reduction_axes, feature_axes, self.dtype,
            self.param_dtype, self.epsilon, self.use_bias, self.use_scale,
            self.bias_init, self.scale_init, self.force_float32_reductions)
