"""SubpixelConvTranspose must be numerically interchangeable with flax's
ConvTranspose at the decoder geometry (same params, same function).

Reference: models/autoencoders.py decoder stack (k=4, s=2 deconvs);
rebuild derivation in srl_zoo_tpu/ops/subpixel.py.
"""

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

from srl_zoo_tpu.ops.subpixel import SubpixelConvTranspose


def _pair(features, dtype=jnp.float32):
    ref = nn.ConvTranspose(features, (4, 4), strides=(2, 2), dtype=dtype)
    sub = SubpixelConvTranspose(features, dtype=dtype)
    return ref, sub


def test_forward_matches_conv_transpose():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 7, 3))
    ref, sub = _pair(6)
    params = ref.init(jax.random.PRNGKey(1), x)
    y_ref = ref.apply(params, x)
    y_sub = sub.apply(params, x)
    assert y_ref.shape == y_sub.shape == (2, 10, 14, 6)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_sub),
                               atol=1e-5, rtol=1e-5)


def test_params_interchangeable_both_directions():
    # Params initialized by the subpixel module load into ConvTranspose too
    # (same names, same shapes) — the checkpoint-compatibility contract.
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 4, 5))
    ref, sub = _pair(4)
    params = sub.init(jax.random.PRNGKey(3), x)
    kernel = params["params"]["kernel"]
    assert kernel.shape == (4, 4, 5, 4)
    np.testing.assert_allclose(np.asarray(ref.apply(params, x)),
                               np.asarray(sub.apply(params, x)),
                               atol=1e-5, rtol=1e-5)


def test_gradients_match():
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 6, 6, 3))
    ref, sub = _pair(5)
    params = ref.init(jax.random.PRNGKey(5), x)

    def loss(mod, p, xx):
        return jnp.sum(jnp.sin(mod.apply(p, xx)))

    g_ref = jax.grad(lambda p: loss(ref, p, x))(params)
    g_sub = jax.grad(lambda p: loss(sub, p, x))(params)
    flat_ref = jax.tree_util.tree_leaves(g_ref)
    flat_sub = jax.tree_util.tree_leaves(g_sub)
    for a, b in zip(flat_ref, flat_sub):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_bf16_path_runs():
    x = jax.random.normal(jax.random.PRNGKey(6), (2, 4, 4, 3))
    _, sub = _pair(4, dtype=jnp.bfloat16)
    params = sub.init(jax.random.PRNGKey(7), x)
    y = sub.apply(params, x)
    assert y.dtype == jnp.bfloat16
    assert y.shape == (2, 8, 8, 4)
