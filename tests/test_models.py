"""Model zoo: output shapes, split routing, VAE reparameterization."""

import jax
import jax.numpy as jnp
import numpy as np

from srl_zoo_tpu.config import SRLConfig
from srl_zoo_tpu.models.decoders import CNNDecoder, DenseDecoder
from srl_zoo_tpu.models.encoders import make_encoder
from srl_zoo_tpu.models.heads import (Discriminator, ForwardModel,
                                      InverseModel, RewardModel)
from srl_zoo_tpu.models.srl_modules import SRLModules


def test_encoder_shapes():
    for mt in ("custom_cnn", "resnet", "mlp", "linear"):
        enc = make_encoder(mt, state_dim=5)
        x = jnp.zeros((2, 32, 32, 3))
        variables = enc.init(jax.random.PRNGKey(0), x, train=False)
        out = enc.apply(variables, x, train=False)
        assert out.shape == (2, 5), mt


def test_cnn_decoder_shape():
    dec = CNNDecoder(img_height=32, img_width=32, out_channels=3)
    z = jnp.zeros((2, 5))
    variables = dec.init(jax.random.PRNGKey(0), z, train=False)
    out = dec.apply(variables, z, train=False)
    assert out.shape == (2, 32, 32, 3)
    assert float(jnp.max(jnp.abs(out))) <= 1.0  # tanh range


def test_dense_decoder_shape():
    dec = DenseDecoder(img_height=32, img_width=32, out_channels=3)
    z = jnp.zeros((2, 5))
    variables = dec.init(jax.random.PRNGKey(0), z, train=False)
    assert dec.apply(variables, z, train=False).shape == (2, 32, 32, 3)


def test_heads_shapes():
    s = jnp.zeros((4, 6))
    fm = ForwardModel(state_dim=6, n_actions=3)
    v = fm.init(jax.random.PRNGKey(0), s, jnp.zeros(4, jnp.int32))
    assert fm.apply(v, s, jnp.zeros(4, jnp.int32)).shape == (4, 6)
    im = InverseModel(n_actions=3)
    v = im.init(jax.random.PRNGKey(0), s, s)
    assert im.apply(v, s, s).shape == (4, 3)
    rm = RewardModel(n_reward_classes=2)
    v = rm.init(jax.random.PRNGKey(0), s, s)
    assert rm.apply(v, s, s).shape == (4, 2)
    d = Discriminator()
    v = d.init(jax.random.PRNGKey(0), s, s)
    assert d.apply(v, s, s).shape == (4,)


def _init_modules(cfg, batch=2):
    from srl_zoo_tpu.training.state import _dummy_batch_args
    model = SRLModules(cfg)
    args = _dummy_batch_args(cfg, batch)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "sampling": jax.random.PRNGKey(1)},
                           *args, train=True)
    return model, variables, args


def test_srl_modules_combined_outputs():
    cfg = SRLConfig(state_dim=8, img_height=32, img_width=32,
                    losses=(("autoencoder", 1.0), ("forward", 1.0),
                            ("inverse", 1.0), ("reward", 1.0)),
                    split_dims=(("autoencoder", 4), ("forward", 2),
                                ("inverse", -1), ("reward", 2)),
                    n_actions=4, n_reward_classes=3)
    model, variables, args = _init_modules(cfg)
    out, _ = model.apply(variables, *args, train=True,
                         mutable=["batch_stats"])
    assert out["state"].shape == (2, 8)
    assert out["recon"].shape == (2, 32, 32, 3)
    assert out["forward_pred"].shape == (2, 2)   # forward slice size 2
    assert out["inverse_logits"].shape == (2, 4)
    assert out["reward_logits"].shape == (2, 3)


def test_vae_sampling_only_on_vae_slice():
    cfg = SRLConfig(state_dim=8, img_height=32, img_width=32,
                    losses=(("vae", 1.0), ("inverse", 1.0)),
                    split_dims=(("vae", 4), ("inverse", 4)),
                    n_actions=4)
    model, variables, _ = _init_modules(cfg)
    obs = jnp.asarray(np.random.RandomState(0)
                      .randn(2, 32, 32, 3).astype(np.float32))
    out1, _ = model.apply(variables, obs, obs, train=True,
                          rngs={"sampling": jax.random.PRNGKey(1)},
                          mutable=["batch_stats"])
    out2, _ = model.apply(variables, obs, obs, train=True,
                          rngs={"sampling": jax.random.PRNGKey(2)},
                          mutable=["batch_stats"])
    s1, s2 = np.asarray(out1["state"]), np.asarray(out2["state"])
    # vae slice (dims 0:4) is stochastic, inverse slice (4:8) deterministic
    assert not np.allclose(s1[:, :4], s2[:, :4])
    assert np.allclose(s1[:, 4:], s2[:, 4:])
    # eval path is deterministic everywhere
    e1 = model.apply(variables, obs, obs, train=False)
    e2 = model.apply(variables, obs, obs, train=False)
    assert np.allclose(np.asarray(e1["state"]), np.asarray(e2["state"]))


def test_encode_returns_mu():
    cfg = SRLConfig(state_dim=4, img_height=32, img_width=32,
                    losses=(("vae", 1.0),), split_dims=(("vae", -1),))
    model, variables, _ = _init_modules(cfg)
    obs = jnp.ones((2, 32, 32, 3))
    mu = model.apply(variables, obs, train=False, method=SRLModules.encode)
    assert mu.shape == (2, 4)


def test_resnet_s2d_stem_equivalence():
    """The space-to-depth stem is the SAME convolution, regrouped (see
    StemConv docstring): identical params, forward/weight-grad/input-grad
    all match the direct 7x7/2 conv to float tolerance; odd spatial sizes
    fall back to the direct path bit-exactly."""
    from srl_zoo_tpu.models.resnet import StemConv

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 64, 64, 3))
    direct, s2d = StemConv(mode="direct"), StemConv(mode="s2d")
    variables = direct.init(rng, x)

    out_d = direct.apply(variables, x)
    out_s = s2d.apply(variables, x)
    assert out_d.shape == out_s.shape == (2, 32, 32, 64)
    np.testing.assert_allclose(out_s, out_d, rtol=1e-5, atol=1e-5)

    def loss(mod, v, x):
        return (mod.apply(v, x) ** 2).sum()

    g_d = jax.grad(lambda v: loss(direct, v, x))(variables)
    g_s = jax.grad(lambda v: loss(s2d, v, x))(variables)
    np.testing.assert_allclose(g_s["params"]["kernel"],
                               g_d["params"]["kernel"], rtol=1e-4, atol=1e-2)
    gx_d = jax.grad(lambda x: loss(direct, variables, x))(x)
    gx_s = jax.grad(lambda x: loss(s2d, variables, x))(x)
    np.testing.assert_allclose(gx_s, gx_d, rtol=1e-4, atol=1e-3)

    x_odd = jax.random.normal(rng, (2, 33, 33, 3))
    v_odd = direct.init(rng, x_odd)
    assert jnp.array_equal(direct.apply(v_odd, x_odd),
                           s2d.apply(v_odd, x_odd))


def test_resnet_stem_param_tree_mode_agnostic():
    """Both stem modes own the canonical Conv_0/kernel [7,7,3,64] param, so
    checkpoints and the torchvision port load into either."""
    from srl_zoo_tpu.models.resnet import ResNet18

    x = jnp.zeros((1, 32, 32, 3))
    v_d = ResNet18(state_dim=4, stem="direct").init(
        jax.random.PRNGKey(0), x, train=False)
    v_s = ResNet18(state_dim=4, stem="s2d").init(
        jax.random.PRNGKey(0), x, train=False)
    assert v_d["params"]["Conv_0"]["kernel"].shape == (7, 7, 3, 64)
    assert jax.tree_util.tree_structure(v_d) == \
        jax.tree_util.tree_structure(v_s)


def test_bn_momentum_update_rule_and_default():
    """Decision #23: BatchNorm running averages follow ra = m*ra + (1-m)*
    batch_stat with the UNBIASED batch variance (ddof=1 — torch
    BatchNorm2d's running update; train-mode normalization stays biased),
    the default momentum is 0.9 (torch's semantics — flax's own default is
    0.99), and the --bn-momentum knob reaches every BN layer. Verified
    exactly in numpy from one train-mode apply (initial ra: mean 0, var 1)."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 16, 16, 3).astype(np.float32))

    for momentum in (0.9, 0.99):
        enc = make_encoder("custom_cnn", state_dim=3, bn_momentum=momentum)
        variables = enc.init(jax.random.PRNGKey(0), x, train=False)
        _, mutated = enc.apply(variables, x, train=True,
                               mutable=["batch_stats"])
        st = mutated["batch_stats"]["BatchNorm_0"]

        # reproduce the first conv's output in numpy via lax (same op the
        # layer uses), then apply the documented update rule by hand
        k = variables["params"]["Conv_0"]["kernel"]
        y = jax.lax.conv_general_dilated(
            x, k, window_strides=(2, 2), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = np.asarray(y, np.float64)
        b_mean = y.mean(axis=(0, 1, 2))
        b_var = y.var(axis=(0, 1, 2), ddof=1)  # UNBIASED, like torch's
        # running update (srl_zoo_tpu/models/batchnorm.py); train-mode
        # normalization uses the biased ddof=0 variance on both sides
        np.testing.assert_allclose(np.asarray(st["mean"]),
                                   (1.0 - momentum) * b_mean, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(st["var"]),
                                   momentum * 1.0 + (1.0 - momentum) * b_var,
                                   rtol=1e-5)

    # the config default is the torch-equivalent 0.9 and the knob validates
    assert SRLConfig().bn_momentum == 0.9
    import pytest
    with pytest.raises(ValueError, match="bn_momentum"):
        SRLConfig(bn_momentum=1.0)


def test_torch_batchnorm_forward_bit_identical():
    """srl_zoo_tpu/models/batchnorm.BatchNorm changes ONLY the running-var
    fold (unbiased, torch semantics). Everything else — param/stat tree,
    train- and eval-mode forwards, the running-MEAN update — must be
    BIT-identical to flax nn.BatchNorm, so checkpoints, the torchvision
    porter, and the TorchScript exporter are unaffected."""
    import flax.linen as nn

    from srl_zoo_tpu.models.batchnorm import BatchNorm

    x = jnp.asarray(np.random.RandomState(3).randn(8, 6, 6, 4)
                    .astype(np.float32))
    ref = nn.BatchNorm(use_running_average=False, momentum=0.9)
    ours = BatchNorm(use_running_average=False, momentum=0.9)
    v_ref = ref.init(jax.random.PRNGKey(0), x)
    v_ours = ours.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(v_ref) ==
            jax.tree_util.tree_structure(v_ours))

    y_ref, m_ref = ref.apply(v_ref, x, mutable=["batch_stats"])
    y_ours, m_ours = ours.apply(v_ours, x, mutable=["batch_stats"])
    assert bool(jnp.all(y_ref == y_ours)), "train-mode forward diverged"
    assert bool(jnp.all(m_ref["batch_stats"]["mean"] ==
                        m_ours["batch_stats"]["mean"]))

    # running var: ours folds the unbiased batch variance (ddof=1)
    n = 8 * 6 * 6
    xv = np.asarray(x, np.float64)
    b_var = xv.var(axis=(0, 1, 2))  # biased
    np.testing.assert_allclose(
        np.asarray(m_ours["batch_stats"]["var"]),
        0.9 * 1.0 + 0.1 * b_var * n / (n - 1), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(m_ref["batch_stats"]["var"]),
        0.9 * 1.0 + 0.1 * b_var, rtol=1e-6)

    # eval-mode forward from identical stats: bit-identical too
    y_ref_e = nn.BatchNorm(use_running_average=True,
                           momentum=0.9).apply(v_ref, x)
    y_ours_e = BatchNorm(use_running_average=True,
                         momentum=0.9).apply(v_ref, x)
    assert bool(jnp.all(y_ref_e == y_ours_e)), "eval-mode forward diverged"
