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
