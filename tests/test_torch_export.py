"""Torch export: the flax->torch encoder bridge is numerically exact.

Closes the hand-off loop whose other direction tests/test_torch_port.py
already verifies (torchvision weights -> flax). The reference's consumers
embed SRL encoders in torch RL policies (robotics-rl-srl reloads
srl_model.pth), so the exported module must reproduce SRLModules.encode —
including the in-module normalization — to float tolerance."""

import jax
import numpy as np
import pytest

from srl_zoo_tpu.config import SRLConfig
from srl_zoo_tpu.export import build_torch_encoder
from srl_zoo_tpu.models.srl_modules import SRLModules
from srl_zoo_tpu.ops.preproc import normalize_images

pytest.importorskip("torch")


def _random_variables(cfg, seed=0):
    """Init + randomize: non-trivial BN running stats so the export's BN
    wiring is actually exercised (init stats are identity)."""
    model = SRLModules(cfg)
    obs = np.zeros((2, cfg.img_height, cfg.img_width, cfg.n_channels),
                   np.float32)
    actions = np.zeros((2,), np.int32) if cfg.use_forward else None
    variables = model.init({"params": jax.random.PRNGKey(seed),
                            "sampling": jax.random.PRNGKey(seed + 1)},
                           obs, obs, actions, train=False)
    rng = np.random.RandomState(seed)
    variables = jax.tree_util.tree_map(
        lambda x: np.asarray(rng.randn(*x.shape) * 0.1, x.dtype), variables)
    if "batch_stats" in variables:
        variables["batch_stats"] = jax.tree_util.tree_map(
            lambda x: np.abs(x) + 0.5, variables["batch_stats"])
    return model, variables


def _flax_states(model, variables, obs_u8, cfg):
    obs = normalize_images(obs_u8, cfg.normalize_mode)
    return np.asarray(model.apply(variables, obs, train=False,
                                  method=SRLModules.encode))


def _torch_states(cfg, variables, obs_u8):
    import torch
    module = build_torch_encoder(cfg, variables)
    with torch.no_grad():
        out = module(torch.from_numpy(obs_u8.astype(np.float32)))
    return out.numpy()


@pytest.mark.parametrize("model_type", ["custom_cnn", "resnet", "mlp",
                                        "linear"])
def test_torch_export_parity(model_type):
    cfg = SRLConfig(state_dim=6, img_height=32, img_width=32,
                    model_type=model_type)
    model, variables = _random_variables(cfg)
    obs = np.random.RandomState(1).randint(
        0, 256, (3, 32, 32, 3), dtype=np.uint8)
    want = _flax_states(model, variables, obs, cfg)
    got = _torch_states(cfg, variables, obs)
    assert got.shape == (3, 6)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_torch_export_parity_nonsquare_same_padding():
    """Asymmetric XLA-SAME pads differ per dim on non-square, non-power-of-2
    geometry — the hard case for the custom_cnn pad precomputation."""
    cfg = SRLConfig(state_dim=4, img_height=36, img_width=60,
                    model_type="custom_cnn", losses=(("inverse", 1.0),),
                    split_dims=(("inverse", -1),), n_actions=3)
    model, variables = _random_variables(cfg, seed=3)
    obs = np.random.RandomState(2).randint(
        0, 256, (2, 36, 60, 3), dtype=np.uint8)
    np.testing.assert_allclose(_torch_states(cfg, variables, obs),
                               _flax_states(model, variables, obs, cfg),
                               rtol=1e-4, atol=1e-4)


def test_torch_export_vae_returns_mu():
    cfg = SRLConfig(state_dim=4, img_height=32, img_width=32,
                    losses=(("vae", 1.0),), split_dims=(("vae", -1),))
    model, variables = _random_variables(cfg, seed=5)
    obs = np.random.RandomState(3).randint(
        0, 256, (2, 32, 32, 3), dtype=np.uint8)
    got = _torch_states(cfg, variables, obs)
    assert got.shape == (2, 4)  # mu half only
    np.testing.assert_allclose(got, _flax_states(model, variables, obs, cfg),
                               rtol=1e-4, atol=1e-4)


def test_torch_export_imagenet_normalization():
    cfg = SRLConfig(state_dim=4, img_height=32, img_width=32,
                    model_type="mlp", normalize_mode="image_net",
                    losses=(("inverse", 1.0),), split_dims=(("inverse", -1),),
                    n_actions=3)
    model, variables = _random_variables(cfg, seed=7)
    obs = np.random.RandomState(4).randint(
        0, 256, (2, 32, 32, 3), dtype=np.uint8)
    np.testing.assert_allclose(_torch_states(cfg, variables, obs),
                               _flax_states(model, variables, obs, cfg),
                               rtol=1e-4, atol=1e-4)


def test_torch_export_cli_end_to_end(synthetic_dataset, tmp_path):
    """Train a tiny run, export TorchScript via the CLI, reload with torch
    alone, and match the run's own states_rewards.npz export."""
    import torch

    from srl_zoo_tpu.export.torch_export import main as export_main
    from srl_zoo_tpu.training.learner import SRL4robotics

    log = str(tmp_path / "run")
    cfg = SRLConfig(state_dim=4, img_height=32, img_width=32, batch_size=16,
                    epochs=1, log_folder=log,
                    losses=(("autoencoder", 1.0),),
                    split_dims=(("autoencoder", -1),))
    SRL4robotics(cfg, log_folder=log).learn(synthetic_dataset)
    cfg.save(log)

    path = export_main(["--log-folder", log])
    enc = torch.jit.load(path).eval()

    from srl_zoo_tpu.inference import StateEncoder
    jenc = StateEncoder.load(log)
    obs = np.random.RandomState(5).randint(
        0, 256, (2, 32, 32, 3), dtype=np.uint8)
    with torch.no_grad():
        got = enc(torch.from_numpy(obs.astype(np.float32))).numpy()
    np.testing.assert_allclose(got, jenc.encode(obs), rtol=1e-4, atol=1e-4)


def test_torch_export_state_dict_strips_normalizer(tmp_path):
    """--state-dict artifacts must stay torchvision-strict-loadable: no
    shift/scale normalizer buffers in the keys (round-3 review)."""
    import torch

    from srl_zoo_tpu.export.torch_export import export_torch_encoder

    cfg = SRLConfig(state_dim=6, img_height=32, img_width=32,
                    model_type="resnet")
    model, variables = _random_variables(cfg, seed=11)

    # fake a run folder: save cfg + model the way the learner does
    from srl_zoo_tpu.training import checkpoint as ckpt
    log = str(tmp_path / "run")
    cfg2 = cfg.replace(log_folder=log)
    ckpt.save_srl_model(log, variables["params"],
                        variables.get("batch_stats", {}))
    cfg2.save(log)

    path = export_torch_encoder(log, torchscript=False)
    sd = torch.load(path, weights_only=True)
    assert "shift" not in sd and "scale" not in sd
    assert "conv1.weight" in sd and "fc.weight" in sd  # torchvision names
    assert "layer1.0.conv1.weight" in sd
