"""Numeric parity: torch ResNet-18 -> Flax port produces identical outputs.

Builds a live torch ResNet-18 (the torchvision BasicBlock architecture,
hand-defined here since torchvision isn't installed), ports its randomly
initialized state_dict, and asserts the Flax encoder reproduces the torch
features in eval mode. This is the machinery that makes the reference's
"ImageNet-pretrained ResNet-18" behavior available the moment a weights file
exists (models/torch_port.py docstring)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402


class TorchBasicBlock(tnn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False),
                tnn.BatchNorm2d(cout))

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = torch.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return torch.relu(y + idt)


class TorchResNet18(tnn.Module):
    def __init__(self, num_classes=8):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        layers = []
        cin = 64
        for stage, cout in enumerate([64, 128, 256, 512]):
            for block in range(2):
                stride = 2 if stage > 0 and block == 0 else 1
                layers.append(TorchBasicBlock(cin, cout, stride))
                cin = cout
        # register with torchvision-style names layer{1..4}.{0,1}
        for s in range(4):
            setattr(self, f"layer{s + 1}",
                    tnn.Sequential(layers[2 * s], layers[2 * s + 1]))
        self.fc = tnn.Linear(512, num_classes)

    def forward(self, x):
        x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
        for s in range(4):
            x = getattr(self, f"layer{s + 1}")(x)
        x = x.mean(dim=(2, 3))
        return self.fc(x)


def test_ported_resnet_matches_torch():
    import jax

    from srl_zoo_tpu.models.resnet import ResNet18
    from srl_zoo_tpu.models.torch_port import port_resnet18

    torch.manual_seed(0)
    tm = TorchResNet18(num_classes=8).eval()
    # randomize BN running stats so the test exercises them
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 1.5)

    params, batch_stats = port_resnet18(tm.state_dict(), state_dim=8)

    model = ResNet18(state_dim=8)
    x = np.random.RandomState(0).randn(2, 64, 64, 3).astype(np.float32)
    # skeleton init to get the full tree, then overwrite with ported values
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    assert set(variables["params"]) == set(params)
    out_flax = model.apply({"params": params, "batch_stats": batch_stats},
                           x, train=False)

    with torch.no_grad():
        out_torch = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    np.testing.assert_allclose(np.asarray(out_flax), out_torch,
                               rtol=1e-3, atol=1e-4)


def test_port_npz_round_trip(tmp_path):
    from srl_zoo_tpu.models.torch_port import load_ported_resnet18

    tm = TorchResNet18(num_classes=8)
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    path = tmp_path / "weights.npz"
    np.savez(path, **sd)
    params, stats = load_ported_resnet18(str(path), state_dim=8)
    assert "Conv_0" in params and "BasicBlock_7" in params
    assert params["Dense_0"]["kernel"].shape == (512, 8)
    assert stats["BasicBlock_2"]["BatchNorm_2"]["var"].shape == (128,)

def test_pretrained_weights_cli_flow(synthetic_dataset, tmp_path):
    """--pretrained-weights ports into the learner's encoder and trains."""
    from srl_zoo_tpu.config import SRLConfig
    from srl_zoo_tpu.training.learner import SRL4robotics

    tm = TorchResNet18()
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    wpath = tmp_path / "w.npz"
    np.savez(wpath, **sd)

    ds = synthetic_dataset
    cfg = SRLConfig(state_dim=4, model_type="resnet", img_height=32,
                    img_width=32, batch_size=16, epochs=1,
                    losses=(("inverse", 1.0),),
                    split_dims=(("inverse", -1),),
                    n_actions=ds.n_actions,
                    pretrained_weights=str(wpath),
                    log_folder=str(tmp_path / "pre"))
    learner = SRL4robotics(cfg, log_folder=cfg.log_folder)
    import jax
    ported = np.asarray(
        jax.device_get(learner.state.params["encoder"]["Conv_0"]["kernel"]))
    expected = sd["conv1.weight"].transpose(2, 3, 1, 0)
    np.testing.assert_allclose(ported, expected, rtol=1e-6)
    # the ported weights drive a working forward path (predict_states);
    # TRAINING with pretrained resnet weights is covered end to end by
    # test_pretrained_weights_through_train_cli below — repeating the
    # resnet backward compile here cost ~35 s of fast-lane time for no
    # added coverage
    states = learner.predict_states(ds, indices=np.arange(16))
    assert states.shape == (16, cfg.state_dim)
    assert np.all(np.isfinite(states))


def test_pretrained_weights_through_train_cli(tmp_path, monkeypatch):
    """The FULL reference CLI path: train.py --model-type resnet
    --pretrained-weights <npz> end to end (config 5's pretrained encoder,
    VERDICT r1 next-round #9)."""
    import os

    from srl_zoo_tpu.data.synthetic import generate_dataset
    from train import main as train_main

    tm = TorchResNet18()
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    wpath = tmp_path / "resnet18.npz"
    np.savez(wpath, **sd)

    data = str(tmp_path / "synth")
    generate_dataset(data, n_episodes=3, episode_len=20, img_size=32, seed=0)
    log = str(tmp_path / "run")
    monkeypatch.chdir(tmp_path)  # train.py resolves relative data folders
    train_main(["--data-folder", data, "--losses", "inverse",
                "--model-type", "resnet", "--state-dim", "4", "-bs", "16",
                "--epochs", "1", "--pretrained-weights", str(wpath),
                "--log-folder", log, "--no-display-plots"])
    out = np.load(os.path.join(log, "states_rewards.npz"))
    assert out["states"].shape[1] == 4
    assert np.all(np.isfinite(out["states"]))
    # the run's config records the weights provenance for reproducibility
    import json
    exp = json.load(open(os.path.join(log, "exp_config.json")))
    assert exp["pretrained-weights"].endswith("resnet18.npz")
