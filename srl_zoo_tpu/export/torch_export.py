"""Export a trained Flax SRL encoder as a self-contained PyTorch module.

The reference ecosystem hands states to TORCH RL policies: srl-zoo's
companion repo (robotics-rl-srl) reloads ``srl_model.pth`` inside a torch
training loop. Our training/serving path is JAX; this module closes the
hand-off loop in the other direction — a user trains here on TPU, exports
once, and embeds the encoder in any torch policy with zero JAX dependency:

    python -m srl_zoo_tpu.export.torch_export --log-folder logs/<run>
    # then, anywhere torch runs:
    enc = torch.jit.load("logs/<run>/encoder_torch.pt").eval()
    states = enc(torch.from_numpy(obs_u8).float())   # NHWC, 0..255

Design notes (all parity-tested against the live Flax model in
tests/test_torch_export.py):

* The exported module takes float NHWC in [0, 255] (cast your uint8) and
  applies the run's own normalization ("tf" or "image_net") INSIDE, so the
  torch side cannot drift from training-time preprocessing.
* Convs/BN run NCHW internally (torch's fast layout); tensors are permuted
  at the boundaries and the flatten before each Linear happens on NHWC so
  the weight layout matches Flax's reshape exactly.
* custom_cnn uses XLA-"SAME" asymmetric padding; torch's Conv2d(padding=
  'same') rejects strided convs, so pads are precomputed from the run's
  static image size and applied with F.pad (value=-inf before max-pools,
  matching lax.reduce_window's -inf init).
* resnet mirrors models/resnet.py exactly (torch-style explicit padding —
  it was built to match torchvision, reference models/models.py); the
  ``--state-dict`` export uses torchvision resnet18 key names (normalizer
  buffers stripped), so it also loads into
  ``torchvision.models.resnet18(num_classes=<fc width>)`` — fc width is
  state_dim, or 2*state_dim for a VAE run (mu ‖ logvar head).
* A VAE encoder's torch export returns mu (the deterministic state), same
  as StateEncoder/SRLModules.encode.
* TorchScript via ``torch.jit.trace`` (all control flow here is static —
  pads and geometry are precomputed from the run's fixed image size) makes
  the artifact self-contained: loading it needs torch only, not this
  package.
"""

from __future__ import annotations

import argparse
import json
import math
import os
from typing import Dict, List, Tuple

import numpy as np

from srl_zoo_tpu.ops.preproc import IMAGENET_MEAN, IMAGENET_STD


def _same_pads(size: int, k: int, s: int) -> Tuple[int, int]:
    """XLA 'SAME' (lo, hi) padding for one spatial dim — delegates to the
    canonical math in ops/pooling so the export's numerical parity can
    never drift from what Flax/XLA actually compute (three independent
    copies of this formula existed; review r3)."""
    from srl_zoo_tpu.ops.pooling import _same_pads as _xla_same_pads
    return _xla_same_pads(size, k, s)[1]


def _t(x) -> "torch.Tensor":  # noqa: F821 — torch imported lazily
    import torch
    return torch.from_numpy(np.asarray(x, np.float32).copy())


def _conv_w(kernel) -> "torch.Tensor":  # noqa: F821
    return _t(np.transpose(np.asarray(kernel), (3, 2, 0, 1)))  # HWIO->OIHW


def _load_bn(bn: "torch.nn.BatchNorm2d", p: Dict, s: Dict) -> None:  # noqa: F821
    bn.weight.data = _t(p["scale"])
    bn.bias.data = _t(p["bias"])
    bn.running_mean.data = _t(s["mean"])
    bn.running_var.data = _t(s["var"])


def _make_normalizer(normalize_mode: str, n_channels: int):
    """Returns (shift, scale) NCHW tensors: x_norm = (x - shift) / scale."""
    if normalize_mode == "tf":
        shift = np.full((1, n_channels, 1, 1), 127.5, np.float32)
        scale = np.full((1, n_channels, 1, 1), 127.5, np.float32)
    elif normalize_mode == "image_net":
        reps = n_channels // 3
        shift = (np.asarray(IMAGENET_MEAN * reps, np.float32) * 255.0
                 ).reshape(1, n_channels, 1, 1)
        scale = (np.asarray(IMAGENET_STD * reps, np.float32) * 255.0
                 ).reshape(1, n_channels, 1, 1)
    else:
        raise ValueError(f"Unknown normalize mode: {normalize_mode}")
    return _t(shift), _t(scale)


def _torch_custom_cnn(params: Dict, stats: Dict, cfg) -> "torch.nn.Module":  # noqa: F821
    import torch
    from torch import nn
    from torch.nn import functional as F

    state_dim = cfg.state_dim
    out_dim = params["Dense_0"]["kernel"].shape[1]
    shift, scale = _make_normalizer(cfg.normalize_mode, cfg.n_channels)

    # static per-layer SAME pads from the run's fixed image geometry
    h, w = cfg.img_height, cfg.img_width
    kernel_sizes = (7, 3, 3)
    conv_pads: List[Tuple[int, int, int, int]] = []
    pool_pads: List[Tuple[int, int, int, int]] = []
    for k in kernel_sizes:
        (ct, cb), (cl, cr) = _same_pads(h, k, 2), _same_pads(w, k, 2)
        conv_pads.append((cl, cr, ct, cb))        # F.pad order: W then H
        h, w = math.ceil(h / 2), math.ceil(w / 2)
        (pt, pb), (pl, pr) = _same_pads(h, 3, 2), _same_pads(w, 3, 2)
        pool_pads.append((pl, pr, pt, pb))
        h, w = math.ceil(h / 2), math.ceil(w / 2)

    class TorchCustomCNN(nn.Module):
        def __init__(self):
            super().__init__()
            self.register_buffer("shift", shift)
            self.register_buffer("scale", scale)
            self.convs = nn.ModuleList()
            self.bns = nn.ModuleList()
            in_ch = cfg.n_channels
            for i, k in enumerate(kernel_sizes):
                conv = nn.Conv2d(in_ch, 64, k, stride=2, bias=False)
                conv.weight.data = _conv_w(params[f"Conv_{i}"]["kernel"])
                bn = nn.BatchNorm2d(64)
                _load_bn(bn, params[f"BatchNorm_{i}"],
                         stats[f"BatchNorm_{i}"])
                self.convs.append(conv)
                self.bns.append(bn)
                in_ch = 64
            self.fc = nn.Linear(params["Dense_0"]["kernel"].shape[0],
                                out_dim)
            self.fc.weight.data = _t(
                np.asarray(params["Dense_0"]["kernel"]).T)
            self.fc.bias.data = _t(params["Dense_0"]["bias"])
            self.conv_pads = conv_pads
            self.pool_pads = pool_pads
            self.state_dim = state_dim

        def forward(self, x):
            # x: float NHWC in [0, 255]
            x = x.permute(0, 3, 1, 2)
            x = (x - self.shift) / self.scale
            for i in range(len(self.convs)):
                x = F.pad(x, self.conv_pads[i])
                x = torch.relu(self.bns[i](self.convs[i](x)))
                x = F.pad(x, self.pool_pads[i], value=float("-inf"))
                x = F.max_pool2d(x, 3, stride=2)
            x = x.permute(0, 2, 3, 1).flatten(1)  # match Flax NHWC reshape
            return self.fc(x)[:, :self.state_dim]  # VAE: mu half

    return TorchCustomCNN().eval()


def _torch_dense(params: Dict, cfg) -> "torch.nn.Module":  # noqa: F821
    from torch import nn

    state_dim = cfg.state_dim
    shift, scale = _make_normalizer(cfg.normalize_mode, cfg.n_channels)
    names = sorted((k for k in params if k.startswith("Dense_")),
                   key=lambda n: int(n.split("_")[1]))

    class TorchDense(nn.Module):
        def __init__(self):
            super().__init__()
            self.register_buffer("shift", shift)
            self.register_buffer("scale", scale)
            self.layers = nn.ModuleList()
            for name in names:
                kern = np.asarray(params[name]["kernel"])
                lin = nn.Linear(kern.shape[0], kern.shape[1])
                lin.weight.data = _t(kern.T)
                lin.bias.data = _t(params[name]["bias"])
                self.layers.append(lin)
            self.state_dim = state_dim

        def forward(self, x):
            x = x.permute(0, 3, 1, 2)
            x = (x - self.shift) / self.scale
            x = x.permute(0, 2, 3, 1).flatten(1)  # Flax flattens NHWC
            n = len(self.layers)
            for i, lin in enumerate(self.layers):
                x = lin(x)
                if i < n - 1:
                    x = x.relu()
            return x[:, :self.state_dim]

    return TorchDense().eval()


def _torch_resnet18(params: Dict, stats: Dict, cfg) -> "torch.nn.Module":  # noqa: F821
    """Mirror of models/resnet.py (itself built to match torchvision —
    models/torch_port.py documents the exact key mapping this inverts).
    state_dict keys follow torchvision resnet18, so the exported weights
    also load into torchvision.models.resnet18(num_classes=...)."""
    from torch import nn

    state_dim = cfg.state_dim
    out_dim = params["Dense_0"]["kernel"].shape[1]
    shift, scale = _make_normalizer(cfg.normalize_mode, cfg.n_channels)

    class Block(nn.Module):
        def __init__(self, in_ch: int, features: int, stride: int,
                     p: Dict, s: Dict):
            super().__init__()
            self.conv1 = nn.Conv2d(in_ch, features, 3, stride=stride,
                                   padding=1, bias=False)
            self.conv1.weight.data = _conv_w(p["Conv_0"]["kernel"])
            self.bn1 = nn.BatchNorm2d(features)
            _load_bn(self.bn1, p["BatchNorm_0"], s["BatchNorm_0"])
            self.conv2 = nn.Conv2d(features, features, 3, padding=1,
                                   bias=False)
            self.conv2.weight.data = _conv_w(p["Conv_1"]["kernel"])
            self.bn2 = nn.BatchNorm2d(features)
            _load_bn(self.bn2, p["BatchNorm_1"], s["BatchNorm_1"])
            self.downsample: nn.Module = nn.Identity()
            if "Conv_2" in p:
                conv = nn.Conv2d(in_ch, features, 1, stride=stride,
                                 bias=False)
                conv.weight.data = _conv_w(p["Conv_2"]["kernel"])
                bn = nn.BatchNorm2d(features)
                _load_bn(bn, p["BatchNorm_2"], s["BatchNorm_2"])
                self.downsample = nn.Sequential(conv, bn)

        def forward(self, x):
            y = self.bn1(self.conv1(x)).relu()
            y = self.bn2(self.conv2(y))
            return (y + self.downsample(x)).relu()

    class TorchResNet18(nn.Module):
        def __init__(self):
            super().__init__()
            self.register_buffer("shift", shift)
            self.register_buffer("scale", scale)
            self.conv1 = nn.Conv2d(cfg.n_channels, 64, 7, stride=2,
                                   padding=3, bias=False)
            self.conv1.weight.data = _conv_w(params["Conv_0"]["kernel"])
            self.bn1 = nn.BatchNorm2d(64)
            _load_bn(self.bn1, params["BatchNorm_0"],
                     stats["BatchNorm_0"])
            self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
            layers = []
            in_ch, features = 64, 64
            for stage in range(4):
                blocks = []
                for block in range(2):
                    i = 2 * stage + block
                    stride = 2 if stage > 0 and block == 0 else 1
                    blocks.append(Block(in_ch, features, stride,
                                        params[f"BasicBlock_{i}"],
                                        stats[f"BasicBlock_{i}"]))
                    in_ch = features
                layers.append(nn.Sequential(*blocks))
                features *= 2
            self.layer1, self.layer2, self.layer3, self.layer4 = layers
            self.fc = nn.Linear(512, out_dim)
            self.fc.weight.data = _t(
                np.asarray(params["Dense_0"]["kernel"]).T)
            self.fc.bias.data = _t(params["Dense_0"]["bias"])
            self.state_dim = state_dim

        def forward(self, x):
            x = x.permute(0, 3, 1, 2)
            x = (x - self.shift) / self.scale
            x = self.bn1(self.conv1(x)).relu()
            x = self.maxpool(x)
            x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
            x = x.mean(dim=(2, 3))  # global average pool
            return self.fc(x)[:, :self.state_dim]

    return TorchResNet18().eval()


def build_torch_encoder(cfg, variables) -> "torch.nn.Module":  # noqa: F821
    """Flax variables ({'params', 'batch_stats'}) -> equivalent torch module.

    The returned module is in eval mode, takes float NHWC input in
    [0, 255], and returns (B, state_dim) — mu for VAE runs, exactly like
    SRLModules.encode."""
    params = variables["params"]["encoder"]
    stats = variables.get("batch_stats", {}).get("encoder", {})
    if cfg.model_type == "custom_cnn":
        return _torch_custom_cnn(params, stats, cfg)
    if cfg.model_type == "resnet":
        return _torch_resnet18(params, stats, cfg)
    if cfg.model_type in ("mlp", "linear"):
        return _torch_dense(params, cfg)
    raise ValueError(f"Unknown model type: {cfg.model_type}")


def export_torch_encoder(log_folder: str, out_path: str | None = None,
                         torchscript: bool = True) -> str:
    """Load a trained run and write ``encoder_torch.pt`` (+ meta json).

    torchscript=True (default) traces to a self-contained artifact loadable
    with ``torch.jit.load`` alone; False saves a plain state_dict with the
    normalizer buffers stripped (torchvision-compatible keys for resnet —
    the caller applies preprocessing themselves, per the meta json)."""
    import torch

    from srl_zoo_tpu.config import SRLConfig
    from srl_zoo_tpu.training import checkpoint as ckpt

    cfg = SRLConfig.load(log_folder)
    _, state, _ = ckpt.load_srl_model(log_folder, cfg)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    module = build_torch_encoder(cfg, variables)

    out_path = out_path or os.path.join(log_folder, "encoder_torch.pt")
    if torchscript:
        example = torch.zeros(
            (1, cfg.img_height, cfg.img_width, cfg.n_channels))
        with torch.no_grad():
            scripted = torch.jit.trace(module, example)
        scripted.save(out_path)
    else:
        sd = module.state_dict()
        # strict torchvision loading must not trip over our normalizer
        # buffers; a bare state_dict consumer normalizes per the meta json
        sd.pop("shift", None)
        sd.pop("scale", None)
        torch.save(sd, out_path)
    meta = {"input": "float32 NHWC in [0, 255] "
                     f"({cfg.img_height}x{cfg.img_width}x{cfg.n_channels})",
            "output": f"float32 (B, {cfg.state_dim}) states",
            "normalization": ("applied inside" if torchscript else
                              "NOT applied — apply yourself") +
                             f" ({cfg.normalize_mode})",
            "model_type": cfg.model_type,
            "torchscript": torchscript}
    with open(out_path + ".json", "w") as f:
        json.dump(meta, f, indent=2)
    return out_path


def main(argv=None) -> str:
    from srl_zoo_tpu.utils import printGreen
    from srl_zoo_tpu.utils.platform import honor_env_platform
    honor_env_platform()
    p = argparse.ArgumentParser(
        description="Export a trained SRL encoder to PyTorch")
    p.add_argument("--log-folder", type=str, required=True)
    p.add_argument("--out", type=str, default=None,
                   help="Output path (default <log-folder>/encoder_torch.pt)")
    p.add_argument("--state-dict", action="store_true",
                   help="Save a plain state_dict instead of TorchScript")
    args = p.parse_args(argv)
    path = export_torch_encoder(args.log_folder, args.out,
                                torchscript=not args.state_dict)
    printGreen(f"Exported {path}")
    return path


if __name__ == "__main__":
    main()
