"""Port torchvision ResNet-18 weights into the Flax encoder.

Reference parity: models/models.py uses torchvision's ImageNet-pretrained
ResNet-18. This host has no network access, so no pretrained weights ship in
the repo — but when a user has a ``resnet18`` state_dict (e.g. downloaded
elsewhere and saved with ``numpy.savez`` or ``torch.save``), this converter
maps it exactly onto ``srl_zoo_tpu.models.resnet.ResNet18`` (same math:
torch-style explicit padding, BN running stats; verified numerically in
tests/test_torch_port.py against a live torch model).

Layout mapping (torch OIHW -> flax HWIO; BN affine -> params, running stats
-> batch_stats):

  conv1 / bn1                 -> Conv_0 / BatchNorm_0
  layer{s}.{b}.conv1/bn1      -> BasicBlock_{2(s-1)+b}.Conv_0/BatchNorm_0
  layer{s}.{b}.conv2/bn2      -> BasicBlock_{...}.Conv_1/BatchNorm_1
  layer{s}.{b}.downsample.0/1 -> BasicBlock_{...}.Conv_2/BatchNorm_2
  fc                          -> Dense_0 (only if its width == state_dim)
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, np.float32)


def _conv(params: Dict, dst: str, w) -> None:
    params[dst] = {"kernel": _np(w).transpose(2, 3, 1, 0)}  # OIHW -> HWIO


def _bn(params: Dict, stats: Dict, dst: str, sd: Dict, prefix: str) -> None:
    params[dst] = {"scale": _np(sd[f"{prefix}.weight"]),
                   "bias": _np(sd[f"{prefix}.bias"])}
    stats[dst] = {"mean": _np(sd[f"{prefix}.running_mean"]),
                  "var": _np(sd[f"{prefix}.running_var"])}


def port_resnet18(state_dict: Dict, state_dim: int | None = None
                  ) -> Tuple[Dict, Dict]:
    """torch resnet18 state_dict -> (params, batch_stats) for ResNet18.

    ``fc`` is ported only when its output width equals ``state_dim``
    (the SRL encoder replaces the 1000-way ImageNet head, exactly like the
    reference's ConvolutionalNetwork does).
    """
    sd = dict(state_dict)
    params: Dict = {}
    stats: Dict = {}

    _conv(params, "Conv_0", sd["conv1.weight"])
    _bn(params, stats, "BatchNorm_0", sd, "bn1")

    for stage in range(4):
        for block in range(2):
            i = 2 * stage + block
            t = f"layer{stage + 1}.{block}"
            blk_p: Dict = {}
            blk_s: Dict = {}
            _conv(blk_p, "Conv_0", sd[f"{t}.conv1.weight"])
            _bn(blk_p, blk_s, "BatchNorm_0", sd, f"{t}.bn1")
            _conv(blk_p, "Conv_1", sd[f"{t}.conv2.weight"])
            _bn(blk_p, blk_s, "BatchNorm_1", sd, f"{t}.bn2")
            if f"{t}.downsample.0.weight" in sd:
                _conv(blk_p, "Conv_2", sd[f"{t}.downsample.0.weight"])
                _bn(blk_p, blk_s, "BatchNorm_2", sd, f"{t}.downsample.1")
            params[f"BasicBlock_{i}"] = blk_p
            stats[f"BasicBlock_{i}"] = blk_s

    if "fc.weight" in sd and state_dim is not None \
            and _np(sd["fc.weight"]).shape[0] == state_dim:
        params["Dense_0"] = {"kernel": _np(sd["fc.weight"]).T,
                             "bias": _np(sd["fc.bias"])}
    return params, stats


def load_ported_resnet18(npz_or_pth_path: str, state_dim: int
                         ) -> Tuple[Dict, Dict]:
    """Load a saved state_dict (.npz of arrays, or a torch .pth) and port it."""
    if npz_or_pth_path.endswith(".npz"):
        sd = dict(np.load(npz_or_pth_path))
    else:
        import torch
        sd = torch.load(npz_or_pth_path, map_location="cpu",
                        weights_only=True)
    return port_resnet18(sd, state_dim)
