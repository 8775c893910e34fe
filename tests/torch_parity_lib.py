"""Live-torch step-level parity harness (VERDICT r4 #2).

The reference mount has been empty for five rounds, so the loss formulas,
reductions, and optimizer settings in losses/functions.py are documented
design decisions (docs/DESIGN_DECISIONS.md) locked by golden tests — which
would happily lock in a wrong guess. This module is the strongest
reference-parity proxy an air-gapped host can produce: an INDEPENDENT
PyTorch implementation of the documented formulas (written from the
DESIGN_DECISIONS/SURVEY §2.6 prose, not transcribed from the JAX code),
mirrored weights, identical batches, stepped with the same optimizer — if
per-step losses and post-step parameters agree to float32 noise for several
steps, the JAX implementation computes exactly what the documents say, as
live torch understands it.

Scope: the BatchNorm-free encoders (mlp/linear) — train-mode parity is then
exact (no BN momentum/eps semantics to reconcile). custom_cnn/resnet
eval-mode FORWARD parity against torch is already covered by
tests/test_torch_export.py; the step-level harness validates the loss/
optimizer half on top (reference: losses/losses.py, models/learner.py).

Used by tests/test_torch_parity.py (slow lane).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np
import torch
from torch import nn

from srl_zoo_tpu.config import RECONSTRUCTION_LOSSES
from srl_zoo_tpu.ops.preproc import IMAGENET_MEAN, IMAGENET_STD

Registry = List[Tuple[Tuple[str, ...], "torch.nn.Parameter", bool]]


def _t(x) -> torch.Tensor:
    return torch.from_numpy(np.asarray(x, np.float32).copy())


def _lin(p: Dict, registry: Registry, path: Tuple[str, ...]) -> nn.Linear:
    """Flax Dense params -> torch Linear, registering both tensors for the
    post-step parameter comparison (kernel is stored transposed in torch)."""
    k = np.asarray(p["kernel"], np.float32)
    lin = nn.Linear(k.shape[0], k.shape[1])
    lin.weight.data = torch.from_numpy(np.ascontiguousarray(k.T))
    lin.bias.data = _t(p["bias"])
    registry.append((path + ("kernel",), lin.weight, True))
    registry.append((path + ("bias",), lin.bias, False))
    return lin


def _mlp(params: Dict, registry: Registry,
         path: Tuple[str, ...]) -> nn.ModuleList:
    """All Dense_i layers of a flax module, in index order."""
    names = sorted((k for k in params if k.startswith("Dense_")),
                   key=lambda n: int(n.split("_")[1]))
    return nn.ModuleList([_lin(params[n], registry, path + (n,))
                          for n in names])


def _run_mlp(layers: nn.ModuleList, x: torch.Tensor) -> torch.Tensor:
    """ReLU between layers, linear output (matches DenseEncoder/heads)."""
    n = len(layers)
    for i, lin in enumerate(layers):
        x = lin(x)
        if i < n - 1:
            x = torch.relu(x)
    return x


def _slice(x: torch.Tensor, sl: Tuple[int, int]) -> torch.Tensor:
    start, size = sl
    return x[..., start:start + size]


def _same_pads(in_sz: int, k: int, s: int) -> Tuple[int, int]:
    """XLA 'SAME' padding amounts (lo, hi) for one spatial dim: out =
    ceil(in/s), total = max((out-1)*s + k - in, 0), lo = total//2 — written
    from the documented convention, torch applies it via F.pad (torch's own
    symmetric ``padding=`` cannot express the asymmetric hi > lo case)."""
    out = -(-in_sz // s)
    total = max((out - 1) * s + k - in_sz, 0)
    return total // 2, total - total // 2


class _TorchCustomCNN(nn.Module):
    """Torch mirror of the custom_cnn encoder (decision #23): three blocks of
    [conv 64 stride-2 SAME no-bias -> BatchNorm2d -> relu -> max-pool 3x3
    stride-2 SAME] then Dense to state_dim. BatchNorm2d carries torch's OWN
    train-mode semantics (normalize by the biased batch variance, running
    buffers at momentum = 1 - flax_momentum on torch's complementary
    convention) — agreement validates the flax side's BN math against live
    torch. Input/flatten stay in NHWC orientation to match the flax Dense
    kernel ordering; conv kernels map HWIO -> OIHW."""

    def __init__(self, params: Dict, batch_stats: Dict, registry: Registry,
                 bn_momentum: float, path: Tuple[str, ...]):
        super().__init__()
        convs, bns = [], []
        self.kernel_sizes = (7, 3, 3)
        for i in range(len(self.kernel_sizes)):
            kern = np.asarray(params[f"Conv_{i}"]["kernel"], np.float32)
            w = nn.Parameter(torch.from_numpy(
                np.ascontiguousarray(kern.transpose(3, 2, 0, 1))))
            registry.append((path + (f"Conv_{i}", "kernel"), w, "conv"))
            bn = nn.BatchNorm2d(kern.shape[3], eps=1e-5,
                                momentum=1.0 - bn_momentum)
            bnp = params[f"BatchNorm_{i}"]
            bn.weight.data = _t(bnp["scale"])
            bn.bias.data = _t(bnp["bias"])
            st = batch_stats[f"BatchNorm_{i}"]
            bn.running_mean.data = _t(st["mean"])
            bn.running_var.data = _t(st["var"])
            registry.append((path + (f"BatchNorm_{i}", "scale"), bn.weight,
                             False))
            registry.append((path + (f"BatchNorm_{i}", "bias"), bn.bias,
                             False))
            convs.append(w)
            bns.append(bn)
        self.convs = nn.ParameterList(convs)
        self.bns = nn.ModuleList(bns)
        self.dense = _lin(params["Dense_0"], registry, path + ("Dense_0",))
        # per-BN reduce counts (B*H*W), recorded at forward time: the
        # biased/unbiased running-var gap is bounded by 1/(n-1) per layer
        self.bn_counts: List[int] = [0] * len(bns)

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        x = x.permute(0, 3, 1, 2)  # NHWC -> NCHW for torch conv/pool
        for i, (w, bn) in enumerate(zip(self.convs, self.bns)):
            k = self.kernel_sizes[i]
            (t, b), (l, r) = (_same_pads(x.shape[2], k, 2),
                              _same_pads(x.shape[3], k, 2))
            x = torch.nn.functional.conv2d(
                torch.nn.functional.pad(x, (l, r, t, b)), w, stride=2)
            self.bn_counts[i] = x.shape[0] * x.shape[2] * x.shape[3]
            x = torch.relu(bn(x))
            (t, b), (l, r) = (_same_pads(x.shape[2], 3, 2),
                              _same_pads(x.shape[3], 3, 2))
            x = torch.nn.functional.max_pool2d(
                torch.nn.functional.pad(x, (l, r, t, b),
                                        value=-float("inf")),
                kernel_size=3, stride=2)
        x = x.permute(0, 2, 3, 1).flatten(1)  # back to NHWC flatten order
        return self.dense(x)


class TorchSRLMirror(nn.Module):
    """Torch mirror of SRLModules for mlp/linear encoders: same weights,
    same outputs dict, built directly from the flax param tree."""

    def __init__(self, cfg, params: Dict, dae_params: Dict = None,
                 batch_stats: Dict = None):
        super().__init__()
        if cfg.model_type not in ("mlp", "linear", "custom_cnn"):
            raise ValueError("parity mirror supports mlp/linear/custom_cnn "
                             "encoders only")
        self.cfg = cfg
        self.registry: Registry = []
        if cfg.model_type == "custom_cnn":
            if cfg.use_decoder:
                raise ValueError("the custom_cnn mirror covers encoder-side "
                                 "losses (no conv decoder mirror)")
            self.encoder_cnn = _TorchCustomCNN(
                params["encoder"], batch_stats["encoder"], self.registry,
                cfg.bn_momentum, ("encoder",))
        else:
            self.encoder = _mlp(params["encoder"], self.registry,
                                ("encoder",))
        if dae_params is not None:
            # frozen pretrained-DAE encoder for the perceptual loss:
            # constants (never stepped), gradients flow through its INPUT
            names = sorted((k for k in dae_params["encoder"]
                            if k.startswith("Dense_")),
                           key=lambda n: int(n.split("_")[1]))
            self.frozen_dae = [
                (torch.from_numpy(np.ascontiguousarray(
                    np.asarray(dae_params["encoder"][n]["kernel"],
                               np.float32).T)),
                 _t(dae_params["encoder"][n]["bias"]))
                for n in names]
        if cfg.use_decoder:
            self.decoder = _mlp(params["decoder"], self.registry,
                                ("decoder",))
            self.recon_slice = next(cfg.slices[n] for n in cfg.loss_names
                                    if n in RECONSTRUCTION_LOSSES)
        if cfg.use_forward:
            self.forward_model = _mlp(params["forward_model"], self.registry,
                                      ("forward_model",))
        if cfg.use_inverse:
            self.inverse_model = _mlp(params["inverse_model"], self.registry,
                                      ("inverse_model",))
        if cfg.use_reward:
            self.reward_model = _mlp(params["reward_model"], self.registry,
                                     ("reward_model",))
        if cfg.use_episode_prior:
            self.discriminator = _mlp(params["discriminator"], self.registry,
                                      ("discriminator",))

    # ---- preprocessing (decision #7: "tf" x*2/255-1, "image_net" mean/std) --
    def normalize(self, u8: np.ndarray) -> torch.Tensor:
        x = torch.from_numpy(np.asarray(u8, np.float32))
        if self.cfg.normalize_mode == "tf":
            return x * (2.0 / 255.0) - 1.0
        if self.cfg.normalize_mode == "image_net":
            reps = u8.shape[-1] // 3
            mean = _t(np.asarray(IMAGENET_MEAN * reps) * 255.0)
            std = _t(np.asarray(IMAGENET_STD * reps) * 255.0)
            return (x - mean) / std
        raise ValueError(self.cfg.normalize_mode)

    def _encode_raw(self, x: torch.Tensor):
        if self.cfg.model_type == "custom_cnn":
            out = self.encoder_cnn(x)
        else:
            out = _run_mlp(self.encoder, x.flatten(1))
        if self.cfg.use_vae:
            mu, logvar = out.chunk(2, dim=-1)
            return mu, logvar
        return out, None

    def _reparameterize(self, mu, logvar, eps):
        """z = mu + exp(0.5 logvar) * eps on the vae slice only; ``eps`` is
        captured from the JAX side (same values both frameworks)."""
        if eps is None:
            return mu
        start, size = self.cfg.slices["vae"]
        z = mu + torch.exp(0.5 * logvar) * eps
        mask = torch.zeros(mu.shape[-1], dtype=torch.bool)
        mask[start:start + size] = True
        return torch.where(mask, z, mu)

    def forward(self, batch: Dict[str, np.ndarray], eps: np.ndarray = None,
                occluded_obs: np.ndarray = None) -> Dict[str, torch.Tensor]:
        """Mirror of SRLModules.__call__ + train_step preprocessing: takes
        the RAW uint8 loader batch, normalizes inside. ``occluded_obs`` is
        the already-normalized DAE corruption captured from the JAX side."""
        cfg = self.cfg
        out: Dict[str, torch.Tensor] = {}
        obs = self.normalize(batch["obs"])
        out["target_obs"] = obs
        enc_in = (_t(occluded_obs)
                  if (cfg.use_dae and occluded_obs is not None) else obs)
        mu, logvar = self._encode_raw(enc_in)
        state = self._reparameterize(
            mu, logvar, _t(eps) if eps is not None else None)
        out["mu"], out["logvar"], out["state"] = mu, logvar, state

        if cfg.needs_next_obs:
            next_mu, _ = self._encode_raw(self.normalize(batch["next_obs"]))
            out["next_state"] = next_mu  # no vae in next-state families here

        if cfg.use_decoder:
            z = _slice(state, self.recon_slice)
            x = _run_mlp(self.decoder, z)
            h, w, c = cfg.img_height, cfg.img_width, cfg.n_channels
            out["recon"] = torch.tanh(x.view(-1, h, w, c))
        if cfg.use_forward:
            sl = cfg.slices["forward"]
            a = torch.nn.functional.one_hot(
                torch.from_numpy(np.asarray(batch["actions"],
                                            np.int64)),
                cfg.n_actions).float()
            out["forward_pred"] = _run_mlp(
                self.forward_model,
                torch.cat([_slice(state, sl), a], dim=-1))
        if cfg.use_inverse:
            sl = cfg.slices["inverse"]
            out["inverse_logits"] = _run_mlp(
                self.inverse_model,
                torch.cat([_slice(state, sl),
                           _slice(out["next_state"], sl)], dim=-1))
        if cfg.use_reward:
            sl = cfg.slices["reward"]
            out["reward_logits"] = _run_mlp(
                self.reward_model,
                torch.cat([_slice(state, sl),
                           _slice(out["next_state"], sl)], dim=-1))
        if cfg.use_triplet:
            out["pos_state"], _ = self._encode_raw(
                self.normalize(batch["pos_obs"]))
            out["neg_state"], _ = self._encode_raw(
                self.normalize(batch["neg_obs"]))
        if "perceptual" in cfg.loss_dict:
            # frozen-DAE feature space (mirrors learner._build_frozen_dae ->
            # train_step extras): encode recon and the clean target with the
            # CONSTANT pretrained encoder; only recon carries gradient
            def frozen_feats(x: torch.Tensor) -> torch.Tensor:
                x = x.flatten(1)
                n = len(self.frozen_dae)
                for i, (wt, b) in enumerate(self.frozen_dae):
                    x = torch.nn.functional.linear(x, wt, b)
                    if i < n - 1:
                        x = torch.relu(x)
                return x
            out["feat_recon"] = frozen_feats(out["recon"])
            out["feat_target"] = frozen_feats(obs)
        if cfg.use_episode_prior:
            # decision #4's adversarial topology: the discriminator learns
            # on DETACHED states; the encoder fools a WEIGHT-FROZEN
            # discriminator (mirrors train_step._extras' parameter-subtree
            # stop-gradients)
            sl = cfg.slices["episode-prior"]
            s1 = _slice(state, sl)
            s2 = s1[torch.from_numpy(
                np.asarray(batch["episode_partners"], np.int64))]
            x_d = torch.cat([s1.detach(), s2.detach()], dim=-1)
            out["disc_logits_d"] = _run_mlp(self.discriminator, x_d)[..., 0]
            x_e = torch.cat([s1, s2], dim=-1)
            n = len(self.discriminator)
            for i, lin in enumerate(self.discriminator):
                x_e = torch.nn.functional.linear(
                    x_e, lin.weight.detach(), lin.bias.detach())
                if i < n - 1:
                    x_e = torch.relu(x_e)
            out["disc_logits_e"] = x_e[..., 0]
        return out


# ---- the documented loss formulas, written independently in torch ----------
def _mse(a: torch.Tensor, b: torch.Tensor) -> torch.Tensor:
    # decision #1: per-sample mean over all non-batch dims, then batch mean
    return ((a - b) ** 2).flatten(1).mean(dim=1).mean()


def _ce(logits: torch.Tensor, labels: np.ndarray) -> torch.Tensor:
    logp = torch.log_softmax(logits, dim=-1)
    y = torch.from_numpy(np.asarray(labels, np.int64))
    return -logp.gather(-1, y[:, None])[:, 0].mean()


def _masked_mean(v: torch.Tensor, m: torch.Tensor) -> torch.Tensor:
    return (v * m).sum() / m.sum().clamp(min=1.0)


def _safe_norm(x: torch.Tensor) -> torch.Tensor:
    return torch.sqrt((x * x).sum(-1) + 1e-12)


def torch_total_loss(cfg, out: Dict[str, torch.Tensor],
                     batch: Dict[str, np.ndarray],
                     params: List[torch.Tensor] = None
                     ) -> Tuple[torch.Tensor, Dict[str, float]]:
    """Weighted total per the documented objectives (SURVEY §2.6 /
    DESIGN_DECISIONS #1-#3, #12). Training batches only (valid all-ones).
    ``params`` (every trainable tensor) is required when l1/l2 > 0."""
    w = cfg.loss_dict
    metrics: Dict[str, float] = {}
    total = torch.zeros(())
    state = out["state"]

    def add(name, value):
        nonlocal total
        metrics[name] = float(value.detach())
        total = total + w[name] * value

    if "autoencoder" in w:
        add("autoencoder", _mse(out["recon"], out["target_obs"]))
    if "dae" in w:
        add("dae", _mse(out["recon"], out["target_obs"]))
    if "vae" in w:
        sl = cfg.slices["vae"]
        mu, logvar = _slice(out["mu"], sl), _slice(out["logvar"], sl)
        kl = (-0.5 * (1.0 + logvar - mu ** 2 - torch.exp(logvar))
              .mean(dim=-1)).mean()
        add("vae", _mse(out["recon"], out["target_obs"]) + cfg.beta * kl)
    if "priors" in w:
        sl = cfg.slices["priors"]
        s = _slice(state, sl)
        sn = _slice(out["next_state"], sl)
        d = sn - s
        sa = torch.from_numpy(np.asarray(batch["same_action_partners"],
                                         np.int64))
        da = torch.from_numpy(np.asarray(batch["dissimilar_partners"],
                                         np.int64))
        m_sa = _t(batch["same_action_mask"])
        m_da = _t(batch["dissimilar_mask"])
        temporal = (d ** 2).sum(-1).mean()
        causality = _masked_mean(
            torch.exp(-((s - s[da]) ** 2).sum(-1)), m_da)
        proportionality = _masked_mean(
            (_safe_norm(d) - _safe_norm(d[sa])) ** 2, m_sa)
        repeatability = _masked_mean(
            torch.exp(-((s - s[sa]) ** 2).sum(-1))
            * ((d - d[sa]) ** 2).sum(-1), m_sa)
        add("priors", temporal + causality + proportionality + repeatability)
    if "forward" in w:
        sl = cfg.slices["forward"]
        add("forward", _mse(out["forward_pred"],
                            _slice(out["next_state"], sl)))
    if "inverse" in w:
        add("inverse", _ce(out["inverse_logits"], batch["actions"]))
    if "reward" in w:
        add("reward", _ce(out["reward_logits"], batch["reward_classes"]))
    if "triplet" in w:
        sl = cfg.slices["triplet"]
        a = _slice(out["mu"], sl)
        d_pos = _safe_norm(a - _slice(out["pos_state"], sl))
        d_neg = _safe_norm(a - _slice(out["neg_state"], sl))
        add("triplet", torch.clamp(d_pos - d_neg + 1.0, min=0.0).mean())
    if "perceptual" in w:
        add("perceptual", _mse(out["feat_recon"], out["feat_target"]))
    if "reward-prior" in w:
        # decision #3: maximize squared batch covariance between each state
        # dim and the centered reward (mean-weighted, valid all-ones)
        sl = cfg.slices["reward-prior"]
        s = _slice(state, sl)
        r = _t(batch["rewards"])
        s_c = s - s.mean(dim=0, keepdim=True)
        r_c = r - r.mean()
        cov = (s_c * r_c[:, None]).mean(dim=0)
        add("reward-prior", -(cov ** 2).mean())
    if "supervised" in w:
        sl = cfg.slices["supervised"]
        add("supervised", _mse(_slice(state, sl), _t(batch["gt_states"])))
    if "episode-prior" in w:
        # documented stable BCE; discriminator at weight 1, encoder fooling
        # (flipped labels) at the loss weight
        y = _t(batch["episode_labels"])

        def bce(logits, target):
            return (torch.clamp(logits, min=0) - logits * target
                    + torch.log1p(torch.exp(-logits.abs()))).mean()
        d_loss = bce(out["disc_logits_d"], y)
        e_loss = bce(out["disc_logits_e"], 1.0 - y)
        metrics["episode-prior/discriminator"] = float(d_loss.detach())
        metrics["episode-prior"] = float(e_loss.detach())
        total = total + d_loss + w["episode-prior"] * e_loss
    if cfg.l1_reg > 0 or cfg.l2_reg > 0:
        # parameter regularizers: size-normalized over EVERY trainable
        # tensor (sum|p|/n, sum p**2/n) — transpose-invariant, so the
        # torch-stored kernel layout does not matter
        assert params, "pass params=list(mirror.parameters()) for l1/l2"
        n = float(sum(p.numel() for p in params))
        if cfg.l1_reg > 0:
            l1 = sum(p.abs().sum() for p in params) / n
            metrics["l1_reg"] = float(l1.detach())
            total = total + cfg.l1_reg * l1
        if cfg.l2_reg > 0:
            l2 = sum((p ** 2).sum() for p in params) / n
            metrics["l2_reg"] = float(l2.detach())
            total = total + cfg.l2_reg * l2
    metrics["total"] = float(total.detach())
    return total, metrics


def assert_params_close(flax_params: Dict, mirror: TorchSRLMirror,
                        rtol: float, atol: float) -> None:
    """Every mirrored tensor agrees with its flax counterpart post-step."""
    assert mirror.registry, "empty registry"
    for path, param, transposed in mirror.registry:
        node = flax_params
        for k in path:
            node = node[k]
        got = param.detach().numpy()
        if transposed == "conv":  # torch OIHW -> flax HWIO
            got = got.transpose(2, 3, 1, 0)
        elif transposed:
            got = got.T
        np.testing.assert_allclose(
            np.asarray(node), got, rtol=rtol, atol=atol,
            err_msg="/".join(path))


def assert_batch_stats_close(flax_stats: Dict,
                             cnn: "_TorchCustomCNN") -> None:
    """Post-run BatchNorm running buffers agree with torch's (decision #23).
    Both buffers now follow torch's exact semantics — the running update
    folds the UNBIASED batch variance (srl_zoo_tpu/models/batchnorm.py,
    round-5 final session; the flax-biased-fold gap this assertion used to
    allow for via a 1.5/(n-1) band is gone) — so mean AND var are held to
    the same float-cascade tolerance."""
    for i, bn in enumerate(cnn.bns):
        st = flax_stats[f"BatchNorm_{i}"]
        # rtol 5e-3: after several SGD steps the frameworks' weights differ
        # by float noise (params held to 1e-3), which cascades into the
        # batch stats folded into the running averages — measured <=2.4e-3
        # relative over 4 steps. Still discriminating: a momentum error
        # (0.99 vs 0.9) scales the whole buffer ~10x, and a regression to
        # the biased fold shows up at ~1/(n-1) ~ 7e-2 on the deepest block
        # (n = B*H*W = 16 there; 256 and 4096 on the earlier blocks).
        np.testing.assert_allclose(
            np.asarray(st["mean"]), bn.running_mean.detach().numpy(),
            rtol=5e-3, atol=1e-4, err_msg=f"BatchNorm_{i} running mean")
        n = cnn.bn_counts[i]
        assert n > 1, "forward never ran"
        np.testing.assert_allclose(
            np.asarray(st["var"]), bn.running_var.detach().numpy(),
            rtol=5e-3, atol=1e-4,
            err_msg=f"BatchNorm_{i} running var (n={n})")
