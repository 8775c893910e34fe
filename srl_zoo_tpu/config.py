"""Experiment configuration: loss flags, state splits, exp_config.json.

Reference surface: ``train.py`` argparse of araffin/srl-zoo — in particular the
``--losses name[:weight[:split_dim]]`` syntax and the per-run ``exp_config.json``
artifact (reference: train.py, pipeline.py). The rebuild keeps that surface but
backs it with a frozen dataclass that the jitted train step can treat as static.

Split semantics ("SRL Splits", reference: models/modules.py SRLModulesSplit):
each loss may claim a contiguous slice of the state vector. A split dim of -1
means "share the slice of the previous loss in the list" (or the full state
when no loss declares a split). The declared dims must sum to ``state_dim``.
The mount was empty at survey time (SURVEY.md provenance warning) so the -1
semantics are an explicit, documented design decision [UPSTREAM-MEM M].
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, List, Optional, Tuple

VALID_LOSSES = (
    "autoencoder",
    "vae",
    "dae",
    "perceptual",
    "priors",
    "forward",
    "inverse",
    "reward",
    "triplet",
    "episode-prior",
    "reward-prior",
    "supervised",
    "random",
)

VALID_MODELS = ("custom_cnn", "resnet", "mlp", "linear")

# Losses that require a decoder head.
RECONSTRUCTION_LOSSES = ("autoencoder", "vae", "dae", "perceptual")
# Losses that need (obs, next_obs) pairs.
# Losses whose formulas consume the NEXT state s' (losses/registry.py +
# models/srl_modules.py heads). Triplet and episode-prior do NOT: triplet
# pairs (anchor, second view, negative) and episode-prior pairs states
# within the batch — encoding next_obs for them would be a wasted full
# encoder pass per step (review r2).
NEXT_STATE_LOSSES = ("priors", "forward", "inverse", "reward")


def parse_loss_arguments(loss_args: List[str], state_dim: int
                         ) -> Tuple[Dict[str, float], Dict[str, int]]:
    """Parse ``--losses`` tokens of the form ``name[:weight[:split_dim]]``.

    Returns ``(losses, split_dims)`` where ``losses`` maps loss name -> weight
    (default 1.0) and ``split_dims`` maps loss name -> declared split size
    (-1 = share previous slice / no split). Mirrors the reference train.py
    loss-string parsing.
    """
    losses: Dict[str, float] = {}
    split_dims: Dict[str, int] = {}
    for token in loss_args:
        parts = token.split(":")
        name = parts[0]
        if name not in VALID_LOSSES:
            raise ValueError(
                f"Unknown loss '{name}'. Valid losses: {', '.join(VALID_LOSSES)}")
        if name in losses:
            raise ValueError(f"Duplicate loss '{name}' in --losses")
        weight = 1.0
        dim = -1
        if len(parts) >= 2 and parts[1] != "":
            weight = float(parts[1])
        if len(parts) >= 3:
            dim = int(parts[2])
        if len(parts) > 3:
            raise ValueError(f"Malformed loss token '{token}' "
                             "(expected name[:weight[:split_dim]])")
        losses[name] = weight
        split_dims[name] = dim

    declared = [d for d in split_dims.values() if d >= 0]
    if declared and sum(declared) != state_dim:
        raise ValueError(
            f"Declared split dimensions {declared} sum to {sum(declared)} "
            f"but --state-dim is {state_dim}")
    return losses, split_dims


def compute_split_slices(losses: Dict[str, float], split_dims: Dict[str, int],
                         state_dim: int) -> Dict[str, Tuple[int, int]]:
    """Resolve per-loss ``(start, size)`` slices of the state vector.

    With no declared splits every loss sees the full state. Otherwise losses
    are laid out in declaration order; ``-1`` entries inherit the slice of the
    previous loss (the full state if they come first).
    """
    if not any(d >= 0 for d in split_dims.values()):
        return {name: (0, state_dim) for name in losses}
    slices: Dict[str, Tuple[int, int]] = {}
    offset = 0
    prev: Tuple[int, int] = (0, state_dim)
    for name in losses:
        dim = split_dims.get(name, -1)
        if dim >= 0:
            slices[name] = (offset, dim)
            prev = (offset, dim)
            offset += dim
        else:
            slices[name] = prev
    if offset != state_dim:
        raise ValueError(
            f"Declared split dimensions sum to {offset} but state_dim is "
            f"{state_dim}: {dict(split_dims)}")
    return slices


@dataclasses.dataclass(frozen=True)
class SRLConfig:
    """Static, hashable experiment config (safe to close over in jit)."""

    state_dim: int = 2
    model_type: str = "custom_cnn"
    losses: Tuple[Tuple[str, float], ...] = (("autoencoder", 1.0),)
    split_dims: Tuple[Tuple[str, int], ...] = (("autoencoder", -1),)
    n_actions: int = 4
    n_reward_classes: int = 3
    img_height: int = 224
    img_width: int = 224
    multi_view: bool = False
    batch_size: int = 32
    epochs: int = 30
    learning_rate: float = 5e-3
    # Accumulate gradients over this many minibatches before each optimizer
    # update (optax.MultiSteps): effective batch = batch_size * grad_accum
    # without the activation-memory cost of the larger batch. 1 = off.
    grad_accum: int = 1
    seed: int = 1
    val_size: float = 0.2
    training_set_size: int = -1
    l1_reg: float = 0.0
    l2_reg: float = 0.0
    beta: float = 1.0
    occlusion_percentage: float = 0.5
    # DAE corruption: "occlusion" (random square patch) or "gaussian"
    # (additive noise via the GaussianNoise layer of the reference's
    # models/custom_layers.py)
    noise_type: str = "occlusion"
    noise_std: float = 0.2
    balanced_sampling: bool = False
    normalize_mode: str = "tf"  # "tf" -> [-1, 1]; "image_net" -> mean/std
    compute_dtype: str = "float32"  # or "bfloat16" for MXU-friendly compute
    inverse_model_type: str = "linear"  # "linear" | "mlp"
    # Episode-prior discriminator optimizer: "shared" trains it through the
    # same Adam step as the encoder (round-1/2 behavior); "separate" gives
    # the discriminator subtree its own independent Adam moments
    # (optax.multi_transform) — the diff-ready alternative for
    # docs/DESIGN_DECISIONS.md #4, which suspects upstream used a separate
    # torch optimizer (VERDICT r2 next #9).
    episode_prior_optimizer: str = "shared"
    path_to_dae: str = ""
    # torch resnet18 state_dict (.npz or .pth) to port into the encoder
    # (reference: torchvision ImageNet-pretrained ResNet-18)
    pretrained_weights: str = ""
    data_folder: str = ""
    log_folder: str = ""
    num_cpu: int = 4
    # HBM-resident dataset cache: "auto" caches when the frame store fits on
    # device (data/device_cache.py), "on" requires it, "off" streams batches.
    device_cache: str = "auto"
    # Streaming-mode device-side double buffering: issue batch k+1's
    # host->device transfer before dispatching step k (one extra batch of
    # HBM; numerically identical — pure scheduling). OFF by default on the
    # honest measurement: an INTERLEAVED A/B on the real chip (docs/PERF.md
    # r3) shows throughput parity through this serializing tunnel link
    # (ratios 0.91-1.35 across reps, i.e. inside link variance — a naive
    # sequential A/B had shown "2x" purely from link drift). Overlap does
    # reduce step-time variance and is expected to win on PCIe hosts with
    # independent DMA engines: turn on with --stream-overlap there
    # (VERDICT r2 next #10).
    stream_overlap: bool = False
    # Hybrid-cache residency rotation (data/hybrid.py): the hot set is a
    # window over the index space that advances by the cold-set size every
    # epoch (entering rows adopted from the bytes that stream anyway), so
    # triplet negatives / early-epoch samples cover the whole dataset across
    # epochs instead of a fixed temporal prefix (VERDICT r3 weak #1). OFF
    # reproduces the round-3 static prefix, kept for A/B (RESULTS.md).
    hybrid_rotation: bool = True
    # BatchNorm running-average momentum, FLAX convention
    # (ra = m*ra + (1-m)*batch_stat). Default 0.9 = torch's BatchNorm2d
    # default (torch momentum 0.1 on the complementary convention), which is
    # what the reference's models inherit — flax's own default (0.99) tracks
    # batch statistics ~10x slower, visibly shifting early-epoch VAL metrics
    # and therefore best-model selection on short runs. Rounds 1-4 trained
    # at the flax default; design decision #23 + the r5 torch-validated BN
    # parity test (tests/test_torch_parity.py) cover the flip.
    bn_momentum: float = 0.9

    def __post_init__(self):
        if self.device_cache not in ("auto", "on", "off", "hybrid",
                                     "sharded"):
            raise ValueError(f"Unknown device_cache mode "
                             f"'{self.device_cache}' (expected auto/on/off/"
                             "hybrid/sharded)")
        if self.model_type not in VALID_MODELS:
            raise ValueError(f"Unknown model type '{self.model_type}'. "
                             f"Valid: {', '.join(VALID_MODELS)}")
        if self.grad_accum < 1:
            raise ValueError(f"grad_accum must be >= 1, got "
                             f"{self.grad_accum}")
        if self.episode_prior_optimizer not in ("shared", "separate"):
            raise ValueError(
                f"Unknown episode_prior_optimizer "
                f"'{self.episode_prior_optimizer}' (expected shared/separate)")
        if not 0.0 <= self.bn_momentum < 1.0:
            raise ValueError(f"bn_momentum must be in [0, 1), got "
                             f"{self.bn_momentum}")
        if self.normalize_mode not in ("tf", "image_net"):
            raise ValueError(f"Unknown normalize mode '{self.normalize_mode}'"
                             " (expected 'tf' or 'image_net')")
        if self.normalize_mode == "image_net" and self.use_decoder:
            # the decoder's tanh output lives in [-1, 1] ("tf" range);
            # image_net-normalized targets span ~[-2.1, 2.6] and are
            # unreachable — reject instead of silently training a loss
            # that cannot fit (ADVICE r1)
            recon = [n for n in self.loss_names
                     if n in RECONSTRUCTION_LOSSES]
            raise ValueError(
                f"Reconstruction losses {recon} require normalize_mode='tf' "
                "(the decoder's tanh output range); got 'image_net'")
        # multiple reconstruction losses must decode the SAME state slice
        # (one decoder): validate at config time, not at model-setup time
        # (found by the loss-combination fuzz test)
        recon_slices = {n: self.slices[n] for n in self.loss_names
                        if n in RECONSTRUCTION_LOSSES}
        if len(set(recon_slices.values())) > 1:
            raise ValueError(
                "Multiple reconstruction losses must share one state slice "
                f"(got {recon_slices}); give later ones split dim -1")

    # ---- derived helpers (all static) -------------------------------------
    @property
    def loss_dict(self) -> Dict[str, float]:
        return dict(self.losses)

    @property
    def split_dict(self) -> Dict[str, int]:
        return dict(self.split_dims)

    @property
    def loss_names(self) -> Tuple[str, ...]:
        return tuple(name for name, _ in self.losses)

    @property
    def slices(self) -> Dict[str, Tuple[int, int]]:
        return compute_split_slices(self.loss_dict, self.split_dict, self.state_dim)

    @property
    def n_channels(self) -> int:
        """Encoder input channels: two stacked views (6) for multi-view SRL,
        but 3 for triplet (the embedding net runs per view; reference:
        models/triplet.py vs the 6-channel stacks of data_loader.py)."""
        if self.multi_view and not self.use_triplet:
            return 6
        return 3

    @property
    def use_decoder(self) -> bool:
        return any(n in RECONSTRUCTION_LOSSES for n in self.loss_names)

    @property
    def use_vae(self) -> bool:
        return "vae" in self.loss_names

    @property
    def use_forward(self) -> bool:
        return "forward" in self.loss_names

    @property
    def use_inverse(self) -> bool:
        return "inverse" in self.loss_names

    @property
    def use_reward(self) -> bool:
        return "reward" in self.loss_names

    @property
    def use_triplet(self) -> bool:
        return "triplet" in self.loss_names

    @property
    def use_episode_prior(self) -> bool:
        return "episode-prior" in self.loss_names

    @property
    def use_priors(self) -> bool:
        return "priors" in self.loss_names

    @property
    def use_dae(self) -> bool:
        return "dae" in self.loss_names

    @property
    def use_supervised(self) -> bool:
        return "supervised" in self.loss_names

    @property
    def only_random_features(self) -> bool:
        return self.loss_names == ("random",)

    @property
    def needs_next_obs(self) -> bool:
        return any(n in NEXT_STATE_LOSSES for n in self.loss_names)

    def replace(self, **kw) -> "SRLConfig":
        return dataclasses.replace(self, **kw)

    # ---- exp_config.json contract ------------------------------------------
    def to_exp_config(self) -> Dict:
        """Serialize with the reference's kebab-case key style
        (reference: train.py saves exp_config.json into the log folder)."""
        return {
            "batch-size": self.batch_size,
            "beta": self.beta,
            "data-folder": self.data_folder,
            "epochs": self.epochs,
            "learning-rate": self.learning_rate,
            "grad-accum": self.grad_accum,
            "training-set-size": self.training_set_size,
            "log-folder": self.log_folder,
            "model-type": self.model_type,
            "seed": self.seed,
            "state-dim": self.state_dim,
            "losses": {name: w for name, w in self.losses},
            "split-dimensions": {name: d for name, d in self.split_dims},
            "n-actions": self.n_actions,
            "n-reward-classes": self.n_reward_classes,
            "multi-view": self.multi_view,
            "balanced-sampling": self.balanced_sampling,
            "l1-reg": self.l1_reg,
            "l2-reg": self.l2_reg,
            "occlusion-percentage": self.occlusion_percentage,
            "noise-type": self.noise_type,
            "noise-std": self.noise_std,
            "normalize-mode": self.normalize_mode,
            "compute-dtype": self.compute_dtype,
            "inverse-model-type": self.inverse_model_type,
            "episode-prior-optimizer": self.episode_prior_optimizer,
            "path-to-dae": self.path_to_dae,
            "pretrained-weights": self.pretrained_weights,
            "img-shape": [self.img_height, self.img_width, self.n_channels],
            "val-size": self.val_size,
            "num-cpu": self.num_cpu,
            "device-cache": self.device_cache,
            "stream-overlap": self.stream_overlap,
            "hybrid-rotation": self.hybrid_rotation,
            "bn-momentum": self.bn_momentum,
        }

    def save(self, log_folder: str) -> str:
        os.makedirs(log_folder, exist_ok=True)
        path = os.path.join(log_folder, "exp_config.json")
        with open(path, "w") as f:
            # no sort_keys: the order of the losses dict is the split layout
            json.dump(self.to_exp_config(), f, indent=2)
        return path

    @classmethod
    def from_exp_config(cls, cfg: Dict) -> "SRLConfig":
        losses = tuple((k, float(v)) for k, v in cfg["losses"].items())
        raw_splits = cfg.get("split-dimensions", {})
        split_dims = tuple((k, int(raw_splits.get(k, -1))) for k, _ in losses)
        img_shape = cfg.get("img-shape", [224, 224, 3])
        return cls(
            state_dim=int(cfg["state-dim"]),
            model_type=cfg.get("model-type", "custom_cnn"),
            losses=losses,
            split_dims=split_dims,
            n_actions=int(cfg.get("n-actions", 4)),
            n_reward_classes=int(cfg.get("n-reward-classes", 3)),
            img_height=int(img_shape[0]),
            img_width=int(img_shape[1]),
            multi_view=bool(cfg.get("multi-view", False)),
            batch_size=int(cfg.get("batch-size", 32)),
            epochs=int(cfg.get("epochs", 30)),
            learning_rate=float(cfg.get("learning-rate", 5e-3)),
            grad_accum=int(cfg.get("grad-accum", 1)),
            seed=int(cfg.get("seed", 1)),
            val_size=float(cfg.get("val-size", 0.2)),
            training_set_size=int(cfg.get("training-set-size", -1)),
            l1_reg=float(cfg.get("l1-reg", 0.0)),
            l2_reg=float(cfg.get("l2-reg", 0.0)),
            beta=float(cfg.get("beta", 1.0)),
            occlusion_percentage=float(cfg.get("occlusion-percentage", 0.5)),
            noise_type=cfg.get("noise-type", "occlusion"),
            noise_std=float(cfg.get("noise-std", 0.2)),
            balanced_sampling=bool(cfg.get("balanced-sampling", False)),
            normalize_mode=cfg.get("normalize-mode", "tf"),
            compute_dtype=cfg.get("compute-dtype", "float32"),
            inverse_model_type=cfg.get("inverse-model-type", "linear"),
            episode_prior_optimizer=cfg.get("episode-prior-optimizer",
                                            "shared"),
            path_to_dae=cfg.get("path-to-dae", ""),
            pretrained_weights=cfg.get("pretrained-weights", ""),
            data_folder=cfg.get("data-folder", ""),
            log_folder=cfg.get("log-folder", ""),
            num_cpu=int(cfg.get("num-cpu", 4)),
            device_cache=cfg.get("device-cache", "auto"),
            stream_overlap=bool(cfg.get("stream-overlap", False)),
            hybrid_rotation=bool(cfg.get("hybrid-rotation", True)),
            # configs recorded before r5 carry no key: they trained at the
            # then-default flax momentum, and resumed/loaded models keep it
            bn_momentum=float(cfg.get("bn-momentum", 0.99)),
        )

    @classmethod
    def load(cls, log_folder: str) -> "SRLConfig":
        with open(os.path.join(log_folder, "exp_config.json")) as f:
            return cls.from_exp_config(json.load(f))


def build_config(args, losses: Dict[str, float], split_dims: Dict[str, int],
                 n_actions: int, n_reward_classes: int,
                 img_shape: Optional[Tuple[int, int, int]] = None) -> SRLConfig:
    """Assemble an SRLConfig from parsed argparse args (reference: train.py
    buildConfig)."""
    h, w = (img_shape[0], img_shape[1]) if img_shape else (224, 224)
    return SRLConfig(
        state_dim=args.state_dim,
        model_type=args.model_type,
        losses=tuple(losses.items()),
        split_dims=tuple(split_dims.items()),
        n_actions=n_actions,
        n_reward_classes=n_reward_classes,
        img_height=h,
        img_width=w,
        multi_view=getattr(args, "multi_view", False),
        batch_size=args.batch_size,
        epochs=args.epochs,
        learning_rate=args.learning_rate,
        grad_accum=getattr(args, "grad_accum", 1),
        seed=args.seed,
        val_size=args.val_size,
        training_set_size=args.training_set_size,
        l1_reg=getattr(args, "l1_reg", 0.0),
        l2_reg=getattr(args, "l2_reg", 0.0),
        beta=getattr(args, "beta", 1.0),
        occlusion_percentage=getattr(args, "occlusion_percentage", 0.5),
        noise_type=getattr(args, "noise_type", "occlusion"),
        noise_std=getattr(args, "noise_std", 0.2),
        balanced_sampling=getattr(args, "balanced_sampling", False),
        compute_dtype=getattr(args, "dtype", "float32"),
        inverse_model_type=getattr(args, "inverse_model_type", "linear"),
        episode_prior_optimizer=getattr(args, "episode_prior_optimizer",
                                        "shared"),
        path_to_dae=getattr(args, "path_to_dae", "") or "",
        pretrained_weights=getattr(args, "pretrained_weights", "") or "",
        device_cache=getattr(args, "device_cache", "auto"),
        stream_overlap=getattr(args, "stream_overlap", False),
        hybrid_rotation=not getattr(args, "no_hybrid_rotation", False),
        bn_momentum=getattr(args, "bn_momentum", 0.9),
        data_folder=args.data_folder,
        log_folder=getattr(args, "log_folder", ""),
        num_cpu=getattr(args, "num_cpu", 4),
    )
