"""Latent-space exploration: decode sweeps of each state dimension.

Reference: srl-zoo's latent exploration tool (enjoy_latent — interactive
sliders moving one latent dim at a time and showing the decoded frame).
Headless rebuild: for each of the first K state dims, sweep the dim across
+/- 3 sigma of the dataset's state distribution (anchored at the mean state)
and write the decoded frames as one image-grid row per dim.

Works for any run whose loss set includes a decoder (autoencoder/vae/dae).

Usage: python -m srl_zoo_tpu.evaluation.enjoy_latent --log-folder logs/<run>
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from srl_zoo_tpu.config import SRLConfig
from srl_zoo_tpu.models.srl_modules import SRLModules, slice_state
from srl_zoo_tpu.ops.preproc import denormalize_images
from srl_zoo_tpu.training import checkpoint as ckpt
from srl_zoo_tpu.utils import printGreen


def decode_states(cfg: SRLConfig, variables, states: np.ndarray) -> np.ndarray:
    """states (B, state_dim) -> decoded frames (B, H, W, C) in [0, 1]."""
    model = SRLModules(cfg)

    def decode(variables, z):
        recon = model.apply(variables, slice_state(z, model_recon_slice(cfg)),
                            method=_decode_method)
        return denormalize_images(recon, cfg.normalize_mode)

    return np.asarray(jax.device_get(
        jax.jit(decode)(variables, np.asarray(states, np.float32))))


def model_recon_slice(cfg: SRLConfig):
    from srl_zoo_tpu.config import RECONSTRUCTION_LOSSES
    for name in cfg.loss_names:
        if name in RECONSTRUCTION_LOSSES:
            return cfg.slices[name]
    raise ValueError("This run has no decoder (no reconstruction loss) — "
                     "latent exploration needs autoencoder/vae/dae")


def _decode_method(module: SRLModules, z_slice):
    return module.decoder(z_slice, train=False)


def latent_sweep_grid(cfg: SRLConfig, variables, states: np.ndarray,
                      n_dims: int = 8, n_steps: int = 7) -> np.ndarray:
    """(n_dims, n_steps, H, W, C) decoded sweep around the mean state.
    All sweeps are decoded in ONE batched call (one compile, one dispatch)."""
    mean = states.mean(axis=0)
    std = states.std(axis=0) + 1e-8
    n_dims = min(n_dims, cfg.state_dim)
    sweeps = np.tile(mean, (n_dims * n_steps, 1))
    for d in range(n_dims):
        rows = slice(d * n_steps, (d + 1) * n_steps)
        sweeps[rows, d] = mean[d] + np.linspace(-3, 3, n_steps) * std[d]
    decoded = decode_states(cfg, variables, sweeps)
    return decoded.reshape((n_dims, n_steps) + decoded.shape[1:])


def main(argv=None) -> str:
    from srl_zoo_tpu.utils.platform import honor_env_platform
    honor_env_platform()
    p = argparse.ArgumentParser(description="Decode latent-dimension sweeps "
                                            "(reference: enjoy_latent)")
    p.add_argument("--log-folder", type=str, required=True)
    p.add_argument("--n-dims", type=int, default=8)
    p.add_argument("--n-steps", type=int, default=7)
    args = p.parse_args(argv)

    from srl_zoo_tpu.plotting.agg import agg_subplots

    cfg = SRLConfig.load(args.log_folder)
    _, state, _ = ckpt.load_srl_model(args.log_folder, cfg)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    sr = np.load(os.path.join(args.log_folder, "states_rewards.npz"))

    grid = latent_sweep_grid(cfg, variables, sr["states"],
                             args.n_dims, args.n_steps)
    n_dims, n_steps = grid.shape[:2]
    fig, axes = agg_subplots(n_dims, n_steps,
                             figsize=(1.6 * n_steps, 1.6 * n_dims))
    # not atleast_2d: with n_steps=1 it yields the TRANSPOSED (1, n_dims)
    # and axes[d, s] walks off axis 0 — reshape to the true grid instead
    axes = np.asarray(axes).reshape(n_dims, n_steps)
    for d in range(n_dims):
        for s in range(n_steps):
            axes[d, s].imshow(grid[d, s, :, :, :3])
            axes[d, s].axis("off")
        axes[d, 0].set_ylabel(f"dim {d}", fontsize=8)
    fig.suptitle("Latent sweeps (rows: state dims, cols: -3sigma..+3sigma)")
    fig.tight_layout()
    out = os.path.join(args.log_folder, "latent_sweeps.png")
    fig.savefig(out, dpi=90)
    printGreen(f"Saved {out}")
    return out


if __name__ == "__main__":
    main()
