"""Representation scatter plots + correlation heatmap.

Reference: plotting/representation_plot.py — 2D/3D scatter of learned states
colored by reward (PCA projection when state_dim > 3, used live during
training and from the CLI) and the --correlation heatmap.
"""

from __future__ import annotations

import os
from typing import Optional

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

from srl_zoo_tpu.plotting.agg import agg_figure, agg_subplots  # noqa: E402


def _project(states: np.ndarray, max_dim: int = 3) -> np.ndarray:
    """PCA-project to <= max_dim dims when needed (reference behavior for
    state_dim > 3)."""
    if states.shape[1] <= max_dim:
        return states
    centered = states - states.mean(axis=0)
    _, _, vt = np.linalg.svd(centered, full_matrices=False)
    return centered @ vt[:max_dim].T


def _draw_states(fig, states: np.ndarray, rewards: np.ndarray, title: str):
    """Render the 1D/2D/3D reward-colored scatter into ``fig`` (shared by the
    file plots and the interactive LiveView)."""
    proj = _project(np.asarray(states))
    rewards = np.asarray(rewards).reshape(-1)
    if proj.shape[1] >= 3:
        ax = fig.add_subplot(111, projection="3d")
        sc = ax.scatter(proj[:, 0], proj[:, 1], proj[:, 2], c=rewards,
                        cmap="coolwarm", s=6)
    elif proj.shape[1] == 2:
        ax = fig.add_subplot(111)
        sc = ax.scatter(proj[:, 0], proj[:, 1], c=rewards, cmap="coolwarm", s=6)
    else:
        ax = fig.add_subplot(111)
        sc = ax.scatter(np.arange(len(proj)), proj[:, 0], c=rewards,
                        cmap="coolwarm", s=6)
    fig.colorbar(sc, ax=ax, label="reward")
    ax.set_title(title)
    fig.tight_layout()


def plot_representation(states: np.ndarray, rewards: np.ndarray,
                        save_path: Optional[str] = None,
                        title: str = "Learned state representation"):
    """Scatter of learned states colored by reward; 1D/2D/3D aware."""
    # object-API Agg figure: file plots must render even when LiveView has
    # switched the global backend to TkAgg and the X connection later died
    fig = agg_figure(figsize=(6, 5))
    _draw_states(fig, states, rewards, title)
    if save_path:
        os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
        fig.savefig(save_path, dpi=100)
    return fig


class LiveView:
    """Interactive live representation window (reference:
    plotting/representation_plot.py's plt.ion() figure updated during
    training). Created only when a GUI backend is actually usable —
    ``create()`` returns None on headless hosts, which keep the
    plots/live.html auto-refresh view instead (both are wired behind
    train.py --plot-every)."""

    def __init__(self):
        plt.ion()
        self.fig = plt.figure(figsize=(6, 5))
        self.fig.canvas.manager.set_window_title("SRL live states")

    @classmethod
    def create(cls) -> Optional["LiveView"]:
        import sys
        if sys.platform not in ("darwin", "win32") \
                and not os.environ.get("DISPLAY") \
                and not os.environ.get("WAYLAND_DISPLAY"):
            return None  # headless: no window server to draw on
        prev = matplotlib.get_backend()
        try:
            plt.switch_backend("TkAgg")
            return cls()
        except Exception:
            # switch_backend only imports tkinter; a dead X connection
            # (stale DISPLAY forward) surfaces as TclError from plt.figure()
            # AFTER the global backend already changed — restore it or every
            # later file plot (epoch_callback, export) inherits the broken
            # TkAgg and kills the run
            try:
                plt.switch_backend(prev)
            except Exception:
                plt.switch_backend("Agg")
            return None  # no usable GUI — fall back to the html view

    def update(self, states: np.ndarray, rewards: np.ndarray,
               title: str) -> None:
        if self.fig is None:
            return
        try:
            self.fig.clf()
            _draw_states(self.fig, states, rewards, title)
            self.fig.canvas.draw_idle()
            plt.pause(0.001)  # hand the GUI event loop a tick
        except Exception:
            # the user closed the window (draw on a destroyed Tk canvas
            # raises) — a cosmetic view must never abort a training run;
            # go dark and leave the html view as the survivor
            self.close()

    def close(self) -> None:
        if self.fig is None:
            return
        try:
            plt.ioff()
            plt.close(self.fig)
        except Exception:
            pass
        self.fig = None


def main(argv=None):
    from srl_zoo_tpu.utils.platform import honor_env_platform
    honor_env_platform()  # JAX_PLATFORMS must be binding in every CLI
    """CLI: plot a saved run's states (reference:
    plotting/representation_plot.py with --data-folder/--correlation)."""
    import argparse
    import json

    p = argparse.ArgumentParser(description="Plot learned states")
    p.add_argument("--log-folder", type=str, required=True,
                   help="Run folder containing states_rewards.npz")
    p.add_argument("--correlation", action="store_true",
                   help="Also plot the ground-truth correlation heatmap")
    p.add_argument("--data-folder", type=str, default="",
                   help="Dataset folder (defaults to exp_config.json)")
    args = p.parse_args(argv)

    sr = np.load(os.path.join(args.log_folder, "states_rewards.npz"))
    out = os.path.join(args.log_folder, "states.png")
    plot_representation(sr["states"], sr["rewards"], out)
    print(f"Saved {out}")
    if args.correlation:
        from srl_zoo_tpu.data.schema import load_dataset
        from srl_zoo_tpu.evaluation.gtc import ground_truth_correlation
        data_folder = args.data_folder
        if not data_folder:
            with open(os.path.join(args.log_folder, "exp_config.json")) as f:
                data_folder = json.load(f)["data-folder"]
        ds = load_dataset(data_folder)
        gtc, corr = ground_truth_correlation(sr["states"],
                                             ds.ground_truth_states)
        out = os.path.join(args.log_folder, "correlation.png")
        plot_correlation(corr, out)
        print(f"GTC score: {gtc:.4f}\nSaved {out}")


def plot_correlation(corr: np.ndarray, save_path: Optional[str] = None,
                     title: str = "Learned vs ground-truth correlation"):
    """Heatmap of the (D_learned, D_gt) correlation matrix
    (reference: plotCorrelation / --correlation)."""
    fig, ax = agg_subplots(figsize=(6, 5))
    # nearest (not interpolated): gt typically has 2-3 dims, so smoothing
    # smears the few columns into unreadable gradients
    im = ax.imshow(np.abs(corr), cmap="viridis", vmin=0, vmax=1,
                   aspect="auto", interpolation="nearest")
    ax.set_xlabel("ground-truth dim")
    ax.set_xticks(np.arange(corr.shape[1]))
    ax.set_ylabel("learned state dim")
    ax.set_title(title)
    fig.colorbar(im, ax=ax, label="|Pearson r|")
    fig.tight_layout()
    if save_path:
        os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
        fig.savefig(save_path, dpi=100)
    return fig


if __name__ == "__main__":
    main()
