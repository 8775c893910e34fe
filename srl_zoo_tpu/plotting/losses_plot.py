"""Loss-curve plots from the saved loss_history.npz.

Reference: plotting/losses_plot.py — plots per-loss training curves from the
npz history the learner writes.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from srl_zoo_tpu.plotting.agg import agg_subplots


def plot_losses(history_path: str, save_path: Optional[str] = None):
    """Plot every train/val series in a loss_history.npz."""
    data = np.load(history_path)
    epochs = data["epoch"] if "epoch" in data else None
    fig, ax = agg_subplots(figsize=(7, 5))
    for key in sorted(data.files):
        if key == "epoch" or key.endswith("/l1_reg"):
            continue
        series = data[key]
        if series.ndim != 1 or not np.issubdtype(series.dtype, np.number):
            continue
        x = epochs if epochs is not None and len(epochs) == len(series) \
            else np.arange(len(series))
        ax.plot(x, series, label=key, linewidth=1.2)
    ax.set_xlabel("epoch")
    ax.set_ylabel("loss")
    ax.set_yscale("symlog")
    ax.legend(fontsize=7, ncols=2)
    ax.set_title("Training losses")
    fig.tight_layout()
    if save_path:
        os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
        fig.savefig(save_path, dpi=100)
    return fig


def main(argv=None):
    from srl_zoo_tpu.utils.platform import honor_env_platform
    honor_env_platform()  # JAX_PLATFORMS must be binding in every CLI
    import argparse
    p = argparse.ArgumentParser(description="Plot loss curves "
                                "(reference: plotting/losses_plot.py)")
    p.add_argument("--log-folder", type=str, required=True)
    args = p.parse_args(argv)
    history = os.path.join(args.log_folder, "loss_history.npz")
    out = os.path.join(args.log_folder, "losses.png")
    plot_losses(history, out)
    print(f"Saved {out}")


if __name__ == "__main__":
    main()
