"""Backend-independent figure factory for every FILE plot.

The interactive LiveView legitimately switches the process-global matplotlib
backend to TkAgg. File plots (per-epoch exports, correlation heatmaps, loss
curves, KNN grids) must NOT care: built through the object API with an
explicit Agg canvas, they render identically whatever the global backend is,
and a dead X connection mid-run can only take down the live window, never
the training loop's artifact writers."""

from __future__ import annotations

import matplotlib
from matplotlib.backends.backend_agg import FigureCanvasAgg
from matplotlib.figure import Figure

import mpl_toolkits.mplot3d  # noqa: F401 — registers the '3d' projection

matplotlib.use("Agg", force=False)  # default for anything else in-process


def agg_figure(**kwargs) -> Figure:
    """A Figure with its own Agg canvas — savefig works, no pyplot state."""
    fig = Figure(**kwargs)
    FigureCanvasAgg(fig)
    return fig


def agg_subplots(nrows: int = 1, ncols: int = 1, **kwargs):
    """plt.subplots equivalent on an explicit Agg canvas."""
    fig = agg_figure(**kwargs)
    axes = fig.subplots(nrows, ncols)
    return fig, axes
