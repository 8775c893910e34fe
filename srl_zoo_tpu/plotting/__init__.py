"""Plotting: representation scatter, correlation heatmap, loss curves.

Reference layer L5 (SURVEY.md §2.13): plotting/representation_plot.py,
plotting/losses_plot.py. Host-side matplotlib (Agg), unchanged in spirit.
"""

from srl_zoo_tpu.plotting.representation_plot import (  # noqa: F401
    plot_correlation, plot_representation)
from srl_zoo_tpu.plotting.losses_plot import plot_losses  # noqa: F401
