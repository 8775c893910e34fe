"""Ground-truth correlation (GTC).

Reference: plotting/representation_plot.py ``plotCorrelation`` (--correlation
flag) — the Pearson correlation matrix between learned state dims and
ground-truth dims. The scalar GTC score reported here is the mean over
ground-truth dims of the max |corr| across learned dims (how well each true
factor is captured by SOME learned dim).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def correlation_matrix(learned_states: np.ndarray,
                       ground_truth_states: np.ndarray) -> np.ndarray:
    """(D_learned, D_gt) Pearson correlation matrix."""
    s = np.asarray(learned_states, np.float64)
    g = np.asarray(ground_truth_states, np.float64)
    s = s - s.mean(axis=0)
    g = g - g.mean(axis=0)
    s_std = s.std(axis=0)
    g_std = g.std(axis=0)
    s_std[s_std == 0] = 1.0
    g_std[g_std == 0] = 1.0
    corr = (s.T @ g) / (len(s) * np.outer(s_std, g_std))
    return corr


def ground_truth_correlation(learned_states: np.ndarray,
                             ground_truth_states: np.ndarray
                             ) -> Tuple[float, np.ndarray]:
    """Returns (gtc_score, correlation matrix)."""
    corr = correlation_matrix(learned_states, ground_truth_states)
    score = float(np.mean(np.max(np.abs(corr), axis=0)))
    return score, corr
