"""Evaluation: KNN-MSE, ground-truth correlation, state export, reward probe.

Reference layer L5 (SURVEY.md §2.11/§2.12): evaluation/knn_images.py,
evaluation/predict_dataset.py, evaluation/predict_reward.py.
"""

from srl_zoo_tpu.evaluation.knn import knn_mse  # noqa: F401
from srl_zoo_tpu.evaluation.gtc import ground_truth_correlation  # noqa: F401
