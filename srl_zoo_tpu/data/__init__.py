"""Data layer: npz dataset schema, synthetic dataset, samplers, host loader.

Reference layer L0/L1 (SURVEY.md §1): ``data/<dataset>/preprocessed_data.npz``
(actions, rewards, episode_starts) + ``ground_truth.npz`` (ground-truth states,
image paths) + per-episode ``record_*/frame*.jpg`` images
(reference: preprocessing/preprocess.py, preprocessing/data_loader.py).
"""

from srl_zoo_tpu.data.schema import Dataset, load_dataset  # noqa: F401
from srl_zoo_tpu.data.loader import DataLoader  # noqa: F401
