"""Preprocessing: raw recorded episodes -> the training npz schema.

Reference layer L1 (SURVEY.md §2.4): preprocessing/preprocess.py +
preprocessing/utils.py. Normalization itself moved on-device
(ops/preproc.py); this package handles the offline dataset conversion and
the TPU-native frames.npy decode cache.
"""

from srl_zoo_tpu.preprocessing.preprocess import (  # noqa: F401
    build_frames_cache, preprocess_folder)
