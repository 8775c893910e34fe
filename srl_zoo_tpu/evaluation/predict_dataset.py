"""Re-load a trained model and export states for a whole dataset.

Reference: evaluation/predict_dataset.py — rebuild the model from
exp_config.json + saved weights, run the encoder over every frame, save the
npz of states (the hand-off artifact for downstream RL / robotics-rl-srl).

Usage: python -m srl_zoo_tpu.evaluation.predict_dataset \
           --log-folder logs/... [--data-folder data/...] [-n N]
"""

from __future__ import annotations

import argparse

import numpy as np

from srl_zoo_tpu.data.schema import load_dataset, save_states_rewards
from srl_zoo_tpu.training.learner import SRL4robotics
from srl_zoo_tpu.utils import printGreen


def main(argv=None) -> str:
    from srl_zoo_tpu.utils.platform import honor_env_platform
    honor_env_platform()
    p = argparse.ArgumentParser(description="Predict states for a dataset "
                                            "with a trained model")
    p.add_argument("--log-folder", type=str, required=True)
    p.add_argument("--data-folder", type=str, default="",
                   help="Defaults to the training dataset from exp_config")
    p.add_argument("-n", "--n-samples", type=int, default=-1,
                   help="Only predict the first N samples (-1 = all)")
    args = p.parse_args(argv)

    learner = SRL4robotics.load(args.log_folder)
    data_folder = args.data_folder or learner.cfg.data_folder
    dataset = load_dataset(data_folder)

    indices = None
    if args.n_samples > 0:
        indices = np.arange(min(args.n_samples, dataset.n_samples),
                            dtype=np.int32)
    states = learner.predict_states(dataset, indices)
    rewards = dataset.rewards if indices is None else dataset.rewards[indices]
    path = save_states_rewards(args.log_folder, states, rewards)
    printGreen(f"Saved {path} ({states.shape})")
    return path


if __name__ == "__main__":
    main()
