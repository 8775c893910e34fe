"""Reward-prediction probe: how informative are the learned states?

Reference: evaluation/predict_reward.py — train a small classifier on the
learned states to predict the (discretized) reward and report accuracy.
Host-side sklearn, exactly as the reference keeps it.

Usage: python -m srl_zoo_tpu.evaluation.predict_reward --log-folder logs/...
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

from srl_zoo_tpu.data.schema import discretize_rewards
from srl_zoo_tpu.utils import printGreen


def predict_reward_accuracy(states: np.ndarray, rewards: np.ndarray,
                            test_size: float = 0.2, seed: int = 0) -> float:
    from sklearn.linear_model import LogisticRegression
    from sklearn.model_selection import train_test_split

    classes = discretize_rewards(rewards)
    if len(np.unique(classes)) < 2:
        return 1.0  # degenerate dataset: single reward class
    x_tr, x_te, y_tr, y_te = train_test_split(
        states, classes, test_size=test_size, random_state=seed,
        stratify=classes if np.min(np.bincount(classes)) > 1 else None)
    clf = LogisticRegression(max_iter=2000)
    clf.fit(x_tr, y_tr)
    return float(clf.score(x_te, y_te))


def main(argv=None) -> float:
    from srl_zoo_tpu.utils.platform import honor_env_platform
    honor_env_platform()
    p = argparse.ArgumentParser(description="Train a reward classifier on "
                                            "learned states")
    p.add_argument("--log-folder", type=str, required=True)
    p.add_argument("--test-size", type=float, default=0.2)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    sr = np.load(os.path.join(args.log_folder, "states_rewards.npz"))
    acc = predict_reward_accuracy(sr["states"], sr["rewards"],
                                  args.test_size, args.seed)
    printGreen(f"Reward prediction accuracy: {acc:.4f}")
    with open(os.path.join(args.log_folder, "reward_accuracy.json"), "w") as f:
        json.dump({"accuracy": acc}, f)
    return acc


if __name__ == "__main__":
    main()
