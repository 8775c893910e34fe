"""KNN-MSE evaluation CLI.

Reference: evaluation/knn_images.py — loads states_rewards.npz + ground truth,
computes KNN-MSE (neighbors in LEARNED space, MSE in GROUND-TRUTH space) and
saves nearest-neighbor image grids.

Usage: python -m srl_zoo_tpu.evaluation.knn_images --log-folder logs/... \
           [--data-folder data/...] [-k 5] [--n-samples 100]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

from srl_zoo_tpu.data.schema import load_dataset
from srl_zoo_tpu.evaluation.knn import knn_mse, save_neighbor_grids
from srl_zoo_tpu.utils import printGreen


def main(argv=None) -> float:
    from srl_zoo_tpu.utils.platform import honor_env_platform
    honor_env_platform()
    p = argparse.ArgumentParser(description="KNN-MSE evaluation")
    p.add_argument("--log-folder", type=str, required=True)
    p.add_argument("--data-folder", type=str, default="",
                   help="Defaults to the data folder in exp_config.json")
    p.add_argument("-k", "--n-neighbors", type=int, default=5)
    p.add_argument("--n-samples", type=int, default=-1,
                   help="Number of query samples (-1 = all)")
    p.add_argument("--n-grids", type=int, default=5,
                   help="Neighbor image grids to save (0 = none)")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    sr = np.load(os.path.join(args.log_folder, "states_rewards.npz"))
    states = sr["states"]

    data_folder = args.data_folder
    if not data_folder:
        with open(os.path.join(args.log_folder, "exp_config.json")) as f:
            data_folder = json.load(f)["data-folder"]
    dataset = load_dataset(data_folder)
    if len(dataset.ground_truth_states) != len(states):
        raise ValueError(
            f"{len(states)} exported states vs "
            f"{len(dataset.ground_truth_states)} ground-truth entries")

    n_samples = None if args.n_samples <= 0 else args.n_samples
    score, queries, neighbors = knn_mse(
        states, dataset.ground_truth_states, k=args.n_neighbors,
        n_samples=n_samples, seed=args.seed)
    printGreen(f"KNN-MSE: {score:.6f}")
    with open(os.path.join(args.log_folder, "knn_mse.json"), "w") as f:
        json.dump({"knn_mse": score, "k": args.n_neighbors}, f)
    if args.n_grids > 0:
        save_neighbor_grids(data_folder, dataset.images_path, queries,
                            neighbors,
                            os.path.join(args.log_folder, "NearestNeighbors"),
                            n_grids=args.n_grids)
    return score


if __name__ == "__main__":
    main()
