#!/usr/bin/env python
"""One-command regeneration of the RESULTS.md headline quality table.

Runs all five BASELINE.json acceptance configs end to end with the REAL
train.py CLI at the headline recipe (2 000-frame 224px synthetic dataset,
10 epochs, batch 128, bf16, state-dim 200, seed 1) and prints KNN-MSE (k=5),
GTC, and the reward-probe accuracy per config — the exact numbers
RESULTS.md's first table reports (VERDICT r4 weak #5: the previous repro
pointer was an uncommitted /tmp script).

Run on the TPU host:   python benchmarks/reproduce_results.py
Options:               --epochs 30 (the reference-default table)
                       --workdir <dir> to keep artifacts
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from srl_zoo_tpu.utils.platform import honor_env_platform  # noqa: E402

honor_env_platform()

import numpy as np  # noqa: E402

CONFIGS = [
    ("1. CNN autoencoder", ["--losses", "autoencoder"], "synth"),
    ("2. beta-VAE", ["--losses", "vae", "--beta", "2"], "synth"),
    ("3. Robotic priors", ["--losses", "priors"], "synth"),
    ("4. SRL splits",
     ["--losses", "autoencoder:1:100", "inverse:2:50", "forward:1:25",
      "reward:1:25"], "synth"),
    ("5. Triplet + ResNet-18 (multi-view)",
     ["--losses", "triplet", "--model-type", "resnet", "--multi-view"],
     "synth_mv"),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--configs", type=int, nargs="+",
                    choices=range(1, len(CONFIGS) + 1),
                    default=list(range(1, len(CONFIGS) + 1)),
                    help="1-based config numbers (as in RESULTS.md)")
    args = ap.parse_args()

    from train import main as train_main
    from srl_zoo_tpu.data.schema import load_dataset
    from srl_zoo_tpu.data.synthetic import generate_dataset
    from srl_zoo_tpu.evaluation.gtc import ground_truth_correlation
    from srl_zoo_tpu.evaluation.knn import knn_mse
    from srl_zoo_tpu.evaluation.predict_reward import predict_reward_accuracy

    workdir = args.workdir or tempfile.mkdtemp(prefix="srl_results_")
    for name, mv in (("synth", False), ("synth_mv", True)):
        folder = os.path.join(workdir, name)
        if not os.path.exists(os.path.join(folder, "preprocessed_data.npz")):
            generate_dataset(folder, n_episodes=40, episode_len=50,
                             img_size=224, seed=0, multi_view=mv)

    rows = []
    for i in args.configs:
        title, flags, ds_name = CONFIGS[i - 1]
        log = os.path.join(workdir, f"log{i}")
        t0 = time.time()
        train_main(["--data-folder", os.path.join(workdir, ds_name),
                    "--state-dim", "200", "-bs", "128",
                    "--epochs", str(args.epochs), "--seed", "1",
                    "--dtype", "bfloat16", "--no-display-plots",
                    "--log-folder", log] + flags)
        wall = time.time() - t0
        ds = load_dataset(os.path.join(workdir, ds_name))
        npz = np.load(os.path.join(log, "states_rewards.npz"))
        states = npz["states"]
        knn, _, _ = knn_mse(states, ds.ground_truth_states, k=5)
        gtc, _ = ground_truth_correlation(states, ds.ground_truth_states)
        acc = predict_reward_accuracy(states, npz["rewards"])
        row = {"config": title, "knn_mse": round(float(knn), 5),
               "gtc": round(float(gtc), 3),
               "reward_acc": round(float(acc), 3),
               "wall_s": round(wall, 1)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    print(f"\n| Config | KNN-MSE | GTC | reward acc | wall ({args.epochs} "
          "epochs, incl. compile) |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['config']} | {r['knn_mse']:.5f} | {r['gtc']:.3f} "
              f"| {r['reward_acc']:.3f} | {r['wall_s']:.0f} s |")


if __name__ == "__main__":
    main()
