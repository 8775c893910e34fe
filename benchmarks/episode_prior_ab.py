#!/usr/bin/env python
"""Design-decision #4 A/B: --episode-prior-optimizer shared vs separate.

VERDICT r3 next #4: the flag is tested mechanically both ways, but the
DEFAULT ("shared" — discriminator shares the run's Adam moments with the
encoder) rested on nothing but inertia. This script settles it with data:
same seeds, 30 epochs (the reference default), the RESULTS.md synthetic
mobile-robot dataset, both modes, reporting

  * discriminator BCE distance from the ln 2 adversarial equilibrium
    (the golden-gate signature — a healthy game sits at ~0.693),
  * GTC (higher better) and KNN-MSE (lower better) of the learned states.

Reference role of the episode prior: an adversarial auxiliary on top of a
reconstruction objective (upstream losses/losses.py episodePriorLoss runs
alongside the main SRL loss), so the A/B trains episode-prior:1 + ae:1.

Run on the TPU host:  python benchmarks/episode_prior_ab.py
(Any backend works — quality metrics are device-independent; the TPU just
makes 30-epoch runs fast.)  Results land in RESULTS.md + DESIGN_DECISIONS #4.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from srl_zoo_tpu.utils.platform import honor_env_platform  # noqa: E402

honor_env_platform()

import numpy as np  # noqa: E402

from srl_zoo_tpu.config import SRLConfig  # noqa: E402
from srl_zoo_tpu.data.schema import load_dataset  # noqa: E402
from srl_zoo_tpu.data.synthetic import generate_dataset  # noqa: E402
from srl_zoo_tpu.evaluation.gtc import ground_truth_correlation  # noqa: E402
from srl_zoo_tpu.evaluation.knn import knn_mse  # noqa: E402
from srl_zoo_tpu.training.learner import SRL4robotics  # noqa: E402

LOSSES = (("episode-prior", 1.0), ("autoencoder", 1.0))


def run_one(ds, mode: str, seed: int, workdir: str, epochs: int,
            img: int, bs: int) -> dict:
    log = os.path.join(workdir, f"{mode}_s{seed}")
    cfg = SRLConfig(state_dim=200, img_height=img, img_width=img,
                    batch_size=bs, epochs=epochs,
                    losses=LOSSES,
                    split_dims=tuple((n, -1) for n, _ in LOSSES),
                    n_actions=ds.n_actions,
                    n_reward_classes=ds.n_reward_classes,
                    data_folder=ds.data_folder,
                    compute_dtype="bfloat16", seed=seed,
                    episode_prior_optimizer=mode, log_folder=log)
    learner = SRL4robotics(cfg, log_folder=log)
    learner.learn(ds)
    states = learner.predict_states(ds)
    knn, _, _ = knn_mse(states, ds.ground_truth_states, k=5)
    gtc, _ = ground_truth_correlation(states, ds.ground_truth_states)
    hist = np.load(os.path.join(log, "loss_history.npz"))
    disc = float(hist["train/episode-prior/discriminator"][-1])
    return {"mode": mode, "seed": seed, "knn_mse": float(knn),
            "gtc": float(gtc), "disc_bce": disc,
            "disc_off_ln2": abs(disc - float(np.log(2.0)))}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, nargs="+", default=[1, 2, 3])
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--img-size", type=int, default=224)
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--workdir", default=None)
    args = ap.parse_args()

    workdir = args.workdir or tempfile.mkdtemp(prefix="ep_prior_ab_")
    data = os.path.join(workdir, "synth")
    if not os.path.exists(os.path.join(data, "preprocessed_data.npz")):
        generate_dataset(data, n_episodes=20, episode_len=100,
                         img_size=args.img_size, seed=0)
    ds = load_dataset(data)

    rows = []
    for seed in args.seeds:
        for mode in ("shared", "separate"):
            r = run_one(ds, mode, seed, workdir, args.epochs,
                        args.img_size, args.batch_size)
            rows.append(r)
            print(json.dumps(r), flush=True)

    print("\n| mode | KNN-MSE (mean±std) | GTC | disc BCE |off-ln2| |")
    print("|---|---|---|---|---|")
    summary = {}
    for mode in ("shared", "separate"):
        sub = [r for r in rows if r["mode"] == mode]
        agg = {k: (float(np.mean([r[k] for r in sub])),
                   float(np.std([r[k] for r in sub])))
               for k in ("knn_mse", "gtc", "disc_bce", "disc_off_ln2")}
        summary[mode] = agg
        print(f"| {mode} | {agg['knn_mse'][0]:.5f}±{agg['knn_mse'][1]:.5f} "
              f"| {agg['gtc'][0]:.3f}±{agg['gtc'][1]:.3f} "
              f"| {agg['disc_bce'][0]:.3f}±{agg['disc_bce'][1]:.3f} "
              f"| {agg['disc_off_ln2'][0]:.3f} |")
    print(json.dumps({"summary": summary, "rows": rows}))


if __name__ == "__main__":
    main()
