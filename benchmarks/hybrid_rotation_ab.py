#!/usr/bin/env python
"""Hybrid residency rotation quality A/B (VERDICT r3 #2's "quantify" half).

The round-3 hybrid cache used a STATIC temporal prefix as the hot set:
hot-phase triplet negatives were confined to the resident prefix and sample
order correlated with dataset position every epoch. Round 4 rotates the
residency window per epoch (data/hybrid.py). This script measures the
quality delta on the scenario where the bias bites hardest: an over-budget
MULTI-VIEW triplet run at ~50% hot fraction — triplet's negative pool is the
thing the static prefix restricted.

Same seeds, both modes (--hybrid-rotation vs --no-hybrid-rotation), GTC +
KNN-MSE of the exported states. Budget is forced via SRL_ZOO_CACHE_BUDGET_MB
(set before the device_cache import reads it).

Run on the TPU host:  python benchmarks/hybrid_rotation_ab.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

# ~50% hot at 4000 multi-view 224px frames: 2 x 150528 B/frame -> 600 MB
# budget holds ~2088 of 4000. Must be set before device_cache is imported.
os.environ.setdefault("SRL_ZOO_CACHE_BUDGET_MB", "600")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from srl_zoo_tpu.utils.platform import honor_env_platform  # noqa: E402

honor_env_platform()

import jax  # noqa: E402
import numpy as np  # noqa: E402

from srl_zoo_tpu.config import SRLConfig  # noqa: E402
from srl_zoo_tpu.parallel.mesh import replicated_sharding  # noqa: E402
from srl_zoo_tpu.data.schema import load_dataset  # noqa: E402
from srl_zoo_tpu.data.synthetic import generate_dataset  # noqa: E402
from srl_zoo_tpu.evaluation.gtc import ground_truth_correlation  # noqa: E402
from srl_zoo_tpu.evaluation.knn import knn_mse  # noqa: E402
from srl_zoo_tpu.training.learner import SRL4robotics  # noqa: E402


def run_one(ds, rotate: bool, seed: int, workdir: str, epochs: int) -> dict:
    mode = "rotating" if rotate else "static"
    log = os.path.join(workdir, f"{mode}_s{seed}")
    cfg = SRLConfig(state_dim=200, img_height=224, img_width=224,
                    batch_size=128, epochs=epochs,
                    losses=(("triplet", 1.0),),
                    split_dims=(("triplet", -1),),
                    multi_view=True,
                    n_actions=ds.n_actions,
                    n_reward_classes=ds.n_reward_classes,
                    data_folder=ds.data_folder,
                    compute_dtype="bfloat16", seed=seed,
                    device_cache="hybrid", hybrid_rotation=rotate,
                    log_folder=log)
    learner = SRL4robotics(cfg, log_folder=log)
    learner.learn(ds)
    hot_n = learner._cache_hot_n
    # evaluate the FINAL epoch's params (resume checkpoint), NOT best-val:
    # triplet val loss bottoms at epoch 1 (the early-BN artifact RESULTS.md
    # documents), and epoch 1's window is the initial prefix in BOTH modes —
    # a best-val export would compare two identical epoch-1 snapshots and
    # measure nothing (the first cut of this A/B did exactly that).
    from srl_zoo_tpu.training import checkpoint as ckpt
    final = ckpt.restore_train_state(log, jax.device_get(learner.state))
    learner.state = jax.device_put(
        learner.state.replace(params=final.params,
                              batch_stats=final.batch_stats),
        replicated_sharding(learner.mesh))
    states = learner.predict_states(ds)
    knn, _, _ = knn_mse(states, ds.ground_truth_states, k=5)
    gtc, _ = ground_truth_correlation(states, ds.ground_truth_states)
    return {"mode": mode, "seed": seed, "hot_n": hot_n,
            "f_hot": round(hot_n / ds.n_samples, 3) if hot_n else None,
            "knn_mse": float(knn), "gtc": float(gtc)}


# Scenarios (VERDICT r4 #3): "multiview" is the r4 worst case for the
# STATIC prefix's triplet-negative confinement; "drift" adds long-range
# temporal structure (background brightens across episodes, invisible in the
# 2D ground truth) so a temporal-prefix hot set only ever trains negatives
# against early backgrounds — the case rotation should WIN outright.
SCENARIOS = {
    "multiview": dict(background_drift=0.0),
    "drift": dict(background_drift=1.0),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, nargs="+", default=[1, 2, 3, 4, 5])
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--scenarios", nargs="+", default=list(SCENARIOS),
                    choices=list(SCENARIOS))
    ap.add_argument("--out", default=None,
                    help="write the full JSON result here as well")
    args = ap.parse_args()

    workdir = args.workdir or tempfile.mkdtemp(prefix="rot_ab_")
    result = {}
    for scen in args.scenarios:
        data = os.path.join(workdir, f"synth_{scen}")
        if not os.path.exists(os.path.join(data, "preprocessed_data.npz")):
            generate_dataset(data, n_episodes=40, episode_len=100,
                             img_size=224, seed=0, multi_view=True,
                             **SCENARIOS[scen])
        ds = load_dataset(data)

        rows = []
        for seed in args.seeds:
            for rotate in (True, False):
                r = run_one(ds, rotate, seed,
                            os.path.join(workdir, scen), args.epochs)
                r["scenario"] = scen
                rows.append(r)
                print(json.dumps(r), flush=True)

        print(f"\n[{scen}] per-seed (rotating vs static):")
        for seed in args.seeds:
            by = {r["mode"]: r for r in rows if r["seed"] == seed}
            print(f"  seed {seed}: GTC {by['rotating']['gtc']:.3f} vs "
                  f"{by['static']['gtc']:.3f}; KNN-MSE "
                  f"{by['rotating']['knn_mse']:.5f} vs "
                  f"{by['static']['knn_mse']:.5f}")
        print(f"\n[{scen}] | mode | KNN-MSE (mean±std) | GTC (mean±std) |")
        print("|---|---|---|")
        summary = {}
        for mode in ("rotating", "static"):
            sub = [r for r in rows if r["mode"] == mode]
            agg = {k: (float(np.mean([r[k] for r in sub])),
                       float(np.std([r[k] for r in sub])))
                   for k in ("knn_mse", "gtc")}
            summary[mode] = agg
            print(f"| {mode} | {agg['knn_mse'][0]:.5f}±{agg['knn_mse'][1]:.5f} "
                  f"| {agg['gtc'][0]:.3f}±{agg['gtc'][1]:.3f} |")
        result[scen] = {"summary": summary, "rows": rows}
        print(json.dumps({scen: result[scen]}), flush=True)

    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
