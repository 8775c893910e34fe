#!/usr/bin/env python
"""Over-RAM scale proof on the real chip (VERDICT r3 #6, RESULTS.md row).

Trains BASELINE config 1 (autoencoder, 224px, bs 128, bf16, state-dim 200)
on a dataset ~1.6x the HBM cache budget (default: 64 000 frames = 9.6 GiB
on disk vs the 6 GiB device budget) via the rotating hybrid cache, and
reports steady-state img/s plus the host-memory footprint:

  * VmData (anonymous/heap) — what the framework actually HOLDS; must stay
    far below the dataset size (the loader reads the frames.npy memmap per
    batch and never materializes the store).
  * VmHWM (peak RSS) — includes resident FILE-BACKED memmap pages the epoch
    touched (the page cache keeps them resident on a no-pressure host), so
    it naturally approaches dataset size WITHOUT implying a copy; reported
    for honesty, bounded by budget+store, reclaimable under pressure.

Generate the dataset first (streams to a memmap, bounded RAM):

  python -c "from srl_zoo_tpu.data.synthetic import generate_dataset; \
             generate_dataset('data/overram_synth', n_episodes=640, \
             episode_len=100, img_size=224, seed=0)"
  python benchmarks/overram_run.py --data-folder data/overram_synth
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


def _vm(key: str) -> int:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith(key):
                return int(line.split()[1])
    return -1


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-folder", default="data/overram_synth")
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--log-folder", default=None)
    args = ap.parse_args()

    from srl_zoo_tpu.config import SRLConfig
    from srl_zoo_tpu.data.schema import load_dataset
    from srl_zoo_tpu.training.learner import SRL4robotics

    ds = load_dataset(args.data_folder)
    store_gib = ds.frames.nbytes / 2**30 if ds.frames is not None else 0.0
    vmdata0 = _vm("VmData:")
    log = args.log_folder or tempfile.mkdtemp(prefix="overram_")
    cfg = SRLConfig(state_dim=200, img_height=224, img_width=224,
                    batch_size=128, epochs=args.epochs,
                    losses=(("autoencoder", 1.0),),
                    split_dims=(("autoencoder", -1),),
                    n_actions=ds.n_actions,
                    n_reward_classes=ds.n_reward_classes,
                    data_folder=args.data_folder,
                    compute_dtype="bfloat16", seed=1,
                    device_cache="hybrid", val_size=0.02, log_folder=log)
    learner = SRL4robotics(cfg, log_folder=log)
    t0 = time.time()
    learner.learn(ds)
    wall = time.time() - t0
    n_train = int(ds.n_samples * (1 - cfg.val_size))
    print(json.dumps({
        "n_frames": int(ds.n_samples),
        "store_gib": round(store_gib, 2),
        "hot_n": learner._cache_hot_n,
        "epochs": args.epochs,
        "wall_s": round(wall, 1),
        "img_per_s_e2e": round(args.epochs * n_train / wall, 1),
        "vmdata_gib_start": round(vmdata0 / 2**20, 2),
        "vmdata_gib_end": round(_vm("VmData:") / 2**20, 2),
        "vmhwm_gib": round(_vm("VmHWM:") / 2**20, 2),
        "log_folder": log,
    }))


if __name__ == "__main__":
    main()
