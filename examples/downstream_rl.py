#!/usr/bin/env python
"""Using a trained SRL model from downstream RL (robotics-rl-srl style).

The reference's companion repo consumes srl-zoo artifacts two ways; both work
here:

  1. offline — read ``states_rewards.npz`` from the log folder,
  2. online — reload the encoder and embed observations at env-step time.

This example trains a small model on the synthetic dataset and runs a
random-policy rollout where each observation is embedded by the encoder
(stand-in for an RL algorithm consuming SRL states).

Run: python examples/downstream_rl.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    from srl_zoo_tpu.data.schema import load_dataset
    from srl_zoo_tpu.data.synthetic import generate_dataset
    from srl_zoo_tpu.inference import StateEncoder
    import train as train_cli

    # fresh temp dir (honors TMPDIR): a hardcoded /tmp path collides across
    # concurrent runs and silently reuses stale artifacts from a prior one
    import tempfile
    root = tempfile.mkdtemp(prefix="srl_example_")
    data = os.path.join(root, "data")
    log = os.path.join(root, "run")
    generate_dataset(data, n_episodes=6, episode_len=30, img_size=64, seed=0)

    # 1. train an SRL model (any losses / model type)
    train_cli.main(["--data-folder", data, "--losses", "priors",
                    "--state-dim", "8", "-bs", "32", "--epochs", "5",
                    "--log-folder", log, "--seed", "1"])

    # 2a. offline hand-off: the exported npz
    sr = np.load(os.path.join(log, "states_rewards.npz"))
    print(f"offline states: {sr['states'].shape}, "
          f"rewards: {sr['rewards'].shape}")

    # 2b. online hand-off: embed observations at env-step time
    encoder = StateEncoder.load(log)
    ds = load_dataset(data)  # stands in for an environment
    for t in range(5):
        obs = np.asarray(ds.frames[t])          # env observation (H, W, 3)
        state = encoder.encode(obs)             # SRL state for the policy
        action = np.random.randint(4)           # your RL policy goes here
        print(f"t={t} state[:4]={np.round(state[:4], 3)} action={action}")


if __name__ == "__main__":
    main()
