#!/usr/bin/env python
"""The full data lifecycle: record an environment -> preprocess -> train.

The reference's datasets are recorded by its companion repo
(robotics-rl-srl); srl-zoo itself only consumes them. This example closes
that loop in-repo: a toy 2D point environment is stepped and recorded as the
reference on-disk format (record_*/frame*.jpg + episode_data.npz), the
preprocessing CLI builds preprocessed_data.npz / ground_truth.npz / the
frames.npy decode cache, and train.py learns states from it.

Run: python examples/record_and_train.py
"""

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class ToyPointEnv:
    """Agent on a plane, 4 discrete actions, reward 1 near the target."""

    def __init__(self, size=64, seed=0):
        self.size = size
        self.rng = np.random.RandomState(seed)
        self.target = np.array([0.8, 0.8], np.float32)

    def reset(self):
        self.pos = self.rng.uniform(0.15, 0.85, 2).astype(np.float32)
        return self._render()

    def step(self, action):
        moves = 0.08 * np.array([[1, 0], [-1, 0], [0, 1], [0, -1]],
                                np.float32)
        self.pos = np.clip(self.pos + moves[action], 0.05, 0.95)
        reward = float(np.linalg.norm(self.pos - self.target) < 0.1)
        return self._render(), reward

    def _render(self):
        img = np.full((self.size, self.size, 3), 30, np.uint8)
        for center, color in ((self.target, (200, 60, 60)),
                              (self.pos, (60, 120, 220))):
            c = (center * (self.size - 1)).astype(int)
            img[max(c[1] - 3, 0):c[1] + 4, max(c[0] - 3, 0):c[0] + 4] = color
        return img


def main():
    from srl_zoo_tpu.data.record import DatasetRecorder
    from srl_zoo_tpu.preprocessing.preprocess import main as preprocess_main
    from train import main as train_main

    root = tempfile.mkdtemp(prefix="srl_record_")
    data = os.path.join(root, "data", "toy_point")

    # 1. record episodes in the reference on-disk format
    env = ToyPointEnv()
    rec = DatasetRecorder(data)
    for _ in range(4):
        rec.new_episode()
        obs = env.reset()
        for _ in range(30):
            action = int(np.random.randint(4))
            next_obs, reward = env.step(action)
            rec.record(obs, action, reward, ground_truth_state=env.pos)
            obs = next_obs
    rec.close()
    print(f"recorded 4 episodes -> {data}")

    # 2. preprocess: episode npz -> training schema + frames.npy cache
    preprocess_main(["--data-folder", data, "--img-size", "64"])

    # 3. train on it
    log = train_main(["--data-folder", data, "--losses", "autoencoder",
                      "--state-dim", "8", "-bs", "16", "--epochs", "3",
                      "--log-folder", os.path.join(root, "logs", "toy"),
                      "--no-display-plots"])
    states = np.load(os.path.join(log, "states_rewards.npz"))["states"]
    print(f"learned states: {states.shape}, finite={np.all(np.isfinite(states))}")


if __name__ == "__main__":
    main()
