#!/usr/bin/env python
"""Embedding a TPU-trained SRL encoder inside a TORCH policy.

The reference ecosystem's consumers (robotics-rl-srl) are torch training
loops. This example closes that hand-off: train here (JAX/TPU), export once
(`srl_zoo_tpu.export.torch_export`), then build and step a torch policy
whose feature extractor is the exported encoder — the policy side never
imports JAX.

Run: python examples/torch_policy.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import torch

    from srl_zoo_tpu.utils.platform import honor_env_platform
    honor_env_platform()  # binding even on the cached-model path (CLAUDE.md)

    from srl_zoo_tpu.data.synthetic import generate_dataset
    from srl_zoo_tpu.export.torch_export import export_torch_encoder
    import train as train_cli

    # temp dir (honors TMPDIR), not the source tree: writing into the repo
    # checkout pollutes it and fails on a read-only install
    import tempfile
    work = tempfile.mkdtemp(prefix="srl_torch_policy_")
    data, logs = os.path.join(work, "data"), os.path.join(work, "logs")

    # 1. train a tiny SRL model (JAX side — this is the only JAX step)
    if not os.path.exists(os.path.join(logs, "srl_model.msgpack")):
        generate_dataset(data, n_episodes=4, episode_len=24, img_size=32,
                         seed=0)
        train_cli.main(["--data-folder", data, "--losses", "autoencoder",
                        "--epochs", "2", "--state-dim", "8", "-bs", "16",
                        "--log-folder", logs, "--no-display-plots"])

    # 2. export the encoder as self-contained TorchScript
    path = export_torch_encoder(logs)

    # 3. torch-only from here on: encoder -> small policy head
    encoder = torch.jit.load(path).eval()
    state_dim, n_actions = 8, 4
    policy = torch.nn.Sequential(torch.nn.Linear(state_dim, 32),
                                 torch.nn.Tanh(),
                                 torch.nn.Linear(32, n_actions))
    opt = torch.optim.Adam(policy.parameters(), lr=1e-3)

    # one REINFORCE-shaped update on fake rollouts (the point is the
    # plumbing: uint8 obs -> frozen SRL states -> trainable torch head)
    obs = torch.from_numpy(np.random.randint(
        0, 256, (16, 32, 32, 3), dtype=np.uint8).astype(np.float32))
    returns = torch.randn(16)
    with torch.no_grad():
        states = encoder(obs)                      # frozen SRL features
    logits = policy(states)
    dist = torch.distributions.Categorical(logits=logits)
    actions = dist.sample()
    loss = -(dist.log_prob(actions) * returns).mean()
    opt.zero_grad()
    loss.backward()
    opt.step()
    print(f"states {tuple(states.shape)}, policy loss {loss.item():.4f} — "
          "torch policy trained on frozen TPU-exported SRL features")


if __name__ == "__main__":
    main()
