#!/usr/bin/env python
"""PyTorch-CPU baseline for BASELINE config 1 (the comparison row).

The reference publishes no throughput numbers (BASELINE.json.published == {})
and the reference mount is empty, so per BASELINE.md the comparison baseline
is an equivalent PyTorch implementation of config 1 — CustomCNN autoencoder,
state-dim 200, batch 32, 224x224 RGB — run with the installed torch CPU wheel
on this host. This mirrors the reference architecture (conv+BN+ReLU+maxpool
encoder, ConvTranspose decoder, Adam, MSE) including its float32 host-side
normalize + NCHW layout.

Prints one JSON line: {"metric": "images/sec", "value": ...}.
"""

from __future__ import annotations

import json
import time

import numpy as np
import torch
import torch.nn as nn


class Encoder(nn.Module):
    def __init__(self, state_dim: int, img: int):
        super().__init__()
        layers = []
        in_ch = 3
        for k in (7, 3, 3):
            layers += [nn.Conv2d(in_ch, 64, k, stride=2, padding=k // 2,
                                 bias=False),
                       nn.BatchNorm2d(64), nn.ReLU(inplace=True),
                       nn.MaxPool2d(3, stride=2, padding=1)]
            in_ch = 64
        self.conv = nn.Sequential(*layers)
        with torch.no_grad():
            feat = self.conv(torch.zeros(1, 3, img, img)).numel()
        self.fc = nn.Linear(feat, state_dim)

    def forward(self, x):
        h = self.conv(x)
        return self.fc(h.flatten(1))


class Decoder(nn.Module):
    def __init__(self, state_dim: int, img: int):
        super().__init__()
        self.h0 = img // 32
        self.fc = nn.Linear(state_dim, 64 * self.h0 * self.h0)
        blocks = []
        chans = [64, 64, 64, 32, 16]
        for cin, cout in zip(chans[:-1], chans[1:]):
            blocks += [nn.ConvTranspose2d(cin, cout, 4, stride=2, padding=1),
                       nn.BatchNorm2d(cout), nn.ReLU(inplace=True)]
        blocks += [nn.ConvTranspose2d(16, 3, 4, stride=2, padding=1),
                   nn.Tanh()]
        self.deconv = nn.Sequential(*blocks)

    def forward(self, z):
        h = torch.relu(self.fc(z)).view(-1, 64, self.h0, self.h0)
        return self.deconv(h)


def main(batch_size: int = 32, img: int = 224, state_dim: int = 200,
         steps: int = 10, warmup: int = 2):
    torch.manual_seed(0)
    torch.set_num_threads(torch.get_num_threads())
    enc, dec = Encoder(state_dim, img), Decoder(state_dim, img)
    opt = torch.optim.Adam(list(enc.parameters()) + list(dec.parameters()),
                           lr=5e-3)
    rng = np.random.RandomState(0)
    frames = rng.randint(0, 255, (batch_size, img, img, 3), dtype=np.uint8)

    def step():
        # host-side normalize + HWC->CHW, as the reference loader does
        x = torch.from_numpy(frames.astype(np.float32) / 127.5 - 1.0)
        x = x.permute(0, 3, 1, 2).contiguous()
        opt.zero_grad()
        recon = dec(enc(x))
        loss = torch.mean((recon - x) ** 2)
        loss.backward()
        opt.step()
        return float(loss)

    for _ in range(warmup):
        step()
    t0 = time.perf_counter()
    for _ in range(steps):
        step()
    dt = time.perf_counter() - t0
    ips = batch_size * steps / dt
    print(json.dumps({"metric": "images/sec", "value": round(ips, 3),
                      "unit": "images/sec", "hardware": "cpu",
                      "batch_size": batch_size, "img": img,
                      "state_dim": state_dim}))
    return ips


if __name__ == "__main__":
    main()
