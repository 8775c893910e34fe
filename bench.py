#!/usr/bin/env python
"""Throughput benchmark — prints ONE JSON line.

Metric (BASELINE.json): images/sec/chip on the config-1 train step
(CustomCNN autoencoder, state-dim 200, 224x224x3 RGB), measured end to end:
uint8 host batches -> device transfer -> on-device normalize -> fwd/bwd ->
Adam update, steady-state with donated buffers.

``vs_baseline`` compares against the PyTorch-CPU reference implementation of
the same config on this host class (benchmarks/torch_baseline.py): the
reference repo publishes no throughput numbers (BASELINE.md), so that torch
run is the agreed comparison row.
"""

from __future__ import annotations

import json
import time

import numpy as np

# Measured on this host (1-core CPU) with torch 2.13.0+cpu:
# python benchmarks/torch_baseline.py -> see BASELINE.md.
TORCH_CPU_BASELINE_IPS = 22.8


def bench_train_step(batch_size: int, img: int, state_dim: int,
                     compute_dtype: str, steps: int = 30,
                     warmup: int = 3) -> float:
    import jax

    from srl_zoo_tpu.config import SRLConfig
    from srl_zoo_tpu.training.state import create_train_state
    from srl_zoo_tpu.training.train_step import build_steps

    cfg = SRLConfig(state_dim=state_dim, model_type="custom_cnn",
                    losses=(("autoencoder", 1.0),),
                    split_dims=(("autoencoder", -1),),
                    img_height=img, img_width=img, batch_size=batch_size,
                    compute_dtype=compute_dtype)
    model, state, tx = create_train_state(cfg, jax.random.PRNGKey(0))
    train_step, _, _ = build_steps(cfg, model, tx)
    rng = jax.random.PRNGKey(1)

    host_batches = []
    nprng = np.random.RandomState(0)
    for _ in range(4):
        host_batches.append({
            "obs": nprng.randint(0, 255, (batch_size, img, img, 3),
                                 dtype=np.uint8),
            "actions": np.zeros(batch_size, np.int32),
            "reward_classes": np.zeros(batch_size, np.int32),
            "rewards": np.zeros(batch_size, np.float32),
            "valid": np.ones(batch_size, np.float32),
            "indices": np.arange(batch_size, dtype=np.int32),
        })

    import jax as _jax

    def run(n):
        nonlocal state
        for i in range(n):
            batch = {k: _jax.device_put(v)
                     for k, v in host_batches[i % 4].items()}
            state, metrics = train_step(state, batch, rng)
        _jax.block_until_ready(state.params)

    run(warmup)
    t0 = time.perf_counter()
    run(steps)
    dt = time.perf_counter() - t0
    return batch_size * steps / dt


def main():
    import jax
    device = jax.devices()[0]
    results = {}
    for name, (bs, dtype) in {
        "b32_f32": (32, "float32"),
        "b128_bf16": (128, "bfloat16"),
    }.items():
        try:
            results[name] = bench_train_step(bs, 224, 200, dtype)
        except Exception as e:  # keep the bench line parseable on failure
            results[name] = 0.0
            results[name + "_error"] = str(e)[:200]

    best_key = max((k for k in results if not k.endswith("_error")),
                   key=lambda k: results[k])
    value = results[best_key]
    print(json.dumps({
        "metric": "images/sec/chip",
        "value": round(value, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(value / TORCH_CPU_BASELINE_IPS, 2),
        "config": "autoencoder state-dim=200 224x224 (BASELINE config 1)",
        "best": best_key,
        "detail": {k: (round(v, 2) if isinstance(v, float) else v)
                   for k, v in results.items()},
        "device": str(device),
        "baseline_ips_torch_cpu": TORCH_CPU_BASELINE_IPS,
    }))


if __name__ == "__main__":
    main()
