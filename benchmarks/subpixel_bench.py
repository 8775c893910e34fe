#!/usr/bin/env python
"""Measure the CNNDecoder with conv_transpose vs subpixel deconvs on chip.

Motivation: docs/PERF.md "HLO op accounting" — lax.conv_transpose's backward
materializes spatial `reverse` ops over full-size decoder activations
(~1.6 ms/step at bench geometry) and runs lhs-dilated gradient convs. The
subpixel reformulation (ops/subpixel.py) is the same function as a plain
stride-1 conv + depth-to-space, whose gradient is a plain conv gradient.

Geometry = BASELINE config 1 decoder at bs 512, bf16, 224x224, state 200.
Timing protocol as in fused_pool_bench.py: REPS async dispatches per
device_get fence, null round-trip subtracted.

    python benchmarks/subpixel_bench.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from srl_zoo_tpu.models.decoders import CNNDecoder

REPS = 25
BS, IMG, STATE = 512, 224, 200


def fence(x):
    jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0])


_null = None


def null_rtt():
    global _null
    if _null is None:
        f = jax.jit(lambda a: a + 1.0)
        x = jnp.zeros(())
        fence(f(x))
        ts = []
        for _ in range(10):
            t0 = time.perf_counter()
            fence(f(x))
            ts.append(time.perf_counter() - t0)
        _null = float(np.median(ts))
    return _null


def timeit(fn, *args, passes=3, warmup=2):
    for _ in range(warmup):
        fence(fn(*args))
    per = []
    for _ in range(passes):
        t0 = time.perf_counter()
        out = None
        for _ in range(REPS):
            out = fn(*args)
        fence(out)
        per.append((time.perf_counter() - t0 - null_rtt()) / REPS)
    return float(np.median(per)) * 1e3


def build(deconv: str):
    dec = CNNDecoder(img_height=IMG, img_width=IMG, dtype=jnp.bfloat16,
                     deconv=deconv)
    z = jax.random.normal(jax.random.PRNGKey(0), (BS, STATE))
    variables = dec.init(jax.random.PRNGKey(1), z[:2], train=True)
    tgt = jax.random.normal(jax.random.PRNGKey(2), (BS, IMG, IMG, 3))

    def fwd(params, z):
        return dec.apply({"params": params,
                          "batch_stats": variables["batch_stats"]},
                         z, train=True, mutable=["batch_stats"])[0]

    # tgt must be an ARGUMENT: a closed-over device array is serialized into
    # the program as a constant and overflows the remote_compile payload.
    def loss(params, z, tgt):
        recon = fwd(params, z)
        return jnp.mean((recon - tgt) ** 2)

    return (jax.jit(fwd), jax.jit(jax.grad(loss)), variables["params"], z, tgt)


def main():
    print(f"null rtt: {null_rtt()*1e3:.2f} ms  ({REPS} reps/fence)")
    ct_fwd, ct_grad, params, z, tgt = build("conv_transpose")
    sp_fwd, sp_grad, _, _, _ = build("subpixel")

    # equivalence with SHARED params, compiled on the real backend
    y_ct = ct_fwd(params, z).astype(jnp.float32)
    y_sp = sp_fwd(params, z).astype(jnp.float32)
    print(f"fwd maxdiff (shared params, bf16 compute): "
          f"{float(jnp.max(jnp.abs(y_ct - y_sp))):.3e}")

    for name, f in (("conv_transpose fwd", lambda: ct_fwd(params, z)),
                    ("subpixel       fwd", lambda: sp_fwd(params, z)),
                    ("conv_transpose fwd+bwd", lambda: ct_grad(params, z, tgt)),
                    ("subpixel       fwd+bwd", lambda: sp_grad(params, z, tgt))):
        print(f"  {name:>24}: {timeit(f):8.2f} ms")


if __name__ == "__main__":
    main()
