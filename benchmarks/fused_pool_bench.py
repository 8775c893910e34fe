#!/usr/bin/env python
"""Measure fused Pallas relu+max-pool vs the XLA composition on the real chip.

Geometry = the pools of BASELINE config 1's CustomCNN encoder at bs 512
(plus the ResNet-18 stem pool). Timing protocol: the per-call device_get
fence costs a full tunnel round trip (~35 ms on this host — docs/PERF.md),
so each measurement dispatches REPS async executions and fences once; the
measured null round-trip is subtracted. Run on the TPU host:

    python benchmarks/fused_pool_bench.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from srl_zoo_tpu.ops.fused_pool import relu_max_pool, relu_max_pool_reference

REPS = 25


def fence(x):
    jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0])


_null = None


def null_rtt():
    """One fenced trivial execution: dispatch + tunnel round-trip cost."""
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
            out = fn(*args)  # async dispatch; device executes serially
        fence(out)
        per.append((time.perf_counter() - t0 - null_rtt()) / REPS)
    return float(np.median(per)) * 1e3


def main():
    rng = np.random.RandomState(0)
    cases = [
        ("pool1 512x112x112x64", (512, 112, 112, 64), "SAME"),
        ("pool2 512x28x28x64", (512, 28, 28, 64), "SAME"),
        ("resnet 256x112x112x64", (256, 112, 112, 64), ((1, 1), (1, 1))),
    ]
    print(f"null rtt: {null_rtt()*1e3:.2f} ms  (subtracted; {REPS} reps/fence)")
    for name, shape, padding in cases:
        x = jnp.asarray(rng.randn(*shape).astype(np.float32),
                        dtype=jnp.bfloat16)
        oshape = jax.eval_shape(
            lambda x: relu_max_pool_reference(x, padding), x).shape
        g = jnp.asarray(rng.randn(*oshape).astype(np.float32),
                        dtype=jnp.bfloat16)

        def make(fn):
            fwd = jax.jit(fn)
            vjp = jax.jit(lambda x, g: jax.vjp(fn, x)[1](g)[0])
            return fwd, vjp

        xla_fwd, xla_vjp = make(lambda x: relu_max_pool_reference(x, padding))
        pls_fwd, pls_vjp = make(lambda x: relu_max_pool(x, padding,
                                                        use_pallas=True))

        # correctness on the real backend (compiled kernels)
        fwd_exact = bool(jnp.array_equal(xla_fwd(x), pls_fwd(x)))
        bwd_max = float(jnp.max(jnp.abs(
            xla_vjp(x, g).astype(jnp.float32)
            - pls_vjp(x, g).astype(jnp.float32))))
        # integer inputs & cotangents: sums are exact, so any routing
        # difference (ties included) shows as a mismatch
        xi = jnp.asarray(rng.randint(-2, 3, shape).astype(np.float32),
                         dtype=jnp.bfloat16)
        gi = jnp.asarray(rng.randint(-8, 9, oshape).astype(np.float32),
                         dtype=jnp.bfloat16)
        routing_exact = bool(jnp.array_equal(xla_vjp(xi, gi),
                                             pls_vjp(xi, gi)))

        r = {
            "xla_fwd": timeit(xla_fwd, x),
            "pallas_fwd": timeit(pls_fwd, x),
            "xla_fwd+bwd": timeit(xla_vjp, x, g),
            "pallas_fwd+bwd": timeit(pls_vjp, x, g),
        }
        print(f"{name}  fwd_exact={fwd_exact}  routing_exact={routing_exact}"
              f"  bwd_maxdiff={bwd_max:.3e}")
        for k, v in r.items():
            print(f"    {k:>14}: {v:8.2f} ms")


if __name__ == "__main__":
    main()
