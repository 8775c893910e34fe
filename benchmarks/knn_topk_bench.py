#!/usr/bin/env python
"""Attempt-8 measurement: fused KNN top-k (Pallas) vs blocked-XLA vs the
full-matrix + lax.top_k baseline, on the real chip.

Timing protocol (docs/PERF.md): the per-call device_get fence costs a full
tunnel round trip (~35 ms on this host), so each measurement dispatches
REPS async executions and fences once; the measured null round-trip is
subtracted. Run on the TPU host:

    python benchmarks/knn_topk_bench.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from srl_zoo_tpu.ops.knn_topk import (_topk_blocked, _topk_full,  # noqa: E402
                                      _topk_pallas, _topk_pallas_t)
from srl_zoo_tpu.ops.pairwise import pairwise_sqdist  # noqa: E402

K = 6
REPS = 10


def null_rtt():
    x = jnp.zeros((1,), jnp.float32)
    jax.device_get(x)
    t0 = time.perf_counter()
    jax.device_get(x)
    return time.perf_counter() - t0


def timed(fn, reps=REPS):
    jax.device_get(fn())  # warmup/compile
    rtt = null_rtt()
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = fn()
    jax.device_get(out)  # one fence for the whole chain
    dt = (time.perf_counter() - t0 - rtt) / reps
    return dt


def full_chunked(x, k, chunk=4096):
    """knn.py's pre-attempt-8 production path (device part only)."""
    outs = []
    for s in range(0, x.shape[0], chunk):
        d2 = pairwise_sqdist(x[s:s + chunk], x)
        _, idx = jax.lax.top_k(-d2, k)
        outs.append(idx)
    return outs[-1]


def main():
    from srl_zoo_tpu.utils.platform import honor_env_platform
    honor_env_platform()  # JAX_PLATFORMS alone is not binding on this host
    rng = np.random.RandomState(0)
    for n, d in [(20000, 200), (100000, 200)]:
        pts = rng.randn(n, d).astype(np.float32)
        x = jnp.asarray(pts)
        print(f"--- N={n} D={d} k={K} (queries = all points) ---")

        reps = 3 if n > 50000 else REPS
        print(f"full_chunked(4096): {timed(lambda: full_chunked(x, K), reps)*1e3:9.1f} ms")
        if n <= 30000:
            print(f"full_onecall:       {timed(lambda: _topk_full(x, x, K))*1e3:9.1f} ms")
        for tile in (2048, 8192):
            print(f"blocked(t={tile:5d}):  {timed(lambda: _topk_blocked(x, x, K, tile=tile), reps)*1e3:9.1f} ms")
        for tq, tr in ((512, 512), (1024, 512), (1024, 1024), (256, 2048)):
            try:
                dt = timed(lambda: _topk_pallas(x, x, K, tq=tq, tr=tr), reps)
                print(f"pallas({tq:4d},{tr:4d}): {dt*1e3:9.1f} ms")
            except Exception as e:  # noqa: BLE001 — report and continue the sweep
                print(f"pallas({tq},{tr}): FAILED {type(e).__name__}: {str(e)[:120]}")
        for tq, tr in ((512, 4096), (1024, 2048), (2048, 2048)):
            for prec in (None, jax.lax.Precision.HIGHEST):
                pname = "dflt" if prec is None else "hi"
                try:
                    dt = timed(lambda: _topk_pallas_t(x, x, K, tq=tq, tr=tr,
                                                      precision=prec), reps)
                    print(f"pallas_t({tq:4d},{tr:4d},{pname:4s}): {dt*1e3:9.1f} ms")
                except Exception as e:  # noqa: BLE001 — report and continue
                    print(f"pallas_t({tq},{tr},{pname}): FAILED "
                          f"{type(e).__name__}: {str(e)[:120]}")

        i_full = np.asarray(jax.device_get(_topk_full(x[:2048], x, K)[1]))
        i_pal = np.asarray(jax.device_get(_topk_pallas(x[:2048], x, K)[1]))
        print("agreement full-vs-pallas:", (i_full == i_pal).mean())
        for prec, pname in ((None, "dflt"), (jax.lax.Precision.HIGHEST, "hi")):
            # HIGHEST needs 6 MXU passes -> larger stack; tr=2048 fits VMEM
            i_t = np.asarray(jax.device_get(
                _topk_pallas_t(x[:2048], x, K, tr=2048, precision=prec)[1]))
            print(f"agreement full-vs-pallas_t({pname}):", (i_full == i_t).mean())


if __name__ == "__main__":
    main()
