#!/usr/bin/env python
"""Throughput benchmark — prints ONE JSON line.

Metric (BASELINE.json): images/sec/chip on the config-1 train step
(CustomCNN autoencoder, state-dim 200, 224x224x3 RGB), measured in the
framework's two operating modes:

  * cached    — the default TPU-native mode: dataset frames resident in HBM
                (data/device_cache.py), per-step host traffic = int32 index
                arrays; fwd/bwd/Adam with donated buffers.
  * streaming — uint8 batches host->device every step (datasets too big for
                HBM); bounded by the host link, not the chip.

Timing is fenced with jax.device_get on the step's loss (a device->host
round trip), not block_until_ready — the honest fence through remote-tunnel
backends.

``vs_baseline`` compares the headline (cached) number against the
PyTorch-CPU reference implementation of the same config on this host
(benchmarks/torch_baseline.py): the reference repo publishes no throughput
numbers (BASELINE.md), so that torch run is the agreed comparison row.
"""

from __future__ import annotations

import json
import time

import numpy as np

# Measured on this host (1-core CPU) with torch 2.13.0+cpu:
# python benchmarks/torch_baseline.py -> see BASELINE.md.
TORCH_CPU_BASELINE_IPS = 22.8

# Per-row measurement-methodology versions, emitted in the bench line so a
# methodology change can never read as a perf change: ci/perf_gate.py skips
# (reports, never gates) any row whose version differs between the two docs
# being compared (VERDICT r4 weak #6). Bump a row's version WHENEVER the way
# it is measured changes, and record the history here:
#   cached_knn20k_qps  v1 (r1-r3): reps separate dispatches, one fence each —
#                        dominated by tunnel RTT (~25-30 ms of ~40 ms).
#                      v2 (r4+):   10 chained kernels inside one jit, median
#                        fenced time minus adjacent-measured dispatch RTT
#                        (+ r5 guard: subtraction refused when rtt > 50% of
#                        the fenced time — the row then carries a _note and
#                        the gate treats it as report-only). The v1->v2
#                        recorded jump was 1.47M -> 3.65M qps, zero kernel
#                        change.
#   streaming_* / hybrid_cold_* v2 (r4+): best-of-reps bracketed-link
#                        windows (v1: single window / start-of-run probe).
# Unlisted rows are v1. Docs recorded before r5 carry no field; the gate
# treats an absent entry as "unknown, gate normally" (those docs WERE
# measured at the versions declared here).
ROW_METHODOLOGY = {
    "cached_knn20k_qps": 2,
    "streaming_b128_bf16": 2,
    "streaming_overlap_b128_bf16": 2,
    "hybrid_cold_b128_bf16": 2,
}


def _make_setup(batch_size: int, img: int, state_dim: int,
                compute_dtype: str, cached: bool, n_frames: int = 2048,
                losses: str = "autoencoder", model_type: str = "custom_cnn"):
    import jax

    from srl_zoo_tpu.config import SRLConfig
    from srl_zoo_tpu.parallel.mesh import make_mesh, replicated_sharding
    from srl_zoo_tpu.training.state import create_train_state
    from srl_zoo_tpu.training.train_step import build_steps

    loss_tuple = tuple((name, 1.0) for name in losses.split("+"))
    cfg = SRLConfig(state_dim=state_dim, model_type=model_type,
                    losses=loss_tuple,
                    split_dims=tuple((n, -1) for n, _ in loss_tuple),
                    img_height=img, img_width=img, batch_size=batch_size,
                    compute_dtype=compute_dtype)
    model, state, tx = create_train_state(cfg, jax.random.PRNGKey(0))
    train_step, _, _, train_epoch, _ = build_steps(cfg, model, tx)
    mesh = make_mesh()
    state = jax.device_put(state, replicated_sharding(mesh))

    nprng = np.random.RandomState(0)
    cache = None
    if cached:
        frames = nprng.randint(0, 255, (n_frames, img, img, 3),
                               dtype=np.uint8)
        cache = {"frames": jax.device_put(frames,
                                          replicated_sharding(mesh))}

    host_batches = []
    for _ in range(4):
        b = {
            "actions": np.zeros(batch_size, np.int32),
            "reward_classes": np.zeros(batch_size, np.int32),
            "rewards": np.zeros(batch_size, np.float32),
            "valid": np.ones(batch_size, np.float32),
            "indices": nprng.randint(
                0, n_frames if cached else batch_size,
                batch_size).astype(np.int32),
        }
        if "priors" in losses:
            b["same_action_partners"] = nprng.randint(
                0, batch_size, batch_size).astype(np.int32)
            b["same_action_mask"] = np.ones(batch_size, np.float32)
            b["dissimilar_partners"] = nprng.randint(
                0, batch_size, batch_size).astype(np.int32)
            b["dissimilar_mask"] = np.ones(batch_size, np.float32)
        if not cached:
            b["obs"] = nprng.randint(0, 255, (batch_size, img, img, 3),
                                     dtype=np.uint8)
            from srl_zoo_tpu.config import NEXT_STATE_LOSSES
            if any(n in losses.split("+") for n in NEXT_STATE_LOSSES):
                b["next_obs"] = b["obs"]
        host_batches.append(b)
    return train_step, train_epoch, state, cache, host_batches, mesh


def bench_hybrid(batch_size: int, img: int, state_dim: int,
                 compute_dtype: str, steps: int = 12, hot_frac: float = 0.5,
                 losses: str = "autoencoder", reps: int = 2):
    """Hybrid mode (over-HBM-budget datasets): hot_frac of the epoch's steps
    run from the HBM cache (whole-epoch lax.scan), the cold remainder streams
    uint8 batches. This is the link-bandwidth lower bound for datasets that
    don't fit: each cold sample crosses the host link exactly once per epoch.

    Returns (combined, hot, cold, cold_link_mbps) img/s: the two phases are
    timed separately (the cold phase depends on the scan's donated state
    either way, so the mid-epoch fence only adds one RTT) because they live
    in different regimes — hot is chip-bound (hard-gateable like cached_*
    rows), cold is link-bound (gateable per link-MB/s like streaming_*
    rows). Gating the parts closes the blind spot where a combined-only
    hybrid row moved 20% with nothing able to say whether that was the link
    or a regression (VERDICT r3 weak #4 / next #5). Like bench_streaming,
    ``reps`` bracketed epochs are run and the best link-normalized-cold rep
    is reported (hot takes the max), so minute-scale link drift does not
    read as a code regression."""
    import jax

    from srl_zoo_tpu.parallel.mesh import shard_stacked_batch

    train_step, train_epoch, state, cache, host_batches, mesh = _make_setup(
        batch_size, img, state_dim, compute_dtype, True, losses=losses)
    stream_batches = _make_setup(batch_size, img, state_dim, compute_dtype,
                                 False, losses=losses)[4]
    rng = jax.random.PRNGKey(1)
    k_hot = max(int(round(steps * hot_frac)), 1)
    k_cold = max(steps - k_hot, 1)
    stacked = {k: np.stack([host_batches[i % 4][k] for i in range(k_hot)])
               for k in host_batches[0]}

    def run_epoch():
        nonlocal state
        t0 = time.perf_counter()
        sharded = shard_stacked_batch(stacked, mesh)
        state, metrics = train_epoch(state, sharded, rng, cache)
        jax.device_get(metrics["total"])  # fence the hot scan
        t_hot = time.perf_counter() - t0
        t1 = time.perf_counter()
        for i in range(k_cold):
            batch = jax.device_put(stream_batches[i % 4])
            state, metrics = train_step(state, batch, rng, None)
        jax.device_get(metrics["total"])  # fence the cold chain
        t_cold = time.perf_counter() - t1
        return t_hot, t_cold

    run_epoch()  # compile + warm both programs
    probes = [measure_link_mbps(repeats=1)[0]]
    hots, colds, combos = [], [], []
    for _ in range(reps):
        t_hot, t_cold = run_epoch()
        hots.append(batch_size * k_hot / t_hot)
        colds.append(batch_size * k_cold / t_cold)
        combos.append(batch_size * (k_hot + k_cold) / (t_hot + t_cold))
        probes.append(measure_link_mbps(repeats=1)[0])
    links = [(probes[i] + probes[i + 1]) / 2.0 for i in range(reps)]
    best = max(range(reps), key=lambda i: colds[i] / max(links[i], 1e-9))
    return combos[best], max(hots), colds[best], links[best]


def bench_train_step(batch_size: int, img: int, state_dim: int,
                     compute_dtype: str, cached: bool,
                     steps: int = 30, warmup: int = 3,
                     losses: str = "autoencoder",
                     model_type: str = "custom_cnn",
                     overlap: bool = False) -> float:
    """Streaming mode: per-step device_put + jitted step (host-link bound).
    Cached mode: the whole-epoch lax.scan runner the learner actually uses
    (index-only host traffic).

    ``overlap=True`` (streaming only) issues batch k+1's device_put before
    dispatching step k — the --stream-overlap double-buffer pipeline. The
    streaming vs streaming_overlap detail-row pair IS the microbench that
    records whether this backend overlaps transfers with compute or
    serializes them (VERDICT r2 next #10; tunnel links serialize)."""
    import jax

    train_step, train_epoch, state, cache, host_batches, mesh = _make_setup(
        batch_size, img, state_dim, compute_dtype, cached, losses=losses,
        model_type=model_type)
    rng = jax.random.PRNGKey(1)

    if cached:
        from srl_zoo_tpu.parallel.mesh import shard_stacked_batch
        stacked = {k: np.stack([host_batches[i % 4][k]
                                for i in range(steps)])
                   for k in host_batches[0]}

        def run_epoch():
            nonlocal state
            sharded = shard_stacked_batch(stacked, mesh)
            state, metrics = train_epoch(state, sharded, rng, cache)
            return float(jax.device_get(metrics["total"][-1]))

        run_epoch()  # compile + warm
        t0 = time.perf_counter()
        run_epoch()
        dt = time.perf_counter() - t0
        return batch_size * steps / dt

    def run(n):
        nonlocal state
        metrics = None
        if overlap:
            nxt = jax.device_put(host_batches[0])
            for i in range(n):
                cur = nxt
                # next transfer in flight while step i computes
                nxt = jax.device_put(host_batches[(i + 1) % 4])
                state, metrics = train_step(state, cur, rng, cache)
        else:
            for i in range(n):
                batch = jax.device_put(host_batches[i % 4])  # one put/batch
                state, metrics = train_step(state, batch, rng, cache)
        # device->host fence: forces the whole dependency chain
        return float(jax.device_get(metrics["total"]))

    run(warmup)
    t0 = time.perf_counter()
    run(steps)
    dt = time.perf_counter() - t0
    return batch_size * steps / dt


def bench_streaming(batch_size: int, img: int, state_dim: int,
                    compute_dtype: str, losses: str = "autoencoder",
                    overlap: bool = False, steps: int = 12,
                    reps: int = 3):
    """(img/s, link MB/s) of the streaming train path, drift-robust.

    The tunnel link drifts 19-41 MB/s minute-to-minute AND within a row
    (consecutive identical reps measured 282 -> 217 -> 104 img/s,
    2026-08-19), so a single timed window normalized by a single probe has
    ±2-3x noise. This compiles once, then times ``reps`` short windows each
    BRACKETED by its own link probes (a window's post-probe is the next
    window's pre-probe), and returns the window with the best
    rate-per-link-MB/s together with its bracketed link — the statistic a
    one-sided noise source (the link only ever gets sicker, never faster
    than the code allows) cannot bias downward."""
    import jax

    train_step, _, state, cache, host_batches, _ = _make_setup(
        batch_size, img, state_dim, compute_dtype, False, losses=losses)
    rng = jax.random.PRNGKey(1)

    def run(n):
        nonlocal state
        metrics = None
        if overlap:
            nxt = jax.device_put(host_batches[0])
            for i in range(n):
                cur = nxt
                nxt = jax.device_put(host_batches[(i + 1) % 4])
                state, metrics = train_step(state, cur, rng, cache)
        else:
            for i in range(n):
                batch = jax.device_put(host_batches[i % 4])
                state, metrics = train_step(state, batch, rng, cache)
        return float(jax.device_get(metrics["total"]))

    run(2)  # compile + warm
    probes = [measure_link_mbps(repeats=1)[0]]
    rates = []
    for _ in range(reps):
        t0 = time.perf_counter()
        run(steps)
        rates.append(batch_size * steps / (time.perf_counter() - t0))
        probes.append(measure_link_mbps(repeats=1)[0])
    links = [(probes[i] + probes[i + 1]) / 2.0 for i in range(reps)]
    best = max(range(reps), key=lambda i: rates[i] / max(links[i], 1e-9))
    return rates[best], links[best]


def measure_link_mbps(n_bytes: int = 32 * 2**20, repeats: int = 3):
    """Host->device link bandwidth (MB/s): one timed device_put of a pinned
    uint8 buffer, fenced by fetching a device-computed slice (device_get, per
    the timing invariant). Recorded alongside the throughput rows so
    streaming/hybrid deltas are attributable to the documented tunnel-link
    variance (31-170 MB/s on this host, docs/PERF.md) instead of reading as
    code regressions (VERDICT r2 weak #3). Returns (median, max) over
    ``repeats`` runs."""
    import jax

    arr = np.random.randint(0, 255, (n_bytes,), dtype=np.uint8)
    y = jax.device_put(arr)  # warm: allocator + any lazy backend setup
    _ = jax.device_get(y[:1])
    # the fencing device_get costs a full tunnel round trip (~35 ms here) —
    # subtract it or link_mbps reads ~19% low at 170 MB/s and an RTT spike
    # masquerades as a bandwidth drop in the streaming-row normalization
    t0 = time.perf_counter()
    _ = jax.device_get(y[:1])
    rtt = time.perf_counter() - t0
    rates = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        y = jax.device_put(arr)
        _ = jax.device_get(y[:1])  # slice runs on device after the transfer
        dt = max(time.perf_counter() - t0 - rtt, 1e-6)
        rates.append(n_bytes / dt / 2**20)
    return float(np.median(rates)), float(np.max(rates))


# ~10x the healthy ~24 ms median dispatch RTT measured through this host's
# tunnel (2026-08-19, 30-sample probe); a PCIe host sits well under 1 ms, so
# the threshold only ever fires on a genuinely sick transport
RTT_DEGRADED_MS = 250.0


def measure_rtt_ms(repeats: int = 15) -> float:
    """Median dispatch round-trip (tiny jitted op fenced by device_get), ms.

    The discriminator bulk bandwidth misses: the 2026-08-19 tunnel flap kept
    link_mbps normal (~40 MB/s) while dispatch latency blew up ~20x, so the
    chip-bound cached_* rows measured 944 img/s on a chip that benches 17.5k
    solo — a parseable, plausible-looking line that would have become a
    vacuous perf floor for the next round. Recorded as ``rtt_ms`` (worst of
    a pre-grid and post-grid probe); when it exceeds ``RTT_DEGRADED_MS`` the
    bench line carries a ``degraded`` field and ci/perf_gate.py refuses to
    use the line as a floor or gate against it (exit 3, environment outage).
    """
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda a: a + 1)
    x = jnp.zeros((), jnp.float32)
    jax.device_get(f(x))  # warm: compile + any first-touch stall
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.device_get(f(x))
        ts.append((time.perf_counter() - t0) * 1e3)
    ts.sort()
    return ts[len(ts) // 2]


def bench_knn_topk(n: int = 20000, d: int = 200, k: int = 6,
                   chain: int = 10, reps: int = 3):
    """(queries/s, note) of the production knn_topk kernel (all-points
    query, the KNN-MSE shape). Chip-bound and hard-gated like the other
    cached_* rows; ``note`` is None on a healthy transport.

    Methodology v2 (changed r4; v1 was a loop of ``reps`` separate
    dispatches): the kernel runs 20k queries in ~8 ms — v1's per-dispatch
    fence measured mostly the tunnel's fixed costs (one ~25-30 ms RTT over
    ~40 ms of kernel), so a 5 ms RTT wobble read as a -26% "chip" regression
    (2026-08-19). Now ``chain`` kernel invocations run INSIDE one jit via
    lax.scan — each iteration's queries carry a numerically-negligible but
    non-elidable dependency on the previous distances, so the chip executes
    them sequentially with zero host involvement — and the adjacent-measured
    dispatch RTT is subtracted from the median fenced time. The v1->v2
    change moved the recorded row 1.47M -> 3.65M qps with ZERO kernel
    change, which is why rows now carry a ``methodology`` version the gate
    refuses to compare across (ROW_METHODOLOGY / VERDICT r4 weak #6).

    Guard (ADVICE r4): the RTT is measured AFTER the timed reps; on a
    drifting tunnel a large post-hoc RTT estimate could subtract most of the
    fenced time and mint an unboundedly-inflated rate that then becomes an
    unreachable gate floor. When rtt > 50% of the fenced median the
    subtraction is refused: the UNCORRECTED rate is returned with a note,
    and ci/perf_gate.py treats noted rows as report-only."""
    import jax
    import jax.numpy as jnp

    from srl_zoo_tpu.ops.knn_topk import knn_topk_with_dist

    x = jnp.asarray(np.random.RandomState(0).randn(n, d).astype(np.float32))

    @jax.jit
    def run_chain(x):
        def body(xq, _):
            dist, idx = knn_topk_with_dist(xq, x, k)
            # 1e-30 * sum: ~1e-22 on O(1) coords — cannot change any
            # neighbor, but XLA cannot prove it zero, so no iteration is
            # DCE'd or reordered off the sequential chain
            return xq + dist.sum() * 1e-30, idx[0, 0]
        _, outs = jax.lax.scan(body, x, None, length=chain)
        return outs

    jax.device_get(run_chain(x))  # compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.device_get(run_chain(x))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    t_med = ts[len(ts) // 2]
    rtt_s = measure_rtt_ms(repeats=7) / 1e3  # the fixed cost of the fence
    if rtt_s > 0.5 * t_med:
        return n * chain / t_med, (
            f"rtt {rtt_s * 1e3:.0f} ms > 50% of fenced {t_med * 1e3:.0f} ms"
            " — subtraction refused, UNCORRECTED rate reported")
    return n * chain / (t_med - rtt_s), None


def _bail_with_error_line(error: str):
    """Print the parseable one-JSON-line contract with an error field and
    hard-exit (os._exit: a stuck backend thread holds client locks a clean
    interpreter shutdown would wait on)."""
    import os
    import sys

    print(json.dumps({
        "metric": "images/sec/chip",
        "value": 0.0,
        "unit": "images/sec/chip",
        "vs_baseline": 0.0,
        "error": error,
        "baseline_ips_torch_cpu": TORCH_CPU_BASELINE_IPS,
    }))
    sys.stdout.flush()
    os._exit(1)


def _devices_with_watchdog(timeout_s: float = 240.0):
    """First backend touch, bounded (srl_zoo_tpu.utils.platform helper). The
    axon TPU tunnel has been observed to hang during device enumeration
    (2026-08-17 outage); an unguarded call here would hang the driver's
    end-of-round bench run forever instead of producing a parseable line."""
    from srl_zoo_tpu.utils.platform import BackendInitTimeout, probe_backend
    try:
        return probe_backend(timeout_s)
    except BackendInitTimeout as e:
        _bail_with_error_line(f"{e}; see docs/STATUS.md")


def main(argv=None):
    from srl_zoo_tpu.utils.platform import honor_env_platform
    honor_env_platform()
    import argparse

    import jax

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--smoke", action="store_true",
                   help="Tiny geometry / few steps — validates the bench "
                        "machinery (used by tests), numbers not meaningful")
    args = p.parse_args(argv)

    if args.smoke:
        grid = {"cached_smoke": (16, "float32", True, "autoencoder")}
        img, sd, steps = 32, 8, 3
    else:
        grid = {
            "cached_b512_bf16": (512, "bfloat16", True, "autoencoder"),
            "cached_vae_b512_bf16": (512, "bfloat16", True, "vae"),
            "cached_priors_b512_bf16": (512, "bfloat16", True, "priors"),
            "streaming_b128_bf16": (128, "bfloat16", False, "autoencoder"),
            "streaming_overlap_b128_bf16":
                (128, "bfloat16", "overlap", "autoencoder"),
            "hybrid_b128_bf16": (128, "bfloat16", "hybrid", "autoencoder"),
            "cached_resnet_inverse_b256_bf16":
                (256, "bfloat16", "resnet", "inverse"),
        }
        img, sd, steps = 224, 200, 20

    from srl_zoo_tpu.utils.platform import BackendInitTimeout, run_bounded

    device = _devices_with_watchdog()[0]
    results = {}

    def _bail_mid_run(stage: str, e: Exception):
        # a tunnel that wedges AFTER enumeration would otherwise hang every
        # remaining row: report what we have and exit parseably
        _bail_with_error_line(
            f"backend hung mid-run at {stage}: {e}; partial detail: "
            + json.dumps({k: round(v, 2) for k, v in results.items()
                          if isinstance(v, float)}))

    try:
        link_mbps, link_mbps_max = run_bounded(
            lambda: measure_link_mbps(
                n_bytes=(2**20 if args.smoke else 32 * 2**20)),
            timeout_s=240, what="link-bandwidth measurement")
    except BackendInitTimeout as e:
        _bail_mid_run("link-bandwidth measurement", e)
    except Exception as e:  # a failed transfer: record, keep benching
        link_mbps, link_mbps_max = 0.0, 0.0
        results["link_error"] = str(e)[:200]

    try:
        rtt_ms = run_bounded(measure_rtt_ms, timeout_s=240,
                             what="dispatch-rtt measurement")
    except BackendInitTimeout as e:
        _bail_mid_run("dispatch-rtt measurement", e)
    except Exception as e:
        rtt_ms = 0.0
        results["rtt_error"] = str(e)[:200]

    for name, (bs, dtype, cached, losses) in grid.items():
        # link-bound rows (streaming_*, hybrid cold phase) carry their OWN
        # drift-robust link estimate as <row>_link_mbps (see bench_streaming:
        # the tunnel drifts 19-41 MB/s minute-to-minute, so normalizing by
        # the start-of-run link_mbps misattributed a healthy row as -63%,
        # 2026-08-19); ci/perf_gate.py normalizes those rows by it.
        try:
            if cached == "hybrid":
                # over-budget dataset scenario: half cached, half streamed;
                # the phases are recorded as separately GATEABLE rows (hot ->
                # cached_* rule, cold -> streaming_* link-normalized rule)
                def fn(bs=bs, dtype=dtype, losses=losses, name=name):
                    combined, hot, cold, cold_link = bench_hybrid(
                        bs, img, sd, dtype, steps=12, hot_frac=0.5,
                        losses=losses)
                    cold_name = name.replace("hybrid_", "hybrid_cold_")
                    results[name.replace("hybrid_", "hybrid_hot_")] = hot
                    results[cold_name] = cold
                    results[cold_name + "_link_mbps"] = cold_link
                    results["hybrid_f_hot"] = 0.5
                    return combined
            elif cached == "overlap":
                def fn(bs=bs, dtype=dtype, losses=losses, name=name):
                    rate, link = bench_streaming(bs, img, sd, dtype,
                                                 losses=losses, overlap=True)
                    results[name + "_link_mbps"] = link
                    return rate
            elif cached == "resnet":
                fn = lambda: bench_train_step(bs, img, sd, dtype, True,
                                              steps=steps, warmup=2,
                                              losses=losses,
                                              model_type="resnet")
            elif cached is False:
                def fn(bs=bs, dtype=dtype, losses=losses, name=name):
                    rate, link = bench_streaming(bs, img, sd, dtype,
                                                 losses=losses)
                    results[name + "_link_mbps"] = link
                    return rate
            else:
                fn = lambda: bench_train_step(bs, img, sd, dtype, cached,
                                              steps=steps, warmup=2,
                                              losses=losses)
            results[name] = run_bounded(fn, timeout_s=900, what=name)
        except BackendInitTimeout as e:
            _bail_mid_run(name, e)
        except Exception as e:  # keep the bench line parseable on failure
            results[name] = 0.0
            results[name + "_error"] = str(e)[:200]

    # eval-path row: fused KNN top-k queries/s (PERF.md attempt 8) — the
    # device half of KNN-MSE, hard-gated like the other cached_* rows
    try:
        qps, note = run_bounded(
            lambda: bench_knn_topk(n=(2048 if args.smoke else 20000),
                                   d=(16 if args.smoke else 200)),
            timeout_s=900, what="cached_knn20k_qps")
        results["cached_knn20k_qps"] = qps
        if note:
            results["cached_knn20k_qps_note"] = note
    except BackendInitTimeout as e:
        _bail_mid_run("cached_knn20k_qps", e)
    except Exception as e:
        results["cached_knn20k_qps"] = 0.0
        results["cached_knn20k_qps_error"] = str(e)[:200]

    # re-probe RTT after the grid: a flap that starts MID-RUN (the observed
    # mode — the 07:24 line was healthy at probe time, sick by row 1) must
    # still mark the line; worst-of-both is what the gate trusts
    try:
        rtt_post = run_bounded(measure_rtt_ms, timeout_s=240,
                               what="dispatch-rtt re-measurement")
        rtt_ms = max(rtt_ms, rtt_post)
    except BackendInitTimeout as e:
        _bail_mid_run("dispatch-rtt re-measurement", e)
    except Exception as e:
        results["rtt_error"] = str(e)[:200]

    headline = results.get("cached_b512_bf16",
                           results.get("cached_smoke", 0.0))
    if headline == 0.0:  # cache path failed; fall back to streaming
        headline = results.get("streaming_b128_bf16", 0.0)
    line = {
        "metric": "images/sec/chip",
        "value": round(headline, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(headline / TORCH_CPU_BASELINE_IPS, 2),
        "config": "autoencoder state-dim=200 224x224 (BASELINE config 1)",
        "detail": {k: (round(v, 2) if isinstance(v, float) else v)
                   for k, v in results.items()},
        "device": str(device),
        "link_mbps": round(link_mbps, 1),
        "link_mbps_max": round(link_mbps_max, 1),
        # 3 decimals: in-process CPU dispatch is ~0.03 ms and must not
        # round to a 0.0 that reads as "probe failed"
        "rtt_ms": round(rtt_ms, 3),
        "baseline_ips_torch_cpu": TORCH_CPU_BASELINE_IPS,
        "methodology": ROW_METHODOLOGY,
    }
    if rtt_ms > RTT_DEGRADED_MS:
        line["degraded"] = (
            f"dispatch rtt {rtt_ms:.0f} ms (healthy ~24 ms on this host): "
            "transport degraded — chip-bound rows are not chip measurements")
    print(json.dumps(line))


if __name__ == "__main__":
    main()
