"""Environment doctor: diagnose devices, HBM, host link, and dataset fit.

Throughput on this framework is dominated by one question — does the
dataset fit in HBM, and if not, how fast is the host link? (docs/PERF.md:
cached 17.4k img/s vs streaming ~0.3-1k on a slow tunnel.) This CLI answers
it before a long run does.

Usage:
  python -m srl_zoo_tpu.utils.doctor [--data-folder data/foo]
      [--img-size 224] [--skip-bandwidth]
"""

from __future__ import annotations

import argparse
import time

import numpy as np

from srl_zoo_tpu.utils import printGreen, printYellow


def measure_link_bandwidth(n_mb: int = 16) -> float:
    """Host->device MB/s for one device_put, fenced with device_get."""
    import jax
    import jax.numpy as jnp

    payload = np.zeros((n_mb, 1024, 1024), np.uint8)
    x = jax.device_put(payload)  # warm path
    float(jax.device_get(jnp.sum(x[:, 0, 0])))
    t0 = time.perf_counter()
    x = jax.device_put(payload)
    float(jax.device_get(jnp.sum(x[:, 0, 0])))
    dt = time.perf_counter() - t0
    return payload.nbytes / dt / 1e6


def main(argv=None) -> int:
    from srl_zoo_tpu.utils.platform import honor_env_platform
    honor_env_platform()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-folder", type=str, default="")
    p.add_argument("--img-size", type=int, default=224)
    p.add_argument("--skip-bandwidth", action="store_true")
    args = p.parse_args(argv)

    import jax

    from srl_zoo_tpu.data import device_cache as dc
    from srl_zoo_tpu.utils.platform import BackendInitTimeout, probe_backend

    try:
        # the first backend touch is the one place this host's tunnel has
        # been observed to wedge (device enumeration never returns) — the
        # doctor must DIAGNOSE that outage, not hang on it
        devices = probe_backend(timeout_s=120)
    except BackendInitTimeout as e:
        from srl_zoo_tpu.utils import printRed
        printRed(f"backend init FAILED: {e}")
        printRed("diagnosis: the platform plugin registered but device "
                 "enumeration hung — a transport/tunnel outage. Training "
                 "and benchmarks will hang too; retry later or run on CPU "
                 "with JAX_PLATFORMS=cpu.")
        return 2
    plat = devices[0].platform
    printGreen(f"devices: {len(devices)} x {devices[0].device_kind} "
               f"(platform={plat}); processes: {jax.process_count()}")
    stats = getattr(devices[0], "memory_stats", lambda: None)()
    if stats and "bytes_limit" in stats:
        printGreen(f"HBM per device: {stats['bytes_limit'] / 2**30:.1f} GiB "
                   f"({stats.get('bytes_in_use', 0) / 2**20:.0f} MiB in use)")
    budget = dc.DEFAULT_MAX_BYTES
    printGreen(f"frame-cache budget: {budget / 2**30:.1f} GiB/device "
               "(override: SRL_ZOO_CACHE_BUDGET_MB)")

    link_sick = False
    if not args.skip_bandwidth:
        from srl_zoo_tpu.utils.platform import run_bounded
        try:
            # BOUNDED like bench.py's link probe: the 2026-08-20 outage mode
            # passes device enumeration (the probe above) but hangs bulk
            # transfers forever — an unbounded device_put here hung the
            # doctor, the one tool whose whole job is diagnosing outages
            bw = run_bounded(measure_link_bandwidth, timeout_s=240,
                             what="link-bandwidth measurement")
        except BackendInitTimeout as e:
            from srl_zoo_tpu.utils import printRed
            printRed(f"host->device link: MEASUREMENT HUNG ({e})")
            printRed("diagnosis: device enumeration works but bulk "
                     "transfers stall — a tunnel/transport outage. "
                     "Streaming, caching uploads, and bench will hang; "
                     "retry when the link recovers (ci/tpu_checkup.sh).")
            link_sick = True
        else:
            msg = f"host->device link: {bw:.0f} MB/s"
            frame = args.img_size * args.img_size * 3
            msg += (f" => streaming ceiling ~{bw * 1e6 / frame:.0f} img/s "
                    f"at {args.img_size}px")
            (printGreen if bw > 1000 else printYellow)(msg)

    if args.data_folder:
        from srl_zoo_tpu.data.schema import load_dataset
        ds = load_dataset(args.data_folder)
        printGreen(f"dataset: {ds.n_samples} samples, "
                   f"{ds.n_actions} actions, "
                   f"{ds.n_reward_classes} reward classes, "
                   f"frames.npy={'yes' if ds.frames is not None else 'NO'}")
        if ds.frames is None:
            printYellow("no frames.npy at any resolution — run "
                        "python -m srl_zoo_tpu.preprocessing.preprocess "
                        "to enable the HBM cache fast path")
        else:
            nbytes = dc.cache_nbytes(ds)
            hw = tuple(ds.frames.shape[1:3])
            printGreen(f"frame store: {nbytes / 2**20:.0f} MiB at "
                       f"{hw[0]}x{hw[1]}")
            if dc.fits(ds, hw, needs_view2=ds.frames_2 is not None):
                printGreen("fits the per-device budget -> FULL cache "
                           "(fastest mode) will engage")
            else:
                hot = dc.hybrid_hot_n(ds, hw,
                                      needs_view2=ds.frames_2 is not None)
                printYellow(
                    f"over budget -> hybrid cache will keep {hot}/"
                    f"{ds.n_samples} frames resident "
                    f"({100 * hot / ds.n_samples:.0f}% hot); on a "
                    f"{len(devices)}-device mesh, --device-cache sharded "
                    f"caches {min(1.0, len(devices) * hot / ds.n_samples) * 100:.0f}%")
    return 2 if link_sick else 0


if __name__ == "__main__":
    raise SystemExit(main())
