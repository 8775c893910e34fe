"""Make the JAX_PLATFORMS environment variable actually binding.

On hosts where a PJRT plugin registers itself at interpreter start (the
axon TPU sitecustomize does, overriding ``jax_platforms`` after the env
var was read), ``JAX_PLATFORMS=cpu python train.py`` silently runs on the
TPU anyway. Measured fallout before this fix: the 2-process "CPU gloo
cluster" tests were really two processes time-sharing the ONE tunneled TPU
chip with 1-device meshes (cross-process collectives never exercised on
the CLI path), slow as a result, and flaky at the distributed shutdown
barrier.

Every CLI entry point calls :func:`honor_env_platform` before its first
JAX backend touch: if the user asked for a platform via the environment,
re-assert it through jax.config (which wins over the plugin's override);
if the env is unset, do nothing and keep the host default.
"""

from __future__ import annotations

import os


# The config values an auto-registering plugin leaves behind. Anything ELSE
# in jax.config.jax_platforms is a deliberate in-process choice (e.g.
# ci/smoke.sh pins "cpu" before calling train.main()) and must win over the
# environment — priority: in-process pin > env var > plugin default.
_PLUGIN_DEFAULTS = ("", None, "axon,cpu", "axon")


class BackendInitTimeout(RuntimeError):
    """The first backend touch did not return within the bound — the axon
    tunnel has been observed to wedge during device enumeration (2026-08-17
    outage: backend registers, jax.devices() never returns). A bounded, loud
    failure the caller can record beats an infinite hang of the driver's
    bench/compile gates."""


def run_bounded(fn, timeout_s: float, what: str):
    """Run ``fn()`` in a daemon thread; return its result, re-raise its real
    exception, or raise :class:`BackendInitTimeout` after ``timeout_s``.

    For backend-touching calls ONLY (enumeration, first transfer): on timeout
    the stuck thread keeps running and may hold client locks, so the process
    should finish its reporting and exit rather than retry the backend."""
    import threading

    box = {}

    def _call():
        try:
            box["result"] = fn()
        except BaseException as e:  # surfaced to the caller below
            box["error"] = e

    t = threading.Thread(target=_call, daemon=True)
    t.start()
    t.join(timeout_s)
    if "error" in box:
        raise box["error"]
    if "result" not in box:
        raise BackendInitTimeout(
            f"{what} timed out after {timeout_s:.0f}s — backend hung "
            "(TPU tunnel outage on this host, not a framework failure); "
            "retry when the tunnel recovers")
    return box["result"]


def probe_backend(timeout_s: float = 240.0):
    """Bounded first backend touch: returns ``jax.devices()`` or raises
    :class:`BackendInitTimeout`. Use before any driver-critical compile/bench
    so a hung tunnel produces a recordable failure, not an infinite hang."""
    def _touch():
        import jax
        return jax.devices()

    return run_bounded(_touch, timeout_s, "device enumeration")


def require_backend_or_die(timeout_s: float = 240.0) -> None:
    """CLI guard (single-process only — multi-host enumeration legitimately
    blocks until every process joins): bounded first backend touch; on a
    wedged transport print a diagnosis and exit 2 instead of hanging
    forever. utils/doctor.py gives the same diagnosis standalone."""
    try:
        probe_backend(timeout_s)
    except BackendInitTimeout as e:
        import sys

        from srl_zoo_tpu.utils import printRed
        printRed(f"backend init FAILED: {e}")
        printRed("diagnosis: the platform plugin registered but device "
                 "enumeration hung — a transport/tunnel outage, not a "
                 "framework failure. Retry later, or run on CPU with "
                 "JAX_PLATFORMS=cpu.")
        sys.exit(2)


def honor_env_platform() -> None:
    env = os.environ.get("JAX_PLATFORMS", "").strip()
    if not env:
        return
    import jax

    if jax.config.jax_platforms not in _PLUGIN_DEFAULTS:
        return  # someone pinned a platform in-process — respect it
    try:
        jax.config.update("jax_platforms", env)
    except RuntimeError:
        # backend already initialized — too late to switch; leave it be
        # (callers invoke this first thing, so this only happens when a
        # library user initialized JAX before calling a CLI main()).
        pass
