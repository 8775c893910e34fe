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
