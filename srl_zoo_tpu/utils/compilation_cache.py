"""Persistent XLA compilation cache for the CLIs.

First compile of the train step is tens of seconds on TPU; pipeline.py runs
many train.py configurations whose programs differ only in loss wiring. A
persistent on-disk cache makes every repeated (config, shape) free.
Disable with SRL_ZOO_NO_COMPILATION_CACHE=1.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    if os.environ.get("SRL_ZOO_NO_COMPILATION_CACHE"):
        return
    import jax

    cache_dir = path or os.environ.get(
        "SRL_ZOO_COMPILATION_CACHE",
        os.path.expanduser("~/.cache/srl_zoo_tpu/xla"))
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without these flags: run uncached
