"""Summarize jax.profiler traces without Perfetto/XProf UI access.

``--profile`` (train.py) writes an xplane trace into <log>/profile; this
module parses it with the TensorFlow profiler plugin (installed alongside TF
on this image) and prints the per-category device-time table — enough to see
where a step's time goes on a headless host.

CLI: python -m srl_zoo_tpu.utils.profiling --log-folder logs/<run>
"""

from __future__ import annotations

import glob
import json
import os
from typing import List, Tuple


def summarize_xplane(xplane_path: str, top: int = 12
                     ) -> List[Tuple[str, float, float]]:
    """Returns [(category, pct_of_device_time, flops_utilization_pct)]."""
    from tensorflow.python.profiler.internal import (
        _pywrap_profiler_plugin as pp)

    out = pp.xspace_to_tools_data([xplane_path], "op_profile")
    data = json.loads(out[0])
    cat = data.get("byCategory", {})
    total = cat.get("metrics", {}).get("rawTime", 0) or 1
    rows = []
    for ch in cat.get("children", []):
        m = ch.get("metrics", {})  # CPU traces may omit metrics on some nodes
        rows.append((ch.get("name", "?"),
                     100.0 * m.get("rawTime", 0) / total,
                     100.0 * m.get("flops", 0.0)))
    rows.sort(key=lambda r: -r[1])
    return rows[:top]


def summarize_profile_dir(profile_dir: str, top: int = 12
                          ) -> List[Tuple[str, float, float]]:
    paths = sorted(glob.glob(os.path.join(profile_dir, "**", "*.xplane.pb"),
                             recursive=True))
    if not paths:
        raise FileNotFoundError(f"No xplane traces under {profile_dir} — "
                                "run training with --profile first")
    return summarize_xplane(paths[-1], top=top)


def main(argv=None):
    from srl_zoo_tpu.utils.platform import honor_env_platform
    honor_env_platform()  # JAX_PLATFORMS must be binding in every CLI
    import argparse

    p = argparse.ArgumentParser(description="Summarize a --profile trace")
    p.add_argument("--log-folder", type=str, required=True)
    p.add_argument("--top", type=int, default=12)
    args = p.parse_args(argv)
    rows = summarize_profile_dir(os.path.join(args.log_folder, "profile"),
                                 top=args.top)
    print(f"{'% device time':>14}  {'FLOPs util':>10}  category")
    for name, pct, fl in rows:
        print(f"{pct:13.1f}%  {fl:9.1f}%  {name}")
    return rows


if __name__ == "__main__":
    main()
