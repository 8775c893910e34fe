"""JAX_PLATFORMS env must be binding for CLI subprocesses.

The axon TPU sitecustomize registers its PJRT plugin at interpreter start
and overrides the platform AFTER the env var was read, so
``JAX_PLATFORMS=cpu python train.py`` silently ran on the tunneled TPU
(1-device meshes; the 2-process "gloo cluster" tests passed vacuously).
utils/platform.honor_env_platform re-asserts the env through jax.config.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_PROBE = (
    "from srl_zoo_tpu.utils.platform import honor_env_platform; "
    "honor_env_platform(); import jax; "
    "print('PLATFORM=' + jax.devices()[0].platform, len(jax.devices()))"
)


def test_env_platform_is_binding():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=4")
    proc = subprocess.run([sys.executable, "-c", _PROBE], cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "PLATFORM=cpu 4" in proc.stdout, proc.stdout


def test_unset_env_keeps_host_default():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, "-c",
         "from srl_zoo_tpu.utils.platform import honor_env_platform; "
         "honor_env_platform(); import jax.numpy; print('IMPORT_OK')"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "IMPORT_OK" in proc.stdout


def test_in_process_pin_beats_env():
    """Priority: in-process jax.config pin > env var > plugin default —
    ci/smoke.sh pins cpu before calling train.main() and the ambient host
    env (axon) must not undo it."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "axon"
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "from srl_zoo_tpu.utils.platform import honor_env_platform; "
        "honor_env_platform(); "
        "print('PLATFORM=' + jax.devices()[0].platform)"
    )
    proc = subprocess.run([sys.executable, "-c", code], cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "PLATFORM=cpu" in proc.stdout, proc.stdout
