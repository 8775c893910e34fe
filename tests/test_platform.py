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


def test_run_bounded_timeout_raises():
    """The shared backend watchdog (bench.py, __graft_entry__, perf_gate all
    delegate here): a call that never returns raises BackendInitTimeout
    within the bound instead of hanging the caller."""
    import time

    import pytest

    from srl_zoo_tpu.utils.platform import BackendInitTimeout, run_bounded

    t0 = time.monotonic()
    with pytest.raises(BackendInitTimeout, match="tunnel outage"):
        run_bounded(lambda: time.sleep(600), timeout_s=0.5, what="probe")
    assert time.monotonic() - t0 < 30


def test_run_bounded_surfaces_real_exception_and_result():
    import pytest

    from srl_zoo_tpu.utils.platform import run_bounded

    assert run_bounded(lambda: 41 + 1, timeout_s=5, what="x") == 42

    def boom():
        raise KeyError("real cause")

    with pytest.raises(KeyError, match="real cause"):
        run_bounded(boom, timeout_s=5, what="x")


def test_probe_backend_returns_devices():
    import jax

    from srl_zoo_tpu.utils.platform import probe_backend

    assert len(probe_backend(timeout_s=120)) == len(jax.devices())


def test_require_backend_or_die_exits_2(monkeypatch, capsys):
    """The CLI guard (train/pipeline/serve single-process mains) turns a
    wedged transport into a diagnosed exit-2, not an infinite hang."""
    import pytest

    import srl_zoo_tpu.utils.platform as plat

    def hung(timeout_s=240.0):
        raise plat.BackendInitTimeout("device enumeration timed out (test)")

    monkeypatch.setattr(plat, "probe_backend", hung)
    with pytest.raises(SystemExit) as exc:
        plat.require_backend_or_die()
    assert exc.value.code == 2
    assert "diagnosis" in capsys.readouterr().out

    # and the happy path is a no-op
    monkeypatch.setattr(plat, "probe_backend", lambda timeout_s=240.0: [1])
    plat.require_backend_or_die()
