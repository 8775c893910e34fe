"""Multi-host (DCN) path: 2-process gloo CPU cluster through the REAL CLI.

Replaces the reference's (nonexistent) distributed testing and exercises what
the virtual 8-device mesh tests cannot: jax.distributed.initialize, the
process_count>1 branch of parallel/mesh.shard_batch
(make_array_from_process_local_data), cross-process collectives, and the
same-seed => same-global-batch assumption (checked by loss parity with a
single-process run over the identical global device count).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_train(data_folder, log_folder, n_devices, extra, timeout=600,
               cache="off"):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + f" --xla_force_host_platform_device_count"
                          f"={n_devices}")
    cmd = [sys.executable, "train.py", "--data-folder", data_folder,
           "--losses", "autoencoder", "--state-dim", "4", "-bs", "16",
           "--epochs", "1", "--seed", "3", "--device-cache", cache,
           "--no-display-plots", "--log-folder", log_folder] + extra
    return subprocess.Popen(cmd, cwd=REPO, env=env, text=True,
                            stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT), timeout


def _best_val(output: str) -> float:
    for line in output.splitlines():
        if "Best validation loss:" in line:
            return float(line.split(":")[-1].strip().replace("\x1b[0m", ""))
    raise AssertionError(f"no val loss in output:\n{output[-2000:]}")


@pytest.mark.slow
def test_two_process_training_matches_single_process(tmp_path):
    from srl_zoo_tpu.data.synthetic import generate_dataset
    data = str(tmp_path / "synth")
    generate_dataset(data, n_episodes=4, episode_len=24, img_size=32, seed=0)

    # single-process reference over the same 8 global devices
    p, to = _run_train(data, str(tmp_path / "single"), 8, [])
    out_single, _ = p.communicate(timeout=to)
    assert p.returncode == 0, out_single[-2000:]

    # 2 processes x 4 local devices = the same 8-device mesh over gloo
    port = _free_port()
    dist = ["--coordinator-address", f"127.0.0.1:{port}",
            "--num-processes", "2"]
    log = str(tmp_path / "multi")
    p0, to = _run_train(data, log, 4, dist + ["--process-id", "0"])
    p1, _ = _run_train(data, log, 4, dist + ["--process-id", "1"])
    out0, _ = p0.communicate(timeout=to)
    out1, _ = p1.communicate(timeout=to)
    assert p0.returncode == 0, out0[-2000:]
    assert p1.returncode == 0, out1[-2000:]

    # every process computed the same (all-reduced) losses...
    v0, v1 = _best_val(out0), _best_val(out1)
    assert v0 == v1, (v0, v1)
    # ...and the 2-process global batch assembly matches single-process
    # training bit-for-bit up to collective reduction order
    np.testing.assert_allclose(v0, _best_val(out_single), rtol=1e-4)

    # process 0 owns the artifacts; process 1 wrote to its scratch folder
    assert os.path.exists(os.path.join(log, "states_rewards.npz"))
    assert os.path.exists(os.path.join(log, ".proc1"))
    states = np.load(os.path.join(log, "states_rewards.npz"))["states"]
    assert states.shape[1] == 4 and np.all(np.isfinite(states))


@pytest.mark.slow
def test_two_process_cached_scan(tmp_path):
    """The production pod path: HBM cache + whole-epoch scan across
    processes (stacked batches device_put with P(None, 'data') sharding
    spanning both hosts; cache replicated cross-process)."""
    from srl_zoo_tpu.data.synthetic import generate_dataset
    data = str(tmp_path / "synth")
    generate_dataset(data, n_episodes=4, episode_len=24, img_size=32, seed=0)

    port = _free_port()
    dist = ["--coordinator-address", f"127.0.0.1:{port}",
            "--num-processes", "2"]
    log = str(tmp_path / "multi")
    p0, to = _run_train(data, log, 4, dist + ["--process-id", "0"],
                        cache="on")
    p1, _ = _run_train(data, log, 4, dist + ["--process-id", "1"],
                       cache="on")
    out0, _ = p0.communicate(timeout=to)
    out1, _ = p1.communicate(timeout=to)
    assert p0.returncode == 0, out0[-2000:]
    assert p1.returncode == 0, out1[-2000:]
    assert "Caching dataset in HBM" in out0
    assert _best_val(out0) == _best_val(out1)
    states = np.load(os.path.join(log, "states_rewards.npz"))["states"]
    assert np.all(np.isfinite(states))
