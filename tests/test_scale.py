"""Over-RAM scale story (VERDICT r3 #6): a dataset well past the (test-sized)
HBM budget trains via the hybrid cache with bounded HOST memory — the loader
and hot-store rotation read the frames.npy memmap per batch and never
materialize the store — and via ``--device-cache sharded`` on the virtual
8-device mesh.

Memory metric: end-of-run ``VmData`` (anonymous/private mappings), not
ru_maxrss — on a no-memory-pressure host every memmap page the epoch touches
stays RESIDENT (file-backed page cache counts toward peak RSS), so ru_maxrss
grows with dataset size even for a perfectly-streaming loader. A loader that
np.asarray'd the store would hold it on the heap, which VmData catches.

The real-scale counterpart (64k frames @ 224px, 9.6 GiB, real TPU) is the
RESULTS.md "over-RAM hybrid" row; this test pins the mechanism at CI scale.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_RSS_WORKER = """
import os, sys, resource
os.environ["JAX_PLATFORMS"] = "cpu"
n_local = sys.argv[4] if len(sys.argv) > 4 else "8"
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
    f" --xla_force_host_platform_device_count={n_local}"
sys.path.insert(0, os.getcwd())
import jax
jax.config.update("jax_platforms", "cpu")
from srl_zoo_tpu.config import SRLConfig
from srl_zoo_tpu.data.schema import load_dataset
from srl_zoo_tpu.training.learner import SRL4robotics
data, log, cache = sys.argv[1:4]
ds = load_dataset(data)
cfg = SRLConfig(state_dim=4, img_height=64, img_width=64, batch_size=32,
                epochs=1, losses=(("autoencoder", 1.0),),
                split_dims=(("autoencoder", -1),), model_type="mlp",
                n_actions=ds.n_actions, n_reward_classes=ds.n_reward_classes,
                data_folder=data, device_cache=cache, log_folder=log)
learner = SRL4robotics(cfg, log_folder=log)
learner.learn(ds)
vmdata = None
with open("/proc/self/status") as f:
    for line in f:
        if line.startswith("VmData:"):
            vmdata = int(line.split()[1])
print("VMDATA_KB", vmdata)
print("MAXRSS_KB", resource.getrusage(resource.RUSAGE_SELF).ru_maxrss)
"""


def _run_worker(script, data, log, cache, budget_mb, timeout=1200,
                n_local=8):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["SRL_ZOO_CACHE_BUDGET_MB"] = str(budget_mb)
    p = subprocess.Popen([sys.executable, str(script), data, log, cache,
                          str(n_local)],
                         cwd=REPO, env=env, text=True,
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    out, _ = p.communicate(timeout=timeout)
    assert p.returncode == 0, out[-3000:]
    vmdata = int(out.split("VMDATA_KB")[1].split()[0])
    return out, vmdata


@pytest.mark.slow
def test_over_budget_hybrid_bounded_host_memory(tmp_path):
    from srl_zoo_tpu.data.synthetic import generate_dataset
    script = tmp_path / "worker.py"
    script.write_text(_RSS_WORKER)
    # same geometry, 4x the frames: only the dataset size differs between the
    # two runs, so the VmData delta isolates what the framework holds PER
    # FRAME on the host heap. control store = 70 MiB, big store = 283 MiB —
    # a loader that materialized the big store would add >=213 MB of anon
    # memory over control; streaming adds only the (shared) hot-store upload
    # staging and O(batch) buffers.
    control = str(tmp_path / "control")
    big = str(tmp_path / "big")
    generate_dataset(control, n_episodes=60, episode_len=100, img_size=64,
                     seed=0)
    generate_dataset(big, n_episodes=240, episode_len=100, img_size=64,
                     seed=0)

    # 1 virtual device: the RSS mechanism has no mesh dependence, and XLA's
    # CPU in-process collectives abort (AwaitAndLogIfStuck check failure)
    # when a 750-step 8-participant program time-shares this 1-core host
    out_c, vm_c = _run_worker(script, control, str(tmp_path / "log_c"),
                              "hybrid", budget_mb=32, n_local=1)
    out_b, vm_b = _run_worker(script, big, str(tmp_path / "log_b"),
                              "hybrid", budget_mb=32, n_local=1)
    assert "Hybrid HBM cache" in out_c, out_c[-2000:]
    assert "Hybrid HBM cache" in out_b, out_b[-2000:]
    # both runs share the same 32 MiB hot budget, so the hot-store size is
    # identical; the 213 MiB store-size delta must NOT show up on the heap
    delta_mb = (vm_b - vm_c) / 1024.0
    assert delta_mb < 100, (
        f"big-dataset run holds {delta_mb:.0f} MB more anonymous memory than "
        f"control (stores differ by 213 MB) — is the loader materializing "
        f"the frames memmap? control={vm_c} KB big={vm_b} KB")
    # and the run actually trained
    hist = np.load(tmp_path / "log_b" / "loss_history.npz")
    assert np.isfinite(hist["train/total"]).all()


@pytest.mark.slow
def test_over_budget_sharded_store_virtual_mesh(tmp_path):
    """The same over-budget dataset via --device-cache sharded on the
    8-device virtual mesh: per-'chip' budget is exceeded but the aggregate
    fits (budget 64 MB/chip x 8 = 512 MB >= 283 MB store)."""
    from srl_zoo_tpu.data.synthetic import generate_dataset
    script = tmp_path / "worker.py"
    script.write_text(_RSS_WORKER)
    big = str(tmp_path / "big")
    generate_dataset(big, n_episodes=240, episode_len=100, img_size=64,
                     seed=0)
    out, _ = _run_worker(script, big, str(tmp_path / "log_s"), "sharded",
                         budget_mb=64)
    assert "Sharding dataset over 8 devices" in out, out[-2000:]
    hist = np.load(tmp_path / "log_s" / "loss_history.npz")
    assert np.isfinite(hist["train/total"]).all()
