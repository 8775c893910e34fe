"""The examples/ scripts run end to end (slow lane — each trains a tiny
model through the real CLIs). They are the companion-repo hand-off recipes
(record -> preprocess -> train; downstream RL consumption; torch policy on
exported features), so a regression here breaks the documented user paths.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
@pytest.mark.parametrize("name", ["downstream_rl", "record_and_train",
                                  "torch_policy"])
def test_example_runs_end_to_end(name, tmp_path):
    if name == "torch_policy":
        pytest.importorskip("torch")  # optional dep (requirements.txt)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    # every example creates its workspace via tempfile (honors TMPDIR)
    env["TMPDIR"] = str(tmp_path)
    proc = subprocess.run([sys.executable, f"examples/{name}.py"], cwd=REPO,
                          env=env, capture_output=True, text=True,
                          timeout=540)
    assert proc.returncode == 0, proc.stderr[-2000:]
