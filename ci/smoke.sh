#!/usr/bin/env bash
# CI smoke pipeline (reference: .travis.yml ran an end-to-end smoke run on a
# tiny dataset per loss family; SURVEY.md §2.16). Generates the synthetic
# dataset, trains 1 epoch for each BASELINE config family, runs the KNN eval,
# and asserts exit 0. Runs on CPU (no TPU required).
set -euo pipefail
cd "$(dirname "$0")/.."

export XLA_FLAGS="${XLA_FLAGS:-} --xla_force_host_platform_device_count=8"

python - <<'EOF'
import jax
try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

from srl_zoo_tpu.data.synthetic import generate_dataset
generate_dataset("/tmp/srl_smoke/synth", n_episodes=3, episode_len=16,
                 img_size=32, seed=0)
generate_dataset("/tmp/srl_smoke/synth_mv", n_episodes=3, episode_len=16,
                 img_size=32, seed=0, multi_view=True)

from train import main as train_main
from srl_zoo_tpu.evaluation.knn_images import main as knn_main

CONFIGS = [
    (["--losses", "autoencoder"], "synth"),                       # config 1
    (["--losses", "vae", "--beta", "2"], "synth"),                # config 2
    (["--losses", "priors"], "synth"),                            # config 3
    (["--losses", "autoencoder:1:4", "inverse:2:2",               # config 4
      "forward:1:1", "reward:1:1"], "synth"),
    (["--losses", "triplet", "--model-type", "resnet",            # config 5
      "--multi-view"], "synth_mv"),
]
for i, (flags, ds) in enumerate(CONFIGS):
    log = f"/tmp/srl_smoke/log{i}"
    train_main(["--data-folder", f"/tmp/srl_smoke/{ds}", "--state-dim", "8",
                "-bs", "8", "--epochs", "1", "--seed", "1",
                "--log-folder", log] + flags)
    knn_main(["--log-folder", log, "--n-grids", "0"])
    print(f"smoke config {i + 1} OK")
print("SMOKE PASSED")
EOF

# throughput non-regression gate (skips on CPU-only hosts; exit 3 = the
# device backend is wedged — an environment outage, not a regression, so
# warn and keep the CPU smoke green; any other nonzero stays red)
rc=0
python ci/perf_gate.py || rc=$?
if [ "$rc" -eq 3 ]; then
    echo "smoke: perf gate SKIPPED (backend outage — see message above)"
elif [ "$rc" -ne 0 ]; then
    exit "$rc"
fi
