#!/usr/bin/env bash
# One-command real-TPU validation (e.g. after a tunnel outage — see
# docs/STATUS.md): the driver's compile gate, the full bench, and the perf
# gate. Every stage is time-bounded and the underlying entry points carry
# their own backend watchdogs (utils/platform.probe_backend), so a wedged
# tunnel fails loudly in minutes instead of hanging.
set -e
cd "$(dirname "$0")/.."

echo "== entry() compile gate (real TPU) =="
timeout 900 python -c "import __graft_entry__ as g; import jax; \
fn, a = g.entry(); print('states', jax.jit(fn)(*a)[0].shape)"

echo "== bench (one JSON line) =="
timeout 2400 python bench.py

echo "== perf gate (vs newest BENCH_r*.json) =="
timeout 3000 python ci/perf_gate.py
echo "tpu_checkup: ALL OK"
