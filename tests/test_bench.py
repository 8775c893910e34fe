"""Perf-smoke (SURVEY.md §4.5): the bench machinery runs end to end and emits
the one-line JSON contract the driver consumes. Numbers are validated for
shape, not magnitude (tests run on CPU)."""

import json
import os


def test_bench_smoke_json_contract(capsys):
    import bench
    bench.main(["--smoke"])
    line = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(line)
    assert rec["metric"] == "images/sec/chip"
    assert rec["unit"] == "images/sec/chip"
    assert rec["value"] > 0
    assert rec["vs_baseline"] > 0
    assert "detail" in rec and "device" in rec
    assert not any(k.endswith("_error") for k in rec["detail"])


def test_perf_gate_paths(tmp_path):
    """The non-regression gate passes within the band, fails beyond it, and
    parses the driver's wrapped BENCH_r*.json format (SURVEY.md §4.5)."""
    import json
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    gate = os.path.join(repo, "ci", "perf_gate.py")
    # the gate compares against the NEWEST BENCH_r*.json — derive base_val
    # the same way, or the band assertions drift as rounds accumulate
    sys.path.insert(0, os.path.join(repo, "ci"))
    try:
        import perf_gate
    finally:
        sys.path.pop(0)
    base = perf_gate.latest_baseline()
    if base is None:
        import pytest
        pytest.skip("no BENCH_r*.json baseline in this checkout")
    base_val = perf_gate.extract_value(base[1])

    def run(value):
        cur = tmp_path / "cur.json"
        cur.write_text(json.dumps({"value": value}))
        return subprocess.run([sys.executable, gate, "--current", str(cur)],
                              capture_output=True, text=True).returncode

    assert run(base_val * 1.05) == 0
    assert run(base_val * 0.95) == 0   # inside the 10% band
    assert run(base_val * 0.80) == 1   # regression
