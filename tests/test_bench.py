"""Perf-smoke (SURVEY.md §4.5): the bench machinery runs end to end and emits
the one-line JSON contract the driver consumes. Numbers are validated for
shape, not magnitude (tests run on CPU)."""

import json


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
