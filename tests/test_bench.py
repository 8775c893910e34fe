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
    assert rec["link_mbps"] > 0  # host-link bandwidth recorded (VERDICT r2)
    assert rec["link_mbps_max"] >= rec["link_mbps"]
    assert rec["rtt_ms"] > 0  # dispatch-latency probe recorded (r4 flap)
    assert "degraded" not in rec  # CPU in-process dispatch is never sick
    # per-row methodology versions recorded so a measurement change can
    # never read as a perf change (VERDICT r4 weak #6)
    assert rec["methodology"]["cached_knn20k_qps"] == 2


def test_bench_backend_watchdog(tmp_path):
    """A hung TPU tunnel (device enumeration never returns — observed on
    this host 2026-08-17) must yield a parseable error line and a nonzero
    exit, not an indefinite driver hang."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = (
        "import sys, types, time, json\n"
        "fake = types.ModuleType('jax')\n"
        "fake.devices = lambda *a: time.sleep(600)\n"
        "sys.modules['jax'] = fake\n"
        "import bench\n"
        "bench._devices_with_watchdog(timeout_s=1.0)\n"
        "print('UNREACHABLE')\n"
    )
    proc = subprocess.run([sys.executable, "-c", code], cwd=repo,
                          capture_output=True, text=True, timeout=120)
    assert proc.returncode == 1
    assert "UNREACHABLE" not in proc.stdout
    rec = json.loads(proc.stdout.strip().splitlines()[-1])
    assert rec["value"] == 0.0
    assert "timed out" in rec["error"]


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


def test_bench_mid_run_wedge_bails_with_partial_detail():
    """A tunnel that wedges AFTER enumeration (a row's compile never
    returns) must print the parseable error line carrying the rows already
    measured, then exit 1 — not hang the remaining rows."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = (
        "import srl_zoo_tpu.utils.platform as plat\n"
        "orig = plat.run_bounded\n"
        "def fake(fn, timeout_s, what):\n"
        "    if what == 'cached_smoke':\n"
        "        raise plat.BackendInitTimeout(f'{what} timed out (test)')\n"
        "    return orig(fn, timeout_s, what)\n"
        "plat.run_bounded = fake\n"
        "import bench\n"
        "bench.main(['--smoke'])\n"
    )
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run([sys.executable, "-c", code], cwd=repo, env=env,
                          capture_output=True, text=True, timeout=300)
    assert proc.returncode == 1
    rec = json.loads(proc.stdout.strip().splitlines()[-1])
    assert rec["value"] == 0.0
    assert "cached_smoke" in rec["error"] and "partial detail" in rec["error"]


def test_perf_gate_fails_loudly_on_backend_timeout(monkeypatch, capsys):
    """perf_gate's own first backend touch is bounded: a wedged tunnel fails
    the gate with a message instead of hanging it before bench.py ever
    runs."""
    import sys

    import srl_zoo_tpu.utils.platform as plat

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "ci"))
    try:
        import perf_gate
    finally:
        sys.path.pop(0)
    if perf_gate.latest_baseline() is None:
        import pytest
        pytest.skip("no BENCH_r*.json baseline in this checkout")

    def hung_probe(timeout_s=240.0):
        raise plat.BackendInitTimeout("device enumeration timed out (test)")

    monkeypatch.setattr(plat, "probe_backend", hung_probe)
    rc = perf_gate.main([])
    out = capsys.readouterr().out
    assert rc == 3  # outage exit code: smoke warns-and-continues on 3 only
    assert "BLOCKED" in out and "timed out" in out


def test_perf_gate_detail_rows():
    """Detail-row gating (VERDICT r2 weak #3): cached_* rows are hard-gated;
    streaming_* rows compare img/s per link-MB/s so a slow tunnel day is not
    a code regression; hybrid_* is report-only."""
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "ci"))
    try:
        import perf_gate
    finally:
        sys.path.pop(0)

    base = {"value": 17000.0, "link_mbps": 100.0,
            "detail": {"cached_a": 17000.0, "streaming_b": 300.0,
                       "hybrid_c": 700.0, "broken_d": 0.0,
                       "broken_d_error": "boom"}}

    def verdicts(cur, band=0.15):
        rows = perf_gate.gate_details(base, cur, band)
        return {name: bad for name, _, bad in rows}

    # identical run: everything OK
    ok = verdicts(dict(base))
    assert ok == {"cached_a": False, "streaming_b": False, "hybrid_c": False}
    # cached regression beyond the band fails
    cur = {"value": 17000.0, "link_mbps": 100.0,
           "detail": {"cached_a": 8000.0, "streaming_b": 300.0,
                      "hybrid_c": 700.0}}
    assert verdicts(cur)["cached_a"] is True
    # streaming halved BECAUSE the link halved: link-normalized -> OK
    cur = {"value": 17000.0, "link_mbps": 50.0,
           "detail": {"cached_a": 17000.0, "streaming_b": 150.0,
                      "hybrid_c": 400.0}}
    v = verdicts(cur)
    assert v["streaming_b"] is False and v["hybrid_c"] is False
    # streaming halved at the SAME link bandwidth -> real regression
    cur = {"value": 17000.0, "link_mbps": 100.0,
           "detail": {"cached_a": 17000.0, "streaming_b": 150.0,
                      "hybrid_c": 700.0}}
    assert verdicts(cur)["streaming_b"] is True
    # legacy baseline without link_mbps: streaming is report-only
    legacy = {k: v for k, v in base.items() if k != "link_mbps"}
    rows = perf_gate.gate_details(legacy, cur, 0.15)
    row = {name: (desc, bad) for name, desc, bad in rows}["streaming_b"]
    assert "report-only" in row[0] and row[1] is False


def test_perf_gate_per_row_link_normalization():
    """The tunnel link drifts 19-41 MB/s minute-to-minute (measured
    2026-08-19), so link rows normalize by their own bracketed
    <row>_link_mbps when present — a start-of-run link_mbps misattributed a
    healthy streaming row as a -63% regression. The metadata rows themselves
    are never gated as rates."""
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "ci"))
    try:
        import perf_gate
    finally:
        sys.path.pop(0)

    base = {"value": 17000.0, "link_mbps": 40.0,
            "detail": {"streaming_b": 320.0, "streaming_b_link_mbps": 40.0}}

    def rows_of(cur):
        return {n: (d, bad) for n, d, bad in
                perf_gate.gate_details(base, cur, 0.15)}

    # the _link_mbps metadata row is not itself a gated rate
    rows = rows_of(dict(base))
    assert "streaming_b_link_mbps" not in rows
    assert rows["streaming_b"][1] is False

    # row halved BECAUSE its own bracketed link halved, while the stale
    # doc-level probe still says 40: per-row link -> OK (the observed case)
    cur = {"value": 17000.0, "link_mbps": 40.0,
           "detail": {"streaming_b": 160.0, "streaming_b_link_mbps": 20.0}}
    assert rows_of(cur)["streaming_b"][1] is False

    # row halved at the SAME per-row link: a real regression, even though a
    # halved doc-level probe would have excused it
    cur = {"value": 17000.0, "link_mbps": 20.0,
           "detail": {"streaming_b": 160.0, "streaming_b_link_mbps": 40.0}}
    assert rows_of(cur)["streaming_b"][1] is True

    # per-row link on one side only: falls back to that side's doc link
    cur = {"value": 17000.0, "link_mbps": 20.0,
           "detail": {"streaming_b": 160.0}}
    assert rows_of(cur)["streaming_b"][1] is False


def test_perf_gate_missing_row_is_visible():
    """A renamed/dropped bench row must not silently lose gate coverage:
    missing cached_* rows fail, missing streaming_* rows still print."""
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "ci"))
    try:
        import perf_gate
    finally:
        sys.path.pop(0)

    base = {"value": 17000.0, "link_mbps": 100.0,
            "detail": {"cached_a": 17000.0, "streaming_b": 300.0}}
    cur = {"value": 17000.0, "link_mbps": 100.0,
           "detail": {"cached_other": 1.0}}
    rows = {name: (desc, bad)
            for name, desc, bad in perf_gate.gate_details(base, cur, 0.15)}
    assert rows["cached_a"][1] is True
    assert "MISSING" in rows["cached_a"][0]
    assert rows["streaming_b"][1] is False  # report-only family
    assert "MISSING" in rows["streaming_b"][0]
    # a detail-less current doc is a legacy format, not a rename: report-only
    rows = {n: (d, b) for n, d, b in
            perf_gate.gate_details(base, {"value": 17000.0}, 0.15)}
    assert rows["cached_a"][1] is False


def test_perf_gate_hybrid_parts_are_gated():
    """The hybrid row's phases gate separately (VERDICT r3 next #5):
    hybrid_hot_* is chip-bound -> hard-gated; hybrid_cold_* is link-bound ->
    link-normalized; the combined hybrid_* row stays report-only. A -30%
    hot-phase drop at an equal link must FAIL."""
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "ci"))
    try:
        import perf_gate
    finally:
        sys.path.pop(0)

    base = {"value": 17000.0, "link_mbps": 100.0,
            "detail": {"hybrid_b128": 700.0, "hybrid_hot_b128": 15000.0,
                       "hybrid_cold_b128": 350.0, "hybrid_f_hot": 0.5}}

    def verdicts(cur, band=0.15):
        return {n: bad for n, _, bad in
                perf_gate.gate_details(base, cur, band)}

    assert verdicts(dict(base)) == {"hybrid_b128": False,
                                    "hybrid_hot_b128": False,
                                    "hybrid_cold_b128": False,
                                    "hybrid_f_hot": False}
    # synthetic -30% hot regression at equal link: fails (the r2->r3 blind
    # spot where a combined 688->548 drop was unattributable)
    cur = {"value": 17000.0, "link_mbps": 100.0,
           "detail": {"hybrid_b128": 500.0, "hybrid_hot_b128": 10500.0,
                      "hybrid_cold_b128": 350.0, "hybrid_f_hot": 0.5}}
    v = verdicts(cur)
    assert v["hybrid_hot_b128"] is True
    assert v["hybrid_b128"] is False  # combined stays report-only
    # cold halved BECAUSE the link halved: link-normalized -> OK
    cur = {"value": 17000.0, "link_mbps": 50.0,
           "detail": {"hybrid_b128": 400.0, "hybrid_hot_b128": 15000.0,
                      "hybrid_cold_b128": 175.0, "hybrid_f_hot": 0.5}}
    assert verdicts(cur)["hybrid_cold_b128"] is False
    # cold halved at the SAME link: real regression
    cur = {"value": 17000.0, "link_mbps": 100.0,
           "detail": {"hybrid_b128": 400.0, "hybrid_hot_b128": 15000.0,
                      "hybrid_cold_b128": 175.0, "hybrid_f_hot": 0.5}}
    assert verdicts(cur)["hybrid_cold_b128"] is True


def test_perf_gate_skips_outage_baselines(tmp_path, monkeypatch):
    """latest_baseline must skip BENCH files whose headline is 0/error (a
    driver-side outage) instead of letting them become a vacuous floor
    (VERDICT r3 weak #7)."""
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "ci"))
    try:
        import perf_gate
    finally:
        sys.path.pop(0)

    (tmp_path / "BENCH_r01.json").write_text(json.dumps({"value": 9000.0}))
    (tmp_path / "BENCH_r02.json").write_text(json.dumps(
        {"value": 0.0, "error": "backend init timed out"}))
    monkeypatch.setattr(perf_gate, "REPO", str(tmp_path))
    path, doc = perf_gate.latest_baseline()
    assert path.endswith("BENCH_r01.json")
    assert perf_gate.extract_value(doc) == 9000.0
    # a torn/unparseable newest file is skipped too (crashed driver write)
    (tmp_path / "BENCH_r03.json").write_text("not json at all")
    path, _ = perf_gate.latest_baseline()
    assert path.endswith("BENCH_r01.json")
    # nothing usable at all -> None
    (tmp_path / "BENCH_r01.json").write_text(json.dumps({"value": 0.0}))
    assert perf_gate.latest_baseline() is None


def test_perf_gate_degraded_lines(tmp_path, monkeypatch, capsys):
    """The 2026-08-19 tunnel flap mode: bench.py's RTT probe marks a
    parseable-but-transport-sick line ``degraded`` (944 img/s on a chip that
    benches 17.5k). Such a line must (a) never become the baseline floor and
    (b) BLOCK the gate (exit 3 — environment outage), never fail it (1) or
    pass it (0)."""
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "ci"))
    try:
        import perf_gate
    finally:
        sys.path.pop(0)

    (tmp_path / "BENCH_r01.json").write_text(json.dumps(
        {"value": 17000.0, "link_mbps": 40.0,
         "detail": {"cached_a": 17000.0}}))
    (tmp_path / "BENCH_r02.json").write_text(json.dumps(
        {"value": 944.0, "rtt_ms": 487.0,
         "degraded": "dispatch rtt 487 ms (healthy ~24 ms on this host)"}))
    monkeypatch.setattr(perf_gate, "REPO", str(tmp_path))

    # (a) the degraded r02 is skipped; the healthy r01 is the floor
    path, doc = perf_gate.latest_baseline()
    assert path.endswith("BENCH_r01.json")
    assert perf_gate.extract_value(doc) == 17000.0

    # (b) a degraded CURRENT line blocks (3), even though its headline would
    # otherwise be a catastrophic "regression" (1)
    cur = tmp_path / "cur.json"
    cur.write_text(json.dumps(
        {"value": 944.0, "degraded": "dispatch rtt 487 ms"}))
    rc = perf_gate.main(["--current", str(cur)])
    out = capsys.readouterr().out
    assert rc == 3
    assert "BLOCKED" in out and "degraded" in out

    # a healthy current line still gates normally against the healthy floor
    cur.write_text(json.dumps({"value": 16900.0, "link_mbps": 40.0,
                               "detail": {"cached_a": 16900.0}}))
    assert perf_gate.main(["--current", str(cur)]) == 0
    cur.write_text(json.dumps({"value": 9000.0, "link_mbps": 40.0,
                               "detail": {"cached_a": 9000.0}}))
    assert perf_gate.main(["--current", str(cur)]) == 1


def test_perf_gate_reclassifies_bench_watchdog_exit(tmp_path, monkeypatch,
                                                    capsys):
    """bench.py's backend watchdog exits 1 with an error JSON line on stdout
    (observed 2026-08-19). The gate must reclassify that as BLOCKED (3) — an
    environment stall is not a perf regression — while a genuine bench crash
    (no parseable error line) stays a hard failure (1)."""
    import sys
    import types

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "ci"))
    try:
        import perf_gate
    finally:
        sys.path.pop(0)

    import srl_zoo_tpu.utils.platform as plat

    (tmp_path / "BENCH_r01.json").write_text(json.dumps({"value": 17000.0}))
    monkeypatch.setattr(perf_gate, "REPO", str(tmp_path))
    monkeypatch.setattr(plat, "probe_backend",
                        lambda timeout_s=240.0:
                        [types.SimpleNamespace(platform="tpu")])
    monkeypatch.setattr(plat, "honor_env_platform", lambda: None)

    def fake_bench(stdout, rc):
        return lambda *a, **k: types.SimpleNamespace(
            returncode=rc, stdout=stdout, stderr="axon tunnel warning\n")

    # watchdog error line -> BLOCKED (3)
    err_line = json.dumps({"metric": "images/sec/chip", "value": 0.0,
                           "error": "device enumeration timed out after "
                                    "240s (wedged tunnel?)"})
    monkeypatch.setattr(perf_gate.subprocess, "run",
                        fake_bench(err_line + "\n", 1))
    rc = perf_gate.main([])
    out = capsys.readouterr().out
    assert rc == 3
    assert "BLOCKED" in out and "watchdog" in out

    # a crash with no parseable error line stays a hard failure (1)
    monkeypatch.setattr(perf_gate.subprocess, "run",
                        fake_bench("Traceback (most recent call last): ...\n",
                                   1))
    rc = perf_gate.main([])
    out = capsys.readouterr().out
    assert rc == 1
    assert "stdout tail" in out


def _import_perf_gate():
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "ci"))
    try:
        import perf_gate
    finally:
        sys.path.pop(0)
    return perf_gate


def test_perf_gate_methodology_versioning():
    """A row whose measurement methodology changed between the two docs is
    SKIPPED with a message, never pass/fail: the knn-qps v1->v2 change moved
    the recorded row 1.47M -> 3.65M with zero kernel change (VERDICT r4 weak
    #6). Absent entries (pre-r5 BENCH docs) gate normally."""
    perf_gate = _import_perf_gate()

    base = {"value": 17000.0,
            "detail": {"cached_knn": 1.47e6, "cached_a": 17000.0},
            "methodology": {"cached_knn": 1}}
    cur = {"value": 17000.0,
           "detail": {"cached_knn": 3.65e6, "cached_a": 17000.0},
           "methodology": {"cached_knn": 2}}
    rows = {n: (d, b) for n, d, b in perf_gate.gate_details(base, cur, 0.15)}
    assert rows["cached_knn"][1] is False
    assert "methodology" in rows["cached_knn"][0]
    assert rows["cached_a"][1] is False  # same (absent) version: gated

    # the skip works in the REGRESSING direction too — the dangerous case
    # where a methodology change would otherwise read as a perf drop
    cur_down = {"value": 17000.0, "detail": {"cached_knn": 0.5e6},
                "methodology": {"cached_knn": 2}}
    rows = {n: (d, b)
            for n, d, b in perf_gate.gate_details(base, cur_down, 0.15)}
    assert rows["cached_knn"][1] is False
    assert "methodology" in rows["cached_knn"][0]

    # one side missing the entry entirely (legacy doc): absence only implies
    # v1 — BENCH_r03's knn row IS the v1 number recorded fieldless, so a
    # legacy baseline vs a declared-v2 current must SKIP (gating it would
    # read the 2.5x v1->v2 measurement artifact as a perf delta), while a
    # declared v1 vs a legacy doc gates normally
    legacy = {"value": 17000.0, "detail": {"cached_knn": 3.65e6}}
    rows = {n: (d, b)
            for n, d, b in perf_gate.gate_details(legacy, cur_down, 0.15)}
    assert rows["cached_knn"][1] is False
    assert "predates the version field" in rows["cached_knn"][0]
    cur_v1 = {"value": 17000.0, "detail": {"cached_knn": 0.5e6},
              "methodology": {"cached_knn": 1}}
    rows = {n: (d, b)
            for n, d, b in perf_gate.gate_details(legacy, cur_v1, 0.15)}
    assert rows["cached_knn"][1] is True  # same (v1) methodology: gated

    # a hard-gated row that VANISHES from the current run must fail even
    # when the baseline carries a note or a version bump for it — the
    # dropped-row check runs before every skip
    noted_base = {"value": 17000.0,
                  "detail": {"cached_knn": 3.65e6, "cached_knn_note": "rtt",
                             "cached_other": 1.0},
                  "methodology": {"cached_knn": 2}}
    cur_missing = {"value": 17000.0, "detail": {"cached_other": 1.0}}
    rows = {n: (d, b)
            for n, d, b in perf_gate.gate_details(noted_base, cur_missing,
                                                  0.15)}
    assert rows["cached_knn"][1] is True
    assert "MISSING" in rows["cached_knn"][0]


def test_perf_gate_noted_rows_report_only():
    """A row carrying a <row>_note (e.g. the knn RTT subtraction was refused
    on a sick transport) was measured under anomalous conditions: report-only
    on either side, and the _note metadata key is never gated as a rate."""
    perf_gate = _import_perf_gate()

    base = {"value": 17000.0, "detail": {"cached_knn": 3.65e6}}
    cur = {"value": 17000.0,
           "detail": {"cached_knn": 1.0e6,
                      "cached_knn_note": "rtt 60 ms > 50% of fenced 90 ms"}}
    rows = {n: (d, b) for n, d, b in perf_gate.gate_details(base, cur, 0.15)}
    assert "cached_knn_note" not in rows
    assert rows["cached_knn"][1] is False
    assert "report-only" in rows["cached_knn"][0]

    # noted BASELINE side too: its recorded rate is not a trustworthy floor
    rows = {n: (d, b) for n, d, b in perf_gate.gate_details(cur, base, 0.15)}
    assert rows["cached_knn"][1] is False


def test_perf_gate_mixed_link_sources_annotated():
    """When the two sides' link divisors come from differently-defined
    estimators (bracketed per-row vs start-of-run doc probe) the verdict
    says so, and a recorded-but-ZERO per-row link falls back to the doc
    probe instead of being used by truthiness (ADVICE r4)."""
    perf_gate = _import_perf_gate()

    base = {"value": 17000.0, "link_mbps": 40.0,
            "detail": {"streaming_b": 320.0, "streaming_b_link_mbps": 40.0}}
    cur = {"value": 17000.0, "link_mbps": 40.0,
           "detail": {"streaming_b": 320.0}}
    rows = {n: (d, b) for n, d, b in perf_gate.gate_details(base, cur, 0.15)}
    assert rows["streaming_b"][1] is False
    assert "different estimators" in rows["streaming_b"][0]

    # zero per-row link (failed bracket probe): falls back to the doc link,
    # same-source (doc/doc on cur side vs row on base) annotation still fires
    cur = {"value": 17000.0, "link_mbps": 40.0,
           "detail": {"streaming_b": 320.0, "streaming_b_link_mbps": 0.0}}
    rows = {n: (d, b) for n, d, b in perf_gate.gate_details(base, cur, 0.15)}
    assert rows["streaming_b"][1] is False
    assert "different estimators" in rows["streaming_b"][0]

    # both per-row: no annotation
    cur = {"value": 17000.0, "link_mbps": 40.0,
           "detail": {"streaming_b": 320.0, "streaming_b_link_mbps": 40.0}}
    rows = {n: (d, b) for n, d, b in perf_gate.gate_details(base, cur, 0.15)}
    assert "different estimators" not in rows["streaming_b"][0]


def test_bench_knn_rtt_guard(monkeypatch):
    """The knn row's RTT subtraction is refused when the post-hoc RTT
    estimate exceeds half the fenced time — an RTT wobble must never mint an
    unboundedly-inflated rate that becomes an unreachable gate floor
    (ADVICE r4)."""
    import bench

    # healthy transport: corrected, no note
    monkeypatch.setattr(bench, "measure_rtt_ms", lambda repeats=7: 0.0)
    rate, note = bench.bench_knn_topk(n=256, d=8, k=3, chain=2, reps=1)
    assert rate > 0 and note is None

    # sick transport: the estimate would subtract most of the fenced time
    monkeypatch.setattr(bench, "measure_rtt_ms", lambda repeats=7: 1e7)
    rate_unc, note = bench.bench_knn_topk(n=256, d=8, k=3, chain=2, reps=1)
    assert rate_unc > 0
    assert note is not None and "UNCORRECTED" in note


def test_perf_gate_known_doc_methodology_resolution():
    """Fieldless docs of KNOWN provenance (the committed BENCH_r files)
    resolve their per-row methodology through KNOWN_DOC_METHODOLOGY, so
    gating coverage is not lost against them; unknown fieldless docs stay
    conservatively skipped against declared v2+ rows."""
    perf_gate = _import_perf_gate()

    base = {"value": 17000.0, "detail": {"cached_knn20k_qps": 3.3e6}}
    cur = {"value": 17000.0, "detail": {"cached_knn20k_qps": 1.0e6},
           "methodology": {"cached_knn20k_qps": 2}}

    # unknown fieldless baseline vs declared v2: skipped
    rows = {n: (d, b) for n, d, b in perf_gate.gate_details(base, cur, 0.15)}
    assert rows["cached_knn20k_qps"][1] is False
    assert "predates the version field" in rows["cached_knn20k_qps"][0]

    # BENCH_r04 measured the knn row at v2: resolves and GATES — this 3.3x
    # drop is a real regression and fails
    rows = {n: (d, b) for n, d, b in perf_gate.gate_details(
        base, cur, 0.15, base_name="BENCH_r04.json")}
    assert rows["cached_knn20k_qps"][1] is True

    # BENCH_r03 measured it at v1: known version MISMATCH with a declared
    # v2 current -> skipped (the exact mis-gating the map exists to prevent)
    rows = {n: (d, b) for n, d, b in perf_gate.gate_details(
        base, cur, 0.15, base_name="BENCH_r03.json")}
    assert rows["cached_knn20k_qps"][1] is False
    assert "methodology v1 -> v2" in rows["cached_knn20k_qps"][0]
