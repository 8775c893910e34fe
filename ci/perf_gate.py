#!/usr/bin/env python
"""Throughput non-regression gate (SURVEY.md §4.5; VERDICT r1 next-round #7).

Compares a bench.py JSON line against the newest BENCH_r*.json recorded by
the round driver and fails (exit 1) on a >10% headline regression, so a
silent slowdown cannot ship.

Usage:
  python ci/perf_gate.py                  # runs bench.py (needs a TPU)
  python ci/perf_gate.py --current f.json # gate an existing bench line
  python ci/perf_gate.py --band 0.15      # custom tolerance

On hosts without a TPU the gate SKIPS (exit 0 with a message): the recorded
baselines are TPU numbers and a CPU run would always "regress".
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def latest_baseline():
    """(path, parsed json) of the highest-numbered USABLE BENCH_r*.json, or
    None. A baseline whose headline is 0/absent/error (a driver-side bench
    outage, e.g. a wedged tunnel recorded as value 0.0) is SKIPPED with a
    message — otherwise one outage file would become the floor and every
    later regression would vacuously pass (VERDICT r3 weak #7 / next #5)."""
    paths = glob.glob(os.path.join(REPO, "BENCH_r*.json"))
    numbered = []
    for p in paths:
        m = re.search(r"BENCH_r(\d+)\.json$", p)
        if m:
            numbered.append((int(m.group(1)), p))
    for _, path in sorted(numbered, reverse=True):
        try:
            with open(path) as f:
                doc = json.load(f)
            inner = extract_doc(doc)
            value = float(inner["value"])
        except (json.JSONDecodeError, OSError, ValueError, KeyError,
                TypeError):
            print(f"perf_gate: skipping {os.path.basename(path)} as "
                  "baseline (no parseable headline)")
            continue
        if value <= 0 or inner.get("error"):
            print(f"perf_gate: skipping {os.path.basename(path)} as "
                  f"baseline (headline {value}, error="
                  f"{inner.get('error', '')!r:.80} — an environment "
                  "outage, not a perf floor)")
            continue
        if inner.get("degraded"):
            # parseable but transport-degraded (bench.py's RTT probe): the
            # 2026-08-19 flap produced a plausible-looking 944 img/s line —
            # 18x under the chip's real rate — that must never become the
            # floor every later regression vacuously clears
            print(f"perf_gate: skipping {os.path.basename(path)} as "
                  f"baseline (degraded: {str(inner['degraded'])[:100]})")
            continue
        return path, doc
    return None


def extract_doc(doc) -> dict:
    """The bench JSON dict from a raw bench line or a driver BENCH_r file
    (the driver wraps the bench stdout — warnings included — in a 'tail'
    field)."""
    if isinstance(doc, dict):
        if "value" in doc:
            return doc
        if "tail" in doc and isinstance(doc["tail"], str):
            for line in reversed(doc["tail"].strip().splitlines()):
                try:
                    inner = json.loads(line)
                except (json.JSONDecodeError, ValueError):
                    continue
                if isinstance(inner, dict) and "value" in inner:
                    return inner
    raise ValueError(f"no headline 'value' in {str(doc)[:200]}")


def extract_value(doc) -> float:
    return float(extract_doc(doc)["value"])


# Measurement-methodology versions of the committed, FIELDLESS BENCH_r docs
# (the field only exists from r5 on). These artifacts have known provenance
# — the histories live in bench.py's ROW_METHODOLOGY comment: the knn row's
# v2 (in-jit chain + RTT subtraction) and the bracketed-link v2 for
# streaming/hybrid-cold rows both landed in r4. Unlisted rows are v1.
KNOWN_DOC_METHODOLOGY = {
    "BENCH_r01.json": {},
    "BENCH_r02.json": {},
    "BENCH_r03.json": {},  # knn row present but v1 (per-dispatch fences)
    "BENCH_r04.json": {"cached_knn20k_qps": 2, "streaming_b128_bf16": 2,
                       "streaming_overlap_b128_bf16": 2,
                       "hybrid_cold_b128_bf16": 2},
}


def gate_details(base_doc: dict, cur_doc: dict, band: float,
                 base_name: str = None, cur_name: str = None) -> list:
    """Per-row verdict lines for every shared detail row (VERDICT r2 weak
    #3: the headline gate let a -21% streaming drop pass unexplained).

      * cached_* and hybrid_hot_* rows are chip-bound and stable: hard-gated
        at ``band``.
      * streaming_* and hybrid_cold_* rows are host-link-bound: gated on
        img/s per link-MB/s with a wider 1.5x band for residual link
        nonlinearity. The link divisor is the row's own bracketed
        ``<row>_link_mbps`` when present (the tunnel drifts 19-41 MB/s
        minute-to-minute, so the start-of-run ``link_mbps`` misattributes
        rows measured later — observed 2026-08-19: a healthy run read 3.1
        vs 8.3 img/s per stale link-MB/s), falling back to the doc-level
        ``link_mbps``; docs carrying neither are report-only. When the two
        sides' divisors come from DIFFERENT sources (one bracketed per-row,
        one start-of-run doc probe — differently-defined estimators), the
        verdict says so (ADVICE r4).
      * the combined hybrid_* rows mix both regimes: report-only (fully
        explained by their gated hot/cold parts since r4 — VERDICT r3 #5).
      * rows whose ``methodology`` version differs between the two docs
        measure different things: skipped with a message, never pass/fail
        (VERDICT r4 weak #6 — the knn-qps v1->v2 RTT-subtraction change
        moved the row 2.5x with zero perf change). Docs recorded before the
        field existed resolve through KNOWN_DOC_METHODOLOGY (the committed
        BENCH_r files have known provenance); an UNKNOWN fieldless doc only
        implies v1 — against a declared v2+ row it is skipped rather than
        mis-gated (BENCH_r03's knn row is the v1 number, fieldless).
      * rows carrying a ``<row>_note`` on either side were measured under
        an anomalous transport (e.g. knn RTT subtraction refused):
        report-only.

    Returns a list of (row, verdict_str, failed: bool)."""
    base, cur = extract_doc(base_doc), extract_doc(cur_doc)
    b_det, c_det = base.get("detail", {}), cur.get("detail", {})
    b_link, c_link = base.get("link_mbps"), cur.get("link_mbps")
    b_meth = base.get("methodology") or KNOWN_DOC_METHODOLOGY.get(base_name)
    c_meth = cur.get("methodology") or KNOWN_DOC_METHODOLOGY.get(cur_name)

    def is_chip_row(name):
        return name.startswith(("cached_", "hybrid_hot_"))

    def is_link_row(name):
        return name.startswith(("streaming_", "hybrid_cold_"))

    def row_link(det, doc_link, name):
        """(divisor, source) for a link-bound row — explicit None/zero
        handling so a recorded-but-zero per-row link (a failed bracket
        probe) falls back VISIBLY rather than by truthiness (ADVICE r4)."""
        v = det.get(name + "_link_mbps")
        if v is not None and float(v) > 0:
            return float(v), "row"
        if doc_link is not None and float(doc_link) > 0:
            return float(doc_link), "doc"
        return None, None

    rows = []
    for name in sorted(b_det):
        if name.endswith(("_error", "_link_mbps", "_note")):
            continue  # metadata for another row, not a rate
        if name not in c_det:
            # a renamed/dropped row must not silently lose gate coverage:
            # hard-gated families fail (when the current run reports details
            # at all — a detail-less doc is a legacy format, report-only),
            # report-only families still print. This check runs BEFORE the
            # note/methodology skips: a baseline-side note or version bump
            # must never excuse a row that vanished from the current run.
            bad = is_chip_row(name) and bool(c_det)
            rows.append((name, "present in baseline, MISSING from current "
                               "run", bad))
            continue
        bm = b_meth.get(name, 1) if b_meth is not None else None
        cm = c_meth.get(name, 1) if c_meth is not None else None
        if bm is not None and cm is not None and bm != cm:
            rows.append((name, f"skipped (methodology v{bm} -> v{cm}: "
                               "the two runs measure different things)",
                         False))
            continue
        if (bm is None) != (cm is None) and (bm or cm) != 1:
            # one side is a fieldless doc of UNKNOWN provenance (None —
            # committed BENCH_r files resolve through KNOWN_DOC_METHODOLOGY
            # instead). Absence only implies v1 (the original measurement):
            # comparing it against a declared v2 run would gate a 2.5x
            # measurement artifact as a perf delta. An unknown doc vs a
            # declared v1 row gates normally.
            rows.append((name, f"skipped (methodology v{bm or 1} vs v"
                               f"{cm or 1}: one doc predates the version "
                               "field; absence implies v1)", False))
            continue
        note = c_det.get(name + "_note") or b_det.get(name + "_note")
        if note:
            rows.append((name, f"report-only (measurement note: "
                               f"{str(note)[:120]})", False))
            continue
        b_v, c_v = float(b_det[name]), float(c_det[name])
        if b_v <= 0:
            continue  # row errored in the baseline run — nothing to hold
        b_l, b_src = row_link(b_det, b_link, name)
        c_l, c_src = row_link(c_det, c_link, name)
        if is_chip_row(name):
            floor = b_v * (1.0 - band)
            bad = c_v < floor
            rows.append((name, f"{c_v:.1f} vs {b_v:.1f} "
                         f"(floor {floor:.1f})", bad))
        elif is_link_row(name) and b_l and c_l:
            b_eff, c_eff = b_v / b_l, c_v / c_l
            floor = b_eff * (1.0 - 1.5 * band)
            bad = c_eff < floor
            mixed = "" if b_src == c_src else (
                f"; CAUTION link divisors from different estimators "
                f"(cur={c_src}-level, base={b_src}-level)")
            rows.append((name, f"{c_eff:.2f} vs {b_eff:.2f} img/s per "
                         f"link-MB/s (links {c_l:.0f}/{b_l:.0f}, "
                         f"floor {floor:.2f}){mixed}", bad))
        else:
            rows.append((name, f"{c_v:.1f} vs {b_v:.1f} (report-only)",
                         False))
    return rows


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--current", type=str, default="",
                   help="Path to an existing bench JSON line (default: run "
                        "bench.py)")
    p.add_argument("--band", type=float, default=0.10,
                   help="Allowed fractional regression (default 10%%)")
    p.add_argument("--detail-band", type=float, default=0.15,
                   help="Allowed per-detail-row regression for cached_* rows "
                        "(default 15%%; streaming rows get 1.5x this on the "
                        "link-normalized ratio)")
    args = p.parse_args(argv)

    base = latest_baseline()
    if base is None:
        print("perf_gate: no BENCH_r*.json baseline yet — nothing to gate")
        return 0
    base_path, base_doc = base
    base_val = extract_value(base_doc)

    if args.current:
        with open(args.current) as f:
            text = f.read()
        try:
            # whole-file JSON: a driver BENCH_r*.json (pretty-printed,
            # multi-line — extract_value handles its 'tail' wrapper)
            cur_doc = json.loads(text)
        except json.JSONDecodeError:
            # raw bench stdout: the JSON line is the last line
            cur_doc = json.loads(text.strip().splitlines()[-1])
    else:
        sys.path.insert(0, REPO)
        try:
            from srl_zoo_tpu.utils.platform import (BackendInitTimeout,
                                                    honor_env_platform,
                                                    probe_backend)
        finally:
            sys.path.pop(0)
        # JAX_PLATFORMS=cpu must be binding here like in every other CLI
        # (the axon sitecustomize overrides the env var after it is read)
        honor_env_platform()
        try:
            # bounded first backend touch: a wedged tunnel must fail the
            # gate loudly, not hang it forever (same outage mode bench.py's
            # watchdog covers — this check runs BEFORE bench.py gets a say)
            platform = probe_backend()[0].platform
        except BackendInitTimeout as e:
            # exit 3, not 1: an environment outage is not a perf
            # regression — callers (ci/smoke.sh) may warn-and-continue on 3
            # but must stay red on a real regression (1)
            print(f"perf_gate: BLOCKED — {e}")
            return 3
        if platform not in ("tpu", "axon"):
            print(f"perf_gate: SKIP — no TPU here "
                  f"(platform={platform}); baselines in "
                  f"{os.path.basename(base_path)} are TPU numbers")
            return 0
        out = subprocess.run([sys.executable,
                              os.path.join(REPO, "bench.py")],
                             capture_output=True, text=True, timeout=1200)
        if out.returncode != 0:
            # bench.py's backend watchdog reports outages as an error JSON
            # line on STDOUT + exit 1 (the 2026-08-19 tunnel flap produced
            # exactly this; stderr carries only the axon warning). An
            # environment stall is exit 3 — BLOCKED, same as our own probe
            # timing out — never 1: it is not a perf regression.
            try:
                err_doc = json.loads(out.stdout.strip().splitlines()[-1])
            except (json.JSONDecodeError, IndexError):
                err_doc = {}
            if "error" in err_doc:
                print(f"perf_gate: BLOCKED — bench.py watchdog: "
                      f"{err_doc['error']}")
                return 3
            print(f"perf_gate: bench.py failed (rc={out.returncode}):\n"
                  f"--- stdout tail ---\n{out.stdout[-2000:]}\n"
                  f"--- stderr tail ---\n{out.stderr[-2000:]}")
            return 1
        cur_doc = json.loads(out.stdout.strip().splitlines()[-1])
    cur_inner = extract_doc(cur_doc)
    if cur_inner.get("degraded"):
        # same semantics as our own probe timing out: the numbers exist but
        # measure the transport, not the framework — exit 3, never 1
        print(f"perf_gate: BLOCKED — bench line marked degraded: "
              f"{str(cur_inner['degraded'])[:160]}")
        return 3
    cur_val = extract_value(cur_doc)

    floor = base_val * (1.0 - args.band)
    failed = cur_val < floor
    verdict = "REGRESSION" if failed else "OK"
    print(f"perf_gate: current {cur_val:.1f} vs baseline {base_val:.1f} "
          f"({os.path.basename(base_path)}), floor {floor:.1f} -> {verdict}")
    for name, desc, bad in gate_details(
            base_doc, cur_doc, args.detail_band,
            base_name=os.path.basename(base_path),
            cur_name=(os.path.basename(args.current)
                      if args.current else None)):
        print(f"perf_gate:   {name}: {desc} -> "
              f"{'REGRESSION' if bad else 'OK'}")
        failed = failed or bad
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
