"""Record a composed-sf1 bench run into tools/bench_sf1.json, pairing it
with the current sf0.1 reference numbers so SCALE.md (tools/scale_probe.py
renders the sidecar) shows per-query 10x growth ratios.

Usage:
    python tools/make_scaled_sf.py --factor 10
    SPARK_GRAFT_SF_DIR=$BDPA_WORKSPACE/cache/composed/sf1 python bench.py
    python tools/record_sf1_bench.py tools/bench_last.json [BENCH_sf01.json]

The first argument is the PER-QUERY DETAIL record — since round 6
bench.py's stdout line is a compact summary (tails get truncated by
capture) and the full {queries, runs} detail goes to tools/bench_last.json;
pass that file (or any file whose last {-line carries a "queries" map).
The baseline defaults to the latest BENCH_r*.json in the repo root (the
driver's per-round sf0.1 record).
"""

from __future__ import annotations

import glob
import json
import os
import sys


def main():
    out_path = sys.argv[1]
    with open(out_path) as f:
        txt = f.read()
    try:
        d = json.loads(txt)  # a bench_last.json-style detail file
    except json.JSONDecodeError:
        # a captured stdout: take the last JSON line
        line = [ln for ln in txt.splitlines() if ln.strip().startswith("{")][-1]
        d = json.loads(line)
    if "queries" not in d:
        raise SystemExit(
            "no per-query detail in input — pass tools/bench_last.json "
            "(bench.py stdout is a compact summary since round 6)"
        )
    if len(sys.argv) > 2:
        base_path = sys.argv[2]
    else:
        cands = sorted(
            p for p in glob.glob("/root/repo/BENCH_r*.json")
            if os.path.basename(p)[len("BENCH_r"):-len(".json")].isdigit()
        )
        base_path = cands[-1] if cands else None
    if base_path:
        with open(base_path) as f:
            base = json.load(f)
        # the driver wraps bench.py's JSON line under "parsed"
        base = base.get("parsed", base)
        base_queries = base.get("queries", {})
        base_src = os.path.basename(base_path)
        if not base_queries:
            # driver records (BENCH_r*.json) carry bench.py's compact stdout
            # line — no per-query map.  Fall back to the committed sf0.1
            # detail snapshot so the SCALE sidecar keeps per-query ratios.
            detail = os.path.join(os.path.dirname(__file__), "bench_sf01_detail.json")
            if os.path.exists(detail):
                with open(detail) as f:
                    det = json.load(f)
                if det.get("sf") == 0.1:
                    base_queries = det.get("queries", {})
                    base_src += "+bench_sf01_detail.json"
        d["baseline_sf01"] = {
            "value": base.get("value"),
            "queries": base_queries,
            "source": base_src,
        }
    side = os.path.join(os.path.dirname(__file__), "bench_sf1.json")
    with open(side, "w") as f:
        json.dump(d, f, indent=1)
    print(f"wrote {side}")

    # Per-round repo-root artifact: BENCH_SF1_r{N}.json, so scale-factor
    # regressions (invisible to the driver's sf0.1 headline) get
    # round-over-round tracking next to BENCH_r{N}.json.  N = the round
    # in flight = latest driver-recorded BENCH_r* + 1 (the driver writes
    # its record at round END, after this script runs).
    # core-count sidecars (BENCH_r09_c8.json) are not round records
    cands = sorted(
        p for p in glob.glob("/root/repo/BENCH_r*.json")
        if os.path.basename(p)[len("BENCH_r"):-len(".json")].isdigit()
    )
    if cands:
        last_n = int(os.path.basename(cands[-1])[len("BENCH_r"):-len(".json")])
        rr = os.path.join("/root/repo", f"BENCH_SF1_r{last_n + 1:02d}.json")
        with open(rr, "w") as f:
            json.dump(d, f, indent=1)
        print(f"wrote {rr}")


if __name__ == "__main__":
    main()
