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
        cands = sorted(glob.glob("/root/repo/BENCH_r*.json"))
        base_path = cands[-1] if cands else None
    if base_path:
        with open(base_path) as f:
            base = json.load(f)
        # the driver wraps bench.py's JSON line under "parsed"
        base = base.get("parsed", base)
        d["baseline_sf01"] = {
            "value": base.get("value"),
            "queries": base.get("queries", {}),
            "source": os.path.basename(base_path),
        }
    side = os.path.join(os.path.dirname(__file__), "bench_sf1.json")
    with open(side, "w") as f:
        json.dump(d, f, indent=1)
    print(f"wrote {side}")


if __name__ == "__main__":
    main()
