"""Record a composed-sf1 bench run into tools/bench_sf1.json, pairing it
with the current sf0.1 reference numbers so SCALE.md (tools/scale_probe.py
renders the sidecar) shows per-query 10x growth ratios.

Usage:
    python tools/make_scaled_sf.py --factor 10
    SPARK_GRAFT_SF_DIR=$BDPA_WORKSPACE/cache/composed/sf1 python bench.py > /tmp/bench_sf1.out
    python tools/record_sf1_bench.py /tmp/bench_sf1.out [BENCH_sf01.json]

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
        # bench.py prints exactly one JSON line (plus possible log noise)
        line = [ln for ln in f if ln.strip().startswith("{")][-1]
    d = json.loads(line)
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
