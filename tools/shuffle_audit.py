"""Shuffle audit: measured shuffle volume per operator, as direct evidence
for the scale-design claims in SCALE.md / the operator docstrings.

For each audited registry entry this runs the query to completion through
the `noop` sink (full materialization, no driver collect) under a
UI-enabled session, then attributes the *new* completed stages' metrics
(input bytes, shuffle write bytes, shuffle read bytes) to that entry via
the Spark REST status API. The interesting number is shuffle-write /
input: an operator whose candidate generation is bucketed/banded (minhash,
simhash) or partial-aggregated (top-ngrams, q01) should exchange a small
fraction of what it scans — that ratio, not wall time, is what survives a
1000-executor 100 TB run, because shuffle is the only cost that crosses
the network.

Usage:
    python tools/shuffle_audit.py [sf_dir ...]     # default sf0.1 + composed sf1
Writes tools/shuffle_results.json and renders SHUFFLE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

from big_data_player_analysis_spark.registry import all_queries
from big_data_player_analysis_spark.session import get_spark

UI_PORT = 4077

# Batch operators whose shuffle profile carries a design claim. Streaming
# entries are excluded (micro-batch stage attribution is noisy); so are
# sub-second scalar maps with nothing to exchange.
AUDITED = [
    "q01_count_per_key",
    "q06_distinct_pairs",
    "q08_having_count_distinct",
    "olap_tpch_q1_pricing_summary",
    "olap_tpch_q5_region_volume",
    "q16_heroic_iterative",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "llm_line_dedup",
    "llm_near_dedup_survivors",
    "llm_semantic_dedup",
    "llm_top_ngrams",
    "llm_pack_sequences",
    "sim_bruteforce_topk",
    "dedup_embedding_cosine",
    "olap_funnel_conversion",
    "olap_retention_cohorts",
    "llm_bpe_train",
]


def _api(path: str):
    url = f"http://localhost:{UI_PORT}/api/v1{path}"
    with urllib.request.urlopen(url, timeout=30) as r:
        return json.loads(r.read())


def _app_id() -> str:
    return _api("/applications")[0]["id"]


def _stage_metrics(app_id: str) -> dict[tuple[int, int], dict]:
    """(stageId, attemptId) -> metrics for every non-active stage."""
    out = {}
    for st in _api(f"/applications/{app_id}/stages"):
        if st["status"] == "ACTIVE":
            continue
        out[(st["stageId"], st["attemptId"])] = {
            "input": st.get("inputBytes", 0),
            "sw": st.get("shuffleWriteBytes", 0),
            "sr": st.get("shuffleReadBytes", 0),
        }
    return out


def audit_sf(spark, app_id: str, sf_dir: str, names) -> dict[str, dict]:
    specs = all_queries()
    results = {}
    for name in names:
        spec = specs.get(name)
        if spec is None:
            continue
        before = _stage_metrics(app_id)
        t0 = time.time()
        df = spec.fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        time.sleep(0.3)  # let the status store absorb the final stage
        after = _stage_metrics(app_id)
        new = [m for k, m in after.items() if k not in before]
        results[name] = {
            "input_bytes": sum(m["input"] for m in new),
            "shuffle_write_bytes": sum(m["sw"] for m in new),
            "shuffle_read_bytes": sum(m["sr"] for m in new),
            "stages": len(new),
            "wall_s": round(wall, 2),
        }
        r = results[name]
        print(
            f"{sf_dir.rsplit('/', 1)[-1]:>6} {name:<28} "
            f"in={r['input_bytes'] / 1e6:9.1f}MB "
            f"sw={r['shuffle_write_bytes'] / 1e6:9.1f}MB "
            f"stages={r['stages']:>3} {r['wall_s']:6.2f}s",
            flush=True,
        )
    return results


def _fmt_mb(b: int) -> str:
    return f"{b / 1e6:.1f}"


def render(all_results: dict[str, dict[str, dict]]) -> str:
    sfs = list(all_results)
    lines = [
        "# SHUFFLE — measured exchange volume per operator",
        "",
        "Bytes are summed over the stages each query executed (Spark REST",
        "status API, `noop` sink so nothing is collected to the driver).",
        "`sw/in` = shuffle-write bytes / input bytes scanned: the fraction",
        "of the data an operator pushes across the network. This ratio is",
        "the scale claim — wall seconds on local[32] measure one machine,",
        "but the exchange fraction is what a 1000-executor 100 TB run pays",
        "for. Operators whose candidate generation is banded/bucketed",
        "(minhash, simhash) or partial-aggregated (q01, top-ngrams) should",
        "hold sw/in well under 1 and keep it flat as the input grows;",
        "verify-dominated or fan-out operators (ngram-jaccard's exact",
        "contract, pack_sequences' grouped repack) legitimately exceed it",
        "and are documented as such where they do.",
        "",
        "| operator | "
        + " | ".join(f"{sf}: in MB / sw MB / sw:in" for sf in sfs)
        + " | sw growth |",
        "|---|" + "---|" * (len(sfs) + 1),
    ]
    names = [n for n in AUDITED if any(n in all_results[sf] for sf in sfs)]
    for name in names:
        cells = []
        sws = []
        for sf in sfs:
            r = all_results[sf].get(name)
            if not r:
                cells.append("—")
                continue
            inb, sw = r["input_bytes"], r["shuffle_write_bytes"]
            ratio = f"{sw / inb:.2f}" if inb else "—"
            cells.append(f"{_fmt_mb(inb)} / {_fmt_mb(sw)} / {ratio}")
            sws.append(sw)
        growth = (
            f"{sws[-1] / sws[0]:.1f}x" if len(sws) == len(sfs) and sws[0] else "—"
        )
        lines.append(f"| {name} | " + " | ".join(cells) + f" | {growth} |")
    lines.append("")
    return "\n".join(lines)


def main() -> int:
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.1", "/tmp/bdpa_composed/sf1"]
    sf_dirs = [d for d in sf_dirs if os.path.isdir(d)]
    spark = get_spark(
        "shuffle-audit",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": str(UI_PORT),
            "spark.ui.retainedStages": "20000",
        },
    )
    app_id = _app_id()
    all_results = {}
    for sf_dir in sf_dirs:
        label = os.path.basename(sf_dir.rstrip("/"))
        all_results[label] = audit_sf(spark, app_id, sf_dir, AUDITED)

    out = os.path.join(os.path.dirname(__file__), "shuffle_results.json")
    with open(out, "w") as f:
        json.dump(all_results, f, indent=1)
    with open(os.path.join(os.path.dirname(__file__), "..", "SHUFFLE.md"), "w") as f:
        f.write(render(all_results))
    print("wrote SHUFFLE.md")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
