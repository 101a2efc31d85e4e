"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:  {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Execution is forced with the noop datasource (full pipeline runs, nothing
is collected to the driver), so timings measure the Spark plan, not
toPandas serialization. A warmup query first amortizes JVM/session startup
out of the per-query numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from big_data_player_analysis_spark.registry import all_queries
from big_data_player_analysis_spark.session import get_spark

# Headline set: one per operator family (agg, dedup, join chain, scalar map,
# TPC-H Q1, windows, sessionization, top-k, iterative flagship) plus the
# LLM-pipeline and streaming extension tiers.
HEADLINE = [
    "q01_count_per_key",
    "q04_smoothed_avg",
    "q06_distinct_pairs",
    "q08_having_count_distinct",
    "q10_join_chain",
    "q12_scalar_expression",
    "olap_tpch_q1_pricing_summary",
    "olap_window_running_sum",
    "olap_sessionization",
    "q17_top_k",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "text_quality_score",
    "sim_bruteforce_topk",
    "stream_tumbling_counts",
    "olap_session_window",
    # last: retiring its per-iteration broadcasts/checkpoints overlaps the
    # next query's first job, which would distort that measurement
    "q16_heroic_iterative",
]


def run_one(spark, spec, sf_dir: str) -> float:
    t0 = time.time()
    df = spec.fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark("bdpa-bench")

    specs = all_queries()
    names = [n for n in HEADLINE if n in specs] + [
        n for n in sorted(specs) if n not in HEADLINE and "bench" in specs[n].tags
    ]

    # Warmup: scan every benched table once (count forces footer reads +
    # fills the FileSystem/codec caches) and pay the noop-writer + codegen
    # setup. A spark.range() warmup never touches parquet, so the first
    # timed query used to absorb ~6 s of first-scan cost (round-1 verdict).
    # Goes through catalog.load_table: events.parquet is TIMESTAMP(NANOS),
    # which the raw parquet reader rejects.
    from big_data_player_analysis_spark.catalog import TABLES, load_table

    for table in TABLES:
        load_table(spark, sf_dir, table).count()
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in names:
        timings[name] = round(run_one(spark, specs[name], sf_dir), 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
