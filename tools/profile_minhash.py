"""Per-stage profiling of dedup_minhash_lsh at sf0.1 (VERDICT r2 #1).

Stages timed independently (each forced with a noop write / count):
  1. normalize+filter + minhash signatures + persist (materialize)
  2. band explode + self-join + distinct (candidates) -> persist + count
  3. _verify_jaccard (needed-ids, re-shingle, double join, array_intersect)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from big_data_player_analysis_spark.catalog import load_table
from big_data_player_analysis_spark.operators import dedup as D
from big_data_player_analysis_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark("minhash-profile")
    docs = load_table(spark, SF_DIR, "documents")
    docs.count()  # warm scan
    k, threshold = 8, 0.6

    t0 = time.time()
    sig = D.minhash_signatures(D._lowered(docs, "doc_id", "text"), k).persist()
    n_sig = sig.count()
    t1 = time.time()
    print(f"stage1 signatures+persist: {t1-t0:.2f}s  ({n_sig} docs)")

    bands = sig.select(
        "doc",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.hash(
                            F.slice("sig", i * D.ROWS_PER_BAND + 1, D.ROWS_PER_BAND)
                        ).alias("bucket"),
                    )
                    for i in range(D.N_BANDS)
                ]
            )
        ).alias("bb"),
    ).select("doc", "bb.band", "bb.bucket")
    ba = bands.select(F.col("doc").alias("doc_a"), "band", "bucket")
    bb = bands.select(F.col("doc").alias("doc_b"), "band", "bucket")
    cand = (
        ba.join(bb, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
        .persist()
    )
    n_cand = cand.count()
    t2 = time.time()
    print(f"stage2 band-join+distinct: {t2-t1:.2f}s  ({n_cand} candidate pairs)")

    out = D._verify_jaccard(cand, docs, "doc_id", "text", k, threshold)
    out.write.format("noop").mode("overwrite").save()
    t3 = time.time()
    print(f"stage3 verify_jaccard:     {t3-t2:.2f}s")
    print(f"TOTAL: {t3-t0:.2f}s")

    # Clean end-to-end for comparison
    for c in spark.sparkContext._jsc.getPersistentRDDs().values():
        pass
    spark.catalog.clearCache()
    t4 = time.time()
    D.dedup_minhash_lsh(docs, "doc_id", "text", k=k, threshold=threshold).write.format(
        "noop"
    ).mode("overwrite").save()
    print(f"end-to-end clean:          {time.time()-t4:.2f}s")


if __name__ == "__main__":
    main()
