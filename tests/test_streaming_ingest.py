"""Streaming near-dedup ingestion (streaming/ingest.py): batch parity,
cross-batch incremental filtering, the documented divergence-from-global
case, and exactly-once replay through the idempotent partition sink."""

from __future__ import annotations

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from big_data_player_analysis_spark.streaming.ingest import (
    stream_near_dedup_ingest,
)

BASE_A = (
    "the quick brown fox jumps over the lazy dog while the cat sleeps "
    "quietly near the warm fireplace on a cold winter evening tonight"
)
BASE_B = (
    "distributed query engines shuffle partitioned data across the "
    "cluster network before aggregating grouped results into columnar "
    "output files for downstream consumers"
)


def _write_file(dirpath: str, name: str, rows: list[tuple[int, str]], mtime: float):
    """One parquet FILE per arriving feed drop; mtime orders the batches
    (FileStreamSource processes older files first)."""
    os.makedirs(dirpath, exist_ok=True)
    path = os.path.join(dirpath, name)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "source": pa.array(["feed"] * len(rows), pa.string()),
            }
        ),
        path,
    )
    os.utime(path, (mtime, mtime))


def test_single_batch_matches_batch_operator(spark, tmp_path):
    """With the whole feed in one micro-batch the streaming result must
    equal the batch near_dedup_survivors run (same survivors, same
    group sizes), all under batch id 0."""
    from big_data_player_analysis_spark.operators.dedup import near_dedup_survivors

    rows = [
        (10, BASE_A + " alpha"),
        (11, BASE_A + " bravo"),
        (12, BASE_A + " delta"),
        (20, BASE_B + " one"),
        (21, BASE_B + " two"),
        (30, "a completely unrelated short document about gardening tips"),
    ]
    src = str(tmp_path / "feed")
    _write_file(src, "f1.parquet", rows, time.time())
    corpus = stream_near_dedup_ingest(
        spark, src, str(tmp_path / "corpus"), str(tmp_path / "ckpt")
    )
    got = {(r.doc_id, r.group_size, r.batch) for r in corpus.collect()}
    df = spark.createDataFrame([(i, t, "feed") for i, t in rows],
                               "doc_id long, text string, source string")
    want = {
        (r.doc_id, r.group_size, 0)
        for r in near_dedup_survivors(df, "doc_id", "text").collect()
    }
    assert got == want
    assert {r[0] for r in got} == {10, 20, 30}


def test_cross_batch_near_dups_filtered_and_replay_is_idempotent(spark, tmp_path):
    """A second-batch doc near-duplicating an already-ingested doc is
    dropped; fresh docs land. Restarting the finished query from its
    checkpoint must change nothing (no re-appended partitions)."""
    src = str(tmp_path / "feed")
    now = time.time()
    _write_file(src, "f1.parquet", [(10, BASE_A + " alpha"), (30, BASE_B + " one")], now - 100)
    _write_file(src, "f2.parquet", [
        (40, BASE_A + " bravo"),  # near-dup of already-ingested 10
        (50, "entirely new content about alpine railway construction methods"),
    ], now - 50)
    corpus_dir, ckpt = str(tmp_path / "corpus"), str(tmp_path / "ckpt")
    corpus = stream_near_dedup_ingest(
        spark, src, corpus_dir, ckpt, max_files_per_trigger=1
    )
    got = {r.doc_id: r.batch for r in corpus.collect()}
    assert got == {10: 0, 30: 0, 50: 1}

    again = stream_near_dedup_ingest(
        spark, src, corpus_dir, ckpt, max_files_per_trigger=1
    )
    assert {r.doc_id: r.batch for r in again.collect()} == got
    assert sorted(os.listdir(corpus_dir)) == ["batch=0", "batch=1"]


def test_incremental_divergence_case_is_the_documented_one(spark, tmp_path):
    """The accepted recall trade: doc 20's only link to the old cluster
    runs through doc 21, which its OWN batch dropped — so 20 stays kept
    (a global one-shot closure over all three would keep only 10)."""
    x = [f"alpha{i}" for i in range(40)]
    z = [f"omega{i}" for i in range(20)]
    doc10 = " ".join(x)                      # old corpus
    doc21 = " ".join(x + z)                  # ~ doc10 (shares all of x)
    doc20 = " ".join(x[:20] + z)             # ~ doc21, NOT ~ doc10
    src = str(tmp_path / "feed")
    now = time.time()
    _write_file(src, "f1.parquet", [(10, doc10)], now - 100)
    _write_file(src, "f2.parquet", [(20, doc20), (21, doc21)], now - 50)
    corpus = stream_near_dedup_ingest(
        spark, src, str(tmp_path / "corpus"), str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    got = {r.doc_id: r.batch for r in corpus.collect()}
    # 21 dropped intra-batch (cluster {20, 21}, min id survives); survivor
    # 20 is not a near-dup of 10, so it is kept — incremental semantics
    assert got == {10: 0, 20: 1}
