"""Bucketed-table co-located join: writing both sides bucketed on the join
key with the same bucket count lets the join run with ZERO exchanges — the
pre-shuffle lives in the table layout. This is the 100 TB pattern for
repeatedly-joined fact tables (pay the shuffle once at write time)."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from big_data_player_analysis_spark.catalog import load_table


def plan_str(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_exchange(spark, sf_small, tmp_path):
    li = load_table(spark, sf_small, "lineitem").select("l_orderkey", "l_quantity")
    od = load_table(spark, sf_small, "orders").select("o_orderkey", "o_totalprice")
    # tables land in the default warehouse (cwd/spark-warehouse); DROP TABLE
    # below removes the managed data
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode("overwrite").saveAsTable(
        "li_bucketed"
    )
    od.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode("overwrite").saveAsTable(
        "od_bucketed"
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # disable broadcast so the shuffle-vs-bucketing difference is visible
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("li_bucketed").join(
            spark.table("od_bucketed"), F.col("l_orderkey") == F.col("o_orderkey")
        )
        p = plan_str(joined)
        assert "SortMergeJoin" in p
        assert "Exchange" not in p  # both sides pre-bucketed on the key
        # and the result is still right
        want = (
            load_table(spark, sf_small, "lineitem")
            .join(
                load_table(spark, sf_small, "orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .count()
        )
        assert joined.count() == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
        spark.sql("DROP TABLE IF EXISTS od_bucketed")
