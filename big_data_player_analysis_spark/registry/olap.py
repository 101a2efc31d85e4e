"""Registry tier B: general OLAP operators the reference lacks entirely
(SURVEY.md §2.4 "declared absent") — windows, set ops, rollup/cube, date
and JSON functions, percentiles, pivot, sessionization. All stock Catalyst
plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from big_data_player_analysis_spark.operators.topk import top_k_per_group
from big_data_player_analysis_spark.registry import query
from big_data_player_analysis_spark.registry.common import t

# ------------------------------------------------------------- aggregation


@query(
    "olap_tpch_q1_pricing_summary",
    sql="""
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity) AS sum_qty,
           sum(l_extendedprice) AS sum_base_price,
           sum(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
           sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS sum_charge,
           avg(l_quantity) AS avg_qty,
           avg(l_extendedprice) AS avg_price,
           avg(l_discount) AS avg_disc,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("olap", "agg"),
)
def tpch_q1(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q1 shape: multi-aggregate scan with a pushed-down date filter.
    The filter and the 2-column grouping reach the parquet scan (verify via
    explain: PushedFilters + pruned ReadSchema)."""
    li = t(spark, sf, "lineitem").filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
    disc_price = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sum_qty"),
        F.sum("l_extendedprice").alias("sum_base_price"),
        F.sum(disc_price).alias("sum_disc_price"),
        F.sum(disc_price * (F.lit(1) + F.col("l_tax"))).alias("sum_charge"),
        F.avg("l_quantity").alias("avg_qty"),
        F.avg("l_extendedprice").alias("avg_price"),
        F.avg("l_discount").alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


# ----------------------------------------------------------------- windows


@query(
    "olap_window_topk_per_group",
    sql="""
    SELECT c_nationkey, c_custkey, c_acctbal, CAST(rn AS BIGINT) AS rn FROM (
      SELECT c_nationkey, c_custkey, c_acctbal,
             row_number() OVER (PARTITION BY c_nationkey
                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer
    ) WHERE rn <= 3
    """,
    tags=("olap", "window"),
)
def window_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Top-3 customers by balance per nation — row_number window; per-group
    sort happens within shuffle partitions, no global sort."""
    out = top_k_per_group(
        t(spark, sf, "customer").select("c_nationkey", "c_custkey", "c_acctbal"),
        ["c_nationkey"],
        [F.desc("c_acctbal"), F.asc("c_custkey")],
        k=3,
    )
    return out.withColumn("rn", F.col("rn").cast("long"))


@query(
    "olap_window_running_sum",
    sql="""
    SELECT o_custkey, o_orderkey,
           sum(o_totalprice) OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS running_total
    FROM orders
    """,
    tags=("olap", "window"),
)
def window_running(spark: SparkSession, sf: str) -> DataFrame:
    """Per-customer running order total — analytic frame the reference's
    secondary-sort (F5) can only emulate inside one reducer."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return t(spark, sf, "orders").select(
        "o_custkey", "o_orderkey", F.sum("o_totalprice").over(w).alias("running_total")
    )


@query(
    "olap_window_lag_delta",
    sql="""
    SELECT user_id, event_id,
           value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS delta
    FROM events
    """,
    tags=("olap", "window"),
)
def window_lag(spark: SparkSession, sf: str) -> DataFrame:
    """Per-user event-value delta via lag()."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return t(spark, sf, "events").select(
        "user_id",
        "event_id",
        (F.col("value") - F.lag("value").over(w)).alias("delta"),
    )


@query(
    "olap_sessionization",
    sql="""
    WITH g AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), s AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
      FROM g
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           CAST(count(*) AS BIGINT) AS n_events,
           min(ts) AS session_start, max(ts) AS session_end
    FROM s GROUP BY user_id, session_id
    """,
    tags=("olap", "window", "sessionization"),
)
def sessionization(spark: SparkSession, sf: str) -> DataFrame:
    """Batch sessionization: lag-gap > 30 min starts a new session, cumsum
    numbers sessions — the standard two-window pattern (streaming variant in
    streaming/events.py uses session_window). The gap compares at
    MICROSECOND precision (unix_micros) to match the oracle's interval
    semantics exactly — casting ts to long floors to whole seconds, so a
    true gap of e.g. 1800.5s would not split while the oracle splits
    (round-1 ADVICE finding)."""
    ev = t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag(F.col("ts")).over(w))
    g = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(gap > 1800 * 1_000_000, 1)
        .when(F.lag("ts").over(w).isNull(), 1)
        .otherwise(0)
        .alias("new_session"),
    )
    cum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    s = g.select(
        "user_id", "ts", F.sum("new_session").over(cum).alias("session_id")
    )
    return s.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


# --------------------------------------------------------- rollup / cube / pivot


@query(
    "olap_rollup",
    sql="SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty "
        "FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)",
    tags=("olap", "agg"),
)
def rollup(spark: SparkSession, sf: str) -> DataFrame:
    """ROLLUP grouping sets (absent in reference, SURVEY.md §2.4)."""
    return (
        t(spark, sf, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.sum("l_quantity").alias("sum_qty"))
    )


@query(
    "olap_cube",
    sql="SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty "
        "FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)",
    tags=("olap", "agg"),
)
def cube(spark: SparkSession, sf: str) -> DataFrame:
    """CUBE grouping sets."""
    return (
        t(spark, sf, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.sum("l_quantity").alias("sum_qty"))
    )


@query(
    "olap_pivot",
    sql="""
    SELECT l_returnflag,
           sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END) AS qty_O,
           sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END) AS qty_F
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("olap", "agg"),
)
def pivot(spark: SparkSession, sf: str) -> DataFrame:
    """Pivot on linestatus with explicit values (explicit list avoids the
    extra distinct-values job — required practice at scale)."""
    return (
        t(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum("l_quantity"))
        .withColumnRenamed("O", "qty_O")
        .withColumnRenamed("F", "qty_F")
    )


# ----------------------------------------------------------------- set ops


@query(
    "olap_semi_join",
    sql="SELECT c_custkey, c_name FROM customer c WHERE EXISTS "
        "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey "
        " AND o.o_orderstatus = 'F')",
    tags=("olap", "join"),
)
def semi_join(spark: SparkSession, sf: str) -> DataFrame:
    """LEFT SEMI join (EXISTS)."""
    c = t(spark, sf, "customer")
    o = t(spark, sf, "orders").filter(F.col("o_orderstatus") == "F")
    return c.join(
        o, c.c_custkey == o.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "olap_anti_join",
    sql="SELECT c_custkey, c_name FROM customer c WHERE NOT EXISTS "
        "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)",
    tags=("olap", "join"),
)
def anti_join(spark: SparkSession, sf: str) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS): customers without orders."""
    c = t(spark, sf, "customer")
    o = t(spark, sf, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "olap_intersect",
    sql="SELECT o_custkey FROM orders WHERE o_orderstatus = 'O' "
        "INTERSECT SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'",
    tags=("olap", "setop"),
)
def intersect(spark: SparkSession, sf: str) -> DataFrame:
    """INTERSECT: customers with both open and finished orders."""
    o = t(spark, sf, "orders")
    open_ = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    fin = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return open_.intersect(fin)


@query(
    "olap_except",
    sql="SELECT o_custkey FROM orders WHERE o_orderstatus = 'O' "
        "EXCEPT SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'",
    tags=("olap", "setop"),
)
def except_(spark: SparkSession, sf: str) -> DataFrame:
    """EXCEPT (set semantics): customers with open but no finished orders.
    subtract() is Spark's EXCEPT DISTINCT; exceptAll() would be the bag
    version (EXCEPT ALL), which has different semantics."""
    o = t(spark, sf, "orders")
    open_ = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    fin = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return open_.subtract(fin)


# ------------------------------------------------------- datetime / json


@query(
    "olap_month_agg",
    sql="SELECT date_trunc('month', o_orderdate) AS order_month, "
        "CAST(count(*) AS BIGINT) AS n_orders, sum(o_totalprice) AS total_price "
        "FROM orders GROUP BY 1",
    tags=("olap", "datetime"),
)
def month_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Calendar-month rollup via date_trunc (reference never touches its
    time field; SURVEY.md §2.4 date/time row)."""
    return (
        t(spark, sf, "orders")
        .groupBy(F.date_trunc("month", "o_orderdate").alias("order_month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_totalprice").alias("total_price"),
        )
    )


@query(
    "olap_json_extract",
    sql="SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, "
        "CAST(count(*) AS BIGINT) AS n, sum(value) AS total_value "
        "FROM events GROUP BY 1",
    tags=("olap", "json"),
)
def json_extract(spark: SparkSession, sf: str) -> DataFrame:
    """JSON field extraction from events.props (semi-structured column)."""
    ev = t(spark, sf, "events").withColumn(
        "k", F.get_json_object("props", "$.k").cast("long")
    )
    return ev.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value")
    )


@query(
    "olap_variant_metrics",
    sql="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(max(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
    FROM events GROUP BY event_type
    """,
    tags=("olap", "json", "variant"),
)
def variant_metrics(spark: SparkSession, sf: str) -> DataFrame:
    """Semi-structured metrics through the VARIANT type (Spark 4): props
    is parsed ONCE into the open binary-encoded VARIANT and fields are
    extracted with try_variant_get — the engine-native path for
    schema-on-read JSON at scale. Vs get_json_object
    (olap_json_extract), the parse happens once per row regardless of
    how many fields are later extracted, the encoded value is
    columnar-shreddable, and malformed documents yield NULL — at BOTH
    layers: try_parse_json nulls unparseable payloads, try_variant_get
    nulls failed extractions/casts — instead of failing the task, the
    behavior a 100 TB crawl with dirty payloads needs. The oracle reads
    the same field with DuckDB's JSON extraction + TRY_CAST (DuckDB has
    no try-parse, so the oracle assumes well-formed JSON documents —
    which the test tables are — while tolerating non-numeric values)."""
    ev = t(spark, sf, "events").select(
        "event_type", F.try_parse_json("props").alias("v")
    )
    k = F.try_variant_get(F.col("v"), "$.k", "long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").cast("long").alias("sum_k"),
            F.max("k").cast("long").alias("max_k"),
        )
    )


@query(
    "olap_month_json",
    sql="""
    SELECT date_trunc('month', ts) AS event_month,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           CAST(count(*) AS BIGINT) AS n, round(sum(value), 6) AS total_value
    FROM events GROUP BY 1, 2
    """,
    tags=("olap", "datetime", "json"),
)
def month_json(spark: SparkSession, sf: str) -> DataFrame:
    """Calendar-month x JSON-field rollup over the semi-structured events
    table — the date/time (date_trunc) and JSON (get_json_object) surfaces
    in one plan; olap_month_agg / olap_json_extract cover each in
    isolation. Sum rounded: the two engines accumulate the doubles in
    different orders."""
    ev = t(spark, sf, "events").select(
        F.date_trunc("month", "ts").alias("event_month"),
        F.get_json_object("props", "$.k").cast("long").alias("k"),
        "value",
    )
    return ev.groupBy("event_month", "k").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 6).alias("total_value"),
    )


# ---------------------------------------------------- percentiles / approx


@query(
    "olap_percentiles",
    sql="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
           round(quantile_cont(l_extendedprice, 0.95), 6) AS p95
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("olap", "agg"),
)
def percentiles(spark: SparkSession, sf: str) -> DataFrame:
    """Exact continuous percentiles (median / p95) per group. Spark
    percentile() and DuckDB quantile_cont() both linearly interpolate."""
    return (
        t(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.percentile("l_extendedprice", F.lit(0.5)), 6).alias("p50"),
            F.round(F.percentile("l_extendedprice", F.lit(0.95)), 6).alias("p95"),
        )
    )


@query("olap_approx_distinct", sql=None, tags=("olap", "agg", "approx"))
def approx_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """HyperLogLog++ approximate distinct counts (sketch values are
    engine-specific — DuckDB's approx_count_distinct uses a different sketch,
    so this entry is rows-only; the exact-count analog q08 is hash-checked)."""
    li = t(spark, sf, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        F.approx_count_distinct("l_suppkey").alias("approx_supps"),
    )


# ------------------------------------------------------- as-of / range joins


@query(
    "olap_asof_join",
    sql="""
    WITH clicks AS (
      SELECT user_id, ts, max(event_id) AS click_event_id
      FROM events WHERE event_type = 'click' GROUP BY user_id, ts
    ),
    purchases AS (
      SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id, p.ts, p.value,
           (SELECT max(c.ts) FROM clicks c
             WHERE c.user_id = p.user_id AND c.ts <= p.ts) AS click_ts,
           (SELECT max_by(c.click_event_id, c.ts) FROM clicks c
             WHERE c.user_id = p.user_id AND c.ts <= p.ts) AS click_event_id
    FROM purchases p
    """,
    tags=("olap", "join", "asof"),
)
def asof_join_q(spark: SparkSession, sf: str) -> DataFrame:
    """As-of join: each purchase matched to the user's most recent click at
    or before the purchase time (union + last-carry window, one shuffle —
    operators/joins.py:asof_join). The right side is pre-aggregated to one
    row per (user, ts) so the match is deterministic; the oracle re-derives
    it with correlated max/max_by subqueries."""
    from big_data_player_analysis_spark.operators.joins import asof_join

    ev = t(spark, sf, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_event_id"))
    )
    out = asof_join(purchases, clicks, on="user_id", left_ts="ts", right_ts="ts")
    return out.select(
        "event_id", "user_id", "ts", "value",
        F.col("ts_r").alias("click_ts"), "click_event_id",
    )


RANGE_BANDS = [(i, 50.0 * i, 50.0 * (i + 1)) for i in range(10)]  # covers value 0..500


@query(
    "olap_range_join",
    sql=f"""
    SELECT e.event_id, b.band_id, b.lo, b.hi
    FROM events e
    JOIN (VALUES {', '.join(f'({i}, {lo}, {hi})' for i, lo, hi in RANGE_BANDS)})
         b(band_id, lo, hi)
      ON e.value >= b.lo AND e.value < b.hi
    """,
    tags=("olap", "join", "range"),
)
def range_join_q(spark: SparkSession, sf: str) -> DataFrame:
    """Interval containment join of events against value bands via the
    bucketed equi-join rewrite (operators/joins.py:range_join) — a hash
    join on the bucket key instead of a nested loop."""
    from big_data_player_analysis_spark.operators.joins import range_join

    ev = t(spark, sf, "events").select("event_id", "value")
    bands = spark.createDataFrame(RANGE_BANDS, "band_id int, lo double, hi double")
    out = range_join(ev, bands, "value", "lo", "hi", bucket_width=50.0)
    return out.select("event_id", "band_id", "lo", "hi")


# ------------------------------------------------- TPC-H-shaped multi-joins


@query(
    "olap_tpch_q3_shipping_priority",
    sql="""
    SELECT l_orderkey,
           sum(l_extendedprice * (1 - l_discount)) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10
    """,
    tags=("olap", "join", "tpch"),
)
def tpch_q3(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q3 shape: selective dimension filter -> two-join funnel ->
    aggregate -> top-10. Both dimension filters push to their scans; the
    customer side broadcasts (it is the small post-filter side)."""
    cutoff = F.lit("1998-01-01 00:00:00").cast("timestamp")
    cust = t(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = t(spark, sf, "orders").filter(F.col("o_orderdate") < cutoff)
    li = t(spark, sf, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@query(
    "olap_tpch_q5_region_volume",
    sql="""
    SELECT n_name, sum(l_extendedprice * (1 - l_discount)) AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey
      AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
    tags=("olap", "join", "tpch"),
)
def tpch_q5(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q5 shape: six-table snowflake join with a same-nation
    constraint between customer and supplier. The nation/region funnel and
    both entity dims broadcast; only fact-fact joins shuffle."""
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1998-01-01 00:00:00").cast("timestamp")
    asia_nations = (
        t(spark, sf, "nation")
        .join(
            t(spark, sf, "region").filter(F.col("r_name") == "ASIA"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    supp = t(spark, sf, "supplier").join(
        F.broadcast(asia_nations), F.col("s_nationkey") == F.col("n_nationkey")
    )
    orders = t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    )
    cust = t(spark, sf, "customer")
    return (
        t(spark, sf, "lineitem")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(supp),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            F.sum(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).alias(
                "revenue"
            )
        )
    )


# --------------------------------------------------- pandas UDAF + salting


@query(
    "olap_udaf_geometric_mean",
    sql="""
    SELECT user_id,
           round(CASE WHEN min(value) = 0 THEN 0.0
                      ELSE exp(avg(ln(nullif(value, 0)))) END, 6) AS geo_value
    FROM events GROUP BY user_id
    """,
    tags=("olap", "agg", "udaf"),
)
def udaf_geometric_mean(spark: SparkSession, sf: str) -> DataFrame:
    """Grouped-aggregate pandas UDF (Arrow-batched UDAF): per-user geometric
    mean of event values. The UDAF is the residue path for aggregates the
    built-ins cannot express; here the oracle cross-checks it against the
    exp(avg(ln)) identity. A zero factor makes the geometric mean zero —
    numpy reaches that through ln(0) = -inf, exp(-inf) = 0, while the SQL
    twin must guard DuckDB's erroring ln(0) with a CASE on min(value)
    (caught by the round-4 sf0.1 sweep: the gate corpus has no zeros,
    sf0.1 has six)."""
    import pandas as pd

    def _geo(v):
        import numpy as np

        return float(np.exp(np.log(v.to_numpy(dtype="float64")).mean()))

    # `from __future__ import annotations` stringifies hints module-wide;
    # pandas_udf infers the UDF kind from REAL annotation objects
    _geo.__annotations__ = {"v": pd.Series, "return": float}
    geo_mean = F.pandas_udf(_geo, "double")

    ev = t(spark, sf, "events")
    # grouped-agg pandas UDFs cannot mix with built-in aggregates in one
    # agg() — the UDAF stands alone here
    return ev.groupBy("user_id").agg(F.round(geo_mean("value"), 6).alias("geo_value"))


@query(
    "olap_salted_join",
    sql="""
    SELECT e.user_id, o.event_type, CAST(count(*) AS BIGINT) AS n,
           sum(e.value) AS sum_value
    FROM events e JOIN (SELECT DISTINCT event_type, 1 AS tag FROM events) o
      ON e.event_type = o.event_type
    GROUP BY e.user_id, o.event_type
    """,
    tags=("olap", "join", "skew"),
)
def salted_join_q(spark: SparkSession, sf: str) -> DataFrame:
    """Salted equi-join (operators/joins.py:salted_join): events joined to a
    5-row event_type dim — a worst-case hot-key shape (every key is hot).
    The salt spreads each event_type across 16 shuffle partitions; the
    oracle is the plain join, which must match exactly."""
    from big_data_player_analysis_spark.operators.joins import salted_join

    ev = t(spark, sf, "events")
    dim = ev.select("event_type").distinct().withColumn("tag", F.lit(1))
    joined = salted_join(ev.select("user_id", "event_type", "value"), dim,
                         on="event_type", num_salts=16)
    return joined.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value")
    )


@query(
    "olap_apply_in_pandas_longest_run",
    sql="""
    WITH seq AS (
      SELECT user_id, ts, event_id,
             CASE WHEN value > lag(value) OVER w THEN 0 ELSE 1 END AS new_run
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), runs AS (
      SELECT user_id,
             sum(new_run) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
      FROM seq
    )
    SELECT user_id, CAST(max(run_len) AS BIGINT) AS longest_run
    FROM (SELECT user_id, run_id, count(*) AS run_len FROM runs GROUP BY user_id, run_id)
    GROUP BY user_id
    """,
    tags=("olap", "udf", "secondary-sort"),
)
def apply_in_pandas_longest_run(spark: SparkSession, sf: str) -> DataFrame:
    """Arbitrary per-group reducer over SORTED group values — the Spark form
    of the reference's secondary sort + reducer (reference emulator.py:108-129
    fSortCmp + fReduce): groupBy().applyInPandas receives the whole group,
    sorts by event time, and scans imperatively for the longest strictly
    ascending value run. The oracle is the declarative gaps-and-islands
    rewrite, proving both formulations agree."""
    import pandas as pd

    def longest_run(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(["ts", "event_id"])
        best = cur = 0
        prev = None
        for v in pdf["value"]:
            cur = cur + 1 if prev is not None and v > prev else 1
            best = max(best, cur)
            prev = v
        return pd.DataFrame({"user_id": [pdf["user_id"].iloc[0]], "longest_run": [best]})

    ev = t(spark, sf, "events").select("user_id", "ts", "event_id", "value")
    return ev.groupBy("user_id").applyInPandas(
        longest_run, "user_id long, longest_run long"
    )


# ------------------------------------------------------- subquery shapes


@query(
    "olap_exists_correlated",
    sql="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
    tags=("olap", "subquery"),
)
def exists_correlated(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q4 shape: orders with at least one lineitem shipped >60 days
    after the order date, counted per priority. The correlated EXISTS is a
    LEFT SEMI join with a non-equi residual condition — one shuffle on the
    order key, no fan-out duplication from multi-lineitem orders."""
    o = t(spark, sf, "orders")
    l = t(spark, sf, "lineitem")
    qualified = o.join(
        l,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return qualified.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


@query(
    "olap_scalar_correlated",
    sql="""
    SELECT p_brand, CAST(count(*) AS BIGINT) AS n_small,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_value
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_quantity < (SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2
                        WHERE l2.l_partkey = l_partkey)
    GROUP BY p_brand
    """,
    tags=("olap", "subquery"),
)
def scalar_correlated(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q17 shape: lineitems below half their part's average quantity,
    summarized per brand. Written as SQL with the correlated scalar
    subquery intact so Catalyst performs the decorrelation (rewrite to an
    aggregate + join on l_partkey) instead of us hand-rolling it. The
    money sum aggregates as DECIMAL(18,2) in BOTH engines: a raw double
    sum of ~6k prices per brand carries accumulation-order noise above
    the 1e-6 absolute compare at sf0.1 magnitudes (round-4 sweep find;
    the correlated avg(l_quantity) threshold needs no guard — quantities
    are integer-valued doubles, so their sums and averages are exact).
    The subquery filter itself is deterministic and engine-portable."""
    t(spark, sf, "lineitem").createOrReplaceTempView("lineitem")
    t(spark, sf, "part").createOrReplaceTempView("part")
    return spark.sql(
        """
        SELECT p_brand, count(*) AS n_small,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS total_value
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE l_quantity < (SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2
                            WHERE l2.l_partkey = l_partkey)
        GROUP BY p_brand
        """
    )


@query(
    "olap_in_subquery",
    sql="""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey HAVING sum(l_quantity) > 180)
    """,
    tags=("olap", "subquery"),
)
def in_subquery(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total lineitem quantity exceeds 180
    (~p90). The IN-subquery becomes a semi join against the HAVING
    aggregate; quantities are integral so the sum is exact in fp and the
    threshold is engine-stable."""
    t(spark, sf, "orders").createOrReplaceTempView("orders")
    t(spark, sf, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                             GROUP BY l_orderkey HAVING sum(l_quantity) > 180)
        """
    )


# ------------------------------------------------------- grouping sets


@query(
    "olap_grouping_sets",
    sql="""
    SELECT coalesce(l_returnflag, 'ALL') AS rflag,
           coalesce(l_linestatus, 'ALL') AS lstatus,
           sum(l_quantity) AS sum_qty, CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
    tags=("olap", "agg"),
)
def grouping_sets(spark: SparkSession, sf: str) -> DataFrame:
    """Explicit GROUPING SETS (detail + per-flag subtotal + grand total) —
    the SQL surface beyond cube()/rollup(); one Expand + one aggregate,
    not three scans."""
    t(spark, sf, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT coalesce(l_returnflag, 'ALL') AS rflag,
               coalesce(l_linestatus, 'ALL') AS lstatus,
               sum(l_quantity) AS sum_qty, count(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


# --------------------------------------------------- descriptive statistics


@query(
    "olap_descriptive_stats",
    sql="""
    SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
           round(avg(l_extendedprice), 6) AS avg_price,
           round(stddev_samp(l_extendedprice), 4) AS sd_price,
           round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
           round(covar_samp(l_quantity, l_extendedprice), 4) AS qty_price_cov,
           round(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
           round(quantile_cont(l_extendedprice, 0.95), 6) AS p95
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("olap", "agg"),
)
def descriptive_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Column-profiling aggregates (stddev / correlation / covariance +
    exact interpolated percentiles) — the descriptive-stats and percentile
    categories in one single-pass plan (olap_percentiles keeps the
    percentile-only shape). Moments rounded because the two engines'
    co-moment accumulation orders differ in the last ulps."""
    return t(spark, sf, "lineitem").groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd_price"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("qty_price_cov"),
        F.round(F.percentile("l_extendedprice", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("l_extendedprice", F.lit(0.95)), 6).alias("p95"),
    )


# --------------------------------------------------- time-range window


@query(
    "olap_window_time_range",
    sql="""
    SELECT event_id, user_id,
           round(avg(value) OVER w, 6) AS avg_10m,
           CAST(count(*) OVER w AS BIGINT) AS n_10m
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)
    """,
    tags=("olap", "window"),
)
def window_time_range(spark: SparkSession, sf: str) -> DataFrame:
    """Trailing 10-minute per-user rolling average — the time-RANGE window
    frame (peers by event-time value, not row count) that rowsBetween
    windows cannot express. Ordered on unix_micros so the frame bound is
    an exact integer both engines agree on; the window is one
    hash-exchange on user_id + an in-partition sort, same as any ranking
    window."""
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-600_000_000, 0)
    )
    return t(spark, sf, "events").select(
        "event_id",
        "user_id",
        F.round(F.avg("value").over(w), 6).alias("avg_10m"),
        F.count(F.lit(1)).over(w).cast("long").alias("n_10m"),
    )


# --------------------------------------------------- table profiling

PROFILE_COLUMNS = ["l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus"]

_SQL_PROFILE_ONE = """
SELECT '{c}' AS "column", count(*) AS n_rows,
       CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
       CAST(min({c}) AS VARCHAR) AS min_val,
       CAST(max({c}) AS VARCHAR) AS max_val
FROM lineitem"""

SQL_PROFILE = "\nUNION ALL".join(
    _SQL_PROFILE_ONE.format(c=c) for c in PROFILE_COLUMNS
)


@query("olap_table_profile", sql=SQL_PROFILE, tags=("olap", "profiling"))
def table_profile(spark: SparkSession, sf: str) -> DataFrame:
    """Single-pass data-quality profile of lineitem: per-column row/null/
    exact-distinct counts + min/max in ONE scan (all aggregates fused into
    one partial/final hash-aggregate pair; the multi-distinct rewrite is
    Catalyst's Expand, bounded by the profiled column list —
    operators/profiling.py:profile_table). Profiled columns are int/string
    so min/max string rendering is engine-portable."""
    from big_data_player_analysis_spark.operators.profiling import profile_table

    return profile_table(t(spark, sf, "lineitem"), PROFILE_COLUMNS)


# --------------------------------------------- partitioned layout / pruning


@query(
    "olap_partition_pruned_scan",
    sql="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           min(event_id) AS first_event,
           max(event_id) AS last_event
    FROM events
    WHERE event_type = 'purchase'
    GROUP BY event_type
    """,
    tags=("olap", "layout", "pruning"),
)
def partition_pruned_scan(spark: SparkSession, sf: str) -> DataFrame:
    """Data skipping via hive-partitioned layout: events re-materialized
    ``partitionBy(event_type)`` (sources/formats.py:ensure_partitioned_layout),
    then the ``event_type = 'purchase'`` predicate resolves against
    directory names at planning time — PartitionFilters, NOT a row filter:
    the other four event types contribute zero scanned bytes. At 100 TB
    this is the first-order scan lever (a date- or source-partitioned lake
    reads only the matching partitions, no index needed). Plan pinned in
    tests/test_plans.py::test_partition_pruned_scan_skips_data. The oracle
    runs the same aggregate on the unpartitioned table — layout must never
    change query results."""
    from big_data_player_analysis_spark.sources.formats import (
        ensure_partitioned_layout,
        read_table,
    )

    path = ensure_partitioned_layout(spark, sf, "events", ["event_type"])
    ev = read_table(spark, path)
    return (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.min("event_id").alias("first_event"),
            F.max("event_id").alias("last_event"),
        )
    )


# ------------------------------------------------------------ z-order layout

from big_data_player_analysis_spark.operators.layout import (  # noqa: E402
    zorder_key,
    zorder_key_sql,
)

_Z_SQL = f"""
WITH q AS (
  SELECT event_id,
         ((user_id % 256) + 256) % 256 AS x,
         ((CAST(floor(value) AS BIGINT) % 256) + 256) % 256 AS y
  FROM events)
SELECT event_id, x, y, {zorder_key_sql(["x", "y"], 8)} AS zvalue FROM q
"""


@query("olap_zorder_key", sql=_Z_SQL, tags=("olap", "layout", "pruning"))
def zorder_key_q(spark: SparkSession, sf: str) -> DataFrame:
    """Morton (z-order) key over two quantized event dimensions — the
    clustering key behind multi-dimensional data skipping (Delta/Iceberg
    OPTIMIZE ZORDER). The interleave is a fixed unrolled OR/shift
    expression tree (operators/layout.py:zorder_key — JVM codegen, no
    UDF), replayed exactly by the oracle's arithmetic form. The write-side
    layout (repartitionByRange + sortWithinPartitions) and the row-group
    pruning property it buys are pinned with real parquet metadata in
    tests/test_layout.py."""
    ev = t(spark, sf, "events").select(
        "event_id",
        F.pmod(F.col("user_id"), F.lit(256)).cast("long").alias("x"),
        F.pmod(F.floor("value").cast("long"), F.lit(256)).alias("y"),
    )
    return ev.select("event_id", "x", "y", zorder_key(["x", "y"], 8).alias("zvalue"))


# ------------------------------------------------------------- CDC upsert

SQL_CDC_UPSERT = """
WITH agg AS (
  SELECT o_custkey AS k, round(sum(o_totalprice), 2) AS nb
  FROM orders GROUP BY o_custkey),
ch AS (
  SELECT k, CASE WHEN k % 10 = 0 THEN 'D' ELSE 'U' END AS op, nb FROM agg
  UNION ALL
  SELECT k + 1000000 AS k, 'I' AS op, nb FROM agg WHERE k % 7 = 0)
SELECT coalesce(c.c_custkey, ch.k) AS c_custkey,
       c.c_name,
       CASE WHEN ch.op IN ('U', 'I') THEN ch.nb ELSE c.c_acctbal END AS c_acctbal
FROM customer c FULL OUTER JOIN ch ON c.c_custkey = ch.k
WHERE ch.op IS NULL
   OR (ch.op = 'U' AND c.c_custkey IS NOT NULL)
   OR (ch.op = 'I' AND c.c_custkey IS NULL)
"""


@query("olap_cdc_upsert", sql=SQL_CDC_UPSERT, tags=("olap", "cdc", "lakehouse", "bench"))
def cdc_upsert_q(spark: SparkSession, sf: str) -> DataFrame:
    """MERGE INTO semantics on plain DataFrames (operators/cdc.py): a
    deterministic change batch derived from orders (delete every 10th
    customer, update the rest to their order-value sum, insert offset
    synthetic keys for every 7th) applied to the customer snapshot in ONE
    keyed full-outer join — matched deletes drop, matched updates rewrite
    the balance, unmatched inserts land with NULL carried columns.
    Conflicting ops and inserts-for-existing-keys raise up front. At scale
    the change batch broadcasts (AQE) and the snapshot never moves."""
    from big_data_player_analysis_spark.operators.cdc import cdc_upsert

    cust = t(spark, sf, "customer").select("c_custkey", "c_name", "c_acctbal")
    agg = (
        t(spark, sf, "orders")
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(F.round(F.sum("o_totalprice"), 2).alias("c_acctbal"))
    )
    changes = agg.select(
        "c_custkey",
        F.when(F.pmod("c_custkey", F.lit(10)) == 0, F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        "c_acctbal",
    ).unionByName(
        agg.filter(F.pmod("c_custkey", F.lit(7)) == 0).select(
            (F.col("c_custkey") + F.lit(1_000_000)).alias("c_custkey"),
            F.lit("I").alias("op"),
            "c_acctbal",
        )
    )
    return cdc_upsert(cust, changes, "c_custkey", ["c_acctbal"])


# ---------------------------------------------------------- data-quality audit

SQL_DQ_AUDIT = """
SELECT 'orders_null_custkey' AS constraint_name,
       CAST(count(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT) AS n_violations
FROM orders
UNION ALL
SELECT 'orders_dup_key', CAST(coalesce(sum(n - 1), 0) AS BIGINT)
FROM (SELECT o_orderkey, count(*) AS n FROM orders GROUP BY o_orderkey HAVING count(*) > 1)
UNION ALL
SELECT 'orders_orphan_custkey', CAST(count(*) AS BIGINT)
FROM orders o WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
UNION ALL
SELECT 'orders_nonpositive_price', CAST(count(*) FILTER (WHERE o_totalprice <= 0) AS BIGINT)
FROM orders
UNION ALL
SELECT 'lineitem_orphan_orderkey', CAST(count(*) AS BIGINT)
FROM lineitem l WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
"""


@query("olap_dq_audit", sql=SQL_DQ_AUDIT, tags=("olap", "quality", "audit"))
def dq_audit_q(spark: SparkSession, sf: str) -> DataFrame:
    """Constraint audit (dbt-test/Deequ shape): null keys, duplicate
    primary keys, referential orphans (orders->customer,
    lineitem->orders), and a value-range rule, emitted long-form as
    (constraint_name, n_violations). Scale shape: the per-table rules fuse
    into one conditional aggregate per scan; each referential rule is a
    keyed left-anti join with no forced hint (the key sides scale with SF
    here, so AQE broadcasts only when they measure small) — no rule adds a
    second pass over a fact table."""
    orders = t(spark, sf, "orders")
    cust = t(spark, sf, "customer")
    li = t(spark, sf, "lineitem")

    def row(name: str, df: DataFrame) -> DataFrame:
        return df.select(
            F.lit(name).alias("constraint_name"),
            F.coalesce(F.first("n"), F.lit(0)).cast("long").alias("n_violations"),
        )

    per_scan = orders.agg(
        F.count(F.when(F.col("o_custkey").isNull(), 1)).alias("null_ck"),
        F.count(F.when(F.col("o_totalprice") <= 0, 1)).alias("bad_price"),
    )
    dup = (
        orders.groupBy("o_orderkey")
        .count()
        .filter(F.col("count") > 1)
        .agg(F.sum(F.col("count") - 1).alias("n"))
    )
    # no forced broadcast hint: customer scales with SF in this schema, so
    # the anti-join side is only conditionally small — AQE broadcasts it
    # when it measures under the threshold, else plain shuffle anti
    orphan_o = (
        orders.join(cust.select("c_custkey"),
                    orders.o_custkey == F.col("c_custkey"), "left_anti")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    orphan_l = (
        li.join(orders.select("o_orderkey"),
                li.l_orderkey == F.col("o_orderkey"), "left_anti")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        per_scan.select(
            F.lit("orders_null_custkey").alias("constraint_name"),
            F.col("null_ck").cast("long").alias("n_violations"),
        )
        .unionByName(row("orders_dup_key", dup))
        .unionByName(row("orders_orphan_custkey", orphan_o))
        .unionByName(
            per_scan.select(
                F.lit("orders_nonpositive_price").alias("constraint_name"),
                F.col("bad_price").cast("long").alias("n_violations"),
            )
        )
        .unionByName(row("lineitem_orphan_orderkey", orphan_l))
    )


# ------------------------------------------------------------ SCD2 history

SQL_SCD2 = """
SELECT o_custkey AS c_custkey,
       round(o_totalprice, 2) AS bal,
       o_orderdate AS valid_from,
       lead(o_orderdate) OVER w AS valid_to,
       CAST(lead(o_orderdate) OVER w IS NULL AS BOOLEAN) AS is_current
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


@query("olap_scd2_history", sql=SQL_SCD2, tags=("olap", "cdc", "lakehouse", "bench"))
def scd2_q(spark: SparkSession, sf: str) -> DataFrame:
    """Slowly-changing-dimension type 2: a keyed change log (each order =
    a new balance version for its customer) turned into validity-ranged
    history rows — valid_from = the change's date, valid_to = the NEXT
    change's date via lead() over (key, time, tiebreak id), open-ended
    rows flagged is_current. One window = one exchange on the key; the
    companion point-in-time lookup is then a plain BETWEEN filter. The
    tiebreak on o_orderkey makes same-day changes totally ordered, so the
    history is deterministic and engine-portable."""
    from pyspark.sql import Window as W

    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    o = t(spark, sf, "orders")
    return o.select(
        F.col("o_custkey").alias("c_custkey"),
        F.round("o_totalprice", 2).alias("bal"),
        F.col("o_orderdate").alias("valid_from"),
        F.lead("o_orderdate").over(w).alias("valid_to"),
        F.lead("o_orderdate").over(w).isNull().alias("is_current"),
    )


# ---------------------------------------------------------- funnel analysis

SQL_FUNNEL = """
WITH a AS (
  SELECT user_id, min(ts) AS ta FROM events WHERE event_type = 'view' GROUP BY user_id),
b AS (
  SELECT e.user_id, min(e.ts) AS tb
  FROM events e JOIN a ON e.user_id = a.user_id
  WHERE e.event_type = 'click' AND e.ts > a.ta GROUP BY e.user_id),
c AS (
  SELECT e.user_id, min(e.ts) AS tc
  FROM events e JOIN b ON e.user_id = b.user_id
  WHERE e.event_type = 'purchase' AND e.ts > b.tb GROUP BY e.user_id)
SELECT 1 AS step, 'view' AS event_type, CAST((SELECT count(*) FROM a) AS BIGINT) AS n_users
UNION ALL
SELECT 2, 'click', CAST((SELECT count(*) FROM b) AS BIGINT)
UNION ALL
SELECT 3, 'purchase', CAST((SELECT count(*) FROM c) AS BIGINT)
"""


@query("olap_funnel_conversion", sql=SQL_FUNNEL, tags=("olap", "analytics", "events", "bench"))
def funnel_q(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered funnel (view -> click -> purchase): a user advances a step
    only with an event strictly AFTER their first event of the previous
    step — the product-analytics conversion query. Plan shape (pinned in
    tests/test_plans.py): each stage's first-event table is an aggregate
    over only ITS event type's filtered scan, and that per-user table
    BROADCASTS into the next stage's join — the events table itself never
    shuffles for a stage join, and each exchange carries one step's
    filtered subset, not the corpus. Output is the long-form step table a
    funnel chart consumes."""
    ev = t(spark, sf, "events").select("user_id", "event_type", "ts")

    def first_after(etype: str, prev: DataFrame | None) -> DataFrame:
        step = ev.filter(F.col("event_type") == etype)
        if prev is not None:
            step = step.join(prev, "user_id").filter(F.col("ts") > F.col("t_prev"))
        return step.groupBy("user_id").agg(F.min("ts").alias("t_prev"))

    a = first_after("view", None)
    b = first_after("click", a)
    c = first_after("purchase", b)

    def row(step: int, etype: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(step).cast("int").alias("step"),
            F.lit(etype).alias("event_type"),
            F.count(F.lit(1)).cast("long").alias("n_users"),
        )

    return row(1, "view", a).unionByName(row(2, "click", b)).unionByName(
        row(3, "purchase", c)
    )


# --------------------------------------------------------- retention cohorts

SQL_RETENTION = """
WITH first_seen AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week FROM events GROUP BY user_id),
activity AS (
  SELECT DISTINCT e.user_id, f.cohort_week,
         CAST(floor(date_diff('day', f.cohort_week, date_trunc('week', e.ts)) / 7)
              AS INT) AS week_no
  FROM events e JOIN first_seen f ON e.user_id = f.user_id)
SELECT cohort_week, week_no, CAST(count(*) AS BIGINT) AS n_active
FROM activity GROUP BY cohort_week, week_no
"""


@query("olap_retention_cohorts", sql=SQL_RETENTION, tags=("olap", "analytics", "events", "bench"))
def retention_q(spark: SparkSession, sf: str) -> DataFrame:
    """Weekly retention cohorts: users grouped by first-seen week, counted
    once per (cohort, weeks-since-cohort) they were active in — the
    retention-curve matrix. Two aggregates on user_id (first-seen, then
    the distinct activity grid) plus one counting aggregate; the user_id
    exchange is shared between the first-seen aggregate and the join
    back. Week arithmetic is date_trunc-based so both engines bucket
    identically (ISO Monday weeks)."""
    ev = t(spark, sf, "events").select("user_id", "ts")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = (
        ev.join(first_seen, "user_id")
        .select(
            "user_id",
            "cohort_week",
            F.floor(
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week")) / 7
            )
            .cast("int")
            .alias("week_no"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_week", "week_no").agg(
        F.count(F.lit(1)).cast("long").alias("n_active")
    )


# --------------------------------------------------------- key-skew profile

SQL_KEY_SKEW = """
WITH c AS (
  SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id
)
SELECT
  CAST(sum(cnt) AS BIGINT) AS total_rows,
  CAST(count(*) AS BIGINT) AS distinct_keys,
  max(cnt) AS max_rows_per_key,
  CAST(sum(cnt) AS DOUBLE) / count(*) AS avg_rows_per_key,
  quantile_cont(cnt, 0.50) AS p50_rows_per_key,
  quantile_cont(cnt, 0.90) AS p90_rows_per_key,
  quantile_cont(cnt, 0.99) AS p99_rows_per_key,
  max(cnt) / (CAST(sum(cnt) AS DOUBLE) / count(*)) AS skew_factor
FROM c
"""


@query(
    "olap_key_skew_profile",
    sql=SQL_KEY_SKEW,
    tags=("olap", "profile", "skew", "bench"),
)
def key_skew_profile_q(spark: SparkSession, sf: str) -> DataFrame:
    """Skew diagnostics on the events join key (operators/profiling.py:
    key_skew_profile): exact p50/p90/p99 rows-per-key interpolated from a
    count-of-counts histogram — never a global sort of per-key counts;
    see the operator docstring for the scale argument. The DuckDB twin's
    quantile_cont validates the interpolation exactly."""
    from big_data_player_analysis_spark.operators.profiling import (
        key_skew_profile,
    )

    return key_skew_profile(t(spark, sf, "events"), "user_id")


# ------------------------------------------------- mergeable distinct sketch


@query("olap_hll_shard_merge", sql=None, tags=("olap", "agg", "approx", "sketch"))
def hll_shard_merge(spark: SparkSession, sf: str) -> DataFrame:
    """Sharded mergeable-HLL distinct (operators/profiling.py:
    hll_distinct_shard_merge) over events.user_id, sharded by event_id
    hash. Sketch register values are engine-specific (DuckDB's
    approx_count_distinct is a different HLL implementation), so this
    entry is rows-only; the strong properties — merged == single-pass
    exactly, both within rated error of exact — are pinned in
    tests/test_operators.py."""
    from big_data_player_analysis_spark.operators.profiling import (
        hll_distinct_shard_merge,
    )

    return hll_distinct_shard_merge(t(spark, sf, "events"), "user_id", "event_id")


# -------------------------------------------------- time-series gap fill


@query(
    "olap_gap_fill",
    sql="""
    WITH daily AS (
      SELECT user_id, date_trunc('day', ts) AS day,
             sum(value) AS day_value
      FROM events GROUP BY 1, 2
    ), spine AS (
      SELECT user_id,
             unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS day
      FROM (SELECT user_id, min(day) AS mn, max(day) AS mx
            FROM daily GROUP BY user_id)
    ), j AS (
      SELECT s.user_id, s.day, d.day_value
      FROM spine s LEFT JOIN daily d USING (user_id, day)
    )
    SELECT user_id, day,
           last_value(day_value IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS filled_value,
           CAST(CASE WHEN day_value IS NULL THEN 1 ELSE 0 END AS BIGINT)
             AS is_gap
    FROM j
    """,
    tags=("olap", "timeseries", "window", "bench"),
)
def gap_fill(spark: SparkSession, sf: str) -> DataFrame:
    """Per-user daily activity series densified over each user's active
    range with forward fill (operators/timeseries.py:gap_fill_daily):
    silent days become explicit (day, carried_value, is_gap=1) rows, so
    downstream rolling windows see a regular axis. Spark plan is the
    gap-explode formulation — lead() + sequence()/explode, two shuffles,
    no join — while the oracle replays the textbook spine-join +
    last(IGNORE NULLS) fill, so the hash match also certifies the two
    formulations equivalent."""
    from big_data_player_analysis_spark.operators.timeseries import (
        gap_fill_daily,
    )

    return gap_fill_daily(t(spark, sf, "events"), "user_id", "ts", "value")


# ------------------------------------------- window distribution functions


@query(
    "olap_window_distribution",
    sql="""
    SELECT c_nationkey, c_custkey,
           CAST(ntile(4) OVER (PARTITION BY c_nationkey
                               ORDER BY c_acctbal, c_custkey) AS BIGINT)
             AS quartile,
           percent_rank() OVER (PARTITION BY c_nationkey
                                ORDER BY c_acctbal, c_custkey) AS pct_rank,
           cume_dist() OVER (PARTITION BY c_nationkey
                             ORDER BY c_acctbal, c_custkey) AS cum_dist
    FROM customer
    """,
    tags=("olap", "window"),
)
def window_distribution(spark: SparkSession, sf: str) -> DataFrame:
    """Distribution window functions — ntile quartiles, percent_rank,
    cume_dist per nation over customer balance (tiebreak c_custkey makes
    every rank deterministic). NOT the direct one-window form: c_nationkey
    has 25 values, so `ntile OVER (PARTITION BY c_nationkey ORDER BY ...)`
    is a 25-task corpus sort at any scale — the same class as the duels
    derivation (round-7 wrong #1). operators/topk.py:distribution_ranks
    computes the identical statistics from bucket-parallel exact ranks
    (range-bucket the balance, row_number within (nation, bucket), global
    rank = tiny-table running offset + local row number, then the
    closed-form rank->statistic formulas); equality with the direct
    window is pinned in tests/test_operators.py, and the oracle below IS
    the direct window."""
    from big_data_player_analysis_spark.operators.topk import distribution_ranks

    return distribution_ranks(
        t(spark, sf, "customer").select("c_nationkey", "c_custkey", "c_acctbal"),
        "c_nationkey",
        "c_acctbal",
        "c_custkey",
        n_tiles=4,
    ).select("c_nationkey", "c_custkey", "quartile", "pct_rank", "cum_dist")


# ------------------------------------------------------- graph analytics


@query(
    "olap_triangle_count",
    sql="""
    WITH duels AS (
      SELECT challenger_id, challenged_id FROM (
        SELECT user_id AS challenger_id,
               lead(user_id) OVER (PARTITION BY event_type
                                   ORDER BY ts, event_id) AS challenged_id
        FROM events
      ) WHERE challenged_id IS NOT NULL
    ), e AS (
      SELECT DISTINCT least(challenger_id, challenged_id) AS u,
                      greatest(challenger_id, challenged_id) AS v
      FROM duels WHERE challenger_id <> challenged_id
    )
    SELECT
      (SELECT CAST(count(DISTINCT node) AS BIGINT) FROM
         (SELECT u AS node FROM e UNION ALL SELECT v FROM e)) AS n_nodes,
      (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
      (SELECT CAST(count(*) AS BIGINT)
       FROM e ab JOIN e bc ON ab.v = bc.u
                 JOIN e ac ON ac.u = ab.u AND ac.v = bc.v) AS n_triangles
    """,
    tags=("olap", "graph", "bench"),
)
def triangle_count_q(spark: SparkSession, sf: str) -> DataFrame:
    """Exact triangle count over the canonicalized duel graph
    (operators/graph.py:triangle_count — degree-oriented node-iterator:
    each triangle counted exactly once at its (deg,id)-minimal vertex,
    wedge volume bounded O(E^1.5) by the orientation, everything joins +
    aggregates on vertex keys). The oracle replays the naive triple
    self-join over the same canonical edges — identical count, viable
    only at oracle scale, which is exactly the point of the oriented
    plan."""
    from big_data_player_analysis_spark.operators.graph import (
        triangle_count,
    )
    from big_data_player_analysis_spark.registry.common import duel_edges

    return triangle_count(
        duel_edges(spark, sf), "challenger_id", "challenged_id"
    )


# --------------------------------------------------- TPC-H Q18 / unpivot


@query(
    "olap_tpch_q18_large_orders",
    sql="""
    WITH big AS (
      SELECT l_orderkey, sum(l_quantity) AS sum_qty
      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 250
    )
    SELECT c.c_custkey, o.o_orderkey, o.o_totalprice, big.sum_qty
    FROM big
    JOIN orders o ON o.o_orderkey = big.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    """,
    tags=("olap", "join", "tpch", "agg"),
)
def tpch_q18(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): a HAVING-filtered
    aggregate drives the join — sum(l_quantity) per order is computed
    FIRST (partial-agged, output O(orders)), the > 250 filter shrinks it
    to a small driver set, and AQE's runtime statistics then broadcast
    that set into the orders join instead of exchanging the big side.
    The agg-then-semi-join ordering is the scale lesson: filtering after
    a 3-way join would shuffle every lineitem row twice."""
    li = t(spark, sf, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    o = t(spark, sf, "orders")
    c = t(spark, sf, "customer")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select("c_custkey", "o_orderkey", "o_totalprice", "sum_qty")
    )


@query(
    "olap_unpivot",
    sql="""
    SELECT l_orderkey, l_linenumber, metric, value FROM (
      SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric,
             l_quantity AS value FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
      FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
      FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
    )
    """,
    tags=("olap", "reshape"),
)
def unpivot(spark: SparkSession, sf: str) -> DataFrame:
    """Unpivot / melt — wide measure columns to long (metric, value) rows,
    the inverse of pivot and the standard reshape before long-form
    analytics. Spark's native unpivot plans ONE Expand pass over a single
    scan (each input row emits 4 output rows in-place — narrow, no
    shuffle, no self-union); the oracle replays it as the portable
    4-way UNION ALL, which scans the table four times — the difference
    IS the scale argument."""
    return t(spark, sf, "lineitem").unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "metric",
        "value",
    )


# -------------------------------------- quantile binning / rolling stats


@query(
    "olap_quantile_binning",
    sql="""
    WITH s AS (
      SELECT o_totalprice FROM orders
      WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 4) < '4000'
    ), b AS (
      SELECT quantile_cont(o_totalprice, 0.25) AS b0,
             quantile_cont(o_totalprice, 0.5)  AS b1,
             quantile_cont(o_totalprice, 0.75) AS b2
      FROM s
    )
    SELECT o.o_orderkey, o.o_totalprice,
           CAST(1 + (CASE WHEN o.o_totalprice > b.b0 THEN 1 ELSE 0 END)
                  + (CASE WHEN o.o_totalprice > b.b1 THEN 1 ELSE 0 END)
                  + (CASE WHEN o.o_totalprice > b.b2 THEN 1 ELSE 0 END)
                AS BIGINT) AS bucket
    FROM orders o, b
    """,
    tags=("olap", "profile", "feature", "bench"),
)
def quantile_binning_q(spark: SparkSession, sf: str) -> DataFrame:
    """Equi-depth binning of order value into quartile buckets
    (operators/profiling.py:quantile_binning): boundaries are exact
    interpolated quantiles of a DETERMINISTIC 25% md5 sample (the
    RangePartitioner strategy), then every row is assigned with scalar
    comparisons against the broadcast 1-row boundary table — one bounded
    aggregate + a narrow map, where the naive ntile(4) form needs a
    global sort of all rows. The oracle replays the identical sample,
    so the check is exact while the boundary estimate stays
    sample-based."""
    from big_data_player_analysis_spark.operators.profiling import (
        quantile_binning,
    )

    return quantile_binning(
        t(spark, sf, "orders").select("o_orderkey", "o_totalprice"),
        "o_orderkey",
        "o_totalprice",
        sample_fraction=0.25,
    )


@query(
    "olap_rolling_average",
    sql="""
    WITH daily AS (
      SELECT user_id, date_trunc('day', ts) AS day,
             sum(value) AS day_value
      FROM events GROUP BY 1, 2
    ), spine AS (
      SELECT user_id,
             unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS day
      FROM (SELECT user_id, min(day) AS mn, max(day) AS mx
            FROM daily GROUP BY user_id)
    ), j AS (
      SELECT s.user_id, s.day, d.day_value
      FROM spine s LEFT JOIN daily d USING (user_id, day)
    ), f AS (
      SELECT user_id, day,
             last_value(day_value IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS filled_value
      FROM j
    )
    SELECT user_id, day,
           avg(filled_value) OVER (
             PARTITION BY user_id ORDER BY day
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS avg_7d
    FROM f
    """,
    tags=("olap", "timeseries", "window", "bench"),
)
def rolling_average(spark: SparkSession, sf: str) -> DataFrame:
    """7-day trailing average per user over the GAP-FILLED daily series —
    the payoff of olap_gap_fill: a ROWS BETWEEN 6 PRECEDING frame is only
    a calendar week because the axis is regular (on the raw sparse series
    it silently averages the last 7 OBSERVATIONS, spanning arbitrary
    time). Runs on gap_fill_daily's output; the second window re-sorts
    within partitions but adds NO exchange (partitioning on user_id is
    preserved through the explode)
    (operators/timeseries.py:rolling_average_daily)."""
    from big_data_player_analysis_spark.operators.timeseries import (
        rolling_average_daily,
    )

    return rolling_average_daily(
        t(spark, sf, "events"), "user_id", "ts", "value", days=7
    )


@query(
    "olap_anomaly_zscore",
    sql="""
    WITH daily AS (
      SELECT user_id, date_trunc('day', ts) AS day,
             sum(value) AS day_value
      FROM events GROUP BY 1, 2
    ), spine AS (
      SELECT user_id,
             unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS day
      FROM (SELECT user_id, min(day) AS mn, max(day) AS mx
            FROM daily GROUP BY user_id)
    ), j AS (
      SELECT s.user_id, s.day, d.day_value
      FROM spine s LEFT JOIN daily d USING (user_id, day)
    ), f AS (
      SELECT user_id, day,
             last_value(day_value IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS filled_value
      FROM j
    ), zc AS (
      SELECT user_id, day, filled_value,
             avg(filled_value) OVER w AS mu,
             stddev_samp(filled_value) OVER w AS sd
      FROM f
      WINDOW w AS (PARTITION BY user_id ORDER BY day
                   ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id, day, filled_value,
           round(CASE WHEN sd > 0 THEN (filled_value - mu) / sd END, 6) AS z,
           CAST(CASE WHEN sd > 0 AND abs((filled_value - mu) / sd) > 3.0
                     THEN 1
                     WHEN sd = 0 AND filled_value <> mu THEN 1
                     ELSE 0 END AS BIGINT) AS is_anomaly
    FROM zc
    """,
    tags=("olap", "timeseries", "window", "bench"),
)
def anomaly_zscore(spark: SparkSession, sf: str) -> DataFrame:
    """Trailing-window z-score anomaly flags over the gap-filled daily
    series: each day's value is compared against the mean/stddev of its
    OWN key's previous 7 days (frame excludes the current row, so a spike
    cannot suppress its own score); |z| > 3 flags the anomaly. Runs on
    olap_gap_fill's regular axis — on the raw sparse series the "previous
    7 rows" baseline would silently span arbitrary wall-clock time. Both
    window aggregates share one frame spec on the exchange the gap fill
    already established; a constant baseline (sd = 0 — exact, since zero
    sample stddev means identical values) leaves z NULL but still flags
    any deviation, while too-short baselines are never flagged
    (operators/timeseries.py:anomaly_zscore_daily)."""
    from big_data_player_analysis_spark.operators.timeseries import (
        anomaly_zscore_daily,
    )

    return anomaly_zscore_daily(
        t(spark, sf, "events"),
        "user_id",
        "ts",
        "value",
        baseline_days=7,
        threshold=3.0,
    )


# ---------------------------------------------------- event transition matrix

SQL_TRANSITIONS = """
WITH seq AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS to_type
  FROM events),
c AS (
  SELECT from_type, to_type, count(*) AS n
  FROM seq WHERE to_type IS NOT NULL GROUP BY from_type, to_type)
SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
       CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY from_type) AS p
FROM c
"""


@query(
    "olap_event_transitions",
    sql=SQL_TRANSITIONS,
    tags=("olap", "analytics", "events", "window"),
)
def event_transitions_q(spark: SparkSession, sf: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams:
    count (event_type -> next event_type) hops along each user's
    (ts, event_id)-ordered history, then normalize rows into transition
    probabilities — the behavioral model behind next-action prediction
    and funnel-drop diagnosis. Plan: ONE exchange on user_id feeds the
    lead() window; the pair aggregate partial-aggregates map-side down to
    |event_types|^2 rows, and the row-normalizing sum() window runs on
    that tiny aggregate — no second pass over the events table. The
    (ts, event_id) tiebreak makes each user's sequence a total order, so
    counts are deterministic and engine-portable (same derivation as
    registry/common.py:duel_edges, reference exercise_1.py:41's stream
    pairing lifted to per-user sequences)."""
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        t(spark, sf, "events")
        .select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
    )
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    wrow = W.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(wrow)).alias("p"),
    )


# ------------------------------------------------------- min-cost supplier

SQL_MIN_COST_SUPPLIER = """
WITH ps AS (
  SELECT l_partkey, l_suppkey,
         sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS cost
  FROM lineitem GROUP BY l_partkey, l_suppkey),
m AS (
  SELECT l_partkey, l_suppkey, cost,
         min(cost) OVER (PARTITION BY l_partkey) AS min_cost
  FROM ps)
SELECT m.l_partkey AS p_partkey, s.s_name, n.n_name,
       CAST(m.cost AS DOUBLE) AS min_cost
FROM m
JOIN supplier s ON m.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE m.cost = m.min_cost
"""


@query(
    "olap_min_cost_supplier",
    sql=SQL_MIN_COST_SUPPLIER,
    tags=("olap", "join", "tpch", "window"),
)
def min_cost_supplier_q(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier): for every part, the
    supplier(s) whose total billed price for that part is the per-part
    minimum, decorated with supplier and nation names. The correlated
    `cost = (SELECT min(cost) ...)` subquery is decorrelated into a
    min() window over the (part, supplier) aggregate. Plan shape — chosen
    by the shuffle audit, not intuition: repartition(l_partkey) FIRST, so
    hash(l_partkey) satisfies the ClusteredDistribution of both the
    (l_partkey, l_suppkey) aggregate (subset property) and the window's
    partitionBy — ONE exchange of the projected lineitem (93 MB at
    composed sf1). The textbook agg-first plan (map-side partial agg,
    then a second exchange on l_partkey) measured 222 MB on the same
    data: this corpus has ~no (part, supplier) duplication, so the
    partial agg compressed nothing and the plan paid the exchange twice
    in 16-byte decimals. Break-even is a pair-duplication factor of ~2 —
    on TPC-H-shaped data (~7 lineitems per partsupp) the agg-first plan
    wins and the swap is one line; both variants' bytes are recorded in
    SHUFFLE.md history. The argmin filter keeps ALL tied suppliers (Q2
    semantics). Costs are summed as
    DECIMAL(18,2), so the aggregate is exact and order-independent —
    double summation would make the cross-engine argmin comparison
    nondeterministic in the low bits. The supplier join runs on the
    O(parts) argmin output, nation (25 rows) broadcasts."""
    li = t(spark, sf, "lineitem")
    from pyspark.sql import Window as W

    ps = (
        li.select("l_partkey", "l_suppkey", "l_extendedprice")
        .repartition(F.col("l_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("cost"))
    )
    m = ps.withColumn(
        "min_cost", F.min("cost").over(W.partitionBy("l_partkey"))
    ).filter(F.col("cost") == F.col("min_cost"))
    sup = t(spark, sf, "supplier")
    nat = t(spark, sf, "nation")
    return (
        m.join(sup, m.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "s_name",
            "n_name",
            F.col("cost").cast("double").alias("min_cost"),
        )
    )


# ----------------------------------------- mergeable quantile sketch

BK_K = 2048
BK_QS = (0.5, 0.9, 0.99)

SQL_BK_QUANTILES = f"""
WITH s AS (
  SELECT CAST(o_totalprice AS DOUBLE) AS v
  FROM orders ORDER BY md5(CAST(o_orderkey AS VARCHAR)), v
  LIMIT {BK_K}),
n AS (SELECT count(*) AS sample_n FROM s)
""" + " UNION ALL ".join(
    f"""SELECT CAST({q} AS DOUBLE) AS q, quantile_cont(v, {q}) AS estimate,
        CAST(sample_n AS BIGINT) AS sample_n FROM s, n GROUP BY sample_n"""
    for q in BK_QS
)


@query(
    "olap_quantile_shard_merge",
    sql=SQL_BK_QUANTILES,
    tags=("olap", "agg", "approx", "sketch"),
)
def quantile_shard_merge_q(spark: SparkSession, sf: str) -> DataFrame:
    """Quantiles of order value from a MERGEABLE deterministic bottom-k
    sample (operators/profiling.py:bottomk_sample_quantiles) — the third
    mergeable sketch beside the HLL distinct shards and the Misra-Gries
    heavy hitters: each partition keeps the 2048 rows with the smallest
    md5 priority in O(k) state, the global bottom-k is an ordered limit
    over P*k candidates (the corpus never exchanges), and the estimates
    are exact interpolated percentiles of the sample. The sample is a
    pure function of the keys — independent of partitioning — so the SQL
    twin replays the identical sample and the approximation hash-matches
    cross-engine (Spark percentile == DuckDB quantile_cont, pinned in
    tests/test_profiling.py)."""
    from big_data_player_analysis_spark.operators.profiling import (
        bottomk_sample_quantiles,
    )

    orders = t(spark, sf, "orders").select("o_orderkey", "o_totalprice")
    return bottomk_sample_quantiles(
        orders, "o_totalprice", "o_orderkey", k=BK_K, quantiles=BK_QS
    )


# ------------------------------------------------- distribution drift (KS)

KS_BIN_CHARS = 8  # fixed-width n_chars bins; ECDF evaluated at bin edges
KS_TOP = 5

SQL_KS_DRIFT = f"""
WITH b AS (
  SELECT source, CAST(floor(n_chars / {KS_BIN_CHARS}) AS BIGINT) AS bin
  FROM documents),
sb AS (SELECT source, bin, count(*) AS c FROM b GROUP BY source, bin),
tot AS (SELECT source, sum(c) AS n FROM sb GROUP BY source),
corpus AS (SELECT bin, sum(c) AS cc FROM sb GROUP BY bin),
grand AS (SELECT sum(cc) AS g FROM corpus),
grid AS (
  SELECT t.source, c.bin, coalesce(sb.c, 0) AS c, c.cc, t.n, g.g
  FROM tot t
  CROSS JOIN corpus c
  CROSS JOIN grand g
  LEFT JOIN sb ON sb.source = t.source AND sb.bin = c.bin),
cdf AS (
  SELECT source, bin,
         sum(c)  OVER (PARTITION BY source ORDER BY bin)
           / CAST(n AS DOUBLE) AS f_src,
         (sum(cc) OVER (PARTITION BY source ORDER BY bin)
            - sum(c) OVER (PARTITION BY source ORDER BY bin))
           / CAST(g - n AS DOUBLE) AS f_rest
  FROM grid)
SELECT source, round(max(abs(f_src - f_rest)), 6) AS ks_stat
FROM cdf GROUP BY source
ORDER BY ks_stat DESC, source LIMIT {KS_TOP}
"""


@query(
    "olap_ks_drift",
    sql=SQL_KS_DRIFT,
    tags=("olap", "profile", "quality", "window"),
)
def ks_drift_q(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source distribution drift: the two-sample Kolmogorov-Smirnov
    statistic between each source's document-length distribution and the
    rest of the corpus, from BINNED ECDFs — the data-drift monitor a
    curation pipeline runs per ingest source. The textbook KS needs a
    global sort of the pooled values; evaluating both ECDFs only at fixed
    bin edges (8-char bins) turns it into one partial-aggregated
    (source, bin) count — the only exchange over the corpus — followed by
    window cumsums and the max-gap on a sources-x-bins grid of a few
    hundred rows. Binning makes D exact at the edges and understates the
    true D by at most the largest single-bin mass; for monitoring (rank
    sources, alert on jumps) that bias is irrelevant and the grid is the
    scale win. Top sources by drift, ties broken by name."""
    from pyspark.sql import Window as W

    docs = t(spark, sf, "documents")
    b = docs.select(
        "source",
        F.floor(F.col("n_chars") / KS_BIN_CHARS).cast("long").alias("bin"),
    )
    sb = b.groupBy("source", "bin").agg(F.count(F.lit(1)).alias("c"))
    tot = sb.groupBy("source").agg(F.sum("c").alias("n"))
    corpus = sb.groupBy("bin").agg(F.sum("c").alias("cc"))
    grand = corpus.agg(F.sum("cc").alias("g"))
    grid = (
        tot.crossJoin(F.broadcast(corpus))
        .crossJoin(F.broadcast(grand))
        .join(sb, ["source", "bin"], "left")
        .withColumn("c", F.coalesce("c", F.lit(0)))
    )
    w = W.partitionBy("source").orderBy("bin")
    cdf = grid.select(
        "source",
        (F.sum("c").over(w) / F.col("n").cast("double")).alias("f_src"),
        (
            (F.sum("cc").over(w) - F.sum("c").over(w))
            / (F.col("g") - F.col("n")).cast("double")
        ).alias("f_rest"),
    )
    return (
        cdf.groupBy("source")
        .agg(F.round(F.max(F.abs(F.col("f_src") - F.col("f_rest"))), 6).alias("ks_stat"))
        .orderBy(F.desc("ks_stat"), F.asc("source"))
        .limit(KS_TOP)
    )


# ---------------------------------------------- cogrouped per-key reducer

SQL_COGROUP_LAG = """
WITH e AS (SELECT user_id AS key, ts FROM events),
o AS (SELECT o_custkey AS key, o_orderkey AS okey, o_orderdate AS od FROM orders),
m AS (
  SELECT o.key, o.okey, o.od, max(e.ts) AS best
  FROM o LEFT JOIN e ON e.key = o.key AND e.ts <= o.od
  GROUP BY o.key, o.okey, o.od),
agg AS (
  SELECT key, count(*) AS n_orders, count(best) AS n_matched,
         CASE WHEN count(best) > 0 THEN
           CAST(sum(date_diff('microsecond', best, od)) AS DOUBLE)
             / 86400000000.0 / count(best)
         END AS avg_lag_days
  FROM m GROUP BY key),
keys AS (
  SELECT DISTINCT key FROM e UNION SELECT DISTINCT key FROM o)
SELECT k.key,
       coalesce(agg.n_orders, 0) AS n_orders,
       coalesce(agg.n_matched, 0) AS n_matched,
       agg.avg_lag_days
FROM keys k LEFT JOIN agg ON k.key = agg.key
"""


@query(
    "olap_cogroup_order_lag",
    sql=SQL_COGROUP_LAG,
    tags=("olap", "udf", "join", "analytics"),
)
def cogroup_order_lag_q(spark: SparkSession, sf: str) -> DataFrame:
    """Per-key reconciliation of TWO grouped inputs in one imperative
    pass: for every key (user/customer), each order is attributed to the
    latest event at-or-before its date, and the key's order count, match
    count and mean engagement lag come out of a single merge-scan —
    the cogrouped flavor of the reference's multi-input reduce
    (reference emulator.py multi-input join surface, SURVEY F8), exposed
    through Spark's groupBy().cogroup().applyInPandas
    (FlatMapCoGroupsInPandas: one exchange per side on the key, then an
    Arrow batch per key with BOTH sides — no pre-join materialization of
    the event x order pairs the SQL twin's LEFT JOIN builds). Lags are
    summed as exact integer microseconds before the one double division,
    so the mean is order-independent and engine-portable; keys present
    on either side are emitted (events-only keys count zero orders)."""
    import numpy as np
    import pandas as pd

    events = t(spark, sf, "events").select(
        F.col("user_id").alias("key"), "ts"
    )
    orders = t(spark, sf, "orders").select(
        F.col("o_custkey").alias("key"), F.col("o_orderdate").alias("od")
    )

    def lag(key, evs: pd.DataFrame, ords: pd.DataFrame) -> pd.DataFrame:
        od = np.sort(ords["od"].to_numpy(dtype="datetime64[us]"))
        et = np.sort(evs["ts"].to_numpy(dtype="datetime64[us]"))
        n_orders = len(od)
        if n_orders == 0:
            return pd.DataFrame(
                {"key": [key[0]], "n_orders": [0], "n_matched": [0],
                 "avg_lag_days": [None]}
            )
        idx = np.searchsorted(et, od, side="right") - 1
        matched = idx >= 0
        n_matched = int(matched.sum())
        avg = None
        if n_matched:
            lag_us = (od[matched] - et[idx[matched]]).astype("timedelta64[us]")
            total = int(lag_us.astype(np.int64).sum())
            avg = total / 86400000000.0 / n_matched
        return pd.DataFrame(
            {"key": [key[0]], "n_orders": [n_orders],
             "n_matched": [n_matched], "avg_lag_days": [avg]}
        )

    return (
        events.groupBy("key")
        .cogroup(orders.groupBy("key"))
        .applyInPandas(
            lag, schema="key long, n_orders long, n_matched long, avg_lag_days double"
        )
    )


# ------------------------------------------------------ session path mining

PATH_TOP = 15

SQL_TOP_PATHS = f"""
WITH g AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events),
s AS (
  SELECT user_id, ts, event_id, event_type,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_id
  FROM g),
p AS (
  SELECT user_id, session_id,
         string_agg(event_type, '>' ORDER BY ts, event_id) AS path
  FROM s GROUP BY user_id, session_id)
SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
FROM p GROUP BY path
ORDER BY n_sessions DESC, path LIMIT {PATH_TOP}
"""


@query(
    "olap_top_paths",
    sql=SQL_TOP_PATHS,
    tags=("olap", "analytics", "events", "sessionization", "window"),
)
def top_paths_q(spark: SparkSession, sf: str) -> DataFrame:
    """Session path mining: the most common event-type sequences per
    session — the product-analytics "user journey" query, composed from
    the lag-gap sessionization (30-min gap at microsecond precision, same
    rule as olap_sessionization) plus an order-preserving path fold.
    Plan: ONE exchange on user_id serves both windows AND the per-session
    path aggregation (sessions nest inside users, so the groupBy's
    ClusteredDistribution is already satisfied — no second shuffle of the
    event stream); paths assemble via sort_array over (ts, event_id,
    type) structs inside the aggregate, the path counts partial-aggregate
    down to distinct journeys, and the final cut is an ordered limit.
    Ties break on the path string so the top-K is deterministic."""
    ev = t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag(F.col("ts")).over(w))
    s = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.sum(
            F.when(gap > 1800 * 1_000_000, 1)
            .when(F.lag("ts").over(w).isNull(), 1)
            .otherwise(0)
        )
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("session_id"),
    )
    paths = s.groupBy("user_id", "session_id").agg(
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))
                ),
                lambda x: x["event_type"],
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(PATH_TOP)
    )
