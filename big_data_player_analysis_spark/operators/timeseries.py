"""Time-series regularization operators: densify an irregular keyed series
onto a regular calendar spine and carry observations forward.

Gap filling is the OLAP/feature-engineering primitive the reference's
player-event domain needs constantly (daily activity series with silent
days) and that naive SQL gets wrong by simply GROUP BY-ing observed days —
the missing days vanish instead of appearing as explicit rows, so every
downstream rolling window / retention curve is computed over a
silently-compacted axis.

Scale design — gap-explode instead of spine-join:
* The observed daily aggregate is one partial-agged shuffle on
  ``(key, day)`` — O(active key-days), never O(events) post-shuffle.
* Each observed day looks at its successor with ``lead()`` and EMITS its
  own gap run directly: ``explode(sequence(day, next_day - 1))`` with the
  observed value attached. One window pass, then a narrow fan-out
  proportional to the OUTPUT. The textbook formulation (generate a spine,
  left-join observations back, forward-fill with
  ``last(ignorenulls)`` — the shape the oracle SQL uses) costs two more
  exchanges: the spine join on ``(key, day)`` plus a re-partition for the
  fill window; this plan produces identical rows with two shuffles total
  and NO join.
* There is no driver-side calendar and no |keys| x |calendar| cross join
  (which would materialize then discard most rows for short-lived keys).
  Per-key output is bounded by the key's own lifetime — exactly the
  output contract — so skew is what the output itself implies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def gap_fill_daily(
    events: DataFrame,
    key: str,
    ts: str,
    value: str,
) -> DataFrame:
    """Per-key daily sum series densified over each key's active range,
    forward-filling missing days.

    Returns ``(key, day, filled_value, is_gap)`` — one row per calendar
    day between the key's first and last observed day; ``is_gap`` = 1 on
    days with no observation, whose ``filled_value`` carries the most
    recent observed day's value (never null: every run starts at an
    observation). ``day`` stays a midnight TIMESTAMP rather than DATE so
    both engines — and pandas on the comparison path — agree on the
    column family.
    """
    daily = events.groupBy(
        F.col(key), F.date_trunc("day", F.col(ts)).alias("day")
    ).agg(F.sum(value).alias("day_value"))
    w = Window.partitionBy(key).orderBy("day")
    runs = daily.withColumn("next_day", F.lead("day").over(w))
    run_days = F.when(
        F.col("next_day").isNull(), F.array(F.col("day"))
    ).otherwise(
        F.sequence(
            F.col("day"),
            F.col("next_day") - F.expr("interval 1 day"),
            F.expr("interval 1 day"),
        )
    )
    return runs.select(
        key,
        F.col("day").alias("obs_day"),
        "day_value",
        F.explode(run_days).alias("day"),
    ).select(
        key,
        "day",
        F.col("day_value").alias("filled_value"),
        (F.col("day") != F.col("obs_day")).cast("long").alias("is_gap"),
    )
