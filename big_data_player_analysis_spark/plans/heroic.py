"""Iterative heroic-score engine (reference exercise_4.py, ops Q4-Q18).

Semantics (reference exercise_4.py:267-283):
  1. smoothed avg score per challenger, domain-completed over every player
     seen on either side (missing players default to 1.0 = (0+1)/(0+1));
     reference exercise_4.py:10-34 with completion at :14.
  2. distinct duel edges (challenger, challenged); exercise_4.py:49-62.
  3. enrich edges with avg_challenger and avg_challenged; exercise_4.py:64-123.
  4. iterate:  hs'(c) = alpha * SUM over edges c->d of
                       [ hs(d) * avg(c) / avg(d) ]  + (1 - alpha)
     with hs(d) defaulting to 1.0 when d has no score yet
     (exercise_4.py:126-192, default at :152, damping at :180-184);
     stop when mean((hs - hs')^2) <= tol (exercise_4.py:194-236, 277).
  5. top-10 by final score (exercise_4.py:238-265).

Spark design for scale:
  * The edge table (the 100-TB side) is computed ONCE, hash-partitioned on
    the join key, and persisted; each iteration only shuffles the small
    score vector.
  * The score vector is localCheckpoint()ed every iteration to truncate
    lineage — without this the plan doubles per iteration and the driver
    dies long before convergence.
  * Convergence scalar comes back via .first() (a 1-row action), not the
    reference's write-file-then-read-it-back (exercise_4.py:234-236).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from big_data_player_analysis_spark.caching import (
    tracked_local_checkpoint,
    tracked_persist,
)
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from big_data_player_analysis_spark.operators.aggregates import smoothed_avg
from big_data_player_analysis_spark.operators.joins import (
    domain_completion,
    keyed_squared_difference,
)
from big_data_player_analysis_spark.operators.setops import distinct_pairs, key_universe


@dataclass
class HeroicResult:
    scores: DataFrame          # (player_id, hs) — converged vector
    msd_history: list = field(default_factory=list)
    iterations: int = 0
    converged: bool = False
    diverged: bool = False     # aborted on monotonically growing msd


def smoothed_avg_completed(duels: DataFrame) -> DataFrame:
    """(player_id, avg_score): add-one smoothed avg per challenger, completed
    over the full player universe with the smoothing prior 1.0
    (reference Q4+Q5, exercise_4.py:10-34)."""
    avg = smoothed_avg(duels, "challenger_id", "score", alias="avg_score").withColumnRenamed(
        "challenger_id", "player_id"
    )
    universe = key_universe(duels, ["challenger_id", "challenged_id"], alias="player_id")
    return domain_completion(avg, universe, "player_id", {"avg_score": 1.0})


def edges_with_avgs(duels: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Distinct edges enriched with both endpoints' smoothed averages
    (reference Q6+Q9+Q10, exercise_4.py:49-123), pre-partitioned on
    challenged_id — the key of the per-iteration join — so iterations reuse
    the partitioning instead of re-shuffling the big side.

    The duels input is materialized ONCE (eager tracked persist) before
    fan-out: three consumers read it (distinct edges, the smoothed-avg
    aggregate, the player universe), and with explicit F.broadcast hints
    each consumer ran as an independent concurrent stage whose
    column-pruned copy of the duels subplan could not be
    exchange-deduplicated (different pruned payloads defeat
    ReuseExchange) — measured at composed sf1 as three events-sized
    exchanges (72 MB total, the r6 SHUFFLE row's sr:sw 4.2) where one
    suffices. The eager count fills the cache before the consumers race.
    No broadcast HINTS on the avg sides either: AQE converts the
    player-sized avg joins to broadcast at runtime; explicit hints would
    spawn concurrent build futures that race past a cold cache."""
    duels = tracked_persist(duels)
    duels.count()
    edges = distinct_pairs(duels, ["challenger_id", "challenged_id"])
    avg = smoothed_avg_completed(duels)
    out = (
        edges.join(
            avg.select(F.col("player_id").alias("challenged_id"),
                       F.col("avg_score").alias("avg_challenged")),
            on="challenged_id",
        )
        .join(
            avg.select(F.col("player_id").alias("challenger_id"),
                       F.col("avg_score").alias("avg_challenger")),
            on="challenger_id",
        )
    )
    if num_partitions:
        out = out.repartition(num_partitions, "challenged_id")
    return out


def iteration_step(
    edges: DataFrame, hs: DataFrame, alpha: float, broadcast_scores: bool = True
) -> DataFrame:
    """One damped update: hs'(c) = alpha * SUM_{c->d} hs(d)*avg(c)/avg(d)
    + (1-alpha), with hs(d) defaulting to 1.0 (reference exercise_4.py:152,
    :180-184). Exposed as a named step so tests can pin its physical plan:
    a BroadcastHashJoin of the small score vector onto the persisted edge
    table (the big side never re-shuffles), then a partial-aggregated sum."""
    hs_by_challenged = hs.select(
        F.col("player_id").alias("challenged_id"), F.col("hs").alias("hs_challenged")
    )
    if broadcast_scores:
        hs_by_challenged = F.broadcast(hs_by_challenged)
    contrib = (
        edges.join(hs_by_challenged, on="challenged_id", how="left")
        .withColumn("hs_challenged", F.coalesce("hs_challenged", F.lit(1.0)))
        .withColumn(
            "contrib",
            F.col("hs_challenged") * F.col("avg_challenger") / F.col("avg_challenged"),
        )
    )
    return contrib.groupBy(F.col("challenger_id").alias("player_id")).agg(
        (F.lit(alpha) * F.sum("contrib") + F.lit(1.0 - alpha)).alias("hs")
    )


def heroic_score(
    duels: DataFrame,
    alpha: float = 0.1,
    tol: float = 0.1,
    max_iter: int = 50,
    num_partitions: int | None = None,
    broadcast_scores: bool = True,
    divergence_patience: int = 2,
    vector_partitions: int | None = None,
) -> HeroicResult:
    """Run the damped iterative rank to convergence (reference Q11-Q16).

    Matches the reference's *intended* semantics: iteration 1 sees every
    score at the init value 1.0 (the reference reads a stale directory but
    defaults missing scores to 1.0, exercise_4.py:152, which coincides with
    the init — SURVEY.md §3.3).

    broadcast_scores=True broadcasts the per-iteration score vector into
    the join against the persisted edge table, so iterations do a
    broadcast-hash join over the cached edges with NO shuffle of the big
    side (the localCheckpoint'd vector has no size stats, so Catalyst would
    otherwise plan a sort-merge join). Set False only when the player
    universe itself is too large for executor memory — then the join falls
    back to shuffle, co-partitioned with the edges' pre-partitioning.

    vector_partitions coalesces the score vector before each checkpoint:
    the groupBy leaves it at spark.sql.shuffle.partitions (sized for the
    EDGE table), so every per-iteration job otherwise schedules that many
    near-empty tasks. Size it to |players| / target-rows-per-partition;
    None keeps the shuffle partitioning.
    """
    edges = edges_with_avgs(duels, num_partitions=num_partitions)
    edges.persist(StorageLevel.MEMORY_AND_DISK)

    # init: hs = 1.0 for every challenger (only challengers ever get updated
    # scores — reference heroic_score/output.txt holds 100 challenger rows)
    hs = (
        edges.select(F.col("challenger_id").alias("player_id"))
        .distinct()
        .withColumn("hs", F.lit(1.0))
        .transform(tracked_local_checkpoint)
    )

    result = HeroicResult(scores=hs)
    for it in range(max_iter):
        # join current scores onto the challenged endpoint; players without a
        # score contribute the default 1.0 (reference exercise_4.py:152)
        new_hs = iteration_step(edges, hs, alpha, broadcast_scores)
        if vector_partitions:
            new_hs = new_hs.coalesce(vector_partitions)
        new_hs = new_hs.transform(tracked_local_checkpoint)  # truncate lineage each iteration
        msd = (
            keyed_squared_difference(hs, new_hs, "player_id", "hs")
            .agg(F.avg("sq_diff"))
            .first()[0]
        )
        hs = new_hs
        result.msd_history.append(msd)
        result.iterations = it + 1
        if msd <= tol:
            result.converged = True
            break
        # The un-normalized update diverges on graphs where alpha * mean
        # out-degree > 1 (the reference's 518-duel graph converges; dense
        # graphs need not). The reference's `while msd > tol` driver loop
        # (exercise_4.py:277) would spin forever there; abort instead once
        # msd has grown `divergence_patience` consecutive iterations.
        h = result.msd_history
        if len(h) > divergence_patience and all(
            h[-i] > h[-i - 1] for i in range(1, divergence_patience + 1)
        ):
            result.diverged = True
            break

    edges.unpersist()
    result.scores = hs
    return result


def heroic_top_k(duels: DataFrame, k: int = 10, **kwargs) -> DataFrame:
    """End-to-end flagship: converge the heroic scores, return the top-k
    (reference Q17, exercise_4.py:238-265 + :283)."""
    result = heroic_score(duels, **kwargs)
    return result.scores.orderBy(F.desc("hs"), F.desc("player_id")).limit(k)
