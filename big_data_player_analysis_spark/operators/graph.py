"""Distributed graph analytics over DataFrame edge lists.

The reference's iterative heroic engine (reference exercise_4.py:267-283)
treats the duel table as a directed graph but never computes structural
graph statistics over it; triangle counting is the canonical one — the
building block of clustering coefficients, community detection, and spam
detection on web graphs (the curation use case: link-farm detection over a
crawl's hyperlink graph).

Scale design (the node-iterator / degree-orientation algorithm,
Schank & Wagner 2005 — the same plan Cohen's MapReduce formulation and
GraphX's triangleCount use):

* Edges are canonicalized undirected (``least/greatest`` + distinct) —
  one hash aggregate, shuffle O(E).
* Each edge is oriented from its (degree, id)-smaller endpoint to its
  larger one. The oriented graph is acyclic and every triangle contains
  EXACTLY ONE vertex with out-edges to the other two, so each triangle is
  counted once — no /3 or /6 correction, no duplicate elimination pass.
* Orientation bounds out-degree by O(sqrt(E)): a vertex keeps an
  out-edge to a neighbor only when the neighbor's degree is >= its own,
  and at most sqrt(2E) vertices have degree >= sqrt(2E). Wedge volume —
  the size of the intermediate join — is therefore O(E^1.5) worst case
  (the arboricity bound), NOT the O(E * d_max^2) a naive wedge join
  produces when one hub vertex (every web graph has one) fans out.
* Everything is joins + aggregates on node keys: shuffles partition by
  vertex id, AQE handles residual skew, nothing is collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def canonical_edges(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Undirected edge list (u < v), self-loops dropped, deduplicated."""
    return (
        edges.filter(F.col(src) != F.col(dst))
        .select(
            F.least(src, dst).alias("u"),
            F.greatest(src, dst).alias("v"),
        )
        .distinct()
    )


def triangle_count(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Exact global triangle count; returns one row
    ``(n_nodes, n_edges, n_triangles)``.

    ``edges`` may be directed/multi; it is canonicalized first.
    """
    from big_data_player_analysis_spark.caching import tracked_persist

    # Persist points (re-tightened round 9 after the round-8 persist
    # trade doubled the sf0.1 cost): the canonical edge list feeds TWO
    # consumers (degree build, orientation join) and the ORIENTED edge
    # list — not e — is what the three downstream readers (both wedge
    # sides and the closing-edge probe) actually consume; round 8
    # persisted only e, so each of those three re-ran the e x deg x deg
    # orientation joins. The n_edges/n_nodes scalars now fold into one
    # aggregate over the (V-sized) degree table instead of a third pass
    # over e: sum(deg)/2 IS the edge count. Measured sf0.1 over the
    # bucketed duels input: 4.7 -> 2.9 s with shuffle bytes intact.
    e = tracked_persist(canonical_edges(edges, src, dst))

    # degree table: O(V) rows, partial-agged
    deg = tracked_persist(
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )

    # orient every edge toward the (deg, id)-larger endpoint; carry both
    # endpoint keys so the wedge stage can order destinations without
    # re-joining degrees
    keyed = (
        e.join(deg.withColumnRenamed("node", "u").withColumnRenamed("deg", "du"), "u")
        .join(deg.withColumnRenamed("node", "v").withColumnRenamed("deg", "dv"), "v")
    )
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = tracked_persist(
        keyed.select(
            F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
            F.when(
                u_first,
                F.struct(F.col("dv").alias("deg"), F.col("v").alias("id")),
            )
            .otherwise(
                F.struct(F.col("du").alias("deg"), F.col("u").alias("id"))
            )
            .alias("dst_key"),
        )
    )

    # wedges at each source: unordered out-neighbor pairs, ordered by the
    # orientation key so each pair appears once and in the direction the
    # closing edge (if any) is stored under
    x = oriented.alias("x")
    y = oriented.alias("y")
    wedges = x.join(
        y,
        (F.col("x.src") == F.col("y.src"))
        & (F.col("x.dst_key") < F.col("y.dst_key")),
    ).select(F.col("x.dst").alias("b"), F.col("y.dst").alias("c"))

    closing = oriented.select(
        F.col("src").alias("b"), F.col("dst").alias("c")
    )
    tri = wedges.join(closing, ["b", "c"]).agg(
        F.count(F.lit(1)).alias("n_triangles")
    )

    # both scalars come from ONE pass over the (V-sized, persisted)
    # degree table: every undirected edge contributes 2 to sum(deg)
    counts = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        (F.sum("deg") / 2).cast("long").alias("n_edges"),
    )
    # 1-row x 1-row cross join: broadcast scalars, not a real cartesian
    return counts.crossJoin(tri).select("n_nodes", "n_edges", "n_triangles")
