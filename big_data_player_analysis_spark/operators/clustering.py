"""K-means clustering over embedding columns (Lloyd's algorithm), the
coarse quantizer behind a real IVF index (operators/similarity.py uses the
pre-assigned `label` column when one exists; this fit produces the
assignment when one doesn't).

Iterative shape mirrors plans/heroic.py: per-iteration state (the k x dim
centroid matrix) is TINY, so it lives on the driver and broadcasts into the
assignment step — no lineage growth, no checkpointing needed. Per
iteration: one Arrow-batched assignment pass (argmin distance via a numpy
matmul per batch) and one aggregation pass (posexplode -> per-(cluster,
position) mean -> k*dim rows collected). Both scale: the big side streams,
the shuffle is O(k * dim)."""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class KMeansResult:
    assignments: DataFrame   # (id, cluster int)
    centroids: list          # k x dim nested list (python floats)
    iterations: int
    shift: float             # final max centroid movement (L2)


def _assign(vectors: DataFrame, id_col: str, vec_col: str, C) -> DataFrame:
    """(id, cluster): nearest centroid by squared euclidean distance, one
    matmul per Arrow batch. Ties break to the lowest cluster index
    (numpy argmin), deterministically."""
    import numpy as np
    import pandas as pd

    bc = vectors.sparkSession.sparkContext.broadcast(np.asarray(C, dtype=np.float64))

    def batches(it):
        Cm = bc.value
        c_sq = (Cm * Cm).sum(axis=1)
        for pdf in it:
            V = np.array([list(v) for v in pdf[vec_col]], dtype=np.float64)
            # ||v - c||^2 = ||v||^2 - 2 v.c + ||c||^2 ; ||v||^2 constant per row
            d = -2.0 * (V @ Cm.T) + c_sq
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].to_numpy(dtype="int64"),
                    "cluster": d.argmin(axis=1).astype("int32"),
                }
            )

    return vectors.select(id_col, vec_col).mapInPandas(batches, "id long, cluster int")


def kmeans_fit(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    max_iter: int = 10,
    tol: float = 1e-4,
) -> KMeansResult:
    """Fit k-means with deterministic init (the k lowest-id vectors). Stops
    when no centroid moves more than tol (L2) or after max_iter sweeps."""
    import numpy as np

    init_rows = (
        vectors.select(id_col, vec_col).orderBy(id_col).limit(k).collect()
    )
    C = np.array([list(r[1]) for r in init_rows], dtype=np.float64)

    assignments = None
    shift = float("inf")
    it = 0
    for it in range(1, max_iter + 1):
        assignments = _assign(vectors, id_col, vec_col, C)
        stats = (
            vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
            .join(assignments, "id")
            .select("cluster", F.posexplode("v"))
            .groupBy("cluster", "pos")
            .agg(F.avg(F.col("col").cast("double")).alias("m"))
            .collect()
        )
        C_new = C.copy()  # empty clusters keep their previous centroid
        by_cluster: dict[int, dict[int, float]] = {}
        for r in stats:
            by_cluster.setdefault(r.cluster, {})[r.pos] = r.m
        for c, pm in by_cluster.items():
            C_new[c] = [pm[p] for p in range(C.shape[1])]
        shift = float(np.sqrt(((C_new - C) ** 2).sum(axis=1)).max())
        C = C_new
        if shift <= tol:
            break
    return KMeansResult(
        assignments=_assign(vectors, id_col, vec_col, C),
        centroids=C.tolist(),
        iterations=it,
        shift=shift,
    )


def ivf_kmeans_topk(
    vectors: DataFrame,
    query: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k_clusters: int = 8,
    n_probe: int = 2,
    k: int = 10,
    max_iter: int = 5,
) -> DataFrame:
    """IVF top-k with a fitted quantizer: k-means assigns the cells, then
    the standard probe path (operators/similarity.py:ivf_probe_topk) scans
    only the n_probe closest cells."""
    from big_data_player_analysis_spark.operators.similarity import ivf_probe_topk

    fit = kmeans_fit(vectors, id_col, vec_col, k=k_clusters, max_iter=max_iter)
    cells = vectors.join(
        fit.assignments.withColumnRenamed("id", id_col), id_col
    ).withColumnRenamed("cluster", "ivf_cell")
    return ivf_probe_topk(
        cells, query, id_col=id_col, vec_col=vec_col, cell_col="ivf_cell",
        n_probe=n_probe, k=k,
    )
