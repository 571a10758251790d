"""IVF (inverted-file) approximate nearest-neighbor index.

The classic coarse-quantizer design (public FAISS/IVF literature): fit
k-means centroids over the corpus, assign every vector to its nearest
centroid (the "inverted list"), and at query time scan only the
``nprobe`` lists whose centroids are closest to the query.

Scale shape: the fit samples/aggregates through ``pyspark.ml`` KMeans
(tree-aggregated, executor-side); assignment is a narrow map; the
probe filter is an ``isin`` over a driver-computed centroid id list —
a pushdown-able predicate, so a corpus WRITTEN partitioned by
``centroid`` prunes whole files before scoring. Recall/latency trades
via nprobe, exactly like the LSH variant (``lsh_bucket_top_k``); IVF
adapts to the data distribution where LSH is data-oblivious.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from uofi_payroll_etl_main_demo_spark.functions.vectors import cosine_similarity


def rank_centroids(
    centroids: "list[list[float]]", query_vec: "list[float]", nprobe: int
) -> "list[int]":
    """Driver-side probe ranking shared by the in-query index and the
    persisted-index handle (ext/ann_index.py): cosine against the
    (small) centroid table, deterministic tie-break by centroid id.
    ONE implementation — if the probe rule ever changes, both paths
    must move together or they would probe different lists."""
    qn = math.sqrt(sum(x * x for x in query_vec)) or 1.0

    def cos(c: "list[float]") -> float:
        cn = math.sqrt(sum(x * x for x in c)) or 1.0
        return sum(a * b for a, b in zip(query_vec, c)) / (qn * cn)

    ranked = sorted(
        range(len(centroids)), key=lambda i: (-cos(centroids[i]), i)
    )
    return ranked[:nprobe]


class IVFIndex:
    """Centroids (driver-side, small) + cluster-assigned corpus (lazy)."""

    def __init__(self, assigned: DataFrame, centroids: list[list[float]],
                 id_col: str, vec_col: str):
        self.assigned = assigned  # corpus + 'centroid' int column
        self.centroids = centroids
        self.id_col = id_col
        self.vec_col = vec_col

    def nearest_centroids(self, query_vec: list[float], nprobe: int) -> list[int]:
        """Driver-side: rank the (small) centroid table against the query."""
        return rank_centroids(self.centroids, query_vec, nprobe)

    def search(
        self, query_vec: list[float], k: int = 10, nprobe: int = 4
    ) -> DataFrame:
        """Top-k over the nprobe nearest inverted lists only."""
        probe = self.nearest_centroids(query_vec, nprobe)
        return (
            self.assigned.filter(F.col("centroid").isin(*probe))
            .select(
                F.col(self.id_col),
                cosine_similarity(self.vec_col, query_vec).alias("score"),
            )
            .orderBy(F.desc("score"), F.asc(self.id_col))
            .limit(k)
        )


def build_ivf_index(
    embeddings: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 20,
) -> IVFIndex:
    """Fit the coarse quantizer and assign every vector to a list."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = embeddings.withColumn(
        "__feat", array_to_vector(F.transform(F.col(vec_col), lambda x: x.cast("double")))
    )
    model = KMeans(
        k=n_centroids, seed=seed, maxIter=max_iter, featuresCol="__feat",
        predictionCol="centroid",
    ).fit(feats)
    assigned = model.transform(feats).drop("__feat")
    centroids = [c.tolist() for c in model.clusterCenters()]
    return IVFIndex(assigned, centroids, id_col, vec_col)


def ivf_pq_search(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    n_centroids: int = 8,
    candidates: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """IVF-PQ composition (the standard billion-vector layout, public
    FAISS IVFPQ shape): coarse-quantizer pruning to ``nprobe`` inverted
    lists, PQ ADC scan over only those lists, exact rerank of the
    survivors.

    Cost at scale: the scan touches ~corpus·(nprobe/n_centroids) rows
    at 4 B/vector PQ codes (vs 256 B raw) — two multiplicative
    reductions before any exact arithmetic. With
    ``nprobe == n_centroids`` the pruning is a no-op and the result
    equals :func:`ext.similarity.pq_top_k` exactly (pinned in tests).
    """
    from uofi_payroll_etl_main_demo_spark.ext.similarity import pq_top_k

    index = build_ivf_index(
        embeddings, n_centroids=n_centroids, id_col=id_col,
        vec_col=vec_col, seed=seed,
    )
    probe = index.nearest_centroids(query_vec, nprobe)
    pruned = index.assigned.filter(F.col("centroid").isin(*probe))
    return pq_top_k(
        pruned, query_vec, k=k, candidates=candidates,
        id_col=id_col, vec_col=vec_col,
    )
