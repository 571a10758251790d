"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — a narrow map (one score per row)
plus a global top-k (``orderBy(...).limit(k)``), which Spark executes
as per-partition partial top-k + driver merge of k·partitions rows:
no full sort, no shuffle of the corpus. Correct at any scale, compute-
bound at 100 TB.

Scale path: random-hyperplane LSH — bucketize vectors by the sign
pattern of dot products with fixed random hyperplanes, search only the
query's bucket (optionally with multi-probe). Recall < 1.0 by design;
the bucket join replaces the corpus-wide scan with a hash lookup.

An IVF variant (coarse k-means centroids + inverted lists) is the
next step beyond LSH and follows the same join shape; deferred until
a k-means fit is worth it (pyspark.ml KMeans works out of the box).
"""

from __future__ import annotations

import math
import random

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from uofi_payroll_etl_main_demo_spark.functions.vectors import (
    cosine_similarity,
    dot_product,
    l2_norm,
)


def brute_force_top_k(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    metric: str = "cosine",
) -> DataFrame:
    """Exact top-k rows most similar to ``query_vec``.

    The query vector is a literal array (broadcast to every task by the
    plan itself); scoring is a JVM-side higher-order expression. Output:
    (id, score) ordered by score desc with id as deterministic tie-break.
    """
    score = (
        cosine_similarity(vec_col, query_vec)
        if metric == "cosine"
        else dot_product(vec_col, query_vec)
    )
    return (
        embeddings.select(F.col(id_col), score.alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def auto_planes(
    n_rows: int, target_bucket_size: int = 512, max_planes: int = 24
) -> int:
    """Plane count sized to the corpus: 2^planes buckets so the MEAN
    bucket holds ~``target_bucket_size`` vectors.

    A fixed plane count is quadratic in disguise — in-bucket candidate
    volume is n²/2^planes, so planes must grow with log2(n) for the
    per-bucket work to stay flat as the corpus scales. Floor of 2
    keeps tiny corpora from collapsing into one bucket; cap of 24
    (16M buckets) bounds the literal-expression size of the bucket
    computation.
    """
    if n_rows <= target_bucket_size:
        return 2
    return min(max_planes, max(2, math.ceil(math.log2(n_rows / target_bucket_size))))


def _resolve_planes(
    n_planes: int | str | None,
    embeddings: DataFrame,
    target_bucket_size: int,
) -> int:
    """Resolve a knn_join* ``n_planes`` argument. ``"auto"`` (or the
    legacy ``None``) sizes the grid to the corpus via ONE eager
    ``.count()`` of the input — callers should persist expensive
    lineage first; an int passes through and keeps the call lazy."""
    if n_planes is None or (isinstance(n_planes, str) and n_planes == "auto"):
        return auto_planes(embeddings.count(), target_bucket_size)
    # bool is an int subclass — reject it explicitly so n_planes=True
    # doesn't silently become a 1-plane grid.
    if isinstance(n_planes, bool) or not isinstance(n_planes, int):
        raise ValueError(f"n_planes must be an int or 'auto': {n_planes!r}")
    return n_planes


def _cap_buckets(
    b: DataFrame, max_bucket_size: int | None, bucket_col: str = "bucket"
) -> DataFrame:
    """Skew valve: drop buckets larger than ``max_bucket_size`` (the
    embedding analogue of the text-side hot-shingle caps). A degenerate
    bucket holding a large corpus fraction would concentrate O(b²) pair
    work in one task; capped buckets lose their members' neighbors —
    the standard bounded-recall trade."""
    if max_bucket_size is None:
        return b
    from pyspark.sql import Window

    cnt = F.count(F.lit(1)).over(Window.partitionBy(bucket_col))
    return (
        b.withColumn("__bn", cnt)
        .filter(F.col("__bn") <= max_bucket_size)
        .drop("__bn")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (driver-side,
    broadcast as literals in the plan)."""
    rng = random.Random(seed)
    planes = []
    for _ in range(n_planes):
        v = [rng.gauss(0.0, 1.0) for _ in range(dim)]
        norm = math.sqrt(sum(x * x for x in v)) or 1.0
        planes.append([x / norm for x in v])
    return planes


def _projection_matrix(
    dim: int, out_dim: int, seed: int = 7
) -> "list[list[float]]":
    """Deterministic Achlioptas sparse random-projection rows
    (driver-side, broadcast as literals): entries √(3/out_dim) ×
    {+1 w.p. 1/6, 0 w.p. 2/3, −1 w.p. 1/6}. Sparse entries make the
    projection 3× cheaper than dense Gaussian at the same
    Johnson–Lindenstrauss guarantee (Achlioptas 2003), and the seeded
    driver-side construction keeps the whole op SQL-reproducible —
    the same determinism contract as :func:`_hyperplanes`."""
    rng = random.Random(seed)
    scale = math.sqrt(3.0 / out_dim)
    rows = []
    for _ in range(out_dim):
        row = []
        for _ in range(dim):
            u = rng.random()
            row.append(scale if u < 1 / 6 else (-scale if u > 5 / 6 else 0.0))
        rows.append(row)
    return rows


def random_projection(
    embeddings: DataFrame,
    dim: int,
    out_dim: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
    engine: str = "gemm",
) -> DataFrame:
    """Johnson–Lindenstrauss dimensionality reduction for the
    embedding column — the standard pre-ANN step at corpus scale
    (64→16 dims quarters every downstream pair cosine, LSH bucket,
    and IVF list scan while approximately preserving pairwise
    geometry).

    One narrow projection per row — the whole batch is ONE BLAS GEMM
    per Arrow chunk (``V @ Rᵀ``, no shuffle, no per-pair expressions;
    ``engine="expression"`` keeps the JVM Column form for plan-fused
    composition) — and the matrix is a driver-side deterministic
    constant, so the output is engine-exact at the 6dp contract and
    SQL-twinnable. Output: one row per (id, component):
    ``(id_col, j, proj)`` with ``proj`` rounded to 6dp — the exploded
    shape the oracle can reproduce with literal plane lists
    (array-valued columns stringify engine-specifically; rounding
    absorbs BLAS-vs-fold ulp differences, the GEMM-law precedent).
    """
    R = _projection_matrix(dim, out_dim, seed)
    if engine == "expression":
        comps = [
            F.struct(F.lit(j).alias("j"), F.round(d, 6).alias("proj"))
            for j, d in enumerate(_projection_dots(vec_col, R))
        ]
        return embeddings.select(
            F.col(id_col), F.explode(F.array(*comps)).alias("__c")
        ).select(
            id_col, F.col("__c.j").alias("j"), F.col("__c.proj").alias("proj")
        )
    if engine != "gemm":
        raise ValueError(f"unknown engine {engine!r}")
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    Rm = np.asarray(R, dtype=np.float64)
    schema = T.StructType(
        [
            T.StructField(id_col, embeddings.schema[id_col].dataType),
            T.StructField("j", T.IntegerType()),
            T.StructField("proj", T.DoubleType()),
        ]
    )

    def project(batches):
        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            P = np.round(V @ Rm.T, 6)  # (n, out_dim)
            yield pd.DataFrame(
                {
                    id_col: np.repeat(pdf[id_col].to_numpy(), out_dim),
                    "j": np.tile(
                        np.arange(out_dim, dtype="int32"), n
                    ),
                    "proj": P.reshape(-1),
                }
            )

    return embeddings.select(id_col, vec_col).mapInPandas(project, schema)


def _projection_dots(vec_col: str, R: "list[list[float]]"):
    """One JVM-side fold per projection row — shared by the exploded
    registry shape and the array-valued retrieval path."""
    dbl = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    dots = []
    for row in R:
        rlit = F.array(*[F.lit(float(x)) for x in row])
        dots.append(
            F.aggregate(
                F.zip_with(dbl, rlit, lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
    return dots


def projected_rerank_top_k(
    embeddings: DataFrame,
    query_vec: "list[float]",
    dim: int,
    k: int = 10,
    coarse: int = 50,
    out_dim: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
    engine: str = "gemm",
) -> DataFrame:
    """Two-stage retrieval THROUGH the JL projection — how a random
    projection is actually deployed: rank the corpus by cosine in the
    cheap ``out_dim``-dimensional projected space (coarse top
    ``coarse``), then exact-rerank only those survivors in the full
    space. Per row the coarse stage pays out_dim×dim (the projection)
    + out_dim (the cosine) instead of dim — and a corpus that
    MATERIALIZES its projection once (``random_projection``) pays
    just the out_dim cosine per query thereafter.

    Determinism contract: the projection matrix and the projected
    query are driver-side constants; the coarse ranking is on
    6dp-ROUNDED projected cosine (engines compute the projection with
    different sum orders — rounding keeps the coarse cut
    engine-exact, tie-break by id), the rerank ranks unrounded
    full-space cosine like every exact top-k row. Fully
    SQL-reproducible.

    ``engine="gemm"`` (default) runs the coarse stage as one
    projection-GEMM + partial top-``coarse`` per Arrow chunk (global
    sort sees ≤ chunks × coarse rows, never the corpus);
    ``"expression"`` fuses the whole coarse stage into a single JVM
    Column pipeline."""
    import math as _math

    R = _projection_matrix(dim, out_dim, seed)
    qp = [
        sum(float(v) * r for v, r in zip(query_vec, row)) for row in R
    ]
    qn = _math.sqrt(sum(x * x for x in qp))
    if engine == "gemm":
        import numpy as np
        import pandas as pd
        from pyspark.sql import types as T

        Rm = np.asarray(R, dtype=np.float64)
        qpn = np.asarray(qp, dtype=np.float64) / (qn or 1.0)
        pschema = T.StructType(
            [
                T.StructField(
                    id_col, embeddings.schema[id_col].dataType
                ),
                T.StructField("__pcos", T.DoubleType()),
            ]
        )

        def coarse_chunk(batches):
            for pdf in batches:
                n = len(pdf)
                if not n:
                    continue
                ids = pdf[id_col].to_numpy()
                V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
                P = V @ Rm.T
                pn = np.linalg.norm(P, axis=1)
                ok = pn != 0
                if not ok.any():
                    continue
                pcos = np.round(
                    (P[ok] @ qpn) / pn[ok], 6
                )
                t = min(coarse, int(ok.sum()))
                sel = np.lexsort((ids[ok], -pcos))[:t]
                yield pd.DataFrame(
                    {id_col: ids[ok][sel], "__pcos": pcos[sel]}
                )

        coarse_ids = (
            embeddings.select(id_col, vec_col)
            .mapInPandas(coarse_chunk, pschema)
            .orderBy(F.desc("__pcos"), F.asc(id_col))
            .limit(coarse)
            .select(id_col)
        )
        coarse_df = embeddings.join(
            F.broadcast(coarse_ids), id_col, "left_semi"
        ).select(F.col(id_col), F.col(vec_col))
    elif engine == "expression":
        dots = _projection_dots(vec_col, R)
        pv = F.array(*dots)
        pdot = None
        for j, d in enumerate(dots):
            term = d * F.lit(qp[j])
            pdot = term if pdot is None else pdot + term
        pnorm = F.sqrt(
            F.aggregate(
                F.zip_with(pv, pv, lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
        denom = pnorm * F.lit(qn)
        coarse_df = (
            embeddings.select(
                F.col(id_col),
                F.col(vec_col),
                F.round(
                    F.when(denom != 0, pdot / denom), 6
                ).alias("__pcos"),
            )
            .orderBy(F.desc_nulls_last("__pcos"), F.asc(id_col))
            .limit(coarse)
        )
    else:
        raise ValueError(f"unknown engine {engine!r}")
    return (
        coarse_df.select(
            F.col(id_col),
            cosine_similarity(vec_col, query_vec).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
        .select(id_col, F.round("score", 6).alias("score"))
    )


def random_hyperplane_buckets(
    embeddings: DataFrame,
    dim: int,
    n_planes: int = 8,
    vec_col: str = "embedding",
    seed: int = 42,
    out_col: str = "bucket",
) -> DataFrame:
    """Append an LSH bucket id: bit b = sign(v · plane_b).

    2^n_planes buckets; cosine-similar vectors collide with probability
    1 − θ/π per plane (random-hyperplane LSH, public SimHash/LSH
    literature). Bucketing is a narrow map — the bucket id then serves
    as the equi-join / partition key for search or pair generation.
    """
    planes = _hyperplanes(dim, n_planes, seed)
    bucket = F.lit(0).cast("long")
    for b, plane in enumerate(planes):
        bit = F.when(
            dot_product(vec_col, plane) >= 0, F.lit(1).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        bucket = bucket.bitwiseOR(F.shiftleft(bit, b))
    return embeddings.withColumn(out_col, bucket)


def lsh_bucket_top_k(
    embeddings: DataFrame,
    query_vec: list[float],
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    multiprobe_hamming: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: score only vectors whose bucket is within
    ``multiprobe_hamming`` bit-flips of the query's bucket.

    Multi-probe raises recall without extra tables: probing all buckets
    at Hamming distance ≤ 1 costs n_planes+1 bucket lookups. The bucket
    filter is an ``isin`` over a driver-computed bucket list — a
    pushdown-able predicate, so a bucket-partitioned corpus prunes
    whole files before scoring.
    """
    planes = _hyperplanes(dim, n_planes, seed)
    qbits = 0
    for b, plane in enumerate(planes):
        dot = sum(float(x) * float(y) for x, y in zip(query_vec, plane))
        if dot >= 0:
            qbits |= 1 << b
    probe = {qbits}
    if multiprobe_hamming >= 1:
        for b in range(n_planes):
            probe.add(qbits ^ (1 << b))
    if multiprobe_hamming >= 2:
        for b1 in range(n_planes):
            for b2 in range(b1 + 1, n_planes):
                probe.add(qbits ^ (1 << b1) ^ (1 << b2))

    bucketed = random_hyperplane_buckets(
        embeddings, dim, n_planes, vec_col, seed
    )
    return (
        bucketed.filter(F.col("bucket").isin(*probe))
        .select(
            F.col(id_col),
            cosine_similarity(vec_col, query_vec).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def brute_force_top_k_gemm(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k via vectorized numpy GEMM (the compute-bound
    scale path).

    Each Arrow batch is scored as ONE matrix-vector product
    (``M @ q``), and only the batch-local top-k rows are emitted —
    so the driver merges k rows per batch, not the corpus. Per-element
    work is a fused BLAS op instead of an interpreted higher-order
    expression: at wide dims/large corpora this is the variant to use;
    ``brute_force_top_k`` (pure Column expressions) is the zero-Python
    baseline the oracle checks.
    """
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("vec_id_out", T.LongType()),
            T.StructField("score", T.DoubleType()),
        ]
    )

    def score_batches(batches):
        import numpy as np
        import pandas as pd

        q = np.asarray(query_vec, dtype=np.float64)
        qn = np.linalg.norm(q)
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            norms = np.linalg.norm(mat, axis=1)
            denom = norms * qn
            with np.errstate(divide="ignore", invalid="ignore"):
                scores = np.where(denom != 0, mat @ q / denom, np.nan)
            top = np.argsort(-scores)[:k]
            yield pd.DataFrame(
                {
                    "vec_id_out": pdf[id_col].to_numpy()[top],
                    "score": scores[top],
                }
            )

    return (
        embeddings.select(id_col, vec_col)
        .mapInPandas(score_batches, schema)
        .withColumnRenamed("vec_id_out", id_col)
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def exact_cosine_pairs(
    embeddings: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """EXACT embedding-cosine near-duplicate pairs (all-pairs baseline).

    Broadcast nested-loop self-join: O(n²) pair scoring with the right
    side broadcast, so no shuffle of the corpus — correct and fine up
    to ~10⁵ vectors per broadcast block. This is the exactness baseline
    the approximate ``all_pairs_above`` (LSH-bucketed) trades against
    at corpus scale; pick by n: exact ≲ 1e5, LSH beyond.
    Output: (id_a, id_b, cosine) with id_a < id_b, cosine ≥ threshold.
    """
    # Norms are per-ROW quantities: compute them once on each side
    # (n² pairs would otherwise each re-derive two norms — 3 dot
    # products per pair instead of 1). Same arithmetic, same bits.
    a = embeddings.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("v_a"),
        l2_norm(vec_col).alias("n_a"),
    )
    b = embeddings.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("v_b"),
        l2_norm(vec_col).alias("n_b"),
    )
    denom = F.col("n_a") * F.col("n_b")
    return (
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine",
            F.when(denom != 0, dot_product("v_a", "v_b") / denom),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def all_pairs_above(
    embeddings: DataFrame,
    dim: int,
    threshold: float = 0.9,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via bucketed self-join.

    Pairs are generated only within LSH buckets (equi-join on bucket),
    then exact-cosine filtered: (id_a, id_b, cosine) with id_a < id_b.
    Approximate (bucket-boundary pairs can be missed) — the standard
    recall/throughput trade at corpus scale. ``max_bucket_size`` drops
    degenerate mega-buckets (a near-constant embedding cluster — the
    embedding analogue of boilerplate shingles) before the O(b²)
    in-bucket expansion; bounded recall, linear work.
    """
    # Per-row norms and float→double casts precomputed on each side
    # (1 dot product and 0 casts per pair — same arithmetic, same
    # bits; see knn_join).
    b = random_hyperplane_buckets(embeddings, dim, n_planes, vec_col, seed)
    if max_bucket_size is not None:
        from pyspark.sql import Window

        cnt = F.count(F.lit(1)).over(Window.partitionBy("bucket"))
        b = b.withColumn("__bn", cnt).filter(
            F.col("__bn") <= max_bucket_size
        ).drop("__bn")
    dbl = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    left = b.select(
        F.col(id_col).alias("id_a"),
        dbl.alias("v_a"),
        l2_norm(vec_col, dim=dim).alias("n_a"),
        "bucket",
    )
    right = b.select(
        F.col(id_col).alias("id_b"),
        dbl.alias("v_b"),
        l2_norm(vec_col, dim=dim).alias("n_b"),
        "bucket",
    )
    dot = dot_product("v_a", "v_b", dim=dim)
    denom = F.col("n_a") * F.col("n_b")
    return (
        left.join(right, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", F.when(denom != 0, dot / denom))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def knn_join(
    embeddings: DataFrame,
    dim: int,
    k: int = 3,
    n_planes: int | str = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    target_bucket_size: int = 512,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Approximate k-nearest-neighbors for EVERY vector (self-KNN join)
    via LSH-bucketed pair generation.

    The all-pairs KNN join is the classic quadratic trap; bucketing by
    random-hyperplane LSH turns it into an equi-join on bucket, and the
    per-vector top-k is a window over each vector's in-bucket matches —
    partial recall at bucket boundaries, the standard trade. Bucket
    assignment is deterministic (fixed hyperplanes), so the full output
    is exactly reproducible in SQL for the oracle.

    ``n_planes="auto"`` (opt-in) SIZES THE BUCKET GRID TO THE CORPUS:
    planes = log2(n/target_bucket_size) (see :func:`auto_planes`) so
    in-bucket candidate volume stays ~n·target instead of n²/2^planes
    at a fixed plane count — at 100 TB always pass "auto" (or a
    precomputed log2-sized count). CAVEAT: "auto" runs an EAGER
    ``.count()`` job at call time and the input lineage is then
    evaluated again by the join — persist the input first if it is
    expensive. The fixed default (4) keeps the call lazy and the
    bucket grid reproducible without knowing the corpus size (what the
    SQL oracles need). ``max_bucket_size`` additionally drops
    degenerate mega-buckets (:func:`_cap_buckets`).

    Output: (vec_id, neighbor_id, cosine, rank) with rank 1..k per
    vec_id by cosine desc, neighbor_id asc tie-break.
    """
    from pyspark.sql import Window

    n_planes = _resolve_planes(n_planes, embeddings, target_bucket_size)

    # Per-pair work is the scale cost here, so everything per-ROW is
    # hoisted to the join inputs: the float→double element casts AND
    # the norms are materialized once per vector (the naive per-pair
    # cosine re-derives both norms and re-casts both arrays — 3 dot
    # products plus 128 casts per pair; measured ~4× slower on the
    # pair volume). The arithmetic is unchanged, so the values (and
    # the SQL oracle match) are bit-identical.
    b = _cap_buckets(
        random_hyperplane_buckets(embeddings, dim, n_planes, vec_col, seed),
        max_bucket_size,
    )
    dbl = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    left = b.select(
        F.col(id_col),
        dbl.alias("__v"),
        l2_norm(vec_col, dim=dim).alias("__na"),
        "bucket",
    )
    right = b.select(
        F.col(id_col).alias("neighbor_id"),
        dbl.alias("__w"),
        l2_norm(vec_col, dim=dim).alias("__nb"),
        "bucket",
    )
    dot = dot_product("__v", "__w", dim=dim)
    denom = F.col("__na") * F.col("__nb")
    w = Window.partitionBy(id_col).orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        left.join(right, "bucket")
        .filter(F.col(id_col) != F.col("neighbor_id"))
        .withColumn(
            "cosine", F.round(F.when(denom != 0, dot / denom), 6)
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "neighbor_id", "cosine", "rank")
    )


def knn_join_gemm(
    embeddings: DataFrame,
    dim: int,
    k: int = 3,
    n_planes: int | str = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    target_bucket_size: int = 512,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """``knn_join`` with in-bucket scoring as one numpy GEMM per bucket
    — the compute-bound scale path (same bucket structure, same output
    contract, same SQL oracle).

    Per bucket: unit-normalize the member matrix once, score all pairs
    as ``N @ N.T`` (fused BLAS — measured ~5× faster than the per-pair
    higher-order-function expression at bench scale), keep each row's
    top-k. Cosines are rounded to 6 decimals BEFORE ranking, exactly
    like the Column form, so ties and therefore ranks are identical.

    ``n_planes="auto"`` sizes the grid to the corpus (:func:`auto_planes`;
    EAGER count — see :func:`knn_join`); ``max_bucket_size`` drops
    degenerate mega-buckets
    (:func:`_cap_buckets`) — the GEMM bounds per-PAIR cost but not
    candidate COUNT, so both valves matter here too.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    n_planes = _resolve_planes(n_planes, embeddings, target_bucket_size)
    b = _cap_buckets(
        random_hyperplane_buckets(embeddings, dim, n_planes, vec_col, seed),
        max_bucket_size,
    )

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("cosine", T.DoubleType()),
            T.StructField("rank", T.IntegerType()),
        ]
    )

    def score_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2:
            return pd.DataFrame(
                {"vec_id": [], "neighbor_id": [], "cosine": [], "rank": []}
            ).astype(
                {"vec_id": "int64", "neighbor_id": "int64",
                 "cosine": "float64", "rank": "int32"}
            )
        ids = pdf[id_col].to_numpy()
        mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(mat, axis=1)
        safe = np.where(norms != 0, norms, 1.0)
        sims = (mat / safe[:, None]) @ (mat / safe[:, None]).T
        sims = np.where(
            (norms[:, None] != 0) & (norms[None, :] != 0), sims, np.nan
        )
        sims = np.round(sims, 6)  # rank on rounded values like the oracle
        out_id, out_nb, out_cos, out_rank = [], [], [], []
        kk = min(k, n - 1)
        for i in range(n):
            row = sims[i].copy()
            row[i] = -np.inf  # exclude self
            # top-k by (cosine desc, neighbor_id asc): lexsort on
            # (-cosine, id) — stable and exactly the window's order
            order = np.lexsort((ids, -row))[:kk]
            out_id.extend([ids[i]] * len(order))
            out_nb.extend(ids[order])
            out_cos.extend(row[order])
            out_rank.extend(range(1, len(order) + 1))
        return pd.DataFrame(
            {
                "vec_id": np.asarray(out_id, dtype="int64"),
                "neighbor_id": np.asarray(out_nb, dtype="int64"),
                "cosine": np.asarray(out_cos, dtype="float64"),
                "rank": np.asarray(out_rank, dtype="int32"),
            }
        )

    return (
        b.select(F.col(id_col), F.col(vec_col), "bucket")
        .groupBy("bucket")
        .applyInPandas(score_bucket, schema)
    )


def train_pq_codebooks(
    train: "np.ndarray", m: int, n_centroids: int, lloyd_iters: int = 5
):
    """Deterministic PQ codebook training (shared by the in-query
    :func:`pq_top_k` and the persisted index lifecycle in
    :mod:`~uofi_payroll_etl_main_demo_spark.ext.ann_index`): per
    subspace, Lloyd iterations from an evenly-spaced deterministic
    init over the (id-sorted) training sample. Returns
    ``(m, n_centroids, dim//m)`` float64 codebooks."""
    import numpy as np

    dim = train.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    codebooks = np.empty((m, n_centroids, sub))
    for j in range(m):
        X = train[:, j * sub : (j + 1) * sub]
        # deterministic init: evenly spaced sample rows (sorted by id)
        idx = np.linspace(0, len(X) - 1, n_centroids).astype(int)
        C = X[idx].copy()
        for _ in range(lloyd_iters):
            d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(n_centroids):
                pts = X[assign == c]
                if len(pts):
                    C[c] = pts.mean(axis=0)
        codebooks[j] = C
    return codebooks


def pq_top_k(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    candidates: int = 100,
    m: int = 8,
    n_centroids: int = 16,
    train_sample: int = 256,
    lloyd_iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantization ANN (Jégou et al., PAMI 2011): split each
    vector into ``m`` subvectors, quantize each against a per-subspace
    codebook, score with an ADC lookup table, exact-rerank the top
    ``candidates``.

    Memory math at scale: dim=64 float32 = 256 B/vector; m=8 ×
    log2(16)=4-bit codes = 4 B/vector — a 64× smaller scan than the
    raw corpus (vs 4× for int8 SQ), which is why PQ is the standard
    billion-vector index layout.

    Codebooks are trained driver-side with deterministic Lloyd
    iterations on a fixed sample (first ``train_sample`` vectors by id
    — one tiny collect, the same constant a real system ships with the
    index); encoding + ADC scan run distributed in Arrow batches
    (numpy), emitting only each batch's top ``candidates``; the exact
    rerank touches ``candidates`` rows. Deterministic end-to-end.
    """
    import numpy as np
    from pyspark.sql import types as T

    sample = (
        embeddings.select(vec_col)
        .orderBy(F.asc(id_col))
        .limit(train_sample)
        .collect()
    )
    train = np.stack([r[0] for r in sample]).astype(np.float64)
    codebooks = train_pq_codebooks(train, m, n_centroids, lloyd_iters)
    sub = train.shape[1] // m
    q = np.asarray(query_vec, dtype=np.float64)
    # ADC table: lut[j, c] = q_j · codebook[j, c] → approx dot(q, v) =
    # Σ_j lut[j, code_j(v)]
    lut = np.einsum(
        "jd,jcd->jc", q.reshape(m, sub), codebooks
    )
    cb_bc = codebooks  # closed over; shipped once per task via pickle

    schema = T.StructType(
        [
            T.StructField("vec_id_out", T.LongType()),
            T.StructField("adc", T.DoubleType()),
        ]
    )

    def scan(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            codes = np.empty((len(mat), m), dtype=np.int64)
            for j in range(m):
                X = mat[:, j * sub : (j + 1) * sub]
                d2 = ((X[:, None, :] - cb_bc[None, j, :, :]) ** 2).sum(
                    axis=2
                )
                codes[:, j] = d2.argmin(axis=1)
            adc = lut[np.arange(m)[None, :], codes].sum(axis=1)
            top = np.argsort(-adc)[:candidates]
            yield pd.DataFrame(
                {
                    "vec_id_out": pdf[id_col].to_numpy()[top],
                    "adc": adc[top],
                }
            )

    cand = (
        embeddings.select(id_col, vec_col)
        .mapInPandas(scan, schema)
        .orderBy(F.desc("adc"), F.asc("vec_id_out"))
        .limit(candidates)
        .select(F.col("vec_id_out").alias(id_col))
    )
    return (
        embeddings.join(F.broadcast(cand), id_col, "left_semi")
        .select(
            F.col(id_col),
            cosine_similarity(vec_col, query_vec).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def sq_rerank_top_k(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    candidates: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Two-stage retrieval: int8 scalar quantization scan → exact rerank.

    The production ANN pattern when memory bandwidth, not compute, is
    the scan bottleneck: stage 1 scores EVERY vector against the query
    using int8-quantized components (4× fewer bytes than float32 — at
    100 TB the quantized corpus is a separately materialized 25 TB
    column) and keeps ``candidates`` ≫ k of them; stage 2 re-scores
    only those with exact float cosine and returns the true top-k
    ordering. Recall loss is confined to vectors whose quantized score
    falls outside the candidate margin — driven arbitrarily low by
    widening ``candidates`` (pinned vs the exact baseline in tests).

    Quantization: symmetric per-corpus scale q = round(127·x / A) with
    A the max |component|; stage-1 score is the int dot product (exact
    integer arithmetic — deterministic regardless of partitioning).
    """
    amax = max(abs(float(x)) for x in query_vec) or 1.0
    # per-corpus component bound: one tiny agg, collected once (driver
    # scalar — the same constant a real system stores with the index)
    corpus_amax = (
        embeddings.select(
            F.max(
                F.aggregate(
                    F.transform(F.col(vec_col), lambda x: F.abs(x)),
                    F.lit(0.0).cast("double"),
                    # varargs builtins can't bind as HOF lambdas directly
                    lambda acc, x: F.greatest(acc, x),
                )
            ).alias("m")
        ).first()["m"]
        or 1.0
    )
    qq = [int(round(127.0 * float(x) / amax)) for x in query_vec]
    q_lit = F.array(*[F.lit(v) for v in qq])
    quant = F.transform(
        F.col(vec_col),
        lambda x: F.round(x * F.lit(127.0 / corpus_amax)).cast("int"),
    )
    int_score = F.aggregate(
        F.zip_with(quant, q_lit, lambda a, b: (a * b).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    cand = (
        embeddings.select(F.col(id_col), F.col(vec_col), int_score.alias("__qs"))
        .orderBy(F.desc("__qs"), F.asc(id_col))
        .limit(candidates)
    )
    return (
        cand.select(
            F.col(id_col),
            cosine_similarity(vec_col, query_vec).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def all_pairs_above_gemm(
    embeddings: DataFrame,
    dim: int,
    threshold: float = 0.9,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """:func:`all_pairs_above` with in-bucket scoring as one numpy GEMM
    per bucket (the ``knn_join_gemm`` pattern): unit-normalize the
    bucket's member matrix once, score every pair as ``U @ U.T``, emit
    the upper triangle above ``threshold``. Same bucket structure and
    output contract; each vector lives in exactly one bucket, so pairs
    are unique without a distinct.

    Use this form when downstream consumes the pair SET (dedup
    clustering — a float64 summation-order difference of ~1e-15 cannot
    flip a threshold decision on real data); keep the Column form where
    the oracle compares cosine VALUES exactly.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    b = random_hyperplane_buckets(embeddings, dim, n_planes, vec_col, seed)
    if max_bucket_size is not None:
        from pyspark.sql import Window

        cnt = F.count(F.lit(1)).over(Window.partitionBy("bucket"))
        b = b.withColumn("__bn", cnt).filter(
            F.col("__bn") <= max_bucket_size
        ).drop("__bn")

    schema = T.StructType(
        [
            T.StructField("id_a", T.LongType()),
            T.StructField("id_b", T.LongType()),
            T.StructField("cosine", T.DoubleType()),
        ]
    )
    empty = pd.DataFrame({"id_a": [], "id_b": [], "cosine": []}).astype(
        {"id_a": "int64", "id_b": "int64", "cosine": "float64"}
    )

    def score_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2:
            return empty
        ids = pdf[id_col].to_numpy()
        mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(mat, axis=1)
        safe = np.where(norms != 0, norms, 1.0)
        unit = mat / safe[:, None]
        sims = unit @ unit.T
        ok = (norms[:, None] != 0) & (norms[None, :] != 0)
        iu, ju = np.triu_indices(n, 1)
        keep = ok[iu, ju] & (sims[iu, ju] >= threshold)
        a, bb = ids[iu[keep]], ids[ju[keep]]
        return pd.DataFrame(
            {
                "id_a": np.minimum(a, bb).astype("int64"),
                "id_b": np.maximum(a, bb).astype("int64"),
                "cosine": sims[iu, ju][keep].astype("float64"),
            }
        )

    return (
        b.select(F.col(id_col), F.col(vec_col), "bucket")
        .groupBy("bucket")
        .applyInPandas(score_bucket, schema)
    )


def hard_negative_mining(
    embeddings: DataFrame,
    dim: int,
    k: int = 3,
    n_planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    seed: int = 42,
) -> DataFrame:
    """Hard-negative mining for contrastive/embedding training: for
    every vector, its top-``k`` most-similar neighbors with a
    DIFFERENT label — the pairs a trainer most wants in the batch.

    Same LSH-bucketed shape as :func:`knn_join` (equi-join on bucket,
    never all-pairs) with the label-mismatch predicate applied BEFORE
    the per-vector top-k window, so ranks count only true negatives.
    Deterministic buckets → the full output is SQL-reproducible.

    Output: (id, neighbor_id, label, neighbor_label, cosine, rank).
    """
    from pyspark.sql import Window

    b = random_hyperplane_buckets(embeddings, dim, n_planes, vec_col, seed)
    dbl = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    left = b.select(
        F.col(id_col),
        F.col(label_col),
        dbl.alias("__v"),
        l2_norm(vec_col).alias("__na"),
        "bucket",
    )
    right = b.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(label_col).alias("neighbor_label"),
        dbl.alias("__w"),
        l2_norm(vec_col).alias("__nb"),
        "bucket",
    )
    dot = F.aggregate(
        F.zip_with(F.col("__v"), F.col("__w"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    denom = F.col("__na") * F.col("__nb")
    w = Window.partitionBy(id_col).orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        left.join(right, "bucket")
        .filter(F.col(label_col) != F.col("neighbor_label"))
        .withColumn("cosine", F.round(F.when(denom != 0, dot / denom), 6))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            id_col, label_col, "neighbor_id", "neighbor_label",
            "cosine", "rank",
        )
    )


def hard_negative_mining_gemm(
    embeddings: DataFrame,
    dim: int,
    k: int = 3,
    n_planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    seed: int = 42,
) -> DataFrame:
    """:func:`hard_negative_mining` with in-bucket scoring as one numpy
    GEMM per bucket — the compute-bound form (same bucket structure,
    same output contract, same SQL oracle: the Column form already
    ranks on 6dp-ROUNDED cosines, which is exactly the GEMM law, so
    the two forms are row-identical including ranks).

    The different-label mask applies per anchor row BEFORE its top-k
    selection (`-inf` out same-label columns), so ranks count only
    true negatives — the Column form's predicate-before-window
    semantics, vectorized."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    b = random_hyperplane_buckets(embeddings, dim, n_planes, vec_col, seed)

    id_t = embeddings.schema[id_col].dataType
    lab_t = embeddings.schema[label_col].dataType
    np_of = {"bigint": "int64", "int": "int32", "smallint": "int16"}
    np_id = np_of[id_t.simpleString()]
    np_lab = np_of[lab_t.simpleString()]
    schema = T.StructType(
        [
            T.StructField(id_col, id_t),
            T.StructField(label_col, lab_t),
            T.StructField("neighbor_id", id_t),
            T.StructField("neighbor_label", lab_t),
            T.StructField("cosine", T.DoubleType()),
            T.StructField("rank", T.IntegerType()),
        ]
    )
    empty = {
        id_col: np_id, label_col: np_lab, "neighbor_id": np_id,
        "neighbor_label": np_lab, "cosine": "float64", "rank": "int32",
    }

    def score_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2:
            return pd.DataFrame(
                {c: [] for c in empty}
            ).astype(empty)
        ids = pdf[id_col].to_numpy()
        labels = pdf[label_col].to_numpy()
        mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(mat, axis=1)
        safe = np.where(norms != 0, norms, 1.0)
        sims = (mat / safe[:, None]) @ (mat / safe[:, None]).T
        sims = np.where(
            (norms[:, None] != 0) & (norms[None, :] != 0), sims, np.nan
        )
        sims = np.round(sims, 6)  # rank on rounded values like the oracle
        out = {c: [] for c in empty}
        for i in range(n):
            row = sims[i].copy()
            row[labels == labels[i]] = -np.inf  # only true negatives
            row[np.isnan(row)] = -np.inf
            cand = int((row > -np.inf).sum())
            if not cand:
                continue
            order = np.lexsort((ids, -row))[: min(k, cand)]
            out[id_col].extend([ids[i]] * len(order))
            out[label_col].extend([labels[i]] * len(order))
            out["neighbor_id"].extend(ids[order])
            out["neighbor_label"].extend(labels[order])
            out["cosine"].extend(row[order])
            out["rank"].extend(range(1, len(order) + 1))
        return pd.DataFrame(
            {c: np.asarray(v, dtype=empty[c]) for c, v in out.items()}
        )

    return (
        b.select(F.col(id_col), F.col(label_col), F.col(vec_col), "bucket")
        .groupBy("bucket")
        .applyInPandas(score_bucket, schema)
    )


def knn_join_multiprobe(
    embeddings: DataFrame,
    dim: int,
    k: int = 3,
    n_planes: int | str = 4,
    multiprobe_hamming: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    target_bucket_size: int = 512,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """:func:`knn_join` with multi-probe: every vector ALSO probes the
    buckets within ``multiprobe_hamming`` bit flips of its own — the
    standard recall-recovery trick for boundary vectors (a vector just
    across a hyperplane lands one bit away), without extra hash tables.

    Only the PROBE side explodes (1 + n_planes rows per vector at
    hamming 1); the base side stays single-bucket, so each (a, b) pair
    is generated at most once (exactly one probe bucket of ``a`` can
    equal ``b``'s bucket) and candidate volume grows (1+n_planes)×,
    not quadratically. Deterministic hyperplanes keep the full output
    SQL-reproducible: the oracle's join predicate is simply
    ``bit_count(xor(bucket_a, bucket_b)) <= hamming``.
    """
    from pyspark.sql import Window

    if multiprobe_hamming not in (0, 1):
        raise ValueError("multiprobe_hamming must be 0 or 1")
    n_planes = _resolve_planes(n_planes, embeddings, target_bucket_size)
    b = _cap_buckets(
        random_hyperplane_buckets(embeddings, dim, n_planes, vec_col, seed),
        max_bucket_size,
    )
    dbl = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    probes = F.array(
        F.col("bucket"),
        *(
            [
                F.col("bucket").bitwiseXOR(F.lit(1 << i))
                for i in range(n_planes)
            ]
            if multiprobe_hamming >= 1
            else []
        ),
    )
    left = b.select(
        F.col(id_col),
        dbl.alias("__v"),
        l2_norm(vec_col).alias("__na"),
        F.explode(probes).alias("bucket"),
    )
    right = b.select(
        F.col(id_col).alias("neighbor_id"),
        dbl.alias("__w"),
        l2_norm(vec_col).alias("__nb"),
        "bucket",
    )
    dot = F.aggregate(
        F.zip_with(F.col("__v"), F.col("__w"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    denom = F.col("__na") * F.col("__nb")
    w = Window.partitionBy(id_col).orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        left.join(right, "bucket")
        .filter(F.col(id_col) != F.col("neighbor_id"))
        .withColumn("cosine", F.round(F.when(denom != 0, dot / denom), 6))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "neighbor_id", "cosine", "rank")
    )
