"""Deterministic sampling — the training-data-pipeline subsetting idiom.

``df.sample()`` is seed-dependent AND partitioning-dependent, which
makes runs non-reproducible the moment the cluster layout changes. At
corpus scale the reproducible idiom is CONTENT-keyed sampling: hash a
stable key, keep the row iff the hash lands in the first ``pct`` of
``buckets``. Properties that matter at 100 TB:

- deterministic across runs, partitionings, and engines (md5 is
  portable — the DuckDB oracle reproduces the exact row set);
- no shuffle — a narrow filter the optimizer pushes to the scan;
- consistent across tables: sampling two tables by the same key keeps
  referential integrity (all lineitems of a kept order are kept).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(key: Column, buckets: int = 100) -> Column:
    """Stable [0, buckets) bucket from the md5 of the key's string form.

    md5 (not xxhash64/crc32) because it is bit-identical in every
    engine's implementation — cross-engine reproducibility is the point.
    First 8 hex chars → unsigned int → modulo.
    """
    h = F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10)
    return (h.cast("bigint") % buckets).cast("int")


def hash_sample(
    df: DataFrame, key: str, pct: int, buckets: int = 100
) -> DataFrame:
    """Keep rows whose ``key`` hashes into the first ``pct`` buckets —
    a deterministic ~pct% sample, stable under any repartitioning."""
    return df.filter(hash_bucket(F.col(key), buckets) < pct)


def stratified_hash_sample(
    df: DataFrame, strata: str, key: str, fractions: dict[str, int],
    buckets: int = 100,
) -> DataFrame:
    """Per-stratum deterministic sampling (class rebalancing).

    ``fractions`` maps stratum value → pct kept (0..buckets); strata
    not listed are dropped. Same narrow-filter scale shape as
    ``hash_sample`` — the per-stratum threshold is a literal map lookup,
    not a join.
    """
    thresh = F.create_map(
        *[F.lit(x) for kv in fractions.items() for x in kv]
    )[F.col(strata)]
    return df.filter(
        thresh.isNotNull()
        & (hash_bucket(F.col(key), buckets) < thresh)
    )


def mixture_take(
    df: DataFrame,
    budgets: dict[str, int],
    strata: str = "source",
    key: str = "doc_id",
) -> DataFrame:
    """Exact-count mixture sampling: per stratum, keep the FIRST
    ``budgets[stratum]`` rows in portable-hash order — the data-mixing
    op that assembles a training set to a target source composition
    ("100k docs of web, 50k of code, 10k of forums").

    Hash order (md5 of the key, ties by key) makes the selection a
    deterministic pseudo-random subset: stable across runs,
    partitionings, and engines, and a stratum whose budget exceeds its
    population is simply kept whole. Strata not listed are dropped.
    One shuffle on the stratum key for the in-stratum rank; the
    rank-vs-budget filter is a literal CASE, not a join.
    """
    h = (
        F.conv(F.substring(F.md5(F.col(key).cast("string")), 1, 15), 16, 10)
        .cast("bigint")
    )
    from pyspark.sql import Window

    w = Window.partitionBy(strata).orderBy(h.asc(), F.col(key).asc())
    budget = F.create_map(
        *[F.lit(x) for kv in budgets.items() for x in kv]
    )[F.col(strata)]
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(budget.isNotNull() & (F.col("__rn") <= budget))
        .drop("__rn")
    )


def corpus_shuffle(
    df: DataFrame,
    key: str = "doc_id",
    epoch: int = 0,
    shards: int = 8,
) -> DataFrame:
    """Deterministic epoch shuffle: assign every row a shard and a
    position within that shard from a seeded portable hash — the
    "global shuffle" a training loader needs WITHOUT a global sort.

    Each epoch permutes differently (the epoch seeds the hash), yet
    the permutation is exactly reproducible across runs, partitionings,
    and engines. One shuffle on shard id for the in-shard rank window;
    shards are independent, so at 100 TB each shard's window sorts
    1/shards of the corpus — there is no single global ordering
    bottleneck, which is exactly how sharded training data is consumed
    (loaders read shards in parallel, each shard pre-shuffled).

    Output: original columns + (shard, pos) with pos = 1..shard_size
    in hash order, ties broken by key.
    """
    from pyspark.sql import Window

    h = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit(epoch), F.col(key).cast("string"))),
                1,
                15,
            ),
            16,
            10,
        )
        .cast("bigint")
    )
    shard = (h % shards).cast("int")
    w = Window.partitionBy("shard").orderBy(F.col("__h").asc(), F.col(key).asc())
    return (
        df.withColumn("__h", h)
        .withColumn("shard", shard)
        .withColumn("pos", F.row_number().over(w))
        .drop("__h")
    )


def temperature_mixture_weights(
    df: DataFrame,
    strata: str = "source",
    alpha: float = 0.7,
    budget: int | None = None,
) -> DataFrame:
    """Temperature-scaled sampling weights per stratum: w_i ∝ n_i^alpha
    (alpha < 1 up-weights small domains — the multilingual/multi-domain
    rebalancing rule of public LLM recipes; alpha=1 is proportional,
    alpha=0 uniform).

    One tiny aggregate over the corpus (per-stratum counts), then
    closed-form arithmetic — the weight table is dimension-sized and
    feeds ``mixture_take`` budgets. With ``budget`` set, also emits
    floor(w_i * budget) as take_budget.

    Output: (stratum, n_docs, weight round-6[, take_budget]).
    """
    from pyspark.sql import Window

    counts = df.groupBy(strata).agg(F.count(F.lit(1)).alias("n_docs"))
    powed = F.pow(F.col("n_docs").cast("double"), F.lit(float(alpha)))
    # dimension-sized frame: the all-rows window is a handful of strata
    tot = Window.partitionBy()
    w = powed / F.sum(powed).over(tot)
    out = counts.select(
        F.col(strata),
        "n_docs",
        F.round(w, 6).alias("weight"),
    )
    if budget is not None:
        out = out.withColumn(
            "take_budget", F.floor(w * F.lit(int(budget))).cast("bigint")
        )
    return out
