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
