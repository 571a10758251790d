"""Skew mitigation: salting for hot keys, two-phase aggregation.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on in
``session.get_spark``) handles moderate skew at runtime; these helpers
are the explicit form for the pathological cases AQE can't fix — a
single key holding a double-digit percentage of a 100 TB fact table.

All salting here is DETERMINISTIC (hash of stable columns, never
``rand()``): plans stay reproducible under retries and speculative
execution, which nondeterministic salt breaks (a re-run task would
re-salt rows differently than its first attempt).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(
    df: DataFrame,
    distinct_on: Sequence[str],
    n_salts: int = 16,
    out_col: str = "__salt",
) -> DataFrame:
    """Append a deterministic salt in [0, n_salts) derived from
    ``distinct_on`` columns (pick columns that vary WITHIN each hot
    key group — e.g. the fact table's line-level ids)."""
    h = F.xxhash64(*[F.col(c) for c in distinct_on])
    return df.withColumn(out_col, F.pmod(h, F.lit(n_salts)).cast("int"))


def salted_left_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    salt_from: Sequence[str],
    n_salts: int = 16,
    how: str = "left",
) -> DataFrame:
    """Left equi-join where the fact side's hot keys are spread over
    ``n_salts`` shuffle partitions.

    The dim side is exploded ``n_salts``× (one replica per salt) so
    every (key, salt) bucket finds its match — the standard salted-join
    shape: fact rows with the same hot key land on different reducers,
    dim replication cost is |dim| × n_salts (dims are small by the
    engine's design, §2.3).
    """
    keys = list(on)
    fact_s = with_salt(fact, salt_from, n_salts)
    dim_s = dim.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(i) for i in range(n_salts)])),
    )
    out = fact_s.join(dim_s, keys + ["__salt"], how)
    return out.drop("__salt")


def two_phase_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, Column],
    salt_from: Sequence[str],
    n_salts: int = 16,
) -> DataFrame:
    """Skew-safe aggregation: partial agg on (keys + salt), then final
    re-agg on keys.

    Only decomposable aggregates are supported — ``aggs`` maps output
    name → partial aggregate expression, and the final phase re-sums
    (counts must therefore be expressed as sums). Spark's hash
    aggregate already partial-aggregates map-side; this helper adds a
    REDUCER-side split for keys so hot they overwhelm a single final
    task even after map-side combine.
    """
    keys = list(keys)
    partial = (
        with_salt(df, salt_from, n_salts)
        .groupBy(*keys, "__salt")
        .agg(*[expr.alias(name) for name, expr in aggs.items()])
    )
    return partial.groupBy(*keys).agg(
        *[F.sum(name).alias(name) for name in aggs]
    )
