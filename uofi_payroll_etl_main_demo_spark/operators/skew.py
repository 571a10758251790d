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


_COUNT_POOL: list = []


def skew_report(
    df: DataFrame,
    keys: Sequence[str],
    top_n: int = 20,
) -> DataFrame:
    """The DIAGNOSTIC next to the mitigations: per-key concentration
    stats for a prospective shuffle key — row count, corpus share,
    cumulative share, and ``skew_factor`` (count / mean-per-key; also
    the salt count that would level that key, which is what
    :func:`with_salt`'s ``n_salts`` wants). Returns the ``top_n``
    heaviest keys, heaviest first, ties broken by key value.

    Scale shape: one partial-agg groupBy over the fact table, then a
    global top-N (`orderBy(...).limit`, a partial top-k per partition
    — never a single-partition window over ALL keys); the grand total
    is one driver-side row folded back in as literals. The only
    full-width pass is the count.
    """
    if not keys:
        raise ValueError("need at least one key column")
    if top_n < 1:
        raise ValueError(f"top_n must be >= 1: {top_n}")
    from uofi_payroll_etl_main_demo_spark.cache import swap_pooled

    # persisted: the totals action and the top-N job both consume the
    # key counts — unpersisted, the full fact-table scan runs twice.
    # Lifetime: cache.swap_pooled (one cached count frame per session).
    counts = swap_pooled(
        _COUNT_POOL,
        df.groupBy(*keys).agg(F.count(F.lit(1)).alias("cnt")),
    )
    # totals land on the driver as ONE row (the A5 aggregate→driver
    # precedent; a join-based attach constant-folds into the
    # BroadcastNestedLoopJoin the plan lint bans) and re-enter the
    # plan as literals — a diagnostic pays one extra tiny agg job
    total, n_keys = counts.agg(
        F.sum("cnt"), F.count(F.lit(1))
    ).first()
    if not total:
        raise ValueError("skew_report over an empty DataFrame")
    order = [F.col("cnt").desc()] + [F.col(k) for k in keys]
    top = counts.orderBy(*order).limit(top_n)
    from pyspark.sql import Window

    w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    return (
        top.withColumn(
            "share_pct",
            F.round(F.col("cnt") * 100.0 / F.lit(float(total)), 4),
        )
        .withColumn(
            "cum_share_pct",
            F.round(
                F.sum("cnt").over(w) * 100.0 / F.lit(float(total)), 4
            ),
        )
        .withColumn(
            "skew_factor",
            F.round(
                F.col("cnt") * F.lit(int(n_keys)) / F.lit(float(total)), 4
            ),
        )
        .withColumn("rank", F.row_number().over(Window.orderBy(*order)))
        .select(*keys, "rank", "cnt", "share_pct", "cum_share_pct",
                "skew_factor")
    )


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
