"""Aggregate operators (SURVEY.md §2.4 A1–A5).

The one non-trivial aggregate in the reference is MODE-per-group with a
deterministic fallback (``mode_map``, etl_payroll_pipeline_demo.py:
224-226, applied at 311-319 and 633-637). ``F.mode`` (Spark ≥ 3.4)
breaks ties arbitrarily, so the engine builds mode as
count → window → row_number with an explicit tie-break on the value —
deterministic on any cluster.

Scale shape: ``groupBy(key, value).count()`` does a map-side partial
aggregate BEFORE the shuffle, so the window then runs over one row per
(key, value) pair — cardinality of the value domain, not of the fact
table. This is the 100 TB-safe way to compute mode (SURVEY.md §7.3
hard part 4).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def mode_by_group(
    df: DataFrame,
    key: str | list[str],
    value: str,
    out_name: str | None = None,
) -> DataFrame:
    """Most frequent ``value`` per ``key``; ties broken by smallest value.

    Returns one row per key: ``key..., out_name``.
    """
    keys = [key] if isinstance(key, str) else list(key)
    out_name = out_name or f"mode_{value}"
    counted = df.groupBy(*keys, value).agg(F.count(F.lit(1)).alias("__n"))
    w = Window.partitionBy(*keys).orderBy(F.desc("__n"), F.asc(value))
    return (
        counted.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(*keys, F.col(value).alias(out_name))
    )


def mode_lookup_map(
    df: DataFrame, key: str, value: str
) -> dict[str, str]:
    """Driver-side dict of mode-per-key (A5) — the reference's
    ``.agg(mode_map).to_dict()`` at 319/633-637. Only for genuinely tiny
    key domains; prefer joining ``mode_by_group`` output relationally
    (J10) so nothing is collected."""
    rows = mode_by_group(df, key, value, "value").collect()
    return {r[key]: r["value"] for r in rows}


def null_count(df: DataFrame, *cols: str) -> DataFrame:
    """Per-column null counts in one pass (A3; reference 687/691)."""
    return df.agg(
        *[
            F.count_if(F.col(c).isNull()).alias(f"nulls_{c}")
            for c in cols
        ]
    )


def min_max(df: DataFrame, col: str) -> tuple:
    """(min, max) of a column collected to the driver (A2; reference
    496-497 uses them for the fiscal-window sanity bound)."""
    row = df.agg(F.min(col).alias("mn"), F.max(col).alias("mx")).first()
    return row["mn"], row["mx"]


def decimal_sum(c: Column | str, precision: int = 18, scale: int = 2) -> Column:
    """Order-independent money sum: cast to decimal before summing.

    Double addition is not associative, so a distributed sum of doubles
    varies with partitioning. Summing decimals is exact and therefore
    deterministic under any partition order — required for
    oracle-differential testing, and the right call for money at any
    scale.
    """
    col = F.col(c) if isinstance(c, str) else c
    return F.sum(col.cast(f"decimal({precision},{scale})"))
