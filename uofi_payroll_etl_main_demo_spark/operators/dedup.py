"""Deduplication operators (SURVEY.md §2.8 D1–D4, §2.5 W2).

The reference's ``drop_duplicates(keep="first")`` relies on pandas input
row order (etl_payroll_pipeline_demo.py:343, 668, 695) — a semantics
that does not exist in a distributed engine. The order-faithful port
(``dedup_keep_first``) takes an EXPLICIT ordering and keeps the first
row per key under it, via ``row_number`` over a window. This is the
engine's main determinism decision (SURVEY.md §7.3 hard part 1).

Scale note: both variants shuffle once on the dedup key. The window
variant additionally sorts within partitions; at 100 TB prefer
``dropDuplicates`` (hash-based, no sort) when ANY surviving row is
acceptable, and the window variant only when the reference's
keep-first semantics is load-bearing.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def distinct_rows(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    """Full-row distinct (D1) or arbitrary-survivor key dedup (D2).

    Reference: ``drop_duplicates()`` at 667/693; ``subset=`` at 343/695.
    """
    if subset:
        return df.dropDuplicates(list(subset))
    return df.dropDuplicates()


def dedup_keep_first(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column | str],
) -> DataFrame:
    """Keep the first row per key under an explicit total order (W2).

    ``order_by`` should extend to a total order within each key group
    (include a unique tie-breaker column) or survivors are only
    deterministic up to ties.

    Reference: ``drop_duplicates(subset=..., keep='first')`` at
    etl_payroll_pipeline_demo.py:668 (UIN Job) and 695 (TRAN_ID), where
    "first" meant file order; here it means the caller's order.
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
