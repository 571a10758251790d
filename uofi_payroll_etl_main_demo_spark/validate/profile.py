"""Table profiling: per-column quality stats in ONE scan.

The reference prints ad-hoc telemetry (null counts 687/691, row counts
477/797 of etl_payroll_pipeline_demo.py); this is the engine-grade
form: every column's null count, distinct count, and min/max computed
in a single aggregate pass (no per-column jobs — profiling a 100 TB
table must not scan it once per column), then unpivoted to one tidy
row per column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """→ (column, n_rows, n_nulls, n_distinct, min_value, max_value).

    min/max are emitted as strings so heterogeneous column types share
    one output schema; n_distinct is exact (count_distinct) — swap in
    ``approx_count_distinct`` for trillion-row profiling runs.
    """
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        col = F.col(c)
        aggs += [
            F.count_if(col.isNull()).alias(f"__nulls_{c}"),
            F.count_distinct(col).alias(f"__dist_{c}"),
            F.min(col).cast("string").alias(f"__min_{c}"),
            F.max(col).cast("string").alias(f"__max_{c}"),
        ]
    wide = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").alias("n_rows"),
                F.col(f"__nulls_{c}").alias("n_nulls"),
                F.col(f"__dist_{c}").alias("n_distinct"),
                F.col(f"__min_{c}").alias("min_value"),
                F.col(f"__max_{c}").alias("max_value"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(per_col).alias("p")).select("p.*")
