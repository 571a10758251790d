"""Feature engineering: per-group normalization.

Two implementations of the same operator, deliberately:

- ``zscore_window`` — the PRODUCTION path: window aggregates (mean /
  stddev over the group partition), all JVM-side, one shuffle on the
  group key. This is the form Catalyst can push into, and the form the
  DuckDB oracle checks exactly.
- ``zscore_pandas`` — the same semantics through ``applyInPandas``
  (grouped-map Pandas UDF), kept as the engine's reference example of
  the Arrow escape hatch done right: used ONLY when the per-group logic
  genuinely can't be expressed in Column algebra (this one can — the
  test pins both forms equal, which is exactly the discipline the
  escape hatch needs).

Scale note: grouped-map collects EACH GROUP into one pandas frame on
one executor — safe for bounded groups (per-type, per-user), wrong for
mega-groups; the window form has no such constraint beyond ordinary
partition sizing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def zscore_window(
    df: DataFrame, group: str, value: str, out: str = "zscore"
) -> DataFrame:
    """Append per-group z-score of ``value`` (sample stddev; null when
    the group has no variance)."""
    w = Window.partitionBy(group)
    mean = F.avg(F.col(value)).over(w)
    std = F.stddev_samp(F.col(value)).over(w)
    z = F.when(std > 0, (F.col(value) - mean) / std)
    return df.withColumn(out, z)


def zscore_pandas(
    df: DataFrame, group: str, value: str, out: str = "zscore"
) -> DataFrame:
    """``applyInPandas`` twin of :func:`zscore_window` (see module doc)."""
    import pandas as pd
    from pyspark.sql import types as T

    # NB: build a NEW StructType — StructType.add mutates in place, and
    # mutating df.schema corrupts the source plan's resolved schema.
    schema_out = T.StructType(
        list(df.schema.fields) + [T.StructField(out, T.DoubleType())]
    )

    def norm(pdf: "pd.DataFrame") -> "pd.DataFrame":
        std = pdf[value].std(ddof=1)
        z = (pdf[value] - pdf[value].mean()) / std if std and std > 0 else None
        return pdf.assign(**{out: z})

    return df.groupBy(group).applyInPandas(norm, schema=schema_out)
