"""Set operations (SURVEY.md §2.7).

The reference's only set op over rows is union-by-name
(``pd.concat([df_cert_bw, df_cert_mn])``, etl_payroll_pipeline_demo.py:
491): pandas aligns on column NAMES and fills missing with NaN — which
is ``unionByName(allowMissingColumns=True)``, NOT positional ``union``.
intersect/except are added as near-free Spark ops (they underpin
regression-diffing of pipeline outputs).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame


def union_by_name(*dfs: DataFrame, allow_missing: bool = True) -> DataFrame:
    """UNION ALL aligned by column name; absent columns become null."""
    return reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=allow_missing), dfs
    )


def intersect_rows(a: DataFrame, b: DataFrame, distinct: bool = True) -> DataFrame:
    return a.intersect(b) if distinct else a.intersectAll(b)


def except_rows(a: DataFrame, b: DataFrame, distinct: bool = True) -> DataFrame:
    return a.exceptAll(b) if not distinct else a.subtract(b)
