"""SQL front-end: the engine's tables as named views + ``spark.sql``.

The reference is imperative pandas with no query language (SURVEY.md
§3); on Spark the SQL surface is free — the same Catalyst plans serve
both the DataFrame builders in this package and ANSI SQL text. This
module makes that explicit: register the test-data tables once, then
any query in the registry (or ad-hoc analyst SQL) can run as SQL with
identical physical plans, pushdown, and AQE behavior.

At scale nothing changes: views are metadata only; a SQL query over a
view compiles to the same parquet scan + exchanges as the DataFrame
form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from uofi_payroll_etl_main_demo_spark.io.readers import (
    TPCH_TABLES,
    read_parquet_table,
)


def register_tables(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> list[str]:
    """Register each test table as a temp view named after the table.

    Re-registration is idempotent (``createOrReplaceTempView``).
    Returns the view names registered.
    """
    names = list(names or TPCH_TABLES)
    for n in names:
        read_parquet_table(spark, sf_dir, n).createOrReplaceTempView(n)
    return names


def run_sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Register the tables, then run ``query`` through Spark SQL."""
    register_tables(spark, sf_dir)
    return spark.sql(query)
