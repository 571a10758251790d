"""Extra query-surface checks that the oracle can't express."""

from __future__ import annotations

from pyspark.sql import functions as F

from uofi_payroll_etl_main_demo_spark import queries as R
from uofi_payroll_etl_main_demo_spark.io.readers import read_parquet_table


def test_approx_distinct_within_error_bound(spark, sf_dir):
    li = read_parquet_table(spark, sf_dir, "lineitem")
    exact = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .collect()
    }
    rows = {r["l_returnflag"]: r for r in R.q_approx_distinct(spark, sf_dir).collect()}
    assert set(rows) == set(exact)
    for k, n in exact.items():
        assert rows[k]["exact_parts"] == n
        assert rows[k]["approx_within_5pct"]  # rsd=0.02, generous bound


def test_rows_only_queries_execute(spark, sf_dir):
    qs, osql = R.queries(), R.oracle_sql()
    for name in set(qs) - set(osql):
        df = qs[name](spark, sf_dir)
        assert df.count() >= 0, name  # executes without error
