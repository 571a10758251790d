"""Feature engineering (ext/features.py): window form vs applyInPandas."""

import math

from pyspark.sql import functions as F

from uofi_payroll_etl_main_demo_spark.ext.features import (
    zscore_pandas,
    zscore_window,
)
from uofi_payroll_etl_main_demo_spark.io.readers import read_parquet_table


def test_pandas_twin_matches_window_form(spark, sf_dir):
    ev = read_parquet_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    a = {
        r["event_id"]: r["zscore"]
        for r in zscore_window(ev, "event_type", "value").collect()
    }
    b = {
        r["event_id"]: r["zscore"]
        for r in zscore_pandas(ev, "event_type", "value").collect()
    }
    assert a.keys() == b.keys()
    for k in a:
        if a[k] is None or b[k] is None:
            assert a[k] == b[k]
        else:
            assert math.isclose(a[k], b[k], rel_tol=1e-9, abs_tol=1e-9)


def test_zscore_constant_group_is_null(spark):
    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "a", 5.0), (3, "b", 1.0), (4, "b", 3.0)],
        "id bigint, g string, value double",
    )
    out = {r["id"]: r["zscore"] for r in zscore_window(df, "g", "value").collect()}
    assert out[1] is None and out[2] is None  # zero variance
    assert math.isclose(out[3], -math.sqrt(0.5) / 1.0, rel_tol=1e-9) or out[3] < 0
    assert out[4] > 0
