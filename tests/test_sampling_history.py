"""Deterministic sampling (operators/sampling.py) and SCD2 history
(operators/history.py)."""

from datetime import datetime

from pyspark.sql import functions as F

from uofi_payroll_etl_main_demo_spark.io.readers import read_parquet_table
from uofi_payroll_etl_main_demo_spark.operators.history import scd2_intervals
from uofi_payroll_etl_main_demo_spark.operators.sampling import (
    hash_bucket,
    hash_sample,
    stratified_hash_sample,
)


def test_hash_sample_is_repartition_invariant(spark, sf_dir):
    o = read_parquet_table(spark, sf_dir, "orders")
    keys1 = {r[0] for r in hash_sample(o, "o_orderkey", 10).select("o_orderkey").collect()}
    keys2 = {
        r[0]
        for r in hash_sample(o.repartition(17), "o_orderkey", 10)
        .select("o_orderkey")
        .collect()
    }
    assert keys1 == keys2
    n = o.count()
    # ~10% with generous slack (hash is uniform but finite-sample)
    assert 0.05 * n < len(keys1) < 0.15 * n


def test_hash_sample_referential_integrity(spark, sf_dir):
    """Sampling two tables by the SAME key keeps them joinable: every
    sampled lineitem's order is in the sampled orders set."""
    o = read_parquet_table(spark, sf_dir, "orders")
    li = read_parquet_table(spark, sf_dir, "lineitem")
    o_keys = hash_sample(o, "o_orderkey", 10).select("o_orderkey")
    li_keys = hash_sample(li, "l_orderkey", 10).select(
        F.col("l_orderkey").alias("o_orderkey")
    )
    orphans = li_keys.join(o_keys, "o_orderkey", "left_anti")
    assert orphans.count() == 0


def test_hash_bucket_range(spark):
    df = spark.range(1000).select(hash_bucket(F.col("id"), 7).alias("b"))
    got = {r["b"] for r in df.distinct().collect()}
    assert got <= set(range(7)) and len(got) == 7


def test_stratified_sample_drops_unlisted_strata(spark, sf_dir):
    o = read_parquet_table(spark, sf_dir, "orders")
    out = stratified_hash_sample(o, "o_orderstatus", "o_orderkey", {"F": 100})
    got = {r[0] for r in out.select("o_orderstatus").distinct().collect()}
    assert got == {"F"}
    # pct=100 keeps the whole stratum
    assert out.count() == o.filter(F.col("o_orderstatus") == "F").count()


def test_scd2_intervals_chain(spark):
    rows = [
        (1, datetime(2024, 1, 1), "a"),
        (1, datetime(2024, 2, 1), "b"),
        (1, datetime(2024, 3, 1), "c"),
        (2, datetime(2024, 5, 1), "x"),
    ]
    df = spark.createDataFrame(rows, "k int, ts timestamp, v string")
    out = {
        (r["k"], r["v"]): (r["valid_from"], r["valid_to"], r["is_current"])
        for r in scd2_intervals(df, "k", "ts", ["v"]).collect()
    }
    assert out[(1, "a")] == (datetime(2024, 1, 1), datetime(2024, 2, 1), False)
    assert out[(1, "b")] == (datetime(2024, 2, 1), datetime(2024, 3, 1), False)
    assert out[(1, "c")] == (datetime(2024, 3, 1), None, True)
    assert out[(2, "x")] == (datetime(2024, 5, 1), None, True)
    # intervals tile: exactly one current row per key
    cur = (
        scd2_intervals(df, "k", "ts", ["v"])
        .filter("is_current")
        .groupBy("k")
        .count()
        .collect()
    )
    assert all(r["count"] == 1 for r in cur)


def test_scd2_tiebreak_is_deterministic(spark):
    rows = [(1, datetime(2024, 1, 1), 2), (1, datetime(2024, 1, 1), 1)]
    df = spark.createDataFrame(rows, "k int, ts timestamp, seq int")
    out = scd2_intervals(df, "k", "ts", ["seq"], tiebreak=["seq"]).collect()
    by_seq = {r["seq"]: r for r in out}
    assert by_seq[1]["is_current"] is False and by_seq[2]["is_current"] is True


def test_merge_upsert_semantics(spark):
    from uofi_payroll_etl_main_demo_spark.operators.history import (
        merge_upsert,
    )

    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, v string, x double",
    )
    updates = spark.createDataFrame(
        [(2, "B", 99.0), (4, "d", 40.0)], "k long, v string, x double"
    )
    got = {r["k"]: (r["v"], r["x"]) for r in
           merge_upsert(base, updates, ["k"]).collect()}
    assert got == {
        1: ("a", 10.0),   # untouched
        2: ("B", 99.0),   # matched -> replaced
        3: ("c", 30.0),   # untouched
        4: ("d", 40.0),   # unmatched -> inserted
    }
