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


def test_corpus_shuffle_deterministic_and_complete(spark, sf_dir):
    from uofi_payroll_etl_main_demo_spark.operators.sampling import (
        corpus_shuffle,
    )

    docs = read_parquet_table(spark, sf_dir, "documents").select(
        "doc_id", "source"
    )
    a = corpus_shuffle(docs, epoch=1, shards=8)
    b = corpus_shuffle(docs.repartition(13), epoch=1, shards=8)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    # complete permutation: every row present exactly once, positions
    # contiguous 1..shard_size within each shard
    n = docs.count()
    assert a.count() == n
    per = a.groupBy("shard").agg(
        F.count(F.lit(1)).alias("c"), F.max("pos").alias("mx"),
        F.min("pos").alias("mn"),
    )
    assert all(r["mx"] == r["c"] and r["mn"] == 1 for r in per.collect())
    # a different epoch permutes differently
    c = corpus_shuffle(docs, epoch=2, shards=8)
    assert sorted(map(tuple, a.collect())) != sorted(map(tuple, c.collect()))


def test_temperature_weights_limits(spark, sf_dir):
    from uofi_payroll_etl_main_demo_spark.operators.sampling import (
        temperature_mixture_weights,
    )

    docs = read_parquet_table(spark, sf_dir, "documents")
    w1 = {
        r["source"]: r
        for r in temperature_mixture_weights(
            docs, alpha=1.0, budget=1000
        ).collect()
    }
    n = docs.count()
    for src, r in w1.items():
        assert abs(r["weight"] - r["n_docs"] / n) < 1e-5  # proportional
    w0 = {
        r["source"]: r["weight"]
        for r in temperature_mixture_weights(docs, alpha=0.0).collect()
    }
    vals = set(w0.values())
    assert len(vals) == 1  # uniform at alpha=0
    wt = {
        r["source"]: r
        for r in temperature_mixture_weights(
            docs, alpha=0.7, budget=1000
        ).collect()
    }
    assert abs(sum(r["weight"] for r in wt.values()) - 1.0) < 1e-4
    assert all(r["take_budget"] <= 1000 for r in wt.values())
    # alpha < 1 up-weights small domains relative to proportional
    small = min(wt, key=lambda s: wt[s]["n_docs"])
    assert wt[small]["weight"] >= w1[small]["weight"] - 1e-9
