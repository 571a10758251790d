"""Skew mitigation + bucketed co-located joins (100 TB posture tools)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from uofi_payroll_etl_main_demo_spark.io import write_bucketed
from uofi_payroll_etl_main_demo_spark.operators import (
    salted_left_join,
    two_phase_agg,
    with_salt,
)
from uofi_payroll_etl_main_demo_spark.plans import inspect_plan


@pytest.fixture()
def skewed(spark):
    # one hot key ('hot' = 80% of rows) + a tail
    rows = [(i, "hot" if i % 5 != 0 else f"k{i % 7}", float(i % 10)) for i in range(1000)]
    return spark.createDataFrame(rows, "id long, k string, v double")


def test_skew_report_math_and_guards(spark, skewed):
    from uofi_payroll_etl_main_demo_spark.operators.skew import skew_report

    rep = skew_report(skewed, ["k"], top_n=3).collect()
    assert [r["rank"] for r in rep] == [1, 2, 3]
    hot = rep[0]
    # 800 'hot' rows of 1000 over 8 distinct keys
    assert hot["k"] == "hot" and hot["cnt"] == 800
    assert hot["share_pct"] == 80.0 and hot["cum_share_pct"] == 80.0
    assert hot["skew_factor"] == 800 * 8 / 1000  # = 6.4 = n_salts hint
    assert rep[1]["cum_share_pct"] > 80.0
    # ties broken by key value: the seven k* tail keys alternate
    # deterministically
    again = skew_report(skewed, ["k"], top_n=3).collect()
    assert [tuple(r) for r in rep] == [tuple(r) for r in again]
    with pytest.raises(ValueError):
        skew_report(skewed, [], top_n=3)
    with pytest.raises(ValueError):
        skew_report(skewed, ["k"], top_n=0)


def test_with_salt_deterministic_and_bounded(spark, skewed):
    a = with_salt(skewed, ["id"], n_salts=8).select("id", "__salt")
    b = with_salt(skewed, ["id"], n_salts=8).select("id", "__salt")
    assert a.subtract(b).count() == 0
    r = a.agg(F.min("__salt"), F.max("__salt")).first()
    assert r[0] >= 0 and r[1] <= 7
    # the hot key's rows actually spread over many salts
    n_buckets = (
        with_salt(skewed, ["id"], n_salts=8)
        .filter(F.col("k") == "hot")
        .select("__salt")
        .distinct()
        .count()
    )
    assert n_buckets == 8


def test_salted_join_equals_plain_join(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", "HOT"), ("k0", "K0"), ("k7", "K7")], "k string, label string"
    )
    plain = skewed.join(dim, "k", "left").select("id", "k", "label")
    salted = salted_left_join(
        skewed, dim, on=["k"], salt_from=["id"], n_salts=8
    ).select("id", "k", "label")
    assert plain.subtract(salted).count() == 0
    assert salted.subtract(plain).count() == 0
    assert salted.count() == plain.count()


def test_two_phase_agg_equals_direct(spark, skewed):
    direct = skewed.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("v").cast("decimal(18,2)")).alias("s"),
    )
    two = two_phase_agg(
        skewed,
        keys=["k"],
        aggs={
            "n": F.count(F.lit(1)),
            "s": F.sum(F.col("v").cast("decimal(18,2)")),
        },
        salt_from=["id"],
        n_salts=8,
    )
    d = {r["k"]: (r["n"], float(r["s"])) for r in direct.collect()}
    t = {r["k"]: (r["n"], float(r["s"])) for r in two.collect()}
    assert d == t


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    write_bucketed(li, "t_li_bucketed", ["l_orderkey"], num_buckets=8)
    write_bucketed(
        orders.withColumnRenamed("o_orderkey", "l_orderkey"),
        "t_ord_bucketed",
        ["l_orderkey"],
        num_buckets=8,
    )
    try:
        a = spark.table("t_li_bucketed")
        b = spark.table("t_ord_bucketed")
        joined = a.join(b, "l_orderkey")
        r = inspect_plan(joined)
        # co-located: same keys, same bucket count -> no shuffle exchange
        assert r.exchanges == 0
        assert joined.count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS t_li_bucketed")
        spark.sql("DROP TABLE IF EXISTS t_ord_bucketed")


def test_lsh_partitioned_corpus_prunes_probe_scan(spark, tmp_path):
    """The billion-vector serving layout: embeddings WRITTEN partitioned
    by LSH bucket, probed with the multiprobe bucket list. The probe
    filter must land in PartitionFilters (directory pruning — whole
    non-probed partitions never read), not as a post-scan filter."""
    from uofi_payroll_etl_main_demo_spark.ext.similarity import (
        random_hyperplane_buckets,
    )
    from uofi_payroll_etl_main_demo_spark.io.writers import (
        write_partitioned_sorted,
    )
    from uofi_payroll_etl_main_demo_spark.plans import formatted_plan

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    b = random_hyperplane_buckets(emb, dim=64, n_planes=3)
    path = str(tmp_path / "emb_by_bucket")
    write_partitioned_sorted(b, path, partition_by=["bucket"], sort_by=["vec_id"])
    back = spark.read.parquet(path)
    probed = back.filter(F.col("bucket").isin(1, 3, 5)).select("vec_id")
    plan = formatted_plan(probed)
    assert "PartitionFilters" in plan
    assert "bucket" in plan.split("PartitionFilters", 1)[1][:200]
    # the probe result equals the unpartitioned filter (no rows lost)
    want = sorted(
        r["vec_id"] for r in b.filter(F.col("bucket").isin(1, 3, 5))
        .select("vec_id").collect()
    )
    got = sorted(r["vec_id"] for r in probed.collect())
    assert got == want and len(got) > 0
