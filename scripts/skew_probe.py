"""Skew stress probe (VERDICT r10 #6): does the claimed skew handling
actually ENGAGE under a zipfian key and a hot LSH band?

The 100 TB posture claims two defenses the small-SF bench never
exercises:

A. **AQE skew-join splitting** for zipfian join keys: a sort-merge
   join where one key holds a large fraction of the fact side gets
   its oversized shuffle partition SPLIT at runtime.  This probe
   builds a zipf-ish fact table (hot key ~= 25% of all rows), joins a
   dim too large to broadcast, and checks the POST-EXECUTION adaptive
   plan for the ``skew=true`` marker on the sort-merge join — with
   thresholds scaled down (skewedPartitionThresholdInBytes=1m) so the
   detector can engage at probe scale; at cluster scale the default
   256 MB threshold plays the same role.  Wall time is recorded with
   the splitter on vs off (same session — AQE confs are
   runtime-settable).

B. **Mega-bucket caps** in the LSH pair generators: a boilerplate-
   heavy corpus (every Nth doc shares one long prefix) drives all
   those docs into one band bucket; uncapped, that bucket alone emits
   m(m-1)/2 candidate pairs.  The probe builds a 16x corpus with a
   deliberately hot band, runs minhash_near_dup_pairs capped vs
   uncapped, and records candidate wall time + pair counts — pinning
   that the cap turns a quadratic hot spot into bounded work.

Usage: python scripts/skew_probe.py   (idle machine; ~2-4 min)
Prints a markdown table for BASELINE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from uofi_payroll_etl_main_demo_spark.ext.dedup import minhash_near_dup_pairs
from uofi_payroll_etl_main_demo_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def probe_aqe_skew_join(spark) -> list[tuple[str, float, bool]]:
    """Zipfian fact ⋈ non-broadcastable dim, splitter on vs off."""
    n_fact, n_dim, hot_share = 2_000_000, 200_000, 0.25
    n_hot = int(n_fact * hot_share)
    # hot key 0 holds `hot_share` of the fact side; the rest uniform
    fact = spark.range(n_fact).select(
        F.when(F.col("id") < n_hot, F.lit(0))
        .otherwise((F.xxhash64("id") % (n_dim - 1) + n_dim) % (n_dim - 1) + 1)
        .alias("k"),
        (F.col("id") * 7 % 1000).alias("v"),
    )
    dim = spark.range(n_dim).select(
        F.col("id").alias("k"),
        F.concat(F.lit("payload-"), F.col("id")).alias("name"),
        # widen dim rows past the broadcast threshold so the join
        # stays sort-merge (the shape AQE's skew splitter acts on)
        F.sha2(F.concat(F.lit("x"), F.col("id")), 512).alias("pad"),
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # scale the skew detector to probe size (defaults: factor 5,
    # threshold 256 MB — sized for cluster-scale partitions)
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1m"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "256k")
    out = []
    for enabled in (False, True):
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.enabled", str(enabled).lower()
        )
        joined = fact.join(dim, "k").select(
            F.sum(F.col("v")).alias("s"), F.count(F.lit(1)).alias("n")
        )
        t0 = time.perf_counter()
        joined.collect()
        wall = time.perf_counter() - t0
        # the POST-EXECUTION adaptive plan carries skew=true markers
        # on the SMJ when the splitter engaged
        plan = joined._jdf.queryExecution().executedPlan().toString()
        out.append(
            (
                "skewJoin=" + ("on" if enabled else "off"),
                round(wall, 2),
                "skew=true" in plan,
            )
        )
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.unset(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
    )
    spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    return out


def probe_lsh_mega_bucket(spark) -> list[tuple[str, float, int]]:
    """16x corpus with a hot band: capped vs uncapped pair generation."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    # 16x replication; every 4th replica-doc gets the SAME boilerplate
    # prefix long enough to dominate its shingle set -> one hot band
    # bucket holding ~4x5000/4 = thousands of docs
    boiler = " ".join(["common boilerplate header line terms"] * 6)
    reps = spark.range(16).select(F.col("id").alias("r"))
    big = (
        docs.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("r") * 1_000_000).alias("doc_id"),
            F.when(
                (F.col("doc_id") + F.col("r")) % 4 == 0,
                F.concat(F.lit(boiler + " "), F.col("text")),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
    )
    out = []
    for label, cap in (("uncapped", None), ("cap=64", 64)):
        t0 = time.perf_counter()
        n_pairs = minhash_near_dup_pairs(
            big, threshold=0.8, max_bucket_size=cap
        ).count()
        out.append((label, round(time.perf_counter() - t0, 2), n_pairs))
    return out


def main() -> None:
    spark = get_spark(
        app_name="skew-probe",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    a = probe_aqe_skew_join(spark)
    b = probe_lsh_mega_bucket(spark)
    print("| probe | config | wall_s | detail |")
    print("|---|---|---|---|")
    for cfg, wall, engaged in a:
        print(
            f"| zipfian SMJ (hot key 25% of 2M rows) | {cfg} | {wall} "
            f"| skew-split engaged: {engaged} |"
        )
    for cfg, wall, pairs in b:
        print(
            f"| hot LSH band (16x corpus, boilerplate) | {cfg} | {wall} "
            f"| verified pairs: {pairs} |"
        )


if __name__ == "__main__":
    main()
