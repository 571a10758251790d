"""SparkSession factory tuned for the engine.

The reference runs a single pandas process (SURVEY.md §4.2); our engine
targets a multi-executor cluster. The confs below are the scale posture:
AQE on (runtime re-plan, skew-join splitting, partition coalescing),
Arrow on (fast pandas boundary for the Excel bridge and pandas UDFs),
broadcast threshold generous because every reference dimension is
KB-scale (SURVEY.md §2.3).
"""

from __future__ import annotations

import os
from contextlib import contextmanager
from typing import Iterator

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "*")


def get_spark(
    app_name: str = "uofi-payroll-etl-spark",
    master: str | None = None,
    shuffle_partitions: int = DEFAULT_SHUFFLE_PARTITIONS,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's scale posture.

    On a real cluster ``master`` comes from spark-submit; locally we
    default to ``local[$SPARK_GRAFT_CPUS]``.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None:
        master = f"local[{DEFAULT_CPUS}]"
    builder = builder.master(master)
    conf = {
        # Local mode runs driver == executors in ONE JVM; Spark's 1g
        # default is sized for a thin cluster driver, not for local[32]
        # doing the executors' work — HOF bucket expansions at bench
        # scale exhaust it (GCLocker retry crashes). Overridable via
        # SPARK_GRAFT_DRIVER_MEM; on a real cluster spark-submit's
        # --driver-memory/--executor-memory take precedence anyway.
        "spark.driver.memory": os.environ.get(
            "SPARK_GRAFT_DRIVER_MEM", "16g"
        ),
        # Runtime adaptivity: partition coalescing, skew-join splitting,
        # broadcast demotion/promotion. Essential at 100 TB where static
        # planning guesses wrong.
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # Spark's default 10 MB: dimension-sized. The posture was 64 MB
        # through r10 ("every reference dimension is KB-scale"), but
        # the r11 sf1 decade proved 64 MB is a SCALE TRAP: mid-scale
        # FACT tables (sf1 lineitem ≈ 6M rows) slip under it and get
        # driver-broadcast — the TPC-H Q5 row was broadcasting
        # lineitem itself (4× ratio drift sf0.1→sf1; at 100 TB the
        # same posture would broadcast any fact partition estimated
        # <64 MB after pushdown). Real dimensions are KBs and still
        # broadcast at 10 MB; operators that KNOW a side is bounded
        # say so explicitly with F.broadcast().
        "spark.sql.autoBroadcastJoinThreshold": str(10 * 1024 * 1024),
        # Arrow for any pandas boundary (Excel bridge, pandas UDFs).
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.shuffle.partitions": str(shuffle_partitions),
        # Deterministic timestamp semantics regardless of host TZ.
        "spark.sql.session.timeZone": "UTC",
        # Keep parquet scans pruned + vectorized (defaults, stated for intent).
        "spark.sql.parquet.filterPushdown": "true",
        "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
        # Managed (bucketed) tables land outside the repo checkout.
        "spark.sql.warehouse.dir": os.environ.get(
            "SPARK_GRAFT_WAREHOUSE", "/tmp/spark-graft-warehouse"
        ),
    }
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


@contextmanager
def scoped_conf(spark: SparkSession, conf: dict[str, str]) -> Iterator[None]:
    """Set session confs for a block, restoring the previous values on
    exit. Anything the block leaves LAZY executes under the caller's
    restored confs — operators using this must materialize (eager
    localCheckpoint / action) inside the block."""
    old: dict[str, str | None] = {}
    for k, v in conf.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


@contextmanager
def iterative_conf(
    spark: SparkSession, state_partitions: int | None = None
) -> Iterator[None]:
    """Execution posture for iterative operators (PageRank, connected
    components): AQE OFF and a state-sized shuffle width.

    AQE executes a multi-shuffle chain stage-by-stage with a driver
    replanning pause between stages; an iterative graph sweep is a
    chain of small fixed-shape shuffles, so that pause — not the data —
    dominates (measured 7.0 s → 2.3 s for 6 PageRank sweeps at sf0.1,
    local[32]). The per-sweep state frame is O(nodes) rows, far smaller
    than the session default shuffle width sized for the big tables;
    ``state_partitions`` defaults to defaultParallelism/4 (min 8) and
    should be passed explicitly for billion-node graphs.
    """
    n = state_partitions or max(8, spark.sparkContext.defaultParallelism // 4)
    with scoped_conf(
        spark,
        {
            "spark.sql.adaptive.enabled": "false",
            "spark.sql.shuffle.partitions": str(n),
        },
    ):
        yield


def remote_store_conf(
    bucket_scheme: str = "s3a",
    endpoint: str | None = None,
    path_style_access: bool = False,
) -> dict[str, str]:
    """SparkSession conf template for a remote object store — the
    engine-side equivalent of the reference's remote-store connector
    (reference etl_payroll_pipeline_demo.py:9-34 authenticates a Box
    client; on Spark, remote storage is a *filesystem scheme*, so the
    "connector" is Hadoop FS configuration and every reader/writer in
    ``io/`` works unchanged on ``s3a://bucket/...`` paths — SURVEY §2.1
    S1/S8 scope this to connector config, not engine surface).

    Returns a dict to merge into ``get_spark(extra_conf=...)``. Only
    public Hadoop S3A knobs; credentials come from the standard
    provider chain (env vars, instance profile) — never hardcode them:

        spark = get_spark(extra_conf=remote_store_conf())
        df = spark.read.parquet("s3a://my-bucket/payroll/inbound/")
        df2.write.csv("s3a://my-bucket/payroll/outbound/out.csv")
    """
    conf = {
        # Credentials: deliberately NOT configured here — Hadoop's
        # default provider chain (env vars -> profile -> instance
        # metadata) applies when the key is unset, and it works on both
        # AWS SDK v1 and v2 S3A builds (naming a provider class pins an
        # SDK generation: the v1 chain class is absent on Hadoop 3.4+).
        # High-throughput committers: no rename-based commit on object
        # stores (rename is a copy there).
        f"spark.hadoop.fs.{bucket_scheme}.committer.name": "magic",
        "spark.sql.sources.commitProtocolClass": (
            "org.apache.spark.internal.io.cloud.PathOutputCommitProtocol"
        ),
        "spark.sql.parquet.output.committer.class": (
            "org.apache.spark.internal.io.cloud.BindingParquetOutputCommitter"
        ),
        # connection pool sized for wide scans
        f"spark.hadoop.fs.{bucket_scheme}.connection.maximum": "96",
        f"spark.hadoop.fs.{bucket_scheme}.fast.upload": "true",
    }
    if endpoint:  # non-AWS endpoints (MinIO, Ceph, GCS interop)
        conf[f"spark.hadoop.fs.{bucket_scheme}.endpoint"] = endpoint
    if path_style_access:
        conf[f"spark.hadoop.fs.{bucket_scheme}.path.style.access"] = "true"
    return conf
