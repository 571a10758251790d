"""Batched ANN serving vs the one-job-per-query loop.

The shape a retrieval / hard-negative-mining pipeline needs: N query
vectors answered in ONE Spark job (broadcast probe pairs onto the
partitioned inverted lists + one query_id exchange) instead of N
scheduled jobs. This probe measures the per-query cost collapse on
both persisted index engines, optionally with the corpus replicated
FACTOR× to show the law holds as the store grows.

Usage:
    python scripts/ann_batch_probe.py [N_QUERIES] [FACTOR]

Defaults: 100 queries, factor 1, corpus from $SPARK_GRAFT_SF_DIR
(sf0.1). Stores live under /tmp/ann_batch_probe (rebuilt per run,
build time untimed — serving is what's being measured). Run serially
on an idle machine; a warm single query runs first on each engine so
neither side pays the cold-JVM first-job cost (recorded bench
hygiene).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from uofi_payroll_etl_main_demo_spark.ext.ann_index import (
    ivf_index_build,
    ivf_index_load,
    pq_index_build,
    pq_index_load,
)
from uofi_payroll_etl_main_demo_spark.session import get_spark

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROOT = "/tmp/ann_batch_probe"


def _timed(fn):
    t0 = time.time()
    fn()
    return round(time.time() - t0, 2)


def main() -> None:
    n_queries = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    spark = get_spark(app_name="ann_batch_probe")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(os.path.join(BASE, "embeddings.parquet"))
    if factor > 1:
        reps = spark.range(factor).select(F.col("id").alias("__rep"))
        n0 = emb.count()
        emb = (
            emb.crossJoin(reps)
            .select(
                (F.col("vec_id") + F.col("__rep") * (n0 * 10)).alias(
                    "vec_id"
                ),
                "embedding",
                "label",
            )
        )
        emb = emb.persist()
        emb.count()
    shutil.rmtree(ROOT, ignore_errors=True)
    ivf_dir, pq_dir = f"{ROOT}/ivf", f"{ROOT}/pq"
    ivf_index_build(emb, ivf_dir, n_centroids=8, corpus_tag="probe")
    pq_index_build(emb, pq_dir, m=8, n_centroids=16, corpus_tag="probe")
    ivf = ivf_index_load(spark, ivf_dir)
    pq = pq_index_load(spark, pq_dir)

    qrows = (
        emb.filter(F.col("vec_id") < n_queries)
        .select("vec_id", "embedding")
        .collect()
    )
    queries = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )

    out = {"n_queries": len(qrows), "factor": factor, "base": BASE}

    # warm both engines (cold-JVM first-probe bias — recorded lesson)
    ivf.search(list(qrows[0]["embedding"]), k=5, nprobe=3).collect()
    pq.search(list(qrows[0]["embedding"]), k=5, candidates=50).collect()

    def ivf_loop():
        for r in qrows:
            ivf.search(list(r["embedding"]), k=5, nprobe=3).collect()

    def ivf_batch():
        ivf.search_batch(queries, k=5, nprobe=3).collect()

    out["ivf_loop_s"] = _timed(ivf_loop)
    out["ivf_batch_s"] = _timed(ivf_batch)

    def pq_loop():
        for r in qrows:
            pq.search(list(r["embedding"]), k=5, candidates=50).collect()

    def pq_batch():
        pq.search_batch(queries, k=5, candidates=50).collect()

    out["pq_loop_s"] = _timed(pq_loop)
    out["pq_batch_s"] = _timed(pq_batch)

    out["ivf_speedup"] = round(out["ivf_loop_s"] / max(out["ivf_batch_s"], 1e-9), 1)
    out["pq_speedup"] = round(out["pq_loop_s"] / max(out["pq_batch_s"], 1e-9), 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
