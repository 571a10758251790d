"""Index-backed hard-negative mining vs the inline LSH miner.

A contrastive trainer mines negatives for EVERY anchor in its corpus,
repeatedly (each epoch / each data refresh). The inline miner
(ext/similarity.py hard_negative_mining) re-buckets and re-scores the
whole corpus on every call; the index-backed miner
(ext/ann_index.py hard_negative_mining_index) serves from the
persisted IVF store the pipeline already maintains — each anchor pays
only its probed lists, and the store amortizes across calls.

This probe measures one full-corpus mining pass on both paths at
FACTOR× the sf0.1 corpus (corpus replicated; labels preserved so the
different-label predicate keeps its selectivity). Build time for the
store is untimed — it is the lifecycle's amortized cost, and the
trainer re-mines many times per build.

Usage:
    python scripts/hard_negatives_probe.py [FACTOR] [NPROBE]

Defaults: factor 1, nprobe 3 (of 8 lists). Run serially on an idle
machine; each path runs once warm (min-of-2 would double a long
probe; the compared quantities differ by multiples, not percents).
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
    hard_negative_mining_index,
    ivf_index_build,
    ivf_index_load,
)
from uofi_payroll_etl_main_demo_spark.ext.similarity import (
    hard_negative_mining,
)
from uofi_payroll_etl_main_demo_spark.session import get_spark

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROOT = "/tmp/hard_negatives_probe"


def _timed(fn):
    t0 = time.time()
    fn()
    return round(time.time() - t0, 2)


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    nprobe = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name="hard_negatives_probe")
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
            .persist()
        )
        emb.count()

    shutil.rmtree(ROOT, ignore_errors=True)
    ivf_dir = f"{ROOT}/ivf"
    ivf_index_build(emb, ivf_dir, n_centroids=8, corpus_tag="probe")
    index = ivf_index_load(spark, ivf_dir)

    out = {"factor": factor, "nprobe": nprobe, "base": BASE}
    out["n_anchors"] = emb.count()

    # warm both paths (cold-JVM first-job bias — recorded bench hygiene)
    hard_negative_mining(
        emb.filter(F.col("vec_id") < 5), dim=64, k=3, n_planes=4
    ).write.format("noop").mode("overwrite").save()
    hard_negative_mining_index(
        index,
        emb.filter(F.col("vec_id") < 5),
        emb.select("vec_id", "label"),
        k=3,
        nprobe=nprobe,
    ).write.format("noop").mode("overwrite").save()

    def inline_pass():
        hard_negative_mining(emb, dim=64, k=3, n_planes=4).write.format(
            "noop"
        ).mode("overwrite").save()

    def index_pass():
        hard_negative_mining_index(
            index, emb, emb.select("vec_id", "label"), k=3, nprobe=nprobe
        ).write.format("noop").mode("overwrite").save()

    out["inline_s"] = _timed(inline_pass)
    out["index_s"] = _timed(index_pass)
    out["speedup"] = round(out["inline_s"] / max(out["index_s"], 1e-9), 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
