"""Index-backed hard-negative mining vs the inline LSH miner.

A contrastive trainer mines negatives for a BATCH of anchors (this
epoch's new/refreshed examples), repeatedly. The two costs scale
differently, and that difference — not a single wall number — is what
this probe records:

- inline (ext/similarity.py hard_negative_mining_gemm — the STRONGEST
  inline baseline: per-bucket BLAS, row-identical to the Column form):
  buckets and pair-scores the WHOLE corpus on every call — cost ~
  corpus²/buckets, REGARDLESS of how many anchors the caller wants
  (the LSH join is symmetric; mining for 1k anchors still pays the
  full pair volume).
- index-backed (ext/ann_index.py hard_negative_mining_index): each
  anchor scores only its nprobe probed lists from the persisted store
  — cost ~ anchors × (nprobe/n_lists) × corpus, independent of the
  corpus pair volume, and the store build amortizes across mining
  calls (it is the same store the pipeline already serves from).

The store is built with n_centroids ~ sqrt(corpus) (the standard IVF
sizing; 8 minimum to match the registry fixture), build untimed.

Usage:
    python scripts/hard_negatives_probe.py [FACTOR] [N_ANCHORS] [NPROBE]

Defaults: factor 1, 1000 anchors, nprobe 3. Run serially on an idle
machine; each path runs once warm (the compared quantities differ by
multiples, not percents).
"""

from __future__ import annotations

import json
import math
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
    hard_negative_mining_gemm,
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
    n_anchors = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    nprobe = int(sys.argv[3]) if len(sys.argv) > 3 else 3
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

    n = emb.count()
    n_centroids = max(8, int(math.sqrt(n)))
    shutil.rmtree(ROOT, ignore_errors=True)
    ivf_dir = f"{ROOT}/ivf"
    ivf_index_build(emb, ivf_dir, n_centroids=n_centroids, corpus_tag="probe")
    index = ivf_index_load(spark, ivf_dir)
    anchors = emb.filter(F.col("vec_id") < n_anchors)

    out = {
        "factor": factor,
        "corpus": n,
        "n_anchors": n_anchors,
        "n_centroids": n_centroids,
        "nprobe": nprobe,
        "base": BASE,
    }

    # warm both paths (cold-JVM first-job bias — recorded bench hygiene)
    few = emb.filter(F.col("vec_id") < 5)
    hard_negative_mining_gemm(few, dim=64, k=3, n_planes=4).write.format(
        "noop"
    ).mode("overwrite").save()
    hard_negative_mining_index(
        index, few, emb.select("vec_id", "label"), k=3, nprobe=nprobe
    ).write.format("noop").mode("overwrite").save()

    def inline_pass():
        # the inline miner has no anchor-subset form: mining for the
        # anchor batch pays the full symmetric pair join, then filters
        hard_negative_mining_gemm(emb, dim=64, k=3, n_planes=4).filter(
            F.col("vec_id") < n_anchors
        ).write.format("noop").mode("overwrite").save()

    def index_pass():
        hard_negative_mining_index(
            index, anchors, emb.select("vec_id", "label"), k=3,
            nprobe=nprobe,
        ).write.format("noop").mode("overwrite").save()

    out["inline_s"] = _timed(inline_pass)
    out["index_s"] = _timed(index_pass)
    out["speedup"] = round(out["inline_s"] / max(out["index_s"], 1e-9), 2)
    # the structural quantities the walls follow
    out["inline_pair_budget"] = int(n * n / 16)  # n_planes=4 → 16 buckets
    out["index_pair_budget"] = int(
        n_anchors * n * min(nprobe, n_centroids) / n_centroids
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
