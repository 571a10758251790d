"""PQ codebook drift: error growth under drifted adds, recovery by retrain.

The PQ add path encodes new vectors against FROZEN codebooks, so
distribution drift silently grows ADC quantization error with no
query-time symptom. This probe measures the full maintenance story on
a real store: build on the corpus, add an out-of-distribution batch
(affine-warped copies — every subvector lands far from any build-time
centroid), read the per-(batch, subspace) error panel
(``pq_index_drift_stats``), fire the ``needs_retrain`` law, retrain
(``pq_index_retrain``), and record ADC shortlist recall for a query in
the drifted region before/after — recall against the exact
inner-product top-10 (the metric ADC approximates), shortlist = the
candidates the rerank stage would consume.

Usage:
    python scripts/pq_drift_probe.py [FACTOR]

Defaults: corpus from $SPARK_GRAFT_SF_DIR (sf0.1), factor 1 (corpus
replicated FACTOR× to show the panel/retrain costs scale with the
store). Store lives under /tmp/pq_drift_probe (rebuilt per run). Run
serially on an idle machine.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from uofi_payroll_etl_main_demo_spark.ext.ann_index import (
    needs_retrain,
    pq_index_add,
    pq_index_build,
    pq_index_drift_stats,
    pq_index_load,
    pq_index_retrain,
)
from uofi_payroll_etl_main_demo_spark.session import get_spark

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROOT = "/tmp/pq_drift_probe"
QV = [((i * 37) % 19 - 9) / 10.0 for i in range(64)]


def _timed(fn):
    t0 = time.time()
    r = fn()
    return r, round(time.time() - t0, 2)


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    spark = get_spark(app_name="pq_drift_probe")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(os.path.join(BASE, "embeddings.parquet")).select(
        "vec_id", "embedding"
    )
    if factor > 1:
        n0 = emb.count()
        reps = spark.range(factor).select(F.col("id").alias("__rep"))
        emb = (
            emb.crossJoin(reps)
            .select(
                (F.col("vec_id") + F.col("__rep") * (n0 * 10)).alias(
                    "vec_id"
                ),
                "embedding",
            )
            .persist()
        )
        emb.count()
    drift = emb.select(
        (F.col("vec_id") + 100_000_000).alias("vec_id"),
        F.transform(
            "embedding", lambda x: x.cast("double") * 4.0 + 3.0
        )
        .cast("array<float>")
        .alias("embedding"),
    )
    union = emb.unionByName(drift).persist()
    n_union = union.count()

    shutil.rmtree(ROOT, ignore_errors=True)
    pq_dir = f"{ROOT}/pq"
    out = {"factor": factor, "base": BASE, "n_vectors": n_union}

    _, out["build_s"] = _timed(
        lambda: pq_index_build(
            emb, pq_dir, m=8, n_centroids=16, corpus_tag="probe"
        )
    )
    _, out["add_s"] = _timed(
        lambda: pq_index_add(
            drift, pq_dir, new_corpus_tag="drifted", batch_id="b1"
        )
    )

    panel, out["panel_s"] = _timed(
        lambda: pq_index_drift_stats(spark, pq_dir, union).collect()
    )
    tot = {}
    for r in panel:
        acc = tot.setdefault(r["batch"], [0.0, 0.0])
        acc[0] += r["n_vectors"]
        acc[1] += r["mse"] * r["n_vectors"]
    out["mse_base"] = round(tot["base"][1] / tot["base"][0], 4)
    out["mse_drifted"] = round(tot["b1"][1] / tot["b1"][0], 4)
    out["needs_retrain"] = needs_retrain(panel, max_ratio=2.0)

    # exact inner-product top-10 for a drifted-region query; only
    # meaningful at factor 1 — replication plants FACTOR identical
    # copies of every vector, so the exact top-10 is an arbitrary pick
    # among ties and shortlist recall stops measuring codebook quality
    # (the error panel is the scale meter)
    qd = [x * 4.0 + 3.0 for x in QV]
    if factor == 1:
        urows = union.collect()
        uids = np.array([r["vec_id"] for r in urows])
        umat = np.stack(
            [np.asarray(r["embedding"], dtype=np.float64) for r in urows]
        )
        want = set(uids[np.argsort(-(umat @ np.asarray(qd)))[:10]].tolist())

        def recall():
            got = {
                r["vec_id"]
                for r in pq_index_load(spark, pq_dir)
                .search(qd, k=100, candidates=100)
                .collect()
            }
            return len(got & want) / 10.0

    else:

        def recall():
            return None

    out["recall_before"] = recall()
    _, out["retrain_s"] = _timed(
        lambda: pq_index_retrain(
            spark,
            pq_dir,
            union,
            new_corpus_tag="retrained",
            train_sample=1000,
        )
    )
    out["recall_after"] = recall()
    panel2 = pq_index_drift_stats(spark, pq_dir, union).collect()
    tot2_n = sum(r["n_vectors"] for r in panel2)
    tot2_se = sum(r["mse"] * r["n_vectors"] for r in panel2)
    out["mse_after_retrain"] = round(tot2_se / tot2_n, 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
