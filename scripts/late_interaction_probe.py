"""Late-interaction MaxSim: store-served vs brute-force pooling.

The ColBERT serving question: per-query-vector candidate generation
from the IVF-PQ passage store (bounded nprobe + per-vector k) vs the
exact broadcast-cross pooling, at growing corpus size. Measures
serving wall, the read fraction the probe pruning buys, and top-k
recall of the approximate MaxSim against the exact ranking.

Usage:
    python scripts/late_interaction_probe.py [FACTOR ...]

FACTOR replicates the passage corpus (docs re-keyed per replica) to
show the scale curve: the exact engine is linear in passages, the
served engine tracks batch × probed-list rows. Defaults: 1 4 16.
Stores live under /tmp/late_interaction_probe (rebuilt per factor,
build untimed). Run idle; one warm serve per engine first.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from uofi_payroll_etl_main_demo_spark.ext.ann_index import (
    ensure_ivfpq_index,
)
from uofi_payroll_etl_main_demo_spark.ext.late_interaction import (
    chunk_bow_vectors,
    maxsim_topk,
    maxsim_topk_index,
)
from uofi_payroll_etl_main_demo_spark.session import get_spark

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROOT = "/tmp/late_interaction_probe"
K = 10


def _timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return out, round(time.perf_counter() - t0, 3)


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 4, 16]
    spark = get_spark(
        app_name="li-probe",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(ROOT, ignore_errors=True)

    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    pv0 = chunk_bow_vectors(docs)
    qv = (
        pv0.filter(F.col("doc_id") < 3)
        .select(
            F.col("doc_id").alias("query_id"),
            F.col("chunk_idx").alias("qvec_idx"),
            F.col("v").alias("qv"),
        )
        .localCheckpoint(eager=True)
    )
    base_dv = pv0.filter(F.col("doc_id") >= 3).localCheckpoint(eager=True)
    n_docs = base_dv.select("doc_id").distinct().count()

    print(f"{'factor':>6} {'passages':>9} {'exact_s':>8} "
          f"{'served_s':>9} {'recall@10':>10}")
    for factor in factors:
        reps = spark.range(factor).select(
            F.col("id").alias("__rep")
        )
        dv = (
            base_dv.crossJoin(F.broadcast(reps))
            .select(
                (F.col("doc_id") + F.col("__rep") * (n_docs + 4))
                .cast("long")
                .alias("doc_id"),
                "chunk_idx",
                "v",
            )
            .localCheckpoint(eager=True)
        )
        n_passages = dv.count()
        packed = dv.select(
            (F.col("doc_id") * 4096 + F.col("chunk_idx"))
            .cast("long")
            .alias("vec_id"),
            "v",
        )
        idx = f"{ROOT}/ivfpq_f{factor}"
        index = ensure_ivfpq_index(
            packed, idx, corpus_tag=f"f{factor}", n_lists=8, m=8,
            n_centroids=16, vec_col="v",
        )
        # warm both engines once (JIT/codegen), untimed
        maxsim_topk(dv, qv, k=K).write.format("noop").mode(
            "overwrite"
        ).save()
        maxsim_topk_index(
            index, qv, k=K, per_vector_k=32, nprobe=2,
            rerank_corpus=packed, qtok_mod=4096,
        ).write.format("noop").mode("overwrite").save()

        exact, t_exact = _timed(
            lambda: {
                (r["query_id"], r["doc_id"])
                for r in maxsim_topk(dv, qv, k=K).collect()
            }
        )
        for nprobe, pvk in ((2, 32), (4, 128)):
            served, t_served = _timed(
                lambda: {
                    (r["query_id"], r["doc_id"])
                    for r in maxsim_topk_index(
                        index, qv, k=K, per_vector_k=pvk, nprobe=nprobe,
                        rerank_corpus=packed, qtok_mod=4096,
                    ).collect()
                }
            )
            recall = len(exact & served) / len(exact)
            print(f"{factor:>6} {n_passages:>9} {t_exact:>8.3f} "
                  f"{t_served:>9.3f} {recall:>10.3f}"
                  f"   (nprobe={nprobe}, per_vector_k={pvk})")


if __name__ == "__main__":
    main()
