"""IVF-PQ composed store vs its two parents as the corpus grows.

The structural claim the composition exists for: flat PQ must ADC-scan
EVERY code (cost grows with the corpus), IVF-Flat prunes to the probed
lists but reads RAW vectors (~256 B each at dim 64), IVF-PQ prunes to
the probed lists AND reads m small ints per vector. At local[32] the
wall times are floor-dominated (a 128k-row codes table is nothing), so
the probe reports the metrics that DO scale — on-disk bytes per
vector (the compression claim) and the probed-bytes fraction under the
batch's probe union (the pruning claim) — alongside wall time and the
two-stage recall at the probed setting.

Corpus growth is JITTERED replication (each replica perturbs the
first vector element by rep·1e-4): exact replicas would make every
distractor's ADC tie 64-deep and crowd any bounded candidate budget —
a test-data pathology, not a store property (measured on the first
draft of this probe: recall 0.64 → 0.04 from 16× to 64× purely from
tie crowding). The store runs in cosine mode (``normalize=True``) —
the fixture is unit-norm so this is a no-op here, but it is the
production-correct serving mode the registry rows exercise.

Usage:
    python scripts/ivfpq_probe.py [FACTOR ...]

Defaults: factors 1 16 64 over $SPARK_GRAFT_SF_DIR (sf0.1, 2k
vectors). Stores rebuild per factor under /tmp/ivfpq_probe (build
untimed — serving is what's measured); run serially on an idle
machine. Results land in BASELINE.md's round-9 probe tables.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from uofi_payroll_etl_main_demo_spark.ext.ann_index import (
    ivf_index_build,
    ivf_index_load,
    ivfpq_index_build,
    ivfpq_index_load,
    pq_index_build,
    pq_index_load,
)
from uofi_payroll_etl_main_demo_spark.ext.similarity import (
    brute_force_top_k_gemm,
)
from uofi_payroll_etl_main_demo_spark.session import get_spark

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROOT = "/tmp/ivfpq_probe"
N_QUERIES = 100
K = 10
NPROBE = 3



def _tp(spark, idx, table):
    """Epoch-resolved table path (r11 snapshot epochs)."""
    from uofi_payroll_etl_main_demo_spark.ext.ann_index import (
        _data_path,
        _read_meta,
    )

    return _data_path(idx, table, _read_meta(spark, idx))

def _serve(fn) -> float:
    """min-of-2 after one warm run (the bench hygiene)."""
    fn()
    samples = []
    for _ in range(2):
        t0 = time.time()
        fn()
        samples.append(time.time() - t0)
    return round(min(samples), 2)


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def _probed_bytes(table_dir: str, probe_union: "set[int]") -> int:
    total = 0
    for entry in os.listdir(table_dir):
        if not entry.startswith("centroid="):
            continue
        if int(entry.split("=", 1)[1]) in probe_union:
            total += _dir_bytes(os.path.join(table_dir, entry))
    return total


def _probe_union(index, qmat: "np.ndarray", nprobe: int) -> "set[int]":
    """The union of per-query top-nprobe cosine-ranked lists (the
    vectorized rank law both batch serves share)."""
    C = np.asarray(index.centroids, dtype=np.float64)
    qn = np.linalg.norm(qmat, axis=1, keepdims=True)
    cn = np.linalg.norm(C, axis=1, keepdims=True)
    sims = (qmat / np.where(qn != 0, qn, 1.0)) @ (
        C / np.where(cn != 0, cn, 1.0)
    ).T
    order = np.argsort(-sims, axis=1, kind="stable")[:, :nprobe]
    return {int(c) for row in order for c in row}


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 16, 64]
    spark = get_spark(app_name="ivfpq_probe")
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet(os.path.join(BASE, "embeddings.parquet"))
    n0 = base.count()
    out = []
    for factor in factors:
        emb = base
        if factor > 1:
            reps = spark.range(factor).select(F.col("id").alias("__rep"))
            emb = emb.crossJoin(reps).select(
                (F.col("vec_id") + F.col("__rep") * (n0 * 10)).alias(
                    "vec_id"
                ),
                F.concat(
                    F.array(
                        F.element_at("embedding", 1).cast("double")
                        + F.col("__rep").cast("double") * 1e-4
                    ),
                    F.slice(
                        F.transform(
                            F.col("embedding"), lambda x: x.cast("double")
                        ),
                        2,
                        10_000,
                    ),
                ).alias("embedding"),
                "label",
            )
        emb = emb.persist()
        n = emb.count()
        n_lists = max(8, int(round(math.sqrt(n))))
        shutil.rmtree(ROOT, ignore_errors=True)
        ivf_dir, pq_dir, ivfpq_dir = (
            f"{ROOT}/ivf",
            f"{ROOT}/pq",
            f"{ROOT}/ivfpq",
        )
        ivf_index_build(emb, ivf_dir, n_centroids=n_lists, corpus_tag="p")
        pq_index_build(emb, pq_dir, m=8, n_centroids=16, corpus_tag="p")
        ivfpq_index_build(
            emb, ivfpq_dir, n_lists=n_lists, m=8, n_centroids=16,
            corpus_tag="p", normalize=True,
        )
        ivf = ivf_index_load(spark, ivf_dir)
        pq = pq_index_load(spark, pq_dir)
        ivfpq = ivfpq_index_load(spark, ivfpq_dir)
        queries = base.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qvec"),
        )
        queries = queries.persist()
        qmat = np.stack(
            [
                np.asarray(r["qvec"], dtype=np.float64)
                for r in queries.collect()
            ]
        )

        t_pq = _serve(
            lambda: pq.search_batch(
                queries, k=K, candidates=50
            ).write.format("noop").mode("overwrite").save()
        )
        t_ivf = _serve(
            lambda: ivf.search_batch_gemm(
                queries, k=K, nprobe=NPROBE
            ).write.format("noop").mode("overwrite").save()
        )
        t_ivfpq = _serve(
            lambda: ivfpq.search_batch(
                queries, k=K, nprobe=NPROBE, candidates=50
            ).write.format("noop").mode("overwrite").save()
        )

        # the metrics that DO scale: bytes per vector on disk, and the
        # fraction of the store the batch's probe union has to read
        union = _probe_union(ivfpq, qmat, NPROBE)
        ivf_bytes = _dir_bytes(_tp(spark, ivf_dir, "assigned"))
        pq_bytes = _dir_bytes(_tp(spark, pq_dir, "codes"))
        ivfpq_bytes = _dir_bytes(_tp(spark, ivfpq_dir, "codes"))
        probed = _probed_bytes(_tp(spark, ivfpq_dir, "codes"), union)
        union_ivf = _probe_union(ivf, qmat, NPROBE)
        probed_ivf = _probed_bytes(_tp(spark, ivf_dir, "assigned"), union_ivf)

        # quality context: two-stage IVF-PQ recall@10 at the probed
        # setting vs exact, on a 10-query sample
        sample_ids = [
            r["query_id"] for r in queries.limit(10).collect()
        ]
        got = ivfpq.search_batch(
            queries.filter(F.col("query_id").isin(sample_ids)),
            k=K,
            nprobe=NPROBE,
            candidates=50,
            rerank_corpus=emb,
        ).collect()
        by_q: dict[int, set] = {}
        for r in got:
            by_q.setdefault(r["query_id"], set()).add(r["vec_id"])
        hits = total = 0
        for qid in sample_ids:
            qv = [
                float(x)
                for x in base.filter(F.col("vec_id") == qid)
                .select("embedding")
                .collect()[0][0]
            ]
            truth = {
                r["vec_id"]
                for r in brute_force_top_k_gemm(emb, qv, k=K).collect()
            }
            hits += len(by_q.get(qid, set()) & truth)
            total += K
        rec = round(hits / total, 3)

        row = {
            "factor": factor,
            "corpus": n,
            "n_lists": n_lists,
            "nprobe": NPROBE,
            "flat_pq_s": t_pq,
            "ivf_flat_gemm_s": t_ivf,
            "ivfpq_s": t_ivfpq,
            "ivf_flat_bytes_per_vec": round(ivf_bytes / n, 1),
            "flat_pq_bytes_per_vec": round(pq_bytes / n, 1),
            "ivfpq_bytes_per_vec": round(ivfpq_bytes / n, 1),
            "flat_pq_read_frac": 1.0,
            "ivfpq_read_frac": round(probed / ivfpq_bytes, 4),
            "ivf_flat_read_frac": round(probed_ivf / ivf_bytes, 4),
            "ivfpq_recall@10": rec,
        }
        out.append(row)
        print(json.dumps(row), flush=True)
        emb.unpersist()
        queries.unpersist()
    print(json.dumps({"probe": "ivfpq_vs_parents", "rows": out}))


if __name__ == "__main__":
    main()
