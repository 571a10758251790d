"""Index DELETE cost at scale: what does a takedown actually cost?

Builds the CDC and MinHash stores over the sf documents replicated
FACTOR× (fresh ids per replica), deletes 1% of the documents, and
reports: delete wall time (the staged rewrite of the whole store —
the documented trade for keeping the SERVING path free of per-query
tombstone anti-joins), query wall before/after (must be flat: the
store shrank), and for CDC the owners-refcount arithmetic's effect
(hashes removed vs hashes the deleted docs held — shared chunks
survive).

Usage:
    python scripts/index_delete_probe.py [FACTOR]

Stores live under /tmp/index_delete_probe_<factor>x (rebuilt every
run — the probe times the lifecycle ops themselves).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from uofi_payroll_etl_main_demo_spark.ext.cdc_index import (
    cdc_index_build,
    cdc_index_delete,
    cdc_index_load,
)
from uofi_payroll_etl_main_demo_spark.ext.dedup_index import (
    minhash_index_build,
    minhash_index_delete,
    minhash_index_load,
)
from uofi_payroll_etl_main_demo_spark.session import get_spark

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _timed(fn):
    t0 = time.time()
    out = fn()
    return round(time.time() - t0, 2), out


def main(factor: int) -> None:
    spark = get_spark(master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', 8)}]")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{BASE}/documents.parquet").select(
        "doc_id", "text"
    )
    reps = spark.range(factor).select(F.col("id").alias("rep"))
    corpus = docs.crossJoin(F.broadcast(reps)).select(
        (F.col("doc_id") * factor + F.col("rep")).alias("doc_id"), "text"
    )
    n = corpus.count()
    dead = corpus.filter(F.col("doc_id") % 100 == 7).select("doc_id")
    n_dead = dead.count()
    batch = docs.limit(500)
    root = f"/tmp/index_delete_probe_{factor}x"
    shutil.rmtree(root, ignore_errors=True)
    out = {"factor": factor, "docs": n, "deleted": n_dead}

    cdx = f"{root}/cdc"
    build_s, _ = _timed(lambda: cdc_index_build(corpus, cdx, corpus_tag="v1"))
    idx = cdc_index_load(spark, cdx)
    idx.query(batch).collect()  # warm
    q_before, rows_before = _timed(lambda: idx.query(batch).collect())
    hashes_before = spark.read.parquet(f"{cdx}/chunks").count()
    del_s, _ = _timed(
        lambda: cdc_index_delete(spark, cdx, dead, new_corpus_tag="v2")
    )
    idx = cdc_index_load(spark, cdx)
    q_after, rows_after = _timed(lambda: idx.query(batch).collect())
    hashes_after = spark.read.parquet(f"{cdx}/chunks").count()
    out["cdc"] = {
        "build_sec": build_s,
        "delete_sec": del_s,
        "query_before_sec": q_before,
        "query_after_sec": q_after,
        "hashes_before": hashes_before,
        "hashes_after": hashes_after,
        # replicated corpora share almost every chunk across replicas,
        # so the refcount law should remove close to NOTHING — the
        # shared-chunk survival story, measured
        "hashes_removed": hashes_before - hashes_after,
        "rows_stable": len(rows_before) == len(rows_after),
    }

    mh = f"{root}/mh"
    params = dict(num_hashes=32, bands=16, k=3, hash_family="portable")
    build_s, _ = _timed(
        lambda: minhash_index_build(corpus, mh, corpus_tag="v1", **params)
    )
    midx = minhash_index_load(spark, mh)
    probe = docs.limit(200).select(
        (F.col("doc_id") + 90_000_000).alias("doc_id"), "text"
    )
    midx.query(probe, threshold=0.2).collect()  # warm
    q_before, _ = _timed(
        lambda: midx.query(probe, threshold=0.2).collect()
    )
    del_s, _ = _timed(
        lambda: minhash_index_delete(spark, mh, dead, new_corpus_tag="v2")
    )
    midx = minhash_index_load(spark, mh)
    q_after, _ = _timed(lambda: midx.query(probe, threshold=0.2).collect())
    out["minhash"] = {
        "build_sec": build_s,
        "delete_sec": del_s,
        "query_before_sec": q_before,
        "query_after_sec": q_after,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
