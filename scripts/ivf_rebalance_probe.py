"""IVF rebalance probe: does splitting a skewed list recover serving
time?

Adds-forever drift in one shot: build a balanced IVF index over the
sf embeddings replicated FACTOR×, then add a skew batch (SKEW× the
corpus size, all within a tiny jitter of one vector) — every added
row lands in ONE frozen list. A fixed-nprobe query whose probe ranks
that list first now scans list_size ≈ corpus-size rows instead of
corpus/n_lists. ``ivf_index_rebalance`` splits the hot list into
sub-centroids trained on its own vectors; the same query afterwards
scans only the sub-list nearest the query. Reported per phase:
list-balance stats (max/mean), hot-path query wall time (median of 3),
and result identity at full probe (rebalance must not change the
exact answer set).

Usage:
    python scripts/ivf_rebalance_probe.py [FACTOR] [SKEW]

Index dirs live under /tmp/ivf_rebal_probe_<factor>x<skew> (rebuilt
every run — the probe times maintenance, so caching would defeat it).
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from uofi_payroll_etl_main_demo_spark.ext.ann_index import (
    ivf_index_add,
    ivf_index_build,
    ivf_index_load,
    ivf_index_rebalance,
    needs_rebalance,
)
from uofi_payroll_etl_main_demo_spark.session import get_spark

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")



def _tp(spark, idx, table):
    """Epoch-resolved table path (r11 snapshot epochs)."""
    from uofi_payroll_etl_main_demo_spark.ext.ann_index import (
        _data_path,
        _read_meta,
    )

    return _data_path(idx, table, _read_meta(spark, idx))

def _stats(spark, idx):
    rows = (
        spark.read.parquet(_tp(spark, idx, "assigned"))
        .groupBy("centroid")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
        .collect()
    )
    sizes = [r["n_vectors"] for r in rows]
    return {
        "lists": len(sizes),
        "max": max(sizes),
        "mean": round(sum(sizes) / len(sizes), 1),
        "ratio": round(max(sizes) / (sum(sizes) / len(sizes)), 2),
    }


def _qtime(index, qv, nprobe, reps=3):
    index.search(qv, k=10, nprobe=nprobe).collect()  # warm (JVM/codegen)
    times = []
    for _ in range(reps):
        t0 = time.time()
        index.search(qv, k=10, nprobe=nprobe).collect()
        times.append(time.time() - t0)
    return round(statistics.median(times), 3)


def main(factor: int, skew: int) -> None:
    spark = get_spark(master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', 8)}]")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{BASE}/embeddings.parquet")
    reps = spark.range(factor).select(F.col("id").alias("rep"))
    corpus = emb.crossJoin(F.broadcast(reps)).select(
        (F.col("vec_id") * factor + F.col("rep")).alias("vec_id"),
        "embedding",
    )
    n = corpus.count()
    v0 = [float(x) for x in emb.filter(F.col("vec_id") == 0)
          .select("embedding").first()[0]]
    # the query vector sits AT the skew target: its nearest list is
    # the one the adds bloat, the worst-served query after drift
    qv = v0
    # a TIGHT CLUSTER around v0 (±0.05 per element, deterministic) —
    # one list swallows it all, but the region has real spread, so
    # sub-centroids CAN carve it (a literal point mass is unsplittable
    # by any spatial method; real drift is a region, not a point)
    skew_batch = spark.range(n * skew).select(
        (F.col("id") + 10_000_000).alias("vec_id"),
        F.transform(
            F.array(*[F.lit(x) for x in v0]),
            lambda x, j: (
                x
                + ((F.col("id") * 31 + j * 17) % 997 - 498).cast("double")
                * 1e-4
            ).cast("float"),
        ).alias("embedding"),
    )
    idx = f"/tmp/ivf_rebal_probe_{factor}x{skew}"
    shutil.rmtree(idx, ignore_errors=True)

    ivf_index_build(corpus, idx, n_centroids=8, corpus_tag="base")
    index = ivf_index_load(spark, idx)
    out = {"factor": factor, "skew": skew, "corpus": n}
    out["before_add"] = {
        "stats": _stats(spark, idx),
        "q_nprobe1_sec": _qtime(index, qv, 1),
    }
    ivf_index_add(skew_batch, idx, new_corpus_tag="skewed", batch_id="b1")
    index = ivf_index_load(spark, idx)
    st = _stats(spark, idx)
    out["after_skew_add"] = {
        "stats": st,
        "q_nprobe1_sec": _qtime(index, qv, 1),
        "hot_lists": needs_rebalance(
            spark.read.parquet(_tp(spark, idx, "assigned"))
            .groupBy("centroid")
            .agg(F.count(F.lit(1)).alias("n_vectors"))
            .collect()
        ),
    }
    full_before = [
        (r["vec_id"], round(r["score"], 9))
        for r in index.search(qv, k=10, nprobe=st["lists"]).collect()
    ]
    t0 = time.time()
    split = ivf_index_rebalance(spark, idx)
    rebal_sec = round(time.time() - t0, 2)
    index = ivf_index_load(spark, idx)
    st2 = _stats(spark, idx)
    full_after = [
        (r["vec_id"], round(r["score"], 9))
        for r in index.search(qv, k=10, nprobe=st2["lists"]).collect()
    ]
    out["after_rebalance"] = {
        "stats": st2,
        "q_nprobe1_sec": _qtime(index, qv, 1),
        "split_lists": split,
        "rebalance_sec": rebal_sec,
        "full_probe_identical": full_after == full_before,
    }
    assert full_after == full_before, "rebalance changed the exact answer"
    print(json.dumps(out))


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 4,
        int(sys.argv[2]) if len(sys.argv) > 2 else 4,
    )
