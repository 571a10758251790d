"""Adversarial scale probe: replicate the corpus N× and time the
dedup/similarity/CC stack.

Answers the would-it-survive-100× question empirically (BASELINE.md
"Scale probe"): every original document gains N-1 near-identical
variants, so each near-dup cluster is a K_N clique — pair OUTPUT grows
~N²/2 per cluster while corpus grows N. An operator whose runtime
tracks candidate OUTPUT (not corpus²) is shaped right for 100 TB; one
that flattens out or explodes super-linearly in the output is not.

Usage:
    python scripts/scale_probe.py FACTOR [op ...]

Replicated parquet is cached under /tmp/scale_probe_<factor>x (reused
across runs). Ops default to the full panel; timings are single-run
(data-bound jobs — the JIT floor is noise at these sizes).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from uofi_payroll_etl_main_demo_spark.session import get_spark

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def build_corpus(spark, factor: int) -> str:
    out = f"/tmp/scale_probe_{factor}x"
    if os.path.exists(f"{out}/_done"):
        return out
    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    emb = spark.read.parquet(f"{BASE}/embeddings.parquet")
    reps = spark.range(factor).select(F.col("id").alias("rep"))
    # near-identical variants: tiny suffix keeps shingle sets ~equal so
    # every original's replica group forms a K_factor near-dup clique
    docs_n = (
        docs.crossJoin(F.broadcast(reps))
        .select(
            (F.col("doc_id") * factor + F.col("rep")).alias("doc_id"),
            F.when(F.col("rep") == 0, F.col("text"))
            .otherwise(F.concat(F.col("text"), F.lit(" v"), F.col("rep")))
            .alias("text"),
            "lang",
            "source",
            "n_chars",
        )
    )
    emb_n = (
        emb.crossJoin(F.broadcast(reps))
        .select(
            (F.col("vec_id") * factor + F.col("rep")).alias("vec_id"),
            # perturb one coordinate by rep-scaled epsilon: cosine to the
            # original stays ~1, so replica groups collide in LSH buckets
            F.transform(
                "embedding",
                lambda x, i: F.when(
                    i == 0, x + F.col("rep").cast("float") * F.lit(1e-4)
                ).otherwise(x),
            ).alias("embedding"),
            "label",
        )
    )
    docs_n.write.mode("overwrite").parquet(f"{out}/documents.parquet")
    emb_n.write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    open(f"{out}/_done", "w").write("ok")
    return out


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    only = set(sys.argv[2:])
    spark = get_spark(app_name=f"scale-probe-{factor}x")
    spark.sparkContext.setLogLevel("ERROR")
    corpus = build_corpus(spark, factor)
    docs = spark.read.parquet(f"{corpus}/documents.parquet")
    emb = spark.read.parquet(f"{corpus}/embeddings.parquet")

    from uofi_payroll_etl_main_demo_spark.ext.clusters import (
        connected_components,
    )
    from uofi_payroll_etl_main_demo_spark.ext.dedup import (
        minhash_near_dup_pairs,
        ngram_jaccard_pairs,
        simhash_near_dup_pairs,
    )
    from uofi_payroll_etl_main_demo_spark.ext.similarity import (
        all_pairs_above_gemm,
    )

    def run(name, thunk):
        if only and name not in only:
            return
        t0 = time.perf_counter()
        n = thunk().count()
        dt = round(time.perf_counter() - t0, 2)
        print(json.dumps({"op": name, "factor": factor, "sec": dt, "rows": n}))
        spark.catalog.clearCache()

    run(
        "minhash_pairs",
        lambda: minhash_near_dup_pairs(
            docs, num_hashes=32, bands=16, k=3, threshold=0.2
        ),
    )
    run(
        "simhash_pairs",
        lambda: simhash_near_dup_pairs(docs, max_hamming=3),
    )
    run(
        "ngram_jaccard",
        lambda: ngram_jaccard_pairs(docs, k=3, threshold=0.2),
    )
    run(
        "gemm_cosine_pairs",
        lambda: all_pairs_above_gemm(
            emb, dim=64, threshold=0.95, n_planes=4
        ),
    )
    run(
        "cc_over_minhash",
        lambda: connected_components(
            minhash_near_dup_pairs(
                docs, num_hashes=32, bands=16, k=3, threshold=0.2
            )
        ),
    )


if __name__ == "__main__":
    main()
