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
        if not os.path.exists(f"{out}/events.parquet"):
            _build_events(spark, factor, out)  # cache from before events
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
    _build_events(spark, factor, out)
    open(f"{out}/_done", "w").write("ok")
    return out


def _build_events(spark, factor: int, out: str) -> None:
    # relational/streaming spine corpus: user population scales with N
    # (per-user event counts constant, so sessionization/as-of OUTPUT
    # grows ~N — linear, the shape a growing event log actually has);
    # event_type keeps its natural skew for the salted-agg probe
    ev = spark.read.parquet(f"{BASE}/events.parquet")
    reps = spark.range(factor).select(F.col("id").alias("rep"))
    ev_n = ev.crossJoin(F.broadcast(reps)).select(
        (F.col("event_id") * factor + F.col("rep")).alias("event_id"),
        (F.col("user_id") * factor + F.col("rep")).alias("user_id"),
        "event_type",
        "ts",
        "value",
    )
    ev_n.write.mode("overwrite").parquet(f"{out}/events.parquet")


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
    # capped variant: at >=128x the replica cliques put thousands of
    # near-identical signatures in single pigeonhole buckets — the
    # mega-bucket regime the skew valve exists for (uncapped, the
    # in-bucket expansion exhausts a single host's memory)
    run(
        "simhash_pairs_capped",
        lambda: simhash_near_dup_pairs(
            docs, max_hamming=3, max_bucket_size=2000
        ),
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
    # star-contraction CC over the same edges (round 6, VERDICT #7):
    # large-star/small-star alternation — which variant wins at probe
    # scale decides dedup_survivors' adaptive switch
    from uofi_payroll_etl_main_demo_spark.ext.clusters import (
        connected_components_star,
    )

    run(
        "cc_star_over_minhash",
        lambda: connected_components_star(
            minhash_near_dup_pairs(
                docs, num_hashes=32, bands=16, k=3, threshold=0.2
            )
        ),
    )

    # content-defined chunking (round 6): per-doc numpy, no shuffle —
    # wall must track corpus size linearly
    from uofi_payroll_etl_main_demo_spark.ext.cdc import (
        cdc_chunks,
        substring_dedup_spans,
    )

    run("cdc_chunks", lambda: cdc_chunks(docs))
    # exact substring dedup (round 6): the replica corpus is the
    # ADVERSARIAL case — every doc is near-identical to factor-1
    # others, so ~every gram is duplicated, hits ≈ all grams, and the
    # dup side is too big for AQE to broadcast (sort-merge fallback).
    # Honest worst case: output-bound, like the minhash cliques.
    run(
        "substring_dedup_spans",
        lambda: substring_dedup_spans(docs, width=40),
    )

    # corpus rewrite (round 5): output rows stay = n_docs; work is one
    # window + one groupBy over the chunk explode — linear by shape
    from uofi_payroll_etl_main_demo_spark.ext.textstats import (
        chunk_dedup_rewrite,
    )

    run(
        "chunk_dedup_rewrite",
        lambda: chunk_dedup_rewrite(docs, size=32),
    )

    # hostile-input rewrite (round 6): multi-MB single-LINE documents —
    # each is ONE unsplittable multi-MB token/chunk — mixed into the
    # corpus; max_chunk_bytes quarantines them before any wide stage,
    # so rows = n_docs (hostile ids excluded) and the wall must stay at
    # the clean run's, not balloon on oversized shuffle blocks
    def _hostile_rewrite():
        hostile = spark.range(16).select(
            (F.col("id") + 10_000_000).alias("doc_id"),
            F.concat(
                F.format_string("h%d", F.col("id")),
                F.repeat(F.lit("x"), 4_000_000),
            ).alias("text"),
        )
        mixed = docs.select("doc_id", "text").unionByName(hostile)
        return chunk_dedup_rewrite(mixed, size=32, max_chunk_bytes=65536)

    run("chunk_dedup_rewrite_hostile_capped", _hostile_rewrite)

    # persisted MinHash index (round 6): the CDC claim is that QUERY
    # cost tracks the BATCH, not the corpus — build once per factor
    # (timed separately), then query a FIXED 500-doc batch; across
    # factors the query row should stay near-flat while the corpus
    # (and build) grows linearly
    from uofi_payroll_etl_main_demo_spark.ext.dedup_index import (
        ensure_minhash_index,
        minhash_index_load,
    )

    mh_dir = f"/tmp/scale_probe_mh_{factor}x"
    mh_params = dict(num_hashes=32, bands=16, k=3, hash_family="xxhash64")

    def _probe_batch():
        # THE fixed-size probe batch, shared by every index probe: 500
        # fresh near-dup variants of originals, ids disjoint from every
        # replica id (one builder so the probes can't drift apart)
        return (
            spark.read.parquet(f"{BASE}/documents.parquet")
            .filter(F.col("doc_id") < 500)
            .select(
                (F.col("doc_id") + 1_000_000_000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" probe suffix")).alias("text"),
            )
        )

    def _mh_build():
        ensure_minhash_index(
            docs, mh_dir, corpus_tag=f"probe{factor}", **mh_params
        )
        return docs.sparkSession.read.parquet(f"{mh_dir}/bands")

    def _mh_query():
        return minhash_index_load(spark, mh_dir).query(
            _probe_batch(), threshold=0.2
        )

    run("minhash_index_build", _mh_build)
    run("minhash_index_query_fixed_batch", _mh_query)

    # persisted CDC chunk index (round 7): the containment twin —
    # build materializes the corpus' distinct chunk hashes once;
    # querying a FIXED 500-doc batch should stay near-flat across
    # factors while the inline operator re-chunks the whole corpus
    from uofi_payroll_etl_main_demo_spark.ext.cdc import cdc_containment
    from uofi_payroll_etl_main_demo_spark.ext.cdc_index import (
        cdc_index_load,
        ensure_cdc_index,
    )

    cdc_dir = f"/tmp/scale_probe_cdc_{factor}x"

    run(
        "cdc_index_build",
        lambda: (
            ensure_cdc_index(docs, cdc_dir, corpus_tag=f"probe{factor}"),
            spark.read.parquet(f"{cdc_dir}/chunks"),
        )[1],
    )
    # compaction probe (round 7): build, then 16 incremental adds (one
    # __batch partition each — a fortnight of daily batches), measure
    # the fixed-batch query and the store's file count before/after
    # minhash_index_compact. The claim under test: adds degrade query
    # latency through file-count growth, compaction restores it with
    # results identical.
    def _mh_compact_probe():
        import glob
        import shutil
        import time as _t

        from uofi_payroll_etl_main_demo_spark.ext.dedup_index import (
            minhash_index_build,
            minhash_index_add,
            minhash_index_compact,
            minhash_index_load,
        )

        d = f"/tmp/scale_probe_mhc_{factor}x"
        shutil.rmtree(d, ignore_errors=True)
        minhash_index_build(
            docs.filter(F.col("doc_id") % 17 == 0), d,
            corpus_tag="c0", **mh_params,
        )
        for i in range(1, 17):
            minhash_index_add(
                docs.filter(F.col("doc_id") % 17 == i), d,
                new_corpus_tag=f"c{i}", batch_id=f"b{i:03d}",
            )
        def files():
            return len(glob.glob(f"{d}/*/**/*.parquet", recursive=True))
        def q():
            t0 = _t.perf_counter()
            pairs = sorted(
                (r["new_id"], r["old_id"], round(r["jaccard"], 9))
                for r in minhash_index_load(spark, d)
                .query(_probe_batch(), threshold=0.2)
                .collect()
            )
            return round(_t.perf_counter() - t0, 2), pairs
        pre_files = files(); pre_t, pre_pairs = q()
        minhash_index_compact(spark, d)
        post_files = files(); post_t, post_pairs = q()
        # VALUE identity, not just count — a fold that dropped one true
        # pair and admitted one spurious pair must fail here
        assert pre_pairs == post_pairs, (len(pre_pairs), len(post_pairs))
        pre_n = len(pre_pairs)
        print(json.dumps({
            "op": "minhash_index_compact_probe", "factor": factor,
            "files_pre": pre_files, "files_post": post_files,
            "query_pre_sec": pre_t, "query_post_sec": post_t,
            "pairs": pre_n,
        }))
        return docs.limit(0)

    if not only or "minhash_index_compact_probe" in only:
        _mh_compact_probe()

    # the filter on a JOIN-derived column defeats Catalyst's outer-join
    # elimination — a bare count() of the containment frame would drop
    # the whole corpus side (unique-key left join) and time nothing
    run(
        "cdc_index_query_fixed_batch",
        lambda: cdc_index_load(spark, cdc_dir)
        .query(_probe_batch())
        .filter(F.col("n_seen") >= 0),
    )
    run(
        "cdc_containment_inline_fixed_batch",
        lambda: cdc_containment(docs, _probe_batch()).filter(
            F.col("n_seen") >= 0
        ),
    )

    # multimodal dedup at scale (round 5): images render EXECUTOR-SIDE
    # (mapInPandas over an id range — no driver materialization), then
    # real PPM decode -> dHash -> pigeonhole Hamming pairs; every even
    # id has a luminance-identical odd twin, so output pairs grow
    # linearly with the corpus (n/2 twins + banding collisions)
    from uofi_payroll_etl_main_demo_spark.ext.dedup import hamming_pairs_64
    from uofi_payroll_etl_main_demo_spark.ext.multimodal import (
        image_dhash,
        render_gradient_images_distributed,
    )

    run(
        "image_dhash_pairs",
        lambda: hamming_pairs_64(
            image_dhash(
                render_gradient_images_distributed(spark, 1250 * factor)
            ),
            "media_id",
            "dhash",
            max_hamming=3,
            max_bucket_size=64,
        ),
    )

    # round 6: the WHT hash rides the same distributed render +
    # signature-agnostic banding — probing that the frequency-domain
    # law costs the same shape as the spatial one
    from uofi_payroll_etl_main_demo_spark.ext.multimodal import image_whash

    run(
        "image_whash_pairs",
        lambda: hamming_pairs_64(
            image_whash(
                render_gradient_images_distributed(spark, 1250 * factor)
            ),
            "media_id",
            "whash",
            max_hamming=3,
            max_bucket_size=64,
        ),
    )

    # -- relational / streaming spine (round-4 extension): the payroll-
    # shaped operators must survive the same scale-up as the dedup stack
    from uofi_payroll_etl_main_demo_spark.io.readers import (
        read_parquet_table,
    )

    events = read_parquet_table(spark, corpus, "events")

    from uofi_payroll_etl_main_demo_spark.operators.skew import (
        two_phase_agg,
    )
    from uofi_payroll_etl_main_demo_spark.operators.temporal import asof_join
    from uofi_payroll_etl_main_demo_spark.streaming.events import sessionize

    def _asof():
        errors = events.filter(F.col("event_type") == "error").select(
            "event_id", "user_id", "ts", "value"
        )
        clicks = events.filter(F.col("event_type") == "click")
        return asof_join(errors, clicks, on="user_id", payload=["value"])

    run("asof_join", _asof)
    run("sessionize", lambda: sessionize(events, gap="30 minutes"))
    run(
        "salted_agg",
        lambda: two_phase_agg(
            events,
            keys=["event_type"],
            aggs={
                "n_events": F.count(F.lit(1)).cast("bigint"),
                "sum_value": F.sum(F.col("value").cast("decimal(18,6)")),
            },
            salt_from=["event_id"],
            n_salts=16,
        ),
    )


if __name__ == "__main__":
    main()
