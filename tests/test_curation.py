"""Curation extensions: decontamination, repetition rules, PII
redaction, TF-IDF/BM25, KNN join, PQ ANN, star connected components."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from uofi_payroll_etl_main_demo_spark.ext.clusters import (
    connected_components,
    connected_components_star,
)
from uofi_payroll_etl_main_demo_spark.ext.curation import (
    bm25_search,
    contamination_report,
    redact_pii,
    repetition_stats,
    tfidf_top_terms,
)
from uofi_payroll_etl_main_demo_spark.ext.similarity import (
    brute_force_top_k,
    knn_join,
    pq_top_k,
)


# ---------------------------- decontamination ----------------------------


def test_contamination_flags_overlapping_doc(spark):
    # eval doc shares a 5-token run with train doc 1; train doc 2 clean
    ev = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    tr = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon unrelated tail words"),
            (2, "totally different content with no shared runs at all"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in contamination_report(tr, ev, k=5, threshold=0.2).collect()
    }
    assert out[1]["n_hit"] >= 1 and out[1]["contaminated"]
    assert out[2]["n_hit"] == 0 and not out[2]["contaminated"]


def test_contamination_short_docs_excluded(spark):
    # docs with fewer than k tokens yield no shingles → no output row
    ev = spark.createDataFrame([(9, "a b c d e")], "doc_id long, text string")
    tr = spark.createDataFrame([(1, "too short")], "doc_id long, text string")
    assert contamination_report(tr, ev, k=5).count() == 0


# ---------------------------- repetition rules ---------------------------


def test_repetition_stats_exact_values(spark):
    # "x x x y": 4 tokens, 2 distinct → dup=2/4; top token x=3/4;
    # 2-grams: [x x, x x, x y] → n=3, distinct=2, dup=1/3, top=2/3
    df = spark.createDataFrame([(1, "x x x y")], "doc_id long, text string")
    r = repetition_stats(df).collect()[0]
    assert r["n_tokens"] == 4
    assert r["dup_token_ppm"] == 500000
    assert r["top_token_ppm"] == 750000
    assert r["dup_2gram_ppm"] == 333333
    assert r["top_2gram_ppm"] == 666666
    assert r["repetitive"]  # top_2gram 0.66 > 0.18


def test_repetition_stats_single_token_doc(spark):
    # one token: no 2-grams → 2-gram ppms null, not errors
    df = spark.createDataFrame([(1, "solo")], "doc_id long, text string")
    r = repetition_stats(df).collect()[0]
    assert r["n_tokens"] == 1
    assert r["dup_2gram_ppm"] is None and r["top_2gram_ppm"] is None


# ------------------------------ PII redaction ----------------------------


def test_redact_pii_patterns(spark):
    rows = spark.createDataFrame(
        [
            (1, "mail jo.doe+x@uni.edu or call 217-555-1234"),
            (2, "ssn 123-45-6789 badge 99887766"),
            (3, "clean"),
        ],
        "id long, t string",
    )
    out = {r["id"]: r for r in redact_pii(rows, ["t"], "id").collect()}
    assert out[1]["t_redacted"] == "mail [EMAIL] or call [PHONE]"
    assert out[1]["n_email"] == 1 and out[1]["n_phone"] == 1
    assert out[2]["t_redacted"] == "ssn [SSN] badge [NUM]"
    assert out[2]["n_ssn"] == 1 and out[2]["n_digit_run"] == 1
    assert out[3]["t_redacted"] == "clean"


def test_redact_pii_ssn_not_double_counted(spark):
    # the SSN must be tagged [SSN], not later re-matched as digit runs
    rows = spark.createDataFrame([(1, "078-05-1120")], "id long, t string")
    r = redact_pii(rows, ["t"], "id").collect()[0]
    assert r["t_redacted"] == "[SSN]"
    assert r["n_ssn"] == 1 and r["n_digit_run"] == 0 and r["n_phone"] == 0


# ------------------------------ TF-IDF / BM25 ----------------------------


def test_tfidf_ranks_rare_term_first(spark):
    df = spark.createDataFrame(
        [
            (1, "common common rare common"),
            (2, "common common common common"),
            (3, "common other other common"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_top_terms(df, top_n=2)
    top1 = {
        r["doc_id"]: r["term"] for r in out.filter("rank = 1").collect()
    }
    # 'rare' (df=1) outranks 'common' (df=3, idf=0) in doc 1
    assert top1[1] == "rare"
    assert top1[3] == "other"


def test_tfidf_n_includes_tokenless_docs(spark):
    """N for idf comes off the persisted tf frame (explode_outer keeps
    empty docs as NULL-term rows) — must still count token-less docs
    like the old df.count() did, with no second corpus scan."""
    df = spark.createDataFrame(
        [(1, "rare common"), (2, "common"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    out = tfidf_top_terms(df, top_n=2)
    rows = {(r["doc_id"], r["term"]): r["rank"] for r in out.collect()}
    # no NULL-term rows leak into the output
    assert all(t is not None for (_, t) in rows)
    # N=4: idf(common)=ln(4/2)>0, so 'common' ranks in doc 2
    # (under N=2 it would be ln(2/2)=0 — tfidf 0 still ranks, but the
    # pin below on doc 1's ordering requires idf(rare)>idf(common)>0)
    assert rows[(1, "rare")] == 1 and rows[(1, "common")] == 2
    assert (2, "common") in rows


def test_bm25_orders_by_relevance(spark):
    df = spark.createDataFrame(
        [
            (1, "spark joins window spark"),
            (2, "spark only once here now"),
            (3, "nothing relevant at all"),
        ],
        "doc_id long, text string",
    )
    out = bm25_search(df, ["spark"], top_n=10).collect()
    ids = [r["doc_id"] for r in out]
    assert ids[0] == 1  # two hits beat one
    assert 3 not in ids  # no hit → no row


# ------------------------------- KNN join --------------------------------


def test_knn_join_zero_planes_is_exact(spark):
    # n_planes=0 → single bucket → the "approximate" join degenerates
    # to exact all-pairs KNN; verify against per-vector brute force
    rng = random.Random(3)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(30)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        (r["vec_id"], r["rank"]): r["neighbor_id"]
        for r in knn_join(emb, dim=8, k=2, n_planes=0).collect()
    }
    import math

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return dot / (na * nb)

    for i, v in rows:
        scored = sorted(
            (
                (round(cos(v, w), 6), -j)
                for j, w in rows
                if j != i
            ),
            reverse=True,
        )
        expect = [-s[1] for s in scored[:2]]
        assert [got[(i, 1)], got[(i, 2)]] == expect


def test_knn_join_gemm_parity(spark):
    # the GEMM registry form must equal the Column reference form
    # exactly (same buckets, same round-6 cosines, same tie-breaks)
    from uofi_payroll_etl_main_demo_spark.ext.similarity import (
        knn_join_gemm,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = sorted(map(tuple, knn_join(emb, dim=64, k=3, n_planes=4).collect()))
    b = sorted(
        map(tuple, knn_join_gemm(emb, dim=64, k=3, n_planes=4).collect())
    )
    assert a == b


def test_knn_join_gemm_bucket_cap(spark):
    # max_bucket_size drops mega-buckets entirely (bounded-recall cap)
    from uofi_payroll_etl_main_demo_spark.ext.similarity import (
        knn_join_gemm,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    capped = knn_join_gemm(
        emb, dim=64, k=3, n_planes=0, max_bucket_size=10
    )
    # n_planes=0 → one bucket of 500 > cap → everything dropped
    assert capped.count() == 0


def test_auto_planes_tracks_corpus_size():
    # planes grow with log2(n/target): in-bucket candidate volume stays
    # ~n·target instead of n²/2^planes at a fixed plane count
    from uofi_payroll_etl_main_demo_spark.ext.similarity import auto_planes

    assert auto_planes(100, target_bucket_size=512) == 2  # floor
    assert auto_planes(512, target_bucket_size=512) == 2
    assert auto_planes(1 << 20, target_bucket_size=512) == 11
    assert auto_planes(1 << 30, target_bucket_size=512) == 21
    assert auto_planes(10**12, target_bucket_size=512) == 24  # cap
    # doubling the corpus adds exactly one plane (bucket count doubles)
    assert (
        auto_planes(2 << 20, target_bucket_size=512)
        == auto_planes(1 << 20, target_bucket_size=512) + 1
    )


def test_knn_join_auto_planes_bounds_skewed_buckets(spark):
    """Skewed corpus: 300 near-identical vectors (one hot LSH bucket)
    + 100 spread vectors. With auto planes + the max_bucket_size valve
    no surviving bucket exceeds the cap — in-bucket candidate volume
    is bounded by cap² per bucket instead of n²/2^planes."""
    from uofi_payroll_etl_main_demo_spark.ext.similarity import (
        _cap_buckets,
        auto_planes,
        random_hyperplane_buckets,
    )

    rng = random.Random(7)
    hot = [
        (i, [1.0 + rng.uniform(-1e-4, 1e-4) for _ in range(8)])
        for i in range(300)
    ]
    spread = [
        (300 + i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(100)
    ]
    emb = spark.createDataFrame(
        hot + spread, "vec_id long, embedding array<double>"
    )
    planes = auto_planes(emb.count(), target_bucket_size=32)
    b = _cap_buckets(
        random_hyperplane_buckets(emb, dim=8, n_planes=planes),
        max_bucket_size=64,
    )
    sizes = [
        r["n"]
        for r in b.groupBy("bucket").agg(F.count(F.lit(1)).alias("n")).collect()
    ]
    assert sizes and max(sizes) <= 64  # hot bucket dropped, rest bounded
    # and the full operator still runs end-to-end with both valves on
    out = knn_join(
        emb, dim=8, k=2, n_planes="auto", target_bucket_size=32,
        max_bucket_size=64,
    )
    assert out.count() > 0
    assert out.groupBy("vec_id").count().agg(F.max("count")).first()[0] <= 2


def test_knn_join_rank_contract(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = knn_join(emb, dim=64, k=3, n_planes=4)
    per = out.groupBy("vec_id").agg(
        F.count(F.lit(1)).alias("n"), F.max("rank").alias("mx")
    )
    bad = per.filter((F.col("n") > 3) | (F.col("mx") > 3)).count()
    assert bad == 0


# --------------------------------- PQ ANN --------------------------------


def test_pq_topk_matches_exact_with_margin(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qv = emb.orderBy("vec_id").first()["embedding"]
    exact = [
        (r["vec_id"], round(r["score"], 6))
        for r in brute_force_top_k(emb, qv, k=5).collect()
    ]
    approx = [
        (r["vec_id"], round(r["score"], 6))
        for r in pq_top_k(emb, qv, k=5, candidates=150).collect()
    ]
    assert approx == exact


def test_pq_requires_divisible_dim(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    with pytest.raises(ValueError, match="not divisible"):
        pq_top_k(emb, [0.0] * 64, m=7)


# ------------------------- star connected components ---------------------


def test_star_cc_matches_label_propagation(spark):
    rng = random.Random(7)
    edges = [
        (rng.randint(0, 199), rng.randint(0, 199)) for _ in range(150)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    edges += [(i, i + 1) for i in range(300, 420)]  # long chain
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    a = {(r["id"], r["comp"]) for r in connected_components(pairs).collect()}
    b = {
        (r["id"], r["comp"])
        for r in connected_components_star(pairs).collect()
    }
    assert a == b


def test_star_cc_adversarial_hub(spark):
    # a hub node connected to everything plus a disjoint pair — the
    # high-degree shape star-contraction is built for
    edges = [(0, i) for i in range(1, 120)] + [(500, 501)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    out = {
        r["id"]: r["comp"]
        for r in connected_components_star(pairs).collect()
    }
    assert all(out[i] == 0 for i in range(120))
    assert out[500] == 500 and out[501] == 500


def test_quality_classifier_orders_prose_over_noise(spark):
    from uofi_payroll_etl_main_demo_spark.ext.curation import (
        quality_classifier,
    )

    rows = [
        (1, "the cat is on the mat and that is a fact of life"),
        (2, "0x1f 0x2e 0x3d 55 ;;; !!! ### 0912 31 7"),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r.asDict() for r in quality_classifier(df).collect()}
    assert out[1]["keep"] and not out[2]["keep"]
    assert out[1]["logit_ppm"] > out[2]["logit_ppm"]
    # empty doc: all-zero features, dropped
    assert out[3]["logit_ppm"] == 0 and not out[3]["keep"]


# ------------------------- Gopher rules / multiprobe -----------------------


def test_gopher_rules_panel(spark):
    from uofi_payroll_etl_main_demo_spark.ext.curation import gopher_rules

    good = (
        "the quick brown fox jumps over that lazy dog and then runs back "
        "to have another go with more words of ordinary prose to satisfy "
        "the minimum word count rule for this panel test which needs at "
        "least fifty whitespace words in total so here are some more "
        "plain words that keep the mean word length inside bounds okay"
    )
    bullets = "- one\n- two\n- three"
    symbols = "### #### ##### ...... ### #### ... ## # ###"
    docs = spark.createDataFrame(
        [(1, good), (2, "too short"), (3, bullets), (4, symbols)],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r.asDict() for r in gopher_rules(docs).collect()}
    assert got[1]["passes"] is True
    assert got[2]["passes"] is False  # word count
    assert got[3]["bullet_line_frac"] == 1.0 and got[3]["passes"] is False
    assert got[4]["symbol_word_ratio"] > 0.1 and got[4]["passes"] is False
    assert got[1]["stopword_hits"] >= 2


def test_knn_multiprobe_recall_dominates_single_probe(spark):
    """Hamming-1 probing can only ADD candidates: for every vector the
    rank-1 cosine under multiprobe >= rank-1 cosine single-probe, and
    hamming=0 reduces exactly to the single-probe join."""
    from uofi_payroll_etl_main_demo_spark.ext.similarity import (
        knn_join,
        knn_join_multiprobe,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    single = {
        (r["vec_id"], r["rank"]): r
        for r in knn_join(emb, dim=64, k=1, n_planes=4).collect()
    }
    multi = {
        (r["vec_id"], r["rank"]): r
        for r in knn_join_multiprobe(
            emb, dim=64, k=1, n_planes=4, multiprobe_hamming=1
        ).collect()
    }
    assert set(single) <= set(multi)  # multiprobe covers every vector
    for key, s in single.items():
        assert multi[key]["cosine"] >= s["cosine"]
    zero = sorted(
        map(
            tuple,
            knn_join_multiprobe(
                emb, dim=64, k=3, n_planes=4, multiprobe_hamming=0
            ).collect(),
        )
    )
    base = sorted(
        map(tuple, knn_join(emb, dim=64, k=3, n_planes=4).collect())
    )
    assert zero == base


def test_multiset_stats_property(spark):
    """Property: _multiset_stats(sorted array) equals collections.Counter
    ground truth for arbitrary token multisets (the boundary-position
    formulation must not miss runs at array edges)."""
    from collections import Counter

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from uofi_payroll_etl_main_demo_spark.ext.curation import _multiset_stats

    @settings(
        max_examples=25,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        st.lists(
            st.sampled_from(["a", "b", "c", "dd", "e f", ""]),
            min_size=0,
            max_size=24,
        )
    )
    def check(tokens):
        df = spark.createDataFrame([(tokens,)], "arr array<string>")
        row = (
            df.select(F.array_sort("arr").alias("s"))
            .select(_multiset_stats(F.col("s")).alias("st"))
            .collect()[0]["st"]
        )
        c = Counter(tokens)
        assert row["n"] == len(tokens)
        assert row["d"] == len(c)
        assert row["m"] == (max(c.values()) if c else 0)

    check()


def test_gopher_rules_property_vs_python_reference(spark):
    """Differential: gopher_rules' Column expressions vs a pure-Python
    mirror over arbitrary small documents (whitespace tokens, newline
    lines, the panel's exact regexes). Catches silent drift between the
    Spark expressions and the documented rule semantics."""
    import re

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from uofi_payroll_etl_main_demo_spark.ext.curation import gopher_rules

    words = st.sampled_from(
        ["the", "fox", "runs", "#", "...", "- item", "a1", "…", "zz", ""]
    )
    texts = st.lists(words, min_size=0, max_size=30).map(" ".join)

    def py_panel(text):
        toks = [t for t in re.split(r"\s+", text.strip())] if text.strip() else []
        lines = text.split("\n")
        n = len(toks)
        out = {
            "n_words": n,
            "mean_word_len": round(sum(len(t) for t in toks) / n, 6)
            if n
            else None,
            "symbol_word_ratio": round(
                (len(re.findall(r"#", text)) + len(re.findall(r"\.\.\.", text)))
                / n,
                6,
            )
            if n
            else None,
            "bullet_line_frac": round(
                sum(bool(re.search(r"^\s*[-*•]", x)) for x in lines)
                / len(lines),
                6,
            ),
            "ellipsis_line_frac": round(
                sum(bool(re.search(r"(\.\.\.|…)\s*$", x)) for x in lines)
                / len(lines),
                6,
            ),
            "alpha_word_frac": round(
                sum(bool(re.search(r"[a-zA-Z]", t)) for t in toks) / n, 6
            )
            if n
            else None,
        }
        return out

    @settings(
        max_examples=20,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(texts)
    def check(text):
        df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
        row = gopher_rules(df).collect()[0].asDict()
        want = py_panel(text)
        for k, v in want.items():
            got = row[k]
            if v is None:
                assert got is None, (k, text, got)
            else:
                assert got == pytest.approx(v, abs=2e-6), (k, text, got, v)

    check()


def test_hybrid_rrf_fusion_law(spark):
    """RRF on constructed lists: a doc in BOTH lists outranks docs in
    one; absent-list legs contribute exactly zero; ties break to the
    lowest id."""
    from uofi_payroll_etl_main_demo_spark.ext.curation import (
        hybrid_rrf_search,
    )

    docs = spark.createDataFrame(
        [
            (1, "spark join window spark join"),  # strong keyword hit
            (2, "spark join"),                    # weaker keyword hit
            (3, "nothing relevant here"),         # keyword miss
            (4, ""),                              # empty
        ],
        "doc_id long, text string",
    )
    # dense leg: doc 2 nearest, then 3; doc 1 far
    emb = spark.createDataFrame(
        [
            (1, [-1.0, 0.0]),
            (2, [1.0, 0.0]),
            (3, [0.8, 0.6]),
            (4, [0.0, -1.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    out = hybrid_rrf_search(
        docs, emb, ["spark", "join", "window"], [1.0, 0.0], k=4,
        top_n_each=2,
    ).collect()
    rows = {r["doc_id"]: r for r in out}
    # doc 2 is in both top-2 lists -> highest fused score
    assert out[0]["doc_id"] == 2
    assert rows[2]["in_bm25"] and rows[2]["in_dense"]
    # doc 1: keyword-only; doc 3: dense-only; both present with one leg
    assert rows[1]["in_bm25"] and not rows[1]["in_dense"]
    assert rows[3]["in_dense"] and not rows[3]["in_bm25"]
    # exact RRF values: rank arithmetic, no score mixing (doc 1 is
    # BM25 rank 1 — more hits; doc 2 is BM25 rank 2, dense rank 1)
    assert abs(rows[2]["rrf"] - (1 / 62 + 1 / 61)) < 1e-12
    assert abs(rows[1]["rrf"] - 1 / 61) < 1e-12
    assert abs(rows[3]["rrf"] - 1 / 62) < 1e-12


def test_hard_negative_mining_gemm_parity(spark):
    # the GEMM mining form must equal the Column reference form exactly
    # (same buckets, label predicate before top-k, same round-6
    # cosines, same tie-breaks — the Column form already ranks on
    # rounded cosines, which IS the GEMM law)
    from uofi_payroll_etl_main_demo_spark.ext.similarity import (
        hard_negative_mining,
        hard_negative_mining_gemm,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = sorted(
        map(tuple, hard_negative_mining(emb, dim=64, k=3, n_planes=4).collect())
    )
    b = sorted(
        map(
            tuple,
            hard_negative_mining_gemm(emb, dim=64, k=3, n_planes=4).collect(),
        )
    )
    assert a == b and a


def test_random_projection_matrix_law_and_determinism(spark):
    # Achlioptas law: entries in {0, +-sqrt(3/out_dim)}, ~1/3 nonzero;
    # seeded matrix + Column projection => identical rows across calls
    import math

    from uofi_payroll_etl_main_demo_spark.ext.similarity import (
        _projection_matrix,
        random_projection,
    )

    R = _projection_matrix(64, 16)
    s = math.sqrt(3.0 / 16)
    flat = [x for row in R for x in row]
    assert set(map(abs, flat)) <= {0.0, s}
    nz = sum(1 for x in flat if x != 0) / len(flat)
    assert 0.2 < nz < 0.5  # E=1/3
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = sorted(map(tuple, random_projection(emb, dim=64, out_dim=16).collect()))
    b = sorted(map(tuple, random_projection(emb, dim=64, out_dim=16).collect()))
    assert a == b
    n = emb.count()
    assert len(a) == n * 16
    # JL sanity on one pair: relative distance distortion bounded
    # loosely (out_dim 16 is aggressive; Achlioptas eps here is wide)
    import numpy as np

    rows = {r["vec_id"]: list(r["embedding"]) for r in emb.limit(3).collect()}
    ids = sorted(rows)[:2]
    proj = {i: [0.0] * 16 for i in ids}
    for vid, j, p in a:
        if vid in proj:
            proj[vid][j] = p
    d_orig = np.linalg.norm(
        np.array(rows[ids[0]], dtype=float) - np.array(rows[ids[1]], dtype=float)
    )
    d_proj = np.linalg.norm(np.array(proj[ids[0]]) - np.array(proj[ids[1]]))
    assert d_orig > 0 and 0.3 < d_proj / d_orig < 1.9


def test_projected_rerank_topk_laws(spark):
    # (1) degenerate coarse (>= corpus) makes the two-stage retrieval
    # exactly the brute force; (2) at a real coarse cut every returned
    # score is the TRUE full-space cosine (rerank is exact) and the
    # deterministic fixture recall is substantial
    from uofi_payroll_etl_main_demo_spark.ext.similarity import (
        brute_force_top_k,
        projected_rerank_top_k,
    )

    QV = [((i * 37) % 19 - 9) / 10.0 for i in range(64)]
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = [
        (r["vec_id"], round(r["score"], 6))
        for r in brute_force_top_k(emb, QV, k=10).collect()
    ]
    degenerate = [
        (r["vec_id"], round(r["score"], 6))
        for r in projected_rerank_top_k(
            emb, QV, dim=64, k=10, coarse=10_000
        ).collect()
    ]
    assert degenerate == exact
    staged = projected_rerank_top_k(emb, QV, dim=64, k=10, coarse=50).collect()
    assert len(staged) == 10
    all_scores = {
        r["vec_id"]: round(r["score"], 6)
        for r in brute_force_top_k(emb, QV, k=10_000).collect()
    }
    for r in staged:
        assert round(r["score"], 6) == all_scores[r["vec_id"]]
    recall = len(
        {r["vec_id"] for r in staged} & {i for i, _ in exact}
    ) / 10
    assert recall >= 0.5, recall


def test_random_projection_gemm_matches_expression(spark):
    # one projection law, two engines: BLAS GEMM rows equal the JVM
    # Column fold rows at the 6dp contract
    from uofi_payroll_etl_main_demo_spark.ext.similarity import (
        random_projection,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = sorted(map(tuple, random_projection(emb, dim=64, out_dim=16).collect()))
    b = sorted(
        map(
            tuple,
            random_projection(
                emb, dim=64, out_dim=16, engine="expression"
            ).collect(),
        )
    )
    assert a == b and len(a) == emb.count() * 16


def test_projected_rerank_engines_agree(spark):
    from uofi_payroll_etl_main_demo_spark.ext.similarity import (
        projected_rerank_top_k,
    )

    QV = [((i * 37) % 19 - 9) / 10.0 for i in range(64)]
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = [
        (r["vec_id"], round(r["score"], 6))
        for r in projected_rerank_top_k(
            emb, QV, dim=64, k=10, coarse=50
        ).collect()
    ]
    b = [
        (r["vec_id"], round(r["score"], 6))
        for r in projected_rerank_top_k(
            emb, QV, dim=64, k=10, coarse=50, engine="expression"
        ).collect()
    ]
    assert a == b and len(a) == 10
