"""Late-interaction (multi-vector MaxSim) retrieval: one law, two
engines.

Pins the contracts the composition exists for:
  1. EXACTNESS — the store-served form at full probe + full margin +
     full per-vector k equals the inline brute-force pooling
     bit-for-bit (the ext_late_interaction_topk oracle checks the same
     law against DuckDB; this pins the two Spark engines against each
     other, including the packed-key round-trip).
  2. APPROXIMATION IS ONE-SIDED — bounding the serve (nprobe /
     per-vector k) can only LOSE pairs, so every approximate per-doc
     score is ≤ its exact score, and scores of docs that do surface
     match the exact pooling's contributions.
  3. SHAPE — per-query top-k bound and (milli DESC, doc ASC) tie
     determinism.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from uofi_payroll_etl_main_demo_spark.ext.ann_index import (
    ensure_ivfpq_index,
)
from uofi_payroll_etl_main_demo_spark.ext.late_interaction import (
    chunk_bow_vectors,
    maxsim_topk,
    maxsim_topk_index,
)

N_QUERY_DOCS = 3


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pv = chunk_bow_vectors(docs)
    qv = (
        pv.filter(F.col("doc_id") < N_QUERY_DOCS)
        .select(
            F.col("doc_id").alias("query_id"),
            F.col("chunk_idx").alias("qvec_idx"),
            F.col("v").alias("qv"),
        )
        .localCheckpoint(eager=True)
    )
    dv = pv.filter(F.col("doc_id") >= N_QUERY_DOCS).localCheckpoint(
        eager=True
    )
    return qv, dv


@pytest.fixture(scope="module")
def store(spark, corpus, tmp_path_factory):
    _qv, dv = corpus
    packed = dv.select(
        (F.col("doc_id") * 4096 + F.col("chunk_idx"))
        .cast("long")
        .alias("vec_id"),
        "v",
    ).localCheckpoint(eager=True)
    idx = str(tmp_path_factory.mktemp("li") / "ivfpq")
    index = ensure_ivfpq_index(
        packed, idx, corpus_tag="t", n_lists=4, m=8, n_centroids=16,
        vec_col="v",
    )
    return index, packed


def _rows(df):
    return sorted(
        (r["query_id"], r["doc_id"], r["maxsim_milli"])
        for r in df.collect()
    )


def test_served_full_probe_equals_inline_brute_force(corpus, store):
    qv, dv = corpus
    index, packed = store
    want = _rows(maxsim_topk(dv, qv, k=5))
    got = _rows(
        maxsim_topk_index(
            index, qv, k=5, rerank_corpus=packed, qtok_mod=4096
        )
    )
    assert got == want and len(got) == N_QUERY_DOCS * 5


def test_bounded_serve_scores_are_one_sided(corpus, store):
    """Approximate MaxSim loses pairs, never invents them: with a
    bounded per-vector k every surfaced (query, doc) score is ≤ the
    exact score for that pair, and every surfaced doc is real."""
    qv, dv = corpus
    index, packed = store
    exact_all = {
        (r["query_id"], r["doc_id"]): r["maxsim_milli"]
        for r in maxsim_topk(dv, qv, k=1 << 20).collect()
    }
    approx = maxsim_topk_index(
        index, qv, k=5, per_vector_k=3, nprobe=2,
        rerank_corpus=packed, qtok_mod=4096,
    ).collect()
    assert approx
    for r in approx:
        key = (r["query_id"], r["doc_id"])
        assert key in exact_all
        assert r["maxsim_milli"] <= exact_all[key]


def test_topk_bound_and_tie_determinism(corpus):
    """k bounds each query's rows, and the kept set is exactly the
    first k of the full ranking under (milli DESC, doc ASC) — the
    deterministic tie-break, independently recomputed from the
    unbounded pooling."""
    qv, dv = corpus
    out = maxsim_topk(dv, qv, k=3).collect()
    full = maxsim_topk(dv, qv, k=1 << 20).collect()
    by_q: dict[int, list] = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(
            (r["maxsim_milli"], r["doc_id"])
        )
    full_by_q: dict[int, list] = {}
    for r in full:
        full_by_q.setdefault(r["query_id"], []).append(
            (r["maxsim_milli"], r["doc_id"])
        )
    assert set(by_q) == {0, 1, 2}
    for q, rows in by_q.items():
        assert len(rows) == 3
        want = sorted(full_by_q[q], key=lambda t: (-t[0], t[1]))[:3]
        assert sorted(rows, key=lambda t: (-t[0], t[1])) == want


def test_chunk_vectors_are_unit_norm(corpus):
    _qv, dv = corpus
    norm = F.sqrt(
        F.aggregate(
            F.zip_with(F.col("v"), F.col("v"), lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    bad = dv.select(norm.alias("n")).filter(
        (F.col("n") < 0.999999) | (F.col("n") > 1.000001)
    )
    assert bad.count() == 0


def test_packed_key_validation_and_exact_unpack(spark, corpus, store):
    """The packed serve key fails LOUDLY on a qvec_idx outside
    [0, qtok_mod) (silent key-space collision otherwise), and huge
    query ids round-trip exactly through the broadcast-join unpack —
    the double-division floor this replaced misattributes keys above
    2^53."""
    qv, _dv = corpus
    index, packed = store
    # qvec_idx >= qtok_mod refuses
    with pytest.raises(ValueError, match="qtok_mod"):
        maxsim_topk_index(
            index, qv, k=3, rerank_corpus=packed, qtok_mod=1
        )
    # a query id whose PACKED key exceeds 2^53 survives exactly —
    # (2^45+3)·4096 ≈ 2^57 is beyond double precision, so the old
    # floor(double-division) unpack would misattribute it
    big = (1 << 45) + 3
    assert big * 4096 > (1 << 53)
    qbig = qv.filter(F.col("query_id") == 0).select(
        F.lit(big).cast("long").alias("query_id"), "qvec_idx", "qv"
    )
    out = maxsim_topk_index(
        index, qbig, k=3, rerank_corpus=packed, qtok_mod=4096
    ).collect()
    assert out and all(r["query_id"] == big for r in out)
    # overflow guard refuses ids that cannot pack
    too_big = qbig.select(
        F.lit((1 << 61)).cast("long").alias("query_id"), "qvec_idx", "qv"
    )
    with pytest.raises(ValueError, match="overflow"):
        maxsim_topk_index(
            index, too_big, k=3, rerank_corpus=packed, qtok_mod=4096
        )
    # NULL ids/indices would pack to a NULL key and silently drop
    # their contribution — they refuse loudly instead
    withnull = qbig.unionByName(
        qbig.limit(1).select(
            F.lit(None).cast("long").alias("query_id"), "qvec_idx", "qv"
        )
    )
    with pytest.raises(ValueError, match="NULL"):
        maxsim_topk_index(
            index, withnull, k=3, rerank_corpus=packed, qtok_mod=4096
        )
