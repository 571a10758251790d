"""Scale-path similarity operators: GEMM top-k and IVF index."""

from __future__ import annotations

import pytest

from uofi_payroll_etl_main_demo_spark.ext import (
    brute_force_top_k,
    brute_force_top_k_gemm,
    build_ivf_index,
)

QV = [((i * 37) % 19 - 9) / 10.0 for i in range(64)]


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_gemm_topk_matches_hof_baseline(spark, emb):
    exact = brute_force_top_k(emb, QV, k=10).collect()
    gemm = brute_force_top_k_gemm(emb, QV, k=10).collect()
    assert [r["vec_id"] for r in gemm] == [r["vec_id"] for r in exact]
    for g, e in zip(gemm, exact):
        assert g["score"] == pytest.approx(e["score"], abs=1e-12)


def test_ivf_search_recall(spark, emb):
    index = build_ivf_index(emb, n_centroids=8)
    exact_ids = {r["vec_id"] for r in brute_force_top_k(emb, QV, k=10).collect()}
    # nprobe = all lists => exhaustive => exact
    got_all = {r["vec_id"] for r in index.search(QV, k=10, nprobe=8).collect()}
    assert got_all == exact_ids
    # small nprobe: still non-trivial overlap on near-uniform data
    got_2 = {r["vec_id"] for r in index.search(QV, k=10, nprobe=2).collect()}
    assert len(got_2 & exact_ids) >= 2


def test_bucketed_pairs_subset_of_exact(spark, emb):
    """all_pairs_above is exact WITHIN buckets: every emitted pair must
    appear in the quadratic exact baseline with the identical cosine,
    and recall must be non-trivial at this threshold/plane count."""
    from uofi_payroll_etl_main_demo_spark.ext.similarity import (
        all_pairs_above,
        exact_cosine_pairs,
    )

    exact = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in exact_cosine_pairs(emb, threshold=0.35).collect()
    }
    bucketed = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in all_pairs_above(emb, dim=64, threshold=0.35, n_planes=4).collect()
    }
    assert set(bucketed) <= set(exact)
    for k, c in bucketed.items():
        assert c == pytest.approx(exact[k], abs=1e-12)
    assert len(bucketed) >= 1  # non-trivial recall on this corpus


def test_ivf_assignment_partitions_corpus(spark, emb):
    index = build_ivf_index(emb, n_centroids=8)
    counts = index.assigned.groupBy("centroid").count().collect()
    assert sum(r["count"] for r in counts) == emb.count()
    assert len(counts) == 8  # every list non-empty at this size


def test_gemm_pairs_match_column_form(spark, emb):
    """all_pairs_above_gemm emits the identical pair SET as the Column
    form (cosines equal to float noise) — the guarantee that lets the
    semantic-dedup query take the GEMM path."""
    from uofi_payroll_etl_main_demo_spark.ext.similarity import (
        all_pairs_above,
        all_pairs_above_gemm,
    )

    col = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in all_pairs_above(
            emb, dim=64, threshold=0.35, n_planes=4
        ).collect()
    }
    gemm = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in all_pairs_above_gemm(
            emb, dim=64, threshold=0.35, n_planes=4
        ).collect()
    }
    assert set(gemm) == set(col)
    for k, c in gemm.items():
        assert c == pytest.approx(col[k], abs=1e-12)
    assert len(gemm) >= 1


def test_ivf_pq_full_probe_equals_pq(spark):
    """nprobe == n_centroids makes IVF pruning a no-op, so IVF-PQ must
    equal plain PQ exactly (same codebook training, same rerank)."""
    from uofi_payroll_etl_main_demo_spark.ext.ivf import ivf_pq_search
    from uofi_payroll_etl_main_demo_spark.ext.similarity import pq_top_k

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = QV
    a = sorted(
        (r["vec_id"], round(r["score"], 6))
        for r in ivf_pq_search(emb, q, k=10, nprobe=8, n_centroids=8).collect()
    )
    b = sorted(
        (r["vec_id"], round(r["score"], 6))
        for r in pq_top_k(emb, q, k=10, candidates=100).collect()
    )
    assert a == b


def test_ivf_pq_recall_vs_bruteforce(spark):
    from uofi_payroll_etl_main_demo_spark.ext.ivf import ivf_pq_search
    from uofi_payroll_etl_main_demo_spark.ext.similarity import (
        brute_force_top_k,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = {r["vec_id"] for r in brute_force_top_k(emb, QV, k=10).collect()}
    approx = {
        r["vec_id"]
        for r in ivf_pq_search(
            emb, QV, k=10, nprobe=6, n_centroids=8
        ).collect()
    }
    assert len(approx) == 10
    assert len(exact & approx) >= 5  # recall@10 >= 0.5 on this corpus
