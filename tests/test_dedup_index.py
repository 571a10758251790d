"""Persisted MinHash dedup index: build → load → query → add.

The correctness contract is INDEX-VS-INLINE EQUIVALENCE: served from
disk, the CDC query must reproduce ``incremental_near_dup_pairs``
pair-for-pair, jaccard-for-jaccard — same shingling, same signature
family, same band keys (shared ``band_key_structs`` expression).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from uofi_payroll_etl_main_demo_spark.ext.dedup import (
    incremental_near_dup_pairs,
)
from uofi_payroll_etl_main_demo_spark.ext.dedup_index import (
    ensure_minhash_index,
    minhash_index_add,
    minhash_index_build,
    minhash_index_load,
)

PARAMS = dict(num_hashes=32, bands=16, k=3, hash_family="portable")


def _docs(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def _pairs(df):
    return sorted(
        (r["new_id"], r["old_id"], round(r["jaccard"], 9)) for r in df.collect()
    )


def test_index_query_equals_inline_cdc(spark, sf_dir, tmp_path):
    d = _docs(spark, sf_dir)
    corpus = d.filter(F.col("doc_id") % 5 != 4)
    batch = d.filter(F.col("doc_id") % 5 == 4)
    idx = str(tmp_path / "mh")
    minhash_index_build(corpus, idx, corpus_tag="t", **PARAMS)
    got = _pairs(minhash_index_load(spark, idx).query(batch, threshold=0.2))
    want = _pairs(
        incremental_near_dup_pairs(corpus, batch, threshold=0.2, **PARAMS)
    )
    assert got == want and got  # non-empty on the fixture


def test_index_add_grows_corpus_without_rebuild(spark, sf_dir, tmp_path):
    """Build on A, add B: querying C against the grown store equals the
    inline CDC over (A ∪ B) — and no stored file is rewritten by add
    except the meta re-key."""
    d = _docs(spark, sf_dir)
    a = d.filter(F.col("doc_id") % 5 <= 1)
    b = d.filter(F.col("doc_id") % 5 == 2)
    c = d.filter(F.col("doc_id") % 5 == 4)
    idx = str(tmp_path / "mh")
    minhash_index_build(a, idx, corpus_tag="a", **PARAMS)
    bands_before = {
        p
        for root, _d, files in os.walk(f"{idx}/bands")
        for p in files
        if p.endswith(".parquet")
    }
    minhash_index_add(b, idx, new_corpus_tag="ab")
    bands_after = {
        p
        for root, _d, files in os.walk(f"{idx}/bands")
        for p in files
        if p.endswith(".parquet")
    }
    assert bands_before < bands_after  # strictly grew, nothing replaced
    loaded = ensure_minhash_index(
        a.unionByName(b), idx, corpus_tag="ab", **PARAMS
    )
    got = _pairs(loaded.query(c, threshold=0.2))
    want = _pairs(
        incremental_near_dup_pairs(
            a.unionByName(b), c, threshold=0.2, **PARAMS
        )
    )
    assert got == want


def test_index_add_replay_is_idempotent(spark, sf_dir, tmp_path):
    """At-least-once delivery: replaying the SAME add (same batch_id)
    overwrites that batch's partitions instead of duplicating band and
    shingle rows — query results identical either way."""
    d = _docs(spark, sf_dir)
    a = d.filter(F.col("doc_id") % 5 <= 1)
    b = d.filter(F.col("doc_id") % 5 == 2)
    c = d.filter(F.col("doc_id") % 5 == 4)
    idx = str(tmp_path / "mh")
    minhash_index_build(a, idx, corpus_tag="a", **PARAMS)
    minhash_index_add(b, idx, new_corpus_tag="ab", batch_id="b1")
    n_bands = spark.read.parquet(f"{idx}/bands").count()
    n_shingles = spark.read.parquet(f"{idx}/shingles").count()
    once = _pairs(minhash_index_load(spark, idx).query(c, threshold=0.2))
    minhash_index_add(b, idx, new_corpus_tag="ab", batch_id="b1")  # replay
    assert spark.read.parquet(f"{idx}/bands").count() == n_bands
    assert spark.read.parquet(f"{idx}/shingles").count() == n_shingles
    assert _pairs(minhash_index_load(spark, idx).query(c, threshold=0.2)) == once


def test_query_rejects_overlapping_batch_ids(spark, sf_dir, tmp_path):
    """An id present on both sides would verify against the wrong
    side's shingle set — the guard raises instead (ADVICE r7)."""
    d = _docs(spark, sf_dir)
    corpus = d.filter(F.col("doc_id") % 5 != 4)
    idx = str(tmp_path / "mh")
    minhash_index_build(corpus, idx, corpus_tag="t", **PARAMS)
    loaded = minhash_index_load(spark, idx)
    overlapping = d.filter(F.col("doc_id") % 5 <= 1)  # ⊂ indexed ids
    with pytest.raises(ValueError, match="already indexed"):
        loaded.query(overlapping, threshold=0.2).collect()
    # opt-out for callers that guarantee disjointness: no guard job
    disjoint = d.filter(F.col("doc_id") % 5 == 4)
    assert loaded.query(disjoint, threshold=0.2, check_disjoint=False).count()


def test_ensure_loads_and_kind_guard(spark, sf_dir, tmp_path):
    d = _docs(spark, sf_dir)
    corpus = d.filter(F.col("doc_id") % 5 != 4)
    idx = str(tmp_path / "mh")
    ensure_minhash_index(corpus, idx, corpus_tag="s1", **PARAMS)
    mtimes = {
        os.path.join(r, f): os.stat(os.path.join(r, f)).st_mtime_ns
        for r, _d, fs in os.walk(idx)
        for f in fs
    }
    ensure_minhash_index(corpus, idx, corpus_tag="s1", **PARAMS)
    assert mtimes == {
        os.path.join(r, f): os.stat(os.path.join(r, f)).st_mtime_ns
        for r, _d, fs in os.walk(idx)
        for f in fs
    }
    # a foreign index kind is rejected loudly
    from uofi_payroll_etl_main_demo_spark.ext.ann_index import ivf_index_build

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    ivf = str(tmp_path / "ivf")
    ivf_index_build(emb, ivf, n_centroids=4, corpus_tag="t")
    with pytest.raises(ValueError, match="not minhash"):
        minhash_index_load(spark, ivf)
