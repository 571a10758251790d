"""Persisted CDC chunk index: build → load → query → add.

The correctness contract is INDEX-VS-INLINE EQUIVALENCE: served from
disk, the containment query must reproduce ``cdc_containment``
row-for-row (both run the shared ``containment_scores`` tail over the
same chunk law), and the store stays GLOBALLY DISTINCT across adds.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from uofi_payroll_etl_main_demo_spark.ext.cdc import cdc_containment
from uofi_payroll_etl_main_demo_spark.ext.cdc_index import (
    cdc_index_add,
    cdc_index_build,
    cdc_index_load,
    ensure_cdc_index,
)

PARAMS = dict(window=8, divisor=64)


def _docs(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def _rows(df):
    return sorted(
        (
            r["doc_id"],
            r["n_chunks"],
            r["n_seen"],
            None if r["containment"] is None else round(r["containment"], 9),
        )
        for r in df.collect()
    )


def test_index_query_equals_inline_containment(spark, sf_dir, tmp_path):
    d = _docs(spark, sf_dir)
    corpus = d.filter(F.col("doc_id") % 4 != 0)
    batch = d.filter(F.col("doc_id") % 4 == 0)
    idx = str(tmp_path / "cdc")
    cdc_index_build(corpus, idx, corpus_tag="t", **PARAMS)
    got = _rows(cdc_index_load(spark, idx).query(batch))
    want = _rows(cdc_containment(corpus, batch, **PARAMS))
    assert got == want and got


def test_index_add_grows_corpus_and_stays_distinct(spark, sf_dir, tmp_path):
    """Build on A, add B: querying C against the grown store equals
    inline containment over (A ∪ B), and the stored hash set is
    globally distinct (adds anti-join before appending)."""
    d = _docs(spark, sf_dir)
    a = d.filter(F.col("doc_id") % 4 == 1)
    b = d.filter(F.col("doc_id") % 4 == 2)
    c = d.filter(F.col("doc_id") % 4 == 0)
    idx = str(tmp_path / "cdc")
    cdc_index_build(a, idx, corpus_tag="a", **PARAMS)
    cdc_index_add(b, idx, new_corpus_tag="ab", batch_id="b1")
    chunks = spark.read.parquet(f"{idx}/chunks")
    assert chunks.count() == chunks.select("chunk_hash").distinct().count()
    got = _rows(cdc_index_load(spark, idx).query(c))
    want = _rows(cdc_containment(a.unionByName(b), c, **PARAMS))
    assert got == want
    # the re-keyed tag makes ensure LOAD, not rebuild
    mtimes = {
        os.path.join(r, f): os.stat(os.path.join(r, f)).st_mtime_ns
        for r, _dd, fs in os.walk(idx)
        for f in fs
    }
    ensure_cdc_index(a.unionByName(b), idx, corpus_tag="ab", **PARAMS)
    assert mtimes == {
        os.path.join(r, f): os.stat(os.path.join(r, f)).st_mtime_ns
        for r, _dd, fs in os.walk(idx)
        for f in fs
    }


def test_index_add_replay_is_idempotent(spark, sf_dir, tmp_path):
    """At-least-once delivery: replaying the SAME add (same batch_id)
    overwrites that batch's partition instead of duplicating hashes."""
    d = _docs(spark, sf_dir)
    a = d.filter(F.col("doc_id") % 4 == 1)
    b = d.filter(F.col("doc_id") % 4 == 2)
    c = d.filter(F.col("doc_id") % 4 == 0)
    idx = str(tmp_path / "cdc")
    cdc_index_build(a, idx, corpus_tag="a", **PARAMS)
    cdc_index_add(b, idx, new_corpus_tag="ab", batch_id="b1")
    n = spark.read.parquet(f"{idx}/chunks").count()
    once = _rows(cdc_index_load(spark, idx).query(c))
    cdc_index_add(b, idx, new_corpus_tag="ab", batch_id="b1")  # replay
    assert spark.read.parquet(f"{idx}/chunks").count() == n
    assert _rows(cdc_index_load(spark, idx).query(c)) == once


def test_param_change_rebuilds_and_kind_guard(spark, sf_dir, tmp_path):
    d = _docs(spark, sf_dir)
    corpus = d.filter(F.col("doc_id") % 4 != 0)
    idx = str(tmp_path / "cdc")
    ensure_cdc_index(corpus, idx, corpus_tag="t", window=8, divisor=64)
    before = {
        os.path.join(r, f)
        for r, _dd, fs in os.walk(f"{idx}/chunks")
        for f in fs
    }
    # a divisor change is a different chunk law: rebuild
    ensure_cdc_index(corpus, idx, corpus_tag="t", window=8, divisor=32)
    after = {
        os.path.join(r, f)
        for r, _dd, fs in os.walk(f"{idx}/chunks")
        for f in fs
    }
    assert before != after
    # a foreign index kind is rejected loudly
    from uofi_payroll_etl_main_demo_spark.ext.dedup_index import (
        minhash_index_build,
    )

    mh = str(tmp_path / "mh")
    minhash_index_build(
        corpus, mh, corpus_tag="t", num_hashes=8, bands=4, k=3
    )
    with pytest.raises(ValueError, match="not cdc"):
        cdc_index_load(spark, mh)
