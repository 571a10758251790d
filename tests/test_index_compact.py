"""Index compaction: fold accumulated __batch add-partitions into one
base partition — file counts shrink, partition count collapses to 1,
query results are IDENTICAL, and ensure_* still loads (params + tag
preserved). The maintenance pass that keeps the add-forever lifecycle
from becoming a small-file problem.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from uofi_payroll_etl_main_demo_spark.ext.ann_index import (
    ivf_index_add,
    ivf_index_build,
    ivf_index_compact,
    ivf_index_load,
    pq_index_add,
    pq_index_build,
    pq_index_compact,
    pq_index_load,
)
from uofi_payroll_etl_main_demo_spark.ext.cdc_index import (
    cdc_index_add,
    cdc_index_build,
    cdc_index_compact,
    cdc_index_load,
    ensure_cdc_index,
)
from uofi_payroll_etl_main_demo_spark.ext.dedup_index import (
    minhash_index_add,
    minhash_index_build,
    minhash_index_compact,
    minhash_index_load,
)

QV = [0.1] * 64



def _tp(spark, idx, table):
    """Epoch-resolved table path (r11 snapshot epochs): rewrites land
    in ``{table}__e{N}`` dirs, so direct-layout assertions must read
    the CURRENT epoch's dir, not the bare build-time one."""
    from uofi_payroll_etl_main_demo_spark.ext.ann_index import (
        _data_path,
        _read_meta,
    )

    return _data_path(idx, table, _read_meta(spark, idx))

def _emb(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


def _docs(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def _batches(spark, path):
    return {
        r["__batch"]
        for r in spark.read.parquet(path).select("__batch").distinct().collect()
    }


def test_ivf_compact_collapses_batches_and_preserves_results(
    spark, sf_dir, tmp_path
):
    idx = str(tmp_path / "ivf")
    emb = _emb(spark, sf_dir)
    ivf_index_build(
        emb.filter(F.col("vec_id") % 3 == 0), idx, n_centroids=4,
        corpus_tag="t",
    )
    for m in (1, 2):
        ivf_index_add(
            emb.filter(F.col("vec_id") % 3 == m), idx,
            new_corpus_tag="full", batch_id=f"b{m}",
        )
    assert _batches(spark, _tp(spark, idx, "assigned")) == {"base", "b1", "b2"}
    before = [
        (r["vec_id"], round(r["score"], 9))
        for r in ivf_index_load(spark, idx).search(QV, k=10, nprobe=4).collect()
    ]
    ivf_index_compact(spark, idx)
    assert _batches(spark, _tp(spark, idx, "assigned")) == {"base"}
    loaded = ivf_index_load(spark, idx)
    assert loaded.meta["corpus_tag"] == "full"  # meta preserved
    after = [
        (r["vec_id"], round(r["score"], 9))
        for r in loaded.search(QV, k=10, nprobe=4).collect()
    ]
    assert after == before
    # centroid stays the first partition level (probe pruning layout)
    assert any(
        d.startswith("centroid=") for d in os.listdir(_tp(spark, idx, "assigned"))
    )


def test_pq_compact(spark, sf_dir, tmp_path):
    idx = str(tmp_path / "pq")
    emb = _emb(spark, sf_dir)
    pq_index_build(
        emb.filter(F.col("vec_id") % 2 == 0), idx, m=8, n_centroids=16,
        corpus_tag="half",
    )
    pq_index_add(
        emb.filter(F.col("vec_id") % 2 == 1), idx,
        new_corpus_tag="full", batch_id="b1",
    )
    before = [
        (r["vec_id"], round(r["score"], 9))
        for r in pq_index_load(spark, idx)
        .search(QV, k=10, candidates=1_000_000, rerank_corpus=emb)
        .collect()
    ]
    pq_index_compact(spark, idx)
    assert _batches(spark, _tp(spark, idx, "codes")) == {"base"}
    after = [
        (r["vec_id"], round(r["score"], 9))
        for r in pq_index_load(spark, idx)
        .search(QV, k=10, candidates=1_000_000, rerank_corpus=emb)
        .collect()
    ]
    assert after == before


def test_minhash_compact(spark, sf_dir, tmp_path):
    idx = str(tmp_path / "mh")
    d = _docs(spark, sf_dir)
    params = dict(num_hashes=32, bands=16, k=3, hash_family="portable")
    minhash_index_build(
        d.filter(F.col("doc_id") % 5 <= 1), idx, corpus_tag="a", **params
    )
    minhash_index_add(
        d.filter(F.col("doc_id") % 5 == 2), idx,
        new_corpus_tag="ab", batch_id="b1",
    )
    probe = d.filter(F.col("doc_id") % 5 == 4)
    pairs = lambda: sorted(  # noqa: E731
        (r["new_id"], r["old_id"], round(r["jaccard"], 9))
        for r in minhash_index_load(spark, idx)
        .query(probe, threshold=0.2)
        .collect()
    )
    before = pairs()
    minhash_index_compact(spark, idx)
    assert _batches(spark, f"{idx}/bands") == {"base"}
    assert _batches(spark, f"{idx}/shingles") == {"base"}
    assert pairs() == before and before
    # band stays the first partition level
    assert any(d_.startswith("band=") for d_ in os.listdir(f"{idx}/bands"))


def test_compaction_replay_guards_fail_loudly(spark, sf_dir, tmp_path):
    """A compaction folds batch partitions into base, so a REPLAY of a
    folded batch can neither exclude its rows (query) nor idempotently
    overwrite them (add) — both must raise via the folded_batches SET
    instead of silently self-matching/duplicating. FRESH tags proceed
    normally regardless of sort order (the guard is membership, not a
    lexicographic watermark — default md5 tags are unordered, and
    ~half of them sort below any given tag)."""
    import pytest as _pytest

    d = _docs(spark, sf_dir)
    params = dict(num_hashes=32, bands=16, k=3, hash_family="portable")
    idx = str(tmp_path / "mh")
    minhash_index_build(
        d.filter(F.col("doc_id") % 5 <= 1), idx,
        corpus_tag="a", batch_tag="b00000000000000000000", **params,
    )
    minhash_index_add(
        d.filter(F.col("doc_id") % 5 == 2), idx,
        new_corpus_tag="ab", batch_id="b00000000000000000001",
    )
    minhash_index_compact(spark, idx)
    loaded = minhash_index_load(spark, idx)
    # the build's own non-"base" tag folds too (streaming builds from
    # a first micro-batch; its replay must also refuse post-compaction)
    assert (
        loaded.meta["folded_batches"]
        == "b00000000000000000000,b00000000000000000001"
    )
    probe = d.filter(F.col("doc_id") % 5 == 4)
    with _pytest.raises(ValueError, match="folded into base"):
        loaded.query(
            probe, threshold=0.2,
            exclude_batch="b00000000000000000001",
        ).collect()
    with _pytest.raises(ValueError, match="folded into base"):
        minhash_index_add(
            d.filter(F.col("doc_id") % 5 == 2), idx,
            new_corpus_tag="ab", batch_id="b00000000000000000001",
        )
    # any FRESH batch is unaffected — including one whose tag sorts
    # BELOW the folded tag (the md5-default-tag case the v2 watermark
    # spuriously condemned): query excluding it works, adding it
    # works, and the folded set survives the add
    assert loaded.query(
        probe, threshold=0.2, exclude_batch="0affc0ffee42"
    ).count()
    minhash_index_add(
        d.filter(F.col("doc_id") % 5 == 3), idx,
        new_corpus_tag="abc", batch_id="0affc0ffee42",
    )
    assert (
        minhash_index_load(spark, idx).meta["folded_batches"]
        == "b00000000000000000000,b00000000000000000001"
    )
    # a SECOND compaction unions the new tag into the folded set; the
    # first fold's tags stay condemned
    minhash_index_compact(spark, idx)
    assert minhash_index_load(spark, idx).meta["folded_batches"] == (
        "0affc0ffee42,b00000000000000000000,b00000000000000000001"
    )
    with _pytest.raises(ValueError, match="folded into base"):
        minhash_index_add(
            d.filter(F.col("doc_id") % 5 == 3), idx,
            new_corpus_tag="abc", batch_id="0affc0ffee42",
        )
    # CDC twin: the silent-self-containment case must also refuse
    cdx = str(tmp_path / "cdc")
    cdc_index_build(
        d.filter(F.col("doc_id") % 4 == 1), cdx,
        corpus_tag="a", batch_tag="b00000000000000000000",
    )
    cdc_index_add(
        d.filter(F.col("doc_id") % 4 == 2), cdx,
        new_corpus_tag="ab", batch_id="b00000000000000000001",
    )
    cdc_index_compact(spark, cdx)
    with _pytest.raises(ValueError, match="folded into base"):
        cdc_index_load(spark, cdx).query(
            d.filter(F.col("doc_id") % 4 == 0),
            exclude_batch="b00000000000000000001",
        ).collect()


def test_compact_failure_leaves_live_table_and_no_orphan_tmp(
    spark, sf_dir, tmp_path, monkeypatch
):
    """A failure during the STAGE phase (tmp rewrite) must leave the
    live table, meta, and query results fully intact, and must not
    leak the tmp dir."""
    import pytest as _pytest

    import uofi_payroll_etl_main_demo_spark.ext.ann_index as ai

    d = _docs(spark, sf_dir)
    params = dict(num_hashes=32, bands=16, k=3, hash_family="portable")
    idx = str(tmp_path / "mh")
    minhash_index_build(
        d.filter(F.col("doc_id") % 5 <= 2), idx, corpus_tag="a", **params
    )
    probe = d.filter(F.col("doc_id") % 5 == 4)
    before = sorted(
        (r["new_id"], r["old_id"])
        for r in minhash_index_load(spark, idx)
        .query(probe, threshold=0.2)
        .collect()
    )

    real = ai._staged_compactions

    def boom(*a, **k):
        raise RuntimeError("disk full (simulated)")

    # fail the whole staging phase: nothing destructive may have run
    monkeypatch.setattr(ai, "_staged_compactions", boom)
    import uofi_payroll_etl_main_demo_spark.ext.dedup_index as di

    monkeypatch.setattr(di, "_staged_compactions", boom)
    with _pytest.raises(RuntimeError, match="disk full"):
        minhash_index_compact(spark, idx)
    monkeypatch.setattr(di, "_staged_compactions", real)
    loaded = minhash_index_load(spark, idx)  # meta still valid
    after = sorted(
        (r["new_id"], r["old_id"])
        for r in loaded.query(probe, threshold=0.2).collect()
    )
    assert after == before
    assert not os.path.exists(f"{idx}/bands__compact")
    assert not os.path.exists(f"{idx}/shingles__compact")


def test_cdc_compact(spark, sf_dir, tmp_path):
    idx = str(tmp_path / "cdc")
    d = _docs(spark, sf_dir)
    cdc_index_build(d.filter(F.col("doc_id") % 4 == 1), idx, corpus_tag="a")
    cdc_index_add(
        d.filter(F.col("doc_id") % 4 == 2), idx,
        new_corpus_tag="ab", batch_id="b1",
    )
    probe = d.filter(F.col("doc_id") % 4 == 0)
    rows = lambda: sorted(  # noqa: E731
        (r["doc_id"], r["n_chunks"], r["n_seen"])
        for r in cdc_index_load(spark, idx).query(probe).collect()
    )
    n = spark.read.parquet(f"{idx}/chunks").count()
    before = rows()
    cdc_index_compact(spark, idx)
    assert _batches(spark, f"{idx}/chunks") == {"base"}
    assert spark.read.parquet(f"{idx}/chunks").count() == n  # pure re-layout
    assert rows() == before
    # ensure still LOADS after compaction (tag + params preserved)
    mtimes = {
        os.path.join(r, f): os.stat(os.path.join(r, f)).st_mtime_ns
        for r, _dd, fs in os.walk(idx)
        for f in fs
    }
    # corpus frame is irrelevant on a tag match — ensure must LOAD
    ensure_cdc_index(d, idx, corpus_tag="ab")
    assert mtimes == {
        os.path.join(r, f): os.stat(os.path.join(r, f)).st_mtime_ns
        for r, _dd, fs in os.walk(idx)
        for f in fs
    }


def test_ivf_index_stats_tracks_lists_and_batches(spark, sf_dir, tmp_path):
    """Stats = per-list (n_vectors, n_batches): vectors sum to the
    corpus, batch counts reflect adds, and compaction folds every
    list's batches to one without changing vector counts."""
    from uofi_payroll_etl_main_demo_spark.ext.ann_index import (
        ivf_index_stats,
    )

    idx = str(tmp_path / "ivf")
    emb = _emb(spark, sf_dir)
    ivf_index_build(
        emb.filter(F.col("vec_id") % 2 == 0), idx, n_centroids=4,
        corpus_tag="half",
    )
    ivf_index_add(
        emb.filter(F.col("vec_id") % 2 == 1), idx,
        new_corpus_tag="full", batch_id="b1",
    )
    rows = ivf_index_stats(spark, idx).collect()
    assert len(rows) == 4
    assert sum(r["n_vectors"] for r in rows) == emb.count()
    assert max(r["n_batches"] for r in rows) == 2  # base + b1
    before = {r["centroid"]: r["n_vectors"] for r in rows}
    ivf_index_compact(spark, idx)
    after_rows = ivf_index_stats(spark, idx).collect()
    assert {r["centroid"]: r["n_vectors"] for r in after_rows} == before
    assert all(r["n_batches"] == 1 for r in after_rows)
