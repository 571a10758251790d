"""Index DELETE (takedown / right-to-erasure) on all four persisted
stores. The contract pinned here: ``delete(ids)`` → query ≡
rebuild-without-those-ids → query (result identity), the serving
layout survives, and a pre-delete batch replay raises via the
folded-batch guard (a replayed add must not resurrect erased rows).
CDC additionally pins the SHARED-chunk law: a hash leaves the store
only when no surviving document still holds it.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from uofi_payroll_etl_main_demo_spark.ext.ann_index import (
    ivf_index_add,
    ivf_index_build,
    ivf_index_delete,
    ivf_index_load,
    pq_index_add,
    pq_index_build,
    pq_index_delete,
    pq_index_load,
)
from uofi_payroll_etl_main_demo_spark.ext.cdc_index import (
    cdc_index_add,
    cdc_index_build,
    cdc_index_delete,
    cdc_index_load,
)
from uofi_payroll_etl_main_demo_spark.ext.dedup_index import (
    minhash_index_add,
    minhash_index_build,
    minhash_index_delete,
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


def test_ivf_delete_equals_rebuild_without(spark, sf_dir, tmp_path):
    from uofi_payroll_etl_main_demo_spark.functions.vectors import (
        cosine_similarity,
    )

    emb = _emb(spark, sf_dir)
    dead = [r["vec_id"] for r in emb.filter(F.col("vec_id") % 7 == 3)
            .select("vec_id").collect()]
    # deleted store: build half, add the rest, then delete
    idx = str(tmp_path / "ivf")
    ivf_index_build(
        emb.filter(F.col("vec_id") % 2 == 0), idx, n_centroids=4,
        corpus_tag="half", seed=7,
    )
    ivf_index_add(
        emb.filter(F.col("vec_id") % 2 == 1), idx,
        new_corpus_tag="full", batch_id="b1",
    )
    ivf_index_delete(spark, idx, dead, new_corpus_tag="post")
    loaded = ivf_index_load(spark, idx)
    assert loaded.meta["corpus_tag"] == "post"
    got = [
        (r["vec_id"], round(r["score"], 9))
        for r in loaded.search(QV, k=10, nprobe=4).collect()
    ]
    # identity 1: the lists == a never-deleted twin's lists minus the
    # dead rows (same build input + seed -> identical centroids)
    ref = str(tmp_path / "ivf_ref")
    ivf_index_build(
        emb.filter(F.col("vec_id") % 2 == 0), ref, n_centroids=4,
        corpus_tag="half", seed=7,
    )
    ivf_index_add(
        emb.filter(F.col("vec_id") % 2 == 1), ref,
        new_corpus_tag="full", batch_id="b1",
    )
    got_lists = {
        (r["vec_id"], r["centroid"])
        for r in spark.read.parquet(_tp(spark, idx, "assigned"))
        .select("vec_id", "centroid").collect()
    }
    want_lists = {
        (r["vec_id"], r["centroid"])
        for r in spark.read.parquet(_tp(spark, ref, "assigned"))
        .select("vec_id", "centroid").collect()
        if r["vec_id"] not in set(dead)
    }
    assert got_lists == want_lists
    # identity 2: full-probe search == exact cosine top-k over the
    # surviving vectors (nprobe = all lists -> exhaustive)
    alive = emb.filter(F.col("vec_id") % 7 != 3)
    want = [
        (r["vec_id"], round(r["score"], 9))
        for r in alive.select(
            "vec_id",
            cosine_similarity(
                "embedding", F.lit(QV).cast("array<double>")
            ).alias("score"),
        ).orderBy(F.desc("score"), "vec_id").limit(10).collect()
    ]
    assert got == want
    # layout: centroid stays the first partition level, all base
    assert any(d.startswith("centroid=") for d in os.listdir(_tp(spark, idx, "assigned")))
    batches = {
        r["__batch"]
        for r in spark.read.parquet(_tp(spark, idx, "assigned"))
        .select("__batch").distinct().collect()
    }
    assert batches == {"base"}
    # pre-delete batch replay must refuse
    with pytest.raises(ValueError, match="folded into base"):
        ivf_index_add(
            emb.filter(F.col("vec_id") % 2 == 1), idx,
            new_corpus_tag="zzz", batch_id="b1",
        )


def test_pq_delete_equals_rebuild_without(spark, sf_dir, tmp_path):
    emb = _emb(spark, sf_dir)
    # dead ids are ODD only -> never in the codebook training sample
    # (PQ trains on the id-sorted head of the EVEN build input), so a
    # rebuild-without trains byte-identical codebooks and the
    # delete-vs-rebuild query comparison is exact
    dead = [r["vec_id"] for r in emb.filter(F.col("vec_id") % 10 == 7)
            .select("vec_id").collect()]
    alive = emb.filter(F.col("vec_id") % 10 != 7)
    idx = str(tmp_path / "pq")
    pq_index_build(
        emb.filter(F.col("vec_id") % 2 == 0), idx, m=8, n_centroids=16,
        corpus_tag="half",
    )
    pq_index_add(
        emb.filter(F.col("vec_id") % 2 == 1), idx,
        new_corpus_tag="full", batch_id="b1",
    )
    pq_index_delete(spark, idx, dead, new_corpus_tag="post")
    got = [
        (r["vec_id"], round(r["score"], 9))
        for r in pq_index_load(spark, idx)
        .search(QV, k=10, candidates=1_000_000, rerank_corpus=alive)
        .collect()
    ]
    # rebuild-without: same build input, add only the surviving odds
    ref = str(tmp_path / "pq_ref")
    pq_index_build(
        emb.filter(F.col("vec_id") % 2 == 0), ref, m=8, n_centroids=16,
        corpus_tag="half",
    )
    pq_index_add(
        alive.filter(F.col("vec_id") % 2 == 1), ref,
        new_corpus_tag="post", batch_id="b1",
    )
    want = [
        (r["vec_id"], round(r["score"], 9))
        for r in pq_index_load(spark, ref)
        .search(QV, k=10, candidates=1_000_000, rerank_corpus=alive)
        .collect()
    ]
    assert got == want and len(got) == 10
    assert not ({v for v, _ in got} & set(dead))
    # codes table == the twin's codes minus nothing (dead rows gone)
    got_codes = {
        (r["vec_id"], tuple(r["codes"]))
        for r in spark.read.parquet(_tp(spark, idx, "codes"))
        .select("vec_id", "codes").collect()
    }
    want_codes = {
        (r["vec_id"], tuple(r["codes"]))
        for r in spark.read.parquet(_tp(spark, ref, "codes"))
        .select("vec_id", "codes").collect()
    }
    assert got_codes == want_codes


def test_minhash_delete_equals_rebuild_without(spark, sf_dir, tmp_path):
    d = _docs(spark, sf_dir)
    params = dict(num_hashes=32, bands=16, k=3, hash_family="portable")
    corpus = d.filter(F.col("doc_id") % 5 <= 2)
    dead = [r["doc_id"] for r in corpus.filter(F.col("doc_id") % 3 == 0)
            .select("doc_id").collect()]
    probe = d.filter(F.col("doc_id") % 5 == 4)

    idx = str(tmp_path / "mh")
    minhash_index_build(
        d.filter(F.col("doc_id") % 5 <= 1), idx, corpus_tag="a", **params
    )
    minhash_index_add(
        d.filter(F.col("doc_id") % 5 == 2), idx,
        new_corpus_tag="ab", batch_id="b1",
    )
    minhash_index_delete(spark, idx, dead, new_corpus_tag="post")
    got = sorted(
        (r["new_id"], r["old_id"], round(r["jaccard"], 9))
        for r in minhash_index_load(spark, idx)
        .query(probe, threshold=0.2).collect()
    )
    # rebuild from the corpus minus the dead docs
    ref = str(tmp_path / "mh_ref")
    minhash_index_build(
        corpus.filter(~F.col("doc_id").isin(dead)), ref,
        corpus_tag="post", **params,
    )
    want = sorted(
        (r["new_id"], r["old_id"], round(r["jaccard"], 9))
        for r in minhash_index_load(spark, ref)
        .query(probe, threshold=0.2).collect()
    )
    assert got == want and want  # identity, and non-vacuous
    assert not ({o for _, o, _ in got} & set(dead))
    # bands layout contract survives the rewrite
    assert any(x.startswith("band=") for x in os.listdir(f"{idx}/bands"))


def test_cdc_delete_shared_chunk_exactness(spark, tmp_path):
    """doc 1 and doc 2 share a passage; doc 2 also has unique content.
    Deleting doc 2 must keep the shared hashes (doc 1 still holds
    them) and drop doc 2's unique hashes — so a re-submission of doc 1
    still scores containment 1.0 and a re-submission of doc 2 scores
    strictly between 0 and 1."""
    shared = " ".join(f"common{(i * 7) % 997}" for i in range(120))
    unique = " ".join(f"only{(i * 13) % 991}" for i in range(120))
    corpus = spark.createDataFrame(
        [(1, shared), (2, shared + " " + unique)],
        "doc_id bigint, text string",
    )
    idx = str(tmp_path / "cdc")
    cdc_index_build(corpus, idx, corpus_tag="a")
    cdc_index_delete(spark, idx, [2], new_corpus_tag="post")
    index = cdc_index_load(spark, idx)
    assert index.meta["corpus_tag"] == "post"
    resub = spark.createDataFrame(
        [(101, shared), (102, shared + " " + unique)],
        "doc_id bigint, text string",
    )
    rows = {r["doc_id"]: r for r in index.query(resub).collect()}
    assert rows[101]["containment"] == 1.0  # survivor's content intact
    assert 0.0 < rows[102]["containment"] < 1.0  # unique part erased
    # result identity vs rebuild-without
    ref = str(tmp_path / "cdc_ref")
    cdc_index_build(
        corpus.filter(F.col("doc_id") != 2), ref, corpus_tag="post"
    )
    want = sorted(
        (r["doc_id"], r["n_chunks"], r["n_seen"])
        for r in cdc_index_load(spark, ref).query(resub).collect()
    )
    got = sorted(
        (r["doc_id"], r["n_chunks"], r["n_seen"])
        for r in index.query(resub).collect()
    )
    assert got == want
    # owners pruned with the doc
    owners = {
        r["doc_id"]
        for r in spark.read.parquet(f"{idx}/owners")
        .select("doc_id").distinct().collect()
    }
    assert owners == {1}


def test_cdc_delete_then_add_and_replay_guard(spark, sf_dir, tmp_path):
    """Lifecycle composition: build + add + delete + fresh add all
    compose; a replay of the PRE-delete add raises (it could resurrect
    erased hashes); querying with a fresh unordered tag still works."""
    d = _docs(spark, sf_dir).select("doc_id", "text")
    idx = str(tmp_path / "cdc")
    cdc_index_build(d.filter(F.col("doc_id") % 4 == 1), idx, corpus_tag="a")
    cdc_index_add(
        d.filter(F.col("doc_id") % 4 == 2), idx,
        new_corpus_tag="ab", batch_id="b1",
    )
    dead = [r["doc_id"] for r in d.filter(
        (F.col("doc_id") % 4 == 2) & (F.col("doc_id") % 8 == 2))
        .select("doc_id").collect()]
    cdc_index_delete(spark, idx, dead, new_corpus_tag="post")
    with pytest.raises(ValueError, match="folded into base"):
        cdc_index_add(
            d.filter(F.col("doc_id") % 4 == 2), idx,
            new_corpus_tag="ab", batch_id="b1",
        )
    # fresh add + query with a fresh md5-ish tag proceed normally
    cdc_index_add(
        d.filter(F.col("doc_id") % 4 == 3), idx,
        new_corpus_tag="abc", batch_id="0ddba11cafe",
    )
    probe = d.filter(F.col("doc_id") % 4 == 0)
    assert cdc_index_load(spark, idx).query(
        probe, exclude_batch="00000000dead"
    ).count() == probe.count()


def test_store_stats_panels(spark, sf_dir, tmp_path):
    """Observability parity across stores: every persisted store
    reports size + batch-count (and its skew meter where one exists);
    counts reconcile with the underlying tables and track adds."""
    from uofi_payroll_etl_main_demo_spark.ext.ann_index import (
        pq_index_build,
        pq_index_stats,
    )
    from uofi_payroll_etl_main_demo_spark.ext.cdc_index import (
        cdc_index_stats,
    )
    from uofi_payroll_etl_main_demo_spark.ext.dedup_index import (
        minhash_index_stats,
    )

    d = _docs(spark, sf_dir)
    emb = _emb(spark, sf_dir)

    mh = str(tmp_path / "mh")
    minhash_index_build(
        d.filter(F.col("doc_id") % 3 == 0), mh, corpus_tag="a",
        num_hashes=32, bands=16, k=3, hash_family="portable",
    )
    minhash_index_add(
        d.filter(F.col("doc_id") % 3 == 1), mh,
        new_corpus_tag="ab", batch_id="b1",
    )
    rows = minhash_index_stats(spark, mh).collect()
    assert [r["band"] for r in rows] == sorted(r["band"] for r in rows)
    assert sum(r["n_rows"] for r in rows) == (
        spark.read.parquet(f"{mh}/bands").count()
    )
    assert max(r["n_batches"] for r in rows) == 2
    assert all(r["max_bucket_size"] >= 1 for r in rows)

    cdx = str(tmp_path / "cdc")
    cdc_index_build(d.filter(F.col("doc_id") % 3 == 0), cdx, corpus_tag="a")
    cdc_index_add(
        d.filter(F.col("doc_id") % 3 == 1), cdx,
        new_corpus_tag="ab", batch_id="b1",
    )
    row = cdc_index_stats(spark, cdx).collect()[0]
    assert row["n_hashes"] == spark.read.parquet(f"{cdx}/chunks").count()
    assert row["n_batches"] == 2
    assert row["n_owner_pairs"] >= row["n_hashes"]  # provenance >= set
    from uofi_payroll_etl_main_demo_spark.ext.cdc import cdc_chunks

    want_docs = (
        cdc_chunks(d.filter(F.col("doc_id") % 3 <= 1))
        .select("doc_id").distinct().count()
    )
    assert row["n_docs"] == want_docs

    pq = str(tmp_path / "pq")
    pq_index_build(emb, pq, m=8, n_centroids=16, corpus_tag="a")
    row = pq_index_stats(spark, pq).collect()[0]
    assert row["n_codes"] == emb.count()
    assert row["n_batches"] == 1


def test_batch_tag_validation_and_empty_delete_guards(
    spark, sf_dir, tmp_path
):
    """(a) A comma in a batch tag would round-trip through compaction
    as TWO folded tags and defeat the replay guard — refused at write
    time on every store. (b) An empty id set (list OR DataFrame)
    refuses to delete: a no-op delete would still rewrite every
    table, fold every batch, and re-key the corpus tag."""
    from uofi_payroll_etl_main_demo_spark.ext.ann_index import (
        check_batch_tag,
    )

    for bad in ("", "a,b", "base"):
        with pytest.raises(ValueError, match="invalid batch tag"):
            check_batch_tag(bad)
    d = _docs(spark, sf_dir)
    cdx = str(tmp_path / "cdc")
    cdc_index_build(d.filter(F.col("doc_id") % 4 == 1), cdx, corpus_tag="a")
    with pytest.raises(ValueError, match="invalid batch tag"):
        cdc_index_add(
            d.filter(F.col("doc_id") % 4 == 2), cdx,
            new_corpus_tag="ab", batch_id="b1,b2",
        )
    with pytest.raises(ValueError, match="nothing to delete"):
        cdc_index_delete(spark, cdx, [], new_corpus_tag="x")
    with pytest.raises(ValueError, match="nothing to delete"):
        cdc_index_delete(
            spark, cdx,
            d.filter(F.col("doc_id") < 0).select("doc_id"),
            new_corpus_tag="x",
        )
    # store untouched by the refused deletes
    assert cdc_index_load(spark, cdx).meta["corpus_tag"] == "a"


def test_minhash_delete_by_list_on_string_keyed_store(spark, tmp_path):
    """Delete-by-iterable must type the id frame from the STORE's
    schema — a hardcoded bigint would break stores keyed by string
    ids."""
    rows = [
        (f"doc-{i}", " ".join(f"tok{(i * 7 + j) % 23}" for j in range(40)))
        for i in range(12)
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    idx = str(tmp_path / "mh")
    minhash_index_build(
        docs, idx, corpus_tag="a",
        num_hashes=16, bands=8, k=3, hash_family="portable",
    )
    minhash_index_delete(
        spark, idx, ["doc-3", "doc-7"], new_corpus_tag="post"
    )
    left = {
        r["doc_id"]
        for r in spark.read.parquet(f"{idx}/shingles")
        .select("doc_id").collect()
    }
    assert "doc-3" not in left and "doc-7" not in left
    assert "doc-0" in left


def test_update_is_delete_then_add(spark, tmp_path):
    """The UPDATE/upsert composition a corpus service runs when a
    document's content changes: delete(ids) then add(new content).
    Result identity vs a rebuild over the updated corpus, on both the
    MinHash and CDC stores (signatures and chunk hashes are
    deterministic, so the lifecycle route must land byte-equal
    state)."""
    old2 = " ".join(f"old{(i * 7) % 97}" for i in range(80))
    new2 = " ".join(f"new{(i * 11) % 89}" for i in range(80))
    others = [
        (i, " ".join(f"doc{i}tok{(i * 13 + j) % 101}" for j in range(60)))
        for i in (1, 3, 4, 5)
    ]
    corpus_v1 = spark.createDataFrame(
        others + [(2, old2)], "doc_id bigint, text string"
    )
    corpus_v2 = spark.createDataFrame(
        others + [(2, new2)], "doc_id bigint, text string"
    )
    updated2 = spark.createDataFrame(
        [(2, new2)], "doc_id bigint, text string"
    )
    probe = spark.createDataFrame(
        [(100, new2), (101, old2)], "doc_id bigint, text string"
    )
    params = dict(num_hashes=16, bands=8, k=3, hash_family="portable")

    # MinHash: delete + add == rebuild(v2)
    mh = str(tmp_path / "mh")
    minhash_index_build(corpus_v1, mh, corpus_tag="v1", **params)
    minhash_index_delete(spark, mh, [2], new_corpus_tag="v1-del2")
    minhash_index_add(updated2, mh, new_corpus_tag="v2", batch_id="u2")
    got = sorted(
        (r["new_id"], r["old_id"], round(r["jaccard"], 9))
        for r in minhash_index_load(spark, mh)
        .query(probe, threshold=0.2).collect()
    )
    ref = str(tmp_path / "mh_ref")
    minhash_index_build(corpus_v2, ref, corpus_tag="v2", **params)
    want = sorted(
        (r["new_id"], r["old_id"], round(r["jaccard"], 9))
        for r in minhash_index_load(spark, ref)
        .query(probe, threshold=0.2).collect()
    )
    assert got == want
    # the new content matches, the old content no longer does
    assert any(n == 100 and o == 2 for n, o, _ in got)
    assert not any(n == 101 and o == 2 for n, o, _ in got)

    # CDC: delete + add == rebuild(v2), shared chunks respected
    cdx = str(tmp_path / "cdc")
    cdc_index_build(corpus_v1, cdx, corpus_tag="v1")
    cdc_index_delete(spark, cdx, [2], new_corpus_tag="v1-del2")
    cdc_index_add(updated2, cdx, new_corpus_tag="v2", batch_id="u2")
    got = sorted(
        (r["doc_id"], r["n_chunks"], r["n_seen"])
        for r in cdc_index_load(spark, cdx).query(probe).collect()
    )
    cref = str(tmp_path / "cdc_ref")
    cdc_index_build(corpus_v2, cref, corpus_tag="v2")
    want = sorted(
        (r["doc_id"], r["n_chunks"], r["n_seen"])
        for r in cdc_index_load(spark, cref).query(probe).collect()
    )
    assert got == want
    stored = {
        r["chunk_hash"]
        for r in cdc_index_load(spark, cdx).stored_hashes().collect()
    }
    want_stored = {
        r["chunk_hash"]
        for r in cdc_index_load(spark, cref).stored_hashes().collect()
    }
    assert stored == want_stored  # byte-equal stored state


def test_delete_refuses_uncastable_and_ambiguous_id_frames(
    spark, sf_dir, tmp_path
):
    """(a) Ids that cast to NULL against the store's id type must
    raise — the anti-joins would match nothing and a 'successful'
    erasure would have erased nothing. (b) A multi-column id frame
    without the id column refuses to guess. (c) pq_index_add
    validates batch tags like every other write site."""
    emb = _emb(spark, sf_dir)
    idx = str(tmp_path / "ivf")
    ivf_index_build(emb, idx, n_centroids=4, corpus_tag="a")
    bad = spark.createDataFrame([("doc-3",), ("doc-7",)], "vec_id string")
    with pytest.raises(ValueError, match="NULL"):
        ivf_index_delete(spark, idx, bad, new_corpus_tag="x")
    # multi-column frame WITHOUT the id column: no columns[0] guessing
    ambiguous = emb.select("label", "embedding")
    with pytest.raises(ValueError, match="refusing to guess"):
        ivf_index_delete(spark, idx, ambiguous, new_corpus_tag="x")
    from uofi_payroll_etl_main_demo_spark.ext.ann_index import (
        ivf_index_load,
    )
    assert ivf_index_load(spark, idx).meta["corpus_tag"] == "a"  # untouched
    pq = str(tmp_path / "pq")
    pq_index_build(emb, pq, m=8, n_centroids=16, corpus_tag="a")
    with pytest.raises(ValueError, match="invalid batch tag"):
        pq_index_add(
            emb.limit(1).select(
                (F.col("vec_id") + 10_000).alias("vec_id"), "embedding"
            ),
            pq, new_corpus_tag="b", batch_id="base",
        )
