"""Persisted MinHash dedup index: build → save → load → query → add.

The text analogue of :mod:`~uofi_payroll_etl_main_demo_spark.ext.ann_index`
— the in-query CDC operator (``ext/dedup.py incremental_near_dup_pairs``)
re-shingles and re-signatures the WHOLE corpus on every batch; at
100 TB the daily dedup job should pay for the batch, not the corpus.
This module materializes the corpus' LSH state once:

    {index_dir}/bands/     (doc_id, bh) PARTITIONED BY (band, __batch),
                           sorted by bh within partitions — the
                           candidate join's probe side, ~bands × 16 B
                           per document
    {index_dir}/shingles/  (doc_id, shingle-hash set) PARTITIONED BY
                           __batch — exact-Jaccard verification of
                           candidates without touching document text
    {index_dir}/meta/      one row: format version, params, corpus_tag

Query cost is one signature pass over the NEW batch plus an equi-join
of its band keys against the stored bands table; verification joins
only the candidate ids' stored shingle sets. ``add`` lands a batch's
bands+shingles in that batch's own ``__batch`` partitions (the caller
decides which batch rows survived dedup), so the store grows with the
corpus without ever rebuilding, and replaying an add is idempotent
(dynamic partition overwrite — the exactly-once building block the
streaming ingest path composes on).

Index-vs-inline EQUIVALENCE is the correctness contract: built and
queried with the same parameters, ``MinHashDiskIndex.query`` must
return exactly ``incremental_near_dup_pairs(corpus, batch, ...)`` —
pinned in tests and by the registry oracle (the same portable-family
SQL twin verifies both).

No reference parity: the reference pipeline has no dedup surface;
extension scope (SURVEY.md §2.9 dedup family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from uofi_payroll_etl_main_demo_spark.ext.ann_index import (
    INDEX_FORMAT_VERSION,
    check_batch_tag,
    _compact_swap,
    _folded_tags,
    _merge_folded,
    _fs_exists,
    _invalidate_meta,
    _staged_compactions,
    check_not_compacted_away,
)
from uofi_payroll_etl_main_demo_spark.ext.dedup import (
    _min_sig_agg,
    _shingle_hashes,
    band_key_structs,
    verify_jaccard_pairs,
)

_MH_META_SCHEMA = T.StructType(
    [
        T.StructField("version", T.IntegerType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("id_col", T.StringType(), False),
        T.StructField("text_col", T.StringType(), False),
        T.StructField("num_hashes", T.IntegerType(), False),
        T.StructField("bands", T.IntegerType(), False),
        T.StructField("k", T.IntegerType(), False),
        T.StructField("hash_family", T.StringType(), False),
        T.StructField("corpus_tag", T.StringType(), False),
        # comma-joined sorted SET of __batch tags compactions folded
        # into base (None if never compacted) — membership-tested, see
        # ann_index._merge_folded
        T.StructField("folded_batches", T.StringType(), True),
    ]
)


# Drain-on-next-call persist lifetime (same pattern as the registry's
# _PERSIST_POOL): each build/query/add pins ONE signature frame and
# releases the previous call's — a long-lived CDC daemon holds one
# batch's signatures, not one per processed batch. Sequential callers
# only; a concurrent query on another index would merely recompute
# (unpersist is never a correctness hazard).
_SIG_POOL: list = []


def _banded_and_sets(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int,
    bands: int,
    k: int,
    hash_family: str,
) -> tuple[DataFrame, DataFrame]:
    """One shingle pass → ((id, band, bh) band rows, (id, set) shingle
    sets). The per-doc wide frame is persisted because both outputs
    consume it; lifetime is bounded by the module pool above."""
    from uofi_payroll_etl_main_demo_spark.cache import swap_pooled

    per_doc = swap_pooled(
        _SIG_POOL,
        _min_sig_agg(
            _shingle_hashes(df, text_col, id_col, k, hash_family),
            id_col,
            num_hashes,
            F.collect_list("sh").alias("__set"),
            hash_family=hash_family,
        ),
    )
    banded = per_doc.select(
        F.col(id_col),
        F.explode(F.array(*band_key_structs(num_hashes, bands))).alias("bk"),
    ).select(
        id_col, F.col("bk.band").alias("band"), F.col("bk.bh").alias("bh")
    )
    sets_ = per_doc.select(F.col(id_col), F.col("__set"))
    return banded, sets_


def minhash_index_build(
    corpus: DataFrame,
    index_dir: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 16,
    k: int = 4,
    hash_family: str = "portable",
    corpus_tag: str = "",
    batch_tag: str = "base",
) -> None:
    """Shingle + signature + band the corpus ONCE, persist the LSH
    state. Meta invalidated first / written last — same crash contract
    as the ANN builds. ``batch_tag`` names the build's own ``__batch``
    partition (the streaming ingester builds from its FIRST micro-batch
    and must be able to exclude/overwrite it on replay like any other
    batch)."""
    spark = corpus.sparkSession
    if batch_tag != "base":
        check_batch_tag(batch_tag)
    _invalidate_meta(spark, index_dir)
    banded, sets_ = _banded_and_sets(
        corpus, text_col, id_col, num_hashes, bands, k, hash_family
    )
    # __batch is the idempotence unit for minhash_index_add. band stays
    # the first partition level, so the candidate join's layout is
    # unchanged.
    (
        banded.repartition("band")
        .sortWithinPartitions("bh")
        .withColumn("__batch", F.lit(batch_tag))
        .write.mode("overwrite")
        .partitionBy("band", "__batch")
        .parquet(f"{index_dir}/bands")
    )
    (
        sets_.withColumn("__batch", F.lit(batch_tag))
        .write.mode("overwrite")
        .partitionBy("__batch")
        .parquet(f"{index_dir}/shingles")
    )
    spark.createDataFrame(
        [
            {
                "version": INDEX_FORMAT_VERSION,
                "kind": "minhash",
                "id_col": id_col,
                "text_col": text_col,
                "num_hashes": num_hashes,
                "bands": bands,
                "k": k,
                "hash_family": hash_family,
                "corpus_tag": corpus_tag,
                "folded_batches": None,
            }
        ],
        _MH_META_SCHEMA,
    ).coalesce(1).write.mode("overwrite").parquet(f"{index_dir}/meta")


def _read_mh_meta(spark: SparkSession, index_dir: str) -> dict:
    rows = spark.read.parquet(f"{index_dir}/meta").collect()
    if len(rows) != 1:
        raise ValueError(f"corrupt index meta at {index_dir}: {len(rows)} rows")
    meta = rows[0].asDict()
    if meta["version"] != INDEX_FORMAT_VERSION:
        raise ValueError(
            f"index format v{meta['version']} at {index_dir}; "
            f"this build reads v{INDEX_FORMAT_VERSION}"
        )
    if meta["kind"] != "minhash":
        raise ValueError(
            f"{index_dir} holds a {meta['kind']!r} index, not minhash"
        )
    meta.setdefault("folded_batches", None)
    return meta


class MinHashDiskIndex:
    """Loaded handle: params on the driver, band/shingle tables lazy."""

    def __init__(self, spark: SparkSession, index_dir: str, meta: dict):
        self.spark = spark
        self.index_dir = index_dir
        self.meta = meta

    def _stored(self, table: str, exclude_batch: str | None) -> DataFrame:
        df = self.spark.read.parquet(f"{self.index_dir}/{table}")
        if exclude_batch is not None:
            # partition filter — metadata-only prune, no data read
            df = df.filter(F.col("__batch") != exclude_batch)
        return df

    def query(
        self,
        batch: DataFrame,
        threshold: float = 0.5,
        max_bucket_size: int | None = None,
        check_disjoint: bool = True,
        exclude_batch: str | None = None,
    ) -> DataFrame:
        """(new_id, old_id, jaccard ≥ threshold): which batch documents
        near-duplicate the INDEXED corpus. One signature pass over the
        batch; the corpus contributes only stored band rows (equi-join
        on (band, bh)) and the candidates' stored shingle sets — the
        corpus text is never read, never re-shingled.

        ``max_bucket_size`` drops candidates whose stored band bucket
        exceeds the cap (the boilerplate mega-bucket valve, applied on
        the CORPUS side where the skew lives). Batch ids must be
        disjoint from indexed ids — an overlapping id would silently
        verify candidates against the WRONG side's shingle set, so
        ``check_disjoint`` (default on) raises loudly on overlap at
        the cost of one id-only semi-join against the stored shingle
        ids (a column-pruned scan; pass ``False`` on hot serving paths
        where the caller guarantees disjointness).

        ``exclude_batch`` drops one stored ``__batch`` partition from
        the corpus side (a metadata-only partition prune) — the replay
        hook for at-least-once ingestion: a crashed attempt's own
        half-written partition must never act as "the corpus" when its
        batch re-runs. Excluding a batch a compaction already folded
        raises (see ann_index.check_not_compacted_away)."""
        m = self.meta
        check_not_compacted_away(m, exclude_batch)
        id_col, text_col = m["id_col"], m["text_col"]
        if check_disjoint:
            overlap = (
                batch.select(F.col(id_col))
                .join(
                    self._stored("shingles", exclude_batch).select(
                        F.col(id_col)
                    ),
                    id_col,
                    "left_semi",
                )
                .limit(1)
                .collect()
            )
            if overlap:
                raise ValueError(
                    f"batch id {overlap[0][0]!r} is already indexed at "
                    f"{self.index_dir} — batch ids must be disjoint from "
                    "indexed ids (query-then-add, never re-query added rows)"
                )
        new_banded, new_sets = _banded_and_sets(
            batch,
            text_col,
            id_col,
            m["num_hashes"],
            m["bands"],
            m["k"],
            m["hash_family"],
        )
        stored = self._stored("bands", exclude_batch).select(
            id_col, "band", "bh"
        )
        if max_bucket_size is not None:
            from pyspark.sql import Window

            cnt = F.count(F.lit(1)).over(
                Window.partitionBy("band", "bh")
            )
            stored = (
                stored.withColumn("__bn", cnt)
                .filter(F.col("__bn") <= max_bucket_size)
                .drop("__bn")
            )
        cand = (
            new_banded.withColumnRenamed(id_col, "new_id")
            .join(
                stored.withColumnRenamed(id_col, "old_id"),
                ["band", "bh"],
            )
            .select("new_id", "old_id")
            .dropDuplicates(["new_id", "old_id"])
        )
        old_sets = self._stored("shingles", exclude_batch).select(
            id_col, "__set"
        )
        return verify_jaccard_pairs(
            cand, new_sets, old_sets, id_col, threshold
        )


def minhash_index_load(spark: SparkSession, index_dir: str) -> MinHashDiskIndex:
    return MinHashDiskIndex(spark, index_dir, _read_mh_meta(spark, index_dir))


def minhash_index_add(
    batch: DataFrame,
    index_dir: str,
    *,
    new_corpus_tag: str,
    batch_id: str | None = None,
) -> None:
    """Add a batch's LSH state (bands + shingle sets) to the store —
    the accept-into-corpus half of the CDC loop (query first, then add
    the survivors). Re-keys the corpus tag; no earlier batch's file is
    rewritten.

    IDEMPOTENT per ``batch_id`` (defaults to ``new_corpus_tag``): the
    batch's rows land in ``__batch={batch_id}`` partitions via dynamic
    partition overwrite, so replaying an add — after a crash, or from
    an at-least-once delivery (the streaming foreachBatch path in
    streaming/corpus.py) — REPLACES that batch's partitions instead of
    duplicating band/shingle rows. Meta (the corpus re-key) is written
    last: a crash mid-add leaves the previous tag over a partial
    batch, and the replay the delivery contract owes heals the data
    before the tag advances. Distinct batches must use distinct batch
    ids; reusing one overwrites the earlier batch."""
    spark = batch.sparkSession
    meta = _read_mh_meta(spark, index_dir)
    tag = check_batch_tag(
        batch_id if batch_id is not None else new_corpus_tag
    )
    # a replayed add of a batch a compaction already folded would
    # duplicate its band/shingle rows (they live in base now): refuse
    check_not_compacted_away(meta, tag)
    banded, sets_ = _banded_and_sets(
        batch,
        meta["text_col"],
        meta["id_col"],
        meta["num_hashes"],
        meta["bands"],
        meta["k"],
        meta["hash_family"],
    )
    (
        banded.repartition("band")
        .sortWithinPartitions("bh")
        .withColumn("__batch", F.lit(tag))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("band", "__batch")
        .parquet(f"{index_dir}/bands")
    )
    (
        sets_.withColumn("__batch", F.lit(tag))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("__batch")
        .parquet(f"{index_dir}/shingles")
    )
    spark.createDataFrame(
        [{**meta, "corpus_tag": new_corpus_tag}], _MH_META_SCHEMA
    ).coalesce(1).write.mode("overwrite").parquet(f"{index_dir}/meta")


def minhash_index_compact(spark: SparkSession, index_dir: str) -> None:
    """Fold every add's ``__batch`` partition (bands + shingles) into
    ``base`` — the small-file maintenance pass of the add-forever
    lifecycle (see ann_index._compact_swap for the crash contract:
    both rewrites stage non-destructively before meta is touched).
    The bands table's layout contract (partitioned by band, sorted by
    bh within partitions) is restored during the rewrite; query
    results are unchanged. Records the folded batch set so a
    post-compaction replay of a folded batch fails loudly instead of
    self-matching. Run at a quiescent point only (no uncommitted
    streaming batch)."""
    meta = _read_mh_meta(spark, index_dir)
    folded = _merge_folded(meta, _folded_tags(spark, index_dir, "shingles"))
    swaps = _staged_compactions(
        spark,
        index_dir,
        [
            (
                "bands",
                ["band", "__batch"],
                lambda df: df.repartition("band").sortWithinPartitions("bh"),
            ),
            ("shingles", ["__batch"], None),
        ],
    )
    _invalidate_meta(spark, index_dir)
    for swap in swaps:
        swap()
    spark.createDataFrame(
        [{**meta, "folded_batches": folded}],
        _MH_META_SCHEMA,
    ).coalesce(1).write.mode("overwrite").parquet(f"{index_dir}/meta")


def minhash_index_stats(spark: SparkSession, index_dir: str) -> DataFrame:
    """Per-band health panel: (band, n_rows, n_batches,
    max_bucket_size) — the observability the LSH store's mega-bucket
    valve is tuned against: ``max_bucket_size`` approaching the
    query-time cap means boilerplate is concentrating in buckets and
    candidate work is about to get clipped (raise the cap, or clean
    the corpus). One aggregate over band rows (ids/keys only; shingle
    sets never read)."""
    _read_mh_meta(spark, index_dir)  # kind + version guard
    bands = spark.read.parquet(f"{index_dir}/bands")
    # n_batches must be the BAND's distinct batch count (the
    # small-file/compaction meter — 50 adds = 51 partition dirs per
    # band even when every bucket holds one batch), so it aggregates
    # from band rows directly; only max_bucket_size goes through the
    # per-bucket sub-aggregate
    buckets = (
        bands.groupBy("band", "bh")
        .agg(F.count(F.lit(1)).alias("__n"))
        .groupBy("band")
        .agg(F.max("__n").cast("bigint").alias("max_bucket_size"))
    )
    per_band = bands.groupBy("band").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.countDistinct("__batch").alias("n_batches"),
    )
    return per_band.join(buckets, "band").orderBy("band")


def minhash_index_delete(
    spark: SparkSession, index_dir: str, ids, *, new_corpus_tag: str
) -> None:
    """Remove documents by id from the LSH store — band rows and
    shingle sets both (a dangling band row would still surface the
    deleted doc as a candidate; a dangling shingle set would verify
    it). Staged rewrite minus the ids, folding batches to base so
    pre-delete replays raise via ``folded_batches`` (see
    ann_index._staged_delete); the bands table's layout contract
    (partitioned by band, sorted by bh) is restored during the
    rewrite. ``new_corpus_tag`` REQUIRED — the corpus changed."""
    from uofi_payroll_etl_main_demo_spark.ext.ann_index import (
        _ids_frame,
        _staged_delete,
    )

    meta = _read_mh_meta(spark, index_dir)
    id_col = meta["id_col"]
    dead = _ids_frame(spark, ids, id_col, f"{index_dir}/shingles")

    def _write(row: dict) -> None:
        spark.createDataFrame([row], _MH_META_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{index_dir}/meta")

    _staged_delete(
        spark,
        index_dir,
        meta,
        "shingles",
        [
            (
                "bands",
                ["band", "__batch"],
                lambda df: df.join(dead, id_col, "left_anti")
                .repartition("band")
                .sortWithinPartitions("bh"),
            ),
            (
                "shingles",
                ["__batch"],
                lambda df: df.join(dead, id_col, "left_anti"),
            ),
        ],
        {"corpus_tag": new_corpus_tag},
        _write,
        cleanup_frames=(dead,),
    )


def ensure_minhash_index(
    corpus: DataFrame,
    index_dir: str,
    *,
    corpus_tag: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 16,
    k: int = 4,
    hash_family: str = "portable",
) -> MinHashDiskIndex:
    """Load-or-build keyed by params + corpus_tag (see ann_index)."""
    spark = corpus.sparkSession
    if _fs_exists(spark, f"{index_dir}/meta"):
        try:
            meta = _read_mh_meta(spark, index_dir)
        except Exception:
            meta = None
        if (
            meta
            and meta["corpus_tag"] == corpus_tag
            and meta["num_hashes"] == num_hashes
            and meta["bands"] == bands
            and meta["k"] == k
            and meta["hash_family"] == hash_family
            and meta["id_col"] == id_col
            and meta["text_col"] == text_col
        ):
            return MinHashDiskIndex(spark, index_dir, meta)
    minhash_index_build(
        corpus,
        index_dir,
        text_col=text_col,
        id_col=id_col,
        num_hashes=num_hashes,
        bands=bands,
        k=k,
        hash_family=hash_family,
        corpus_tag=corpus_tag,
    )
    return minhash_index_load(spark, index_dir)
