"""Persisted CDC chunk index: build → load → query → add.

The containment twin of :mod:`~uofi_payroll_etl_main_demo_spark.ext.dedup_index`
— the in-query operator (``ext/cdc.py cdc_containment``) re-chunks and
re-distincts the ENTIRE corpus on every batch query; a daily
crawl-triage job at 100 TB should pay for the batch, not the corpus.
This module materializes the corpus' distinct chunk-hash set once:

    {index_dir}/chunks/  (chunk_hash) PARTITIONED BY __batch —
                         GLOBALLY DISTINCT by construction (adds
                         anti-join against the stored set before
                         appending), so the serving join needs no
                         re-distinct; ~33 B per distinct chunk
    {index_dir}/owners/  (doc_id, chunk_hash) provenance pairs,
                         PARTITIONED BY __batch — which documents hold
                         which chunks. NEVER read by the serving path;
                         it exists so ``cdc_index_delete`` can erase a
                         document EXACTLY: a chunk hash leaves the
                         store only when no surviving document still
                         holds it (a bare hash set cannot answer that)
    {index_dir}/meta/    one row: format version, params, corpus_tag

Query cost is one chunk pass over the NEW batch plus a hash join of
its chunk hashes against the stored set — corpus text is never read,
never re-chunked. ``add`` lands a batch's previously-unseen hashes in
that batch's own ``__batch`` partition via dynamic partition
overwrite, so replaying an add (crash recovery, at-least-once
delivery) replaces instead of duplicating; meta (the corpus re-key)
is written last, same contract as the MinHash/ANN stores.

Index-vs-inline EQUIVALENCE is the correctness contract: built and
queried with the same parameters, ``CdcDiskIndex.query`` must return
exactly ``cdc_containment(corpus, batch, ...)`` — both run the shared
``containment_scores`` tail, pinned in tests and by the registry
oracle (the same SQL twin verifies both).

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
from uofi_payroll_etl_main_demo_spark.ext.cdc import (
    cdc_chunks,
    containment_scores,
    containment_scores_within,
)

_CDC_META_SCHEMA = T.StructType(
    [
        T.StructField("version", T.IntegerType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("id_col", T.StringType(), False),
        T.StructField("text_col", T.StringType(), False),
        T.StructField("window", T.IntegerType(), False),
        T.StructField("divisor", T.IntegerType(), False),
        T.StructField("corpus_tag", T.StringType(), False),
        # comma-joined sorted SET of __batch tags compactions folded
        # into base (None if never compacted) — membership-tested, see
        # ann_index._merge_folded
        T.StructField("folded_batches", T.StringType(), True),
    ]
)


def cdc_index_build(
    corpus: DataFrame,
    index_dir: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
    divisor: int = 64,
    corpus_tag: str = "",
    batch_tag: str = "base",
) -> None:
    """Chunk the corpus ONCE, persist its distinct chunk-hash set.
    Meta invalidated first / written last — same crash contract as the
    other index builds. ``batch_tag`` names the build's own ``__batch``
    partition (the streaming ingester builds from its first micro-batch
    and must exclude/overwrite it on replay like any other batch)."""
    spark = corpus.sparkSession
    if batch_tag != "base":
        check_batch_tag(batch_tag)
    _invalidate_meta(spark, index_dir)
    # one chunk pass feeds both tables: pin the distinct pairs so the
    # owners write does not re-chunk the corpus
    pairs = (
        cdc_chunks(corpus, id_col, text_col, window, divisor)
        .select("doc_id", "chunk_hash")
        .distinct()
        .persist()
    )
    try:
        (
            pairs.select("chunk_hash")
            .distinct()
            .withColumn("__batch", F.lit(batch_tag))
            .write.mode("overwrite")
            .partitionBy("__batch")
            .parquet(f"{index_dir}/chunks")
        )
        (
            pairs.withColumn("__batch", F.lit(batch_tag))
            .write.mode("overwrite")
            .partitionBy("__batch")
            .parquet(f"{index_dir}/owners")
        )
    finally:
        pairs.unpersist()
    spark.createDataFrame(
        [
            {
                "version": INDEX_FORMAT_VERSION,
                "kind": "cdc",
                "id_col": id_col,
                "text_col": text_col,
                "window": window,
                "divisor": divisor,
                "corpus_tag": corpus_tag,
                "folded_batches": None,
            }
        ],
        _CDC_META_SCHEMA,
    ).coalesce(1).write.mode("overwrite").parquet(f"{index_dir}/meta")


def _read_cdc_meta(spark: SparkSession, index_dir: str) -> dict:
    rows = spark.read.parquet(f"{index_dir}/meta").collect()
    if len(rows) != 1:
        raise ValueError(f"corrupt index meta at {index_dir}: {len(rows)} rows")
    meta = rows[0].asDict()
    if meta["version"] != INDEX_FORMAT_VERSION:
        raise ValueError(
            f"index format v{meta['version']} at {index_dir}; "
            f"this build reads v{INDEX_FORMAT_VERSION}"
        )
    if meta["kind"] != "cdc":
        raise ValueError(f"{index_dir} holds a {meta['kind']!r} index, not cdc")
    meta.setdefault("folded_batches", None)
    return meta


class CdcDiskIndex:
    """Loaded handle: params on the driver, the chunk table lazy."""

    def __init__(self, spark: SparkSession, index_dir: str, meta: dict):
        self.spark = spark
        self.index_dir = index_dir
        self.meta = meta

    def stored_hashes(self, exclude_batch: str | None = None) -> DataFrame:
        """The corpus' distinct (chunk_hash) set — globally distinct by
        the build/add construction, so no re-distinct is needed.
        ``exclude_batch`` drops one ``__batch`` partition (metadata-only
        prune) — the replay hook: a crashed attempt's half-written
        partition must not act as "the corpus" when its batch re-runs."""
        df = self.spark.read.parquet(f"{self.index_dir}/chunks")
        if exclude_batch is not None:
            df = df.filter(F.col("__batch") != exclude_batch)
        return df.select("chunk_hash")

    def query(
        self, batch: DataFrame, exclude_batch: str | None = None
    ) -> DataFrame:
        """(doc_id, n_chunks, n_seen, containment) for every batch doc
        — exactly ``cdc_containment(corpus, batch)``, but the corpus
        contributes only its STORED hash set (never re-read, never
        re-chunked): per-query cost is the batch chunk pass + one
        integer/md5 hash join. A replay excluding a batch that a
        compaction already folded raises (see
        ann_index.check_not_compacted_away)."""
        m = self.meta
        check_not_compacted_away(m, exclude_batch)
        new = cdc_chunks(
            batch, m["id_col"], m["text_col"], m["window"], m["divisor"]
        )
        batch_ids = batch.select(
            F.col(m["id_col"]).alias("doc_id")
        ).distinct()
        return containment_scores(
            new, self.stored_hashes(exclude_batch), batch_ids
        )

    def query_gated(
        self, batch: DataFrame, exclude_batch: str | None = None
    ) -> DataFrame:
        """:meth:`query` plus within-batch awareness (the ingestion
        gate's scoring law): a chunk also counts as seen when a
        smaller-id document in the SAME batch holds it, so documents
        assembled from batch-mates are caught too — see
        ``cdc.containment_scores_within`` for the exact (deterministic,
        arrival-order-independent) semantics."""
        m = self.meta
        check_not_compacted_away(m, exclude_batch)
        new = cdc_chunks(
            batch, m["id_col"], m["text_col"], m["window"], m["divisor"]
        )
        batch_ids = batch.select(
            F.col(m["id_col"]).alias("doc_id")
        ).distinct()
        return containment_scores_within(
            new, self.stored_hashes(exclude_batch), batch_ids
        )


def cdc_index_load(spark: SparkSession, index_dir: str) -> CdcDiskIndex:
    return CdcDiskIndex(spark, index_dir, _read_cdc_meta(spark, index_dir))


def cdc_index_add(
    batch: DataFrame,
    index_dir: str,
    *,
    new_corpus_tag: str,
    batch_id: str | None = None,
) -> None:
    """Accept a batch into the corpus: chunk it and add its
    PREVIOUSLY-UNSEEN distinct hashes (anti-join against the stored
    set) to the store, keeping the table globally distinct.

    IDEMPOTENT per ``batch_id`` (defaults to ``new_corpus_tag``): the
    new hashes land in ``__batch={batch_id}`` partitions via dynamic
    partition overwrite, and the anti-join reference EXCLUDES the
    batch's own partition — so a replay (after a crash, or from an
    at-least-once delivery) recomputes the same rows and replaces
    them. Meta is written last; distinct batches must use distinct
    batch ids."""
    spark = batch.sparkSession
    meta = _read_cdc_meta(spark, index_dir)
    tag = check_batch_tag(
        batch_id if batch_id is not None else new_corpus_tag
    )
    # a folded batch's hashes live in base: a replayed add would write
    # an empty partition and re-key meta under a stale tag — refuse
    check_not_compacted_away(meta, tag)
    stored_other = (
        spark.read.parquet(f"{index_dir}/chunks")
        .filter(F.col("__batch") != tag)  # partition filter: replay-safe
        .select("chunk_hash")
    )
    pairs = (
        cdc_chunks(
            batch,
            meta["id_col"],
            meta["text_col"],
            meta["window"],
            meta["divisor"],
        )
        .select("doc_id", "chunk_hash")
        .distinct()
        .persist()  # feeds the fresh-hash write AND the owners write
    )
    try:
        fresh = (
            pairs.select("chunk_hash")
            .distinct()
            .join(stored_other, "chunk_hash", "left_anti")
        )
        (
            fresh.withColumn("__batch", F.lit(tag))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__batch")
            .parquet(f"{index_dir}/chunks")
        )
        # owners records ALL of the batch's pairs (not just fresh
        # hashes): erasure refcounting needs every holder of a hash
        (
            pairs.withColumn("__batch", F.lit(tag))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__batch")
            .parquet(f"{index_dir}/owners")
        )
    finally:
        pairs.unpersist()
    spark.createDataFrame(
        [{**meta, "corpus_tag": new_corpus_tag}], _CDC_META_SCHEMA
    ).coalesce(1).write.mode("overwrite").parquet(f"{index_dir}/meta")


def cdc_index_compact(spark: SparkSession, index_dir: str) -> None:
    """Fold every add's ``__batch`` partition of the chunk table into
    ``base`` (see ann_index._compact_swap for the crash contract: the
    rewrite stages non-destructively before meta is touched). The
    stored set is globally distinct across batches by the add
    construction, so the fold is a pure re-layout — no re-distinct.
    Records the folded batch set so a post-compaction replay of a
    folded batch fails loudly instead of scoring against its own
    chunks. Run at a quiescent point only (no uncommitted streaming
    batch)."""
    meta = _read_cdc_meta(spark, index_dir)
    folded = _merge_folded(meta, _folded_tags(spark, index_dir, "chunks"))
    swaps = _staged_compactions(
        spark,
        index_dir,
        [("chunks", ["__batch"], None), ("owners", ["__batch"], None)],
    )
    _invalidate_meta(spark, index_dir)
    for swap in swaps:
        swap()
    spark.createDataFrame(
        [{**meta, "folded_batches": folded}],
        _CDC_META_SCHEMA,
    ).coalesce(1).write.mode("overwrite").parquet(f"{index_dir}/meta")


def cdc_index_delete(
    spark: SparkSession, index_dir: str, ids, *, new_corpus_tag: str
) -> None:
    """Erase documents by id from the CDC store — EXACTLY: a chunk
    hash leaves the serving set only when NO surviving document still
    holds it (the owners provenance table answers that; a bare hash
    set cannot, which is why the table exists). Cost is one owners
    scan + two hash joins — never a corpus re-chunk.

    Staged rewrite of both tables minus the dead rows, folding batches
    to base so a pre-delete replay raises via ``folded_batches`` (a
    replayed add could otherwise resurrect erased hashes).
    ``new_corpus_tag`` REQUIRED — the corpus changed. Quiescent-point
    op, same as compaction."""
    from uofi_payroll_etl_main_demo_spark.ext.ann_index import (
        _ids_frame,
        _staged_delete,
    )

    meta = _read_cdc_meta(spark, index_dir)
    dead_ids = _ids_frame(spark, ids, "doc_id", f"{index_dir}/owners")
    owners = spark.read.parquet(f"{index_dir}/owners")
    # hashes held by a dead doc AND by no surviving doc
    dead_hashes = (
        owners.join(dead_ids, "doc_id", "left_semi")
        .select("chunk_hash")
        .distinct()
        .join(
            owners.join(dead_ids, "doc_id", "left_anti").select("chunk_hash"),
            "chunk_hash",
            "left_anti",
        )
    )

    def _write(row: dict) -> None:
        spark.createDataFrame([row], _CDC_META_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{index_dir}/meta")

    _staged_delete(
        spark,
        index_dir,
        meta,
        "chunks",
        [
            (
                "chunks",
                ["__batch"],
                lambda df: df.join(dead_hashes, "chunk_hash", "left_anti"),
            ),
            (
                "owners",
                ["__batch"],
                lambda df: df.join(dead_ids, "doc_id", "left_anti"),
            ),
        ],
        {"corpus_tag": new_corpus_tag},
        _write,
        cleanup_frames=(dead_ids,),
    )


def cdc_index_stats(spark: SparkSession, index_dir: str) -> DataFrame:
    """One-row health panel: (n_hashes, n_batches, n_owner_pairs,
    n_docs) — stored-set size vs provenance size is the erasure-cost
    meter (owners rows per distinct hash ≈ how much shared content the
    corpus carries), and n_batches against the compaction cadence is
    the small-file meter, same as the other stores."""
    _read_cdc_meta(spark, index_dir)  # kind + version guard
    chunks = spark.read.parquet(f"{index_dir}/chunks").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hashes"),
        F.countDistinct("__batch").alias("n_batches"),
    )
    owners = spark.read.parquet(f"{index_dir}/owners").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_owner_pairs"),
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
    )
    return chunks.crossJoin(owners)


def ensure_cdc_index(
    corpus: DataFrame,
    index_dir: str,
    *,
    corpus_tag: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
    divisor: int = 64,
) -> CdcDiskIndex:
    """Load-or-build keyed by params + corpus_tag (see ann_index)."""
    spark = corpus.sparkSession
    if _fs_exists(spark, f"{index_dir}/meta"):
        try:
            meta = _read_cdc_meta(spark, index_dir)
        except Exception:
            meta = None
        if (
            meta
            and meta["corpus_tag"] == corpus_tag
            and meta["window"] == window
            and meta["divisor"] == divisor
            and meta["id_col"] == id_col
            and meta["text_col"] == text_col
        ):
            return CdcDiskIndex(spark, index_dir, meta)
    cdc_index_build(
        corpus,
        index_dir,
        id_col=id_col,
        text_col=text_col,
        window=window,
        divisor=divisor,
        corpus_tag=corpus_tag,
    )
    return cdc_index_load(spark, index_dir)
