"""Content-defined chunking (CDC) — shift-robust chunk-level dedup.

Fixed-width chunking (``chunk_documents``, ``chunk_dedup_rewrite``)
breaks under INSERTION: one added sentence shifts every later chunk
boundary, so no downstream hash matches again. Content-defined
chunking places boundaries where a rolling hash of the LOCAL window
satisfies a divisor condition (the LBFS/Rabin scheme; FastCDC is the
gear-hash descendant), so boundaries re-synchronize right after an
edit and every later chunk hashes identically — the property backup
systems, artifact stores and near-dup corpus pipelines rely on.

This implementation deliberately uses the WINDOWED form (hash of the
last ``window`` codepoints only, no running-from-boundary state):
boundary decisions depend on nothing but local content, which makes
the operator embarrassingly parallel (numpy over Arrow batches, no
sequential scan per corpus) AND gives it an exact SQL oracle via
``lag``/window functions — no recursion, no state machine.

Law (shared by numpy, the Spark mapInPandas path, and the DuckDB
oracle; all-integer, engine-exact):

    H(t)   = sum_{k=0..W-1} codepoint(t-k) * P^k  (mod M)
    bound  at t  iff  t >= W-1 and H(t) % D == 0
    chunks = maximal runs between boundaries (boundary char is the
             LAST char of its chunk; the final partial chunk is kept)

with P = 1000003, M = 2^31 - 1, W = 8, D = 64 (expected chunk ~64
chars). No min/max chunk bounds: bounds would couple a boundary to
the previous one and re-serialize the scan — the trade is documented,
not hidden (pathological inputs can yield 1-char chunks; they stay
deterministic and oracle-identical).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "CDC_P",
    "CDC_M",
    "cdc_chunks",
    "cdc_chunk_spans",
    "cdc_containment",
    "containment_scores",
    "poly_gram_hashes",
    "substring_dedup_spans",
]

CDC_P = 1000003
CDC_M = 2147483647  # 2^31 - 1


def poly_gram_hashes(text: str, width: int):
    """Polynomial hash of every ``width``-codepoint gram of ``text``
    (position t carries ``sum_k code(t+width-1-k) * P^k mod M`` — the
    hash of the gram ENDING at t+width-1, indexed by its START t).
    Vectorized over positions; the one law shared by the chunker, the
    substring-dedup grams and the SQL oracles."""
    import numpy as np

    n = len(text)
    if n < width:
        return np.zeros(0, dtype=np.int64)
    if width > 2048:
        # keeps the single-correlate intermediate exact in int64:
        # max_codepoint (2^20.1) * width * max_pow (< 2^31) < 2^63
        raise ValueError(f"width = {width} exceeds exact-int64 bound (2048)")
    # one C-level correlation per doc instead of `width` strided
    # passes: kernel[i] = P^(width-1-i), so the window ending at
    # t+width-1 lands at output t — measured 15x faster at width 40
    # over the sf0.1 corpus, bit-identical (sums stay under 2^57)
    kernel = np.array(
        [pow(CDC_P, width - 1 - i, CDC_M) for i in range(width)],
        dtype=np.int64,
    )
    codes = np.frombuffer(text.encode("utf-32-le"), dtype="<u4").astype(
        np.int64
    )
    return np.correlate(codes, kernel, "valid") % CDC_M

CDC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("chunk_idx", T.LongType(), False),
        T.StructField("start", T.LongType(), False),
        T.StructField("chunk_len", T.LongType(), False),
        T.StructField("chunk_hash", T.StringType(), False),
    ]
)


def cdc_chunk_spans(text: str, window: int = 8, divisor: int = 64):
    """(start, length) spans of one document's content-defined chunks
    — the scalar law, vectorized over positions with numpy. Shared by
    the Spark batch path and the tests so the two cannot drift."""
    import numpy as np

    n = len(text)
    if n == 0:
        return []
    bounds = []
    if n >= window:
        h = poly_gram_hashes(text, window)
        bounds = np.nonzero(h % divisor == 0)[0] + (window - 1)
    spans, start = [], 0
    for b in bounds:
        spans.append((start, int(b) - start + 1))
        start = int(b) + 1
    if start < n:
        spans.append((start, n - start))
    return spans


def cdc_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
    divisor: int = 64,
) -> DataFrame:
    """One row per content-defined chunk: ``(doc_id, chunk_idx, start,
    chunk_len, chunk_hash)`` with ``chunk_hash = md5(utf8(chunk))``.

    ``mapInPandas`` over Arrow batches: each document is chunked
    independently (boundaries are window-local), so the operator
    scales with ``rows / executors`` and shuffles NOTHING — the output
    partitioning is the input's. Downstream dedup
    (``groupBy(chunk_hash)``) shuffles only (hash, id) pairs, never
    text. Null texts are skipped (no spans), matching the oracle's
    inner explode."""
    if window < 2:
        raise ValueError(f"window must be >= 2: {window}")
    if divisor < 2:
        raise ValueError(f"divisor must be >= 2: {divisor}")

    def batches(it: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in it:
            out = {k: [] for k in
                   ("doc_id", "chunk_idx", "start", "chunk_len", "chunk_hash")}
            for did, text in zip(pdf[id_col], pdf[text_col]):
                if text is None:
                    continue
                for i, (s, ln) in enumerate(
                    cdc_chunk_spans(text, window, divisor)
                ):
                    out["doc_id"].append(did)
                    out["chunk_idx"].append(i)
                    out["start"].append(s)
                    out["chunk_len"].append(ln)
                    out["chunk_hash"].append(
                        hashlib.md5(text[s : s + ln].encode()).hexdigest()
                    )
            yield pd.DataFrame(out).astype(
                {
                    "doc_id": "int64",
                    "chunk_idx": "int64",
                    "start": "int64",
                    "chunk_len": "int64",
                    "chunk_hash": "str",
                }
            )

    # NOT widened via scale_input_parallelism: unlike the width-gram
    # scan (_gram_rows, ~12 rows out per corpus char), the per-doc
    # chunker emits ~1 row per 64 chars and its numpy work is light —
    # the A/B read flat-to-slower (chunks 0.52→0.54, containment
    # 0.98→1.16 at sf0.1), the exchange costs more than the Python
    # parallelism buys. Documented negative, r12.
    return df.select(id_col, text_col).mapInPandas(batches, CDC_SCHEMA)


# Session-bounded persist pool — see cache.swap_pooled for the
# lifetime contract (one cached gram frame per session, not one per
# substring_dedup_spans invocation).
_GRAM_POOL: list = []

def cdc_containment(
    corpus: DataFrame,
    batch: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
    divisor: int = 64,
) -> DataFrame:
    """Chunk-level containment of a NEW batch against an existing
    corpus: each batch document's content-defined chunks are matched
    by hash against the corpus's distinct chunk hashes, and the doc
    reports ``containment = n_seen / n_chunks`` — "how much of
    today's crawl is content we already have", the curation metric
    fixed-width chunking can't deliver under edits (CDC boundaries
    re-synchronize, so moved-but-unchanged passages still match).

    Incremental by construction: per-batch cost is the batch's chunk
    pass + one hash join against DISTINCT corpus hashes (integers +
    md5 strings — chunk text never shuffles); the corpus side is the
    reusable build artifact — persisted as exactly that by
    :mod:`~uofi_payroll_etl_main_demo_spark.ext.cdc_index`, which
    serves this same metric without re-chunking the corpus per batch.

    Returns (doc_id, n_chunks, n_seen, containment) for EVERY batch
    doc — a NULL/empty-text document produces no chunks and reports
    ``(0, 0, NULL)`` instead of vanishing from the audit (a gate
    filtering on containment must still see it)."""
    old = (
        cdc_chunks(corpus, id_col, text_col, window, divisor)
        .select("chunk_hash")
        .distinct()
    )
    new = cdc_chunks(batch, id_col, text_col, window, divisor)
    return containment_scores(
        new, old, batch.select(F.col(id_col).alias("doc_id")).distinct()
    )


def containment_scores(
    new_chunks: DataFrame, old_hashes: DataFrame, batch_ids: DataFrame
) -> DataFrame:
    """The ONE containment-arithmetic tail shared by the inline
    operator above and the persisted-index serving path
    (ext/cdc_index.py) — both must score with identical math or their
    pinned equivalence silently breaks (the same shared-law contract
    as dedup.verify_jaccard_pairs). ``old_hashes`` must be a DISTINCT
    (chunk_hash) frame; ``batch_ids`` a distinct (doc_id) frame."""
    marked = new_chunks.join(
        old_hashes.withColumn("__seen", F.lit(1)), "chunk_hash", "left"
    )
    return _score_marked_chunks(marked, batch_ids)


def _score_marked_chunks(marked: DataFrame, batch_ids: DataFrame) -> DataFrame:
    """Shared containment arithmetic over chunks whose ``__seen``
    column is 1/NULL — the one place the n_seen/n_chunks math lives."""
    scored = marked.groupBy(F.col("doc_id")).agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.count("__seen").alias("n_seen"),
    )
    return (
        batch_ids.join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_chunks", F.lit(0)).alias("n_chunks"),
            F.coalesce("n_seen", F.lit(0)).alias("n_seen"),
        )
        .withColumn(
            "containment",
            # explicit CASE: under ANSI mode 0/0 raises, and a
            # chunkless doc's containment is genuinely undefined
            F.when(F.col("n_chunks") == 0, F.lit(None)).otherwise(
                F.round(F.col("n_seen") / F.col("n_chunks"), 6)
            ),
        )
    )


def containment_scores_within(
    new_chunks: DataFrame, old_hashes: DataFrame, batch_ids: DataFrame
) -> DataFrame:
    """:func:`containment_scores` plus WITHIN-BATCH awareness: a chunk
    also counts as seen when a smaller-``doc_id`` document in the SAME
    batch holds the same hash — so a document assembled from other
    documents that arrived alongside it is caught, not just one
    assembled from already-stored content. The extra cost is one
    min-per-hash aggregate over the batch's own (hash, id) pairs —
    batch-sized, never corpus-sized.

    Deterministic and arrival-order-independent: "earlier" is the id
    order, not row order. ONE-PASS by design — a smaller-id doc counts
    as prior content EVEN IF the gate downstream rejects that doc too
    (the sequential accept-only variant is inherently iterative per
    doc). That makes this law slightly stricter than a sequential
    replay in two corners, both recall-loss (over-rejection), never
    false acceptance:

    * two docs overlap each other but neither overlaps the store —
      the larger id is charged for the shared content even though a
      sequential gate that rejected the smaller one would not have
      stored its chunks;
    * a smaller-id batch-mate that is itself rejected FOR OVERLAPPING
      THE STORE still condemns the chunks it shares with larger-id
      batch-mates, so strongly correlated batches can reject more
      than a sequential accept-only replay would.

    The shared content is condemned either way, which is the right
    triage posture for a dedup gate; callers for whom the correlated-
    batch recall loss matters should ingest in smaller batches (the
    corner shrinks with batch size and vanishes at batch=1, where the
    law IS the sequential gate) or re-offer rejected docs in a later
    batch, by which time the store state decides alone. An in-batch
    accept-only fixpoint is deliberately NOT offered: acceptance of
    doc B can depend on the rejection of doc A and vice versa, so the
    "exact" variant is order-defined, not set-defined — it would make
    containment scores depend on replay order, breaking the
    determinism contract this function exists to provide."""
    first_holder = new_chunks.groupBy("chunk_hash").agg(
        F.min("doc_id").alias("__first_doc")
    )
    marked = (
        new_chunks.join(
            old_hashes.withColumn("__stored", F.lit(1)), "chunk_hash", "left"
        )
        .join(first_holder, "chunk_hash", "left")
        .withColumn(
            "__seen",
            F.when(
                (F.col("__stored") == 1)
                | (F.col("__first_doc") < F.col("doc_id")),
                F.lit(1),
            ),
        )
    )
    return _score_marked_chunks(marked, batch_ids)


GRAM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("pos", T.LongType(), False),
        T.StructField("gh", T.LongType(), False),
    ]
)


def _gram_rows(df: DataFrame, id_col: str, text_col: str, width: int):
    """(doc_id, pos, gh) for every width-gram — numpy per doc, one
    Arrow pass, no shuffle (the groupBy downstream shuffles only these
    three integers, never text)."""

    def batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in it:
            ids, counts, hs = [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                if text is None:
                    continue
                h = poly_gram_hashes(text, width)
                if len(h):
                    ids.append(did)
                    counts.append(len(h))
                    hs.append(h)
            if not ids:
                yield pd.DataFrame(
                    {"doc_id": [], "pos": [], "gh": []}
                ).astype({"doc_id": "int64", "pos": "int64", "gh": "int64"})
                continue
            counts = np.asarray(counts)
            # one concatenate per batch, not a Python extend per gram
            pos = np.arange(counts.sum()) - np.repeat(
                np.concatenate(([0], np.cumsum(counts)[:-1])), counts
            )
            yield pd.DataFrame(
                {
                    "doc_id": np.repeat(
                        np.asarray(ids, dtype=np.int64), counts
                    ),
                    "pos": pos.astype(np.int64),
                    "gh": np.concatenate(hs),
                }
            )

    # scale-adaptive scan parallelism (functions/scale.py): a tiny
    # corpus reads as 1-3 scan tasks, so the numpy gram hashing runs
    # on 1-3 Python workers no matter how many cores exist; widen the
    # projected raw rows first (a no-op whenever the scan is already
    # wider than the cluster's default parallelism).
    from uofi_payroll_etl_main_demo_spark.functions.scale import (
        scale_input_parallelism as _scale_in,
    )

    return _scale_in(df.select(id_col, text_col)).mapInPandas(
        batches, GRAM_SCHEMA
    )


def substring_dedup_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = 50,
) -> DataFrame:
    """Exact repeated-substring detection (the character-level dedup
    of Lee et al., "Deduplicating Training Data Makes Language Models
    Better", ACL 2022 — there via suffix arrays): every maximal span
    whose ``width``-grams ALL occur more than once in the corpus.
    Any substring of length >= width repeated anywhere (across docs
    or within one) contains a repeated width-gram, and every repeated
    width-gram certifies a repeated substring, so sliding-gram
    multiplicity is an exact detector at granularity ``width``.

    Plan shape: gram rows are numpy-built (no shuffle), duplicate
    gram hashes found with one integer-only groupBy, positions merged
    into maximal spans with the gaps-and-islands window trick
    (``pos - row_number``). The shuffle carries (hash, doc, pos)
    integers — ~12 bytes per corpus character; that is the honest
    cost of exact substring dedup without a distributed suffix array,
    and the reason the near-dup family (minhash/simhash) exists for
    the cheap first pass. Hash collisions (M = 2^31-1) can merge two
    distinct grams; both engines share the law, so results stay
    oracle-identical — the false-positive rate (~n²/2M) is the
    documented trade for an integer-only shuffle.

    Returns (doc_id, span_start, span_len) — span_len >= width.
    """
    if width < 2:
        raise ValueError(f"width must be >= 2: {width}")
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    # persist: grams feed two consumers (the multiplicity aggregate
    # and the join); unpersisted, the mapInPandas gram scan runs twice
    # (measured 6.2 s vs 2.8 s at sf0.1). Lifetime bounded by the
    # module pool above.
    from uofi_payroll_etl_main_demo_spark.cache import swap_pooled

    grams = swap_pooled(_GRAM_POOL, _gram_rows(df, id_col, text_col, width))
    dup = (
        grams.groupBy("gh")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") >= 2)
        .select("gh")
    )
    # The join strategy is PINNED (shuffle-hash on the dup side), not
    # left to the planner: the gram side's Python-map stats are opaque
    # to Catalyst, and at 128x probe scale the optimizer chose to
    # broadcast the 192M-row GRAM side — 1.6 GB of driver collect,
    # past spark.driver.maxResultSize (observed failure, recorded in
    # BASELINE.md). Shuffle-hash never sorts and never collects: it
    # moves (gh, doc, pos) integers once and builds the hash table on
    # the dup side, which is bounded by DISTINCT duplicated hashes.
    # Measured at sf0.1: 2.8 s vs 3.9 s for a driver-side
    # count-then-broadcast variant (the count is an extra job) and
    # 3.9 s for a count-window form that sorts every gram row.
    hits = grams.join(dup.hint("shuffle_hash"), "gh").select(
        "doc_id", "pos"
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    islands = hits.withColumn(
        "__grp", F.col("pos") - F.row_number().over(w)
    )
    return (
        islands.groupBy("doc_id", "__grp")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") - F.min("pos") + width).alias("span_len"),
        )
        .select("doc_id", "span_start", "span_len")
    )
