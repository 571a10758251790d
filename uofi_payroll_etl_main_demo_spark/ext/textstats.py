"""Document-level text analysis: stats, quality, language ID.

Composite DataFrame views over the column builders in
``functions.text`` — one narrow projection per document, no shuffle,
no Python. Each output column is closed-form so a SQL oracle can
reproduce it exactly.

Perf note: the token array is materialized ONCE through a projection
boundary and every stat reads the column reference — inlining the
tokenize expression into each stat re-evaluates the split per stat
(~4× slower measured at bench scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from uofi_payroll_etl_main_demo_spark.functions.scale import (
    scale_input_parallelism as _scale_in,
)
from uofi_payroll_etl_main_demo_spark.functions.text import (
    STOPWORDS,
    fingerprint64,
    tokenize_ws,
)


def document_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document statistics table.

    Columns: n_tokens, n_distinct_tokens, n_chars, n_punct,
    avg_token_len, quality — the cheap pre-filters of a training-data
    pipeline, computed in one pass.
    """
    base = _scale_in(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col),
        F.col(text_col).alias("__text"),
        tokenize_ws(text_col).alias("__toks"),
    )
    toks = F.col("__toks")
    n_tok = F.size(toks).cast("bigint")
    n_distinct = F.size(F.array_distinct(toks)).cast("bigint")
    n_chars = F.length("__text").cast("bigint")
    n_punct = F.size(
        F.regexp_extract_all(
            F.col("__text"), F.lit(r"[^\w \t\n\r\f\x0b]"), 0
        )
    ).cast("bigint")
    total_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    avg_len = F.when(n_tok > 0, total_len / n_tok)
    length_component = F.least(n_tok.cast("double") / F.lit(100.0), F.lit(1.0))
    diversity = F.when(
        n_tok > 0, n_distinct.cast("double") / n_tok
    ).otherwise(F.lit(0.0))
    punct_density = F.when(
        n_chars > 0, n_punct.cast("double") / n_chars
    ).otherwise(F.lit(0.0))
    quality = (
        F.lit(0.4) * length_component
        + F.lit(0.4) * diversity
        + F.lit(0.2) * (F.lit(1.0) - F.least(punct_density * 5, F.lit(1.0)))
    )
    return base.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        n_distinct.alias("n_distinct_tokens"),
        n_chars.alias("n_chars"),
        n_punct.alias("n_punct"),
        avg_len.alias("avg_token_len"),
        quality.alias("quality"),
    )


def curation_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Quality score + predicted language in ONE narrow select.

    The curation pre-filters of :func:`document_stats` and
    :func:`language_id` fused over a single tokenization projection —
    composing the two as separate frames joined on ``id_col`` costs
    two extra shuffles for what is a per-row map; at corpus scale the
    fused form is one scan, zero joins. ``keep_cols`` passes extra
    input columns through (e.g. ``("source",)``) so callers that need
    them don't re-join the input — re-joining is the exact
    anti-pattern this function exists to remove.
    """
    base = _scale_in(
        df.select(F.col(id_col), *[F.col(c) for c in keep_cols], F.col(text_col))
    ).select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        F.col(text_col).alias("__text"),
        tokenize_ws(text_col).alias("__toks"),
    )
    toks = F.col("__toks")
    n_tok = F.size(toks).cast("bigint")
    n_distinct = F.size(F.array_distinct(toks)).cast("bigint")
    n_chars = F.length("__text").cast("bigint")
    n_punct = F.size(
        F.regexp_extract_all(
            F.col("__text"), F.lit(r"[^\w \t\n\r\f\x0b]"), 0
        )
    ).cast("bigint")
    length_component = F.least(n_tok.cast("double") / F.lit(100.0), F.lit(1.0))
    diversity = F.when(
        n_tok > 0, n_distinct.cast("double") / n_tok
    ).otherwise(F.lit(0.0))
    punct_density = F.when(
        n_chars > 0, n_punct.cast("double") / n_chars
    ).otherwise(F.lit(0.0))
    quality = (
        F.lit(0.4) * length_component
        + F.lit(0.4) * diversity
        + F.lit(0.2) * (F.lit(1.0) - F.least(punct_density * 5, F.lit(1.0)))
    )

    def hit_pred(sw):
        # closure factory — see language_id for why not a default arg
        return lambda t: F.lower(t).isin(*sw)

    pairs = F.array(
        *[
            F.struct(
                F.size(F.filter(toks, hit_pred(STOPWORDS[lang])))
                .cast("bigint")
                .alias("hits"),
                F.lit(lang).alias("lang"),
            )
            for lang in sorted(STOPWORDS)
        ]
    )
    best = F.array_max(pairs)
    predicted = F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))
    return base.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        quality.alias("quality"),
        predicted.alias("predicted_lang"),
    )


def language_id(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Stopword-hit language scores + argmax prediction per document.

    Columns: hits_<lang> per language and predicted_lang ('und' when
    nothing hits). Heuristic n-gram/stopword language ID — by design a
    cheap, deterministic first pass, not a trained model. Deterministic
    tie-break: ties go to the lexicographically largest language code
    (array_max over (hits, lang) structs).
    """
    def hit_pred(sw):
        # NB: a `lambda t, sw=sw:` default arg would be parsed by Spark's
        # higher-order-function machinery as a SECOND lambda variable;
        # close over via a factory instead.
        return lambda t: F.lower(t).isin(*sw)

    base = _scale_in(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col),
        tokenize_ws(text_col).alias("__toks"),
    )
    toks = F.col("__toks")
    cols = [F.col(id_col)]
    hit_exprs = {}
    for lang in sorted(STOPWORDS):
        hit_exprs[lang] = F.size(
            F.filter(toks, hit_pred(STOPWORDS[lang]))
        ).cast("bigint")
        cols.append(hit_exprs[lang].alias(f"hits_{lang}"))
    pairs = F.array(
        *[
            F.struct(hit_exprs[lang].alias("hits"), F.lit(lang).alias("lang"))
            for lang in sorted(STOPWORDS)
        ]
    )
    best = F.array_max(pairs)
    cols.append(
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")).alias(
            "predicted_lang"
        )
    )
    return base.select(*cols)


def fingerprints(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """64-bit content fingerprints (normalized xxhash64)."""
    return df.select(F.col(id_col), fingerprint64(text_col).alias("fingerprint"))


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Overlapping token-window chunks — the standard pre-training/RAG
    segmentation (window of ``size`` tokens advancing by ``stride``;
    ``size - stride`` tokens of overlap preserve context at cuts).

    Output: (id, chunk_idx, chunk_text, n_tokens) exploded rows; the
    final partial window is kept (n_tokens < size), empty docs yield no
    rows. A narrow per-row map — chunking 100 TB is embarrassingly
    parallel, and the explode multiplies rows BEFORE any shuffle so
    downstream ops see ordinary narrow rows.

    TUMBLING fast path (``stride == size`` — the rewrite/stats family):
    tumbling chunks are non-overlapping runs of the whitespace-
    NORMALIZED text, so successive greedy regex matches of
    ``size``-token runs produce them in one codegen'd pass —
    measured 5.5× faster than the general windowed form (52.5 → 9.5 s
    at the 64× corpus), whose higher-order slice-per-window
    expressions evaluate interpreted. Both paths emit identical rows
    (equivalence pinned in tests); the overlapping case keeps the
    token-array window slices (overlaps cannot be non-overlapping
    regex matches).
    """
    if stride == size:
        # norm's ONLY whitespace is the ASCII space (tokenize_ws splits
        # on the full explicit class), so `[^ ]+` is exactly one token
        # and each greedy match consumes exactly `size` tokens (the
        # final partial match takes the remainder)
        norm = F.array_join(tokenize_ws(text_col), " ")
        pat = r"[^ ]+( [^ ]+){0,%d}" % (size - 1)
        return df.select(
            F.col(id_col),
            F.posexplode(F.regexp_extract_all(norm, F.lit(pat), 0)).alias(
                "chunk_idx", "chunk_text"
            ),
        ).select(
            id_col,
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            "chunk_text",
            (
                F.length("chunk_text")
                - F.length(F.translate("chunk_text", " ", ""))
                + 1
            )
            .cast("int")
            .alias("n_tokens"),
        )
    return _chunk_documents_windowed(df, text_col, id_col, size, stride)


def _chunk_documents_windowed(
    df: DataFrame, text_col: str, id_col: str, size: int, stride: int
) -> DataFrame:
    """The general windowed form (token-array slices per window) —
    kept callable so the tumbling fast path's equivalence is pinnable
    against it at ``stride == size``."""
    # Materialized token array (projection boundary): HOF lambdas
    # re-evaluate inline subexpressions per element — an inline tokenize
    # would re-split the document once per window slice.
    tokd = df.select(F.col(id_col), tokenize_ws(text_col).alias("__toks"))
    toks = F.col("__toks")
    n = F.size(toks)
    # number of windows: ceil(max(n - size, 0) / stride) + 1 for any n>0
    n_chunks = F.when(
        n > 0,
        F.floor(
            (F.greatest(n - F.lit(size), F.lit(0)) + F.lit(stride - 1))
            / F.lit(stride)
        ).cast("int")
        + 1,
    ).otherwise(F.lit(0))
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.alias("chunk_idx"),
            F.array_join(
                F.slice(toks, i * stride + 1, size), " "
            ).alias("chunk_text"),
            F.least(n - i * stride, F.lit(size)).alias("n_tokens"),
        ),
    )
    base = tokd.select(
        F.col(id_col),
        F.when(n_chunks > 0, chunks)
        .otherwise(
            F.array().cast(
                "array<struct<chunk_idx:int,chunk_text:string,n_tokens:int>>"
            )
        )
        .alias("__c"),
    )
    return base.select(F.col(id_col), F.explode("__c").alias("c")).select(
        id_col, "c.chunk_idx", "c.chunk_text", "c.n_tokens"
    )


def max_tumbling_chunk_bytes(text_col: str, size: int):
    """Per-row MAX byte length over the tumbling ``size``-token chunks
    of ``text_col`` — WITHOUT building chunk text: one aggregate fold
    over token byte lengths (chunk bytes = Σ token bytes + (count−1)
    single-space separators, exactly what ``array_join`` produces
    downstream). −1 for token-less text; NULL text → NULL. Shared by
    the ``chunk_dedup_rewrite`` byte-cap valve and the quarantine
    report query — the guard and the report must agree byte-for-byte.
    """
    lens = F.transform(
        tokenize_ws(text_col), lambda t: F.octet_length(t).cast("long")
    )
    zero = F.lit(0).cast("long")
    return F.aggregate(
        lens,
        F.struct(
            zero.alias("s"), zero.alias("c"), F.lit(-1).cast("long").alias("mx")
        ),
        lambda acc, x: F.when(
            acc["c"] == size,
            F.struct(
                x.alias("s"),
                F.lit(1).cast("long").alias("c"),
                F.greatest(acc["mx"], acc["s"] + acc["c"] - 1).alias("mx"),
            ),
        ).otherwise(
            F.struct(
                (acc["s"] + x).alias("s"),
                (acc["c"] + 1).alias("c"),
                acc["mx"].alias("mx"),
            )
        ),
        lambda acc: F.greatest(
            acc["mx"],
            F.when(acc["c"] > 0, acc["s"] + acc["c"] - 1).otherwise(
                F.lit(-1).cast("long")
            ),
        ),
    )


# Session-bounded persist pool for the rewrite's exploded chunk frame
# — see cache.swap_pooled for the lifetime contract.
_CHUNK_POOL: list = []


def chunk_dedup_rewrite(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 32,
    max_chunk_bytes: int | None = None,
) -> DataFrame:
    """Corpus REWRITE by global passage dedup: tumbling ``size``-token
    chunks, exact-dedup chunks corpus-wide (survivor = first occurrence
    by ``(doc_id, chunk_idx)``), reassemble each document from its
    surviving chunks — the C4/RefinedWeb-style "remove any span seen
    before" transform, producing cleaned text rather than statistics
    (the stats twin is ``q_chunk_dedup_stats``).

    Output: (id, n_chunks, n_kept, text_clean); text_clean is the
    surviving tokens joined by single spaces (token-granular rewrites
    are whitespace-normalizing by construction). Docs whose every chunk
    was seen before rewrite to ''; empty docs stay '' with 0 chunks.

    Shape: the global keep-first decision runs over a NARROW key frame
    — a map-side-combined ``min(struct(id, idx))`` per md5, so the
    exchange carries one 48-byte row per distinct hash per task, never
    text, and duplicate-heavy corpora SHRINK the shuffle instead of
    skewing it (the r6-r7 row_number window form shuffled and sorted
    every chunk key); per-doc winner lists (int arrays) then join back
    (one id-partitioned exchange, the only one carrying chunk text,
    and the reassembly groupBy reuses its partitioning). The exploded
    chunk frame feeds both consumers (keys + rebuild) through ONE
    pooled persist (``cache.swap_pooled``) — the key exchange stays
    narrow because InMemoryTableScan column-prunes to (id, idx, md5)
    before the shuffle, plan-pinned — so the explode computes once
    where the r6 shape paid for it twice. No pair expansion anywhere.

    ``max_chunk_bytes`` is the hostile-input valve (same posture as
    the LSH ``max_bucket_size``): a multi-MB single-line document
    makes a multi-MB single *token* — one chunk row that becomes an
    oversized shuffle block. With the cap set, any document containing
    a chunk whose UTF-8 length exceeds it is QUARANTINED — excluded
    from the output before any wide stage (recover the quarantine set
    by anti-joining ids against the output); ``None`` (default)
    preserves every document.
    """
    from uofi_payroll_etl_main_demo_spark.cache import swap_pooled

    base = df
    if max_chunk_bytes is not None:
        # ONE narrow filter, no join, chunk text never built (see
        # max_tumbling_chunk_bytes). An explode+anti-join form was
        # measured 10× slower here: it re-chunks the corpus per
        # reference and shuffles full chunk text through the anti-join.
        max_bytes = max_tumbling_chunk_bytes(text_col, size)
        base = base.filter(
            F.coalesce(max_bytes <= F.lit(int(max_chunk_bytes)), F.lit(True))
        )
    chunks = swap_pooled(
        _CHUNK_POOL,
        chunk_documents(
            base, text_col=text_col, id_col=id_col, size=size, stride=size
        ),
    )
    keys = chunks.select(
        F.col(id_col), "chunk_idx", F.md5("chunk_text").alias("__h")
    )
    # keep-first as min(struct(id, idx)) per hash: lexicographic
    # struct-min IS "first occurrence by (id, idx)", and unlike the
    # row_number window it PARTIAL-AGGREGATES — the map side combines
    # duplicate hashes before the exchange, so the shuffle carries one
    # row per distinct hash per task instead of every chunk row
    # through a sort (duplicate-heavy corpora shrink the exchange
    # instead of skewing it; sf0.1 wall parity with the window form —
    # the win is the shuffle-volume law, see the 32x probe row)
    keep = (
        keys.groupBy("__h")
        .agg(
            F.min(
                F.struct(F.col(id_col).alias("i"), F.col("chunk_idx").alias("x"))
            ).alias("__w")
        )
        .groupBy(F.col("__w.i").alias(id_col))
        .agg(F.collect_list("__w.x").alias("__keep"))
    )
    flagged = chunks.join(keep, id_col, "left").select(
        F.col(id_col),
        "chunk_idx",
        "chunk_text",
        F.coalesce(
            F.array_contains(F.col("__keep"), F.col("chunk_idx")), F.lit(False)
        ).alias("__kept"),
    )
    rebuilt = flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
        F.sum(F.when(F.col("__kept"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("__kept"),
                            F.struct(
                                F.col("chunk_idx"), F.col("chunk_text")
                            ),
                        )
                    )
                ),
                lambda s: s["chunk_text"],
            ),
            " ",
        ).alias("text_clean"),
    )
    return (
        base.select(F.col(id_col))
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_chunks", F.lit(0)).cast("bigint").alias("n_chunks"),
            F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
        )
    )


def vocab_panel(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    strata: str = "source",
) -> DataFrame:
    """Per-stratum vocabulary panel: total token occurrences, vocab
    size (types), hapax count (types occurring once), type-token
    ratio, and the dominant term with its corpus share — the
    Zipf-shape / vocabulary-health summary a corpus card reports per
    source.

    Shape: token explode → partial-agg (stratum, token) counts → one
    stratum agg. Both shuffles carry (stratum, token, count) — linear
    in distinct types, never in corpus size, so the panel is one of
    the cheapest whole-corpus scans at 100 TB. Deterministic top-term
    tie-break: highest count, then lexicographically largest token.
    """
    tok = df.select(
        F.col(strata), F.explode(tokenize_ws(text_col)).alias("__t")
    )
    counts = tok.groupBy(strata, "__t").agg(
        F.count(F.lit(1)).alias("__n")
    )
    top = F.max(F.struct(F.col("__n"), F.col("__t")))
    total = F.sum("__n")
    return counts.groupBy(strata).agg(
        total.cast("bigint").alias("total_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("vocab_size"),
        F.sum(F.when(F.col("__n") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("hapax_count"),
        F.round(F.count(F.lit(1)) / total, 6).alias("type_token_ratio"),
        top["__t"].alias("top_term"),
        F.round(top["__n"] / total, 6).alias("top_term_share"),
    )


def winnowed_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 — the MOSS algorithm): hash every k-word shingle IN
    ORDER, slide a window of ``w`` hashes, keep each window's minimum.

    Guarantees: any shared run of ≥ k+w−1 words between two documents
    yields at least one shared fingerprint — positional near-dup
    detection that whole-doc hashing (``fingerprint64``) cannot give.

    Output: (id, fp) exploded rows, distinct per doc. Documents with
    fewer than ``w`` shingles contribute their single minimum; empty
    docs contribute nothing.

    Scale/portability: a narrow per-row map (higher-order functions, no
    shuffle). Fingerprints are 15-hex-char md5 prefixes kept as STRINGS
    — fixed-length lowercase hex orders lexicographically exactly like
    its numeric value, so window minima need no hex→int conversion
    (Spark's ``conv`` measured ~30% of the operator's runtime), and md5
    is bit-identical in any engine, so the DuckDB oracle reproduces
    exact fingerprint values (xxhash64 would be Spark-only).
    """
    # Materialize the token array through a projection boundary FIRST:
    # HOF lambdas re-evaluate inline subexpressions per element, so an
    # inline tokenize re-runs the regex split once per shingle slice
    # (measured 6× slower at bench scale).
    tokd = df.select(F.col(id_col), tokenize_ws(text_col).alias("__toks"))
    toks = F.col("__toks")
    n_sh = F.size(toks) - (k - 1)
    shingles = F.when(
        n_sh >= 1,
        F.transform(
            F.sequence(F.lit(1), n_sh),
            lambda i: F.array_join(F.slice(toks, i, k), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    base = tokd.select(
        F.col(id_col),
        F.transform(
            shingles, lambda s: F.substring(F.md5(s), 1, 15)
        ).alias("__hs"),
    )
    nw = F.size("__hs") - (w - 1)
    fps = (
        F.when(
            nw >= 1,
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), nw),
                    lambda i: F.array_min(F.slice(F.col("__hs"), i, w)),
                )
            ),
        )
        .when(F.size("__hs") >= 1, F.array(F.array_min("__hs")))
        .otherwise(F.array().cast("array<string>"))
    )
    return base.select(F.col(id_col), F.explode(fps).alias("fp"))


def unigram_surprisal(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus-unigram-LM quality score per document, in exact integer
    milli-bits per token.

    The classic LM-based quality filter (CCNet / Gopher lineage) ranks
    documents by average per-token surprisal under a language model;
    here the model is the corpus's own unigram distribution, and the
    per-token surprisal is floor(log2(total/count)) computed WITHOUT
    floating point: ``length(bin(total div cnt)) - 1`` is the bit
    length of the integer frequency ratio — exact in any engine, where
    an ``ln()``-based score could flip a floor boundary between libm
    implementations and break cross-engine equality (same philosophy
    as the integer BM25 scores and micro-point PageRank).

    Shape: explode → per-term count (map-side-combined agg) → per-term
    surprisal on the VOCAB frame (computed once per distinct term, not
    per occurrence) → join back on term → per-doc agg. The corpus
    total lands via a broadcast 1-row frame, never a driver scalar.
    The term join is hash-partitioned on the term — the scale path for
    a 1e8-term vocabulary; Catalyst auto-broadcasts the vocab side
    when it is small.

    Output: (id, n_tokens, surprisal_milli_bits), docs with ≥1 token.
    """
    tok = df.select(
        F.col(id_col), F.explode(tokenize_ws(text_col)).alias("tok")
    ).persist()
    tf = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    # the corpus token total is a single driver scalar (the BM25-avgdl
    # pattern: a 1-row aggregate collect, embedded as a literal — not a
    # cross join, which the engine-wide plan lint forbids). The tok
    # frame is persisted so the scalar pass and the scoring pass share
    # one explode.
    total = int(tf.agg(F.sum("cnt")).first()[0] or 0)
    per_term = tf.select(
        "tok",
        (F.length(F.expr(f"bin({total} div cnt)")) - 1)
        .cast("long")
        .alias("sb"),
    )
    return (
        tok.join(per_term, "tok")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.expr("(sum(sb) * 1000) div count(1)").alias(
                "surprisal_milli_bits"
            ),
        )
    )


def dup_ngram_stats(
    df: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document cross-corpus duplication: the fraction of a
    document's DISTINCT k-word shingles that also appear in at least
    one OTHER document (the duplicated-content prefilter of public web
    pipelines — C4/RefinedWeb report "duplicate n-gram fraction"
    before any pair-wise dedup).

    The metric needs shingle document-frequencies, NOT the pair graph:
    shingle-explode (distinct per doc) → groupBy shingle for doc
    frequency → join back → per-doc aggregate. Cost is O(postings)
    with two hash shuffles of (long, long) rows — no pair expansion
    anywhere, so a K_N duplicate clique costs N·shingles, not N².
    A shingle's doc-frequency counts distinct documents because the
    exploded shingles are distinct per document by construction.

    Output: (id, n_shingles, n_dup_shingles, dup_fraction round-6);
    documents shorter than k tokens have no shingles and no row (same
    convention as the pair generators).

    Hashes are xxhash64 (shuffle rows are two longs, never text); the
    SQL oracle groups on the shingle STRING — equality of counts holds
    absent a 64-bit collision, which on corpus-realistic shingle
    volumes is ~1e-8 and deterministic if it ever occurs.
    """
    from uofi_payroll_etl_main_demo_spark.ext.dedup import _shingle_hashes

    sh = _shingle_hashes(df, text_col, id_col, k)
    freq = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("__df"))
    return (
        sh.join(freq, "sh")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.when(F.col("__df") >= 2, 1).otherwise(0)).alias(
                "n_dup_shingles"
            ),
        )
        .select(
            id_col,
            "n_shingles",
            "n_dup_shingles",
            F.round(
                F.col("n_dup_shingles") / F.col("n_shingles"), 6
            ).alias("dup_fraction"),
        )
    )


def boilerplate_stats(
    df: DataFrame,
    k: int = 5,
    min_docs: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document boilerplate fraction: the share of a document's
    k-gram OCCURRENCES (non-distinct — repetition inside a doc counts)
    whose shingle appears in >= ``min_docs`` DISTINCT documents — the
    header/footer/nav detector of web-corpus pipelines (hot passages
    are corpus-wide repeated runs, unlike ``dup_ngram_stats`` which
    flags any cross-doc sharing).

    Same O(postings) shape as ``dup_ngram_stats``: occurrence explode →
    distinct (doc, shingle) → shingle doc-frequency → semi-join back.
    No pair expansion; shuffles carry (long, long) hashes, never text.

    Output: (id, n_shingles, n_boilerplate, boilerplate_fraction).
    """
    from uofi_payroll_etl_main_demo_spark.functions.text import (
        shingles_from_tokens,
    )

    base = _scale_in(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col), tokenize_ws(text_col).alias("__toks")
    )
    occ = base.select(
        F.col(id_col),
        F.explode(
            shingles_from_tokens(F.col("__toks"), k, distinct=False)
        ).alias("__s"),
    ).select(id_col, F.xxhash64("__s").alias("sh"))
    hot = (
        occ.distinct()
        .groupBy("sh")
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter(F.col("__df") >= min_docs)
        .select("sh")
    )
    tot = occ.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))
    boil = (
        occ.join(hot, "sh", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("__b"))
    )
    return (
        tot.join(boil, id_col, "left")
        .select(
            id_col,
            "n_shingles",
            F.coalesce("__b", F.lit(0)).alias("n_boilerplate"),
            F.round(
                F.coalesce("__b", F.lit(0)) / F.col("n_shingles"), 6
            ).alias("boilerplate_fraction"),
        )
    )


def bigram_surprisal(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Order-2 corpus-LM quality score per document, exact integer
    milli-bits per token (the bigram upgrade of
    :func:`unigram_surprisal` — CCNet-lineage LM filtering with one
    token of context).

    Per token i≥2 the surprisal is the conditional MLE
    floor(log2(ctx(w_{i-1}) / cnt(w_{i-1}, w_i))) where ctx counts
    bigram occurrences starting with the context word; the document's
    FIRST token scores under the unigram model. All integer bit-length
    arithmetic (``length(bin(a div b)) - 1``) — exact in any engine.

    Shape: bigram explode (zip_with of the token array against itself
    shifted — lambdas touch only their arguments, the collapse-proof
    HOF discipline) → bigram counts → context counts → per-BIGRAM
    surprisal on the vocab frame (computed once per distinct bigram)
    → join back → per-doc agg. Corpus total is one driver scalar.
    """
    base = df.select(
        F.col(id_col), tokenize_ws(text_col).alias("__toks")
    ).filter(F.size("__toks") > 0)
    n = F.size(F.col("__toks"))
    len1 = F.greatest(n - 1, F.lit(0))
    big = (
        base.select(
            F.col(id_col),
            F.explode(
                F.zip_with(
                    F.slice(F.col("__toks"), F.lit(1), len1),
                    F.slice(F.col("__toks"), F.lit(2), len1),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                )
            ).alias("bg"),
        )
        .select(id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
        .persist()
    )
    bc = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cnt"))
    cc = bc.groupBy("w1").agg(F.sum("cnt").alias("ctx"))
    sb2 = bc.join(cc, "w1").select(
        "w1",
        "w2",
        (F.length(F.expr("bin(ctx div cnt)")) - 1).cast("long").alias("sb"),
    )
    big_scored = (
        big.join(sb2, ["w1", "w2"])
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("nb"), F.sum("sb").alias("sbs"))
    )
    tokall = base.select(F.col(id_col), F.explode("__toks").alias("tok"))
    tf = tokall.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    total = int(tf.agg(F.sum("cnt")).first()[0] or 0)
    first = base.select(
        F.col(id_col), F.element_at("__toks", 1).alias("tok")
    )
    fs = first.join(tf, "tok").select(
        id_col,
        (F.length(F.expr(f"bin({total} div cnt)")) - 1)
        .cast("long")
        .alias("sb1"),
    )
    return fs.join(big_scored, id_col, "left").select(
        F.col(id_col),
        F.expr("coalesce(nb, 0L) + 1").cast("bigint").alias("n_tokens"),
        F.expr(
            "((coalesce(sbs, 0L) + sb1) * 1000) div (coalesce(nb, 0L) + 1)"
        )
        .cast("bigint")
        .alias("bigram_milli_bits"),
    )


def bow_bucket_expr(tok_col, dim: int):
    """The ONE hashed-BOW bucket law (md5 head → bigint → mod dim),
    shared by the corpus embedder below and the positional passage
    scorer in queries.py — two spellings of this hash would embed the
    same token into different buckets."""
    return (
        F.conv(F.substring(F.md5(tok_col), 1, 15), 16, 10).cast("bigint")
        % F.lit(dim)
    )


def hashed_bow_embeddings(
    df: DataFrame,
    text_col: str = "text",
    id_col: "str | list[str]" = "doc_id",
    dim: int = 16,
) -> DataFrame:
    """Hashed bag-of-words embeddings for a whole corpus → (id, v):
    the DataFrame-level scale path for
    ``functions.text.hashed_bow_embedding_from_buckets`` — token
    explode → md5 bucket → groupBy with ``dim`` conditional sums →
    normalize. Numerically identical to the Column-builder form
    (pinned in tests), but the hot path stays inside whole-stage
    codegen: higher-order-function lambdas are interpreted per
    element, measured 2× slower at sf0.1. Same shape as the SimHash
    signature agg — the shuffle carries one ``dim``-column row per
    document. Zero-token docs yield no row (their embedding is null
    by definition)."""
    from uofi_payroll_etl_main_demo_spark.functions.text import (
        tokenize_ws,
    )

    # id_col may be a LIST (composite key — e.g. (doc_id, chunk_idx)
    # for passage-level embeddings); the single-column form is the
    # common corpus case.
    id_cols = [id_col] if isinstance(id_col, str) else list(id_col)
    tok = df.select(
        *[F.col(c) for c in id_cols],
        F.explode(tokenize_ws(text_col)).alias("__t"),
    ).select(*id_cols, bow_bucket_expr("__t", dim).alias("__bk"))
    aggs = [
        F.sum(F.when(F.col("__bk") == j, 1).otherwise(0))
        .cast("double")
        .alias(f"__c{j}")
        for j in range(dim)
    ]
    g = tok.groupBy(*id_cols).agg(*aggs)
    cols = [F.col(f"__c{j}") for j in range(dim)]
    norm = F.sqrt(sum((c * c for c in cols), F.lit(0.0)))
    return g.select(
        *[F.col(c) for c in id_cols],
        F.transform(F.array(*cols), lambda x: x / norm).alias("v"),
    )
