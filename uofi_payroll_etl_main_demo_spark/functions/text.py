"""Text-analysis column builders — extension surface.

The reference has only cleanse-grade string ops (SURVEY.md §2.9); these
add the text-pipeline operators a large-scale training-data pipeline
needs (BASELINE.json north star): tokenization, token/char statistics,
quality scoring, stopword/language scoring, shingling, fingerprinting.

Everything is built-in `pyspark.sql.functions` (JVM-side, codegen) —
no Python in the hot path, so each op is a narrow map over the
documents table and scales linearly with partitions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Column | str

# Tiny per-language stopword lists for the n-gram/stopword language
# heuristic. Deliberately minimal and deterministic.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that"],
    "es": ["el", "la", "de", "y", "que", "en", "un", "es"],
    "fr": ["le", "la", "de", "et", "que", "en", "un", "est"],
    "de": ["der", "die", "das", "und", "zu", "in", "ein", "ist"],
}

# Engine-portable whitespace class (raw characters, NOT \s — Java's \s
# includes U+000B, RE2/DuckDB's does not). Shared by tokenize_ws and,
# verbatim, the SQL oracles' _TOKS (queries.py imports this constant).
_WS_RE = "[ \t\n\r\f\x0b]"

# Punct class spells out the whitespace chars (raw, NOT \s): Java's \s
# includes U+000B, RE2/DuckDB's does not, so `[^\w\s]` silently counts
# a vertical tab as punctuation in one engine only. \w is ASCII
# [A-Za-z0-9_] in both. Twin: the SQL oracles' _SQL_PUNCT (queries.py).
_PUNCT_RE = r"[^\w \t\n\r\f\x0b]"
# BPE-ish word/number/punctuation segmentation (public GPT-2 style shape,
# simplified): runs of letters, runs of digits, single punctuation marks.
# Whitespace exclusion via the raw-char class (engine-portable, see
# _WS_RE) so the SQL twin tokenizes identically on control characters.
_BPE_ISH_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\r\f\x0b]"


def _col(c: ColumnOrName) -> Column:
    return F.col(c) if isinstance(c, str) else c


def tokenize_ws(c: ColumnOrName) -> Column:
    """Whitespace tokenization → array<string>; empty/whitespace-only →
    empty array; NULL → NULL.

    Split by an EXPLICIT whitespace class then drop empty elements:

    - a regex split emits a phantom '' at the ends when the text
      starts/ends with NON-SPACE whitespace (``trim`` strips only
      U+0020, so "\\n"-prefixed docs — ubiquitous in real corpora —
      would otherwise gain empty tokens that corrupt counts, shingles
      and surprisal). Interior empties cannot occur (consecutive
      whitespace is one separator), so the filter is exactly the
      end-trim.
    - the class is spelled out (raw chars) instead of ``\\s`` because
      engines disagree on ``\\s``: Java includes U+000B (vertical
      tab), RE2/DuckDB does not — an oracle mismatch on any doc
      carrying one.

    The DuckDB twin is queries.py ``_TOKS`` (same raw-char class +
    ``list_filter``); parity on every pathological shape is pinned in
    tests/test_text_ext.py."""
    return F.filter(F.split(_col(c), _WS_RE + "+"), lambda t: t != "")


def tokenize_bpe_ish(c: ColumnOrName) -> Column:
    """BPE-ish regex token extraction (letters / digits / punct marks)."""
    return F.regexp_extract_all(_col(c), F.lit(_BPE_ISH_RE), 0)


def token_count(c: ColumnOrName) -> Column:
    """Whitespace token count → int."""
    return F.size(tokenize_ws(c)).cast("bigint")


def distinct_token_count(c: ColumnOrName) -> Column:
    return F.size(F.array_distinct(tokenize_ws(c))).cast("bigint")


def char_count(c: ColumnOrName) -> Column:
    return F.length(_col(c)).cast("bigint")


def punct_count(c: ColumnOrName) -> Column:
    """Number of non-word, non-space characters."""
    return F.size(
        F.regexp_extract_all(_col(c), F.lit(_PUNCT_RE), 0)
    ).cast("bigint")


def avg_token_length(c: ColumnOrName) -> Column:
    """Mean token length over whitespace tokens → double (null if empty)."""
    toks = tokenize_ws(c)
    n = F.size(toks)
    total = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return F.when(n > 0, total / n)


def stopword_count(c: ColumnOrName, lang: str = "en") -> Column:
    """Count of tokens in the ``lang`` stopword list."""
    sw = STOPWORDS[lang]
    return F.size(
        F.filter(tokenize_ws(c), lambda t: F.lower(t).isin(*sw))
    ).cast("bigint")


def stopword_ratio(c: ColumnOrName, lang: str = "en") -> Column:
    n = token_count(c)
    return F.when(n > 0, stopword_count(c, lang) / n)


def quality_score(c: ColumnOrName) -> Column:
    """Heuristic document-quality score in [0, 1].

    Combines length saturation, lexical diversity, and low punctuation
    density — the standard cheap pre-filters of a training-data
    pipeline. Deterministic closed-form so the DuckDB oracle can
    reproduce it exactly.
    """
    n_tok = token_count(c)
    n_chars = char_count(c)
    length_component = F.least(n_tok.cast("double") / F.lit(100.0), F.lit(1.0))
    diversity = F.when(
        n_tok > 0, distinct_token_count(c).cast("double") / n_tok
    ).otherwise(F.lit(0.0))
    punct_density = F.when(
        n_chars > 0, punct_count(c).cast("double") / n_chars
    ).otherwise(F.lit(0.0))
    return (
        F.lit(0.4) * length_component
        + F.lit(0.4) * diversity
        + F.lit(0.2) * (F.lit(1.0) - F.least(punct_density * 5, F.lit(1.0)))
    )


def language_scores(c: ColumnOrName) -> dict[str, Column]:
    """Per-language stopword-hit counts (the language-ID heuristic).

    Returns ``{lang: count_column}``; argmax over the counts is the
    predicted language. Kept as separate columns (not a struct) so the
    DuckDB oracle can mirror each one.
    """
    return {lang: stopword_count(c, lang) for lang in STOPWORDS}


def predicted_language(c: ColumnOrName, default: str = "und") -> Column:
    """Argmax language by stopword hits, deterministic tie-break by
    language code; 'und' (undetermined) when no stopwords hit."""
    toks = tokenize_ws(c)

    def hit_pred(sw):
        # A default-arg lambda (`lambda t, sw=sw:`) would be read by the
        # higher-order-function binder as a two-variable lambda; use a
        # closure factory.
        return lambda t: F.lower(t).isin(*sw)

    pairs = F.array(*[
        F.struct(
            F.size(F.filter(toks, hit_pred(sw))).alias("hits"),
            F.lit(lang).alias("lang"),
        )
        for lang, sw in sorted(STOPWORDS.items())
    ])
    best = F.array_max(
        F.transform(
            pairs,
            # array_max on struct compares fields in order: hits then
            # (desc-coded) lang. Negate nothing: ties broken by LARGEST
            # lang string; to get smallest-code tie-break, compare on
            # (hits, reverse_rank) — encode rank as negative index.
            lambda s: s,
        )
    )
    # array_max picks max (hits, lang) lexicographically → ties go to the
    # lexicographically largest lang. For a deterministic result that's
    # acceptable; document it.
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit(default))


def shingles_from_tokens(
    toks: Column, k: int, distinct: bool = True
) -> Column:
    """k-word shingles over an already-materialized token-array column.

    PERF CONTRACT: pass a column REFERENCE whose token array was
    materialized through a projection boundary (``df.select(...,
    tokenize_ws(c).alias("__toks"))`` then ``F.col("__toks")``) — Spark
    does not hoist common subexpressions out of higher-order-function
    lambdas, so an inline tokenize expression re-runs the regex split
    once per ``slice`` invocation (measured 6× slower at bench scale).

    Built with ``sequence`` + ``transform`` + ``slice`` (all JVM-side):
    positions 1..n-k+1, each joined with a single space. Documents
    shorter than k words → empty array.
    """
    n_sh = F.size(toks) - (k - 1)  # number of shingles
    shingles = F.transform(
        F.sequence(F.lit(1), n_sh),
        lambda i: F.array_join(F.slice(toks, i, k), " "),
    )
    if distinct:
        shingles = F.array_distinct(shingles)
    # Guard BEFORE building the sequence result: Spark's sequence(1, 0)
    # steps DOWNWARD ([1, 0]) and slice(toks, 0, k) is a runtime error,
    # so documents shorter than k words must short-circuit to [].
    return F.when(n_sh >= 1, shingles).otherwise(
        F.array().cast("array<string>")
    )


def word_shingles(c: ColumnOrName, k: int = 4) -> Column:
    """Distinct k-word shingles of a document → array<string>.

    Convenience wrapper for SMALL inputs/tests: it inlines the tokenize
    expression, which higher-order lambdas re-evaluate per slice. Hot
    paths must materialize tokens first and use
    :func:`shingles_from_tokens` (see its perf contract).
    """
    return shingles_from_tokens(tokenize_ws(c), k)


def fingerprint64(c: ColumnOrName) -> Column:
    """Content fingerprint of the normalized text (lowercased,
    whitespace-collapsed), as a 60-bit integer: the first 15 hex chars
    of md5, base-converted. md5 (not the cheaper xxhash64) because it
    is bit-identical in every engine — the same
    conv(substr(md5 …)) == ('0x' || substr(md5 …))::bigint identity
    ``hash_sample`` and the winnowing fingerprints rely on — so the
    DuckDB oracle reproduces exact fingerprint VALUES, not just
    collision structure. Equal normalized content ⇒ equal fingerprint."""
    # raw-char whitespace class (not \s): engines disagree on \s over
    # U+000B, and the fingerprint must be bit-identical cross-engine
    normalized = F.regexp_replace(F.lower(F.trim(_col(c))), _WS_RE + "+", " ")
    return (
        F.conv(F.substring(F.md5(normalized), 1, 15), 16, 10).cast("bigint")
    )


def hashed_bow_buckets(c: ColumnOrName, dim: int = 16) -> Column:
    """md5 feature-hash bucket per token occurrence → array<bigint>.

    Materialize THIS in a projection, then feed
    :func:`hashed_bow_embedding_from_buckets` — hashing once per token
    and counting over the small int array keeps the md5 out of the
    per-dimension lambdas (rule 8: an inlined tokenize+md5 would
    re-evaluate once per dimension per row)."""
    toks = tokenize_ws(c)
    return F.transform(
        toks,
        lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10)
        .cast("bigint") % F.lit(dim),
    )


def hashed_bow_embedding_from_buckets(
    buckets: ColumnOrName, dim: int = 16
) -> Column:
    """Deterministic hashed bag-of-words embedding → array<double>:
    feature j = count of token occurrences in md5 bucket j,
    L2-normalized; empty docs → null. The feature-hashing trick
    (Weinberger et al. 2009) as pure Column expressions — the
    closed-form text→vector stage that lets the ANN operators run
    end-to-end from text with an EXACT DuckDB twin (md5 bucketing is
    bit-identical cross-engine; counts are integers, so the normalized
    components divide the same two exact numbers in both engines).

    Real model embeddings drop in by swapping this column for an
    inference output — every downstream operator (KNN join, IVF/PQ,
    semantic dedup) consumes `array<double>` regardless.
    """
    b = _col(buckets)
    counts = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: F.size(F.filter(b, lambda x: x == j)).cast("double"),
    )
    # dim-mismatch guard: buckets built with a LARGER dim would drop
    # tokens silently (their bucket matches no j) yet still normalize —
    # a plausible-looking wrong embedding. Fail the task instead.
    total = F.aggregate(counts, F.lit(0.0), lambda acc, x: acc + x)
    checked = F.when(
        F.assert_true(
            total == F.size(b).cast("double"),
            F.lit("hashed_bow dim mismatch: bucket values exceed dim"),
        ).isNull(),
        counts,
    )
    norm = F.sqrt(
        F.aggregate(checked, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return F.when(
        F.size(b) > 0, F.transform(checked, lambda x: x / norm)
    )
