"""Document-level text analysis: stats, quality, language ID.

Composite DataFrame views over the column builders in
``functions.text`` — one narrow projection per document, no shuffle,
no Python. Each output column is closed-form so a SQL oracle can
reproduce it exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from uofi_payroll_etl_main_demo_spark.functions.text import (
    STOPWORDS,
    avg_token_length,
    char_count,
    distinct_token_count,
    fingerprint64,
    predicted_language,
    punct_count,
    quality_score,
    token_count,
)


def document_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document statistics table.

    Columns: n_tokens, n_distinct_tokens, n_chars, n_punct,
    avg_token_len, quality — the cheap pre-filters of a training-data
    pipeline, computed in one pass.
    """
    return df.select(
        F.col(id_col),
        token_count(text_col).alias("n_tokens"),
        distinct_token_count(text_col).alias("n_distinct_tokens"),
        char_count(text_col).alias("n_chars"),
        punct_count(text_col).alias("n_punct"),
        avg_token_length(text_col).alias("avg_token_len"),
        quality_score(text_col).alias("quality"),
    )


def language_id(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Stopword-hit language scores + argmax prediction per document.

    Columns: hits_<lang> per language and predicted_lang ('und' when
    nothing hits). Heuristic n-gram/stopword language ID — by design a
    cheap, deterministic first pass, not a trained model.
    """
    def hit_pred(sw):
        # NB: a `lambda t, sw=sw:` default arg would be parsed by Spark's
        # higher-order-function machinery as a SECOND lambda variable;
        # close over via a factory instead.
        return lambda t: F.lower(t).isin(*sw)

    cols = [F.col(id_col)]
    for lang in sorted(STOPWORDS):
        cols.append(
            F.size(
                F.filter(
                    F.split(F.trim(F.col(text_col)), r"\s+"),
                    hit_pred(STOPWORDS[lang]),
                )
            ).cast("bigint").alias(f"hits_{lang}")
        )
    cols.append(predicted_language(text_col).alias("predicted_lang"))
    return df.select(*cols)


def fingerprints(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """64-bit content fingerprints (normalized xxhash64)."""
    return df.select(F.col(id_col), fingerprint64(text_col).alias("fingerprint"))
