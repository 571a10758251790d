"""Data Selection via Importance Resampling (DSIR-style), in exact
integer arithmetic.

The public recipe (Xie et al. 2023, "Data Selection for Language
Models via Importance Resampling"): fit two bag-of-hashed-ngram
models — one on a small TARGET corpus (the domain you want more of),
one on the RAW pool — and weight every raw document by its
log-likelihood ratio log p_target(doc) − log p_raw(doc); resample the
pool by those weights. The hashed feature space makes both models a
fixed-size count table, so the whole selector is two aggregates and
one broadcast join regardless of corpus size.

This implementation keeps the estimator's shape but quantizes each
per-token log-probability to INTEGER BITS via the corpus-proven
floor-log2 law (``length(bin(total div cnt)) - 1`` — the
ext_unigram_surprisal / integer-BM25 philosophy): a libm ``log`` can
flip a floor boundary between engines and break cross-engine
equality, where the bit-length of an integer frequency ratio is exact
in ANY engine. Per token the weight contribution is

    sb_raw(b) − sb_tgt(b),   sb_M(b) = floor(log2((T_M + B) / (cnt_M(b) + 1)))

(Laplace +1 over ``B`` hash buckets) — the raw-model surprisal minus
the target-model surprisal, so documents the TARGET model finds less
surprising score higher. Per document the weight is the token sum
(the paper's log-ratio, floor-quantized per token) and the per-token
mean in milli-bits (one exactly-rounded IEEE division of two exact
integers — deterministic cross-engine) for length-independent
ranking.

Scale shape: one token explode → bucket hash (portable md5 family:
``conv(substr(md5(tok),1,13),16,10)`` ≡ DuckDB
``('0x'||substr(md5(tok),1,13))::BIGINT``) → ONE map-side-combined
aggregate builds both models' count tables together (B rows — KBs) →
broadcast join back onto the exploded tokens → per-doc aggregate.
No shuffle carries text; the model table is O(B) whatever the corpus.
At 100 TB: two passes over the tokens (model fit + scoring share the
same persisted explode), everything else is broadcast-sized.

No reference parity: the reference has no text surface; extension
scope (SURVEY.md §2.9 text-analysis / curation family).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from uofi_payroll_etl_main_demo_spark.functions.text import tokenize_ws


def _bucket(col: Column, n_buckets: int) -> Column:
    """Portable hash bucket: first 13 hex chars of md5 (52 bits,
    always positive) mod B — reproducible bit-for-bit in DuckDB, so
    the oracle fits the SAME models on the SAME buckets."""
    return F.conv(F.substring(F.md5(col), 1, 13), 16, 10).cast(
        "long"
    ) % F.lit(n_buckets)


def dsir_weights(
    df: DataFrame,
    target_filter: Column,
    n_buckets: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document DSIR importance panel: (id, n_tokens,
    dsir_bits_sum, dsir_milli_bits).

    ``target_filter`` is a boolean Column over ``df`` naming the
    target domain (e.g. ``col("lang") == "en"``); the raw model is the
    WHOLE frame, so every token's bucket is observed in the raw table
    and the +1 smoothing only ever has to cover target-side zeros.
    ``dsir_bits_sum`` is the floor-quantized log-likelihood ratio of
    the whole document (the paper's resampling weight, in bits);
    ``dsir_milli_bits`` its per-token mean (sum·1000/n, one IEEE
    division, round-6). Documents with no tokens have no row (the
    surprisal convention)."""
    tok = (
        df.filter(F.trim(F.col(text_col)) != "")
        .select(
            F.col(id_col),
            target_filter.alias("__tgt"),
            F.explode(tokenize_ws(text_col)).alias("tok"),
        )
        .select(
            id_col, "__tgt", _bucket(F.col("tok"), n_buckets).alias("__b")
        )
        .persist()
    )
    model = tok.groupBy("__b").agg(
        F.count(F.lit(1)).alias("cnt_r"),
        F.sum(F.when(F.col("__tgt"), 1).otherwise(0)).alias("cnt_t"),
    )
    totals = model.agg(
        F.sum("cnt_r").alias("R"), F.sum("cnt_t").alias("T")
    ).first()
    r_tot = int(totals["R"] or 0) + n_buckets
    t_tot = int(totals["T"] or 0) + n_buckets
    # per-bucket integer surprisals on the B-row model frame (computed
    # once per bucket, not per occurrence), then the signed difference
    per_bucket = model.select(
        "__b",
        (
            (F.length(F.expr(f"bin({r_tot} div (cnt_r + 1))")) - 1)
            - (F.length(F.expr(f"bin({t_tot} div (cnt_t + 1))")) - 1)
        )
        .cast("long")
        .alias("wb"),
    )
    try:
        # materialize the per-doc panel (lineage-truncated, executor
        # storage — the _staged_delete cleanup pattern) so the cached
        # token explode can be RELEASED before returning: the panel is
        # one row per document, the token frame one row per token —
        # leaving the latter cached for the session lifetime is the
        # leak, not the panel
        return (
            tok.join(F.broadcast(per_bucket), "__b")
            .groupBy(id_col)
            .agg(
                F.count(F.lit(1)).alias("n_tokens"),
                F.sum("wb").alias("dsir_bits_sum"),
            )
            .select(
                id_col,
                "n_tokens",
                "dsir_bits_sum",
                F.round(
                    F.col("dsir_bits_sum") * 1000.0 / F.col("n_tokens"), 6
                ).alias("dsir_milli_bits"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        tok.unpersist()


def dsir_select(
    df: DataFrame,
    target_filter: Column,
    take: int,
    n_buckets: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The selection step: the ``take`` documents whose per-token mean
    importance is highest (mean, not sum, so the selector doesn't
    simply harvest long documents — the deviation from the paper's
    sum-weight Gumbel resampling is deliberate and documented: a
    seeded Gumbel draw needs float ``log(-log(u))`` noise, which has
    no cross-engine-exact form; top-k on the deterministic mean is the
    reproducible variant). Ordering law: (dsir_milli_bits DESC,
    n_tokens DESC, id ASC) — the rounded mean first, exact integers as
    tie-breaks."""
    w = dsir_weights(
        df,
        target_filter,
        n_buckets=n_buckets,
        text_col=text_col,
        id_col=id_col,
    )
    return w.orderBy(
        F.desc("dsir_milli_bits"), F.desc("n_tokens"), F.asc(id_col)
    ).limit(take)
