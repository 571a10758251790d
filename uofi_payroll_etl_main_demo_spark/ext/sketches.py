"""Sketch operators: count-min over token streams.

A 100 TB corpus cannot groupBy every token when only approximate heavy
counts are needed; the count-min sketch (Cormode & Muthukrishnan 2005,
public literature) bounds memory at depth×width counters while
guaranteeing estimate >= true count (one-sided error <= εN with
probability 1-δ, ε=e/width, δ=e^-depth).

Spark shape: the sketch build is ONE corpus scan — explode tokens once,
posexplode each token's depth counter coordinates (pos == hash row),
ONE groupBy over (row, col). The shuffle carries depth rows per token
occurrence but the aggregate output is a fixed depth×width table
regardless of corpus size (that is the point of the sketch: the
reducer state is bounded).
Hashes are md5-derived (engine-portable) so the sketch — and therefore
every estimate — is bit-identical in the DuckDB oracle.

Reference scope: no analogue in the reference (eager pandas ETL);
LLM-corpus extension surface (vocabulary/heavy-hitter profiling).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from uofi_payroll_etl_main_demo_spark.functions.scale import (
    scale_input_parallelism as _scale_in,
)
from uofi_payroll_etl_main_demo_spark.functions.text import tokenize_ws


def _cms_col(tok: Column, row: int, width: int) -> Column:
    """Portable counter index for hash row ``row``: md5('row:token')
    prefix → bigint → mod width (bit-identical in any engine)."""
    h = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(row), tok)), 1, 15), 16, 10
    ).cast("bigint")
    return (h % width).cast("int")


def count_min_sketch(
    df: DataFrame,
    text_col: str = "text",
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Build the (row, col, cnt) sketch table over whitespace tokens.

    Output is depth×width rows max — broadcast-sized by construction at
    any corpus size. Missing (row, col) combinations mean counter 0.
    """
    toks = df.select(tokenize_ws(text_col).alias("__toks")).select(
        F.explode("__toks").alias("tok")
    )
    # ONE corpus scan: per token emit the depth counter coordinates as an
    # array and posexplode it (pos == hash row) — no per-row re-scan or
    # re-tokenize branch per depth.
    cols = F.array(*[_cms_col(F.col("tok"), r, width) for r in range(depth)])
    return (
        toks.select(F.posexplode(cols).alias("row", "col"))
        .groupBy("row", "col")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    terms: DataFrame,
    term_col: str = "term",
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Estimate each term's count: min over the depth counters it hashes
    to. The sketch side is broadcast (it is <= depth×width rows); the
    terms side stays distributed — estimating a billion terms is a
    broadcast-join + min-agg, no corpus rescan.

    Output: (term, cms_count). Guarantee: cms_count >= true count.
    """
    coords = F.array(
        *[_cms_col(F.col(term_col), r, width) for r in range(depth)]
    )
    probes = terms.select(
        F.col(term_col), F.posexplode(coords).alias("row", "col")
    )
    return (
        probes.join(F.broadcast(sketch), ["row", "col"], "left")
        .groupBy(term_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("cms_count"))
    )


def heavy_hitters_report(
    df: DataFrame,
    text_col: str = "text",
    top_n: int = 20,
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Exact top-N tokens with their count-min estimates side by side —
    the sketch-accuracy report (estimate >= exact always; the gap is
    the collision error the width bounds).

    Output: (term, exact_count, cms_count), top_n rows by exact count
    (ties broken by term for determinism).
    """
    toks = _scale_in(df.select(F.col(text_col))).select(
        tokenize_ws(text_col).alias("__toks")
    ).select(F.explode("__toks").alias("term"))
    exact = (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).alias("exact_count"))
        .orderBy(F.desc("exact_count"), F.asc("term"))
        .limit(top_n)
    )
    sketch = count_min_sketch(df, text_col, width, depth)
    est = cms_estimate(sketch, exact.select("term"), "term", width, depth)
    return exact.join(est, "term").select(
        "term", "exact_count", "cms_count"
    )


# ---------------- Bloom filter (exact-reproducible) ----------------------

def _bloom_h1(v: Column) -> Column:
    return F.conv(F.substring(F.md5(v), 1, 13), 16, 10).cast("bigint")


def _bloom_h2(v: Column) -> Column:
    return F.conv(F.substring(F.md5(v), 14, 13), 16, 10).cast("bigint")


def bloom_build_words(
    df: DataFrame, value_col: str, m_bits: int = 65536, k: int = 3
) -> list[int]:
    """Distributed Bloom-filter build over a value column → dense list
    of ``m_bits/64`` signed-long words (constant size, collected).

    Positions are the standard double-hash family pos_i = (h1 + i·h2)
    mod m over the two 52-bit md5 halves — fully deterministic and
    engine-portable, so unlike library Blooms the EXACT bit pattern
    (and therefore every membership answer, including false positives)
    is reproducible in the DuckDB oracle. The build is one explode +
    one ``bit_or`` groupBy whose output is ≤ m/64 rows regardless of
    input size; the collect is constant-size by construction.
    """
    v = F.col(value_col)
    h1, h2 = _bloom_h1(v), _bloom_h2(v)
    positions = F.array(
        *[((h1 + F.lit(i) * h2) % m_bits).cast("long") for i in range(k)]
    )
    words = (
        df.select(F.explode(positions).alias("pos"))
        .select(
            (F.col("pos") / 64).cast("int").alias("w"),
            F.call_function(
                "shiftleft",
                F.lit(1).cast("long"),
                (F.col("pos") % 64).cast("int"),
            ).alias("m"),
        )
        .groupBy("w")
        .agg(F.bit_or("m").alias("bits"))
        .collect()
    )
    dense = [0] * (m_bits // 64)
    for r in words:
        dense[r["w"]] = r["bits"]
    return dense


def bloom_might_contain(
    words: list[int], v: Column, m_bits: int = 65536, k: int = 3
) -> Column:
    """Membership test column against a :func:`bloom_build_words`
    result, inlined as a literal array (broadcast-by-literal — the
    filter is KBs at any corpus size). True iff all k positions are
    set. Arithmetic ``shiftright & 1`` extracts any bit including the
    sign bit, so no unsigned special-casing is needed."""
    lit_words = F.array(*[F.lit(int(w)).cast("long") for w in words])
    h1, h2 = _bloom_h1(v), _bloom_h2(v)
    cond = F.lit(True)
    for i in range(k):
        pos = (h1 + F.lit(i) * h2) % m_bits
        word = F.element_at(lit_words, (pos / 64).cast("int") + 1)
        bit = F.call_function(
            "shiftright", word, (pos % 64).cast("int")
        ).bitwiseAND(F.lit(1).cast("long"))
        cond = cond & (bit == 1)
    return cond
