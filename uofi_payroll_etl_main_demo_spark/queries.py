"""Named query registry — the engine's operator inventory as runnable queries.

Each entry re-expresses one operator row of SURVEY.md §2 (reference
use-sites cited there into /root/reference/etl_payroll_pipeline_demo.py)
as a PySpark DataFrame plan over the driver test tables (TESTDATA.md),
paired with an ANSI-SQL oracle string DuckDB can run on the same
parquet. The driver compares row-count + schema + order-insensitive
value-hash at sf0.01 (CORRECTNESS_r{N}.json).

Conventions (driver comparator contract):
- every computed/aggregate column is aliased IDENTICALLY in the Spark
  plan and the oracle SQL;
- aggregate numerics go through ``decimal`` casts (double summation is
  partition-order-dependent; decimal is exact and deterministic);
- per-row doubles are rounded to 6 digits on BOTH sides;
- timestamps are emitted as 'yyyy-MM-dd' strings (UTC session).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from uofi_payroll_etl_main_demo_spark.ext.dedup import (
    exact_dedup,
    minhash_near_dup_pairs,
    ngram_jaccard_pairs,
    simhash_near_dup_pairs,
)
from uofi_payroll_etl_main_demo_spark.ext.multimodal import (
    extract_features,
    synthetic_media,
)
from uofi_payroll_etl_main_demo_spark.ext.similarity import (
    brute_force_top_k,
    lsh_bucket_top_k,
)
from uofi_payroll_etl_main_demo_spark.ext.textstats import (
    document_stats,
    fingerprints,
    language_id,
    winnowed_fingerprints,
)
from uofi_payroll_etl_main_demo_spark.functions.text import (
    _BPE_ISH_RE as _BPE_SQL,
    _WS_RE as _WS_CLASS,
)
from uofi_payroll_etl_main_demo_spark.functions.cleanse import (
    concat_key,
    fiscal_year,
    is_missing,
    normalize_numeric_string,
    select_contract,
    split_code_name,
    strip_decimal_str,
    to_timestamp_coerce,
)
from uofi_payroll_etl_main_demo_spark.io.readers import read_parquet_table
from uofi_payroll_etl_main_demo_spark.operators.aggregates import mode_by_group
from uofi_payroll_etl_main_demo_spark.operators.dedup import (
    dedup_keep_first,
    distinct_rows,
)
from uofi_payroll_etl_main_demo_spark.operators.joins import (
    anti_join,
    safe_left_join,
    semi_join,
)
from uofi_payroll_etl_main_demo_spark.operators.setops import union_by_name

QueryFn = Callable[[SparkSession, str], DataFrame]

# Deterministic 64-dim query vector for similarity queries (module-level
# constant so the Spark literal and the SQL literal are byte-identical).
QUERY_VEC = [((i * 37) % 19 - 9) / 10.0 for i in range(64)]
_QV_SQL = "[" + ", ".join(repr(x) for x in QUERY_VEC) + "]"

_DEC = "decimal(18,2)"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_parquet_table(spark, sf_dir, name)


# Session-bounded persist lifetime for registry queries. A registry
# callable returns a LAZY frame, so it cannot unpersist the panels its
# own result consumes (the caller collects after we return). Instead,
# persisting queries route through this pool: each one first DRAINS the
# frames pooled by earlier invocations (whose actions have completed by
# the time the next query builds), so a long session holds at most one
# query's panels in executor storage instead of leaking one per
# invocation. Harnesses that clearCache() per query (bench.py,
# scripts/check_oracle.py) are belt-and-braces on top of this.
_PERSIST_POOL: list = []


def _pooled_persist(df: DataFrame) -> DataFrame:
    _PERSIST_POOL.append(df)
    return df.persist()


def _drain_persist_pool() -> None:
    while _PERSIST_POOL:
        _PERSIST_POOL.pop().unpersist()


# --------------------------------------------------------------------------
# Flagship: TPC-H Q1-shaped pricing summary (P7 filter, A aggregates, sort).
# Mirrors the reference's filter→group→project spine (SURVEY.md §7.1).
# --------------------------------------------------------------------------

def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            # Sum in DECIMAL (exact ⇒ partition-order independent), emit as
            # DOUBLE (one deterministic conversion) — SURVEY §4.3 posture.
            F.sum(F.col("l_quantity").cast(_DEC)).cast("double").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast(_DEC))
            .cast("double")
            .alias("sum_base_price"),
            F.sum(
                (
                    F.col("l_extendedprice").cast(_DEC)
                    * (F.lit(1).cast(_DEC) - F.col("l_discount").cast(_DEC))
                ).cast("decimal(18,4)")
            )
            .cast("double")
            .alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_SQL_PRICING = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
         AS sum_base_price,
       CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
            * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
            AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-01'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# ----------------------- projections / filters (P*) -----------------------

def q_projection(spark, sf_dir):
    """P1: column-subset select → pruned parquet scan (ReadSchema)."""
    return _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


def q_output_contract(spark, sf_dir):
    """P2: rename + reorder + null-fill projection (reference col_map 362-400)."""
    part = _t(spark, sf_dir, "part")
    return select_contract(
        part,
        [
            ("part_id", "p_partkey"),
            ("part_name", "p_name"),
            ("brand", "p_brand"),
            ("legacy_code", None),
        ],
    )


def q_filters_p3_p4_p5(spark, sf_dir):
    """P3+P4+P5 in one tagged row-level result: case-insensitive
    contains with null-as-false (reference 78), case-insensitive regex
    contains (reference 83), and IN-list filter + count (reference
    79/84). Folded from three round-1 micro-queries so all three
    filter operators share one driver-correctness slot; row-level
    fidelity is preserved per branch."""
    doc = _t(spark, sf_dir, "documents")
    part = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    p3 = doc.filter(
        F.coalesce(F.upper(F.col("text")).contains("SPARK"), F.lit(False))
    ).select(
        F.lit("p3_contains_ci").alias("probe"),
        F.col("doc_id").cast("string").alias("k"),
        F.col("source").alias("v"),
    )
    p4 = part.filter(F.col("p_name").rlike(r"(?i)(^|\s)red(\s|$)")).select(
        F.lit("p4_regex_ci").alias("probe"),
        F.col("p_partkey").cast("string").alias("k"),
        F.col("p_name").alias("v"),
    )
    p5 = (
        li.filter(F.col("l_returnflag").isin("A", "R"))
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.lit("p5_inlist").alias("probe"),
            F.col("l_returnflag").alias("k"),
            F.col("n").cast("string").alias("v"),
        )
    )
    return p3.unionByName(p4).unionByName(p5)


def q_filter_eq_between(spark, sf_dir):
    """P6+P7: equality + timestamp-range filters (reference 666, 515-518)."""
    o = _t(spark, sf_dir, "orders")
    return o.filter(
        (F.col("o_orderstatus") == F.lit("F"))
        & F.col("o_orderdate").between(F.lit("1996-01-01"), F.lit("1997-12-31"))
    ).select("o_orderkey", "o_totalprice")


def q_filter_format_violations(spark, sf_dir):
    """P8: negated full-match regex — validation filter (reference 564-569)."""
    part = _t(spark, sf_dir, "part")
    ok = F.col("p_brand").rlike(r"^Brand#[0-9]{2}$")
    return (
        part.filter(~F.coalesce(ok, F.lit(False)))
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_tristate_missing(spark, sf_dir):
    """P9: NULL/''/'nan' tri-state missing predicate (reference 354)."""
    li = _t(spark, sf_dir, "lineitem")
    messy = (
        F.when(F.col("l_linenumber") % 7 == 0, F.lit(None).cast("string"))
        .when(F.col("l_linenumber") % 7 == 1, F.lit(""))
        .when(F.col("l_linenumber") % 7 == 2, F.lit("  nan "))
        .otherwise(F.col("l_returnflag"))
    )
    return (
        li.select(F.col("l_returnflag"), is_missing(messy).alias("missing"))
        .groupBy("l_returnflag", "missing")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_first_pick(spark, sf_dir):
    """P10/O1: deterministic first-row pick (reference iloc[0], 92/100/137)."""
    return (
        _t(spark, sf_dir, "part")
        .orderBy("p_partkey")
        .select("p_partkey", "p_name")
        .limit(1)
    )


def q_topk_orders(spark, sf_dir):
    """O: global top-k = per-partition partial top-k + driver merge."""
    return (
        _t(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .limit(10)
    )


# ------------------------------- joins (J*) --------------------------------

def q_broadcast_left_join(spark, sf_dir):
    """J1/J2/J4/J5: broadcast left equi-join cascade over dimensions."""
    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region")
    enriched = safe_left_join(
        cust, nat, {"c_nationkey": "n_nationkey"}, payload=["n_name", "n_regionkey"]
    )
    enriched = safe_left_join(
        enriched, reg, {"n_regionkey": "r_regionkey"}, payload=["r_name"]
    )
    return (
        enriched.groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.sum(F.col("c_acctbal").cast(_DEC)).cast("double").alias("sum_acctbal"),
        )
        .orderBy("r_name")
    )


def q_synthetic_key_join(spark, sf_dir):
    """J6: join on a derived concat key (reference UIN Job, 591/627-631)."""
    li = _t(spark, sf_dir, "lineitem")
    fact = li.withColumn(
        "line_key",
        concat_key(
            F.col("l_orderkey").cast("string"), F.col("l_linenumber").cast("string")
        ),
    )
    # Deterministic dim survivor: lineitem has duplicate (orderkey,
    # linenumber) pairs, so an arbitrary-survivor dropDuplicates would be
    # nondeterministic — take MIN shipdate per key (total order).
    dim = fact.groupBy("line_key").agg(F.min("l_shipdate").alias("ship2"))
    joined = safe_left_join(fact, dim, ["line_key"], payload=["ship2"], dedup_dim=False)
    return joined.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_if(F.col("l_shipdate") == F.col("ship2")).alias("n_matched"),
    )


def q_multi_key_join(spark, sf_dir):
    """J7: multi-column equi-join against a derived dimension (reference 653-658)."""
    li = _t(spark, sf_dir, "lineitem")
    dim = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast(_DEC)).cast("double").alias("grp_qty")
    )
    joined = safe_left_join(
        li, dim, ["l_returnflag", "l_linestatus"], payload=["grp_qty"], dedup_dim=False
    )
    return joined.groupBy("l_returnflag", "l_linestatus", "grp_qty").agg(
        F.count(F.lit(1)).alias("n")
    )


def q_semi_join(spark, sf_dir):
    """Semi join — relational EXISTS (reference P11 existence checks)."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("2000-01-01")
    ).select(F.col("l_orderkey").alias("o_orderkey"))
    return semi_join(o, li, ["o_orderkey"]).select("o_orderkey", "o_orderstatus")


def q_anti_join(spark, sf_dir):
    """Anti join — NOT EXISTS (reference missing-lookup warnings 141-142)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return anti_join(c, o, ["c_custkey"]).select("c_custkey", "c_name")


def q_mode_lookup_join(spark, sf_dir):
    """J10+A1: mode-per-key dimension joined back (reference 319-324, 633-650)."""
    o = _t(spark, sf_dir, "orders")
    mode = mode_by_group(o, "o_orderstatus", "o_orderpriority", "mode_priority")
    joined = safe_left_join(
        o, mode, ["o_orderstatus"], payload=["mode_priority"], dedup_dim=False
    )
    return (
        joined.groupBy("o_orderstatus", "mode_priority")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("o_orderstatus")
    )


# ---------------------------- aggregates (A*) -------------------------------

def q_mode_by_group(spark, sf_dir):
    """A1: deterministic mode (count desc, value asc tie-break)."""
    o = _t(spark, sf_dir, "orders")
    return mode_by_group(o, "o_orderstatus", "o_orderpriority", "mode_priority")


def q_minmax_counts(spark, sf_dir):
    """A2/A3/A4: min/max, null counts, row count in one pass."""
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.min(F.date_format("l_shipdate", "yyyy-MM-dd")).alias("min_ship"),
        F.max(F.date_format("l_shipdate", "yyyy-MM-dd")).alias("max_ship"),
        F.count_if(F.col("l_shipdate").isNull()).alias("n_null_ship"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def q_rollup(spark, sf_dir):
    """A-ext: GROUP BY ROLLUP — subtotal hierarchy in one pass."""
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast(_DEC)).cast("double").alias("sum_qty"),
    )


def q_pivot(spark, sf_dir):
    """A-ext: pivot (orderstatus columns × priority rows)."""
    o = _t(spark, sf_dir, "orders")
    out = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .na.fill(0, ["F", "O", "P"])
    )
    return out.orderBy("o_orderpriority")


def q_running_total(spark, sf_dir):
    """W-ext: cumulative windowed sum per key (exact decimal, emitted
    as double)."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast(_DEC))
        .over(w)
        .cast("double")
        .alias("running_total"),
    )


def q_rank_lag(spark, sf_dir):
    """W-ext: rank + lag analytic functions per key."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.rank().over(w).alias("price_rank"),
        F.lag("o_totalprice", 1).over(w).alias("prev_price"),
    )


def q_percentiles(spark, sf_dir):
    """A-ext: exact interpolated percentiles per group."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile("l_quantity", 0.5).alias("p50"),
            F.percentile("l_quantity", 0.9).alias("p90"),
        )
        .orderBy("l_returnflag")
    )


def q_approx_distinct(spark, sf_dir):
    """A-ext: HyperLogLog++ approximate distinct counting — the sketch
    for cardinality at 100 TB. Engine sketches differ, so the query
    emits the exact count plus an in-query assertion that the HLL
    estimate (rsd=0.02) lands within ±5% of it; the oracle reproduces
    the exact count and the expected-true bound, making the sketch path
    fully driver-checkable."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("exact_parts"),
            F.approx_count_distinct("l_partkey", 0.02).alias("_approx"),
        )
        .select(
            "l_returnflag",
            "exact_parts",
            (
                F.abs(F.col("_approx") - F.col("exact_parts"))
                <= F.col("exact_parts") * F.lit(0.05)
            ).alias("approx_within_5pct"),
        )
        .orderBy("l_returnflag")
    )


def q_json_paths(spark, sf_dir):
    """F-ext: JSON extraction both ways side by side — typed
    ``from_json`` struct access AND ``get_json_object`` string-path
    access (fold of two round-1 queries whose oracle SQL was
    identical). Matching aggregate columns prove the two paths agree."""
    e = _t(spark, sf_dir, "events")
    k_struct = F.from_json(F.col("props"), "k BIGINT").getField("k")
    k_path = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return (
        e.select("event_type", k_struct.alias("ks"), k_path.alias("kp"))
        .groupBy("event_type")
        .agg(
            F.sum("ks").alias("sum_k_struct"),
            F.sum("kp").alias("sum_k_path"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type")
    )


def q_count_distinct(spark, sf_dir):
    """Substrate agg: count_distinct per group (SURVEY §2.4 note)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------- window / dedup (W/D) ---------------------------

def q_dedup_keep_first(spark, sf_dir):
    """W2: order-faithful keep-first dedup (reference keep='first' 668/695)."""
    li = _t(spark, sf_dir, "lineitem")
    return dedup_keep_first(
        li, ["l_orderkey"], [F.asc("l_linenumber"), F.asc("l_partkey")]
    ).select("l_orderkey", "l_linenumber", "l_partkey")


def q_distinct_rows(spark, sf_dir):
    """D1: full-row distinct (reference 667/693)."""
    li = _t(spark, sf_dir, "lineitem")
    return distinct_rows(li.select("l_returnflag", "l_linestatus"))


def q_dedup_business_key(spark, sf_dir):
    """D2: dedup by business key, key columns projected (reference 343)."""
    li = _t(spark, sf_dir, "lineitem")
    return distinct_rows(li, subset=["l_partkey", "l_suppkey"]).select(
        "l_partkey", "l_suppkey"
    )


# ------------------------------ set ops (U*) --------------------------------

def q_union_by_name(spark, sf_dir):
    """U1: union-by-name with missing columns null-filled (reference 491)."""
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_mktsegment").alias("mktsegment"),
        F.lit("customer").alias("src"),
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.col("s_name").alias("name"),
        F.col("s_acctbal").alias("acctbal"),
        F.lit("supplier").alias("src"),
    )
    return union_by_name(c, s)


def q_setops_u2_u3_u4(spark, sf_dir):
    """U2+U3+U4 in one tagged result: INTERSECT, EXCEPT, and
    UNION-distinct over overlapping halves (engine additions, SURVEY
    §2.7). Folded from three round-1 micro-queries; each branch keeps
    its full row set."""
    o = _t(spark, sf_dir, "orders")
    null_v = F.lit(None).cast("string").alias("v")
    inter = (
        o.filter(F.col("o_orderstatus") == "F")
        .select("o_orderpriority")
        .intersect(
            o.filter(F.col("o_orderstatus") == "O").select("o_orderpriority")
        )
        .select(
            F.lit("u2_intersect").alias("op"),
            F.col("o_orderpriority").alias("k"),
            null_v,
        )
    )
    exc = (
        o.select("o_orderpriority")
        .subtract(
            o.filter(F.col("o_orderstatus") == "P").select("o_orderpriority")
        )
        .select(
            F.lit("u3_except").alias("op"),
            F.col("o_orderpriority").alias("k"),
            null_v,
        )
    )
    ok = o.select("o_orderkey", "o_orderstatus")
    ud = (
        ok.filter(F.col("o_orderkey") % 3 != 0)
        .union(ok.filter(F.col("o_orderkey") % 2 != 0))  # overlapping halves
        .distinct()
        .select(
            F.lit("u4_union_distinct").alias("op"),
            F.col("o_orderkey").cast("string").alias("k"),
            F.col("o_orderstatus").alias("v"),
        )
    )
    return inter.unionByName(exc).unionByName(ud)


# --------------------------- scalar functions (F*) ---------------------------

def q_cleanse_normalize(spark, sf_dir):
    """F1/F2/F4/F15: trim, .0-strip, numeric normalize, null-propagating concat."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    messy_int = F.concat(
        F.lit("  "), F.col("l_partkey").cast("string"), F.lit(".0  ")
    )
    messy_num = F.concat(F.lit(" "), F.col("l_quantity").cast("string"), F.lit(" "))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        strip_decimal_str(messy_int).alias("code_clean"),
        normalize_numeric_string(messy_num).alias("qty_clean"),
        concat_key(
            F.col("l_returnflag"),
            F.nullif(F.col("l_linestatus"), F.lit("F")),
        ).alias("flag_key"),
    )


def q_split_code_name(spark, sf_dir):
    """F6: '<code>-<name>' split, nullable name (reference 698-706)."""
    o = _t(spark, sf_dir, "orders")
    code, name = split_code_name("o_orderpriority")
    return o.select(
        "o_orderpriority", code.alias("code"), name.alias("name")
    ).distinct()


def q_timestamp_coerce(spark, sf_dir):
    """F10: to_timestamp with null-on-failure (errors='coerce' parity)."""
    o = _t(spark, sf_dir, "orders")
    raw = F.when(
        F.col("o_orderkey") % 5 == 0, F.lit("not-a-date")
    ).otherwise(F.col("o_orderdate").cast("string"))
    parsed = to_timestamp_coerce(raw)
    return o.select(parsed.alias("p")).agg(
        F.count_if(F.col("p").isNotNull()).alias("n_parsed"),
        F.count_if(F.col("p").isNull()).alias("n_failed"),
    )


def q_fiscal_year(spark, sf_dir):
    """F12: fiscal-year derivation (Jul 1 → Jun 30; reference 499-512)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.select(fiscal_year("o_orderdate").alias("fy"))
        .groupBy("fy")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("fy")
    )


# ------------------------- LLM-pipeline extensions --------------------------

def q_doc_stats(spark, sf_dir):
    """Text analysis: per-document token/char/quality statistics."""
    d = _t(spark, sf_dir, "documents")
    out = document_stats(d)
    return out.select(
        "doc_id",
        "n_tokens",
        "n_distinct_tokens",
        "n_chars",
        "n_punct",
        F.round("avg_token_len", 6).alias("avg_token_len"),
        F.round("quality", 6).alias("quality"),
    )


# Adversarial text fixtures appended to the documents table by
# ext_pathological_text_stats: the shapes real corpora throw at a
# tokenizer that the well-behaved driver fixture never exercises —
# leading/trailing non-space whitespace (phantom-empty-token trap),
# whitespace-only, empty, U+000B (the \s Java/RE2 disagreement), CRLF,
# a multi-KB single token, a 2000-token single line. IDs start at
# 9_000_001, far above any fixture doc_id.
_PATHOLOGICAL_TEXTS: list[tuple[int, str]] = [
    (9_000_001, "\tleading tab"),
    (9_000_002, "trailing newline\n"),
    (9_000_003, "\n\n"),
    (9_000_004, ""),
    (9_000_005, "   "),
    (9_000_006, "\x0bvertical\x0btab\x0bsoup\x0b"),
    (9_000_007, "multi   space\t\tand\nnewlines\r\nmixed"),
    (9_000_008, "one"),
    (9_000_009, "x" * 5000),
    (9_000_010, ("tok " * 2000).strip()),
]


def _pathological_sql_values() -> str:
    rows = ", ".join(
        f"({i}, '" + t.replace("'", "''") + "')"
        for i, t in _PATHOLOGICAL_TEXTS
    )
    return f"(VALUES {rows})"


def q_pathological_text_stats(spark, sf_dir):
    """Adversarial-input audit: the token/shingle/fingerprint pipeline
    over the documents table UNIONED with pathological literal docs
    (empty, whitespace-only, control characters, megatoken — see
    _PATHOLOGICAL_TEXTS). The oracle recomputes every stat in SQL over
    the identical union, so tokenizer semantics on hostile input are
    VALUE-pinned cross-engine (phantom empty tokens or \\s-class
    disagreements break the hash match)."""
    from uofi_payroll_etl_main_demo_spark.functions.text import (
        fingerprint64,
        shingles_from_tokens,
        tokenize_ws,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    path = spark.createDataFrame(
        _PATHOLOGICAL_TEXTS, "doc_id long, text string"
    )
    u = d.unionByName(path)
    tokd = u.select(
        "doc_id", "text", tokenize_ws("text").alias("__toks")
    )
    toks = F.col("__toks")
    return tokd.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_distinct"),
        F.length("text").cast("bigint").alias("n_chars"),
        F.size(shingles_from_tokens(toks, 3)).cast("bigint").alias(
            "n_shingles"
        ),
        fingerprint64("text").alias("fingerprint"),
    )


def _sql_pathological_text_stats() -> str:
    return f"""
WITH u AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT * FROM {_pathological_sql_values()} v(doc_id, text)
),
t AS (SELECT doc_id, text, {_TOKS} AS toks FROM u)
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(CASE WHEN len(toks) >= 3 THEN len(list_distinct(
         list_transform(range(1, len(toks) - 3 + 2),
                        i -> array_to_string(toks[i:i + 2], ' '))))
         ELSE 0 END AS BIGINT) AS n_shingles,
       CAST(('0x' || substr(md5(regexp_replace(lower(trim(text)),
         '{_WS_CLASS}+', ' ', 'g')), 1, 15)) AS BIGINT) AS fingerprint
FROM t
"""


def q_token_stats(spark, sf_dir):
    """Text analysis: BPE-ish regex token counting (letters / digits /
    punctuation marks — the GPT-2-style pre-tokenization shape)."""
    from uofi_payroll_etl_main_demo_spark.functions.text import tokenize_bpe_ish

    d = _t(spark, sf_dir, "documents")
    toks = tokenize_bpe_ish("text")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_bpe_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_bpe_tokens"),
    )


def q_language_id(spark, sf_dir):
    """Text analysis: stopword-hit language ID + argmax prediction."""
    return language_id(_t(spark, sf_dir, "documents"))


def q_exact_dedup(spark, sf_dir):
    """Dedup: exact content dedup via md5 hash-groupBy, min-id survivor."""
    return exact_dedup(_t(spark, sf_dir, "documents")).select("doc_id", "n_chars")


def q_ngram_jaccard(spark, sf_dir):
    """Dedup: exact n-gram Jaccard similar pairs (k=3 shingles)."""
    pairs = ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), k=3, threshold=0.2
    )
    return pairs.select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    )


def q_top_ngrams(spark, sf_dir):
    """Corpus n-gram frequency: explode 2-word shingles → count →
    deterministic top-20 (count desc, gram asc). The map-side partial
    aggregation carries (gram, count) rows, never documents."""
    from uofi_payroll_etl_main_demo_spark.functions.text import (
        shingles_from_tokens,
        tokenize_ws,
    )

    d = _t(spark, sf_dir, "documents")
    tokd = d.select(tokenize_ws("text").alias("__toks"))
    return (
        tokd.select(
            F.explode(shingles_from_tokens(F.col("__toks"), 2)).alias("gram")
        )
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy(F.desc("n_docs"), F.asc("gram"))
        .limit(20)
    )


def q_winnow_fingerprints(spark, sf_dir):
    """Winnowing (MOSS) positional fingerprints; engine-portable md5
    hashes, so the oracle matches exact fingerprint values."""
    return winnowed_fingerprints(_t(spark, sf_dir, "documents"), k=5, w=4)


def q_chunk_documents(spark, sf_dir):
    """Overlapping token-window chunking (size=64, stride=48) — the
    pre-training/RAG segmentation op."""
    from uofi_payroll_etl_main_demo_spark.ext.textstats import chunk_documents

    return chunk_documents(
        _t(spark, sf_dir, "documents"), size=64, stride=48
    )


def q_winnow_containment(spark, sf_dir):
    """Passage-overlap pairs: docs sharing ≥ 2 winnowing fingerprints
    (detects CONTAINED/copied passages that whole-doc similarity
    misses). Equi-join on fingerprint, group-count per pair — the same
    bounded-pair shape as the LSH paths."""
    fps = winnowed_fingerprints(_t(spark, sf_dir, "documents"), k=5, w=4)
    a = fps.select(F.col("doc_id").alias("id_a"), "fp")
    b = fps.select(F.col("doc_id").alias("id_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= 2)
    )


def q_dedup_clusters(spark, sf_dir):
    """Duplicate clusters: connected components (iterative min-label
    propagation) over the exact n-gram Jaccard pair graph. Oracle =
    DuckDB recursive CTE over the identical pair SQL."""
    from uofi_payroll_etl_main_demo_spark.ext.clusters import (
        connected_components,
    )

    pairs = ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), k=3, threshold=0.2
    )
    return connected_components(pairs).select(
        F.col("id").alias("doc_id"), F.col("comp").alias("component")
    )


def q_minhash_pairs(spark, sf_dir):
    """Dedup: MinHash+LSH candidate pairs, Jaccard-verified. Uses the
    engine-portable md5 double-hashing family, so the oracle reproduces
    the EXACT banding → candidate → verified-pair pipeline in SQL —
    candidate recall included, not just the verification step."""
    pairs = minhash_near_dup_pairs(
        _t(spark, sf_dir, "documents"),
        num_hashes=32,
        bands=16,
        k=3,
        threshold=0.2,
        hash_family="portable",
    )
    return pairs.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


def q_minhash_pairs_prod(spark, sf_dir):
    """Dedup: the PRODUCTION MinHash path — xxhash64 shingle/signature
    family (the ext/dedup.py default), JVM-native hashing with no md5
    string round-trip. Same banding → candidate → Jaccard-verify
    pipeline as ext_minhash_pairs. Oracle = the exact n-gram Jaccard
    pair set: verified output equals it iff banding recall is 1 on the
    fixture (it is — pinned in tests/test_dedup.py for sf0.001/sf0.01),
    making this a value-exact recall+precision audit of the xxhash64
    family, not a rows-only check. The md5 'portable' twin
    (ext_minhash_pairs) additionally oracle-checks the banding
    intermediate itself."""
    pairs = minhash_near_dup_pairs(
        _t(spark, sf_dir, "documents"),
        num_hashes=32,
        bands=16,
        k=3,
        threshold=0.2,
    )
    return pairs.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


def q_simhash_pairs(spark, sf_dir):
    """Dedup: SimHash near-dup pairs, Hamming ≤ 3. Portable md5-derived
    bit family → signatures, pigeonhole chunks, and Hamming distances
    are bit-identical in the DuckDB oracle."""
    return simhash_near_dup_pairs(
        _t(spark, sf_dir, "documents"), max_hamming=3, hash_family="portable"
    )


def q_fingerprints(spark, sf_dir):
    """Text: 64-bit normalized content fingerprints (rows-only oracle)."""
    return fingerprints(_t(spark, sf_dir, "documents"))


def q_topk_cosine(spark, sf_dir):
    """Similarity: exact brute-force cosine top-k over embeddings."""
    out = brute_force_top_k(
        _t(spark, sf_dir, "embeddings"), QUERY_VEC, k=10
    )
    return out.select("vec_id", F.round("score", 6).alias("score"))


def q_lsh_topk(spark, sf_dir):
    """Similarity: LSH-bucketed approximate top-k (rows-only oracle)."""
    out = lsh_bucket_top_k(
        _t(spark, sf_dir, "embeddings"), QUERY_VEC, dim=64, k=10
    )
    return out.select("vec_id", F.round("score", 6).alias("score"))


def q_embedding_pairs_bucketed(spark, sf_dir):
    """Similarity: embedding-cosine near-dup pairs via LSH-bucketed
    equi-join (``all_pairs_above``) — the corpus-scale pair generator:
    candidates are generated only within random-hyperplane buckets
    (a hash-partitionable equi-join, never an all-pairs product), then
    exact-cosine verified. The oracle reproduces the deterministic
    hyperplane buckets in SQL, so even the approximate candidate set is
    exact-matched cross-engine. The quadratic broadcast baseline
    (``exact_cosine_pairs``) remains a small-n test oracle only
    (tests/test_similarity_scale.py pins bucketed ⊆ exact)."""
    from uofi_payroll_etl_main_demo_spark.ext.similarity import all_pairs_above

    pairs = all_pairs_above(
        _t(spark, sf_dir, "embeddings"),
        dim=64,
        threshold=0.35,
        n_planes=4,
    )
    return pairs.select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))


def q_sq_rerank_topk(spark, sf_dir):
    """Two-stage ANN: int8-quantized scan → exact rerank (rows-only;
    recall vs the exact baseline is pinned in tests)."""
    from uofi_payroll_etl_main_demo_spark.ext.similarity import sq_rerank_top_k

    emb = _t(spark, sf_dir, "embeddings")
    out = sq_rerank_top_k(emb, QUERY_VEC, k=10, candidates=100)
    return out.select("vec_id", F.round("score", 6).alias("score"))


def q_topk_cosine_gemm(spark, sf_dir):
    """Similarity: exact top-k via numpy GEMM over Arrow batches — the
    compute-bound scale path (rows-only oracle: BLAS summation order
    differs from the fold-left oracle arithmetic at the last ulp; its
    parity with the oracle-checked HOF baseline is pinned in
    tests/test_similarity_scale.py)."""
    from uofi_payroll_etl_main_demo_spark.ext.similarity import (
        brute_force_top_k_gemm,
    )

    out = brute_force_top_k_gemm(_t(spark, sf_dir, "embeddings"), QUERY_VEC, k=10)
    return out.select("vec_id", F.round("score", 6).alias("score"))


def q_ivf_topk(spark, sf_dir):
    """IVF (k-means inverted lists) top-k, EXACTNESS form: probing ALL
    inverted lists (nprobe == n_centroids) makes the coarse pruning a
    no-op, so the full IVF path — k-means fit, list assignment, probe
    filter, HOF cosine scoring, rank — must return EXACTLY the
    brute-force top-k; oracle = the exact SQL top-k. Round-10 fold of
    the former rows-only nprobe=3 row into its full-probe twin
    (ext_ivf_topk_full, r9-green): a data-adaptive index earns a VALUE
    oracle only at full probe, and two registry rows over one code
    path is padding — the nprobe<n_centroids recall/latency trade
    stays pinned in tests (test_ann_index.py probe-subset pins) and
    measured in scripts/ann_batch_probe.py."""
    from uofi_payroll_etl_main_demo_spark.ext.ivf import build_ivf_index

    index = build_ivf_index(_t(spark, sf_dir, "embeddings"), n_centroids=8)
    out = index.search(QUERY_VEC, k=10, nprobe=8)
    return out.select("vec_id", F.round("score", 6).alias("score"))


def q_ivf_pq_topk(spark, sf_dir):
    """IVF-PQ composed ANN (coarse-list pruning → PQ ADC scan → exact
    rerank), EXACTNESS form: nprobe == n_centroids makes the coarse
    pruning a no-op and a rerank margin ≥ corpus size makes the ADC
    cut a no-op, so the composed inline path must return EXACTLY the
    brute-force top-k — the value oracle for the whole composition
    (the r9 persisted-store row ext_ivfpq_index_query oracles the
    store lifecycle; THIS row oracles the inline composition). The
    bounded nprobe/candidates trades stay pinned in tests
    (ivf_pq_search ≡ pq_top_k at full probe) and measured in
    scripts/ivfpq_probe.py."""
    from uofi_payroll_etl_main_demo_spark.ext.ivf import ivf_pq_search

    out = ivf_pq_search(
        _t(spark, sf_dir, "embeddings"), QUERY_VEC, k=10, nprobe=8,
        n_centroids=8, candidates=1_000_000,
    )
    return out.select("vec_id", F.round("score", 6).alias("score"))


def q_multimodal_features(spark, sf_dir):
    """Multimodal: mapInPandas feature extraction over binary payloads —
    REAL decode for codec-free formats (16-bit PCM WAV via stdlib wave,
    binary P6 PPM), byte-stat stub for compressed codecs (ext/
    multimodal.py). One row per media item, modality-specific features
    coalesced into a common shape. Oracle: every emitted feature has a
    CLOSED FORM the DuckDB oracle recomputes arithmetically from the
    same generation parameters (byte stats of the (i*31+j*7)%251
    pattern; RMS / zero-crossing rate of the int16-truncated sine;
    stripe channel means) — see ``_sql_multimodal_features``. The
    FFT spectral centroid (not SQL-expressible) stays pytest-pinned in
    test_io.py (sine centroid == tone frequency, 16-bit/PPM
    roundtrips)."""
    from uofi_payroll_etl_main_demo_spark.ext.multimodal import (
        audio_features,
        image_features,
        synthetic_av_media,
    )

    stub = extract_features(synthetic_media(spark, n=64)).select(
        "media_id",
        F.lit("stub").alias("kind"),
        F.round("byte_mean", 6).alias("f1"),
        F.round("byte_std", 6).alias("f2"),
    )
    av = synthetic_av_media(spark, n=32)
    audio = audio_features(
        av.filter(F.col("meta.mime") == "audio/wav")
    ).select(
        "media_id",
        F.lit("audio").alias("kind"),
        F.round("rms", 6).alias("f1"),
        F.round("zero_cross_rate", 6).alias("f2"),
    )
    image = image_features(
        av.filter(F.col("meta.modality") == "image")
    ).select(
        "media_id",
        F.lit("image").alias("kind"),
        F.round("mean_r", 6).alias("f1"),
        F.round("mean_b", 6).alias("f2"),
    )
    return stub.unionByName(audio).unionByName(image)


# ------------------- temporal joins (engine extension) ---------------------


def q_asof_join(spark, sf_dir):
    """As-of join: each error event picks the latest prior-or-equal click
    of the same user (union+window, one shuffle — operators/temporal.py)."""
    from uofi_payroll_etl_main_demo_spark.operators.temporal import asof_join

    ev = _t(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click")
    return asof_join(errors, clicks, on="user_id", payload=["value"]).select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
        F.date_format("asof_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
            "click_ts"
        ),
        F.round("asof_value", 6).alias("click_value"),
    )


def q_range_join(spark, sf_dir):
    """Band join: clicks per user in the hour up to each error event
    (bucketed equi-join, not a theta join — operators/temporal.py)."""
    from uofi_payroll_etl_main_demo_spark.operators.temporal import range_join

    ev = _t(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click")
    pairs = range_join(
        errors, clicks, on="user_id", right_payload=["event_id"]
    )
    counts = pairs.groupBy("event_id").agg(
        F.count(F.lit(1)).alias("n_clicks")
    )
    return errors.join(counts, "event_id", "left").select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
        F.coalesce("n_clicks", F.lit(0)).alias("n_clicks"),
    )


# ---------------- cube / stats / arrays / series (A/F-ext) ------------------


def q_cube(spark, sf_dir):
    """A-ext: GROUP BY CUBE with grouping flags (full subtotal lattice)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("int").alias("g_flag"),
        F.grouping("l_linestatus").cast("int").alias("g_status"),
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast(_DEC)).cast("double").alias("sum_qty"),
    )


def q_stat_aggs(spark, sf_dir):
    """A-ext: statistical aggregates (stddev/variance/corr/covariance).

    Computed over small-magnitude measures (quantity/discount) so the
    1e-6 rounding absorbs the order-dependence of double reduction.
    """
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qp"),
        F.round(F.covar_samp("l_quantity", "l_discount"), 6).alias("cov_qd"),
    )


def q_explode_norms(spark, sf_dir):
    """Array explode → re-aggregate: posexplode each embedding and
    rebuild its L2 norm and dimension count from the exploded rows."""
    emb = _t(spark, sf_dir, "embeddings")
    ex = emb.select(
        "vec_id", F.posexplode("embedding").alias("pos", "val")
    )
    return ex.groupBy("vec_id").agg(
        F.count(F.lit(1)).alias("n_dims"),
        F.round(
            F.sqrt(F.sum(F.col("val").cast("double") * F.col("val").cast("double"))),
            6,
        ).alias("l2_norm"),
    )


def q_collect_sorted(spark, sf_dir):
    """collect_set → array_sort → join to string (deterministic list
    aggregation; oracle = string_agg DISTINCT ... ORDER BY)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.concat_ws(
            ",", F.array_sort(F.collect_set("l_linestatus"))
        ).alias("statuses"),
        F.concat_ws(
            ",",
            F.array_sort(F.collect_set(F.col("l_linenumber").cast("string"))),
        ).alias("linenumbers"),
    )


def q_date_series(spark, sf_dir):
    """Generated date dimension (sequence+explode) left-joined to daily
    order counts — calendar densification with zero-filled gaps."""
    o = _t(spark, sf_dir, "orders")
    days = spark.range(1).select(
        F.explode(
            F.sequence(
                F.to_date(F.lit("1996-01-01")),
                F.to_date(F.lit("1996-03-31")),
                F.expr("interval 1 day"),
            )
        ).alias("day")
    )
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    return days.join(daily, "day", "left").select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
    )


def q_unpivot(spark, sf_dir):
    """A-ext: unpivot/melt — wide measure columns to (measure, value)
    rows (the inverse of a7_pivot)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_quantity").alias("qty"),
            F.col("l_discount").alias("disc"),
        )
        .unpivot(
            ["l_orderkey", "l_linenumber"], ["qty", "disc"], "measure", "value"
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            "measure",
            F.round("value", 6).alias("value"),
        )
    )


def q_topk_per_group(spark, sf_dir):
    """W-ext: per-group top-k (rank window + filter): 3 highest-price
    orders per order status, deterministic tie-break by key."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_orderstatus", "rk", "o_orderkey", "o_totalprice")
    )


def q_ntile_deciles(spark, sf_dir):
    """W-ext: ntile decile assignment + per-decile aggregates (the
    stratification primitive behind quality-bucket curation).

    Scale caveat, stated deliberately: an UNPARTITIONED window funnels
    the whole table through one task — correct here and fine to sf-size
    data, but at 100 TB stratification is done with cut points from
    ``approx_percentile`` (a8/a9 pattern) applied as a narrow map, or
    ntile within partition groups."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    w = Window.orderBy(F.asc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("decile", F.ntile(10).over(w))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast(_DEC))
            .cast("double")
            .alias("total"),
        )
    )


def q_locf_fill(spark, sf_dir):
    """W-ext: last-observation-carried-forward imputation — nulls in a
    per-key time series replaced by the most recent non-null (window
    ``last(ignorenulls)``), the standard sensor/price gap-fill."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    # synthesize gaps deterministically: every 5th event loses its value
    gappy = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("event_id") % 5 != 0, F.col("value")).alias("value"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return gappy.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
        F.round(
            F.last("value", ignorenulls=True).over(w), 6
        ).alias("value_filled"),
    )


def q_range_frame_window(spark, sf_dir):
    """W-ext: RANGE-frame window — per customer, rolling sum of order
    totals over the 30 days preceding each order (time-based frame, not
    row-based; frames on the epoch-second ordering column)."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-30 * 86400, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        F.sum(F.col("o_totalprice").cast(_DEC))
        .over(w)
        .cast("double")
        .alias("rolling_30d_total"),
    )


def q_try_cast(spark, sf_dir):
    """F-ext: ANSI-safe coercion — try_cast/try_divide return null on
    failure instead of raising (the ANSI-mode-on idiom for messy data;
    Spark 4 enables ANSI by default)."""
    li = _t(spark, sf_dir, "lineitem")
    messy = F.when(
        F.col("l_linenumber") % 3 == 0, F.lit("not-a-number")
    ).otherwise(F.col("l_quantity").cast("string"))
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            messy.try_cast("double").alias("qty_parsed"),
            F.try_divide(
                F.col("l_extendedprice"), F.col("l_quantity") - F.lit(1.0)
            ).alias("unit_ish"),
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            "qty_parsed",
            # floor(x·1e6), not round(x, 6): both engines compute the
            # SAME IEEE double for the division, but their ROUND rules
            # differ on exact .5 decimal boundaries; floor of the same
            # double is always identical.
            F.floor(F.col("unit_ish") * 1e6).alias("unit_micro"),
        )
    )


def q_date_trunc_agg(spark, sf_dir):
    """F-ext: date_trunc month rollup of order totals."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.date_format(
                F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd"
            ).alias("month")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast(_DEC))
            .cast("double")
            .alias("total"),
        )
    )


def q_json_map_explode(spark, sf_dir):
    """F-ext: JSON object → typed map → exploded (key, value) rows."""
    ev = _t(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    return ev.select("event_id", F.explode(m).alias("prop_key", "prop_value"))


def q_regexp_extract_groups(spark, sf_dir):
    """F-ext: regex capture-group extraction (structured field out of a
    formatted code)."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_brand", r"Brand#([0-9]+)", 1).alias("brand_num"),
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
    )


def q_fuzzy_name_pairs(spark, sf_dir):
    """Entity resolution: near-identical customer names by Levenshtein
    distance, blocked by nation (the classic blocking-key pattern —
    candidate pairs form only within a block, never corpus×corpus; at
    100 TB the block key is the lever that keeps this quadratic local)."""
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_name"
    )
    a = c.select(
        F.col("c_nationkey").alias("nk"),
        F.col("c_custkey").alias("id_a"),
        F.col("c_name").alias("name_a"),
    )
    b = c.select(
        F.col("c_nationkey").alias("nk"),
        F.col("c_custkey").alias("id_b"),
        F.col("c_name").alias("name_b"),
    )
    return (
        a.join(b, "nk")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= 3)
        .select("id_a", "id_b", "dist")
    )


def q_json_variant(spark, sf_dir):
    """F-ext: VARIANT semi-structured path access (Spark 4
    parse_json/variant_get — schema-on-read without a declared struct)."""
    ev = _t(spark, sf_dir, "events")
    v = F.parse_json("props")
    return ev.select(
        "event_id",
        F.variant_get(v, "$.k", "int").alias("k_value"),
        F.variant_get(v, "$.missing", "string").alias("absent"),
    )


# ---------------- deterministic sampling / SCD2 history --------------------


def q_histogram(spark, sf_dir):
    """A-ext: fixed-width histogram of order totals (closed-form bucket
    arithmetic — portable, shuffle = one narrow (bucket, count) agg)."""
    o = _t(spark, sf_dir, "orders")
    bucket = F.least(
        F.floor(F.col("o_totalprice") / 50000).cast("int"), F.lit(9)
    )
    return (
        o.groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("lo", F.col("bucket") * 50000)
    )


def q_hash_sample(spark, sf_dir):
    """Deterministic content-keyed ~10% sample (engine-portable md5
    bucketing — operators/sampling.py; the oracle reproduces the exact
    row set, which no seed-based sample() can promise)."""
    from uofi_payroll_etl_main_demo_spark.operators.sampling import hash_sample

    o = _t(spark, sf_dir, "orders")
    return hash_sample(o, "o_orderkey", 10).select("o_orderkey", "o_totalprice")


def q_stratified_sample(spark, sf_dir):
    """Per-stratum deterministic sampling (class rebalancing): keep 50%
    of F-status orders, 10% of O, drop P."""
    from uofi_payroll_etl_main_demo_spark.operators.sampling import (
        stratified_hash_sample,
    )

    o = _t(spark, sf_dir, "orders")
    out = stratified_hash_sample(
        o, "o_orderstatus", "o_orderkey", {"F": 50, "O": 10}
    )
    return out.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n"))


def q_scd2_history(spark, sf_dir):
    """SCD2 validity intervals from change rows (one lead-window pass):
    each customer's order history as [valid_from, valid_to) + current."""
    from uofi_payroll_etl_main_demo_spark.operators.history import scd2_intervals

    o = _t(spark, sf_dir, "orders")
    out = scd2_intervals(
        o,
        key="o_custkey",
        ts="o_orderdate",
        attrs=["o_orderkey", "o_totalprice"],
        tiebreak=["o_orderkey"],
    )
    return out.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.date_format("valid_from", "yyyy-MM-dd").alias("valid_from"),
        F.date_format("valid_to", "yyyy-MM-dd").alias("valid_to"),
        "is_current",
    )


# --------------------------- SQL front-end ---------------------------------


def q_sql_frontend(spark, sf_dir):
    """The flagship query submitted as SQL TEXT through spark.sql over
    registered views (sql.py) — proves the engine's SQL surface compiles
    to the same plans as the DataFrame builders. The oracle is the very
    same string run by DuckDB."""
    from uofi_payroll_etl_main_demo_spark.sql import run_sql

    return run_sql(spark, sf_dir, _SQL_PRICING)


# -------------------- streaming operators (batch mode) ---------------------
# The streaming module's transforms are batch/stream-unified; their batch
# runs are oracle-checkable here, and tests/test_streaming.py proves the
# streaming runs converge to the same result.


def q_stream_window_counts(spark, sf_dir):
    """Tumbling-window counts (batch mode of the streaming aggregation)."""
    from uofi_payroll_etl_main_demo_spark.streaming.events import (
        windowed_event_counts,
    )

    return windowed_event_counts(_t(spark, sf_dir, "events"))


def q_stream_sliding_counts(spark, sf_dir):
    """Sliding-window counts (10-minute window, 5-minute slide): every
    event lands in two overlapping windows — the rate-over-trailing-
    interval view a tumbling window cannot give (batch mode of the
    streaming aggregation; same operator runs on readStream)."""
    from uofi_payroll_etl_main_demo_spark.streaming.events import (
        windowed_event_counts,
    )

    return windowed_event_counts(
        _t(spark, sf_dir, "events"), window="10 minutes", slide="5 minutes"
    )


def q_stream_rollup(spark, sf_dir):
    """Running per-type totals (batch mode of the complete-mode rollup)."""
    from uofi_payroll_etl_main_demo_spark.streaming.events import event_type_rollup

    return event_type_rollup(_t(spark, sf_dir, "events"))


def q_stream_static_join(spark, sf_dir):
    """Batch mode of the stream-static broadcast enrichment join."""
    from uofi_payroll_etl_main_demo_spark.streaming.events import enrich_stream

    ev = _t(spark, sf_dir, "events")
    cust = _t(spark, sf_dir, "customer")
    enriched = enrich_stream(
        ev, cust, {"user_id": "c_custkey"}, ["c_mktsegment"]
    )
    return enriched.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast(_DEC)).cast("double").alias("sum_value"),
    )


def q_stream_sessionize(spark, sf_dir):
    """Gap-based sessionization (batch twin of applyInPandasWithState)."""
    from uofi_payroll_etl_main_demo_spark.streaming.events import sessionize

    out = sessionize(_t(spark, sf_dir, "events"), gap="30 minutes")
    return out.select(
        "user_id",
        "session_start",
        "session_end",
        "n_events",
        F.round("sum_value", 6).alias("sum_value"),
    )


def q_stream_dedup(spark, sf_dir):
    """Batch twin of ``dropDuplicatesWithinWatermark``: exactly-once
    per (user_id, event_type), keep-first by event time — deterministic
    under any partitioning, unlike plain dropDuplicates."""
    from uofi_payroll_etl_main_demo_spark.streaming.events import dedup_events

    out = dedup_events(
        _t(spark, sf_dir, "events"), keys=["user_id", "event_type"]
    )
    return out.select("event_id", "user_id", "event_type", "ts", "value")


def q_stream_interval_join(spark, sf_dir):
    """Batch twin of the stream-stream interval join: click-after-view
    attribution per user within 10 minutes."""
    from uofi_payroll_etl_main_demo_spark.streaming.events import (
        correlate_streams,
    )

    ev = _t(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view")
    clicks = ev.filter(F.col("event_type") == "click")
    return correlate_streams(views, clicks, within="10 minutes").select(
        "user_id", "l_event_id", "r_event_id", "lag_us"
    )


# ------------------------- pipeline composition -----------------------------

def q_pipeline_payroll_shape(spark, sf_dir):
    """End-to-end PUA-shaped pipeline (SURVEY §3.2 spine): derive concat
    key → broadcast-enrich → date filter → keep-first dedup → contract."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    supp = _t(spark, sf_dir, "supplier")
    fact = li.filter(
        F.col("l_shipdate").between(F.lit("1996-01-01"), F.lit("1998-12-31"))
    ).withColumn(
        "line_key",
        concat_key(
            F.col("l_orderkey").cast("string"), F.col("l_linenumber").cast("string")
        ),
    )
    fact = safe_left_join(fact, part, {"l_partkey": "p_partkey"}, payload=["p_brand"])
    fact = safe_left_join(fact, supp, {"l_suppkey": "s_suppkey"}, payload=["s_name"])
    # Keep-first under a TOTAL order within each key group — lineitem has
    # duplicate (orderkey, linenumber) pairs, so ordering by derived
    # line_key alone would tie and pick arbitrary survivors.
    fact = dedup_keep_first(
        fact,
        ["l_orderkey", "l_linenumber"],
        [F.asc("l_partkey"), F.asc("l_suppkey"), F.asc("l_shipdate")],
    )
    return select_contract(
        fact,
        [
            ("Line Key", "line_key"),
            ("Order Key", "l_orderkey"),
            ("Ship Date", None),  # exercised null-fill
            ("Part Brand", "p_brand"),
            ("Supplier Name", "s_name"),
            ("Legacy Flag", None),
        ],
    )


def q_zscore(spark, sf_dir):
    """Per-group z-score normalization (window mean/stddev — the
    JVM-side production form; the applyInPandas twin is pinned equal in
    tests)."""
    from uofi_payroll_etl_main_demo_spark.ext.features import zscore_window

    ev = _t(spark, sf_dir, "events")
    out = zscore_window(ev, "event_type", "value")
    return out.select(
        "event_id",
        "event_type",
        # floor(x·1e6): IEEE-stable emission (round() rule divergence)
        F.floor(F.col("zscore") * 1e6).alias("z_micro"),
    )


def q_profile_table(spark, sf_dir):
    """Per-column profiling of customer in ONE scan (nulls / distinct /
    min / max per column, unpivoted to a row per column)."""
    from uofi_payroll_etl_main_demo_spark.validate.profile import profile_table

    return profile_table(
        _t(spark, sf_dir, "customer"),
        ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
    )


def q_pipeline_curation(spark, sf_dir):
    """End-to-end LLM-data curation pipeline — the north-star composite:
    quality-score → language-filter → near-dup cluster removal, all as
    ONE lazy plan (each stage is a narrow map or one shuffle; the only
    iterative part is component propagation over the tiny pair graph).
    """
    from uofi_payroll_etl_main_demo_spark.ext.clusters import (
        connected_components,
    )
    from uofi_payroll_etl_main_demo_spark.ext.textstats import curation_scores

    docs = _t(spark, sf_dir, "documents")
    # quality + language are per-row maps: fused into ONE narrow scan
    # (curation_scores) instead of two derived frames shuffle-joined
    # back on doc_id — and the cheap filters run BEFORE the anti-join
    # so the join probes only the kept slice. The panel is PERSISTED
    # before its filter (same measured pattern as pipeline_curation_v2:
    # filtering directly on a derived column makes CollapseProject
    # re-expand the whole per-document expression tree into the
    # predicate, evaluating tokenization twice per row); pooled so the
    # next registry invocation unpersists it (_drain_persist_pool).
    _drain_persist_pool()
    scored = _pooled_persist(curation_scores(docs)).filter(
        (F.col("quality") >= 0.5) & (F.col("predicted_lang") == "en")
    )
    pairs = ngram_jaccard_pairs(docs, k=3, threshold=0.2)
    losers = (
        connected_components(pairs)
        .filter(F.col("id") != F.col("comp"))
        .select(F.col("id").alias("doc_id"))
    )
    return scored.join(losers, "doc_id", "left_anti").select(
        "doc_id", F.round("quality", 6).alias("quality"), "predicted_lang"
    )


def q_pipeline_cpa_shape(spark, sf_dir):
    """End-to-end CPA-shaped pipeline (SURVEY §3.3 spine): union-by-name
    of two source variants (one missing a column) → fiscal-year filter →
    broadcast enrich → dedup cascade (full-row, then keep-first by
    business key) → code/name split → contract projection."""
    o = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    # two "certification files": same feed, one variant lacks a column
    bw = o.filter(F.col("o_orderkey") % 2 == 0)
    mn = o.filter(F.col("o_orderkey") % 2 == 1).drop("o_orderpriority")
    unioned = union_by_name(bw, mn)
    fy = unioned.filter(
        F.col("o_orderdate").between(
            F.lit("1995-07-01"), F.lit("1996-06-30")
        )
    )
    fact = safe_left_join(
        fy, cust, {"o_custkey": "c_custkey"}, payload=["c_mktsegment"]
    )
    fact = distinct_rows(fact)
    fact = dedup_keep_first(
        fact, ["o_custkey"], [F.asc("o_orderdate"), F.asc("o_orderkey")]
    )
    code, name = split_code_name("o_orderpriority")
    return fact.select(
        F.col("o_orderkey").alias("Order Key"),
        F.col("o_custkey").alias("Customer Key"),
        F.col("c_mktsegment").alias("Segment"),
        code.alias("Priority Code"),
        name.alias("Priority Name"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("Order Date"),
    )


# --------------------------------------------------------------------------
# Registry: name -> (spark_fn, oracle_sql | None)
# --------------------------------------------------------------------------

REGISTRY: dict[str, tuple[QueryFn, str | None]] = {
    "pricing_summary": (q_pricing_summary, _SQL_PRICING),
    "p1_projection": (
        q_projection,
        "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem",
    ),
    "p2_output_contract": (
        q_output_contract,
        "SELECT p_partkey AS part_id, p_name AS part_name, p_brand AS brand, "
        "CAST(NULL AS VARCHAR) AS legacy_code FROM part",
    ),
    "p3_p4_p5_filters": (
        q_filters_p3_p4_p5,
        r"SELECT 'p3_contains_ci' AS probe, CAST(doc_id AS VARCHAR) AS k, "
        r"source AS v FROM documents WHERE text ILIKE '%spark%' "
        r"UNION ALL SELECT 'p4_regex_ci', CAST(p_partkey AS VARCHAR), p_name "
        r"FROM part WHERE regexp_matches(p_name, '(?i)(^|\s)red(\s|$)') "
        r"UNION ALL SELECT 'p5_inlist', l_returnflag, CAST(n AS VARCHAR) "
        r"FROM (SELECT l_returnflag, count(*) AS n FROM lineitem "
        r"WHERE l_returnflag IN ('A','R') GROUP BY l_returnflag)",
    ),
    "p6_p7_filter_eq_between": (
        q_filter_eq_between,
        "SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderstatus = 'F' "
        "AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'",
    ),
    "p8_format_violations": (
        q_filter_format_violations,
        "SELECT p_brand, count(*) AS n FROM part "
        "WHERE NOT coalesce(regexp_matches(p_brand, '^Brand#[0-9]{2}$'), false) "
        "GROUP BY p_brand",
    ),
    "p9_tristate_missing": (
        q_tristate_missing,
        "SELECT l_returnflag, "
        "(v IS NULL OR trim(v) IN ('', 'nan', 'NaN')) AS missing, "
        "count(*) AS n FROM (SELECT l_returnflag, "
        "CASE WHEN l_linenumber % 7 = 0 THEN NULL "
        "WHEN l_linenumber % 7 = 1 THEN '' "
        "WHEN l_linenumber % 7 = 2 THEN '  nan ' "
        "ELSE l_returnflag END AS v FROM lineitem) "
        "GROUP BY l_returnflag, missing",
    ),
    "p10_first_pick": (
        q_first_pick,
        "SELECT p_partkey, p_name FROM part ORDER BY p_partkey LIMIT 1",
    ),
    "o_topk_orders": (
        q_topk_orders,
        "SELECT o_orderkey, o_totalprice FROM orders "
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10",
    ),
    "j1_broadcast_left_join": (
        q_broadcast_left_join,
        "SELECT r_name, count(*) AS n_cust, "
        "CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal "
        "FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey "
        "LEFT JOIN region ON n_regionkey = r_regionkey "
        "GROUP BY r_name ORDER BY r_name",
    ),
    "j6_synthetic_key_join": (
        q_synthetic_key_join,
        "WITH fact AS (SELECT *, l_orderkey || '-' || l_linenumber AS line_key "
        "FROM lineitem), dim AS (SELECT line_key, min(l_shipdate) AS ship2 "
        "FROM fact GROUP BY line_key) SELECT count(*) AS n_rows, "
        "CAST(sum(CASE WHEN f.l_shipdate = d.ship2 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_matched FROM fact f LEFT JOIN dim d ON f.line_key = d.line_key",
    ),
    "j7_multi_key_join": (
        q_multi_key_join,
        "WITH dim AS (SELECT l_returnflag, l_linestatus, "
        "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS grp_qty "
        "FROM lineitem "
        "GROUP BY 1, 2) SELECT l.l_returnflag, l.l_linestatus, d.grp_qty, "
        "count(*) AS n FROM lineitem l LEFT JOIN dim d "
        "ON l.l_returnflag = d.l_returnflag AND l.l_linestatus = d.l_linestatus "
        "GROUP BY 1, 2, 3",
    ),
    "jx_semi_join": (
        q_semi_join,
        "SELECT o_orderkey, o_orderstatus FROM orders WHERE EXISTS ("
        "SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey "
        "AND l_shipdate > TIMESTAMP '2000-01-01')",
    ),
    "jx_anti_join": (
        q_anti_join,
        "SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS ("
        "SELECT 1 FROM orders WHERE o_custkey = c_custkey)",
    ),
    "j10_mode_lookup_join": (
        q_mode_lookup_join,
        "WITH mode AS (SELECT o_orderstatus, o_orderpriority AS mode_priority "
        "FROM (SELECT o_orderstatus, o_orderpriority, count(*) AS cnt "
        "FROM orders GROUP BY 1, 2) "
        "QUALIFY row_number() OVER (PARTITION BY o_orderstatus "
        "ORDER BY cnt DESC, o_orderpriority) = 1) "
        "SELECT o.o_orderstatus, m.mode_priority, count(*) AS n "
        "FROM orders o LEFT JOIN mode m ON o.o_orderstatus = m.o_orderstatus "
        "GROUP BY 1, 2 ORDER BY o.o_orderstatus",
    ),
    "a1_mode_by_group": (
        q_mode_by_group,
        "SELECT o_orderstatus, o_orderpriority AS mode_priority "
        "FROM (SELECT o_orderstatus, o_orderpriority, count(*) AS cnt "
        "FROM orders GROUP BY 1, 2) "
        "QUALIFY row_number() OVER (PARTITION BY o_orderstatus "
        "ORDER BY cnt DESC, o_orderpriority) = 1",
    ),
    "a2_a4_minmax_counts": (
        q_minmax_counts,
        "SELECT min(strftime(l_shipdate, '%Y-%m-%d')) AS min_ship, "
        "max(strftime(l_shipdate, '%Y-%m-%d')) AS max_ship, "
        "CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_null_ship, count(*) AS n_rows FROM lineitem",
    ),
    "a8_percentiles": (
        q_percentiles,
        "SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS p50, "
        "quantile_cont(l_quantity, 0.9) AS p90 FROM lineitem "
        "GROUP BY l_returnflag ORDER BY l_returnflag",
    ),
    "a9_approx_distinct": (
        q_approx_distinct,
        "SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts, "
        "TRUE AS approx_within_5pct FROM lineitem "
        "GROUP BY l_returnflag ORDER BY l_returnflag",
    ),
    "json_struct_and_path": (
        q_json_paths,
        "SELECT event_type, "
        "CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k_struct, "
        "CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k_path, "
        "count(*) AS n FROM events GROUP BY event_type "
        "ORDER BY event_type",
    ),
    "a6_rollup": (
        q_rollup,
        "SELECT l_returnflag, l_linestatus, count(*) AS n, "
        "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty "
        "FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)",
    ),
    "a7_pivot": (
        q_pivot,
        'SELECT o_orderpriority, '
        'count(*) FILTER (WHERE o_orderstatus = \'F\') AS "F", '
        'count(*) FILTER (WHERE o_orderstatus = \'O\') AS "O", '
        'count(*) FILTER (WHERE o_orderstatus = \'P\') AS "P" '
        "FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority",
    ),
    "w3_running_total": (
        q_running_total,
        "SELECT o_custkey, o_orderkey, "
        "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER ("
        "PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey "
        "ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_total FROM orders",
    ),
    "w4_rank_lag": (
        q_rank_lag,
        "SELECT o_custkey, o_orderkey, "
        "rank() OVER w AS price_rank, lag(o_totalprice, 1) OVER w AS prev_price "
        "FROM orders WINDOW w AS (PARTITION BY o_custkey "
        "ORDER BY o_totalprice DESC, o_orderkey)",
    ),
    "a5_count_distinct": (
        q_count_distinct,
        "SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts, "
        "count(DISTINCT l_suppkey) AS n_supps FROM lineitem "
        "GROUP BY l_returnflag ORDER BY l_returnflag",
    ),
    "w2_dedup_keep_first": (
        q_dedup_keep_first,
        "SELECT l_orderkey, l_linenumber, l_partkey FROM lineitem "
        "QUALIFY row_number() OVER (PARTITION BY l_orderkey "
        "ORDER BY l_linenumber, l_partkey) = 1",
    ),
    "d1_distinct_rows": (
        q_distinct_rows,
        "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    ),
    "d2_dedup_business_key": (
        q_dedup_business_key,
        "SELECT DISTINCT l_partkey, l_suppkey FROM lineitem",
    ),
    "u1_union_by_name": (
        q_union_by_name,
        "SELECT c_name AS name, c_acctbal AS acctbal, "
        "c_mktsegment AS mktsegment, 'customer' AS src FROM customer "
        "UNION ALL SELECT s_name, s_acctbal, CAST(NULL AS VARCHAR), 'supplier' "
        "FROM supplier",
    ),
    "u2_u3_u4_setops": (
        q_setops_u2_u3_u4,
        "SELECT 'u2_intersect' AS op, o_orderpriority AS k, "
        "CAST(NULL AS VARCHAR) AS v FROM ("
        "SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F' "
        "INTERSECT SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O') "
        "UNION ALL SELECT 'u3_except', o_orderpriority, NULL FROM ("
        "SELECT o_orderpriority FROM orders "
        "EXCEPT SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'P') "
        "UNION ALL SELECT 'u4_union_distinct', CAST(o_orderkey AS VARCHAR), "
        "o_orderstatus FROM ("
        "SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey % 3 <> 0 "
        "UNION "
        "SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey % 2 <> 0)",
    ),
    "f_cleanse_normalize": (
        q_cleanse_normalize,
        r"SELECT l_orderkey, l_linenumber, "
        r"regexp_replace(trim('  ' || l_partkey || '.0  '), '\.0$', '') "
        r"AS code_clean, "
        r"CASE WHEN regexp_matches(trim(' ' || l_quantity || ' '), "
        r"'^(\d+(\.0*)?|\.0+)$') THEN coalesce(nullif(regexp_replace("
        r"regexp_extract(trim(' ' || l_quantity || ' '), '^(\d*)', 1), "
        r"'^0+', ''), ''), '0') ELSE trim(' ' || l_quantity || ' ') END "
        r"AS qty_clean, "
        r"l_returnflag || '-' || nullif(l_linestatus, 'F') AS flag_key "
        r"FROM lineitem WHERE l_orderkey < 100",
    ),
    "f6_split_code_name": (
        q_split_code_name,
        "SELECT DISTINCT o_orderpriority, "
        "trim(split_part(o_orderpriority, '-', 1)) AS code, "
        "CASE WHEN contains(o_orderpriority, '-') THEN "
        "trim(substr(o_orderpriority, position('-' IN o_orderpriority) + 1)) "
        "END AS name FROM orders",
    ),
    "f10_timestamp_coerce": (
        q_timestamp_coerce,
        "SELECT CAST(sum(CASE WHEN p IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_parsed, CAST(sum(CASE WHEN p IS NULL THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_failed FROM (SELECT try_cast(CASE WHEN o_orderkey % 5 = 0 "
        "THEN 'not-a-date' ELSE CAST(o_orderdate AS VARCHAR) END "
        "AS TIMESTAMP) AS p FROM orders)",
    ),
    "f12_fiscal_year": (
        q_fiscal_year,
        "SELECT CAST(year(o_orderdate) + CASE WHEN month(o_orderdate) >= 7 "
        "THEN 1 ELSE 0 END AS INTEGER) AS fy, count(*) AS n "
        "FROM orders GROUP BY fy ORDER BY fy",
    ),
    "a12_unpivot": (
        q_unpivot,
        "SELECT l_orderkey, l_linenumber, measure, "
        "round(CAST(value AS DOUBLE), 6) AS value FROM (UNPIVOT "
        "(SELECT l_orderkey, l_linenumber, l_quantity AS qty, "
        "l_discount AS disc FROM lineitem) "
        "ON qty, disc INTO NAME measure VALUE value)",
    ),
    "w5_topk_per_group": (
        q_topk_per_group,
        "SELECT o_orderstatus, rk, o_orderkey, o_totalprice FROM ("
        "SELECT o_orderstatus, o_orderkey, o_totalprice, "
        "row_number() OVER (PARTITION BY o_orderstatus "
        "ORDER BY o_totalprice DESC, o_orderkey) AS rk FROM orders) "
        "WHERE rk <= 3",
    ),
    "w8_ntile_deciles": (
        q_ntile_deciles,
        "SELECT decile, count(*) AS n, "
        "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total "
        "FROM (SELECT o_totalprice, ntile(10) OVER ("
        "ORDER BY o_totalprice, o_orderkey) AS decile FROM orders) "
        "GROUP BY decile",
    ),
    "w7_locf_fill": (
        q_locf_fill,
        "SELECT event_id, user_id, "
        "strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts, "
        "round(last_value(v IGNORE NULLS) OVER ("
        "PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) "
        "AS value_filled FROM (SELECT event_id, user_id, ts, "
        "CASE WHEN event_id % 5 <> 0 THEN value END AS v FROM events)",
    ),
    "w6_range_frame": (
        q_range_frame_window,
        "SELECT o_custkey, o_orderkey, "
        "strftime(o_orderdate, '%Y-%m-%d') AS order_date, "
        "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER ("
        "PARTITION BY o_custkey ORDER BY epoch(o_orderdate) "
        "RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) AS DOUBLE) "
        "AS rolling_30d_total FROM orders",
    ),
    "f_try_cast": (
        q_try_cast,
        "SELECT l_orderkey, l_linenumber, "
        "TRY_CAST(CASE WHEN l_linenumber % 3 = 0 THEN 'not-a-number' "
        "ELSE CAST(l_quantity AS VARCHAR) END AS DOUBLE) AS qty_parsed, "
        "CAST(floor((CASE WHEN l_quantity - 1.0 = 0 THEN NULL "
        "ELSE l_extendedprice / (l_quantity - 1.0) END) * 1e6) AS BIGINT) "
        "AS unit_micro FROM lineitem",
    ),
    "f_date_trunc": (
        q_date_trunc_agg,
        "SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') "
        "AS month, count(*) AS n_orders, "
        "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total "
        "FROM orders GROUP BY 1",
    ),
    "f_regexp_extract": (
        q_regexp_extract_groups,
        r"SELECT p_partkey, "
        r"regexp_extract(p_brand, 'Brand#([0-9]+)', 1) AS brand_num, "
        r"regexp_extract(p_name, '^(\w+)', 1) AS first_word FROM part",
    ),
    "ext_fuzzy_name_pairs": (
        q_fuzzy_name_pairs,
        "SELECT a.c_custkey AS id_a, b.c_custkey AS id_b, "
        "levenshtein(a.c_name, b.c_name) AS dist "
        "FROM customer a JOIN customer b "
        "ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey "
        "WHERE levenshtein(a.c_name, b.c_name) <= 3",
    ),
    "json_variant": (
        q_json_variant,
        "SELECT event_id, "
        "CAST(json_extract(props, '$.k') AS INT) AS k_value, "
        "CAST(json_extract(props, '$.missing') AS VARCHAR) AS absent "
        "FROM events",
    ),
    "json_map_explode": (
        q_json_map_explode,
        "SELECT event_id, unnest(map_keys(m)) AS prop_key, "
        "unnest(map_values(m)) AS prop_value FROM "
        "(SELECT event_id, CAST(props AS JSON)::MAP(VARCHAR, INT) AS m "
        "FROM events)",
    ),
    "ext_zscore": (
        q_zscore,
        "SELECT event_id, event_type, "
        "CAST(floor((CASE WHEN stddev_samp(value) OVER w > 0 THEN "
        "(value - avg(value) OVER w) / (stddev_samp(value) OVER w) "
        "END) * 1e6) AS BIGINT) AS z_micro "
        "FROM events WINDOW w AS (PARTITION BY event_type)",
    ),
    "a13_histogram": (
        q_histogram,
        "SELECT least(CAST(floor(o_totalprice / 50000) AS INT), 9) "
        "AS bucket, count(*) AS n, "
        "least(CAST(floor(o_totalprice / 50000) AS INT), 9) * 50000 AS lo "
        "FROM orders GROUP BY 1",
    ),
    "samp_hash_sample": (
        q_hash_sample,
        "SELECT o_orderkey, o_totalprice FROM orders "
        "WHERE ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))"
        "::BIGINT % 100 < 10",
    ),
    "samp_stratified": (
        q_stratified_sample,
        "SELECT o_orderstatus, count(*) AS n FROM orders "
        "WHERE ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))"
        "::BIGINT % 100 < CASE o_orderstatus WHEN 'F' THEN 50 "
        "WHEN 'O' THEN 10 END GROUP BY o_orderstatus",
    ),
    "scd2_history": (
        q_scd2_history,
        "SELECT o_custkey, o_orderkey, o_totalprice, "
        "strftime(o_orderdate, '%Y-%m-%d') AS valid_from, "
        "strftime(lead(o_orderdate) OVER w, '%Y-%m-%d') AS valid_to, "
        "lead(o_orderdate) OVER w IS NULL AS is_current "
        "FROM orders WINDOW w AS (PARTITION BY o_custkey "
        "ORDER BY o_orderdate, o_orderkey)",
    ),
    "v_profile_table": (
        q_profile_table,
        " UNION ALL ".join(
            f"SELECT '{c}' AS \"column\", count(*) AS n_rows, "
            f"count(*) FILTER (WHERE {c} IS NULL) AS n_nulls, "
            f"count(DISTINCT {c}) AS n_distinct, "
            f"CAST(min({c}) AS VARCHAR) AS min_value, "
            f"CAST(max({c}) AS VARCHAR) AS max_value FROM customer"
            for c in [
                "c_custkey",
                "c_name",
                "c_nationkey",
                "c_acctbal",
                "c_mktsegment",
            ]
        ),
    ),
    "sql_frontend_pricing": (q_sql_frontend, _SQL_PRICING),
    "tj_asof_join": (
        q_asof_join,
        "WITH e AS (SELECT event_id, user_id, ts, value FROM events "
        "WHERE event_type = 'error'), "
        "c AS (SELECT user_id, ts, max(value) AS value FROM events "
        "WHERE event_type = 'click' GROUP BY 1, 2) "
        "SELECT e.event_id, e.user_id, "
        "strftime(e.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts, "
        "strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts, "
        "round(c.value, 6) AS click_value "
        "FROM e ASOF LEFT JOIN c ON e.user_id = c.user_id AND e.ts >= c.ts",
    ),
    "tj_range_join": (
        q_range_join,
        "SELECT e.event_id, e.user_id, "
        "strftime(e.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts, "
        "count(c.event_id) AS n_clicks "
        "FROM events e LEFT JOIN events c ON c.user_id = e.user_id "
        "AND c.event_type = 'click' "
        "AND c.ts > e.ts - INTERVAL 1 HOUR AND c.ts <= e.ts "
        "WHERE e.event_type = 'error' GROUP BY 1, 2, 3",
    ),
    "a10_cube": (
        q_cube,
        "SELECT l_returnflag, l_linestatus, "
        "CAST(grouping(l_returnflag) AS INT) AS g_flag, "
        "CAST(grouping(l_linestatus) AS INT) AS g_status, "
        "count(*) AS n, "
        "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty "
        "FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)",
    ),
    "a11_stat_aggs": (
        q_stat_aggs,
        "SELECT l_returnflag, "
        "round(stddev_samp(l_quantity), 6) AS sd_qty, "
        "round(var_samp(l_quantity), 6) AS var_qty, "
        "round(corr(l_quantity, l_extendedprice), 6) AS corr_qp, "
        "round(covar_samp(l_quantity, l_discount), 6) AS cov_qd "
        "FROM lineitem GROUP BY l_returnflag",
    ),
    "arr_explode_norms": (
        q_explode_norms,
        "SELECT vec_id, len(embedding) AS n_dims, "
        "round(sqrt(list_sum(list_transform(embedding, "
        "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2_norm "
        "FROM embeddings",
    ),
    "arr_collect_sorted": (
        q_collect_sorted,
        "SELECT l_returnflag, "
        "string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus) "
        "AS statuses, "
        "string_agg(DISTINCT CAST(l_linenumber AS VARCHAR), ',' "
        "ORDER BY CAST(l_linenumber AS VARCHAR)) "
        "AS linenumbers FROM lineitem GROUP BY l_returnflag",
    ),
    "gen_date_series": (
        q_date_series,
        "WITH days AS (SELECT unnest(generate_series(DATE '1996-01-01', "
        "DATE '1996-03-31', INTERVAL 1 DAY)) AS day), "
        "daily AS (SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS "
        "n_orders FROM orders GROUP BY 1) "
        "SELECT strftime(d.day, '%Y-%m-%d') AS day, "
        "coalesce(n_orders, 0) AS n_orders "
        "FROM days d LEFT JOIN daily USING (day)",
    ),
    "stream_window_counts": (
        q_stream_window_counts,
        "SELECT time_bucket(INTERVAL '10 minutes', ts) AS window_start, "
        "time_bucket(INTERVAL '10 minutes', ts) + INTERVAL '10 minutes' "
        "AS window_end, event_type, count(*) AS n_events, "
        "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value "
        "FROM events GROUP BY 1, 2, 3",
    ),
    "stream_sliding_counts": (
        q_stream_sliding_counts,
        # each event belongs to the two 5-min-aligned windows covering
        # it; time_bucket's 2000-01-01 origin is 5-min-aligned with
        # Spark's epoch-aligned windows, so starts are identical
        "WITH w AS (SELECT event_type, value, "
        "time_bucket(INTERVAL '5 minutes', ts) "
        "- k.k * INTERVAL '5 minutes' AS window_start, ts "
        "FROM events CROSS JOIN range(0, 2) k(k)) "
        "SELECT window_start, window_start + INTERVAL '10 minutes' "
        "AS window_end, event_type, count(*) AS n_events, "
        "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value "
        "FROM w WHERE ts < window_start + INTERVAL '10 minutes' "
        "GROUP BY 1, 2, 3",
    ),
    "stream_rollup": (
        q_stream_rollup,
        "SELECT event_type, count(*) AS n_events, "
        "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value "
        "FROM events GROUP BY event_type",
    ),
    "stream_static_join": (
        q_stream_static_join,
        "SELECT c_mktsegment, count(*) AS n_events, "
        "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value "
        "FROM events LEFT JOIN customer ON user_id = c_custkey "
        "GROUP BY c_mktsegment",
    ),
    "stream_sessionize": (
        q_stream_sessionize,
        "WITH o AS (SELECT user_id, ts, event_id, value, "
        "CASE WHEN epoch_us(ts) - lag(epoch_us(ts), 1, CAST(0 AS BIGINT)) "
        "OVER w > 1800000000 THEN 1 ELSE 0 END AS new_s FROM events "
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
        "s AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id "
        "ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sess FROM o) "
        "SELECT user_id, min(ts) AS session_start, max(ts) AS session_end, "
        "count(*) AS n_events, round(sum(value), 6) AS sum_value "
        "FROM s GROUP BY user_id, sess",
    ),
    "stream_dedup": (
        q_stream_dedup,
        "SELECT event_id, user_id, event_type, ts, value FROM ("
        "SELECT *, row_number() OVER (PARTITION BY user_id, event_type "
        "ORDER BY ts, event_id) AS rn FROM events) WHERE rn = 1",
    ),
    "stream_interval_join": (
        q_stream_interval_join,
        "SELECT v.user_id, v.event_id AS l_event_id, "
        "c.event_id AS r_event_id, "
        "epoch_us(c.ts) - epoch_us(v.ts) AS lag_us "
        "FROM events v JOIN events c ON v.user_id = c.user_id "
        "AND v.event_type = 'view' AND c.event_type = 'click' "
        "AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL '10 minutes'",
    ),
    "ext_doc_stats": (q_doc_stats, None),  # SQL built below
    "ext_language_id": (q_language_id, None),  # SQL built below
    "ext_token_stats": (
        q_token_stats,
        "SELECT doc_id, CAST(len(regexp_extract_all(text, "
        "'" + _BPE_SQL + "')) AS INTEGER) AS n_bpe_tokens, "
        "CAST(len(list_distinct(regexp_extract_all(text, "
        "'" + _BPE_SQL + "'))) AS INTEGER) "
        "AS n_distinct_bpe_tokens FROM documents",
    ),
    "ext_exact_dedup": (
        q_exact_dedup,
        "SELECT doc_id, n_chars FROM documents WHERE doc_id IN ("
        "SELECT min(doc_id) FROM documents GROUP BY md5(text))",
    ),
    "ext_ngram_jaccard": (q_ngram_jaccard, None),  # SQL built below
    "ext_minhash_pairs": (q_minhash_pairs, None),  # SQL built below
    "ext_minhash_pairs_prod": (q_minhash_pairs_prod, None),  # SQL built below (recall audit)
    "ext_simhash_pairs": (q_simhash_pairs, None),  # SQL built below
    "ext_fingerprints": (q_fingerprints, None),  # rows-only (xxhash64)
    "ext_topk_cosine": (q_topk_cosine, None),  # SQL built below
    "ext_embedding_pairs_bucketed": (q_embedding_pairs_bucketed, None),  # SQL built below
    "ext_lsh_topk": (q_lsh_topk, None),  # rows-only (approximate)
    "ext_topk_cosine_gemm": (q_topk_cosine_gemm, None),  # rows-only (BLAS)
    "ext_ivf_topk": (q_ivf_topk, None),  # SQL patched below (exactness form)
    "ext_ivf_pq_topk": (q_ivf_pq_topk, None),  # SQL patched below (exactness form)
    "ext_sq_rerank_topk": (q_sq_rerank_topk, None),  # rows-only (approx)
    "ext_multimodal_features": (q_multimodal_features, None),  # rows-only
    "pipeline_payroll_shape": (
        q_pipeline_payroll_shape,
        'SELECT l.l_orderkey || \'-\' || l.l_linenumber AS "Line Key", '
        'l.l_orderkey AS "Order Key", CAST(NULL AS VARCHAR) AS "Ship Date", '
        'p.p_brand AS "Part Brand", s.s_name AS "Supplier Name", '
        'CAST(NULL AS VARCHAR) AS "Legacy Flag" FROM lineitem l '
        "LEFT JOIN part p ON l.l_partkey = p.p_partkey "
        "LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey "
        "WHERE l.l_shipdate BETWEEN TIMESTAMP '1996-01-01' "
        "AND TIMESTAMP '1998-12-31' "
        "QUALIFY row_number() OVER (PARTITION BY l.l_orderkey, l.l_linenumber "
        "ORDER BY l.l_partkey, l.l_suppkey, l.l_shipdate) = 1",
    ),
}

# ---- oracle SQL for the text-extension queries (built programmatically so
# the stopword lists / formulas stay in lockstep with functions.text) ----

from uofi_payroll_etl_main_demo_spark.functions.text import STOPWORDS  # noqa: E402

# Portable twin of functions/text.py tokenize_ws: split by the SAME
# raw-character whitespace class (\s differs across engines: Java
# includes U+000B, RE2 does not), drop the phantom '' elements a regex
# split emits at the ends — see the tokenize_ws docstring.
def _toks_sql(col: str = "text") -> str:
    """The ONE portable whitespace tokenization, parameterized over the
    column reference — string-surgery on the rendered expression (the
    old `.replace("text", ...)` trick) would silently corrupt the SQL
    the moment the expression ever contains the substring elsewhere."""
    return (
        "list_filter(string_split_regex(" + col + ", '"
        + _WS_CLASS
        + "+'), __t -> __t <> '')"
    )


_TOKS = _toks_sql()

# Portable punct class — twin of functions/text.py _PUNCT_RE: the
# whitespace chars are spelled out (Java \s includes U+000B, RE2 does
# not, so [^\w\s] diverges on vertical tabs).
_SQL_PUNCT = r"[^\w \t\n\r\f\x0b]"


def _sql_doc_stats() -> str:
    return f"""
WITH t AS (
  SELECT doc_id, text,
         CASE WHEN trim(text) = '' THEN [] ELSE {_TOKS} END AS toks
  FROM documents
)
SELECT doc_id,
  CAST(len(toks) AS BIGINT) AS n_tokens,
  CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct_tokens,
  CAST(length(text) AS BIGINT) AS n_chars,
  CAST(len(regexp_extract_all(text, '{_SQL_PUNCT}')) AS BIGINT) AS n_punct,
  round(CASE WHEN len(toks) > 0 THEN
    CAST(list_aggregate(list_transform(toks, x -> CAST(length(x) AS DOUBLE)),
         'sum') AS DOUBLE) / len(toks) END, 6) AS avg_token_len,
  round(
    0.4 * least(len(toks) / 100.0, 1.0)
    + 0.4 * (CASE WHEN len(toks) > 0
             THEN CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
             ELSE 0.0 END)
    + 0.2 * (1.0 - least(
        (CASE WHEN length(text) > 0
         THEN CAST(len(regexp_extract_all(text, '{_SQL_PUNCT}')) AS DOUBLE)
              / length(text) ELSE 0.0 END) * 5, 1.0)), 6) AS quality
FROM t
"""


def _sql_language_id() -> str:
    hit_cols = []
    for lang in sorted(STOPWORDS):
        lst = "[" + ", ".join(f"'{w}'" for w in STOPWORDS[lang]) + "]"
        hit_cols.append(
            f"CAST(len(list_filter({_TOKS}, x -> "
            f"list_contains({lst}, lower(x)))) AS BIGINT) AS hits_{lang}"
        )
    langs_desc = sorted(STOPWORDS, reverse=True)  # ties → largest lang code
    mx = "greatest(" + ", ".join(f"hits_{lg}" for lg in sorted(STOPWORDS)) + ")"
    pred = "CASE WHEN " + mx + " = 0 THEN 'und' "
    for lg in langs_desc[:-1]:
        pred += f"WHEN hits_{lg} = {mx} THEN '{lg}' "
    pred += f"ELSE '{langs_desc[-1]}' END AS predicted_lang"
    return (
        "SELECT doc_id, "
        + ", ".join(f"hits_{lg}" for lg in sorted(STOPWORDS))
        + ", "
        + pred
        + " FROM (SELECT doc_id, "
        + ", ".join(hit_cols)
        + " FROM documents)"
    )


def _sql_ngram_jaccard(
    k: int = 3, threshold: float = 0.2, table: str = "documents"
) -> str:
    return f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM {table}),
sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           range(1, len(toks) - {k} + 2),
           i -> array_to_string(toks[i:i + {k - 1}], ' ')))) AS s
  FROM t WHERE len(toks) >= {k}
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
  FROM sh a JOIN sh b USING (s) WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       round(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= {threshold}
"""


def _sql_topk_cosine(k: int = 10, where: str = "") -> str:
    return (
        "SELECT vec_id, round(score, 6) AS score FROM ("
        "SELECT vec_id, list_cosine_similarity("
        f"CAST(embedding AS DOUBLE[]), CAST({_QV_SQL} AS DOUBLE[])) AS score "
        f"FROM embeddings {where}) ORDER BY score DESC, vec_id LIMIT {k}"
    )


def _sql_embedding_pairs_bucketed(
    threshold: float = 0.35, dim: int = 64, n_planes: int = 4, seed: int = 42
) -> str:
    """DuckDB twin of ``all_pairs_above``: the hyperplanes are
    deterministic driver-side constants, so the bucket assignment (and
    therefore the full candidate set) is reproduced exactly in SQL."""
    from uofi_payroll_etl_main_demo_spark.ext.similarity import _hyperplanes

    terms = []
    for b, plane in enumerate(_hyperplanes(dim, n_planes, seed)):
        lst = "[" + ", ".join(repr(x) for x in plane) + "]"
        terms.append(
            f"(CASE WHEN list_dot_product(v, {lst}) >= 0 "
            f"THEN {1 << b} ELSE 0 END)"
        )
    bucket = " + ".join(terms)
    return f"""
WITH b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
             {bucket} AS bucket FROM embeddings)
SELECT id_a, id_b, round(c, 6) AS cosine FROM (
  SELECT a.vec_id AS id_a, x.vec_id AS id_b,
         list_cosine_similarity(a.v, x.v) AS c
  FROM b a JOIN b x ON a.bucket = x.bucket AND a.vec_id < x.vec_id)
WHERE c >= {threshold}
"""


REGISTRY["ext_embedding_pairs_bucketed"] = (
    q_embedding_pairs_bucketed,
    _sql_embedding_pairs_bucketed(),
)

REGISTRY["ext_doc_stats"] = (q_doc_stats, _sql_doc_stats())
REGISTRY["ext_language_id"] = (q_language_id, _sql_language_id())
REGISTRY["ext_ngram_jaccard"] = (q_ngram_jaccard, _sql_ngram_jaccard())
REGISTRY["ext_pathological_text_stats"] = (
    q_pathological_text_stats,
    _sql_pathological_text_stats(),
)
# Production-family MinHash recall audit: xxhash64 banding is not
# reproducible in portable SQL, but its VERIFIED output is checkable
# against the exact pair set — candidates are exact-Jaccard-verified at
# the same threshold (precision = 1 by construction), and at the driver
# fixtures the deterministic xxhash64 banding achieves full recall
# (pinned for sf0.001 and sf0.01 in tests/test_dedup.py). The exact
# n-gram Jaccard SQL is therefore a value-exact oracle for the
# production path: any missed candidate OR any verification drift
# breaks the hash match.
REGISTRY["ext_minhash_pairs_prod"] = (
    q_minhash_pairs_prod,
    _sql_ngram_jaccard(),
)
REGISTRY["ext_topk_cosine"] = (q_topk_cosine, _sql_topk_cosine())
# Exactness audits for the data-adaptive ANN indexes: at full probe /
# full rerank margin the approximate path must equal the exact top-k,
# so the brute-force SQL is a value oracle for the whole index pipeline.
# Round-10 fold (VERDICT r9 #1): the exactness forms now live under
# the PRIMARY names ext_ivf_topk / ext_pq_topk / ext_ivf_pq_topk —
# the former *_full twins are retired (identical computations under a
# second name would be padding); their green history transfers via
# COVERAGE.md's rename ledger.
REGISTRY["ext_ivf_topk"] = (q_ivf_topk, _sql_topk_cosine())
REGISTRY["ext_ivf_pq_topk"] = (q_ivf_pq_topk, _sql_topk_cosine())


def _ann_index_root() -> str:
    """Index store root (env-overridable). Local default is /tmp; a
    cluster deployment points this at its shared object store.

    SINGLE-WRITER assumption: the ensure-build flow is not safe
    against two processes racing a (re)build of the SAME index dir
    (one can read meta while the other is mid-overwrite) — run
    concurrent harnesses with distinct SPARK_GRAFT_INDEX_DIR roots. A
    cluster deployment would serialize builds through its scheduler
    the same way any table-materialization job is serialized. Bench
    timing is unaffected: the one-time build lands in the UNTIMED
    warmup run, so the timed serving rows never include training."""
    return os.environ.get("SPARK_GRAFT_INDEX_DIR", "/tmp/spark_graft_indexes")


def _ensure_sf_ivf_index(spark, sf_dir, n_centroids: int = 8):
    from uofi_payroll_etl_main_demo_spark.ext.ann_index import (
        corpus_fingerprint,
        ensure_ivf_index,
    )

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    idx_dir = os.path.join(
        _ann_index_root(),
        f"ivf{n_centroids}_{os.path.basename(os.path.normpath(sf_dir))}",
    )
    return ensure_ivf_index(
        _t(spark, sf_dir, "embeddings"),
        idx_dir,
        corpus_tag=corpus_fingerprint(emb_path),
        n_centroids=n_centroids,
    )


def _ensure_sf_pq_index(spark, sf_dir):
    """One ensure per (sf_dir) for BOTH PQ registry rows — a param
    tweak applied to one row cannot silently fork two differently-
    built indexes under the same dir name (the _ensure_sf_ivf_index
    pattern)."""
    from uofi_payroll_etl_main_demo_spark.ext.ann_index import (
        corpus_fingerprint,
        ensure_pq_index,
    )

    emb = _t(spark, sf_dir, "embeddings")
    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    idx_dir = os.path.join(
        _ann_index_root(),
        f"pq8x16_{os.path.basename(os.path.normpath(sf_dir))}",
    )
    return ensure_pq_index(
        emb,
        idx_dir,
        corpus_tag=corpus_fingerprint(emb_path),
        m=8,
        n_centroids=16,
    )


def q_ivf_index_query(spark, sf_dir):
    """Persisted-ANN-index SERVING path (build→save→load→query
    lifecycle, ext/ann_index.py): the IVF-Flat index for this corpus
    snapshot is ensure-built ONCE (keyed by a corpus fingerprint —
    repeat queries load, never retrain) and the answer comes from the
    INDEX TABLES ONLY, with the probe filter pruning inverted-list
    PARTITIONS at the parquet scan. Full probe (nprobe = n_centroids)
    makes the result exactly the brute-force top-k, so the whole
    lifecycle gets a value oracle; the index-only plan and the
    partition pruning are pinned in tests/test_plans.py."""
    index = _ensure_sf_ivf_index(spark, sf_dir, n_centroids=8)
    out = index.search(QUERY_VEC, k=10, nprobe=8)
    return out.select("vec_id", F.round("score", 6).alias("score"))


def q_pq_index_query(spark, sf_dir):
    """Persisted PQ index serving path: codebooks + codes load from
    parquet (training ran once at build), the ADC scan touches ONLY
    the codes table (~32 B/vector vs 256 B raw), and the exact rerank
    fetches candidates from the corpus row store by id — the standard
    two-stage ANN serving shape. A rerank margin ≥ corpus size makes
    the result exactly the brute-force top-k (value oracle for the
    whole encode→persist→load→ADC→rerank path; the bounded-margin
    latency trade stays benched via the rows-only ext_pq_topk)."""
    emb = _t(spark, sf_dir, "embeddings")
    index = _ensure_sf_pq_index(spark, sf_dir)
    out = index.search(QUERY_VEC, k=10, candidates=1_000_000, rerank_corpus=emb)
    return out.select("vec_id", F.round("score", 6).alias("score"))


def q_ivf_filtered_query(spark, sf_dir):
    """FILTERED ANN serving over the persisted IVF index (the RAG
    pattern: top-k WITH a metadata predicate). The allowed-id set —
    here ``label = 2`` from the corpus metadata — semi-joins the
    probed inverted lists BEFORE any cosine is computed, and the
    centroid partition pruning survives the filter (pinned in
    tests/test_ann_index.py). Full probe makes the answer exactly the
    filtered brute-force top-k, so the whole filtered serving path is
    value-oracled; the selective-predicate auto-widen backstop is
    pytest-pinned (data-adaptive, so not a registry row)."""
    index = _ensure_sf_ivf_index(spark, sf_dir, n_centroids=8)
    emb = _t(spark, sf_dir, "embeddings")
    allowed = emb.filter(F.col("label") == 2).select("vec_id")
    out = index.search(QUERY_VEC, k=10, nprobe=8, filter_ids=allowed)
    return out.select("vec_id", F.round("score", 6).alias("score"))


REGISTRY["ext_ivf_index_query"] = (q_ivf_index_query, _sql_topk_cosine())
# ext_ivf_index_query_probe DELISTED in round 10 (VERDICT r9 #1: its
# only driver record was an r8 `no_oracle` error, and a partial-probe
# result is data-adaptive — un-oracle-able by nature). The partial-
# probe serving path stays covered where adaptive behavior belongs:
# test_ann_index.py probe-subset/partition-pruning pins and the
# scripts/ann_batch_probe.py latency/recall table.
REGISTRY["ext_ivf_filtered_query"] = (
    q_ivf_filtered_query,
    _sql_topk_cosine(where="WHERE label = 2"),
)
REGISTRY["ext_pq_index_query"] = (q_pq_index_query, _sql_topk_cosine())


def q_pq_filtered_query(spark, sf_dir):
    """Filtered two-stage PQ serving: the allowed-id set (label = 2)
    semi-joins the persisted CODES before the ADC scan — excluded
    vectors consume no lookup work and the candidate budget is spent
    entirely inside the allowed set — then the survivors exact-rerank
    from the row store. Full candidate margin makes the answer exactly
    the filtered brute-force top-k (same SQL twin as the IVF filtered
    row: one law, two index engines)."""
    emb = _t(spark, sf_dir, "embeddings")
    index = _ensure_sf_pq_index(spark, sf_dir)
    out = index.search(
        QUERY_VEC,
        k=10,
        candidates=1_000_000,
        rerank_corpus=emb,
        filter_ids=emb.filter(F.col("label") == 2).select("vec_id"),
    )
    return out.select("vec_id", F.round("score", 6).alias("score"))


REGISTRY["ext_pq_filtered_query"] = (
    q_pq_filtered_query,
    _sql_topk_cosine(where="WHERE label = 2"),
)


def _ensure_sf_ivf_postdelete_index(spark, sf_dir):
    """IVF store with ``vec_id % 7 == 3`` ERASED via ivf_index_delete
    — the takedown lifecycle's serving state. Idempotent per corpus
    snapshot: when meta already carries the post-delete tag the store
    loads (zero build/delete work on repeat queries); otherwise it
    builds from the FULL corpus and deletes, so the row exercises the
    real erase path, never a convenient build-without."""
    from uofi_payroll_etl_main_demo_spark.ext.ann_index import (
        _fs_exists,
        _read_meta,
        corpus_fingerprint,
        ivf_index_build,
        ivf_index_delete,
        ivf_index_load,
    )

    emb = _t(spark, sf_dir, "embeddings")
    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    fp = corpus_fingerprint(emb_path)
    post_tag = f"{fp}:del-vec7m3"
    idx_dir = os.path.join(
        _ann_index_root(),
        f"ivf8del_{os.path.basename(os.path.normpath(sf_dir))}",
    )
    if _fs_exists(spark, f"{idx_dir}/meta"):
        try:
            meta = _read_meta(spark, idx_dir)
        except Exception:
            meta = None
        if (
            meta
            and meta["kind"] == "ivf"
            and meta["corpus_tag"] == post_tag
            and meta["n_centroids"] == 8
        ):
            return ivf_index_load(spark, idx_dir)
    ivf_index_build(
        emb, idx_dir, n_centroids=8, corpus_tag=f"{fp}:pre-delete"
    )
    ivf_index_delete(
        spark,
        idx_dir,
        emb.filter(F.col("vec_id") % 7 == 3).select("vec_id"),
        new_corpus_tag=post_tag,
    )
    return ivf_index_load(spark, idx_dir)


def q_ivf_postdelete_query(spark, sf_dir):
    """Serving AFTER a takedown (ext/ann_index.py ivf_index_delete):
    vectors with ``vec_id % 7 == 3`` were erased from the persisted
    store (staged rewrite, batches folded, replay of pre-delete
    batches refused), and full-probe top-k must now equal the exact
    brute force over the SURVIVORS — the oracle proves deleted rows
    are gone from the serving path, not merely filtered at query
    time (the search runs with no filter_ids)."""
    index = _ensure_sf_ivf_postdelete_index(spark, sf_dir)
    out = index.search(QUERY_VEC, k=10, nprobe=8)
    return out.select("vec_id", F.round("score", 6).alias("score"))


REGISTRY["ext_ivf_postdelete_query"] = (
    q_ivf_postdelete_query,
    _sql_topk_cosine(where="WHERE vec_id % 7 != 3"),
)


def q_ivf_autowiden_query(spark, sf_dir):
    """Filtered-ANN RECALL BACKSTOP under an extreme predicate
    (``vec_id % 101 == 7`` keeps ~1% of ids): starting at nprobe=1,
    ``auto_widen`` doubles the probe until k survivors exist or every
    list is probed. With k above the match count the widening is
    forced all the way to the exact filtered brute force, so the
    oracle value-checks the whole degrade-gracefully path — the
    serving-quality guarantee a RAG user asks about first
    (intermediate-nprobe recall is data-adaptive and stays pinned in
    tests/test_ann_index.py)."""
    index = _ensure_sf_ivf_index(spark, sf_dir, n_centroids=8)
    emb = _t(spark, sf_dir, "embeddings")
    allowed = emb.filter(F.col("vec_id") % 101 == 7).select("vec_id")
    out = index.search(
        QUERY_VEC, k=40, nprobe=1, filter_ids=allowed, auto_widen=True
    )
    return out.select("vec_id", F.round("score", 6).alias("score"))


REGISTRY["ext_ivf_autowiden_query"] = (
    q_ivf_autowiden_query,
    _sql_topk_cosine(k=40, where="WHERE vec_id % 101 = 7"),
)


def _sql_batch_topk_cosine(k: int, n_queries: int) -> str:
    """Per-query brute-force top-k (row_number window) — the exact
    oracle for BATCHED ANN serving at full probe / full rerank margin;
    tie-break (score DESC, vec_id) matches the engines' shared law."""
    return f"""
WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
           FROM embeddings WHERE vec_id < {n_queries}),
s AS (SELECT q.query_id, e.vec_id,
        list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv) AS score
      FROM q CROSS JOIN embeddings e),
r AS (SELECT query_id, vec_id, score,
        row_number() OVER (PARTITION BY query_id
                           ORDER BY score DESC, vec_id) AS rn
      FROM s)
SELECT query_id, vec_id, round(score, 6) AS score FROM r WHERE rn <= {k}
"""


def q_ivf_batch_query(spark, sf_dir):
    """BATCHED ANN serving (IVFDiskIndex.search_batch): ONE Spark job
    answers 100 query vectors against the persisted IVF store — the
    retrieval / hard-negative-mining shape, where the one-job-per-
    vector loop would schedule 100 jobs (probe: scripts/
    ann_batch_probe.py records the per-query cost collapse). Each
    query ranks its probe lists JVM-side from the driver-held
    centroids (same law as single-query serving, bit-for-bit),
    explodes to (query, centroid) pairs, broadcasts onto the
    partitioned lists — dynamic partition pruning keeps the scan to
    the probed lists' union — and one query_id exchange takes each
    top-k. Full probe makes every per-query answer exactly the brute
    force, so the whole batched path is value-oracled (the pruned-
    probe latency trade is pinned in tests + the probe script)."""
    index = _ensure_sf_ivf_index(spark, sf_dir, n_centroids=8)
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 100).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    out = index.search_batch(queries, k=5, nprobe=8)
    return out.select(
        "query_id", "vec_id", F.round("score", 6).alias("score")
    )


REGISTRY["ext_ivf_batch_query"] = (
    q_ivf_batch_query,
    _sql_batch_topk_cosine(k=5, n_queries=100),
)


def q_pq_batch_query(spark, sf_dir):
    """Batched two-stage PQ serving (PQDiskIndex.search_batch): one
    distributed ADC scan of the persisted codes scores ALL 40 queries
    via a per-query LUT tensor shipped in the Arrow closure (driver
    state bounded by max_queries — the codebook contract), then the
    survivors exact-rerank from the row store per query. Full
    candidate margin makes each answer exactly the brute-force top-k
    — the same value-oracle law as the IVF batch row, second index
    engine."""
    emb = _t(spark, sf_dir, "embeddings")
    index = _ensure_sf_pq_index(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 40).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    out = index.search_batch(
        queries, k=5, candidates=1_000_000, rerank_corpus=emb
    )
    return out.select(
        "query_id", "vec_id", F.round("score", 6).alias("score")
    )


REGISTRY["ext_pq_batch_query"] = (
    q_pq_batch_query,
    _sql_batch_topk_cosine(k=5, n_queries=40),
)


def _ensure_sf_ivfpq_index(spark, sf_dir):
    """One ensure per sf_dir for every IVF-PQ registry row (the
    _ensure_sf_pq_index single-build contract)."""
    from uofi_payroll_etl_main_demo_spark.ext.ann_index import (
        corpus_fingerprint,
        ensure_ivfpq_index,
    )

    emb = _t(spark, sf_dir, "embeddings")
    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    idx_dir = os.path.join(
        _ann_index_root(),
        f"ivfpq8_8x16_{os.path.basename(os.path.normpath(sf_dir))}",
    )
    return ensure_ivfpq_index(
        emb,
        idx_dir,
        corpus_tag=corpus_fingerprint(emb_path),
        n_lists=8,
        m=8,
        n_centroids=16,
    )


def q_ivfpq_index_query(spark, sf_dir):
    """Persisted IVF-PQ serving (ext/ann_index.py IVFPQDiskIndex) —
    the COMPOSED billion-scale layout: coarse lists prune the codes
    scan at the PARTITION level (the IVF store's property) while each
    vector costs m small ints instead of the raw embedding (the PQ
    store's property), with ADC decomposed exactly into the per-list
    coarse term plus the list-independent residual LUT sum. Full probe
    + full rerank margin makes the answer exactly the brute-force
    top-k, so the whole composed lifecycle — coarse fit, residual
    codebook fit, residual encode, persist, load, pruned ADC, exact
    rerank — gets a value oracle (the pruned-probe latency/recall
    trade is pinned in tests/test_ivfpq_index.py)."""
    emb = _t(spark, sf_dir, "embeddings")
    index = _ensure_sf_ivfpq_index(spark, sf_dir)
    out = index.search(
        QUERY_VEC, k=10, nprobe=8, candidates=1_000_000, rerank_corpus=emb
    )
    return out.select("vec_id", F.round("score", 6).alias("score"))


REGISTRY["ext_ivfpq_index_query"] = (q_ivfpq_index_query, _sql_topk_cosine())


def q_ivfpq_batch_query(spark, sf_dir):
    """Batched IVF-PQ serving (IVFPQDiskIndex.search_batch): ONE job
    answers 40 queries over the pruned union of their probed lists —
    per-query state is the PQ batch serve's LUT tensor plus one
    coarse-term matrix, the codes scan is partition-pruned to the
    probe union, and each Arrow chunk scores only the queries that
    probed its lists before a per-query within-chunk top-candidates
    bounds the exchange. Full probe + full margin = exact per-query
    brute force (the third index engine under the one batch-serving
    oracle law)."""
    emb = _t(spark, sf_dir, "embeddings")
    index = _ensure_sf_ivfpq_index(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 40).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    out = index.search_batch(
        queries, k=5, nprobe=8, candidates=1_000_000, rerank_corpus=emb
    )
    return out.select(
        "query_id", "vec_id", F.round("score", 6).alias("score")
    )


REGISTRY["ext_ivfpq_batch_query"] = (
    q_ivfpq_batch_query,
    _sql_batch_topk_cosine(k=5, n_queries=40),
)


def q_ivfpq_autowiden_query(spark, sf_dir):
    """Filtered-ANN recall backstop on the COMPOSED store under an
    extreme predicate (~1% of ids): a selective filter can starve BOTH
    of IVF-PQ's reductions — the probe set AND the ADC candidate cut —
    so ``auto_widen`` doubles nprobe until every list is probed, then
    lifts the candidate budget entirely. Starting at nprobe=1 with a
    candidate budget below k forces the FULL degrade path, and the
    exact filtered brute force is the value oracle (the same law as
    the IVF store's autowiden row; the candidate-lift leg is the
    composed store's own)."""
    index = _ensure_sf_ivfpq_index(spark, sf_dir)
    emb = _t(spark, sf_dir, "embeddings")
    allowed = emb.filter(F.col("vec_id") % 101 == 7).select("vec_id")
    out = index.search(
        QUERY_VEC,
        k=40,
        nprobe=1,
        candidates=20,
        rerank_corpus=emb,
        filter_ids=allowed,
        auto_widen=True,
    )
    return out.select("vec_id", F.round("score", 6).alias("score"))


REGISTRY["ext_ivfpq_autowiden_query"] = (
    q_ivfpq_autowiden_query,
    _sql_topk_cosine(k=40, where="WHERE vec_id % 101 = 7"),
)


def _ensure_sf_passage_ivfpq_index(spark, sf_dir):
    """Persisted IVF-PQ store over the PASSAGE vectors of the
    documents corpus (docs 0–2 are the standing multi-vector queries
    and stay out of the store) — one ensure per sf_dir for the
    late-interaction row, keyed on the documents fingerprint. Vector
    id packs (doc, chunk) as ``doc_id·4096 + chunk_idx``; dim 16 →
    m=8 two-float subvectors."""
    from uofi_payroll_etl_main_demo_spark.ext.ann_index import (
        corpus_fingerprint,
        ensure_ivfpq_index,
    )
    from uofi_payroll_etl_main_demo_spark.ext.late_interaction import (
        chunk_bow_vectors,
    )

    docs = _t(spark, sf_dir, "documents")
    pv = chunk_bow_vectors(docs).filter(F.col("doc_id") >= 3)
    # in-expression pack guard (zero extra jobs — the hashed_bow dim
    # guard's pattern): a chunk_idx ≥ 4096 would pack into the NEXT
    # doc's vec_id space and pool its cosines under the wrong doc_id,
    # silently diverging from the twin's true doc_id; fail the task
    # loudly instead (needs a >131k-token document to ever fire)
    checked_idx = F.when(
        F.assert_true(
            F.col("chunk_idx") < 4096,
            F.lit("chunk_idx >= 4096: packed vec_id would collide "
                  "across documents"),
        ).isNull(),
        F.col("chunk_idx"),
    )
    corpus = pv.select(
        (F.col("doc_id") * 4096 + checked_idx)
        .cast("long")
        .alias("vec_id"),
        F.col("v"),
    )
    docs_path = os.path.join(sf_dir, "documents.parquet")
    idx_dir = os.path.join(
        _ann_index_root(),
        f"ivfpq_passages8_8x16_"
        f"{os.path.basename(os.path.normpath(sf_dir))}",
    )
    index = ensure_ivfpq_index(
        corpus,
        idx_dir,
        corpus_tag=corpus_fingerprint(docs_path),
        n_lists=8,
        m=8,
        n_centroids=16,
        vec_col="v",
    )
    return index, corpus


def q_late_interaction_topk(spark, sf_dir):
    """LATE-INTERACTION retrieval (multi-vector MaxSim — the ColBERT
    serving shape, ext/late_interaction.py): queries are BAGS of
    passage vectors (docs 0–2's tumbling-chunk hashed-BOW embeddings),
    the corpus is the persisted IVF-PQ store over every other doc's
    passage vectors, and MaxSim(q, d) = Σ per query vector of its best
    cosine within d — served as ONE batched store query answering the
    whole (queries × query-vectors) fan-out, then max-pooled per doc
    and summed as exact integer milli-cosines. Full probe + full
    margin + full per-vector k make the serve return every
    (query-vector, passage) pair with exact reranked cosines, so the
    whole composed lifecycle (chunk → embed → store → batched serve →
    pool) carries a VALUE oracle; the bounded-probe approximation and
    the brute-force-pooling comparison live in
    scripts/late_interaction_probe.py and tests."""
    from uofi_payroll_etl_main_demo_spark.ext.late_interaction import (
        chunk_bow_vectors,
        maxsim_topk_index,
    )

    docs = _t(spark, sf_dir, "documents")
    qv = (
        chunk_bow_vectors(docs)
        .filter(F.col("doc_id") < 3)
        .select(
            F.col("doc_id").alias("query_id"),
            F.col("chunk_idx").alias("qvec_idx"),
            F.col("v").alias("qv"),
        )
    )
    index, corpus = _ensure_sf_passage_ivfpq_index(spark, sf_dir)
    out = maxsim_topk_index(
        index,
        qv,
        k=5,
        rerank_corpus=corpus,
        qtok_mod=4096,
    )
    return out.select("query_id", "doc_id", "maxsim_milli")


def _sql_late_interaction(
    dim: int = 16, size: int = 32, k: int = 5, n_queries: int = 3
) -> str:
    return f"""
WITH t AS (SELECT doc_id, CASE WHEN trim(text) = '' THEN []
             ELSE {_TOKS} END AS toks FROM documents),
c AS (SELECT doc_id, toks,
        CASE WHEN len(toks) > 0 THEN
          CAST(floor((greatest(len(toks) - {size}, 0) + {size - 1})
               / {size}.0) AS INT) + 1
        ELSE 0 END AS nc FROM t),
ch AS (SELECT doc_id, CAST(i AS INT) AS chunk_idx,
         toks[i * {size} + 1 : i * {size} + {size}] AS ctoks
       FROM (SELECT doc_id, toks, unnest(range(0, nc)) AS i FROM c)),
bk AS (SELECT doc_id, chunk_idx, list_transform(ctoks,
         tk -> ('0x' || substr(md5(tk), 1, 15))::BIGINT % {dim}) AS b
       FROM ch WHERE len(ctoks) > 0),
cnt AS (SELECT doc_id, chunk_idx, list_transform(range(0, {dim}),
          j -> CAST(len(list_filter(b, x -> x = j)) AS DOUBLE)) AS cv
        FROM bk),
emb AS (SELECT doc_id, chunk_idx, list_transform(cv, x -> x / sqrt(
          list_aggregate(list_transform(cv, y -> y * y), 'sum'))) AS v
        FROM cnt),
q AS (SELECT doc_id AS query_id, chunk_idx AS qvec_idx, v AS qv
      FROM emb WHERE doc_id < {n_queries}),
d AS (SELECT doc_id, v FROM emb WHERE doc_id >= {n_queries}),
mx AS (SELECT q.query_id, q.qvec_idx, d.doc_id,
         CAST(floor(max(list_cosine_similarity(d.v, q.qv)) * 1e6)
              AS BIGINT) AS milli
       FROM q, d GROUP BY q.query_id, q.qvec_idx, d.doc_id),
sm AS (SELECT query_id, doc_id,
         CAST(sum(milli) AS BIGINT) AS maxsim_milli
       FROM mx GROUP BY query_id, doc_id),
rk AS (SELECT *, row_number() OVER (PARTITION BY query_id
         ORDER BY maxsim_milli DESC, doc_id) AS rn FROM sm)
SELECT query_id, doc_id, maxsim_milli FROM rk WHERE rn <= {k}
"""


REGISTRY["ext_late_interaction_topk"] = (
    q_late_interaction_topk,
    _sql_late_interaction(),
)


def q_semantic_dedup_incremental(spark, sf_dir):
    """Incremental SEMANTIC dedup served from the persisted ANN store
    (ext/ann_index.py semantic_dedup_index): the 'new batch'
    (vec_id % 7 == 3) checks itself against the EXISTING corpus — here
    the post-delete IVF store, which holds exactly the other vectors —
    in ONE batched k=1 serve (any-neighbor-above-τ ⇔ top-1-above-τ),
    so daily dedup cost tracks the batch × probed lists, never
    corpus². The GEMM engine scores each pruned list chunk as one
    BLAS multiply (the interpreted per-pair cosine was 2.7×
    slower at sf0.1) and picks the neighbor on the 6dp-rounded score
    — the established GEMM rank law, mirrored by the oracle. Full
    probe makes each nearest-neighbor decision exact, so the whole
    flow is value-oracled: (new_id, nn_id, score, is_dup) — the
    embedding-space member of the incremental-dedup family
    (MinHash / SimHash / image dHash forms are the r4-era rows)."""
    from uofi_payroll_etl_main_demo_spark.ext.ann_index import (
        semantic_dedup_index,
    )

    index = _ensure_sf_ivf_postdelete_index(spark, sf_dir)
    emb = _t(spark, sf_dir, "embeddings")
    batch = emb.filter(F.col("vec_id") % 7 == 3).select(
        "vec_id", "embedding"
    )
    return semantic_dedup_index(index, batch, threshold=0.37, nprobe=8)


def _sql_semantic_dedup_incremental(tau: float = 0.37) -> str:
    return f"""
WITH newv AS (SELECT vec_id AS new_id, CAST(embedding AS DOUBLE[]) AS qv
              FROM embeddings WHERE vec_id % 7 = 3),
old AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings WHERE vec_id % 7 != 3),
s AS (SELECT n.new_id, o.vec_id AS nn_id,
        list_cosine_similarity(o.v, n.qv) AS score
      FROM newv n CROSS JOIN old o),
r AS (SELECT new_id, nn_id, round(score, 6) AS score,
        row_number() OVER (PARTITION BY new_id
                           ORDER BY round(score, 6) DESC, nn_id) AS rn
      FROM s)
SELECT new_id, nn_id, score, score >= {tau} AS is_dup
FROM r WHERE rn = 1
"""


REGISTRY["ext_semantic_dedup_incremental"] = (
    q_semantic_dedup_incremental,
    _sql_semantic_dedup_incremental(),
)


def q_hard_negatives_ivf(spark, sf_dir):
    """Hard-negative mining SERVED FROM the persisted IVF store
    (ext/ann_index.py hard_negative_mining_index, GEMM engine): 100
    anchor vectors mine their top-3 most-similar DIFFERENT-label
    neighbors in ONE batched job — BLAS scoring per pruned list
    chunk, the different-label predicate as an in-chunk ``neq_attr``
    mask BEFORE the partial top-k (exact per-query filtered
    semantics), and the store's lists are what get scanned, not the
    raw corpus. Full probe makes every answer exactly the
    label-filtered brute force under the GEMM rank law (cosines
    rounded to 6dp before ranking), so the whole index-backed mining
    path is value-oracled (the expression engine, pruned-probe
    mining, and auto-widen are pinned in tests/test_ann_index.py)."""
    from uofi_payroll_etl_main_demo_spark.ext.ann_index import (
        hard_negative_mining_index,
    )

    index = _ensure_sf_ivf_index(spark, sf_dir, n_centroids=8)
    emb = _t(spark, sf_dir, "embeddings")
    return hard_negative_mining_index(
        index,
        emb.filter(F.col("vec_id") < 100),
        emb.select("vec_id", "label"),
        k=3,
        nprobe=8,
    )


def _sql_hard_negatives_index(k: int = 3, n_queries: int = 100) -> str:
    """Exact twin of index-backed hard-negative mining at full probe:
    per anchor, the top-k different-label neighbors by cosine over the
    whole corpus (rank on the 6dp-ROUNDED score — the GEMM engine's
    law, BLAS sum order differs so rounding-then-ranking keeps ties
    engine-exact)."""
    return f"""
WITH q AS (SELECT vec_id AS query_id, label AS q_label,
             CAST(embedding AS DOUBLE[]) AS qv
           FROM embeddings WHERE vec_id < {n_queries}),
s AS (SELECT q.query_id, q.q_label, e.vec_id AS neighbor_id,
        e.label AS neighbor_label,
        round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv),
              6) AS score
      FROM q JOIN embeddings e ON e.label <> q.q_label),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY score DESC, neighbor_id) AS rank
      FROM s)
SELECT query_id, q_label AS label, neighbor_id, neighbor_label,
       score AS cosine, rank
FROM r WHERE rank <= {k}
"""


REGISTRY["ext_hard_negatives_ivf"] = (
    q_hard_negatives_ivf,
    _sql_hard_negatives_index(),
)


def q_ann_recall_report(spark, sf_dir):
    """ANN serving-quality EVAL panel — the first report any ANN
    deployment publishes: recall@10 of the LSH-bucketed knn_join
    (n_planes=4, the in-query approximate path) against exact ground
    truth, per query over the WHOLE corpus, aggregated to
    (n_queries, mean_recall, min_recall, frac_perfect). Ground truth
    comes from the persisted IVF store at FULL probe through the GEMM
    batch path (search_batch_gemm: BLAS scoring of the bounded query
    matrix per pruned list partition, per-chunk partial top-k so the
    exchange carries chunks × q × k rows, never the all-pairs frame —
    the every-anchor-vs-itself eval is exactly the workload that path
    exists for; self excluded in-scan) — so the panel simultaneously
    exercises the compute-bound serving shape and the deterministic
    LSH path, and every number is value-oracled (both sides are
    SQL-reproducible)."""
    from uofi_payroll_etl_main_demo_spark.ext.similarity import (
        knn_join_gemm,
    )

    emb = _t(spark, sf_dir, "embeddings")
    index = _ensure_sf_ivf_index(spark, sf_dir, n_centroids=8)
    queries = emb.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    exact = index.search_batch_gemm(
        queries,
        k=10,
        nprobe=8,
        exclude_query_id=True,
    ).select("query_id", F.col("vec_id").alias("neighbor_id"))
    approx = knn_join_gemm(emb, dim=64, k=10, n_planes=4).select(
        F.col("vec_id").alias("query_id"),
        "neighbor_id",
        F.lit(1).alias("__hit"),
    )
    per_q = (
        exact.join(approx, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg((F.count("__hit") / F.lit(10.0)).alias("recall"))
    )
    return per_q.agg(
        F.count("*").alias("n_queries"),
        F.round(F.avg("recall"), 6).alias("mean_recall"),
        F.round(F.min("recall"), 6).alias("min_recall"),
        F.round(
            F.avg((F.col("recall") == 1.0).cast("double")), 6
        ).alias("frac_perfect"),
    )


def _sql_ann_recall_report(
    k: int = 10, dim: int = 64, n_planes: int = 4, seed: int = 42
) -> str:
    """Twin of the recall@k eval: the approx leg reproduces knn_join's
    deterministic buckets (rank on ROUNDED cosine, its law); the exact
    leg is the brute-force top-k ranked on ROUNDED score (the GEMM
    path's law — BLAS sum order differs, so rounding-then-ranking is
    what keeps ties engine-exact); recall joins the two id sets."""
    from uofi_payroll_etl_main_demo_spark.ext.similarity import _hyperplanes

    terms = []
    for bit, plane in enumerate(_hyperplanes(dim, n_planes, seed)):
        lst = "[" + ", ".join(repr(x) for x in plane) + "]"
        terms.append(
            f"(CASE WHEN list_dot_product(v, {lst}) >= 0 "
            f"THEN {1 << bit} ELSE 0 END)"
        )
    bucket = " + ".join(terms)
    return f"""
WITH b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
             {bucket} AS bucket FROM embeddings),
ap AS (SELECT a.vec_id AS query_id, x.vec_id AS neighbor_id,
         round(list_cosine_similarity(a.v, x.v), 6) AS cosine
       FROM b a JOIN b x ON a.bucket = x.bucket AND a.vec_id <> x.vec_id),
approx AS (SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, neighbor_id) AS rn
    FROM ap) WHERE rn <= {k}),
ex AS (SELECT q.vec_id AS query_id, x.vec_id AS neighbor_id,
         round(list_cosine_similarity(q.v, x.v), 6) AS score
       FROM b q JOIN b x ON q.vec_id <> x.vec_id),
exact AS (SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY score DESC, neighbor_id) AS rn
    FROM ex) WHERE rn <= {k}),
per_q AS (SELECT e.query_id,
            count(a.neighbor_id) / {float(k)} AS recall
          FROM exact e LEFT JOIN approx a
            ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
          GROUP BY e.query_id)
SELECT CAST(count(*) AS BIGINT) AS n_queries,
       round(avg(recall), 6) AS mean_recall,
       round(min(recall), 6) AS min_recall,
       round(avg(CASE WHEN recall = 1.0 THEN 1.0 ELSE 0.0 END), 6)
         AS frac_perfect
FROM per_q
"""


REGISTRY["ext_ann_recall_report"] = (
    q_ann_recall_report,
    _sql_ann_recall_report(),
)


# DCG@10 position weights in integer MILLI-units: round(1e6/log2(i+1))
# for i = 1..10 — the ranking-eval LAW ships its constants (a libm
# log2 inside either engine could flip a rounding boundary; fixed
# integer literals are exact everywhere — the integer-BM25/milli-bit
# philosophy). IDCG@5 = sum of the first five (binary relevance,
# 5-deep truth set).
_DCG_MILLI = [
    1000000, 630930, 500000, 430677, 386853,
    356207, 333333, 315465, 301030, 289065,
]
_IDCG5_MILLI = sum(_DCG_MILLI[:5])


def q_retrieval_rank_eval(spark, sf_dir):
    """Ranking-quality EVAL panel — the recall report's sibling for
    ORDER-aware serving quality: per query, MRR, DCG@10 (integer
    milli-weights — the constant-shipping law above) and NDCG@10 of
    the deterministic LSH retrieval ranking against a 5-deep exact
    ground-truth set. Ground truth is the persisted IVF store at full
    probe through the GEMM batch path (self excluded in-scan); the
    system ranking is knn_join_gemm's in-bucket top-10 with its
    rounded-cosine rank law. Queries whose LSH bucket is empty still
    report (zeros) — an eval that silently drops its failures isn't
    one. Every number is value-oracled; at 100 TB both legs keep
    their banded/pruned shapes, and the metric join is one
    (query, neighbor) hash join."""
    from uofi_payroll_etl_main_demo_spark.ext.similarity import (
        knn_join_gemm,
    )

    emb = _t(spark, sf_dir, "embeddings")
    index = _ensure_sf_ivf_index(spark, sf_dir, n_centroids=8)
    queries = emb.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    truth = index.search_batch_gemm(
        queries, k=5, nprobe=8, exclude_query_id=True
    ).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.lit(1).alias("__rel"),
    )
    approx = knn_join_gemm(emb, dim=64, k=10, n_planes=4).select(
        F.col("vec_id").alias("query_id"), "neighbor_id", "rank"
    )
    warr = F.array(*[F.lit(w) for w in _DCG_MILLI])
    hits = approx.join(truth, ["query_id", "neighbor_id"], "left").select(
        "query_id",
        F.when(F.col("__rel").isNotNull(), F.col("rank")).alias("__fr"),
        F.when(
            F.col("__rel").isNotNull(), F.element_at(warr, F.col("rank"))
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("__w"),
    )
    agg = hits.groupBy("query_id").agg(
        F.min("__fr").alias("__first"), F.sum("__w").alias("__dcg")
    )
    return (
        queries.select("query_id")
        .join(agg, "query_id", "left")
        .select(
            "query_id",
            F.round(
                F.coalesce(F.lit(1.0) / F.col("__first"), F.lit(0.0)), 6
            ).alias("mrr"),
            F.coalesce(F.col("__dcg"), F.lit(0)).cast("long").alias(
                "dcg_milli"
            ),
            F.round(
                F.coalesce(F.col("__dcg"), F.lit(0))
                / F.lit(float(_IDCG5_MILLI)),
                6,
            ).alias("ndcg"),
        )
    )


def _sql_retrieval_rank_eval(
    dim: int = 64, n_planes: int = 4, seed: int = 42
) -> str:
    """Twin: LSH buckets + rounded-cosine rank (the approx leg's law),
    exact 5-deep truth ranked on the ROUNDED score (the GEMM leg's
    law), the SAME milli-weight literals, one left join."""
    from uofi_payroll_etl_main_demo_spark.ext.similarity import _hyperplanes

    terms = []
    for bit, plane in enumerate(_hyperplanes(dim, n_planes, seed)):
        lst = "[" + ", ".join(repr(x) for x in plane) + "]"
        terms.append(
            f"(CASE WHEN list_dot_product(v, {lst}) >= 0 "
            f"THEN {1 << bit} ELSE 0 END)"
        )
    bucket = " + ".join(terms)
    w_lst = "[" + ", ".join(str(w) for w in _DCG_MILLI) + "]"
    return f"""
WITH b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
             {bucket} AS bucket FROM embeddings),
ap AS (SELECT a.vec_id AS query_id, x.vec_id AS neighbor_id,
         round(list_cosine_similarity(a.v, x.v), 6) AS cosine
       FROM b a JOIN b x ON a.bucket = x.bucket AND a.vec_id <> x.vec_id),
approx AS (SELECT query_id, neighbor_id, rn AS rank FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, neighbor_id) AS rn
    FROM ap) WHERE rn <= 10),
ex AS (SELECT a.vec_id AS query_id, x.vec_id AS neighbor_id,
         round(list_cosine_similarity(a.v, x.v), 6) AS s
       FROM b a JOIN b x ON a.vec_id <> x.vec_id),
truth AS (SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY s DESC, neighbor_id) AS rn
    FROM ex) WHERE rn <= 5),
h AS (SELECT ap2.query_id, ap2.rank,
        t.neighbor_id IS NOT NULL AS rel
      FROM approx ap2 LEFT JOIN truth t
        USING (query_id, neighbor_id)),
pq AS (SELECT query_id,
         min(CASE WHEN rel THEN rank END) AS fr,
         sum(CASE WHEN rel THEN {w_lst}[rank] ELSE 0 END) AS dcg
       FROM h GROUP BY query_id)
SELECT q.query_id,
       round(coalesce(1.0 / fr, 0.0), 6) AS mrr,
       CAST(coalesce(dcg, 0) AS BIGINT) AS dcg_milli,
       round(coalesce(dcg, 0) / {float(_IDCG5_MILLI)}, 6) AS ndcg
FROM (SELECT vec_id AS query_id FROM embeddings) q
LEFT JOIN pq USING (query_id)
"""


REGISTRY["ext_retrieval_rank_eval"] = (
    q_retrieval_rank_eval,
    _sql_retrieval_rank_eval(),
)


def q_random_projection(spark, sf_dir):
    """Johnson–Lindenstrauss reduction of the embedding column
    (ext/similarity.py random_projection): 64 → 16 dims via a seeded
    Achlioptas sparse ±√(3/16) matrix — the standard pre-ANN step at
    corpus scale (quarters every downstream pair cosine / LSH bucket /
    IVF scan while approximately preserving pairwise geometry). One
    narrow JVM-side projection per row, no shuffle, no UDF; the
    matrix is a driver-side deterministic constant, so the whole op
    is value-oracled in the exploded (id, component) shape."""
    from uofi_payroll_etl_main_demo_spark.ext.similarity import (
        random_projection,
    )

    return random_projection(
        _t(spark, sf_dir, "embeddings"), dim=64, out_dim=16
    )


def _sql_random_projection(dim: int = 64, out_dim: int = 16) -> str:
    from uofi_payroll_etl_main_demo_spark.ext.similarity import (
        _projection_matrix,
    )

    rows = ", ".join(
        "(" + str(j) + ", ["
        + ", ".join(repr(x) for x in row)
        + "])"
        for j, row in enumerate(_projection_matrix(dim, out_dim))
    )
    return f"""
WITH b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings),
r(j, plane) AS (VALUES {rows})
SELECT b.vec_id, CAST(r.j AS INT) AS j,
       round(list_dot_product(b.v, r.plane), 6) AS proj
FROM b CROSS JOIN r
"""


REGISTRY["ext_random_projection"] = (
    q_random_projection,
    _sql_random_projection(),
)


def q_projected_rerank_topk(spark, sf_dir):
    """Two-stage retrieval THROUGH the JL projection (ext/similarity.py
    projected_rerank_top_k) — how the reduction is actually deployed:
    coarse top-50 by cosine in the 16-dim projected space (per-row
    cost out_dim, not dim, once the projection is materialized), then
    exact rerank of only those survivors in the full 64-dim space.
    Coarse cut ranks on 6dp-rounded projected cosine (engines project
    with different sum orders; rounding keeps the cut engine-exact),
    rerank ranks unrounded like every exact top-k row — fully
    value-oracled end to end."""
    from uofi_payroll_etl_main_demo_spark.ext.similarity import (
        projected_rerank_top_k,
    )

    return projected_rerank_top_k(
        _t(spark, sf_dir, "embeddings"), QUERY_VEC, dim=64, k=10,
        coarse=50, out_dim=16,
    )


def _sql_projected_rerank_topk(
    k: int = 10, coarse: int = 50, dim: int = 64, out_dim: int = 16
) -> str:
    from uofi_payroll_etl_main_demo_spark.ext.similarity import (
        _projection_matrix,
    )

    R = _projection_matrix(dim, out_dim)
    qp = [
        sum(float(v) * r for v, r in zip(QUERY_VEC, row)) for row in R
    ]
    pv = "[" + ", ".join(
        "list_dot_product(v, ["
        + ", ".join(repr(x) for x in row)
        + "])"
        for row in R
    ) + "]"
    qp_sql = "[" + ", ".join(repr(x) for x in qp) + "]"
    return f"""
WITH b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings),
c AS (SELECT vec_id, v,
        round(list_cosine_similarity({pv},
              CAST({qp_sql} AS DOUBLE[])), 6) AS pcos
      FROM b
      ORDER BY pcos DESC, vec_id LIMIT {coarse})
SELECT vec_id, round(score, 6) AS score FROM (
  SELECT vec_id, list_cosine_similarity(v,
           CAST({_QV_SQL} AS DOUBLE[])) AS score
  FROM c) ORDER BY score DESC, vec_id LIMIT {k}
"""


REGISTRY["ext_projected_rerank_topk"] = (
    q_projected_rerank_topk,
    _sql_projected_rerank_topk(),
)


def _ensure_sf_pq_postretrain_index(spark, sf_dir):
    """PQ store taken through the FULL maintenance lifecycle: build on
    the even-id half, ``pq_index_add`` the odd half, ``pq_index_delete``
    ``vec_id % 9 == 4``, then ``pq_index_retrain`` on the current
    membership (codebooks re-fit, codes re-encoded, batches folded).
    Idempotent per corpus snapshot via the post-retrain tag, same
    pattern as the postdelete IVF helper — a repeat query loads, a
    fresh snapshot replays the real add→delete→retrain path."""
    from uofi_payroll_etl_main_demo_spark.ext.ann_index import (
        _fs_exists,
        _read_meta,
        corpus_fingerprint,
        pq_index_add,
        pq_index_build,
        pq_index_delete,
        pq_index_load,
        pq_index_retrain,
    )

    emb = _t(spark, sf_dir, "embeddings")
    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    fp = corpus_fingerprint(emb_path)
    post_tag = f"{fp}:retrained-del9m4"
    idx_dir = os.path.join(
        _ann_index_root(),
        f"pq8x16rt_{os.path.basename(os.path.normpath(sf_dir))}",
    )
    if _fs_exists(spark, f"{idx_dir}/meta"):
        try:
            meta = _read_meta(spark, idx_dir)
        except Exception:
            meta = None
        if (
            meta
            and meta["kind"] == "pq"
            and meta["corpus_tag"] == post_tag
            and meta["m"] == 8
            and meta["n_centroids"] == 16
        ):
            return pq_index_load(spark, idx_dir)
    pq_index_build(
        emb.filter(F.col("vec_id") % 2 == 0),
        idx_dir,
        m=8,
        n_centroids=16,
        corpus_tag=f"{fp}:half",
    )
    pq_index_add(
        emb.filter(F.col("vec_id") % 2 == 1),
        idx_dir,
        new_corpus_tag=f"{fp}:full",
        batch_id="odds",
    )
    pq_index_delete(
        spark,
        idx_dir,
        emb.filter(F.col("vec_id") % 9 == 4).select("vec_id"),
        new_corpus_tag=f"{fp}:del9m4",
    )
    pq_index_retrain(spark, idx_dir, emb, new_corpus_tag=post_tag)
    return pq_index_load(spark, idx_dir)


def q_pq_postretrain_query(spark, sf_dir):
    """Serving AFTER the full PQ maintenance lifecycle (ext/
    ann_index.py pq_index_retrain): build on half the corpus, add the
    other half, delete ``vec_id % 9 == 4``, then RETRAIN — codebooks
    re-fit on the current membership, every stored code re-encoded
    through them, batches folded (pre-retrain replays refused). At
    full rerank margin the answer must equal the exact brute force
    over the SURVIVORS: the oracle proves the retrain re-encoded
    exactly the membership — nothing lost, nothing duplicated, deleted
    ids NOT resurrected from the corpus frame it trains on. The ADC
    accuracy recovery itself is pinned in tests + the drift probe
    (scripts/pq_drift_probe.py, BASELINE.md)."""
    emb = _t(spark, sf_dir, "embeddings")
    index = _ensure_sf_pq_postretrain_index(spark, sf_dir)
    out = index.search(
        QUERY_VEC, k=10, candidates=1_000_000, rerank_corpus=emb
    )
    return out.select("vec_id", F.round("score", 6).alias("score"))


REGISTRY["ext_pq_postretrain_query"] = (
    q_pq_postretrain_query,
    _sql_topk_cosine(where="WHERE vec_id % 9 != 4"),
)


def _sql_dedup_clusters() -> str:
    """Transitive closure of the ngram pair graph; component = min
    reachable id (exactly what min-label propagation converges to)."""
    return f"""
WITH RECURSIVE pairs AS ({_sql_ngram_jaccard()}),
edges AS (
  SELECT id_a AS s, id_b AS d FROM pairs
  UNION
  SELECT id_b AS s, id_a AS d FROM pairs
),
reach(src, node) AS (
  SELECT s, s FROM edges
  UNION
  SELECT r.src, e.d FROM reach r JOIN edges e ON r.node = e.s
)
SELECT src AS doc_id, min(node) AS component FROM reach GROUP BY src
"""


REGISTRY["ext_dedup_clusters"] = (q_dedup_clusters, _sql_dedup_clusters())


def _sql_minhash_pairs(
    k: int = 3,
    num_hashes: int = 32,
    bands: int = 16,
    threshold: float = 0.2,
) -> str:
    """Exact SQL twin of the portable-family MinHash+LSH pipeline
    (ext/dedup.py): identical md5 double-hashing signatures
    (``b1 + i·b2`` over the two 52-bit md5 halves), identical banding
    (bucket = equality of the band's signature slice), identical
    Jaccard verification (intersection on the 52-bit shingle hash, as
    the Spark ``__set`` does) — so candidate recall itself is checked,
    not just the verified survivors."""
    rpb = num_hashes // bands
    return f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           range(1, len(toks) - {k} + 2),
           i -> array_to_string(toks[i:i + {k - 1}], ' ')))) AS s
  FROM t WHERE len(toks) >= {k}
),
hx AS (
  SELECT doc_id,
         ('0x' || substr(md5(s), 1, 13))::BIGINT AS b1,
         ('0x' || substr(md5(s), 14, 13))::BIGINT AS b2
  FROM sh
),
perms AS (
  SELECT doc_id, r.i, min(b1 + r.i * b2) AS m
  FROM hx CROSS JOIN range(0, {num_hashes}) r(i)
  GROUP BY doc_id, r.i
),
bnd AS (
  SELECT doc_id, i // {rpb} AS band,
         string_agg(m::VARCHAR, ',' ORDER BY i) AS bk
  FROM perms GROUP BY doc_id, i // {rpb}
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bnd a JOIN bnd b
    ON a.band = b.band AND a.bk = b.bk AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n FROM hx GROUP BY doc_id),
inter AS (
  SELECT c.id_a, c.id_b, count(*) AS i
  FROM cand c
  JOIN hx a ON a.doc_id = c.id_a
  JOIN hx b ON b.doc_id = c.id_b AND a.b1 = b.b1
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       round(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= {threshold}
"""


def _sql_simhash_pairs(max_hamming: int = 3) -> str:
    """Exact SQL twin of the portable-family SimHash pipeline: the 64
    token-hash bits come from one md5 (bits 0–51 from hex chars 1–13,
    bits 52–63 from chars 14–16), the 64 bit-balance sums, the signed
    64-bit signature reassembly, the pigeonhole chunk buckets, and the
    final popcount Hamming filter are all reproduced bit-for-bit.
    Arithmetic ``>>`` then ``& mask`` equals Spark's
    ``shiftrightunsigned`` + mask: the mask keeps only true signature
    bits, so sign-fill never leaks through."""
    nchunks = max_hamming + 1
    width = 64 // nchunks
    bal_cols = []
    for b in range(64):
        src = f"(h1 >> {b}) & 1" if b < 52 else f"(h2 >> {b - 52}) & 1"
        bal_cols.append(
            f"sum(CASE WHEN {src} = 1 THEN 1 ELSE -1 END) AS g{b}"
        )
    sig_terms = [
        f"CASE WHEN g{b} > 0 THEN {-(1 << 63) if b == 63 else (1 << b)} "
        "ELSE 0 END"
        for b in range(64)
    ]
    mask = (1 << width) - 1
    return f"""
WITH t AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN [] ELSE {_TOKS} END AS toks
  FROM documents
),
tok AS (SELECT doc_id, unnest(toks) AS tk FROM t),
hx AS (
  SELECT doc_id,
         ('0x' || substr(md5(tk), 1, 13))::BIGINT AS h1,
         ('0x' || substr(md5(tk), 14, 3))::BIGINT AS h2
  FROM tok
),
bal AS (SELECT doc_id, {", ".join(bal_cols)} FROM hx GROUP BY doc_id),
sig AS (SELECT doc_id, ({" + ".join(sig_terms)})::BIGINT AS s FROM bal),
chunks AS (
  SELECT doc_id, s, c.c AS chunk, (s >> (c.c * {width})) & {mask} AS ck
  FROM sig CROSS JOIN range(0, {nchunks}) c(c)
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         a.s AS sa, b.s AS sb
  FROM chunks a JOIN chunks b
    ON a.chunk = b.chunk AND a.ck = b.ck AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, CAST(bit_count(xor(sa, sb)) AS INTEGER) AS hamming
FROM cand WHERE bit_count(xor(sa, sb)) <= {max_hamming}
"""


REGISTRY["ext_minhash_pairs"] = (q_minhash_pairs, _sql_minhash_pairs())
REGISTRY["ext_simhash_pairs"] = (q_simhash_pairs, _sql_simhash_pairs())


def q_dedup_method_agreement(spark, sf_dir):
    """Detector-choice audit: which near-dup pairs MinHash (shingle
    Jaccard ≥ 0.2) and SimHash (token-balance Hamming ≤ 3) agree on —
    the comparison a curation team runs before committing a 100 TB
    corpus to one detector. Full-outer join of the two pair sets on
    (id_a, id_b): pairs only one method flags surface with the other
    side NULL. Both laws are the engine-portable families, so the
    oracle reproduces BOTH pipelines and the join — disagreement rows
    are value-checked, not sampled. Cost: ONE corpus scan+tokenize
    (persisted, shared by both legs — each leg previously re-read and
    re-tokenized the corpus), the two pair passes over the shared
    token arrays, + one pair-key join (pairs, not corpus, scale)."""
    from uofi_payroll_etl_main_demo_spark.functions.scale import (
        scale_input_parallelism,
    )
    from uofi_payroll_etl_main_demo_spark.functions.text import (
        tokenize_ws,
    )

    docs = _t(spark, sf_dir, "documents")
    # tokenize ONCE for both detector legs: the minhash leg shingles
    # these tokens, the simhash leg hashes them per-token — the scan +
    # regex split is identical work in both, so it is paid once and the
    # (id, tokens) frame persists at O(corpus tokens), no shuffle
    _drain_persist_pool()
    tok = _pooled_persist(
        scale_input_parallelism(docs.select("doc_id", "text")).select(
            "doc_id", tokenize_ws("text").alias("__toks")
        )
    )
    mh = minhash_near_dup_pairs(
        tok, num_hashes=32, bands=16, k=3, threshold=0.2,
        hash_family="portable", tokens_col="__toks",
    ).select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard"),
        F.lit(True).alias("__mh"),
    )
    sh = simhash_near_dup_pairs(
        tok, max_hamming=3, hash_family="portable", tokens_col="__toks"
    ).select("id_a", "id_b", "hamming", F.lit(True).alias("__sh"))
    return mh.join(sh, ["id_a", "id_b"], "full").select(
        "id_a",
        "id_b",
        F.coalesce("__mh", F.lit(False)).alias("in_minhash"),
        F.coalesce("__sh", F.lit(False)).alias("in_simhash"),
        "jaccard",
        "hamming",
    )


REGISTRY["ext_dedup_method_agreement"] = (
    q_dedup_method_agreement,
    f"""
SELECT coalesce(m.id_a, s.id_a) AS id_a,
       coalesce(m.id_b, s.id_b) AS id_b,
       m.id_a IS NOT NULL AS in_minhash,
       s.id_a IS NOT NULL AS in_simhash,
       m.jaccard AS jaccard,
       s.hamming AS hamming
FROM ({_sql_minhash_pairs()}) m
FULL JOIN ({_sql_simhash_pairs()}) s
  ON m.id_a = s.id_a AND m.id_b = s.id_b
""",
)


def _sql_winnow(k: int = 5, w: int = 4) -> str:
    return rf"""
WITH t AS (SELECT doc_id, CASE WHEN trim(text) = '' THEN []
             ELSE {_TOKS} END AS toks FROM documents),
g AS (SELECT doc_id, CASE WHEN len(toks) >= {k}
        THEN list_transform(range(1, len(toks) - {k} + 2),
          i -> substr(md5(array_to_string(toks[i:i + {k - 1}], ' ')), 1, 15))
        ELSE [] END AS hs FROM t),
win AS (SELECT doc_id, CASE
        WHEN len(hs) >= {w} THEN list_distinct(
          list_transform(range(1, len(hs) - {w} + 2),
            i -> list_min(hs[i:i + {w - 1}])))
        WHEN len(hs) >= 1 THEN [list_min(hs)]
        ELSE [] END AS fps FROM g)
SELECT doc_id, unnest(fps) AS fp FROM win
"""


REGISTRY["ext_winnow_fingerprints"] = (q_winnow_fingerprints, _sql_winnow())

REGISTRY["ext_chunk_documents"] = (
    q_chunk_documents,
    f"""
WITH t AS (SELECT doc_id, CASE WHEN trim(text) = '' THEN []
             ELSE {_TOKS} END AS toks FROM documents),
c AS (SELECT doc_id, len(toks) AS n, toks,
        CASE WHEN len(toks) > 0 THEN
          CAST(floor((greatest(len(toks) - 64, 0) + 47) / 48.0) AS INT) + 1
        ELSE 0 END AS nc FROM t)
SELECT doc_id, CAST(i AS INT) AS chunk_idx,
  array_to_string(toks[i * 48 + 1 : i * 48 + 64], ' ') AS chunk_text,
  CAST(least(n - i * 48, 64) AS INT) AS n_tokens
FROM (SELECT doc_id, n, toks, unnest(range(0, nc)) AS i FROM c)
""",
)

REGISTRY["ext_winnow_containment"] = (
    q_winnow_containment,
    f"""
WITH fps AS ({_sql_winnow()})
SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
FROM fps a JOIN fps b USING (fp)
WHERE a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING count(*) >= 2
""",
)

REGISTRY["ext_top_ngrams"] = (
    q_top_ngrams,
    f"""
WITH t AS (SELECT doc_id, CASE WHEN trim(text) = '' THEN []
             ELSE {_TOKS} END AS toks FROM documents),
g AS (SELECT unnest(list_distinct(list_transform(
         range(1, len(toks) - 2 + 2),
         i -> array_to_string(toks[i:i + 1], ' ')))) AS gram
      FROM t WHERE len(toks) >= 2)
SELECT gram, count(*) AS n_docs FROM g GROUP BY gram
ORDER BY n_docs DESC, gram LIMIT 20
""",
)


def _sql_pipeline_curation() -> str:
    """Quality + language + cluster-loser removal, composed from the
    same oracle pieces the individual queries use."""
    return f"""
WITH RECURSIVE
stats AS ({_sql_doc_stats()}),
lang AS ({_sql_language_id()}),
pairs AS ({_sql_ngram_jaccard()}),
edges AS (
  SELECT id_a AS s, id_b AS d FROM pairs
  UNION
  SELECT id_b AS s, id_a AS d FROM pairs
),
reach(src, node) AS (
  SELECT s, s FROM edges
  UNION
  SELECT r.src, e.d FROM reach r JOIN edges e ON r.node = e.s
),
comp AS (SELECT src AS doc_id, min(node) AS component FROM reach GROUP BY src)
SELECT s.doc_id, round(s.quality, 6) AS quality, l.predicted_lang
FROM stats s
JOIN lang l USING (doc_id)
WHERE s.quality >= 0.5 AND l.predicted_lang = 'en'
  AND NOT EXISTS (SELECT 1 FROM comp c
                  WHERE c.doc_id = s.doc_id AND c.component <> c.doc_id)
"""


REGISTRY["pipeline_curation"] = (q_pipeline_curation, _sql_pipeline_curation())

REGISTRY["pipeline_cpa_shape"] = (
    q_pipeline_cpa_shape,
    """
WITH u AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
         o_orderpriority FROM orders WHERE o_orderkey % 2 = 0
  UNION ALL
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
         NULL FROM orders WHERE o_orderkey % 2 = 1
),
fy AS (SELECT * FROM u WHERE o_orderdate BETWEEN TIMESTAMP '1995-07-01'
       AND TIMESTAMP '1996-06-30'),
j AS (SELECT DISTINCT fy.*, c.c_mktsegment FROM fy
      LEFT JOIN customer c ON o_custkey = c_custkey),
d AS (SELECT * FROM j QUALIFY row_number() OVER (
      PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) = 1)
SELECT o_orderkey AS "Order Key", o_custkey AS "Customer Key",
  c_mktsegment AS "Segment",
  CASE WHEN o_orderpriority IS NOT NULL
       THEN trim(split_part(o_orderpriority, '-', 1)) END AS "Priority Code",
  CASE WHEN o_orderpriority LIKE '%-%'
       THEN trim(split_part(o_orderpriority, '-', 2)) END AS "Priority Name",
  strftime(o_orderdate, '%Y-%m-%d') AS "Order Date"
FROM d
""",
)


# --------------------------------------------------------------------------
# Curation extensions (round 2): decontamination, Gopher repetition
# rules, PII redaction, TF-IDF / BM25, KNN self-join, star CC, PQ ANN
# --------------------------------------------------------------------------


def q_decontaminate(spark, sf_dir):
    """Decontamination: 5-gram fingerprint overlap of the training
    corpus against the eval slice (doc_id % 20 == 0 stands in for the
    held-out benchmark set). The eval fingerprint set is broadcast —
    at 100 TB the benchmarks are MBs, the corpus is not."""
    from uofi_payroll_etl_main_demo_spark.ext.curation import (
        contamination_report,
    )

    d = _t(spark, sf_dir, "documents")
    ev = d.filter(F.col("doc_id") % 20 == 0)
    tr = d.filter(F.col("doc_id") % 20 != 0)
    return contamination_report(tr, ev, k=5, threshold=0.05)


def _sql_decontaminate(k: int = 5, threshold: float = 0.05) -> str:
    return rf"""
WITH t AS (SELECT doc_id, CASE WHEN trim(text) = '' THEN []
             ELSE {_TOKS} END AS toks FROM documents),
sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           range(1, len(toks) - {k} + 2),
           i -> substr(md5(array_to_string(toks[i:i + {k - 1}], ' ')), 1, 15)
         ))) AS fp
  FROM t WHERE len(toks) >= {k}
),
ev AS (SELECT DISTINCT fp FROM sh WHERE doc_id % 20 = 0),
tr AS (SELECT * FROM sh WHERE doc_id % 20 <> 0),
tot AS (SELECT doc_id, count(*) AS n_shingles FROM tr GROUP BY doc_id),
hit AS (SELECT doc_id, count(*) AS n_hit FROM tr
        WHERE fp IN (SELECT fp FROM ev) GROUP BY doc_id)
SELECT tot.doc_id, n_shingles,
       coalesce(n_hit, 0) AS n_hit,
       CAST(floor(CAST(coalesce(n_hit, 0) AS DOUBLE) / n_shingles * 1e6)
            AS BIGINT) AS hit_ppm,
       CAST(coalesce(n_hit, 0) AS DOUBLE) / n_shingles >= {threshold}
         AS contaminated
FROM tot LEFT JOIN hit USING (doc_id)
"""


def q_repetition_stats(spark, sf_dir):
    """Gopher-style repetition/quality rules per document (duplicate
    and top token / 2-gram fractions, ppm integers)."""
    from uofi_payroll_etl_main_demo_spark.ext.curation import (
        repetition_stats,
    )

    return repetition_stats(_t(spark, sf_dir, "documents"))


def _sql_repetition() -> str:
    return rf"""
WITH t AS (SELECT doc_id, CASE WHEN trim(text) = '' THEN []
             ELSE {_TOKS} END AS toks FROM documents),
g1 AS (SELECT doc_id, g, count(*) AS c
       FROM (SELECT doc_id, unnest(toks) AS g FROM t) GROUP BY doc_id, g),
s1 AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tok,
              count(*) AS d_tok, max(c) AS m_tok FROM g1 GROUP BY doc_id),
t2 AS (SELECT doc_id, CASE WHEN len(toks) >= 2
         THEN list_transform(range(1, len(toks)),
                i -> array_to_string(toks[i:i + 1], ' '))
         ELSE [] END AS gs FROM t),
g2 AS (SELECT doc_id, g, count(*) AS c
       FROM (SELECT doc_id, unnest(gs) AS g FROM t2) GROUP BY doc_id, g),
s2 AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_2g,
              count(*) AS d_2g, max(c) AS m_2g FROM g2 GROUP BY doc_id),
j AS (SELECT s1.doc_id, n_tok, d_tok, m_tok, n_2g, d_2g, m_2g
      FROM s1 LEFT JOIN s2 USING (doc_id)),
p AS (SELECT doc_id, n_tok,
  CASE WHEN n_tok > 0 THEN CAST(floor(
    CAST(n_tok - d_tok AS DOUBLE) / n_tok * 1e6) AS BIGINT) END AS dup_token_ppm,
  CASE WHEN n_tok > 0 THEN CAST(floor(
    CAST(m_tok AS DOUBLE) / n_tok * 1e6) AS BIGINT) END AS top_token_ppm,
  CASE WHEN n_2g > 0 THEN CAST(floor(
    CAST(n_2g - d_2g AS DOUBLE) / n_2g * 1e6) AS BIGINT) END AS dup_2gram_ppm,
  CASE WHEN n_2g > 0 THEN CAST(floor(
    CAST(m_2g AS DOUBLE) / n_2g * 1e6) AS BIGINT) END AS top_2gram_ppm
  FROM j)
SELECT doc_id, n_tok AS n_tokens, dup_token_ppm, top_token_ppm,
       dup_2gram_ppm, top_2gram_ppm,
       (coalesce(top_2gram_ppm, 0) > 180000)
         OR (coalesce(dup_token_ppm, 0) > 600000) AS repetitive
FROM p
"""


def q_pii_redact(spark, sf_dir):
    """PII redaction: regex mask chain (email → SSN → phone → digit
    run) over customer names; per-pattern counts."""
    from uofi_payroll_etl_main_demo_spark.ext.curation import redact_pii

    return redact_pii(
        _t(spark, sf_dir, "customer"), ["c_name"], "c_custkey"
    )


def _sql_pii_redact() -> str:
    from uofi_payroll_etl_main_demo_spark.ext.curation import PII_PATTERNS

    red = "c_name"
    counts = []
    for name, pat, tag in PII_PATTERNS:
        counts.append(
            f"CAST(len(regexp_extract_all({red}, '{pat}')) AS BIGINT)"
            f" AS n_{name}"
        )
        red = f"regexp_replace({red}, '{pat}', '{tag}', 'g')"
    return (
        f"SELECT c_custkey, {red} AS c_name_redacted, "
        + ", ".join(counts)
        + " FROM customer"
    )


def q_tfidf_top_terms(spark, sf_dir):
    """TF-IDF: top-3 characteristic terms per document (rank by tfidf,
    deterministic term tie-break; integer tf/rank emitted)."""
    from uofi_payroll_etl_main_demo_spark.ext.curation import (
        tfidf_top_terms,
    )

    out = tfidf_top_terms(_t(spark, sf_dir, "documents"), top_n=3)
    return out.select(
        "doc_id", "term", "tf", F.col("rank").cast("bigint").alias("rank")
    )


def _sql_tfidf(top_n: int = 3) -> str:
    return rf"""
WITH t AS (SELECT doc_id, CASE WHEN trim(text) = '' THEN []
             ELSE {_TOKS} END AS toks FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf
       FROM (SELECT doc_id, unnest(toks) AS term FROM t)
       GROUP BY doc_id, term),
dfq AS (SELECT term, count(*) AS dfreq FROM tf GROUP BY term),
scored AS (
  SELECT doc_id, term, tf,
         tf * ln((SELECT count(*) FROM documents) * 1.0 / dfreq) AS tfidf
  FROM tf JOIN dfq USING (term))
SELECT doc_id, term, tf, rank FROM (
  SELECT doc_id, term, tf,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY tfidf DESC, term) AS rank
  FROM scored)
WHERE rank <= {top_n}
"""


_BM25_TERMS = ["join", "spark", "window"]


def q_bm25_search(spark, sf_dir):
    """BM25 keyword retrieval over documents for a fixed term list;
    deterministic integer micro-point scores."""
    from uofi_payroll_etl_main_demo_spark.ext.curation import bm25_search

    return bm25_search(_t(spark, sf_dir, "documents"), _BM25_TERMS)


def _sql_bm25(k1: float = 1.2, b: float = 0.75, top_n: int = 20) -> str:
    terms = ", ".join(f"'{t}'" for t in sorted(set(_BM25_TERMS)))
    return rf"""
WITH t AS (SELECT doc_id, CASE WHEN trim(text) = '' THEN []
             ELSE {_TOKS} END AS toks FROM documents),
dl AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl FROM t),
stats AS (SELECT (SELECT count(*) FROM documents) AS n_docs,
                 (SELECT avg(dl) FROM dl) AS avgdl),
tf AS (SELECT doc_id, term, count(*) AS tf
       FROM (SELECT doc_id, unnest(toks) AS term FROM t)
       WHERE term IN ({terms}) GROUP BY doc_id, term),
dfq AS (SELECT term, CAST(count(*) AS DOUBLE) AS dfreq FROM tf GROUP BY term),
per AS (
  SELECT tf.doc_id,
         ln((stats.n_docs - dfreq + 0.5) / (dfreq + 0.5) + 1.0)
           * (CAST(tf AS DOUBLE) * ({k1} + 1.0))
           / (CAST(tf AS DOUBLE)
              + {k1} * (1.0 - {b} + {b} * dl.dl / stats.avgdl)) AS s
  FROM tf JOIN dfq USING (term) JOIN dl ON tf.doc_id = dl.doc_id, stats)
SELECT doc_id, CAST(sum(floor(s * 1e6)) AS BIGINT) AS score_e6,
       count(*) AS n_query_terms_hit
FROM per GROUP BY doc_id
ORDER BY score_e6 DESC, doc_id LIMIT {top_n}
"""


def q_hybrid_rrf(spark, sf_dir):
    """Hybrid retrieval (ext/curation.py hybrid_rrf_search): BM25
    keyword top-20 and dense-cosine top-20 fused by reciprocal-rank
    fusion ``Σ 1/(60 + rank)`` — the Elasticsearch/OpenSearch hybrid
    default, and the first query a RAG stack runs when keyword and
    vector retrieval disagree. Entirely rank-determined (scores never
    mix scales), so the whole hybrid answer is value-oracled; the
    dense leg is the exact cosine top-k here — at corpus scale it
    swaps for an ANN index serving call with the same output shape."""
    from uofi_payroll_etl_main_demo_spark.ext.curation import (
        hybrid_rrf_search,
    )

    out = hybrid_rrf_search(
        _t(spark, sf_dir, "documents"),
        _t(spark, sf_dir, "embeddings"),
        _BM25_TERMS,
        QUERY_VEC,
        k=10,
    )
    return out.select(
        "doc_id", F.round("rrf", 6).alias("rrf"), "in_bm25", "in_dense"
    )


def _sql_hybrid_rrf(k: int = 10, rrf_k: int = 60, top_n: int = 20) -> str:
    return f"""
WITH b AS ({_sql_bm25(top_n=top_n)}),
br AS (SELECT doc_id,
         row_number() OVER (ORDER BY score_e6 DESC, doc_id) AS rb
       FROM b),
d AS (SELECT vec_id AS doc_id, list_cosine_similarity(
         CAST(embedding AS DOUBLE[]), CAST({_QV_SQL} AS DOUBLE[])) AS s
      FROM embeddings ORDER BY s DESC, vec_id LIMIT {top_n}),
dr AS (SELECT doc_id,
         row_number() OVER (ORDER BY s DESC, doc_id) AS rd
       FROM d),
f AS (SELECT COALESCE(br.doc_id, dr.doc_id) AS doc_id,
        COALESCE(1.0/({rrf_k} + br.rb), 0.0)
          + COALESCE(1.0/({rrf_k} + dr.rd), 0.0) AS rrf,
        br.rb IS NOT NULL AS in_bm25,
        dr.rd IS NOT NULL AS in_dense
      FROM br FULL OUTER JOIN dr ON br.doc_id = dr.doc_id)
SELECT doc_id, round(rrf, 6) AS rrf, in_bm25, in_dense
FROM f ORDER BY rrf DESC, doc_id LIMIT {k}
"""


REGISTRY["ext_hybrid_rrf"] = (q_hybrid_rrf, _sql_hybrid_rrf())


def q_knn_join(spark, sf_dir):
    """KNN self-join: approximate 3 nearest neighbors for EVERY vector
    via LSH-bucketed pair generation; in-bucket scoring is one numpy
    GEMM per bucket (measured ~6× the per-pair higher-order-function
    form, which stays as the small-scale reference — parity pinned in
    tests/test_curation.py). The deterministic hyperplane buckets make
    even the approximate result exactly SQL-reproducible."""
    from uofi_payroll_etl_main_demo_spark.ext.similarity import (
        knn_join_gemm,
    )

    out = knn_join_gemm(
        _t(spark, sf_dir, "embeddings"), dim=64, k=3, n_planes=4
    )
    return out.select(
        "vec_id",
        "neighbor_id",
        "cosine",
        F.col("rank").cast("bigint").alias("rank"),
    )


def _sql_knn_join(
    k: int = 3, dim: int = 64, n_planes: int = 4, seed: int = 42
) -> str:
    from uofi_payroll_etl_main_demo_spark.ext.similarity import _hyperplanes

    terms = []
    for bit, plane in enumerate(_hyperplanes(dim, n_planes, seed)):
        lst = "[" + ", ".join(repr(x) for x in plane) + "]"
        terms.append(
            f"(CASE WHEN list_dot_product(v, {lst}) >= 0 "
            f"THEN {1 << bit} ELSE 0 END)"
        )
    bucket = " + ".join(terms)
    return f"""
WITH b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
             {bucket} AS bucket FROM embeddings),
p AS (SELECT a.vec_id AS vec_id, x.vec_id AS neighbor_id,
             round(list_cosine_similarity(a.v, x.v), 6) AS cosine
      FROM b a JOIN b x ON a.bucket = x.bucket AND a.vec_id <> x.vec_id)
SELECT vec_id, neighbor_id, cosine, rank FROM (
  SELECT vec_id, neighbor_id, cosine,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY cosine DESC, neighbor_id) AS rank
  FROM p)
WHERE rank <= {k}
"""


def q_dedup_clusters_star(spark, sf_dir):
    """Connected components via alternating large-star/small-star
    (Kiveris SoCC'14) over the n-gram near-dup pair graph — the
    adversarial-graph-resilient CC variant; same (id, component)
    contract (and same recursive-CTE oracle) as ext_dedup_clusters."""
    from uofi_payroll_etl_main_demo_spark.ext.clusters import (
        connected_components_star,
    )

    pairs = ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), k=3, threshold=0.2
    )
    return connected_components_star(pairs).select(
        F.col("id").alias("doc_id"), F.col("comp").alias("component")
    )


def q_pq_topk(spark, sf_dir):
    """Product-quantization ANN top-k, EXACTNESS form: a rerank margin
    ≥ corpus size means the ADC scan prunes nothing and the exact
    rerank (same HOF cosine as the brute-force baseline) returns the
    true top-k; oracle = the exact SQL top-k. Round-10 fold of the
    former rows-only candidates=100 row into its full-margin twin
    (ext_pq_topk_full, r9-green) — the bounded-margin recall/latency
    trade stays pinned in tests and measured in scripts/
    ann_batch_probe.py / pq_drift_probe.py."""
    from uofi_payroll_etl_main_demo_spark.ext.similarity import pq_top_k

    out = pq_top_k(
        _t(spark, sf_dir, "embeddings"), QUERY_VEC, k=10,
        candidates=1_000_000,
    )
    return out.select("vec_id", F.round("score", 6).alias("score"))


def _sql_lsh_topk(
    k: int = 10, dim: int = 64, n_planes: int = 8, seed: int = 42,
    multiprobe_hamming: int = 1,
) -> str:
    """DuckDB twin of ``lsh_bucket_top_k``: the hyperplanes AND the
    query's multi-probe bucket list are deterministic driver-side
    constants, so the approximate candidate set is reproduced exactly."""
    from uofi_payroll_etl_main_demo_spark.ext.similarity import _hyperplanes

    planes = _hyperplanes(dim, n_planes, seed)
    qbits = 0
    for bit, plane in enumerate(planes):
        if sum(float(x) * float(y) for x, y in zip(QUERY_VEC, plane)) >= 0:
            qbits |= 1 << bit
    probe = {qbits}
    if multiprobe_hamming >= 1:
        for bit in range(n_planes):
            probe.add(qbits ^ (1 << bit))
    terms = []
    for bit, plane in enumerate(planes):
        lst = "[" + ", ".join(repr(x) for x in plane) + "]"
        terms.append(
            f"(CASE WHEN list_dot_product(v, {lst}) >= 0 "
            f"THEN {1 << bit} ELSE 0 END)"
        )
    bucket = " + ".join(terms)
    probes = ", ".join(str(p) for p in sorted(probe))
    return f"""
WITH b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
             {bucket} AS bucket FROM embeddings)
SELECT vec_id, round(list_cosine_similarity(v,
         CAST({_QV_SQL} AS DOUBLE[])), 6) AS score
FROM b WHERE bucket IN ({probes})
ORDER BY score DESC, vec_id LIMIT {k}
"""


REGISTRY["ext_decontaminate"] = (q_decontaminate, _sql_decontaminate())
REGISTRY["ext_repetition_stats"] = (q_repetition_stats, _sql_repetition())
REGISTRY["ext_pii_redact"] = (q_pii_redact, _sql_pii_redact())
REGISTRY["ext_tfidf_top_terms"] = (q_tfidf_top_terms, _sql_tfidf())
REGISTRY["ext_bm25_search"] = (q_bm25_search, _sql_bm25())
REGISTRY["ext_knn_join"] = (q_knn_join, _sql_knn_join())
REGISTRY["ext_dedup_clusters_star"] = (
    q_dedup_clusters_star,
    REGISTRY["ext_dedup_clusters"][1],  # same contract, same oracle
)
REGISTRY["ext_pq_topk"] = (q_pq_topk, _sql_topk_cosine())

# Oracle upgrades for formerly rows-only similarity queries:
# - fingerprints: now md5-based (engine-portable values)
# - lsh_topk: deterministic buckets + probe list reproduced in SQL
# - gemm / sq_rerank: pinned equal to the exact baseline (tests), so
#   the exact top-k SQL is their oracle; verified empirically at both
#   sf0.01 and sf0.1 (BLAS/quantized stage ordering differences vanish
#   under round-6 / the candidate margin)
REGISTRY["ext_fingerprints"] = (
    q_fingerprints,
    "SELECT doc_id, CAST(('0x' || substr(md5(regexp_replace(lower(trim(text)),"
    " '" + _WS_CLASS + "+', ' ', 'g')), 1, 15)) AS BIGINT) AS fingerprint"
    " FROM documents",
)
REGISTRY["ext_lsh_topk"] = (q_lsh_topk, _sql_lsh_topk())
REGISTRY["ext_topk_cosine_gemm"] = (q_topk_cosine_gemm, _sql_topk_cosine())
REGISTRY["ext_sq_rerank_topk"] = (q_sq_rerank_topk, _sql_topk_cosine())


def _sql_multimodal_features() -> str:
    """Closed-form oracle for the synthetic-media feature query.

    Every feature the Spark query emits is recomputed ARITHMETICALLY
    from the same generation parameters (ext/multimodal.py):

    - stub rows: payload byte j of media i is (i*31 + j*7) % 251, so
      byte mean/std are grouped aggregates over a generated series;
    - audio rows: the decoded sample is the int16 TRUNCATION of
      0.5*sin((2*pi*440*(1+(i//2)%8)) * (j/8000)) scaled by 32767 —
      DuckDB trunc() matches numpy's float->int16 cast (toward zero)
      and both engines evaluate sin() on the identical double argument
      (grouping mirrored exactly), so RMS and zero-crossing rate agree
      far inside round-6;
    - image rows: stripe channel means are exact rationals
      (mean_r = 200*(h/2)/h = 100, mean_b = (100+(i%5)*20)/2).
    """
    return """
WITH stub_bytes AS (
  SELECT t.i AS i, CAST((t.i*31 + u.j*7) % 251 AS DOUBLE) AS b
  FROM range(0, 64) t(i) CROSS JOIN range(0, 256) u(j)
), stub AS (
  SELECT i AS media_id, 'stub' AS kind,
         round(avg(b), 6) AS f1, round(stddev_pop(b), 6) AS f2
  FROM stub_bytes GROUP BY i
), audio_samples AS (
  SELECT t.i AS i, u.j AS j,
         CAST(trunc((0.5*sin(((2*pi())*(440.0*(1+((t.i//2)%8))))
                             * (u.j/8000.0)))*32767.0) AS INTEGER) AS s
  FROM range(0, 32, 2) t(i) CROSS JOIN range(0, 2000) u(j)
), audio_lag AS (
  SELECT i, s, lag(s) OVER (PARTITION BY i ORDER BY j) AS ls
  FROM audio_samples
), audio AS (
  SELECT i AS media_id, 'audio' AS kind,
         round(sqrt(avg((s/32767.0)*(s/32767.0))), 6) AS f1,
         round(avg(CASE WHEN ls IS NULL THEN NULL
                        WHEN (s < 0) != (ls < 0) THEN 1.0
                        ELSE 0.0 END), 6) AS f2
  FROM audio_lag GROUP BY i
), image AS (
  SELECT t.i AS media_id, 'image' AS kind,
         round(100.0, 6) AS f1,
         round(50.0 + (t.i % 5) * 10.0, 6) AS f2
  FROM range(1, 32, 2) t(i)
)
SELECT * FROM stub
UNION ALL SELECT * FROM audio
UNION ALL SELECT * FROM image
"""


REGISTRY["ext_multimodal_features"] = (
    q_multimodal_features,
    _sql_multimodal_features(),
)


def q_audio_energy_profile(spark, sf_dir):
    """Multimodal: REAL PCM-WAV decode → per-25ms-window RMS energy
    profile (the VAD/silence front-end of audio curation) via
    mapInPandas over the deterministic sine corpus. Full value oracle:
    the int16-truncated sine samples have a closed form, so DuckDB
    recomputes every window's RMS arithmetically."""
    from uofi_payroll_etl_main_demo_spark.ext.multimodal import (
        audio_energy_profile,
        synthetic_av_media,
    )

    av = synthetic_av_media(spark, n=32)
    out = audio_energy_profile(
        av.filter(F.col("meta.mime") == "audio/wav"), window_ms=25
    )
    return out.select(
        "media_id",
        F.col("win_idx").cast("bigint").alias("win_idx"),
        F.col("n_samples").cast("bigint").alias("n_samples"),
        F.round("rms", 6).alias("rms"),
    )


def _sql_audio_energy_profile(window_ms: int = 25) -> str:
    """Same generation arithmetic as ``_sql_multimodal_features``'s
    audio CTE, grouped by fixed-length sample windows (8000 Hz ·
    25 ms = 200 samples per window, 10 windows per 2000-sample tone)."""
    win = 8000 * window_ms // 1000
    return f"""
WITH audio_samples AS (
  SELECT t.i AS media_id, u.j AS j,
         CAST(trunc((0.5*sin(((2*pi())*(440.0*(1+((t.i//2)%8))))
                             * (u.j/8000.0)))*32767.0) AS INTEGER) AS s
  FROM range(0, 32, 2) t(i) CROSS JOIN range(0, 2000) u(j)
)
SELECT media_id, CAST(j // {win} AS BIGINT) AS win_idx,
       CAST(count(*) AS BIGINT) AS n_samples,
       round(sqrt(avg((s/32767.0)*(s/32767.0))), 6) AS rms
FROM audio_samples
GROUP BY media_id, j // {win}
"""


REGISTRY["ext_audio_energy_profile"] = (
    q_audio_energy_profile,
    _sql_audio_energy_profile(),
)


def q_image_tile_means(spark, sf_dir):
    """Multimodal: REAL P6-PPM decode → 4×4 grid-tile grayscale means
    (the patchwise resize/feature primitive) via mapInPandas over the
    striped synthetic images. Full value oracle: stripes are uniform
    within each tile band, so every mean has a closed form."""
    from uofi_payroll_etl_main_demo_spark.ext.multimodal import (
        image_tile_means,
        synthetic_av_media,
    )

    av = synthetic_av_media(spark, n=32)
    out = image_tile_means(
        av.filter(F.col("meta.modality") == "image"), grid=4
    )
    return out.select(
        "media_id",
        F.col("tile_r").cast("bigint").alias("tile_r"),
        F.col("tile_c").cast("bigint").alias("tile_c"),
        F.round("mean_gray", 6).alias("mean_gray"),
    )


def _sql_image_tile_means() -> str:
    """Striped 16×12 PPMs: rows 0–5 are (200,0,0), rows 6–11 are
    (0,0,100+(i%5)*20); 4 row-bands of 3 rows each → tile bands 0–1 are
    uniformly red-top gray (200/3), bands 2–3 uniformly blue-bottom
    gray (blue/3)."""
    return """
SELECT t.i AS media_id, r.r AS tile_r, c.c AS tile_c,
       round(CASE WHEN r.r < 2 THEN 200.0/3
                  ELSE (100 + (t.i % 5) * 20) / 3.0 END, 6) AS mean_gray
FROM range(1, 32, 2) t(i)
CROSS JOIN range(0, 4) r(r) CROSS JOIN range(0, 4) c(c)
"""


REGISTRY["ext_image_tile_means"] = (
    q_image_tile_means,
    _sql_image_tile_means(),
)


def q_leakage_split(spark, sf_dir):
    """Cluster-aware train/eval split: near-dup clusters (iterative CC
    over the ngram pair graph) land whole on one side of the boundary;
    split decision is the engine-portable md5 bucket of the cluster
    representative, so the DuckDB oracle reproduces the exact
    assignment row-for-row."""
    from uofi_payroll_etl_main_demo_spark.ext.splits import (
        cluster_aware_split,
    )

    docs = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, k=3, threshold=0.2)
    return cluster_aware_split(docs, pairs, eval_pct=10)


def _sql_leakage_split(eval_pct: int = 10) -> str:
    """Recursive-CTE components (as in _sql_dedup_clusters) + the md5
    bucket trick from samp_hash_sample, keyed on the cluster rep."""
    return f"""
WITH RECURSIVE pairs AS ({_sql_ngram_jaccard()}),
edges AS (
  SELECT id_a AS s, id_b AS d FROM pairs
  UNION
  SELECT id_b AS s, id_a AS d FROM pairs
),
reach(src, node) AS (
  SELECT s, s FROM edges
  UNION
  SELECT r.src, e.d FROM reach r JOIN edges e ON r.node = e.s
),
comp AS (SELECT src, min(node) AS rep FROM reach GROUP BY src)
SELECT d.doc_id,
       COALESCE(c.rep, d.doc_id) AS cluster_rep,
       CASE WHEN ('0x' || substr(md5(CAST(COALESCE(c.rep, d.doc_id)
              AS VARCHAR)), 1, 8))::BIGINT % 100 < {eval_pct}
            THEN 'eval' ELSE 'train' END AS split
FROM documents d LEFT JOIN comp c ON d.doc_id = c.src
"""


def q_leakage_split3(spark, sf_dir):
    """Three-way leakage-safe split (train/val/test): one md5 bucket of
    the cluster representative partitioned into three ranges — splits
    disjoint and exhaustive by construction, clusters never cut
    (ext/splits.py cluster_aware_split3)."""
    from uofi_payroll_etl_main_demo_spark.ext.splits import (
        cluster_aware_split3,
    )

    docs = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, k=3, threshold=0.2)
    return cluster_aware_split3(docs, pairs, val_pct=5, test_pct=5)


def _sql_leakage_split3(val_pct: int = 5, test_pct: int = 5) -> str:
    return f"""
WITH RECURSIVE pairs AS ({_sql_ngram_jaccard()}),
edges AS (
  SELECT id_a AS s, id_b AS d FROM pairs
  UNION
  SELECT id_b AS s, id_a AS d FROM pairs
),
reach(src, node) AS (
  SELECT s, s FROM edges
  UNION
  SELECT r.src, e.d FROM reach r JOIN edges e ON r.node = e.s
),
comp AS (SELECT src, min(node) AS rep FROM reach GROUP BY src),
b AS (
  SELECT d.doc_id,
         COALESCE(c.rep, d.doc_id) AS cluster_rep,
         ('0x' || substr(md5(CAST(COALESCE(c.rep, d.doc_id)
            AS VARCHAR)), 1, 8))::BIGINT % 100 AS bk
  FROM documents d LEFT JOIN comp c ON d.doc_id = c.src)
SELECT doc_id, cluster_rep,
       CASE WHEN bk < {val_pct} THEN 'val'
            WHEN bk < {val_pct + test_pct} THEN 'test'
            ELSE 'train' END AS split
FROM b
"""


def q_pagerank(spark, sf_dir):
    """Integer micro-point PageRank (6 fixed sweeps, damping 0.85) over
    the symmetrized supplier–part supply graph from lineitem; top-100
    nodes by rank. Integer contributions make the iteration exactly
    reproducible in the unrolled-CTE oracle — see ext/pagerank.py."""
    from uofi_payroll_etl_main_demo_spark.ext.pagerank import pagerank

    li = _t(spark, sf_dir, "lineitem")
    base = li.select(
        (F.col("l_suppkey") * 2).alias("src"),
        (F.col("l_partkey") * 2 + 1).alias("dst"),
    ).distinct()
    edges = base.unionByName(
        base.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    # base is distinct and src/dst parities are disjoint, so the
    # symmetrized union is already duplicate-free
    pr = pagerank(edges, iterations=6, assume_distinct=True)
    return (
        pr.orderBy(F.desc("pr"), F.asc("node"))
        .limit(100)
        .select(
            F.when(F.col("node") % 2 == 0, F.lit("supplier"))
            .otherwise(F.lit("part"))
            .alias("kind"),
            F.expr("node div 2").alias("entity_id"),
            F.col("pr").alias("rank_e9"),
        )
    )


def _sql_pagerank(iterations: int = 6, damping_pct: int = 85) -> str:
    """Unrolled power iteration: one CTE per sweep, all-integer
    arithmetic (BIGINT micro-points, // division) — bit-identical to
    the Spark loop at any fixed iteration count."""
    teleport = (100 - damping_pct) * 1_000_000_000 // 100
    ctes = [
        "base AS (SELECT DISTINCT l_suppkey * 2 AS s, "
        "l_partkey * 2 + 1 AS d FROM lineitem)",
        "edges AS (SELECT s, d FROM base UNION ALL SELECT d, s FROM base)",
        "deg AS (SELECT s, count(*) AS outdeg FROM edges GROUP BY s)",
        "r0 AS (SELECT s AS node, CAST(1000000000 AS BIGINT) AS pr FROM deg)",
    ]
    for i in range(1, iterations + 1):
        ctes.append(
            f"""r{i} AS (
  SELECT dg.s AS node,
         CAST({teleport} + ({damping_pct} * COALESCE(inc.t, 0)) // 100
              AS BIGINT) AS pr
  FROM deg dg LEFT JOIN (
    SELECT e.d AS nd, CAST(sum(r.pr // d2.outdeg) AS BIGINT) AS t
    FROM edges e JOIN r{i - 1} r ON e.s = r.node
    JOIN deg d2 ON d2.s = e.s
    GROUP BY e.d) inc ON dg.s = inc.nd)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT CASE WHEN node % 2 = 0 THEN 'supplier' ELSE 'part' END AS kind,
       node // 2 AS entity_id, pr AS rank_e9
FROM r{iterations} ORDER BY pr DESC, node LIMIT 100
"""
    )


REGISTRY["ext_leakage_split"] = (q_leakage_split, _sql_leakage_split())
REGISTRY["ext_leakage_split3"] = (q_leakage_split3, _sql_leakage_split3())
REGISTRY["ext_pagerank"] = (q_pagerank, _sql_pagerank())


def q_session_paths(spark, sf_dir):
    """Product analytics: top-10 session JOURNEY PATHS — gap-based
    sessionization (the batch twin of the streaming sessionizer's
    semantics: 30-minute inactivity closes a session), each session
    reduced to its first three event types in time order, paths
    counted. Two window passes + one agg; paths are strings like
    'view>click>error'."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = 30 * 60 * 1_000_000
    new_sess = (
        F.unix_micros("ts") - F.lag(F.unix_micros("ts"), 1, 0).over(w)
        > gap_us
    ).cast("int")
    sess = F.sum(new_sess).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    rn = F.row_number().over(
        Window.partitionBy("user_id", "__sess").orderBy("ts", "event_id")
    )
    first3 = (
        ev.withColumn("__sess", sess)
        .withColumn("__rn", rn)
        .filter(F.col("__rn") <= 3)
    )
    paths = first3.groupBy("user_id", "__sess").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("__rn", "event_type"))
                ),
                lambda s: s["event_type"],
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(10)
    )


def _sql_session_paths(top_n: int = 10) -> str:
    return f"""
WITH s AS (
  SELECT user_id, event_id, ts, event_type,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts), 1, 0)
                OVER (PARTITION BY user_id ORDER BY ts, event_id)
              > {30 * 60 * 1_000_000} THEN 1 ELSE 0 END AS ns
  FROM events),
sess AS (
  SELECT user_id, event_id, ts, event_type,
         sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS sid
  FROM s),
rnk AS (
  SELECT user_id, sid, event_type,
         row_number() OVER (PARTITION BY user_id, sid
                            ORDER BY ts, event_id) AS rn
  FROM sess),
p AS (
  SELECT user_id, sid,
         string_agg(event_type, '>' ORDER BY rn) AS path
  FROM rnk WHERE rn <= 3 GROUP BY user_id, sid)
SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
FROM p GROUP BY path
ORDER BY n_sessions DESC, path LIMIT {top_n}
"""


REGISTRY["ext_session_paths"] = (q_session_paths, _sql_session_paths())


def q_label_centroids(spark, sf_dir):
    """Per-label embedding centroids (the class-centroid table that
    seeds centroid classifiers / semantic-dedup buckets): posexplode →
    partial-aggregated per-(label, dim) means. Long format (label,
    pos, mean) — scalar round-6 doubles compare robustly across
    engines where stringified float arrays would not."""
    emb = _t(spark, sf_dir, "embeddings")
    # Means go through DECIMAL(18,6) sums of round-6 components —
    # decimal addition is exact and associative, so the mean is
    # partition-order invariant (double summation can flip a round-6
    # boundary by an ulp across engines/partitionings; same discipline
    # as ext_embedding_norm_stats / ext_source_quality_panel).
    return (
        emb.select(
            "label", F.posexplode(F.col("embedding").cast("array<double>"))
        )
        .groupBy("label", F.col("pos"))
        .agg(
            F.round(
                F.sum(
                    F.round("col", 6).cast("decimal(18,6)")
                ).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_val")
        )
        .select("label", (F.col("pos") + 1).alias("pos"), "mean_val")
    )


def _sql_label_centroids(dim: int = 64) -> str:
    return f"""
SELECT label, r.i AS pos,
       round(CAST(sum(CAST(round(CAST(embedding[r.i] AS DOUBLE), 6)
                           AS DECIMAL(18,6))) AS DOUBLE)
             / count(*), 6) AS mean_val
FROM embeddings CROSS JOIN range(1, {dim + 1}) r(i)
GROUP BY label, r.i
"""


REGISTRY["ext_label_centroids"] = (q_label_centroids, _sql_label_centroids())


def q_pagerank_dangling(spark, sf_dir):
    """Integer PageRank WITH dangling-mass redistribution (4 sweeps,
    damping 0.85) over the DIRECTED supplier→part graph — parts have
    no outbound edges, so every part is a dangling node and its rank
    mass is redistributed uniformly each sweep (one driver scalar per
    sweep, ext/pagerank.py). Top-100 nodes by rank."""
    from uofi_payroll_etl_main_demo_spark.ext.pagerank import pagerank

    li = _t(spark, sf_dir, "lineitem")
    edges = li.select(
        (F.col("l_suppkey") * 2).alias("src"),
        (F.col("l_partkey") * 2 + 1).alias("dst"),
    ).distinct()
    pr = pagerank(edges, iterations=4, assume_distinct=True, dangling=True)
    return (
        pr.orderBy(F.desc("pr"), F.asc("node"))
        .limit(100)
        .select(
            F.when(F.col("node") % 2 == 0, F.lit("supplier"))
            .otherwise(F.lit("part"))
            .alias("kind"),
            F.expr("node div 2").alias("entity_id"),
            F.col("pr").alias("rank_e9"),
        )
    )


def _sql_pagerank_dangling(iterations: int = 4, damping_pct: int = 85) -> str:
    """Unrolled dangling-mass power iteration: per sweep, one scalar
    CTE (the dangling mass share, integer-divided by the node count)
    plus the rank CTE — all-integer arithmetic, bit-identical to the
    Spark loop's driver-scalar redistribution."""
    teleport = (100 - damping_pct) * 1_000_000_000 // 100
    ctes = [
        "base AS (SELECT DISTINCT l_suppkey * 2 AS s, "
        "l_partkey * 2 + 1 AS d FROM lineitem)",
        "deg AS (SELECT s, count(*) AS outdeg FROM base GROUP BY s)",
        "nodes AS (SELECT s AS node FROM base UNION SELECT d FROM base)",
        "nn AS (SELECT count(*) AS n FROM nodes)",
        "r0 AS (SELECT node, CAST(1000000000 AS BIGINT) AS pr FROM nodes)",
    ]
    for i in range(1, iterations + 1):
        ctes.append(
            f"""sh{i} AS (
  SELECT COALESCE(sum(r.pr), 0) // (SELECT n FROM nn) AS share
  FROM r{i - 1} r WHERE r.node NOT IN (SELECT s FROM deg))"""
        )
        ctes.append(
            f"""r{i} AS (
  SELECT nd.node,
         CAST({teleport} + ({damping_pct} * (COALESCE(inc.t, 0)
              + (SELECT share FROM sh{i}))) // 100 AS BIGINT) AS pr
  FROM nodes nd LEFT JOIN (
    SELECT e.d AS nd2, CAST(sum(r.pr // dg.outdeg) AS BIGINT) AS t
    FROM base e JOIN r{i - 1} r ON e.s = r.node
    JOIN deg dg ON dg.s = e.s
    GROUP BY e.d) inc ON nd.node = inc.nd2)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT CASE WHEN node % 2 = 0 THEN 'supplier' ELSE 'part' END AS kind,
       node // 2 AS entity_id, pr AS rank_e9
FROM r{iterations} ORDER BY pr DESC, node LIMIT 100
"""
    )


REGISTRY["ext_pagerank_dangling"] = (
    q_pagerank_dangling,
    _sql_pagerank_dangling(),
)


def q_pack_sequences(spark, sf_dir):
    """Greedy first-fit sequence packing of documents into 512-token
    context windows, per source stream — the training-batch assembly
    op. ``applyInPandas`` runs the inherently-sequential greedy scan
    per group; groups distribute. The recursive-CTE oracle walks the
    identical (source, doc_id) order, so bin assignments match
    row-for-row."""
    from uofi_payroll_etl_main_demo_spark.ext.packing import pack_greedy
    from uofi_payroll_etl_main_demo_spark.functions.text import token_count

    d = _t(spark, sf_dir, "documents").select(
        "source", "doc_id", token_count("text").alias("n_tokens")
    )
    return pack_greedy(
        d, capacity=512, group_col="source", order_col="doc_id",
        size_col="n_tokens",
    )


def _sql_pack_sequences(capacity: int = 512) -> str:
    """Recursive CTE twin of the greedy first-fit scan: one recursion
    step per row in (source, doc_id) order, carrying (bin, fill)."""
    return f"""
WITH RECURSIVE ordered AS (
  SELECT source, doc_id,
         CAST(CASE WHEN trim(text) = '' THEN 0
              ELSE len({_TOKS}) END AS BIGINT) AS n_tokens,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM documents
),
pack(source, rn, doc_id, n_tokens, seq_id, off, used) AS (
  SELECT source, rn, doc_id, n_tokens, CAST(0 AS BIGINT),
         CAST(0 AS BIGINT), n_tokens
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT o.source, o.rn, o.doc_id, o.n_tokens,
         CASE WHEN p.used > 0 AND p.used + o.n_tokens > {capacity}
              THEN p.seq_id + 1 ELSE p.seq_id END,
         CASE WHEN p.used > 0 AND p.used + o.n_tokens > {capacity}
              THEN 0 ELSE p.used END,
         CASE WHEN p.used > 0 AND p.used + o.n_tokens > {capacity}
              THEN o.n_tokens ELSE p.used + o.n_tokens END
  FROM pack p JOIN ordered o ON o.source = p.source AND o.rn = p.rn + 1
)
SELECT source, doc_id, n_tokens, seq_id, off AS "offset" FROM pack
"""


def q_shard_assign(spark, sf_dir):
    """Deterministic global shuffle: md5-bucket shard + reproducible
    in-shard position for every document — the training-loader layout
    op. Engine-portable hashing, so the oracle reproduces shard AND
    position exactly."""
    from uofi_payroll_etl_main_demo_spark.ext.packing import (
        shard_assignment,
    )

    return shard_assignment(
        _t(spark, sf_dir, "documents"), id_col="doc_id", n_shards=16
    )


def _sql_shard_assign(n_shards: int = 16) -> str:
    return f"""
WITH h AS (
  SELECT doc_id,
         ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT AS h
  FROM documents
)
SELECT doc_id, CAST(h % {n_shards} AS INTEGER) AS shard,
       row_number() OVER (PARTITION BY h % {n_shards} ORDER BY h, doc_id)
         - 1 AS shard_pos
FROM h
"""


REGISTRY["ext_pack_sequences"] = (q_pack_sequences, _sql_pack_sequences())
REGISTRY["ext_shard_assign"] = (q_shard_assign, _sql_shard_assign())


def q_packing_efficiency(spark, sf_dir):
    """Packing-efficiency report on the greedy first-fit layout: per
    source, sequence count, packed token total, and integer-ppm fill
    rate (tokens / (n_seqs × capacity)) — the utilization metric that
    decides context-window capacity and bucketing policy. Composes the
    already-oracle-checked packer; fill is integer arithmetic, so the
    panel is engine-exact."""
    from uofi_payroll_etl_main_demo_spark.ext.packing import pack_greedy
    from uofi_payroll_etl_main_demo_spark.functions.text import token_count

    cap = 512
    d = _t(spark, sf_dir, "documents").select(
        "source", "doc_id", token_count("text").alias("n_tokens")
    )
    packed = pack_greedy(
        d, capacity=cap, group_col="source", order_col="doc_id",
        size_col="n_tokens",
    )
    n_seqs = F.count_distinct("seq_id")
    total = F.sum("n_tokens")
    return packed.groupBy("source").agg(
        n_seqs.cast("bigint").alias("n_seqs"),
        total.cast("bigint").alias("total_tokens"),
        F.expr(f"CAST(sum(n_tokens) * 1000000 div "
               f"(count(distinct seq_id) * {cap}) AS BIGINT)")
        .alias("fill_ppm"),
    )


def _sql_packing_efficiency(capacity: int = 512) -> str:
    return f"""
WITH packed AS ({_sql_pack_sequences(capacity)})
SELECT source,
       CAST(count(DISTINCT seq_id) AS BIGINT) AS n_seqs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(sum(n_tokens) * 1000000 //
            (count(DISTINCT seq_id) * {capacity}) AS BIGINT) AS fill_ppm
FROM packed GROUP BY source
"""


REGISTRY["ext_packing_efficiency"] = (
    q_packing_efficiency,
    _sql_packing_efficiency(),
)


def q_bloom_decontaminate(spark, sf_dir):
    """Sketch-prefiltered decontamination: build a DETERMINISTIC Bloom
    filter over the eval set's 5-gram shingles (ext/sketches.py — one
    bit_or groupBy, constant-size collect, inlined as a literal), test
    every training shingle against it as a narrow map, and send ONLY
    bloom-positives into the exact semi-join — the production shape
    when the eval set is too hot to join against every shingle of a
    100 TB corpus. Because the Bloom bit pattern is md5-derived, the
    oracle reproduces every membership answer INCLUDING false
    positives, so the report (per-doc shingles / bloom hits / exact
    hits / flag) is value-exact, and bloom ≥ exact by construction."""
    from uofi_payroll_etl_main_demo_spark.ext.sketches import (
        bloom_build_words,
        bloom_might_contain,
    )
    from uofi_payroll_etl_main_demo_spark.functions.text import (
        shingles_from_tokens,
        tokenize_ws,
    )

    m_bits, k = 65536, 3
    d = _t(spark, sf_dir, "documents")

    def doc_shingles(df):
        tokd = df.select(
            F.col("doc_id"), tokenize_ws("text").alias("__toks")
        )
        return tokd.select(
            "doc_id",
            F.explode(shingles_from_tokens(F.col("__toks"), 5)).alias("s"),
        )

    ev_sh = doc_shingles(d.filter(F.col("doc_id") % 20 == 0)).select("s")
    words = bloom_build_words(ev_sh, "s", m_bits, k)
    ev_set = ev_sh.distinct()
    tr_sh = doc_shingles(d.filter(F.col("doc_id") % 20 != 0))
    flagged = tr_sh.withColumn(
        "__bloom", bloom_might_contain(words, F.col("s"), m_bits, k)
    )
    bloom_pos = flagged.filter(F.col("__bloom"))
    exact = bloom_pos.join(ev_set, "s", "left_semi").groupBy(
        "doc_id"
    ).agg(F.count(F.lit(1)).alias("__ne"))
    counts = flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
        F.sum(F.when(F.col("__bloom"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_bloom_hits"),
    )
    return counts.join(exact, "doc_id", "left").select(
        "doc_id",
        "n_shingles",
        "n_bloom_hits",
        F.coalesce("__ne", F.lit(0)).cast("bigint").alias("n_exact_hits"),
        (F.coalesce("__ne", F.lit(0)) > 0).alias("contaminated"),
    )


def _sql_bloom_decontaminate(m_bits: int = 65536, k: int = 3) -> str:
    return f"""
WITH t AS (SELECT doc_id, CASE WHEN trim(text) = '' THEN []
             ELSE {_TOKS} END AS toks FROM documents),
sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           range(1, len(toks) - 5 + 2),
           i -> array_to_string(toks[i:i + 4], ' ')))) AS s
  FROM t WHERE len(toks) >= 5
),
hx AS (
  SELECT doc_id, s,
         ('0x' || substr(md5(s), 1, 13))::BIGINT AS h1,
         ('0x' || substr(md5(s), 14, 13))::BIGINT AS h2
  FROM sh
),
evpos AS (
  SELECT DISTINCT ((h1 + r.i * h2) % {m_bits}) AS pos
  FROM hx, range(0, {k}) r(i) WHERE doc_id % 20 = 0
),
wrd AS (
  SELECT CAST(pos // 64 AS INT) AS w,
         bit_or(CASE WHEN pos % 64 = 63 THEN -9223372036854775808
                ELSE (1::BIGINT << CAST(pos % 64 AS INT)) END) AS bits
  FROM evpos GROUP BY 1
),
evset AS (SELECT DISTINCT s FROM sh WHERE doc_id % 20 = 0),
tr AS (SELECT doc_id, s, h1, h2 FROM hx WHERE doc_id % 20 != 0),
trpos AS (
  SELECT tr.doc_id, tr.s, ((tr.h1 + r.i * tr.h2) % {m_bits}) AS pos
  FROM tr, range(0, {k}) r(i)
),
trbit AS (
  SELECT p.doc_id, p.s,
         min(coalesce((wrd.bits >> CAST(p.pos % 64 AS INT)) & 1, 0))
           AS allset
  FROM trpos p
  LEFT JOIN wrd ON wrd.w = CAST(p.pos // 64 AS INT)
  GROUP BY p.doc_id, p.s
),
perdoc AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
         CAST(sum(allset) AS BIGINT) AS n_bloom_hits
  FROM trbit GROUP BY doc_id
),
ex AS (
  SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_exact_hits
  FROM trbit b JOIN evset e ON b.s = e.s
  WHERE b.allset = 1
  GROUP BY b.doc_id
)
SELECT p.doc_id, p.n_shingles, p.n_bloom_hits,
       coalesce(ex.n_exact_hits, 0) AS n_exact_hits,
       coalesce(ex.n_exact_hits, 0) > 0 AS contaminated
FROM perdoc p LEFT JOIN ex USING (doc_id)
"""


REGISTRY["ext_bloom_decontaminate"] = (
    q_bloom_decontaminate,
    _sql_bloom_decontaminate(),
)


def _rev_expr():
    """Decimal-exact discounted revenue: extprice × (1 − discount),
    summed later as DECIMAL(18,4) — ONE definition shared by the Q3/Q5
    composites so a precision change cannot diverge between them (the
    SQL twin is _SQL_REV)."""
    return (
        F.col("l_extendedprice").cast(_DEC)
        * (F.lit(1).cast(_DEC) - F.col("l_discount").cast(_DEC))
    ).cast("decimal(18,4)")


_SQL_REV = (
    "CAST(CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"
    " AS DECIMAL(18,4))"
)


def q_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape on the fixture schema: segment-filtered customers
    × date-bounded orders × post-date lineitems → top-10 unshipped
    orders by decimal-exact revenue. Plan: customer dim broadcasts
    into orders, the orders side broadcasts into lineitem (both sides
    of every join are key-pruned before the join), one partial-agg
    groupBy, distributed TakeOrdered for the top-k — no global sort,
    no fact-side shuffle for enrichment."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    li = _t(spark, sf_dir, "lineitem")
    cust = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    orders = (
        o.filter(F.col("o_orderdate") < F.lit("1998-01-01"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
    )
    rev = _rev_expr()
    return (
        li.filter(F.col("l_shipdate") > F.lit("1998-01-01"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
            F.round("revenue", 4).alias("revenue"),
        )
    )


_SQL_SHIPPING_PRIORITY = f"""
SELECT l_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_orderpriority,
       round(CAST(sum({_SQL_REV}) AS DOUBLE), 4) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY sum({_SQL_REV}) DESC, l_orderkey
LIMIT 10
"""


REGISTRY["rel_shipping_priority"] = (
    q_shipping_priority,
    _SQL_SHIPPING_PRIORITY,
)


def q_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 shape: six-way join (region-filtered nations →
    customers ⋈ orders ⋈ lineitem ⋈ supplier with the LOCAL-supplier
    constraint c_nationkey = s_nationkey) → per-nation decimal-exact
    revenue. True dimensions (region/nation/supplier/customer chains)
    broadcast under the 10 MB threshold; the orders-side chain grows
    with sf, so past toy scale the fact⋈orders join is a sort-merge
    on o_orderkey — the 100 TB-correct shape. (Through r10 the 64 MB
    threshold made Spark driver-broadcast LINEITEM ITSELF at sf1 —
    the r11 decade flagged the 4× ratio drift and the session posture
    was fixed; see session.py.)"""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    nat = (
        n.join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .select("n_nationkey", "n_name")
    )
    cust = c.join(
        nat, F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey", F.col("c_nationkey").alias("__cnat"), "n_name")
    orders = o.filter(
        F.col("o_orderdate").between(
            F.lit("1996-01-01"), F.lit("1996-12-31")
        )
    ).join(cust, F.col("o_custkey") == F.col("c_custkey")).select(
        "o_orderkey", "__cnat", "n_name"
    )
    supp = s.select("s_suppkey", F.col("s_nationkey").alias("__snat"))
    rev = _rev_expr()
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("__cnat") == F.col("__snat"))
        .groupBy("n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .select("n_name", F.round("revenue", 4).alias("revenue"))
    )


_SQL_LOCAL_SUPPLIER_VOLUME = f"""
SELECT n_name,
       round(CAST(sum({_SQL_REV}) AS DOUBLE), 4) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND c_nationkey = s_nationkey
  AND o_orderdate BETWEEN TIMESTAMP '1996-01-01'
      AND TIMESTAMP '1996-12-31'
GROUP BY n_name
"""


REGISTRY["rel_local_supplier_volume"] = (
    q_local_supplier_volume,
    _SQL_LOCAL_SUPPLIER_VOLUME,
)


def q_volume_shipping(spark, sf_dir):
    """TPC-H Q7 shape: cross-nation trade volume — revenue shipped
    from supplier-nation to customer-nation per year, for one ordered
    nation pair in both directions. Both nation dims broadcast into
    supplier/customer, those broadcast into the fact chain; the fact
    table's only shuffle is the final (supp_nation, cust_nation,
    year) partial agg."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    n1, n2 = "NATION_0", "NATION_1"
    supp = s.join(
        n.select(F.col("n_nationkey").alias("__sk"), F.col("n_name").alias("supp_nation")),
        F.col("s_nationkey") == F.col("__sk"),
    ).select("s_suppkey", "supp_nation")
    cust = c.join(
        n.select(F.col("n_nationkey").alias("__ck"), F.col("n_name").alias("cust_nation")),
        F.col("c_nationkey") == F.col("__ck"),
    ).select("c_custkey", "cust_nation")
    orders = o.join(cust, F.col("o_custkey") == F.col("c_custkey")).select(
        "o_orderkey", "cust_nation"
    )
    rev = _rev_expr()
    return (
        li.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            ((F.col("supp_nation") == n1) & (F.col("cust_nation") == n2))
            | ((F.col("supp_nation") == n2) & (F.col("cust_nation") == n1))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .select(
            "supp_nation",
            "cust_nation",
            "l_year",
            F.round("revenue", 4).alias("revenue"),
        )
    )


_SQL_VOLUME_SHIPPING = f"""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INTEGER) AS l_year,
       round(CAST(sum({_SQL_REV}) AS DOUBLE), 4) AS revenue
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE (sn.n_name = 'NATION_0' AND cn.n_name = 'NATION_1')
   OR (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_0')
GROUP BY sn.n_name, cn.n_name, year(l_shipdate)
"""


REGISTRY["rel_volume_shipping"] = (q_volume_shipping, _SQL_VOLUME_SHIPPING)


def q_part_type_revenue(spark, sf_dir):
    """TPC-H Q9 shape on the fixture schema (no partsupp table, so
    revenue stands in for profit): per supplier-nation × year revenue
    over parts whose type contains a token (ECONOMY) — part dim filter pushes to
    the part scan, both dims broadcast, one fact agg."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    parts = p.filter(F.col("p_type").contains("ECONOMY")).select("p_partkey")
    supp = s.join(
        n.select(F.col("n_nationkey").alias("__sk"), F.col("n_name").alias("nation")),
        F.col("s_nationkey") == F.col("__sk"),
    ).select("s_suppkey", "nation")
    rev = _rev_expr()
    return (
        li.join(parts, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(
            "nation", F.year("l_shipdate").cast("int").alias("l_year")
        )
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .select("nation", "l_year", F.round("revenue", 4).alias("revenue"))
    )


_SQL_PART_TYPE_REVENUE = f"""
SELECT n_name AS nation, CAST(year(l_shipdate) AS INTEGER) AS l_year,
       round(CAST(sum({_SQL_REV}) AS DOUBLE), 4) AS revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_type LIKE '%ECONOMY%'
GROUP BY n_name, year(l_shipdate)
"""


REGISTRY["rel_part_type_revenue"] = (
    q_part_type_revenue,
    _SQL_PART_TYPE_REVENUE,
)


def q_returned_item_report(spark, sf_dir):
    """TPC-H Q10 shape: top-20 customers by revenue LOST to returns
    (l_returnflag = 'R') in a date window — the claims/refund report.
    Orders date-filter before the join, customer dim broadcasts, one
    per-customer agg, distributed TakeOrdered top-k."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    orders = o.filter(
        F.col("o_orderdate").between(F.lit("1995-01-01"), F.lit("1995-12-31"))
    ).select("o_orderkey", "o_custkey")
    cust = c.join(
        n.select(F.col("n_nationkey").alias("__nk"), F.col("n_name")),
        F.col("c_nationkey") == F.col("__nk"),
    ).select("c_custkey", "c_name", "c_acctbal", "n_name")
    rev = _rev_expr()
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            F.round(F.col("c_acctbal").cast("double"), 2).alias("c_acctbal"),
            "n_name",
            F.round("revenue", 4).alias("revenue"),
        )
    )


_SQL_RETURNED_ITEM_REPORT = f"""
SELECT c_custkey, c_name,
       round(CAST(c_acctbal AS DOUBLE), 2) AS c_acctbal, n_name,
       round(CAST(sum({_SQL_REV}) AS DOUBLE), 4) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate BETWEEN TIMESTAMP '1995-01-01'
      AND TIMESTAMP '1995-12-31'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY sum({_SQL_REV}) DESC, c_custkey
LIMIT 20
"""


REGISTRY["rel_returned_item_report"] = (
    q_returned_item_report,
    _SQL_RETURNED_ITEM_REPORT,
)


# --------------------------------------------------------------------------
# TPC-H-shape completion block (round 6): the remaining classic OLAP
# query shapes, adapted to the fixture star schema (no partsupp table,
# no l_commitdate/l_receiptdate/l_shipmode — each adaptation is noted
# per query). Together with Q1 (pricing_summary), Q3/Q5/Q7/Q9/Q10
# (rel_shipping_priority .. rel_returned_item_report) this covers every
# TPC-H query shape: scalar subqueries, correlated EXISTS/NOT EXISTS,
# argmin-per-group, two-level aggregation, disjunctive predicate
# pushdown, and having-filtered semi-join chains. Conventions follow
# the module docstring (decimal-exact sums, identical aliases, rounded
# doubles); global scalars use the documented bounded `.first()`
# pattern (ext/curation.py tfidf_top_terms) — ONE driver row, never a
# broadcast nested-loop join, so the registry-wide plan lint holds.
# --------------------------------------------------------------------------


def q_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape: pure scan-filter-aggregate revenue forecast —
    every predicate (ship-year, discount band, quantity cap) pushes to
    the parquet scan, zero joins, one partial-agg reduction to a single
    row. The canonical pushdown probe: at 100 TB this query's cost is
    exactly one column-pruned scan."""
    li = _t(spark, sf_dir, "lineitem")
    disc_rev = (
        F.col("l_extendedprice").cast(_DEC) * F.col("l_discount").cast(_DEC)
    ).cast("decimal(18,4)")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(F.sum(disc_rev).cast("double").alias("revenue"))
        .select(F.round("revenue", 4).alias("revenue"))
    )


_SQL_FORECAST_REVENUE = """
SELECT round(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
       * CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(18,4))) AS DOUBLE),
       4) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


REGISTRY["rel_forecast_revenue"] = (q_forecast_revenue, _SQL_FORECAST_REVENUE)


def q_priority_late_orders(spark, sf_dir):
    """TPC-H Q4 shape (fixture adaptation: no l_commitdate /
    l_receiptdate, so "late" = shipped more than 60 days after the
    order date): count Q1-1996 orders per priority that have at least
    one late lineitem. EXISTS compiles to a LEFT SEMI equi-join with a
    residual date predicate — the fact table is never widened, and the
    per-priority agg runs on the orders side only."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    ords = o.filter(
        F.col("o_orderdate").between(F.lit("1996-01-01"), F.lit("1996-03-31"))
    )
    return (
        ords.join(
            li.select("l_orderkey", "l_shipdate"),
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
            ),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("bigint").alias("order_count"))
    )


_SQL_PRIORITY_LATE_ORDERS = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01'
      AND TIMESTAMP '1996-03-31'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
"""


REGISTRY["rel_priority_late_orders"] = (
    q_priority_late_orders,
    _SQL_PRIORITY_LATE_ORDERS,
)


def q_min_price_supplier(spark, sf_dir):
    """TPC-H Q2 shape (fixture adaptation: no partsupp, so "supply
    cost" = the supplier's average realized unit revenue for the part,
    from lineitem): for each STANDARD part in a size band, the
    cheapest supplier — argmin-per-group with a deterministic suppkey
    tie-break. The part filter prunes before the fact join; the argmin
    is a per-part window over the (part × supplier)-sized agg, never
    over raw lineitems; supplier/nation dims broadcast onto the
    winners. avg_price is exact-decimal-sum / count → identical
    doubles on both engines, so the argmin is engine-portable."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    parts = p.filter(
        (F.col("p_type") == "STANDARD") & F.col("p_size").between(10, 15)
    ).select("p_partkey", "p_brand")
    per = (
        li.join(parts, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_partkey", "p_brand", "l_suppkey")
        .agg(
            F.sum(F.col("l_extendedprice").cast(_DEC)).alias("__sum_price"),
            F.count(F.lit(1)).alias("__n"),
        )
        .withColumn(
            "avg_price",
            F.col("__sum_price").cast("double") / F.col("__n"),
        )
    )
    w = Window.partitionBy("p_partkey").orderBy(
        F.asc("avg_price"), F.asc("l_suppkey")
    )
    picked = (
        per.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("p_partkey", "p_brand", "l_suppkey", "avg_price")
    )
    supp = s.join(
        n.select(F.col("n_nationkey").alias("__nk"), "n_name"),
        F.col("s_nationkey") == F.col("__nk"),
    ).select("s_suppkey", "s_name", "n_name")
    return picked.join(supp, F.col("l_suppkey") == F.col("s_suppkey")).select(
        "p_partkey",
        "p_brand",
        "s_name",
        "n_name",
        F.round("avg_price", 4).alias("avg_price"),
    )


_SQL_MIN_PRICE_SUPPLIER = """
WITH per AS (
  SELECT p_partkey, p_brand, l_suppkey,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
           / count(*) AS avg_price
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_type = 'STANDARD' AND p_size BETWEEN 10 AND 15
  GROUP BY p_partkey, p_brand, l_suppkey
), pick AS (
  SELECT * FROM per
  QUALIFY row_number() OVER (PARTITION BY p_partkey
                             ORDER BY avg_price, l_suppkey) = 1
)
SELECT p_partkey, p_brand, s_name, n_name,
       round(avg_price, 4) AS avg_price
FROM pick
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
"""


REGISTRY["rel_min_price_supplier"] = (
    q_min_price_supplier,
    _SQL_MIN_PRICE_SUPPLIER,
)


def q_market_share(spark, sf_dir):
    """TPC-H Q8 shape: NATION_3's share of ECONOMY-part revenue sold
    to AMERICA customers, per order-year. One pass over the enriched
    fact — the share is a conditional aggregate (sum-if / sum), NOT a
    second scan; both sums are decimal-exact so the double division is
    bit-identical across engines. All five dimension chains broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    parts = _t(spark, sf_dir, "part").filter(
        F.col("p_type") == "ECONOMY"
    ).select("p_partkey")
    cust_nat = (
        n.join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "AMERICA")
        .select(F.col("n_nationkey").alias("__ck"))
    )
    cust = c.join(
        cust_nat, F.col("c_nationkey") == F.col("__ck")
    ).select("c_custkey")
    orders = (
        o.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", F.year("o_orderdate").cast("int").alias("o_year"))
    )
    supp = s.join(
        n.select(F.col("n_nationkey").alias("__sk"), F.col("n_name").alias("supp_nation")),
        F.col("s_nationkey") == F.col("__sk"),
    ).select("s_suppkey", "supp_nation")
    rev = _rev_expr()
    return (
        li.join(parts, F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("o_year")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", rev)
                ).cast("double"),
                F.lit(0.0),
            ).alias("__num"),
            F.sum(rev).cast("double").alias("__den"),
        )
        .select(
            "o_year",
            F.round(F.col("__num") / F.col("__den"), 6).alias("mkt_share"),
        )
    )


_SQL_MARKET_SHARE = f"""
SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
       round(coalesce(CAST(sum(CASE WHEN sn.n_name = 'NATION_3'
                                    THEN {_SQL_REV} END) AS DOUBLE), 0.0)
             / CAST(sum({_SQL_REV}) AS DOUBLE), 6) AS mkt_share
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN region ON cn.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE p_type = 'ECONOMY' AND r_name = 'AMERICA'
GROUP BY year(o_orderdate)
"""


REGISTRY["rel_market_share"] = (q_market_share, _SQL_MARKET_SHARE)


def q_important_parts(spark, sf_dir):
    """TPC-H Q11 shape (fixture adaptation: revenue share stands in
    for partsupp stock value): parts whose 1996 revenue exceeds 0.1%
    of the year's total. ONE lineitem scan: the per-part agg is
    persisted (pool-drained), the global total is a sum over the
    group sums — a bounded one-row `.first()` (the documented scalar
    pattern) — and the threshold lands as a literal filter, so no
    nested-loop scalar join and no second fact scan."""
    li = _t(spark, sf_dir, "lineitem")
    rev = _rev_expr()
    _drain_persist_pool()
    per = _pooled_persist(
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
        )
        .groupBy("l_partkey")
        .agg(F.sum(rev).alias("__rev_dec"))
    )
    total = per.agg(F.sum("__rev_dec").cast("double")).first()[0] or 0.0
    return (
        per.withColumn("revenue", F.col("__rev_dec").cast("double"))
        .filter(F.col("revenue") > F.lit(total * 0.001))
        .select("l_partkey", F.round("revenue", 4).alias("revenue"))
    )


_SQL_IMPORTANT_PARTS = f"""
WITH per AS (
  SELECT l_partkey, CAST(sum({_SQL_REV}) AS DOUBLE) AS revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY l_partkey)
SELECT l_partkey, round(revenue, 4) AS revenue
FROM per
WHERE revenue > 0.001 * (SELECT CAST(sum({_SQL_REV}) AS DOUBLE)
                         FROM lineitem
                         WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                           AND l_shipdate < TIMESTAMP '1997-01-01')
"""


REGISTRY["rel_important_parts"] = (q_important_parts, _SQL_IMPORTANT_PARTS)


def q_priority_shipping(spark, sf_dir):
    """TPC-H Q12 shape (fixture adaptation: l_linestatus stands in for
    l_shipmode; "on-time" = shipped within 30 days of the order date):
    per line-status counts of critical (1-URGENT/2-HIGH) vs other
    orders among on-time 1996 shipments. The date arithmetic is a
    residual join predicate; the counts are one conditional agg."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    joined = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    ).join(
        o.select("o_orderkey", "o_orderdate", "o_orderpriority"),
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (
            F.col("l_shipdate")
            <= F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
        ),
    )
    crit = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return joined.groupBy("l_linestatus").agg(
        F.sum(F.when(crit, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
        F.sum(F.when(crit, 0).otherwise(1)).cast("bigint").alias("low_line_count"),
    )


_SQL_PRIORITY_SHIPPING = """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_shipdate <= o_orderdate + INTERVAL 30 DAY
GROUP BY l_linestatus
"""


REGISTRY["rel_priority_shipping"] = (
    q_priority_shipping,
    _SQL_PRIORITY_SHIPPING,
)


def q_customer_distribution(spark, sf_dir):
    """TPC-H Q13 shape: the customer-order-count histogram. LEFT join
    (customers with zero qualifying orders stay, c_count = 0) with the
    priority exclusion INSIDE the join condition, then two stacked
    aggs: per-customer count → per-count customer tally. The second
    agg's input is |customers| rows, the histogram is tiny."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per = (
        c.select("c_custkey")
        .join(
            o.select("o_orderkey", "o_custkey", "o_orderpriority"),
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("bigint").alias("c_count"))
    )
    return per.groupBy("c_count").agg(
        F.count(F.lit(1)).cast("bigint").alias("custdist")
    )


_SQL_CUSTOMER_DISTRIBUTION = """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey)
GROUP BY c_count
"""


REGISTRY["rel_customer_distribution"] = (
    q_customer_distribution,
    _SQL_CUSTOMER_DISTRIBUTION,
)


def q_promo_revenue(spark, sf_dir):
    """TPC-H Q14 shape: PROMO-part revenue share for March 1996 as a
    percentage. Part dim broadcasts; numerator is a conditional sum
    over the same single fact pass; decimal-exact sums → portable
    double division."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    rev = _rev_expr()
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-03-01"))
            & (F.col("l_shipdate") < F.lit("1996-04-01"))
        )
        .join(
            p.select("p_partkey", "p_type"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("p_type") == "PROMO", rev)).cast("double"),
                F.lit(0.0),
            ).alias("__num"),
            F.sum(rev).cast("double").alias("__den"),
        )
        .select(
            F.round(F.lit(100.0) * F.col("__num") / F.col("__den"), 6).alias(
                "promo_pct"
            )
        )
    )


_SQL_PROMO_REVENUE = f"""
SELECT round(100.0 * coalesce(CAST(sum(CASE WHEN p_type = 'PROMO'
                                            THEN {_SQL_REV} END) AS DOUBLE),
                              0.0)
             / CAST(sum({_SQL_REV}) AS DOUBLE), 6) AS promo_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01'
  AND l_shipdate < TIMESTAMP '1996-04-01'
"""


REGISTRY["rel_promo_revenue"] = (q_promo_revenue, _SQL_PROMO_REVENUE)


def q_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: the supplier(s) achieving the maximum Q1-1996
    revenue. Per-supplier agg (supplier-dimension-sized), then the max
    is taken as a bounded one-row `.first()` scalar and re-applied as
    a literal filter — the classic view-join without a nested-loop
    scalar join; equality is on the identical exact-decimal-derived
    doubles, so "ties" match across engines."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    rev = _rev_expr()
    _drain_persist_pool()
    per = _pooled_persist(
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1996-04-01"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(rev).cast("double").alias("total_revenue"))
    )
    mx = per.agg(F.max("total_revenue")).first()[0] or 0.0
    return (
        per.filter(F.col("total_revenue") == F.lit(mx))
        .join(
            s.select("s_suppkey", "s_name"),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select(
            "s_suppkey",
            "s_name",
            F.round("total_revenue", 4).alias("total_revenue"),
        )
    )


_SQL_TOP_SUPPLIER = f"""
WITH per AS (
  SELECT l_suppkey, CAST(sum({_SQL_REV}) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, round(total_revenue, 4) AS total_revenue
FROM per JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM per)
"""


REGISTRY["rel_top_supplier"] = (q_top_supplier, _SQL_TOP_SUPPLIER)


def q_parts_supplier_count(spark, sf_dir):
    """TPC-H Q16 shape (fixture adaptation: negative-balance suppliers
    stand in for the complaints NOT-IN subquery): distinct supplier
    counts per (brand, type, size) over a size list, excluding one
    brand, one type, and flagged suppliers. The exclusion is a
    broadcast LEFT ANTI join (never a shuffled NOT IN); the distinct
    count shuffles only the (brand, type, size, suppkey) quad."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    s = _t(spark, sf_dir, "supplier")
    parts = p.filter(
        (F.col("p_brand") != "Brand#45")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    flagged = s.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.select("l_partkey", "l_suppkey")
        .join(parts, F.col("l_partkey") == F.col("p_partkey"))
        .join(flagged, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(
            F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt")
        )
    )


_SQL_PARTS_SUPPLIER_COUNT = """
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#45' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


REGISTRY["rel_parts_supplier_count"] = (
    q_parts_supplier_count,
    _SQL_PARTS_SUPPLIER_COUNT,
)


def q_small_qty_revenue(spark, sf_dir):
    """TPC-H Q17 shape: yearly revenue lost to small-quantity Brand#23
    orders — lineitems below 20% of their part's average quantity. The
    correlated scalar becomes a per-part agg over the ALREADY
    brand-filtered fact (part dim broadcasts first, so the agg input
    is brand-sized, not corpus-sized) broadcast-joined back; the
    threshold is exact-decimal-sum / count → portable doubles."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    parts = p.filter(F.col("p_brand") == "Brand#23").select("p_partkey")
    _drain_persist_pool()
    fact = _pooled_persist(
        li.select("l_partkey", "l_quantity", "l_extendedprice").join(
            parts, F.col("l_partkey") == F.col("p_partkey")
        )
    )
    peravg = fact.groupBy(F.col("l_partkey").alias("__pk")).agg(
        (
            F.lit(0.2)
            * F.sum(F.col("l_quantity").cast(_DEC)).cast("double")
            / F.count(F.lit(1))
        ).alias("__qty_thresh")
    )
    return (
        fact.join(F.broadcast(peravg), F.col("l_partkey") == F.col("__pk"))
        .filter(F.col("l_quantity") < F.col("__qty_thresh"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast(_DEC)).cast("double")
                / F.lit(7.0),
                4,
            ).alias("avg_yearly")
        )
    )


_SQL_SMALL_QTY_REVENUE = """
WITH fact AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#23'
), peravg AS (
  SELECT l_partkey AS pk,
         0.2 * CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
           / count(*) AS qty_thresh
  FROM fact GROUP BY l_partkey)
SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             / 7.0, 4) AS avg_yearly
FROM fact JOIN peravg ON l_partkey = pk
WHERE l_quantity < qty_thresh
"""


REGISTRY["rel_small_qty_revenue"] = (
    q_small_qty_revenue,
    _SQL_SMALL_QTY_REVENUE,
)


def q_large_orders(spark, sf_dir):
    """TPC-H Q18 shape: top-100 large-volume orders (total quantity >
    180) with their customers. The HAVING agg runs lineitem-side
    first (orderkey + quantity only), its survivors join orders →
    customer (both enrichments key-pruned), and the top-k is a
    distributed TakeOrdered on (o_totalprice DESC, o_orderkey) — no
    global sort. Quantity sums are decimal-exact. The sort key is the
    ROUNDED total: DuckDB resolves the twin's ORDER BY o_totalprice to
    the rounded output alias, and the fixture doubles carry ~1e-9 FP
    noise around the 2dp grid, so sorting the raw column could order a
    rounding-collision pair differently at the limit boundary."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(_DEC)).alias("__qty_dec"))
        .filter(F.col("__qty_dec") > 180)
        .select("l_orderkey", F.col("__qty_dec").cast("double").alias("sum_qty"))
    )
    return (
        big.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            c.select("c_custkey", "c_name"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .withColumn(
            "__tp_r", F.round(F.col("o_totalprice").cast("double"), 2)
        )
        .orderBy(F.desc("__tp_r"), F.asc("o_orderkey"))
        .limit(100)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.col("__tp_r").alias("o_totalprice"),
            F.round("sum_qty", 2).alias("sum_qty"),
        )
    )


_SQL_LARGE_ORDERS = """
SELECT c_name, c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       round(CAST(o_totalprice AS DOUBLE), 2) AS o_totalprice,
       round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2)
         AS sum_qty
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 180
ORDER BY round(CAST(o_totalprice AS DOUBLE), 2) DESC, o_orderkey
LIMIT 100
"""


REGISTRY["rel_large_orders"] = (q_large_orders, _SQL_LARGE_ORDERS)


def q_brand_size_discount(spark, sf_dir):
    """TPC-H Q19 shape: three OR'd (brand, size-band, quantity-band)
    predicates over the part-joined fact — the disjunctive-pushdown
    probe. The part dim broadcasts with its side of each disjunct
    already applied (brand ∈ the three, size ≤ the widest band); the
    full disjunction evaluates post-join; revenue is decimal-exact."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    parts = p.filter(
        F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#34")
        & (F.col("p_size") >= 1)
        & (F.col("p_size") <= 15)
    ).select("p_partkey", "p_brand", "p_size")
    q = F.col("l_quantity")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & q.between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & q.between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & q.between(20, 30)
        )
    )
    rev = _rev_expr()
    return (
        li.join(parts, F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .select(F.round("revenue", 4).alias("revenue"))
    )


_SQL_BRAND_SIZE_DISCOUNT = f"""
SELECT round(CAST(sum({_SQL_REV}) AS DOUBLE), 4) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""


REGISTRY["rel_brand_size_discount"] = (
    q_brand_size_discount,
    _SQL_BRAND_SIZE_DISCOUNT,
)


def q_promo_part_suppliers(spark, sf_dir):
    """TPC-H Q20 shape (fixture adaptation: "shipped > 400 units of
    PROMO parts in 1996" stands in for the excess-stock availability
    test): EUROPE suppliers who moved serious PROMO volume. The
    having-filtered per-supplier agg drives a LEFT SEMI join into the
    supplier dim (supplier-sized), then nation/region broadcast.
    Quantity sums are integral doubles summed as decimals."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    promo = p.filter(F.col("p_type") == "PROMO").select("p_partkey")
    movers = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
        )
        .join(promo, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast(_DEC)).alias("__qty"))
        .filter(F.col("__qty") > 400)
        .select("l_suppkey")
    )
    eur_nat = (
        n.join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "EUROPE")
        .select("n_nationkey", "n_name")
    )
    return (
        s.join(movers, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(eur_nat, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
    )


_SQL_PROMO_PART_SUPPLIERS = """
SELECT s_suppkey, s_name, n_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE'
  AND s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_type = 'PROMO'
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_suppkey
    HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 400)
"""


REGISTRY["rel_promo_part_suppliers"] = (
    q_promo_part_suppliers,
    _SQL_PROMO_PART_SUPPLIERS,
)


def q_waiting_suppliers(spark, sf_dir):
    """TPC-H Q21 shape (fixture adaptation: "late" = shipped more than
    60 days after the order date, status-F orders): top-20 suppliers
    who were the SOLE late shipper in a multi-supplier order. The
    EXISTS / NOT-EXISTS pair becomes two stacked aggs on the same
    order-joined frame — per (order, supplier) lateness, then
    per-order supplier/late counts — joined back; every frame after
    the first agg is (order × supplier)-sized. Deterministic top-k by
    (numwait DESC, s_name, s_suppkey) — the suppkey tail makes the
    limit boundary deterministic even under duplicate names, and both
    engines group by suppkey so duplicate-named suppliers stay
    distinct rows."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    fords = o.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    lf = li.select("l_orderkey", "l_suppkey", "l_shipdate").join(
        fords, F.col("l_orderkey") == F.col("o_orderkey")
    )
    per_os = lf.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(
            F.when(
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
                1,
            ).otherwise(0)
        ).alias("__late")
    )
    _drain_persist_pool()
    per_os = _pooled_persist(per_os)
    stats = (
        per_os.groupBy(F.col("l_orderkey").alias("__ok"))
        .agg(
            F.count(F.lit(1)).alias("__n_supp"),
            F.sum("__late").alias("__n_late"),
        )
        .filter((F.col("__n_supp") > 1) & (F.col("__n_late") == 1))
        .select("__ok")
    )
    return (
        per_os.filter(F.col("__late") == 1)
        .join(stats, F.col("l_orderkey") == F.col("__ok"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
        .join(
            s.select("s_suppkey", "s_name"),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .orderBy(F.desc("numwait"), F.asc("s_name"), F.asc("s_suppkey"))
        .limit(20)
        .select("s_name", "numwait")
    )


_SQL_WAITING_SUPPLIERS = """
WITH per_os AS (
  SELECT l_orderkey, l_suppkey,
         max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                  THEN 1 ELSE 0 END) AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY l_orderkey, l_suppkey
), picked AS (
  SELECT l_orderkey FROM per_os
  GROUP BY l_orderkey
  HAVING count(*) > 1 AND sum(late) = 1)
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM per_os
JOIN picked USING (l_orderkey)
JOIN supplier ON l_suppkey = s_suppkey
WHERE late = 1
GROUP BY s_suppkey, s_name
ORDER BY numwait DESC, s_name, s_suppkey
LIMIT 20
"""


REGISTRY["rel_waiting_suppliers"] = (
    q_waiting_suppliers,
    _SQL_WAITING_SUPPLIERS,
)


def q_sales_opportunity(spark, sf_dir):
    """TPC-H Q22 shape (fixture adaptation: nations stand in for
    phone-prefix country codes; "no recent orders" = none since
    2000-01-01, since every fixture customer has SOME order):
    above-average-balance customers with no recent orders, tallied
    per nation. The global average is a bounded one-row `.first()`
    scalar over the customer dim; the NOT EXISTS is a LEFT ANTI join
    against date-filtered orders; balances sum decimal-exact."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    pos = c.filter(F.col("c_acctbal") > 0).agg(
        F.sum(F.col("c_acctbal").cast(_DEC)).cast("double"),
        F.count(F.lit(1)),
    )
    row = pos.first()
    thresh = (row[0] or 0.0) / (row[1] or 1)
    recent = o.filter(F.col("o_orderdate") >= F.lit("2000-01-01")).select(
        "o_custkey"
    )
    return (
        c.filter(F.col("c_acctbal") > F.lit(thresh))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .join(
            n.select(F.col("n_nationkey").alias("__nk"), "n_name"),
            F.col("c_nationkey") == F.col("__nk"),
        )
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("numcust"),
            F.round(
                F.sum(F.col("c_acctbal").cast(_DEC)).cast("double"), 2
            ).alias("totacctbal"),
        )
    )


_SQL_SALES_OPPORTUNITY = """
SELECT n_name, CAST(count(*) AS BIGINT) AS numcust,
       round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2)
         AS totacctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2)))
                               AS DOUBLE) / count(*)
                   FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY n_name
"""


REGISTRY["rel_sales_opportunity"] = (
    q_sales_opportunity,
    _SQL_SALES_OPPORTUNITY,
)


def q_media_quarantine_report(spark, sf_dir):
    """Corrupt-media quarantine under the oracle: every 5th payload of
    the gradient fixture is overwritten with undecodable bytes; the
    dHash pass runs with ``on_error="skip"`` and the report anti-joins
    the hash output back against the input — exactly the documented
    quarantine recipe (README media pipelines). Each id's quarantined
    flag is deterministic, so the driver value-checks that corrupt
    blobs are (a) dropped, (b) ONLY they are dropped, and (c) the job
    survives."""
    from uofi_payroll_etl_main_demo_spark.ext.multimodal import (
        image_dhash,
        synthetic_gradient_images,
    )

    media = synthetic_gradient_images(spark, n=40).select(
        "media_id",
        F.when(
            F.col("media_id") % 5 == 0, F.lit(b"P6\ncorrupt")
        ).otherwise(F.col("payload")).alias("payload"),
    )
    hashed = image_dhash(media, on_error="skip").select("media_id")
    return media.select("media_id").join(
        hashed.withColumn("__ok", F.lit(True)), "media_id", "left"
    ).select(
        "media_id",
        F.coalesce(~F.col("__ok"), F.lit(True)).alias("quarantined"),
    )


REGISTRY["ext_media_quarantine_report"] = (
    q_media_quarantine_report,
    "SELECT i AS media_id, (i % 5 = 0) AS quarantined "
    "FROM range(0, 40) t(i)",
)



def q_incremental_dedup(spark, sf_dir):
    """Incremental (CDC-shaped) near-dup detection: which docs of the
    'new batch' (doc_id % 5 == 4) near-duplicate the existing corpus
    (the rest). One shingle pass + one banding over both sides; the
    in-bucket expansion emits ONLY new×old pairs — the shape that keeps
    daily dedup cost proportional to the batch, not the corpus."""
    from uofi_payroll_etl_main_demo_spark.ext.dedup import (
        incremental_near_dup_pairs,
    )

    d = _t(spark, sf_dir, "documents")
    corpus = d.filter(F.col("doc_id") % 5 != 4)
    batch = d.filter(F.col("doc_id") % 5 == 4)
    pairs = incremental_near_dup_pairs(
        corpus,
        batch,
        num_hashes=32,
        bands=16,
        k=3,
        threshold=0.2,
        hash_family="portable",
    )
    return pairs.select(
        "new_id", "old_id", F.round("jaccard", 6).alias("jaccard")
    )


def _sql_incremental_dedup(
    k: int = 3, num_hashes: int = 32, bands: int = 16, threshold: float = 0.2
) -> str:
    """Portable-family MinHash twin restricted to new×old pairs (new =
    doc_id % 5 = 4). Mirrors _sql_minhash_pairs except the candidate
    join crosses the batch/corpus boundary."""
    rpb = num_hashes // bands
    return f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           range(1, len(toks) - {k} + 2),
           i -> array_to_string(toks[i:i + {k - 1}], ' ')))) AS s
  FROM t WHERE len(toks) >= {k}
),
hx AS (
  SELECT doc_id,
         ('0x' || substr(md5(s), 1, 13))::BIGINT AS b1,
         ('0x' || substr(md5(s), 14, 13))::BIGINT AS b2
  FROM sh
),
perms AS (
  SELECT doc_id, r.i, min(b1 + r.i * b2) AS m
  FROM hx CROSS JOIN range(0, {num_hashes}) r(i)
  GROUP BY doc_id, r.i
),
bnd AS (
  SELECT doc_id, i // {rpb} AS band,
         string_agg(m::VARCHAR, ',' ORDER BY i) AS bk
  FROM perms GROUP BY doc_id, i // {rpb}
),
cand AS (
  SELECT DISTINCT n.doc_id AS new_id, o.doc_id AS old_id
  FROM bnd n JOIN bnd o ON n.band = o.band AND n.bk = o.bk
  WHERE n.doc_id % 5 = 4 AND o.doc_id % 5 != 4
),
sizes AS (SELECT doc_id, count(*) AS n FROM hx GROUP BY doc_id),
inter AS (
  SELECT c.new_id, c.old_id, count(*) AS i
  FROM cand c
  JOIN hx a ON a.doc_id = c.new_id
  JOIN hx b ON b.doc_id = c.old_id AND a.b1 = b.b1
  GROUP BY 1, 2
)
SELECT new_id, old_id,
       round(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = new_id
JOIN sizes sb ON sb.doc_id = old_id
WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= {threshold}
"""


_MIXTURE_BUDGETS = {"src0": 100, "src1": 50, "src2": 10, "src3": 5}


def q_mixture_take(spark, sf_dir):
    """Data mixing: assemble a training subset to a target source
    composition — per-source exact budgets, portable-hash order (a
    budget above the stratum's population keeps it whole; unlisted
    sources are dropped)."""
    from uofi_payroll_etl_main_demo_spark.operators.sampling import (
        mixture_take,
    )

    return mixture_take(
        _t(spark, sf_dir, "documents"), _MIXTURE_BUDGETS
    ).select("doc_id", "source")


def _sql_mixture_take() -> str:
    case = " ".join(
        f"WHEN '{s}' THEN {n}" for s, n in _MIXTURE_BUDGETS.items()
    )
    return f"""
WITH r AS (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT,
                    doc_id) AS rn
  FROM documents
)
SELECT doc_id, source FROM r
WHERE rn <= CASE source {case} ELSE 0 END
"""


REGISTRY["ext_incremental_dedup"] = (
    q_incremental_dedup,
    _sql_incremental_dedup(),
)


def q_minhash_index_query(spark, sf_dir):
    """Persisted TEXT-dedup index serving path (ext/dedup_index.py):
    the corpus' MinHash LSH state — band keys partitioned by band,
    shingle-hash sets for verification — is ensure-built ONCE, and the
    CDC query pays one signature pass over the BATCH plus an equi-join
    against the stored bands; the corpus text is never re-shingled.
    Built and queried with the in-query CDC operator's exact parameters
    (portable family, 32 hashes × 16 bands, k=3), so the oracle is the
    SAME portable-family SQL twin that verifies ext_incremental_dedup —
    the index path must reproduce the inline path pair-for-pair,
    jaccard-for-jaccard."""
    from uofi_payroll_etl_main_demo_spark.ext.ann_index import (
        corpus_fingerprint,
    )
    from uofi_payroll_etl_main_demo_spark.ext.dedup_index import (
        ensure_minhash_index,
    )

    d = _t(spark, sf_dir, "documents")
    corpus = d.filter(F.col("doc_id") % 5 != 4)
    batch = d.filter(F.col("doc_id") % 5 == 4)
    doc_path = os.path.join(sf_dir, "documents.parquet")
    idx_dir = os.path.join(
        _ann_index_root(),
        f"mh32x16k3_{os.path.basename(os.path.normpath(sf_dir))}",
    )
    index = ensure_minhash_index(
        corpus,
        idx_dir,
        corpus_tag=corpus_fingerprint(doc_path) + ":mod5ne4",
        num_hashes=32,
        bands=16,
        k=3,
        hash_family="portable",
    )
    out = index.query(batch, threshold=0.2)
    return out.select(
        "new_id", "old_id", F.round("jaccard", 6).alias("jaccard")
    )


REGISTRY["ext_minhash_index_query"] = (
    q_minhash_index_query,
    _sql_incremental_dedup(),
)


def q_incremental_simhash(spark, sf_dir):
    """Incremental SimHash dedup: new-batch docs (doc_id % 5 == 4)
    within Hamming ≤ 3 of the existing corpus — the SimHash twin of
    ext_incremental_dedup (one signature pass + one banding over both
    sides, in-bucket expansion emits only new×old)."""
    from uofi_payroll_etl_main_demo_spark.ext.dedup import (
        incremental_simhash_pairs,
    )

    d = _t(spark, sf_dir, "documents")
    corpus = d.filter(F.col("doc_id") % 5 != 4)
    batch = d.filter(F.col("doc_id") % 5 == 4)
    return incremental_simhash_pairs(
        corpus, batch, max_hamming=3, hash_family="portable"
    )


def _sql_incremental_simhash(max_hamming: int = 3) -> str:
    """The _sql_simhash_pairs pipeline with the candidate join crossing
    the batch/corpus boundary (new = doc_id % 5 = 4) instead of the
    a < b self-pairing."""
    base = _sql_simhash_pairs(max_hamming)
    old_cand = (
        "  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,\n"
        "         a.s AS sa, b.s AS sb\n"
        "  FROM chunks a JOIN chunks b\n"
        "    ON a.chunk = b.chunk AND a.ck = b.ck AND a.doc_id < b.doc_id"
    )
    new_cand = (
        "  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,\n"
        "         a.s AS sa, b.s AS sb\n"
        "  FROM chunks a JOIN chunks b\n"
        "    ON a.chunk = b.chunk AND a.ck = b.ck\n"
        "   AND a.doc_id % 5 = 4 AND b.doc_id % 5 != 4"
    )
    assert old_cand in base
    sql = base.replace(old_cand, new_cand)
    return sql.replace(
        "SELECT id_a, id_b,",
        "SELECT id_a AS new_id, id_b AS old_id,",
    )


REGISTRY["ext_incremental_simhash"] = (
    q_incremental_simhash,
    _sql_incremental_simhash(),
)
REGISTRY["ext_mixture_take"] = (q_mixture_take, _sql_mixture_take())


def q_semantic_dedup(spark, sf_dir):
    """SemDeDup-shaped semantic dedup (Abbas et al. 2023): drop all but
    one representative of every embedding-cosine near-dup cluster.
    Composition of scale-safe parts: LSH-bucketed cosine pairs
    (``all_pairs_above`` — equi-join on hyperplane buckets, never
    all-pairs) → connected components → keep the min-id member per
    cluster; the billions of unique vectors only pay a left-anti join
    against the (tiny) loser set."""
    from uofi_payroll_etl_main_demo_spark.ext.clusters import dedup_survivors
    from uofi_payroll_etl_main_demo_spark.ext.similarity import (
        all_pairs_above_gemm,
    )

    emb = _t(spark, sf_dir, "embeddings")
    # GEMM in-bucket scoring: downstream consumes only the pair SET, so
    # the summation-order float noise (~1e-15) of BLAS vs the Column
    # expression cannot change the result (test-pinned equal)
    pairs = all_pairs_above_gemm(emb, dim=64, threshold=0.35, n_planes=4)
    kept = dedup_survivors(emb, pairs, id_col="vec_id")
    return kept.select("vec_id", "label")


def _sql_semantic_dedup(threshold: float = 0.35) -> str:
    """Bucketed pairs (deterministic hyperplanes, reproduced in SQL) →
    transitive closure → survivors = ids that are their component min."""
    return f"""
WITH RECURSIVE pairs AS ({_sql_embedding_pairs_bucketed(threshold=threshold)}),
edges AS (
  SELECT id_a AS s, id_b AS d FROM pairs
  UNION
  SELECT id_b AS s, id_a AS d FROM pairs
),
reach(src, node) AS (
  SELECT s, s FROM edges
  UNION
  SELECT r.src, e.d FROM reach r JOIN edges e ON r.node = e.s
),
losers AS (
  SELECT src AS vec_id FROM reach GROUP BY src
  HAVING min(node) != src
)
SELECT e.vec_id, e.label FROM embeddings e
WHERE e.vec_id NOT IN (SELECT vec_id FROM losers)
"""


REGISTRY["ext_semantic_dedup"] = (q_semantic_dedup, _sql_semantic_dedup())


def q_semantic_dedup_docs(spark, sf_dir):
    """MODEL-FREE end-to-end semantic dedup over raw TEXT — the full
    text→vector→dedup loop as one lazy plan: hashed bag-of-words
    embedding (codegen explode+agg, no model), hyperplane-LSH buckets,
    bucket-local exact-cosine pairs (never all-pairs), connected
    components, min-id survivors. Swapping the closed-form embedder
    for a model-inference column leaves every downstream stage
    unchanged — this is the SemDeDup recipe with the embedding model
    factored out, so the whole pipeline gets a VALUE oracle instead of
    stopping at a precomputed embeddings table (ext_semantic_dedup)."""
    from uofi_payroll_etl_main_demo_spark.ext.clusters import dedup_survivors
    from uofi_payroll_etl_main_demo_spark.ext.similarity import (
        all_pairs_above,
    )
    from uofi_payroll_etl_main_demo_spark.ext.textstats import (
        hashed_bow_embeddings,
    )

    docs = _t(spark, sf_dir, "documents")
    emb = hashed_bow_embeddings(docs, dim=16)
    pairs = all_pairs_above(
        emb, dim=16, threshold=0.96, n_planes=4, id_col="doc_id",
        vec_col="v",
    )
    kept = dedup_survivors(docs.select("doc_id", "source"), pairs, "doc_id")
    return kept.select("doc_id", "source")


def _sql_semantic_dedup_docs(
    dim: int = 16, threshold: float = 0.96, n_planes: int = 4,
    seed: int = 42,
) -> str:
    """Composed CTE twin: hashed-BOW embedding (the ext_text_embed_topk
    CTEs), deterministic hyperplane buckets, bucket-local cosine pairs,
    recursive-CTE transitive closure, min-id survivors."""
    from uofi_payroll_etl_main_demo_spark.ext.similarity import _hyperplanes

    terms = []
    for b, plane in enumerate(_hyperplanes(dim, n_planes, seed)):
        lst = "[" + ", ".join(repr(x) for x in plane) + "]"
        terms.append(
            f"(CASE WHEN list_dot_product(v, {lst}) >= 0 "
            f"THEN {1 << b} ELSE 0 END)"
        )
    bucket = " + ".join(terms)
    return f"""
WITH RECURSIVE t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
bk AS (SELECT doc_id, list_transform(toks,
         tk -> ('0x' || substr(md5(tk), 1, 15))::BIGINT % {dim}) AS b
       FROM t WHERE len(toks) > 0),
cnt AS (SELECT doc_id, list_transform(range(0, {dim}),
          j -> CAST(len(list_filter(b, x -> x = j)) AS DOUBLE)) AS c
        FROM bk),
emb AS (SELECT doc_id, list_transform(c, x -> x / sqrt(
          list_aggregate(list_transform(c, y -> y * y), 'sum'))) AS v
        FROM cnt),
bbk AS (SELECT doc_id, v, {bucket} AS bucket FROM emb),
pairs AS (
  SELECT a.doc_id AS id_a, x.doc_id AS id_b
  FROM bbk a JOIN bbk x ON a.bucket = x.bucket AND a.doc_id < x.doc_id
  WHERE list_cosine_similarity(a.v, x.v) >= {threshold}),
edges AS (
  SELECT id_a AS s, id_b AS d FROM pairs
  UNION
  SELECT id_b AS s, id_a AS d FROM pairs
),
reach(src, node) AS (
  SELECT s, s FROM edges
  UNION
  SELECT r.src, e.d FROM reach r JOIN edges e ON r.node = e.s
),
losers AS (
  SELECT src AS doc_id FROM reach GROUP BY src
  HAVING min(node) != src
)
SELECT d.doc_id, d.source FROM documents d
WHERE d.doc_id NOT IN (SELECT doc_id FROM losers)
"""


REGISTRY["ext_semantic_dedup_docs"] = (
    q_semantic_dedup_docs,
    _sql_semantic_dedup_docs(),
)


def q_unigram_surprisal(spark, sf_dir):
    """Quality scoring: corpus-unigram-LM average surprisal per doc in
    exact integer milli-bits (floor-log2 via integer bit length — no
    floating log, so the oracle matches bit-for-bit)."""
    from uofi_payroll_etl_main_demo_spark.ext.textstats import (
        unigram_surprisal,
    )

    return unigram_surprisal(_t(spark, sf_dir, "documents"))


def _sql_unigram_surprisal() -> str:
    return f"""
WITH t AS (
  SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
  WHERE trim(text) != ''
),
tf AS (SELECT tok, count(*) AS cnt FROM t GROUP BY tok),
tot AS (SELECT sum(cnt) AS total FROM tf),
s AS (SELECT tok, length(bin(total // cnt)) - 1 AS sb FROM tf, tot)
SELECT doc_id, count(*) AS n_tokens,
       CAST((sum(sb) * 1000) // count(*) AS BIGINT)
         AS surprisal_milli_bits
FROM t JOIN s USING (tok)
GROUP BY doc_id
"""


REGISTRY["ext_unigram_surprisal"] = (
    q_unigram_surprisal,
    _sql_unigram_surprisal(),
)


def q_bigram_surprisal(spark, sf_dir):
    """Text: order-2 corpus-LM surprisal per document (bigram
    conditional MLE with unigram scoring for the first token), exact
    integer milli-bits — ext/textstats.py bigram_surprisal."""
    from uofi_payroll_etl_main_demo_spark.ext.textstats import (
        bigram_surprisal,
    )

    return bigram_surprisal(_t(spark, sf_dir, "documents"))


def _sql_bigram_surprisal() -> str:
    return f"""
WITH t AS (
  SELECT doc_id, {_TOKS} AS toks FROM documents WHERE trim(text) != ''
),
b2 AS (
  SELECT doc_id, bg.w1 AS w1, bg.w2 AS w2 FROM (
    SELECT doc_id, unnest(list_transform(range(1, len(toks)),
             i -> {{'w1': toks[i], 'w2': toks[i + 1]}})) AS bg
    FROM t WHERE len(toks) >= 2)),
bc AS (SELECT w1, w2, count(*) AS cnt FROM b2 GROUP BY 1, 2),
cc AS (SELECT w1, sum(cnt) AS ctx FROM bc GROUP BY w1),
sb2 AS (SELECT w1, w2, length(bin(ctx // cnt)) - 1 AS sb
        FROM bc JOIN cc USING (w1)),
bs AS (SELECT doc_id, count(*) AS nb, sum(sb) AS sbs
       FROM b2 JOIN sb2 USING (w1, w2) GROUP BY doc_id),
tok AS (SELECT doc_id, unnest(toks) AS tok FROM t),
tf AS (SELECT tok, count(*) AS cnt FROM tok GROUP BY tok),
tot AS (SELECT sum(cnt) AS total FROM tf),
fs AS (SELECT doc_id, length(bin(total // cnt)) - 1 AS sb1
       FROM (SELECT doc_id, toks[1] AS tok FROM t) f
       JOIN tf USING (tok), tot)
SELECT doc_id, CAST(COALESCE(nb, 0) + 1 AS BIGINT) AS n_tokens,
       CAST(((COALESCE(sbs, 0) + sb1) * 1000) // (COALESCE(nb, 0) + 1)
            AS BIGINT) AS bigram_milli_bits
FROM fs LEFT JOIN bs USING (doc_id)
"""


REGISTRY["ext_bigram_surprisal"] = (
    q_bigram_surprisal,
    _sql_bigram_surprisal(),
)


def q_quantiles(spark, sf_dir):
    """A14: exact interpolated quantiles per group (Spark `percentile`,
    computed once via the array form). The probe points are DYADIC
    fractions (k/2^m) over integer-valued quantities, so the linear
    interpolation is exact in binary floating point and the result is
    bit-identical to DuckDB's quantile_cont — float quantiles are
    cross-engine-comparable only under that discipline. The scalable
    sibling for 100 TB is `approx_percentile` (t-digest, rows-only
    check); this exact form is the small-group/oracle path."""
    li = _t(spark, sf_dir, "lineitem")
    qs = li.groupBy("l_returnflag").agg(
        F.expr(
            "percentile(l_quantity, array(0.25D, 0.5D, 0.75D, 0.875D))"
        ).alias("__q")
    )
    return qs.select(
        "l_returnflag",
        F.element_at("__q", 1).alias("q25"),
        F.element_at("__q", 2).alias("q50"),
        F.element_at("__q", 3).alias("q75"),
        F.element_at("__q", 4).alias("q875"),
    )


def q_quality_classifier(spark, sf_dir):
    """Curation: fixed-point linear quality classifier (fastText-filter
    shape) — integer ppm features, integer logit, exact keep/drop."""
    from uofi_payroll_etl_main_demo_spark.ext.curation import (
        quality_classifier,
    )

    return quality_classifier(_t(spark, sf_dir, "documents"))


def _sql_quality_classifier(threshold: int = 550_000) -> str:
    sw = ", ".join(f"'{w}'" for w in
                   ["the", "a", "of", "and", "to", "in", "is", "that"])
    return f"""
WITH f AS (
  SELECT doc_id, {_TOKS} AS toks, length(text) AS nc,
         len(regexp_extract_all(text, '{_SQL_PUNCT}')) AS punct
  FROM documents
),
c AS (
  SELECT doc_id,
         len(list_filter(toks, t -> t != '')) AS n,
         len(list_filter(toks, t -> lower(t) IN ({sw}))) AS sw,
         len(list_filter(toks, t -> regexp_full_match(t, '[A-Za-z]+')))
           AS alpha,
         len(list_filter(toks, t -> regexp_matches(t, '^[0-9]'))) AS digit,
         nc, punct
  FROM f
),
p AS (
  SELECT doc_id,
         CASE WHEN n > 0 THEN (sw * 1000000) // n ELSE 0 END AS sw_ppm,
         CASE WHEN n > 0 THEN (alpha * 1000000) // n ELSE 0 END AS alpha_ppm,
         CASE WHEN n > 0 THEN (digit * 1000000) // n ELSE 0 END AS digit_ppm,
         CASE WHEN nc > 0 THEN (punct * 1000000) // nc ELSE 0 END AS punct_ppm
  FROM c
)
SELECT doc_id, sw_ppm, alpha_ppm, digit_ppm, punct_ppm,
       sw_ppm * 2 + alpha_ppm - digit_ppm * 2 - punct_ppm * 4 AS logit_ppm,
       (sw_ppm * 2 + alpha_ppm - digit_ppm * 2 - punct_ppm * 4)
         >= {threshold} AS keep
FROM p
"""


REGISTRY["ext_quality_classifier"] = (
    q_quality_classifier,
    _sql_quality_classifier(),
)


def q_curriculum_order(spark, sf_dir):
    """Curriculum batch builder: first 100 documents of the training
    order = quality bands descending (integer logit_ppm div 1e5 —
    fixed-width bands need no global statistics), shuffled WITHIN each
    band by the portable md5 hash (deterministic pseudo-random, engine-
    portable). orderBy().limit() executes as distributed partial top-k
    + driver merge — no global sort materialization at corpus scale."""
    from pyspark.sql import Window

    from uofi_payroll_etl_main_demo_spark.ext.curation import (
        quality_classifier,
    )

    logits = quality_classifier(_t(spark, sf_dir, "documents"))
    band = F.expr("logit_ppm div 100000").cast("bigint")
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
    ).cast("bigint")
    top = (
        logits.select("doc_id", band.alias("band"), h.alias("__h"))
        .orderBy(F.desc("band"), F.asc("__h"), F.asc("doc_id"))
        .limit(100)
    )
    w = Window.orderBy(F.desc("band"), F.asc("__h"), F.asc("doc_id"))
    return top.select(
        F.row_number().over(w).cast("bigint").alias("position"),
        "doc_id",
        "band",
    )


def _sql_curriculum_order(top_n: int = 100) -> str:
    return f"""
WITH l AS (SELECT doc_id, logit_ppm FROM ({_sql_quality_classifier()}) q),
b AS (
  SELECT doc_id, CAST(logit_ppm // 100000 AS BIGINT) AS band,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS h
  FROM l)
SELECT CAST(row_number() OVER (ORDER BY band DESC, h, doc_id) AS BIGINT)
         AS position,
       doc_id, band
FROM b ORDER BY band DESC, h, doc_id LIMIT {top_n}
"""


REGISTRY["ext_curriculum_order"] = (
    q_curriculum_order,
    _sql_curriculum_order(),
)


def q_dataset_card(spark, sf_dir):
    """Curation: per-source dataset-card panel — doc/token/char
    volumes, language breadth, exact-dup count, corpus share in exact
    integer ppm. The corpus total is a 1-row driver scalar (BM25-avgdl
    pattern); everything else is one grouped aggregation."""
    from uofi_payroll_etl_main_demo_spark.functions.text import tokenize_ws

    d = _t(spark, sf_dir, "documents")
    base = d.select(
        "source",
        "lang",
        F.md5("text").alias("__h"),
        F.size(tokenize_ws("text")).cast("bigint").alias("__nt"),
        F.length("text").cast("bigint").alias("__nc"),
    )
    total = base.count()
    return base.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__nt").alias("n_tokens"),
        F.sum("__nc").alias("n_chars"),
        F.count_distinct("lang").alias("n_langs"),
        (F.count(F.lit(1)) - F.count_distinct("__h")).alias("n_exact_dups"),
        F.expr(f"(count(1) * 1000000L) div {total}").alias("share_ppm"),
    )


_SQL_DATASET_CARD = f"""
WITH b AS (
  SELECT source, lang, md5(text) AS h,
         len(list_filter({_TOKS}, t -> t != '')) AS nt,
         length(text) AS nc
  FROM documents
)
SELECT source, count(*) AS n_docs,
       CAST(sum(nt) AS BIGINT) AS n_tokens,
       CAST(sum(nc) AS BIGINT) AS n_chars,
       count(DISTINCT lang) AS n_langs,
       count(*) - count(DISTINCT h) AS n_exact_dups,
       (count(*) * 1000000) // (SELECT count(*) FROM b) AS share_ppm
FROM b GROUP BY source
"""


REGISTRY["ext_dataset_card"] = (q_dataset_card, _SQL_DATASET_CARD)


def q_bpe_merges(spark, sf_dir):
    """Tokenizer training: learn BPE merges from the documents corpus
    (Sennrich word-level formulation — one corpus pass, then N rounds
    over the vocab frame). SQL-twinned since r8: the greedy
    left-to-right in-array merge IS expressible once symbols are
    encoded as a bracket-wrapped string (chr30+sym+chr31 per symbol) —
    ``replace`` then consumes whole symbols only and scans greedily
    non-overlapping exactly like the fold — and the training loop runs
    as a recursive CTE whose recursive term aggregates pair counts
    over the working table. Exactness additionally pinned against a
    pure-Python reference in tests/test_text_ext.py."""
    from uofi_payroll_etl_main_demo_spark.ext.bpe import bpe_merges

    return bpe_merges(_t(spark, sf_dir, "documents"), n_merges=8)


def _sql_bpe_training_cte(n_merges: int = 8, min_pair_freq: int = 2) -> str:
    """The shared recursive-CTE BPE trainer (see q_bpe_merges): state
    rows are (iteration, chosen merge, bracket-encoded word, freq); the
    recursive term picks the top pair (freq desc, then lexicographic —
    the law bpe_merges pins) via a scalar subquery over the working
    table and rewrites every word with one greedy ``replace`` pass.
    One pass per rank is COMPLETE: a merge can only create pairs
    involving its new symbol, which no earlier/equal rank names."""
    return f"""
tk AS (SELECT doc_id, CASE WHEN trim(text) = '' THEN []
         ELSE {_TOKS} END AS toks FROM documents),
w0 AS (SELECT lower(unnest(toks)) AS w FROM tk),
-- chr(30)/chr(31) are this oracle's reserved symbol-bracket markers
-- (the chr(1) identity-replacement note covers the encode twin's
-- third control char): a token CONTAINING one would corrupt the
-- bracket encoding and silently diverge the oracle from the Spark
-- fold, so such a token fails the oracle LOUDLY instead
vocab0 AS (SELECT regexp_replace(
             CASE WHEN w LIKE '%' || chr(30) || '%'
                    OR w LIKE '%' || chr(31) || '%'
                  THEN error('BPE oracle: token contains reserved '
                             || 'chr(30)/chr(31) bracket markers')
                  ELSE w END,
             '(.)', chr(30) || '\\1' || chr(31), 'g')
             AS s, count(*) AS freq
           FROM w0 GROUP BY w),
v AS (
  SELECT 0 AS it,
         NULL::STRUCT(l VARCHAR, r VARCHAR, f BIGINT) AS chosen,
         s, freq
  FROM vocab0
  UNION ALL
  SELECT it + 1,
         ch,
         CASE WHEN ch IS NULL THEN s
              ELSE replace(s,
                     chr(30) || ch.l || chr(31) || chr(30) || ch.r || chr(31),
                     chr(30) || ch.l || ch.r || chr(31))
         END,
         freq
  FROM v,
       (SELECT (SELECT struct_pack(l := pl, r := pr, f := pf) FROM (
          SELECT z[1] AS pl, z[2] AS pr, sum(freq) AS pf
          FROM (SELECT regexp_extract_all(s,
                  chr(30) || '([^' || chr(30) || chr(31) || ']*)' || chr(31),
                  1) AS syms, freq FROM v) q,
               unnest(list_zip(q.syms[:-2], q.syms[2:])) u(z)
          WHERE z[2] IS NOT NULL
          GROUP BY 1, 2
          HAVING sum(freq) >= {min_pair_freq}
          ORDER BY pf DESC, pl, pr LIMIT 1)) AS ch)
  WHERE it < {n_merges}
),
bpe_merge_table AS (
  SELECT it AS rank, chosen.l AS "left", chosen.r AS "right",
         chosen.l || chosen.r AS merged, chosen.f AS pair_freq
  FROM (SELECT DISTINCT it, chosen FROM v
        WHERE it >= 1 AND chosen IS NOT NULL)
)"""


_SQL_BPE_MERGES = (
    "WITH RECURSIVE "
    + _sql_bpe_training_cte()
    + "\nSELECT rank, \"left\", \"right\", merged, pair_freq "
    "FROM bpe_merge_table ORDER BY rank"
)

REGISTRY["ext_bpe_merges"] = (q_bpe_merges, _SQL_BPE_MERGES)


def q_bpe_encode(spark, sf_dir):
    """Tokenizer apply: learn 8 merges, then encode the corpus with the
    merge table (Arrow-batched mapInPandas — the per-word lowest-rank
    merge loop). Returns per-doc token counts. SQL-twinned since r8:
    the lowest-rank loop is provably equivalent to applying merges in
    rank order with one greedy pass each (a merge's new symbol never
    forms a pair an earlier/equal rank names), so the oracle chains
    n_merges data-derived ``replace`` calls over the bracket-encoded
    word and counts the symbol markers; the merge table itself comes
    from the same recursive-CTE trainer, making the twin fully
    self-contained. Python-reference pin stays in tests."""
    from uofi_payroll_etl_main_demo_spark.ext.bpe import bpe_encode, bpe_merges

    d = _t(spark, sf_dir, "documents")
    merges = [
        (r["left"], r["right"])
        for r in bpe_merges(d, n_merges=8).orderBy("rank").collect()
    ]
    return bpe_encode(d, merges).select("doc_id", "n_tokens")


def _sql_bpe_encode(n_merges: int = 8) -> str:
    # per-rank scalar pattern/replacement pairs; a missing rank (early
    # stop) degrades to replace(s, chr(1), chr(1)) — the identity even
    # if a pathological document contains chr(1) itself
    pats = ",\n   ".join(
        f'coalesce((SELECT chr(30) || "left" || chr(31) || chr(30) || '
        f'"right" || chr(31) FROM bpe_merge_table WHERE rank = {i}), '
        f"chr(1)) AS p{i},"
        f"\n   coalesce((SELECT chr(30) || merged || chr(31)"
        f" FROM bpe_merge_table WHERE rank = {i}), chr(1)) AS q{i}"
        for i in range(1, n_merges + 1)
    )
    enc = "regexp_replace(w, '(.)', chr(30) || '\\1' || chr(31), 'g')"
    for i in range(1, n_merges + 1):
        enc = f"replace({enc}, p{i}, q{i})"
    return (
        "WITH RECURSIVE "
        + _sql_bpe_training_cte(n_merges)
        + f""",
pats AS (SELECT
   {pats}),
dw AS (SELECT doc_id, lower(unnest(toks)) AS w FROM tk),
doc_words AS (SELECT doc_id, w, count(*) AS k FROM dw GROUP BY doc_id, w),
uniq AS (SELECT DISTINCT w FROM dw),
enc AS (SELECT w, {enc} AS e FROM uniq, pats),
wt AS (SELECT w, length(e) - length(replace(e, chr(30), '')) AS ntok
       FROM enc),
per_doc AS (SELECT doc_id, sum(k * ntok) AS n
            FROM doc_words JOIN wt USING (w) GROUP BY doc_id)
SELECT d.doc_id, CAST(coalesce(per_doc.n, 0) AS BIGINT) AS n_tokens
FROM documents d LEFT JOIN per_doc USING (doc_id)"""
    )


REGISTRY["ext_bpe_encode"] = (q_bpe_encode, _sql_bpe_encode())


def q_bpe_fertility(spark, sf_dir):
    """Tokenizer FERTILITY panel per source — the corpus-card metric a
    tokenizer review reads first: BPE tokens per whitespace word
    (fertility; high = the vocabulary fragments that source's text)
    and characters per BPE token (compression). Composes the trained
    tokenizer (8 merges, same trainer as ext_bpe_merges) over the
    corpus and aggregates per source; decimal-summed ratios so the
    per-source means are partition-order exact."""
    from uofi_payroll_etl_main_demo_spark.ext.bpe import bpe_encode, bpe_merges
    from uofi_payroll_etl_main_demo_spark.functions.text import tokenize_ws

    d = _t(spark, sf_dir, "documents")
    merges = [
        (r["left"], r["right"])
        for r in bpe_merges(d, n_merges=8).orderBy("rank").collect()
    ]
    enc = bpe_encode(d, merges).select("doc_id", "n_tokens")
    base = d.select(
        "doc_id",
        "source",
        F.size(tokenize_ws("text")).cast("bigint").alias("__nw"),
        # raw-text length: engines' Unicode lower() can change string
        # LENGTH on exotic codepoints, and the metric doesn't need it
        F.length("text").cast("bigint").alias("__nc"),
    )
    return (
        base.join(enc, "doc_id")
        .groupBy("source")
        .agg(
            F.sum("n_tokens").cast("bigint").alias("n_bpe_tokens"),
            F.sum("__nw").cast("bigint").alias("n_words"),
            F.round(
                F.sum("n_tokens").cast("double") / F.sum("__nw"), 6
            ).alias("fertility"),
            F.round(
                F.sum("__nc").cast("double") / F.sum("n_tokens"), 6
            ).alias("chars_per_token"),
        )
    )


def _sql_bpe_fertility() -> str:
    base = _sql_bpe_encode()
    out = (
        base
        .replace(
            "SELECT d.doc_id, CAST(coalesce(per_doc.n, 0) AS BIGINT) "
            "AS n_tokens\nFROM documents d LEFT JOIN per_doc USING (doc_id)",
            """,
per_doc2 AS (
  SELECT d.doc_id, d.source,
         CAST(coalesce(per_doc.n, 0) AS BIGINT) AS n_tokens,
         len(CASE WHEN trim(d.text) = '' THEN []
             ELSE """
            + _toks_sql("d.text")
            + """ END) AS nw,
         length(d.text) AS nc
  FROM documents d LEFT JOIN per_doc USING (doc_id))
SELECT source,
       CAST(sum(n_tokens) AS BIGINT) AS n_bpe_tokens,
       CAST(sum(nw) AS BIGINT) AS n_words,
       round(sum(n_tokens) * 1.0 / sum(nw), 6) AS fertility,
       round(sum(nc) * 1.0 / sum(n_tokens), 6) AS chars_per_token
FROM per_doc2 GROUP BY source""",
        )
    )
    # the splice must actually rewrite the tail — a drifted
    # _sql_bpe_encode would otherwise ship the WRONG oracle silently
    assert out != base, "bpe fertility splice anchor drifted"
    return out


REGISTRY["ext_bpe_fertility"] = (q_bpe_fertility, _sql_bpe_fertility())


def q_hard_negatives(spark, sf_dir):
    """Contrastive training data: per vector, the top-3 most-similar
    DIFFERENT-label neighbors (LSH-bucketed, label filter before the
    top-k window)."""
    from uofi_payroll_etl_main_demo_spark.ext.similarity import (
        hard_negative_mining,
    )

    return hard_negative_mining(
        _t(spark, sf_dir, "embeddings"), dim=64, k=3, n_planes=4
    )


def _sql_hard_negatives(
    k: int = 3, dim: int = 64, n_planes: int = 4, seed: int = 42
) -> str:
    from uofi_payroll_etl_main_demo_spark.ext.similarity import _hyperplanes

    terms = []
    for bit, plane in enumerate(_hyperplanes(dim, n_planes, seed)):
        lst = "[" + ", ".join(repr(x) for x in plane) + "]"
        terms.append(
            f"(CASE WHEN list_dot_product(v, {lst}) >= 0 "
            f"THEN {1 << bit} ELSE 0 END)"
        )
    bucket = " + ".join(terms)
    return f"""
WITH b AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
             {bucket} AS bucket FROM embeddings),
p AS (SELECT a.vec_id AS vec_id, a.label AS label,
             x.vec_id AS neighbor_id, x.label AS neighbor_label,
             round(list_cosine_similarity(a.v, x.v), 6) AS cosine
      FROM b a JOIN b x ON a.bucket = x.bucket AND a.label <> x.label)
SELECT vec_id, label, neighbor_id, neighbor_label, cosine, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY vec_id
                               ORDER BY cosine DESC, neighbor_id) AS rank
  FROM p)
WHERE rank <= {k}
"""


REGISTRY["ext_hard_negatives"] = (q_hard_negatives, _sql_hard_negatives())


def q_dedup_best_of_cluster(spark, sf_dir):
    """Quality-aware dedup survivor selection: connected components
    over the n-gram near-dup graph, keeping each cluster's HIGHEST
    quality-classifier logit (min doc_id tie-break) instead of the
    arbitrary min-id — what a curation pipeline actually ships."""
    from pyspark.sql import Window

    from uofi_payroll_etl_main_demo_spark.ext.clusters import (
        connected_components,
    )
    from uofi_payroll_etl_main_demo_spark.ext.curation import (
        quality_classifier,
    )

    d = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(d, k=3, threshold=0.2)
    comp = connected_components(pairs).select(
        F.col("id").alias("doc_id"), F.col("comp").alias("component")
    )
    q = quality_classifier(d).select("doc_id", "logit_ppm")
    w = Window.partitionBy("component").orderBy(
        F.desc("logit_ppm"), F.asc("doc_id")
    )
    return (
        comp.join(q, "doc_id")
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "component",
            F.col("doc_id").alias("survivor_id"),
            F.col("logit_ppm").alias("survivor_logit_ppm"),
        )
    )


def _sql_dedup_best_of_cluster() -> str:
    return f"""
WITH RECURSIVE pairs AS ({_sql_ngram_jaccard()}),
edges AS (
  SELECT id_a AS s, id_b AS d FROM pairs
  UNION
  SELECT id_b AS s, id_a AS d FROM pairs
),
reach(src, node) AS (
  SELECT s, s FROM edges
  UNION
  SELECT r.src, e.d FROM reach r JOIN edges e ON r.node = e.s
),
comp AS (SELECT src AS doc_id, min(node) AS component FROM reach GROUP BY src),
q AS (SELECT doc_id, logit_ppm FROM ({_sql_quality_classifier()}))
SELECT component, survivor_id, survivor_logit_ppm FROM (
  SELECT c.component, c.doc_id AS survivor_id, q.logit_ppm AS
           survivor_logit_ppm,
         row_number() OVER (PARTITION BY c.component
                            ORDER BY q.logit_ppm DESC, c.doc_id) AS rn
  FROM comp c JOIN q USING (doc_id))
WHERE rn = 1
"""


REGISTRY["ext_dedup_best_of_cluster"] = (
    q_dedup_best_of_cluster,
    _sql_dedup_best_of_cluster(),
)


def q_full_outer_recon(spark, sf_dir):
    """J11: full-outer reconciliation — per-key totals from two systems
    (customer order spend vs event value) joined FULL OUTER with
    presence flags and an exact decimal delta; the classic ETL
    cross-system audit shape. Both sides pre-aggregate before the join,
    so the shuffle carries one row per key per side."""
    orders = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.sum(F.col("o_totalprice").cast(_DEC)).alias("order_total"))
    )
    events = (
        _t(spark, sf_dir, "events")
        .groupBy(F.col("user_id").alias("k2"))
        .agg(F.sum(F.col("value").cast(_DEC)).alias("event_total"))
    )
    j = orders.join(events, orders["k"] == events["k2"], "full_outer")
    return j.select(
        F.coalesce("k", "k2").alias("key"),
        F.col("k").isNotNull().alias("in_orders"),
        F.col("k2").isNotNull().alias("in_events"),
        F.col("order_total").cast("double").alias("order_total"),
        F.col("event_total").cast("double").alias("event_total"),
        (
            F.coalesce(F.col("order_total"), F.lit(0).cast(_DEC))
            - F.coalesce(F.col("event_total"), F.lit(0).cast(_DEC))
        )
        .cast("double")
        .alias("delta"),
    )


def q_event_funnel(spark, sf_dir):
    """Funnel analysis: per user, earliest view → first click AFTER
    that view → first purchase AFTER that click, with exact integer
    microsecond stage lags. Each stage is a conditional min over a
    broadcast join against the (tiny, one-row-per-user) previous-stage
    frame — no window over the full event log, no self-join of the
    fact table."""
    ev = _t(spark, sf_dir, "events")

    def stage(prev, etype, prev_col, out_col):
        return (
            ev.filter(F.col("event_type") == etype)
            .join(F.broadcast(prev), "user_id")
            .filter(F.col("ts") > F.col(prev_col))
            .groupBy("user_id", prev_col)
            .agg(F.min("ts").alias(out_col))
        )

    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("view_ts"))
    )
    clicks = stage(views, "click", "view_ts", "click_ts")
    purchases = stage(
        clicks.select("user_id", "click_ts"), "purchase", "click_ts",
        "purchase_ts",
    )
    out = (
        views.join(clicks.select("user_id", "click_ts"), "user_id", "left")
        .join(purchases.select("user_id", "purchase_ts"), "user_id", "left")
    )
    us = lambda c: F.unix_micros(c)  # noqa: E731
    return out.select(
        "user_id",
        "view_ts",
        (us(F.col("click_ts")) - us(F.col("view_ts"))).alias(
            "view_to_click_us"
        ),
        (us(F.col("purchase_ts")) - us(F.col("click_ts"))).alias(
            "click_to_purchase_us"
        ),
        F.col("click_ts").isNotNull().alias("clicked"),
        F.col("purchase_ts").isNotNull().alias("purchased"),
    )


REGISTRY["ext_event_funnel"] = (
    q_event_funnel,
    "WITH v AS (SELECT user_id, min(ts) AS view_ts FROM events "
    "WHERE event_type = 'view' GROUP BY user_id), "
    "c AS (SELECT e.user_id, v.view_ts, min(e.ts) AS click_ts FROM events e "
    "JOIN v ON e.user_id = v.user_id AND e.ts > v.view_ts "
    "WHERE e.event_type = 'click' GROUP BY e.user_id, v.view_ts), "
    "p AS (SELECT e.user_id, min(e.ts) AS purchase_ts FROM events e "
    "JOIN c ON e.user_id = c.user_id AND e.ts > c.click_ts "
    "WHERE e.event_type = 'purchase' GROUP BY e.user_id) "
    "SELECT v.user_id, v.view_ts, "
    "epoch_us(c.click_ts) - epoch_us(v.view_ts) AS view_to_click_us, "
    "epoch_us(p.purchase_ts) - epoch_us(c.click_ts) "
    "AS click_to_purchase_us, "
    "c.user_id IS NOT NULL AS clicked, "
    "p.user_id IS NOT NULL AS purchased "
    "FROM v LEFT JOIN c ON v.user_id = c.user_id "
    "LEFT JOIN p ON v.user_id = p.user_id",
)


def q_retention_cohorts(spark, sf_dir):
    """Retention cohorts: users grouped by first-activity week, counted
    by how many are active N weeks later — exact integer week buckets
    (epoch-day div 7) so the cohort matrix matches the oracle
    bit-for-bit. Two aggregations: first-activity per user (shuffle on
    user), then (cohort_week, offset) counts (shuffle on the tiny
    matrix key)."""
    ev = _t(spark, sf_dir, "events")
    wk = lambda c: F.expr(  # noqa: E731 - epoch week bucket
        f"datediff(CAST({c} AS DATE), DATE '1970-01-05') div 7"
    )
    first = (
        ev.groupBy("user_id")
        .agg(F.min(wk("ts")).alias("cohort_week"))
    )
    active = ev.select(
        "user_id", wk("ts").alias("active_week")
    ).distinct()
    return (
        active.join(F.broadcast(first), "user_id")
        .groupBy(
            "cohort_week",
            (F.col("active_week") - F.col("cohort_week")).alias(
                "weeks_since"
            ),
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


def q_approx_quantiles(spark, sf_dir):
    """A16: approximate percentiles (Greenwald-Khanna sketch — the
    quantile path at 100 TB where exact sort-based percentiles are
    impractical) checked the a9 way: the query emits the EXACT dyadic
    quantiles plus an in-query assertion that the sketch (accuracy
    1e4 → ±0.01% rank error) lands within the rank-error band's value
    spread; the oracle reproduces the exact values and the
    expected-true bound, so the sketch path is fully driver-checked."""
    li = _t(spark, sf_dir, "lineitem")
    g = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.5D)").alias("exact_median"),
        F.expr(
            "approx_percentile(l_quantity, 0.5D, 10000)"
        ).alias("_approx"),
        F.min("l_quantity").alias("_lo"),
        F.max("l_quantity").alias("_hi"),
    )
    # ±0.01% rank error on a [1, 50]-valued column: the estimate must
    # land within 1 quantity unit of the exact median
    return g.select(
        "l_returnflag",
        "exact_median",
        (F.abs(F.col("_approx") - F.col("exact_median")) <= F.lit(1.0))
        .alias("approx_within_band"),
    )


def q_triangle_count(spark, sf_dir):
    """Graph: exact triangle census of the n-gram near-dup graph (the
    clustering-coefficient numerator — how clique-like duplicate
    clusters are). Edges oriented a<b once, so each triangle a<b<c is
    counted exactly once by two equi-joins — the standard distributed
    shape; per-node counts come from exploding each triangle's three
    corners. The pair graph is orders of magnitude smaller than the
    corpus, and both joins hash-partition on a node key."""
    d = _t(spark, sf_dir, "documents")
    e = ngram_jaccard_pairs(d, k=3, threshold=0.2).select(
        F.col("id_a").alias("a"), F.col("id_b").alias("b")
    )
    # wedges a<b<c from edges (a,b) and (b,c), closed by edge (a,c)
    tri = (
        e.alias("e1")
        .join(
            e.select(F.col("a").alias("b"), F.col("b").alias("c")).alias(
                "e2"
            ),
            "b",
        )
        .join(
            e.select(F.col("a").alias("a2"), F.col("b").alias("c2")).alias(
                "e3"
            ),
            (F.col("a") == F.col("a2")) & (F.col("c") == F.col("c2")),
        )
        .select("a", "b", "c")
    )
    corners = tri.select(F.explode(F.array("a", "b", "c")).alias("doc_id"))
    return corners.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_triangles")
    )


def _sql_triangle_count() -> str:
    return f"""
WITH pairs AS ({_sql_ngram_jaccard()}),
e AS (SELECT id_a AS a, id_b AS b FROM pairs),
tri AS (
  SELECT e1.a, e1.b, e2.b AS c
  FROM e e1
  JOIN e e2 ON e1.b = e2.a
  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
),
corners AS (
  SELECT a AS doc_id FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
)
SELECT doc_id, count(*) AS n_triangles FROM corners GROUP BY doc_id
"""


REGISTRY["ext_triangle_count"] = (q_triangle_count, _sql_triangle_count())


def q_salted_agg(spark, sf_dir):
    """A17: skew-safe two-phase aggregation end-to-end — partial agg on
    (key, salt) splits a hot reducer key across n_salts tasks, final
    re-agg on the key. Decimal partials are exact, so the result is
    bit-identical to the direct aggregation the oracle computes — the
    salting is invisible in the answer, visible in the plan."""
    from uofi_payroll_etl_main_demo_spark.operators.skew import two_phase_agg

    ev = _t(spark, sf_dir, "events")
    out = two_phase_agg(
        ev,
        keys=["event_type"],
        aggs={
            "n_events": F.count(F.lit(1)).cast("bigint"),
            "sum_value": F.sum(F.col("value").cast(_DEC)),
        },
        salt_from=["event_id"],
        n_salts=16,
    )
    return out.select(
        "event_type",
        F.col("n_events").cast("bigint").alias("n_events"),
        F.col("sum_value").cast("double").alias("sum_value"),
    )


def q_anomaly_windows(spark, sf_dir):
    """Monitoring: flag 10-minute windows whose event count exceeds 2×
    the per-type median window count — the ops-dashboard anomaly shape.
    Exact arithmetic throughout: integer counts, a dyadic-probe median
    (bit-exact cross-engine), and an integer-vs-double comparison both
    engines evaluate identically. Two aggregations: windowed counts,
    then a tiny per-type median broadcast back."""
    ev = _t(spark, sf_dir, "events")
    win = (
        ev.groupBy(
            F.window("ts", "10 minutes").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
        )
    )
    med = win.groupBy("event_type").agg(
        F.expr("percentile(n_events, 0.5D)").alias("median_n")
    )
    return (
        win.join(F.broadcast(med), "event_type")
        .select(
            "window_start",
            "event_type",
            "n_events",
            "median_n",
            (F.col("n_events") > F.lit(2.0) * F.col("median_n")).alias(
                "anomalous"
            ),
        )
        .filter(F.col("anomalous"))
    )


def q_pipeline_training_data(spark, sf_dir):
    """North-star composite: the full training-data build — quality
    filter (fixed-point classifier) → exact dedup (md5 survivors) →
    mixture sampling to target source budgets → deterministic shard
    assignment. Every stage is the scale-shaped operator registered
    individually; the composition is one lazy plan end-to-end, and the
    oracle reproduces all four stages in plain (non-recursive) SQL."""
    from uofi_payroll_etl_main_demo_spark.ext.curation import (
        quality_classifier,
    )
    from uofi_payroll_etl_main_demo_spark.ext.dedup import exact_dedup
    from uofi_payroll_etl_main_demo_spark.ext.packing import shard_assignment
    from uofi_payroll_etl_main_demo_spark.operators.sampling import (
        mixture_take,
    )

    d = _t(spark, sf_dir, "documents")
    good = quality_classifier(d).filter("keep").select("doc_id")
    kept = d.join(good, "doc_id")
    deduped = exact_dedup(kept)
    mixed = mixture_take(deduped, _MIXTURE_BUDGETS)
    shards = shard_assignment(mixed, n_shards=8)
    return shards.join(
        mixed.select("doc_id", "source"), "doc_id"
    ).select("doc_id", "source", "shard", "shard_pos")


def _sql_pipeline_training_data(n_shards: int = 8) -> str:
    case = " ".join(
        f"WHEN '{s}' THEN {n}" for s, n in _MIXTURE_BUDGETS.items()
    )
    return f"""
WITH q AS ({_sql_quality_classifier()}),
kept AS (
  SELECT d.* FROM documents d JOIN q USING (doc_id) WHERE q.keep
),
surv AS (
  SELECT min(doc_id) AS doc_id FROM kept GROUP BY md5(text)
),
ded AS (SELECT k.* FROM kept k JOIN surv USING (doc_id)),
r AS (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT,
                    doc_id) AS rn
  FROM ded
),
mixed AS (
  SELECT doc_id, source FROM r
  WHERE rn <= CASE source {case} ELSE 0 END
),
h AS (
  SELECT doc_id, source,
         ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT AS h
  FROM mixed
)
SELECT doc_id, source, CAST(h % {n_shards} AS INTEGER) AS shard,
       row_number() OVER (PARTITION BY h % {n_shards} ORDER BY h, doc_id)
         - 1 AS shard_pos
FROM h
"""


REGISTRY["pipeline_training_data"] = (
    q_pipeline_training_data,
    _sql_pipeline_training_data(),
)


def q_length_bucketed_batches(spark, sf_dir):
    """Training-loader shape: dynamic batching by length — docs
    bucketed into 64-token length bands (so batch padding waste is
    bounded), then assigned deterministic batch numbers inside each
    band in portable-hash order (batch_size 8). All integer arithmetic;
    the within-band window partitions on the band key, so no global
    sort — each band's ordering is an independent task."""
    from uofi_payroll_etl_main_demo_spark.functions.text import token_count
    from pyspark.sql import Window

    d = _t(spark, sf_dir, "documents")
    base = d.select(
        "doc_id",
        token_count("text").alias("n_tokens"),
        F.expr(
            "cast(conv(substring(md5(cast(doc_id as string)), 1, 15), 16, 10)"
            " as bigint)"
        ).alias("__h"),
    ).withColumn("len_band", F.expr("n_tokens div 64"))
    w = Window.partitionBy("len_band").orderBy("__h", "doc_id")
    return base.select(
        "doc_id",
        "n_tokens",
        "len_band",
        F.expr(
            f"cast((row_number() over (partition by len_band "
            f"order by __h, doc_id)) - 1 as bigint) div 8"
        ).alias("batch_in_band"),
    )


REGISTRY["ext_length_bucketed_batches"] = (
    q_length_bucketed_batches,
    # Token count comes from the shared _TOKS twin (engine-portable
    # raw-char whitespace class), not a hand-rolled trim+\s+ split —
    # keeps this oracle in lockstep with tokenize_ws on U+000B /
    # non-space edge whitespace.
    f"WITH b AS (SELECT doc_id, "
    f"CAST(len({_TOKS}) AS BIGINT) AS n_tokens, "
    f"('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT AS h "
    f"FROM documents) "
    f"SELECT doc_id, n_tokens, n_tokens // 64 AS len_band, "
    f"CAST((row_number() OVER (PARTITION BY n_tokens // 64 "
    f"ORDER BY h, doc_id) - 1) // 8 AS BIGINT) AS batch_in_band "
    f"FROM b",
)


def q_session_stats(spark, sf_dir):
    """Composition: sessionize → per-user-session durations → corpus
    distribution panel (exact integer second totals + dyadic-probe
    quantiles). The funnel/engagement report built on the stateful
    sessionizer's batch twin."""
    from uofi_payroll_etl_main_demo_spark.streaming.events import sessionize

    s = sessionize(_t(spark, sf_dir, "events"), gap="30 minutes")
    d = s.select(
        "user_id",
        "n_events",
        (
            F.unix_micros("session_end") - F.unix_micros("session_start")
        ).alias("dur_us"),
    )
    return d.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.count_distinct("user_id").alias("n_users"),
        F.sum("n_events").alias("total_events"),
        F.sum("dur_us").alias("total_dur_us"),
        F.expr("percentile(dur_us, 0.5D)").alias("median_dur_us"),
        F.expr("percentile(n_events, 0.75D)").alias("q75_events"),
    )


REGISTRY["stream_session_stats"] = (
    q_session_stats,
    "WITH o AS (SELECT user_id, ts, event_id, "
    "CASE WHEN epoch_us(ts) - lag(epoch_us(ts), 1, CAST(0 AS BIGINT)) "
    "OVER w > 1800000000 THEN 1 ELSE 0 END AS new_s FROM events "
    "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
    "s AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id "
    "ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sess FROM o), "
    "g AS (SELECT user_id, sess, count(*) AS n_events, "
    "epoch_us(max(ts)) - epoch_us(min(ts)) AS dur_us "
    "FROM s GROUP BY user_id, sess) "
    "SELECT count(*) AS n_sessions, count(DISTINCT user_id) AS n_users, "
    "CAST(sum(n_events) AS BIGINT) AS total_events, "
    "CAST(sum(dur_us) AS BIGINT) AS total_dur_us, "
    "quantile_cont(dur_us, 0.5) AS median_dur_us, "
    "quantile_cont(n_events, 0.75) AS q75_events FROM g",
)


REGISTRY["stream_anomaly_windows"] = (
    q_anomaly_windows,
    "WITH win AS (SELECT time_bucket(INTERVAL '10 minutes', ts) "
    "AS window_start, event_type, count(*) AS n_events "
    "FROM events GROUP BY 1, 2), "
    "med AS (SELECT event_type, quantile_cont(n_events, 0.5) AS median_n "
    "FROM win GROUP BY event_type) "
    "SELECT window_start, event_type, n_events, median_n, "
    "n_events > 2.0 * median_n AS anomalous "
    "FROM win JOIN med USING (event_type) "
    "WHERE n_events > 2.0 * median_n",
)


REGISTRY["a17_salted_agg"] = (
    q_salted_agg,
    "SELECT event_type, count(*) AS n_events, "
    "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value "
    "FROM events GROUP BY event_type",
)


def q_merge_upsert(spark, sf_dir):
    """J12: snapshot MERGE/upsert — a deterministic update batch
    (every urgent open order gets its price re-stamped and status
    'U'; plus synthetic new orders) merged into the orders snapshot:
    matched keys replaced, unmatched inserted. Anti-join + union —
    no full-outer, one key shuffle."""
    from uofi_payroll_etl_main_demo_spark.operators.history import (
        merge_upsert,
    )

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    changed = (
        orders.filter(
            (F.col("o_orderstatus") == "O")
            & (F.col("o_orderkey") % 10 == 3)
        )
        .withColumn("o_orderstatus", F.lit("U"))
        .withColumn(
            "o_totalprice",
            (F.col("o_totalprice").cast(_DEC) * F.lit(2)).cast("double"),
        )
    )
    inserts = changed.limit(0).unionByName(
        spark.range(5).select(
            (F.lit(900_000_000) + F.col("id")).alias("o_orderkey"),
            F.lit(1).cast("long").alias("o_custkey"),
            F.lit("N").alias("o_orderstatus"),
            F.lit(0.0).alias("o_totalprice"),
        )
    )
    merged = merge_upsert(
        orders, changed.unionByName(inserts), keys=["o_orderkey"]
    )
    return merged.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice").cast(_DEC)).cast("double").alias("total"),
    )


REGISTRY["j12_merge_upsert"] = (
    q_merge_upsert,
    "WITH base AS (SELECT o_orderkey, o_custkey, o_orderstatus, "
    "o_totalprice FROM orders), "
    "changed AS (SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus, "
    "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 2 AS DOUBLE) "
    "AS o_totalprice FROM base "
    "WHERE o_orderstatus = 'O' AND o_orderkey % 10 = 3), "
    "inserts AS (SELECT 900000000 + r.range AS o_orderkey, "
    "CAST(1 AS BIGINT) AS o_custkey, 'N' AS o_orderstatus, "
    "0.0 AS o_totalprice FROM range(0, 5) r), "
    "upd AS (SELECT * FROM changed UNION ALL SELECT * FROM inserts), "
    "merged AS (SELECT * FROM base WHERE o_orderkey NOT IN "
    "(SELECT o_orderkey FROM upd) UNION ALL SELECT * FROM upd) "
    "SELECT o_orderstatus, count(*) AS n, "
    "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total "
    "FROM merged GROUP BY o_orderstatus",
)


REGISTRY["a16_approx_quantiles"] = (
    q_approx_quantiles,
    "SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS exact_median, "
    "abs(approx_quantile(l_quantity, 0.5) - quantile_cont(l_quantity, 0.5))"
    " <= 1.0 AS approx_within_band "
    "FROM lineitem GROUP BY l_returnflag",
)


REGISTRY["a15_retention_cohorts"] = (
    q_retention_cohorts,
    "WITH wk AS (SELECT user_id, "
    "datediff('day', DATE '1970-01-05', CAST(ts AS DATE)) // 7 AS w "
    "FROM events), "
    "f AS (SELECT user_id, min(w) AS cohort_week FROM wk GROUP BY user_id), "
    "a AS (SELECT DISTINCT user_id, w AS active_week FROM wk) "
    "SELECT f.cohort_week, a.active_week - f.cohort_week AS weeks_since, "
    "count(DISTINCT a.user_id) AS n_users "
    "FROM a JOIN f ON a.user_id = f.user_id "
    "GROUP BY 1, 2",
)


REGISTRY["j11_full_outer_recon"] = (
    q_full_outer_recon,
    "WITH o AS (SELECT o_custkey AS k, "
    "sum(CAST(o_totalprice AS DECIMAL(18,2))) AS order_total "
    "FROM orders GROUP BY 1), "
    "e AS (SELECT user_id AS k2, "
    "sum(CAST(value AS DECIMAL(18,2))) AS event_total "
    "FROM events GROUP BY 1) "
    "SELECT coalesce(k, k2) AS key, k IS NOT NULL AS in_orders, "
    "k2 IS NOT NULL AS in_events, "
    "CAST(order_total AS DOUBLE) AS order_total, "
    "CAST(event_total AS DOUBLE) AS event_total, "
    "CAST(coalesce(order_total, 0) - coalesce(event_total, 0) AS DOUBLE) "
    "AS delta "
    "FROM o FULL OUTER JOIN e ON k = k2",
)


REGISTRY["a14_quantiles"] = (
    q_quantiles,
    "SELECT l_returnflag, "
    "quantile_cont(l_quantity, 0.25) AS q25, "
    "quantile_cont(l_quantity, 0.5) AS q50, "
    "quantile_cont(l_quantity, 0.75) AS q75, "
    "quantile_cont(l_quantity, 0.875) AS q875 "
    "FROM lineitem GROUP BY l_returnflag",
)


# --------------------------------------------------------------------------
# Driver-correctness window ordering
#
# The driver differential-checks the FIRST 50 registry entries per round
# (CORRECTNESS_r{N}.json). Order the registry so every north-star
# operator — the LLM-data-pipeline stack, temporal joins, streaming
# batch-twins, sampling/SCD2, composite pipelines, and the analytic
# aggregate extensions — lands inside that window, followed by the
# relational basics (all driver-green in round 1, still oracle-checked
# by scripts/check_oracle.py and pytest).
# --------------------------------------------------------------------------

# ------------- round-3 curation/sampling/similarity extensions -------------


def q_dup_ngram_stats(spark, sf_dir):
    """Per-document cross-corpus duplicated-ngram fraction (C4/
    RefinedWeb-style duplicated-content prefilter) — shingle doc-
    frequencies, no pair graph (ext/textstats.py dup_ngram_stats)."""
    from uofi_payroll_etl_main_demo_spark.ext.textstats import (
        dup_ngram_stats,
    )

    return dup_ngram_stats(_t(spark, sf_dir, "documents"), k=3)


def _sql_dup_ngram_stats(k: int = 3) -> str:
    return f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           range(1, len(toks) - {k} + 2),
           i -> array_to_string(toks[i:i + {k - 1}], ' ')))) AS s
  FROM t WHERE len(toks) >= {k}
),
fq AS (SELECT s, count(*) AS c FROM sh GROUP BY s)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(sum(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_shingles,
       round(CAST(sum(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS dup_fraction
FROM sh JOIN fq USING (s) GROUP BY doc_id
"""


def q_gopher_rules(spark, sf_dir):
    """Gopher-style document quality rule panel (Rae et al. 2021
    public filter set): every rule a closed-form column + conjunction
    flag, one narrow shuffle-free projection (ext/curation.py)."""
    from uofi_payroll_etl_main_demo_spark.ext.curation import gopher_rules

    return gopher_rules(_t(spark, sf_dir, "documents"))


def _sql_gopher_rules(
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean: float = 3.0,
    max_mean: float = 10.0,
    max_symbol: float = 0.1,
    max_bullet: float = 0.9,
    max_ellipsis: float = 0.3,
    min_alpha: float = 0.8,
    min_stop: int = 2,
) -> str:
    from uofi_payroll_etl_main_demo_spark.ext.curation import (
        GOPHER_STOPWORDS,
    )

    stoplist = "[" + ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS) + "]"
    return f"""
WITH t AS (
  SELECT doc_id, {_TOKS} AS toks, str_split(text, chr(10)) AS lines, text
  FROM documents
), m AS (
  SELECT doc_id,
    CAST(len(toks) AS BIGINT) AS n_words,
    round(CASE WHEN len(toks) > 0 THEN
      CAST(list_aggregate(list_transform(toks, x -> CAST(length(x) AS DOUBLE)),
           'sum') AS DOUBLE) / len(toks) END, 6) AS mean_word_len,
    round(CASE WHEN len(toks) > 0 THEN
      CAST(len(regexp_extract_all(text, '#'))
           + len(regexp_extract_all(text, '\\.\\.\\.')) AS DOUBLE)
      / len(toks) END, 6) AS symbol_word_ratio,
    round(CASE WHEN len(lines) > 0 THEN
      CAST(len(list_filter(lines, x -> regexp_matches(x, '^\\s*[-*•]')))
           AS DOUBLE) / len(lines) END, 6) AS bullet_line_frac,
    round(CASE WHEN len(lines) > 0 THEN
      CAST(len(list_filter(lines,
                 x -> regexp_matches(x, '(\\.\\.\\.|…)\\s*$')))
           AS DOUBLE) / len(lines) END, 6) AS ellipsis_line_frac,
    round(CASE WHEN len(toks) > 0 THEN
      CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-zA-Z]')))
           AS DOUBLE) / len(toks) END, 6) AS alpha_word_frac,
    CAST(len(list_filter({stoplist},
           w -> list_contains(list_transform(toks, x -> lower(x)), w)))
         AS BIGINT) AS stopword_hits
  FROM t
)
SELECT *, coalesce(
    n_words BETWEEN {min_words} AND {max_words}
    AND mean_word_len BETWEEN {min_mean} AND {max_mean}
    AND symbol_word_ratio <= {max_symbol}
    AND bullet_line_frac <= {max_bullet}
    AND ellipsis_line_frac <= {max_ellipsis}
    AND alpha_word_frac >= {min_alpha}
    AND stopword_hits >= {min_stop}, FALSE) AS passes
FROM m
"""


def q_corpus_shuffle(spark, sf_dir):
    """Deterministic epoch shuffle: portable-hash shard + in-shard
    position — the sharded training-loader permutation with no global
    sort (operators/sampling.py corpus_shuffle)."""
    from uofi_payroll_etl_main_demo_spark.operators.sampling import (
        corpus_shuffle,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    return corpus_shuffle(docs, key="doc_id", epoch=1, shards=8)


def _sql_corpus_shuffle(epoch: int = 1, shards: int = 8) -> str:
    return f"""
WITH h AS (
  SELECT doc_id, source,
         CAST(('0x' || substr(md5('{epoch}:' || CAST(doc_id AS VARCHAR)),
               1, 15)) AS BIGINT) AS hh
  FROM documents)
SELECT doc_id, source, CAST(hh % {shards} AS INTEGER) AS shard,
       CAST(row_number() OVER (PARTITION BY hh % {shards}
            ORDER BY hh, doc_id) AS INTEGER) AS pos
FROM h
"""


def q_mixture_temperature(spark, sf_dir):
    """Temperature-scaled (alpha=0.7) per-source mixture weights +
    integer take budgets — the domain-rebalancing rule of public LLM
    data recipes (operators/sampling.py temperature_mixture_weights)."""
    from uofi_payroll_etl_main_demo_spark.operators.sampling import (
        temperature_mixture_weights,
    )

    return temperature_mixture_weights(
        _t(spark, sf_dir, "documents"), strata="source", alpha=0.7,
        budget=1000,
    )


def _sql_mixture_temperature(alpha: float = 0.7, budget: int = 1000) -> str:
    return f"""
WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
           FROM documents GROUP BY source)
SELECT source, n_docs,
       round(pow(CAST(n_docs AS DOUBLE), {alpha})
             / sum(pow(CAST(n_docs AS DOUBLE), {alpha})) OVER (), 6)
         AS weight,
       CAST(floor(pow(CAST(n_docs AS DOUBLE), {alpha})
             / sum(pow(CAST(n_docs AS DOUBLE), {alpha})) OVER ()
             * {budget}) AS BIGINT) AS take_budget
FROM c
"""


def q_knn_join_multiprobe(spark, sf_dir):
    """Self-KNN with multi-probe (hamming-1 bucket neighbors): recall
    recovery for boundary vectors; probe side explodes (1+planes)×,
    base side stays single-bucket — never all-pairs
    (ext/similarity.py knn_join_multiprobe)."""
    from uofi_payroll_etl_main_demo_spark.ext.similarity import (
        knn_join_multiprobe,
    )

    out = knn_join_multiprobe(
        _t(spark, sf_dir, "embeddings"), dim=64, k=3, n_planes=4,
        multiprobe_hamming=1,
    )
    return out.select(
        "vec_id",
        "neighbor_id",
        "cosine",
        F.col("rank").cast("bigint").alias("rank"),
    )


def _sql_knn_join_multiprobe(
    k: int = 3, dim: int = 64, n_planes: int = 4, seed: int = 42,
    hamming: int = 1,
) -> str:
    from uofi_payroll_etl_main_demo_spark.ext.similarity import _hyperplanes

    terms = []
    for bit, plane in enumerate(_hyperplanes(dim, n_planes, seed)):
        lst = "[" + ", ".join(repr(x) for x in plane) + "]"
        terms.append(
            f"(CASE WHEN list_dot_product(v, {lst}) >= 0 "
            f"THEN {1 << bit} ELSE 0 END)"
        )
    bucket = " + ".join(terms)
    return f"""
WITH b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
             {bucket} AS bucket FROM embeddings),
p AS (SELECT a.vec_id AS vec_id, x.vec_id AS neighbor_id,
             round(list_cosine_similarity(a.v, x.v), 6) AS cosine
      FROM b a JOIN b x
        ON bit_count(xor(a.bucket, x.bucket)) <= {hamming}
       AND a.vec_id <> x.vec_id)
SELECT vec_id, neighbor_id, cosine, rank FROM (
  SELECT vec_id, neighbor_id, cosine,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY cosine DESC, neighbor_id) AS rank
  FROM p)
WHERE rank <= {k}
"""


def q_boilerplate_stats(spark, sf_dir):
    """Per-document boilerplate fraction: share of k-gram OCCURRENCES
    whose shingle appears in >= 3 distinct documents (hot-passage /
    header-footer detector; ext/textstats.py boilerplate_stats —
    O(postings), no pair graph)."""
    from uofi_payroll_etl_main_demo_spark.ext.textstats import (
        boilerplate_stats,
    )

    return boilerplate_stats(
        _t(spark, sf_dir, "documents"), k=3, min_docs=3
    )


def _sql_boilerplate(k: int = 3, min_docs: int = 3) -> str:
    return f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
occ AS (
  SELECT doc_id, unnest(list_transform(
           range(1, len(toks) - {k} + 2),
           i -> array_to_string(toks[i:i + {k - 1}], ' '))) AS s
  FROM t WHERE len(toks) >= {k}
),
hot AS (SELECT s FROM (SELECT s, count(DISTINCT doc_id) AS c
                       FROM occ GROUP BY s) WHERE c >= {min_docs}),
tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles
        FROM occ GROUP BY doc_id),
nb AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS b
       FROM occ JOIN hot USING (s) GROUP BY doc_id)
SELECT tot.doc_id, n_shingles,
       COALESCE(b, 0) AS n_boilerplate,
       round(COALESCE(b, 0) / CAST(n_shingles AS DOUBLE), 6)
         AS boilerplate_fraction
FROM tot LEFT JOIN nb USING (doc_id)
"""


def q_boilerplate_passages(spark, sf_dir):
    """Top hot passages themselves: the 20 most-shared k-gram shingles
    (by distinct-document count, ties by text) with their doc counts —
    what a pipeline operator actually inspects before writing a
    boilerplate strip rule. Shuffles carry (hash, id) pairs until the
    final tiny top-k joins the strings back."""
    from uofi_payroll_etl_main_demo_spark.functions.text import (
        shingles_from_tokens,
        tokenize_ws,
    )

    docs = _t(spark, sf_dir, "documents")
    occ = docs.select(
        F.col("doc_id"), tokenize_ws("text").alias("__toks")
    ).select(
        "doc_id",
        F.explode(shingles_from_tokens(F.col("__toks"), 3)).alias(
            "passage"
        ),
    )
    return (
        occ.groupBy("passage")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy(F.desc("n_docs"), F.asc("passage"))
        .limit(20)
    )


def _sql_boilerplate_passages(k: int = 3, top_n: int = 20) -> str:
    return f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
occ AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           range(1, len(toks) - {k} + 2),
           i -> array_to_string(toks[i:i + {k - 1}], ' ')))) AS passage
  FROM t WHERE len(toks) >= {k}
)
SELECT passage, CAST(count(*) AS BIGINT) AS n_docs
FROM occ GROUP BY passage
ORDER BY n_docs DESC, passage LIMIT {top_n}
"""


def q_heavy_hitters_cms(spark, sf_dir):
    """Count-min-sketch accuracy report: exact top-20 tokens beside
    their CMS estimates (md5-derived portable hash rows, so the sketch
    is bit-identical cross-engine; estimate >= exact by construction —
    ext/sketches.py)."""
    from uofi_payroll_etl_main_demo_spark.ext.sketches import (
        heavy_hitters_report,
    )

    return heavy_hitters_report(
        _t(spark, sf_dir, "documents"), top_n=20, width=1024, depth=4
    )


def _sql_heavy_hitters_cms(
    top_n: int = 20, width: int = 1024, depth: int = 4
) -> str:
    return f"""
WITH tok AS (
  SELECT unnest(CASE WHEN trim(text) = '' THEN [] ELSE {_TOKS} END) AS term
  FROM documents),
exact AS (SELECT term, CAST(count(*) AS BIGINT) AS exact_count
          FROM tok GROUP BY term
          ORDER BY exact_count DESC, term LIMIT {top_n}),
counters AS (
  SELECT r.i AS row,
         CAST(('0x' || substr(md5(r.i || ':' || term), 1, 15)) AS BIGINT)
           % {width} AS col,
         CAST(count(*) AS BIGINT) AS cnt
  FROM tok CROSS JOIN range(0, {depth}) r(i) GROUP BY 1, 2),
probes AS (
  SELECT term, r.i AS row,
         CAST(('0x' || substr(md5(r.i || ':' || term), 1, 15)) AS BIGINT)
           % {width} AS col
  FROM exact CROSS JOIN range(0, {depth}) r(i))
SELECT e.term, e.exact_count,
       CAST(min(COALESCE(c.cnt, 0)) AS BIGINT) AS cms_count
FROM exact e JOIN probes p USING (term)
LEFT JOIN counters c ON c.row = p.row AND c.col = p.col
GROUP BY e.term, e.exact_count
"""


def q_dedup_recall_report(spark, sf_dir):
    """Dedup approximation audit: MinHash+LSH verified pairs vs the
    exact n-gram Jaccard pair set at the same threshold — one row of
    (n_exact, n_approx, n_common, recall, precision). Quantifies the
    banding recall trade the production path makes; both pair sets are
    the already-oracle-checked pipelines, composed."""
    docs = _t(spark, sf_dir, "documents")
    exact = ngram_jaccard_pairs(docs, k=3, threshold=0.2).select(
        "id_a", "id_b", F.lit(1).alias("e"), F.lit(0).alias("a")
    )
    approx = minhash_near_dup_pairs(
        docs, num_hashes=32, bands=16, k=3, threshold=0.2,
        hash_family="portable",
    ).select("id_a", "id_b", F.lit(0).alias("e"), F.lit(1).alias("a"))
    per = (
        exact.unionByName(approx)
        .groupBy("id_a", "id_b")
        .agg(F.max("e").alias("e"), F.max("a").alias("a"))
    )
    n_common = F.sum(
        F.when((F.col("e") == 1) & (F.col("a") == 1), 1).otherwise(0)
    )
    return per.agg(
        F.sum("e").cast("bigint").alias("n_exact"),
        F.sum("a").cast("bigint").alias("n_approx"),
        n_common.cast("bigint").alias("n_common"),
        F.round(n_common / F.sum("e"), 6).alias("recall"),
        F.round(n_common / F.sum("a"), 6).alias("precision"),
    )


def _sql_dedup_recall_report() -> str:
    return f"""
WITH exact AS (SELECT id_a, id_b FROM ({_sql_ngram_jaccard()}) q1),
approx AS (SELECT id_a, id_b FROM ({_sql_minhash_pairs()}) q2),
u AS (
  SELECT id_a, id_b, max(e) AS e, max(a) AS a FROM (
    SELECT id_a, id_b, 1 AS e, 0 AS a FROM exact
    UNION ALL SELECT id_a, id_b, 0, 1 FROM approx)
  GROUP BY id_a, id_b)
SELECT CAST(sum(e) AS BIGINT) AS n_exact,
       CAST(sum(a) AS BIGINT) AS n_approx,
       CAST(sum(CASE WHEN e = 1 AND a = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_common,
       round(sum(CASE WHEN e = 1 AND a = 1 THEN 1 ELSE 0 END)
             / CAST(sum(e) AS DOUBLE), 6) AS recall,
       round(sum(CASE WHEN e = 1 AND a = 1 THEN 1 ELSE 0 END)
             / CAST(sum(a) AS DOUBLE), 6) AS precision
FROM u
"""


def q_dedup_cluster_sizes(spark, sf_dir):
    """Dedup analytics: near-dup cluster-size histogram — how much of
    the corpus sits in duplicate groups of each size (the dataset-card
    view of the dedup graph). Composes the oracle-checked pair + CC
    stack; the histogram output is dimension-sized."""
    from uofi_payroll_etl_main_demo_spark.ext.clusters import (
        connected_components,
    )

    pairs = ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), k=3, threshold=0.2
    )
    per = (
        connected_components(pairs)
        .groupBy("comp")
        .agg(F.count(F.lit(1)).alias("cluster_size"))
    )
    return per.groupBy("cluster_size").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_clusters")
    )


def _sql_dedup_cluster_sizes() -> str:
    return f"""
WITH comp AS (SELECT * FROM ({_sql_dedup_clusters()}) q),
per AS (SELECT component, CAST(count(*) AS BIGINT) AS cluster_size
        FROM comp GROUP BY component)
SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters
FROM per GROUP BY cluster_size
"""


REGISTRY["ext_dedup_cluster_sizes"] = (
    q_dedup_cluster_sizes,
    _sql_dedup_cluster_sizes(),
)


def q_pipeline_curation_v2(spark, sf_dir):
    """Round-3 flagship composite: the full curation recipe of a public
    LLM-data pipeline as ONE lazy plan — Gopher rule panel →
    within-document repetition prefilter → exact near-dup cluster
    removal on the SURVIVORS (the cheap narrow prefilters shrink the
    pair-graph input first — order matters at 100 TB) → per-source
    temperature mixture weights + take budgets over the final corpus.
    Every stage is an already-oracle-checked operator; the composition
    is checked end-to-end against the composed SQL."""
    from uofi_payroll_etl_main_demo_spark.ext.clusters import (
        connected_components,
    )
    from uofi_payroll_etl_main_demo_spark.ext.curation import (
        gopher_rules,
        repetition_stats,
    )
    from uofi_payroll_etl_main_demo_spark.operators.sampling import (
        temperature_mixture_weights,
    )

    docs = _t(spark, sf_dir, "documents")
    # min_stopword_hits=0: the driver's synthetic corpus is word-soup
    # with zero canonical English stopwords — the rule would blank the
    # corpus; every other Gopher rule runs at its public default. The
    # repetition prefilter is WITHIN-document (corpus-size invariant —
    # cross-doc ngram stats saturate on this tiny-vocabulary corpus).
    # The rule panels are PERSISTED before their filters: filtering
    # directly on a derived column makes CollapseProject re-expand the
    # whole per-document expression tree once per referenced field
    # (measured 15× on the repetition panel — 30 s vs 2 s at sf0.1);
    # the cache is a collapse-proof stage boundary, and at 100 TB
    # materializing the rule panel before filtering is the standard
    # checkpoint anyway. base is additionally persisted because three
    # downstream plans consume it (pair generation, the survivor
    # anti-join, the final mixture agg).
    _drain_persist_pool()
    keep_q = (
        _pooled_persist(gopher_rules(docs, min_stopword_hits=0))
        .filter("passes")
        .select("doc_id")
    )
    keep_d = (
        _pooled_persist(repetition_stats(docs))
        .filter(~F.col("repetitive"))
        .select("doc_id")
    )
    # projected to the three consumed columns BEFORE the persist —
    # caching the full row would also cache (and scan) the unused ones
    base = _pooled_persist(
        docs.select("doc_id", "text", "source")
        .join(keep_q, "doc_id", "left_semi")
        .join(keep_d, "doc_id", "left_semi")
    )
    pairs = ngram_jaccard_pairs(base, k=3, threshold=0.2)
    losers = (
        connected_components(pairs)
        .filter(F.col("id") != F.col("comp"))
        .select(F.col("id").alias("doc_id"))
    )
    survivors = base.join(losers, "doc_id", "left_anti")
    return temperature_mixture_weights(
        survivors, strata="source", alpha=0.7, budget=1000
    )


def _sql_pipeline_curation_v2(alpha: float = 0.7, budget: int = 1000) -> str:
    return f"""
WITH RECURSIVE
g AS (SELECT doc_id FROM ({_sql_gopher_rules(min_stop=0)}) q1 WHERE passes),
dupf AS (SELECT doc_id FROM ({_sql_repetition()}) q2
         WHERE NOT repetitive),
base AS (SELECT d.* FROM documents d
         JOIN g USING (doc_id) JOIN dupf USING (doc_id)),
pairs AS (SELECT id_a, id_b
          FROM ({_sql_ngram_jaccard(table="base")}) q3),
edges AS (
  SELECT id_a AS s, id_b AS d FROM pairs
  UNION SELECT id_b, id_a FROM pairs),
reach(src, node) AS (
  SELECT s, s FROM edges
  UNION
  SELECT r.src, e.d FROM reach r JOIN edges e ON r.node = e.s),
losers AS (SELECT src AS doc_id FROM reach GROUP BY src
           HAVING min(node) <> src),
surv AS (SELECT * FROM base
         WHERE doc_id NOT IN (SELECT doc_id FROM losers)),
c AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
      FROM surv GROUP BY source)
SELECT source, n_docs,
       round(pow(CAST(n_docs AS DOUBLE), {alpha})
             / sum(pow(CAST(n_docs AS DOUBLE), {alpha})) OVER (), 6)
         AS weight,
       CAST(floor(pow(CAST(n_docs AS DOUBLE), {alpha})
             / sum(pow(CAST(n_docs AS DOUBLE), {alpha})) OVER ()
             * {budget}) AS BIGINT) AS take_budget
FROM c
"""


REGISTRY["pipeline_curation_v2"] = (
    q_pipeline_curation_v2,
    _sql_pipeline_curation_v2(),
)
REGISTRY["ext_boilerplate_stats"] = (q_boilerplate_stats, _sql_boilerplate())
REGISTRY["ext_boilerplate_passages"] = (
    q_boilerplate_passages,
    _sql_boilerplate_passages(),
)
REGISTRY["ext_heavy_hitters_cms"] = (
    q_heavy_hitters_cms,
    _sql_heavy_hitters_cms(),
)
REGISTRY["ext_dedup_recall_report"] = (
    q_dedup_recall_report,
    _sql_dedup_recall_report(),
)
REGISTRY["ext_dup_ngram_stats"] = (q_dup_ngram_stats, _sql_dup_ngram_stats())
REGISTRY["ext_gopher_rules"] = (q_gopher_rules, _sql_gopher_rules())
REGISTRY["ext_corpus_shuffle"] = (q_corpus_shuffle, _sql_corpus_shuffle())
REGISTRY["ext_mixture_temperature"] = (
    q_mixture_temperature,
    _sql_mixture_temperature(),
)
REGISTRY["ext_knn_join_multiprobe"] = (
    q_knn_join_multiprobe,
    _sql_knn_join_multiprobe(),
)


def q_quality_agreement(spark, sf_dir):
    """Curation QA: agreement matrix between the two quality filters —
    the fixed-point linear classifier's keep flag × the Gopher rule
    panel's pass flag (stopword rule relaxed for the synthetic corpus).
    The 2×2 counts are what an operator reviews before trusting one
    filter to replace the other."""
    from uofi_payroll_etl_main_demo_spark.ext.curation import (
        gopher_rules,
        quality_classifier,
    )

    docs = _t(spark, sf_dir, "documents")
    clf = quality_classifier(docs).select("doc_id", "keep")
    rules = gopher_rules(docs, min_stopword_hits=0).select(
        "doc_id", "passes"
    )
    return (
        clf.join(rules, "doc_id")
        .groupBy("keep", "passes")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def _sql_quality_agreement() -> str:
    return f"""
WITH clf AS (SELECT doc_id, keep FROM ({_sql_quality_classifier()}) q1),
rules AS (SELECT doc_id, passes
          FROM ({_sql_gopher_rules(min_stop=0)}) q2)
SELECT keep, passes, CAST(count(*) AS BIGINT) AS n_docs
FROM clf JOIN rules USING (doc_id)
GROUP BY keep, passes
"""


REGISTRY["ext_quality_agreement"] = (
    q_quality_agreement,
    _sql_quality_agreement(),
)


def q_corpus_diff(spark, sf_dir):
    """Snapshot corpus diff (CDC shape): two deterministic snapshot
    views of the documents table, full-outer-joined on id at md5
    granularity — the shuffle carries (id, 32-char hash), never text —
    and classified added/removed/changed/unchanged. The counts panel
    is what an ingestion run logs between corpus versions."""
    docs = _t(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 10 != 0).select(
        "doc_id", F.md5("text").alias("__h_old")
    )
    new = docs.filter(F.col("doc_id") % 7 != 0).select(
        "doc_id",
        F.md5(
            F.concat(
                F.col("text"),
                F.when(F.col("doc_id") % 13 == 0, F.lit(" rev2")).otherwise(
                    F.lit("")
                ),
            )
        ).alias("__h_new"),
    )
    j = old.join(new, "doc_id", "full_outer")
    status = (
        F.when(F.col("__h_old").isNull(), F.lit("added"))
        .when(F.col("__h_new").isNull(), F.lit("removed"))
        .when(F.col("__h_old") != F.col("__h_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.groupBy(status.alias("status")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )


def _sql_corpus_diff() -> str:
    return """
WITH old AS (SELECT doc_id, md5(text) AS h FROM documents
             WHERE doc_id % 10 != 0),
new AS (SELECT doc_id,
               md5(text || CASE WHEN doc_id % 13 = 0
                                THEN ' rev2' ELSE '' END) AS h
        FROM documents WHERE doc_id % 7 != 0)
SELECT CASE WHEN o.h IS NULL THEN 'added'
            WHEN n.h IS NULL THEN 'removed'
            WHEN o.h != n.h THEN 'changed'
            ELSE 'unchanged' END AS status,
       CAST(count(*) AS BIGINT) AS n_docs
FROM old o FULL OUTER JOIN new n USING (doc_id)
GROUP BY 1
"""


REGISTRY["ext_corpus_diff"] = (q_corpus_diff, _sql_corpus_diff())


def q_pair_threshold_histogram(spark, sf_dir):
    """Dedup threshold calibration: exact Jaccard pairs at a LOW floor
    (0.05), bucketed into 0.1-wide similarity bands — the histogram an
    operator reads to pick the production dedup threshold. One pair
    pass serves every candidate threshold (identical double arithmetic
    on both engines makes even the band edges exact)."""
    pairs = ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), k=3, threshold=0.05
    )
    # band on the ROUND-6 value: the SQL twin emits round-6 jaccard, so
    # banding the raw double could flip a pair sitting within 5e-7 of a
    # band edge on one side only
    band = F.floor(F.round("jaccard", 6) * 10).cast("bigint")
    return pairs.groupBy(band.alias("band")).agg(
        F.count(F.lit(1)).alias("n_pairs")
    )


def _sql_pair_threshold_histogram() -> str:
    return f"""
WITH pairs AS (
  SELECT jaccard FROM ({_sql_ngram_jaccard(threshold=0.05)}) q)
SELECT CAST(floor(jaccard * 10) AS BIGINT) AS band,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM pairs GROUP BY 1
"""


REGISTRY["ext_pair_threshold_histogram"] = (
    q_pair_threshold_histogram,
    _sql_pair_threshold_histogram(),
)


def q_length_bands_by_source(spark, sf_dir):
    """Loader planning: per-source token-length band histogram (bands
    of 32 tokens — the sequence-packing efficiency preview: how much
    of each domain fits a context window without truncation). Narrow
    map + one grouped agg; integer banding is engine-exact."""
    from uofi_payroll_etl_main_demo_spark.functions.text import token_count

    docs = _t(spark, sf_dir, "documents")
    band = F.expr("n_tok div 32").cast("bigint")
    return (
        docs.select("source", token_count("text").alias("n_tok"))
        .groupBy("source", band.alias("len_band"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
        )
    )


def _sql_length_bands_by_source() -> str:
    return f"""
WITH t AS (
  SELECT source,
         CAST(CASE WHEN trim(text) = '' THEN 0
                   ELSE len({_TOKS}) END AS BIGINT) AS n_tok
  FROM documents)
SELECT source, CAST(n_tok // 32 AS BIGINT) AS len_band,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS n_tokens
FROM t GROUP BY 1, 2
"""


REGISTRY["ext_length_bands_by_source"] = (
    q_length_bands_by_source,
    _sql_length_bands_by_source(),
)


def q_source_quality_panel(spark, sf_dir):
    """Dataset card v2: per-source corpus health — doc count, mean
    quality score, mean cross-doc duplication fraction, mean
    boilerplate fraction — three per-document panels joined and
    aggregated by source in one lazy plan. Means go through
    DECIMAL(18,6) sums of the round-6 per-doc values (associative ⇒
    partition-order independent), so the panel is engine-exact."""
    from uofi_payroll_etl_main_demo_spark.ext.textstats import (
        boilerplate_stats,
        document_stats,
        dup_ngram_stats,
    )

    docs = _t(spark, sf_dir, "documents")
    dec = "decimal(18,6)"
    q = document_stats(docs).select(
        "doc_id", F.round("quality", 6).cast(dec).alias("q")
    )
    d = dup_ngram_stats(docs, k=3).select(
        "doc_id", F.col("dup_fraction").cast(dec).alias("d")
    )
    b = boilerplate_stats(docs, k=3, min_docs=3).select(
        "doc_id", F.col("boilerplate_fraction").cast(dec).alias("b")
    )
    j = (
        docs.select("doc_id", "source")
        .join(q, "doc_id")
        .join(d, "doc_id", "left")
        .join(b, "doc_id", "left")
    )
    n = F.count(F.lit(1))
    return j.groupBy("source").agg(
        n.alias("n_docs"),
        F.round(F.sum("q").cast("double") / n, 6).alias("avg_quality"),
        F.round(
            F.sum(F.coalesce("d", F.lit(0).cast("decimal(18,6)"))).cast(
                "double"
            )
            / n,
            6,
        ).alias("avg_dup_fraction"),
        F.round(
            F.sum(F.coalesce("b", F.lit(0).cast("decimal(18,6)"))).cast(
                "double"
            )
            / n,
            6,
        ).alias("avg_boilerplate"),
    )


def _sql_source_quality_panel() -> str:
    return f"""
WITH q AS (SELECT doc_id, CAST(quality AS DECIMAL(18,6)) AS q
           FROM ({_sql_doc_stats()}) s1),
d AS (SELECT doc_id, CAST(dup_fraction AS DECIMAL(18,6)) AS d
      FROM ({_sql_dup_ngram_stats()}) s2),
b AS (SELECT doc_id, CAST(boilerplate_fraction AS DECIMAL(18,6)) AS b
      FROM ({_sql_boilerplate()}) s3),
j AS (SELECT dd.source, q.q, d.d, b.b
      FROM documents dd
      JOIN q ON dd.doc_id = q.doc_id
      LEFT JOIN d ON dd.doc_id = d.doc_id
      LEFT JOIN b ON dd.doc_id = b.doc_id)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       round(CAST(sum(q) AS DOUBLE) / count(*), 6) AS avg_quality,
       round(CAST(sum(COALESCE(d, 0)) AS DOUBLE) / count(*), 6)
         AS avg_dup_fraction,
       round(CAST(sum(COALESCE(b, 0)) AS DOUBLE) / count(*), 6)
         AS avg_boilerplate
FROM j GROUP BY source
"""


REGISTRY["ext_source_quality_panel"] = (
    q_source_quality_panel,
    _sql_source_quality_panel(),
)


def q_weekly_trend(spark, sf_dir):
    """Time-series trend: weekly event counts per type with the
    week-over-week integer delta (lag window over the weekly agg —
    integer deltas are engine-exact; the weekly truncation uses Monday
    anchoring in both engines)."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    weekly = ev.groupBy(
        F.date_trunc("week", F.col("ts")).alias("week_start"),
        "event_type",
    ).agg(F.count(F.lit(1)).alias("n_events"))
    w = Window.partitionBy("event_type").orderBy("week_start")
    return weekly.select(
        F.date_format("week_start", "yyyy-MM-dd").alias("week_start"),
        "event_type",
        "n_events",
        (F.col("n_events") - F.lag("n_events", 1).over(w)).alias(
            "wow_delta"
        ),
    )


def _sql_weekly_trend() -> str:
    return """
WITH weekly AS (
  SELECT date_trunc('week', ts) AS ws, event_type,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2)
SELECT strftime(ws, '%Y-%m-%d') AS week_start, event_type, n_events,
       n_events - lag(n_events, 1)
         OVER (PARTITION BY event_type ORDER BY ws) AS wow_delta
FROM weekly
"""


REGISTRY["ext_weekly_trend"] = (q_weekly_trend, _sql_weekly_trend())


def q_user_gap_stats(spark, sf_dir):
    """Behavioral cadence: per-user inter-event gap stats (count,
    median, max of consecutive-event gaps in MICROSECOND integers —
    the lag differences are exact longs; the median's (x+y)/2
    interpolation over integers is exact in binary, the a14 quantile
    discipline). Users with a single event have no gaps and no row."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        ev.select(
            "user_id",
            (
                F.unix_micros("ts")
                - F.lag(F.unix_micros("ts"), 1).over(w)
            ).alias("gap_us"),
        )
        .filter(F.col("gap_us").isNotNull())
    )
    return gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.expr("percentile(gap_us, 0.5)").alias("median_gap_us"),
        F.max("gap_us").alias("max_gap_us"),
    )


def _sql_user_gap_stats() -> str:
    return """
WITH g AS (
  SELECT user_id,
         epoch_us(ts) - lag(epoch_us(ts), 1)
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM events)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
       quantile_cont(gap_us, 0.5) AS median_gap_us,
       CAST(max(gap_us) AS BIGINT) AS max_gap_us
FROM g WHERE gap_us IS NOT NULL
GROUP BY user_id
"""


REGISTRY["ext_user_gap_stats"] = (q_user_gap_stats, _sql_user_gap_stats())


def q_cross_source_dup_matrix(spark, sf_dir):
    """Provenance leakage: near-dup pair counts per (source, source)
    cell — which domains copy from which (ordered pair of source names
    so the matrix cell is deterministic). Composes the oracle-checked
    exact pair generator with two broadcast-size dimension joins."""
    docs = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, k=3, threshold=0.2)
    src = docs.select("doc_id", "source")
    a = src.select(
        F.col("doc_id").alias("id_a"), F.col("source").alias("__sa")
    )
    b = src.select(
        F.col("doc_id").alias("id_b"), F.col("source").alias("__sb")
    )
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .groupBy(
            F.least("__sa", "__sb").alias("source_a"),
            F.greatest("__sa", "__sb").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


def _sql_cross_source_dup_matrix() -> str:
    return f"""
WITH pairs AS (SELECT id_a, id_b FROM ({_sql_ngram_jaccard()}) q)
SELECT least(da.source, db.source) AS source_a,
       greatest(da.source, db.source) AS source_b,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM pairs
JOIN documents da ON da.doc_id = pairs.id_a
JOIN documents db ON db.doc_id = pairs.id_b
GROUP BY 1, 2
"""


REGISTRY["ext_cross_source_dup_matrix"] = (
    q_cross_source_dup_matrix,
    _sql_cross_source_dup_matrix(),
)


def q_token_share_drift(spark, sf_dir):
    """Vocabulary drift monitor: the 20 most frequent tokens of the
    OLD snapshot with their counts in both snapshots and the integer
    delta — the distribution-shift canary an ingestion run logs
    between corpus versions (same deterministic snapshot views as
    ext_corpus_diff)."""
    from uofi_payroll_etl_main_demo_spark.functions.text import tokenize_ws

    docs = _t(spark, sf_dir, "documents")
    def toks(df):
        return df.select(F.explode(tokenize_ws("text")).alias("term"))

    old = toks(docs.filter(F.col("doc_id") % 10 != 0))
    new = toks(docs.filter(F.col("doc_id") % 7 != 0))
    top_old = (
        old.groupBy("term")
        .agg(F.count(F.lit(1)).alias("n_old"))
        .orderBy(F.desc("n_old"), F.asc("term"))
        .limit(20)
    )
    n_new = new.groupBy("term").agg(F.count(F.lit(1)).alias("n_new"))
    return (
        top_old.join(n_new, "term", "left")
        .select(
            "term",
            "n_old",
            F.coalesce("n_new", F.lit(0)).cast("bigint").alias("n_new"),
            (F.coalesce("n_new", F.lit(0)) - F.col("n_old"))
            .cast("bigint")
            .alias("delta"),
        )
    )


def _sql_token_share_drift(top_n: int = 20) -> str:
    return f"""
WITH old_t AS (
  SELECT unnest(CASE WHEN trim(text) = '' THEN [] ELSE {_TOKS} END) AS term
  FROM documents WHERE doc_id % 10 != 0),
new_t AS (
  SELECT unnest(CASE WHEN trim(text) = '' THEN [] ELSE {_TOKS} END) AS term
  FROM documents WHERE doc_id % 7 != 0),
top_old AS (SELECT term, CAST(count(*) AS BIGINT) AS n_old
            FROM old_t GROUP BY term
            ORDER BY n_old DESC, term LIMIT {top_n}),
nn AS (SELECT term, CAST(count(*) AS BIGINT) AS n_new
       FROM new_t GROUP BY term)
SELECT t.term, t.n_old, COALESCE(nn.n_new, 0) AS n_new,
       COALESCE(nn.n_new, 0) - t.n_old AS delta
FROM top_old t LEFT JOIN nn USING (term)
"""


REGISTRY["ext_token_share_drift"] = (
    q_token_share_drift,
    _sql_token_share_drift(),
)


def q_frame_sample_plan(spark, sf_dir):
    """Multimodal: video frame-sampling PLAN — one row per planned
    frame via relational sequence+explode over duration metadata
    (ext/multimodal.py frame_sample_plan; the decode of each frame
    plugs into extract_features). Zero-duration videos contribute one
    frame at t=0. Full value oracle from the deterministic metadata."""
    from uofi_payroll_etl_main_demo_spark.ext.multimodal import (
        frame_sample_plan,
        synthetic_media,
    )

    out = frame_sample_plan(synthetic_media(spark, n=64), every_ms=1000)
    return out.select(
        "media_id", F.col("frame_ms").cast("bigint").alias("frame_ms")
    )


def _sql_frame_sample_plan() -> str:
    """synthetic_media: i % 3 == 2 → video with duration_ms =
    1000·(i % 10); frames every 1000 ms over [0, duration), with the
    zero-duration edge collapsing to a single frame at 0 (Spark's
    sequence(0, greatest(d-1, 0), 1000) == range(0, greatest(d-1,0)+1,
    1000))."""
    return """
SELECT i AS media_id,
       CAST(unnest(range(0, greatest(1000 * (i % 10) - 1, 0) + 1, 1000))
            AS BIGINT) AS frame_ms
FROM range(0, 64) t(i) WHERE i % 3 = 2
"""


REGISTRY["ext_frame_sample_plan"] = (
    q_frame_sample_plan,
    _sql_frame_sample_plan(),
)


def q_image_dhash_pairs(spark, sf_dir):
    """Perceptual-hash image dedup: REAL P6-PPM decode → 64-bit dHash
    (block-mean downscale + neighbor-comparison bits, mapInPandas) →
    pigeonhole-banded Hamming pairs via the signature-agnostic
    ``hamming_pairs_64``. The corpus is the deterministic gradient
    table whose odd ids are bytewise-different but luminance-identical
    twins of their even neighbor — the re-encode dedup case perceptual
    hashing exists for. Oracle: the pixel law is closed-form, so DuckDB
    recomputes every block mean, every bit, every Hamming distance."""
    from uofi_payroll_etl_main_demo_spark.ext.dedup import hamming_pairs_64
    from uofi_payroll_etl_main_demo_spark.ext.multimodal import (
        image_dhash,
        synthetic_gradient_images,
    )

    media = synthetic_gradient_images(spark, n=48)
    sigs = image_dhash(media)
    return hamming_pairs_64(
        sigs, "media_id", "dhash", max_hamming=3
    ).select("id_a", "id_b", F.col("hamming").cast("int").alias("hamming"))


def _sql_image_dhash_hv(
    n: int = 48, width: int = 18, height: int = 16
) -> str:
    """Shared CTE block: closed-form dHash (``hv``: i, dhash) for the
    gradient-image fixture law — used by the batch and incremental
    image-dedup oracles."""
    return f"""px AS (
  SELECT i, r, c, 3 + ((i // 2) * 37 + c * c * 11 + r * 7) % 237 AS gray
  FROM range(0, {n}) t(i), range(0, {height}) rr(r), range(0, {width}) cc(c)
),
bm AS (
  SELECT i, r // 2 AS br, c // 2 AS bc, avg(gray) AS m
  FROM px GROUP BY i, r // 2, c // 2
),
bits AS (
  SELECT a.i, a.br * 8 + a.bc AS idx,
         CASE WHEN b.m > a.m THEN 1 ELSE 0 END AS bit
  FROM bm a JOIN bm b ON a.i = b.i AND a.br = b.br AND b.bc = a.bc + 1
  WHERE a.bc < 8
),
hv AS (
  SELECT i,
    CAST(sum(CASE WHEN idx = 63 AND bit = 1 THEN -9223372036854775808
             WHEN bit = 1 THEN (1::BIGINT << idx) ELSE 0 END) AS BIGINT)
      AS dhash
  FROM bits GROUP BY i
)"""


def _sql_image_dhash_pairs(
    n: int = 48, width: int = 18, height: int = 16, max_hamming: int = 3
) -> str:
    return f"""
WITH {_sql_image_dhash_hv(n, width, height)}
SELECT a.i AS id_a, b.i AS id_b,
       CAST(bit_count(xor(a.dhash, b.dhash)) AS INTEGER) AS hamming
FROM hv a JOIN hv b ON a.i < b.i
WHERE bit_count(xor(a.dhash, b.dhash)) <= {max_hamming}
"""


REGISTRY["ext_image_dhash_pairs"] = (
    q_image_dhash_pairs,
    _sql_image_dhash_pairs(),
)


def q_image_whash_pairs(spark, sf_dir):
    """Frequency-domain perceptual dedup: Walsh–Hadamard hash
    (ext/multimodal.py image_whash — the ±1 INTEGER analogue of
    pHash's DCT, so the transform is engine-exact) over the gradient
    PPM fixture → banded Hamming pairs. The channel-shifted twins are
    channel-SUM identical, so they hash identically (hamming 0;
    cross-pattern min 6 measured — threshold 3 yields exactly the 24
    twin pairs). Oracle: DuckDB rebuilds grayscale → crop → block
    sums → H·X·H via a 64-row Hadamard VALUES table → exact
    32nd-order-statistic median → every bit, then the pairs."""
    from uofi_payroll_etl_main_demo_spark.ext.dedup import hamming_pairs_64
    from uofi_payroll_etl_main_demo_spark.ext.multimodal import (
        image_whash,
        synthetic_gradient_images,
    )

    media = synthetic_gradient_images(spark, n=48)
    sigs = image_whash(media)
    return hamming_pairs_64(
        sigs, "media_id", "whash", max_hamming=3
    ).select("id_a", "id_b", F.col("hamming").cast("int").alias("hamming"))


def _sql_image_whash_hv(
    n: int = 48, width: int = 18, height: int = 16, p: str = ""
) -> str:
    """Shared CTE block: closed-form Walsh–Hadamard hash
    (``{p}whv``: i, whash) for the gradient-image fixture law — ONE
    SQL copy of the whash law, prefixed so composed oracles (the
    consensus pairs) can inline it beside the dhash block without CTE
    name collisions."""
    from uofi_payroll_etl_main_demo_spark.ext.multimodal import _hadamard8

    H = _hadamard8()
    hvals = ", ".join(
        f"({u},{j},{int(H[u, j])})" for u in range(8) for j in range(8)
    )
    w8 = (width // 8) * 8
    h8 = (height // 8) * 8
    return f"""{p}h(u, j, s) AS (VALUES {hvals}),
{p}px AS (
  SELECT i, r, c,
         3 * (3 + ((i // 2) * 37 + c * c * 11 + r * 7) % 237) AS gray3
  FROM range(0, {n}) t(i), range(0, {h8}) rr(r), range(0, {width}) cc(c)
  WHERE c < {w8}
),
{p}bm AS (
  SELECT i, r // {h8 // 8} AS br, c // {w8 // 8} AS bc, sum(gray3) AS x
  FROM {p}px GROUP BY i, r // {h8 // 8}, c // {w8 // 8}
),
{p}wht AS (
  SELECT bm.i, h1.u AS u, h2.u AS v, sum(h1.s * bm.x * h2.s) AS y
  FROM {p}bm bm JOIN {p}h h1 ON h1.j = bm.br
               JOIN {p}h h2 ON h2.j = bm.bc
  GROUP BY bm.i, h1.u, h2.u
),
{p}ac AS (SELECT i, u * 8 + v AS k, y FROM {p}wht
          WHERE NOT (u = 0 AND v = 0)),
{p}med AS (
  SELECT i, y AS m FROM (
    SELECT i, y, row_number() OVER (PARTITION BY i ORDER BY y) AS rn
    FROM {p}ac
  ) WHERE rn = 32
),
{p}whv AS (
  SELECT ac.i, CAST(sum(CASE WHEN ac.y > med.m
                 THEN (1::BIGINT << (ac.k - 1)) ELSE 0 END) AS BIGINT)
           AS whash
  FROM {p}ac ac JOIN {p}med med ON ac.i = med.i GROUP BY ac.i
)"""


def _sql_image_whash_pairs(
    n: int = 48, width: int = 18, height: int = 16, max_hamming: int = 3
) -> str:
    return f"""
WITH {_sql_image_whash_hv(n, width, height)}
SELECT a.i AS id_a, b.i AS id_b,
       CAST(bit_count(xor(a.whash, b.whash)) AS INTEGER) AS hamming
FROM whv a JOIN whv b ON a.i < b.i
WHERE bit_count(xor(a.whash, b.whash)) <= {max_hamming}
"""


REGISTRY["ext_image_whash_pairs"] = (
    q_image_whash_pairs,
    _sql_image_whash_pairs(),
)


def q_image_consensus_pairs(spark, sf_dir):
    """Hash-ENSEMBLE image dedup: a pair counts only when BOTH
    orthogonal fingerprints agree — dHash (spatial gradients) within
    3 bits AND the Walsh–Hadamard hash (frequency signs) within 3
    bits. Single-hash near-collisions rarely survive a second
    independent law, so the ensemble trades recall for precision —
    the standard production guard before destructive media dedup.
    Plan: two narrow hash passes over one fixture scan, two banded
    pair sets, one integer equi-join. Oracle: the intersection of the
    two laws, both recomputed exactly."""
    from uofi_payroll_etl_main_demo_spark.ext.dedup import hamming_pairs_64
    from uofi_payroll_etl_main_demo_spark.ext.multimodal import (
        image_dhash,
        image_whash,
        synthetic_gradient_images,
    )

    media = synthetic_gradient_images(spark, n=48)
    dpairs = hamming_pairs_64(
        image_dhash(media), "media_id", "dhash", max_hamming=3
    ).select("id_a", "id_b", F.col("hamming").alias("hamming_d"))
    wpairs = hamming_pairs_64(
        image_whash(media), "media_id", "whash", max_hamming=3
    ).select("id_a", "id_b", F.col("hamming").alias("hamming_w"))
    return dpairs.join(wpairs, ["id_a", "id_b"]).select(
        "id_a",
        "id_b",
        F.col("hamming_d").cast("int").alias("hamming_d"),
        F.col("hamming_w").cast("int").alias("hamming_w"),
    )


def _sql_image_consensus_pairs(
    n: int = 48, width: int = 18, height: int = 16, max_hamming: int = 3
) -> str:
    # intersection of the two laws: BOTH hash pipelines come from
    # their shared single-copy CTE builders (_sql_image_dhash_hv /
    # _sql_image_whash_hv) — a fixture-law tweak lands in every
    # oracle at once or none
    return f"""
WITH {_sql_image_dhash_hv(n, width, height)},
{_sql_image_whash_hv(n, width, height, p="c")}
SELECT a.i AS id_a, b.i AS id_b,
       CAST(bit_count(xor(a.dhash, b.dhash)) AS INTEGER) AS hamming_d,
       CAST(bit_count(xor(wa.whash, wb.whash)) AS INTEGER) AS hamming_w
FROM hv a
JOIN hv b ON a.i < b.i
JOIN cwhv wa ON wa.i = a.i
JOIN cwhv wb ON wb.i = b.i
WHERE bit_count(xor(a.dhash, b.dhash)) <= {max_hamming}
  AND bit_count(xor(wa.whash, wb.whash)) <= {max_hamming}
"""


REGISTRY["ext_image_consensus_pairs"] = (
    q_image_consensus_pairs,
    _sql_image_consensus_pairs(),
)


def q_video_keyframes(spark, sf_dir):
    """Shot-boundary detection over the scene-structured frame fixture
    (ext/multimodal.py video_keyframes): per-frame dHash, one
    per-video lag window, keyframe where the hash jumps >= 8 bits (or
    the first frame). The fixture's within-scene distance is 0 and its
    boundary distance 22–36, so the detected keyframes are exactly the
    scene starts — and the oracle recomputes every dHash bit, lag and
    threshold from the closed-form pixel law."""
    from uofi_payroll_etl_main_demo_spark.ext.multimodal import (
        synthetic_scene_videos,
        video_keyframes,
    )

    frames = synthetic_scene_videos(spark, n_videos=8)
    return video_keyframes(frames, min_hamming=8)


def _sql_video_keyframes(
    n_videos: int = 8,
    scenes: int = 4,
    scene_len: int = 4,
    width: int = 18,
    height: int = 16,
    min_hamming: int = 8,
) -> str:
    return f"""
WITH px AS (
  SELECT i, sc, r, c,
         3 + ((i // 2) * 37 + sc * 53 + c * c * 11 + r * 7) % 237 AS gray
  FROM range(0, {n_videos}) t(i), range(0, {scenes}) ss(sc),
       range(0, {height}) rr(r), range(0, {width}) cc(c)
),
bm AS (
  SELECT i, sc, r // 2 AS br, c // 2 AS bc, avg(gray) AS m
  FROM px GROUP BY i, sc, r // 2, c // 2
),
bits AS (
  SELECT a.i, a.sc, a.br * 8 + a.bc AS idx,
         CASE WHEN b.m > a.m THEN 1 ELSE 0 END AS bit
  FROM bm a JOIN bm b ON a.i = b.i AND a.sc = b.sc AND a.br = b.br
                     AND b.bc = a.bc + 1
  WHERE a.bc < 8
),
hv AS (
  SELECT i, sc,
    CAST(sum(CASE WHEN idx = 63 AND bit = 1 THEN -9223372036854775808
             WHEN bit = 1 THEN (1::BIGINT << idx) ELSE 0 END) AS BIGINT)
      AS dhash
  FROM bits GROUP BY i, sc
),
frames AS (
  SELECT i, f, f // {scene_len} AS sc
  FROM range(0, {n_videos}) t(i), range(0, {scenes * scene_len}) ff(f)
),
dist AS (
  SELECT fr.i, fr.f,
         CASE WHEN fr.f = 0 THEN NULL
              ELSE CAST(bit_count(xor(cur.dhash, prv.dhash)) AS INT)
         END AS hamming_prev
  FROM frames fr
  JOIN hv cur ON cur.i = fr.i AND cur.sc = fr.sc
  LEFT JOIN hv prv ON prv.i = fr.i AND prv.sc = (fr.f - 1) // {scene_len}
)
SELECT CAST(i AS BIGINT) AS video_id, CAST(f AS INT) AS frame_idx,
       hamming_prev
FROM dist
WHERE hamming_prev IS NULL OR hamming_prev >= {min_hamming}
"""


REGISTRY["ext_video_keyframes"] = (
    q_video_keyframes,
    _sql_video_keyframes(),
)


def q_video_keyframes_avi(spark, sf_dir):
    """Shot-boundary detection END-TO-END FROM CONTAINER BYTES: each
    row of the fixture is a real MJPEG AVI (RIFF demux, ext/avi.py →
    per-frame baseline-JPEG decode, ext/jpeg.py → dHash → per-video
    lag window). JPEG is lossy, but the KEYFRAME SET is exact by
    margin arithmetic: within-scene frames share identical bytes
    (Hamming 0) and scene boundaries sit 22–36 bits apart losslessly
    with ≤2 bits of q=95 quantization drift per side — so threshold 8
    detects exactly the scene starts, and the oracle is their closed
    form. hamming_prev itself is quantization-dependent and is
    deliberately NOT in the output contract (the lossless twin
    ext_video_keyframes value-checks every bit)."""
    from uofi_payroll_etl_main_demo_spark.ext.avi import (
        video_frames_from_avi,
    )
    from uofi_payroll_etl_main_demo_spark.ext.multimodal import (
        synthetic_scene_videos_avi,
        video_keyframes,
    )

    avis = synthetic_scene_videos_avi(spark, n_videos=8)
    frames = video_frames_from_avi(avis)
    return video_keyframes(frames, min_hamming=8).select(
        "video_id", "frame_idx"
    )


REGISTRY["ext_video_keyframes_avi"] = (
    q_video_keyframes_avi,
    # scene starts, closed form: frame_idx = scene * scene_len
    "SELECT v AS video_id, CAST(s * 4 AS INTEGER) AS frame_idx "
    "FROM range(0, 8) t(v), range(0, 4) u(s)",
)


def q_image_dhash_png_pairs(spark, sf_dir):
    """Perceptual-hash image dedup over REAL COMPRESSED PNG payloads:
    stdlib-zlib PNG decode (chunk CRCs verified, all five scanline
    filters unfiltered — the fixture cycles filter i%5 across the
    corpus) → the same dHash → banded Hamming pairs. PNG decode is
    lossless and the fixture shares the PPM corpus' closed-form pixel
    law, so the oracle is IDENTICAL to ext_image_dhash_pairs — any
    inflate/unfilter defect shows up as a hash-bit mismatch."""
    from uofi_payroll_etl_main_demo_spark.ext.dedup import hamming_pairs_64
    from uofi_payroll_etl_main_demo_spark.ext.multimodal import (
        image_dhash,
        synthetic_gradient_images_png,
    )

    media = synthetic_gradient_images_png(spark, n=48)
    sigs = image_dhash(media)
    return hamming_pairs_64(
        sigs, "media_id", "dhash", max_hamming=3
    ).select("id_a", "id_b", F.col("hamming").cast("int").alias("hamming"))


REGISTRY["ext_image_dhash_png_pairs"] = (
    q_image_dhash_png_pairs,
    _sql_image_dhash_pairs(),
)


def q_image_dhash_gif_pairs(spark, sf_dir):
    """Perceptual-hash image dedup over REAL GIF payloads: palette-
    indexed variable-width LZW decode (ext/gif.py — full GIF state
    machine: CLEAR/END, width growth to 12 bits, KwKwK case) → the
    same dHash → banded Hamming pairs. GIF is lossless for palette-
    sized images and the fixture shares the PPM corpus' closed-form
    pixel law, so the oracle is IDENTICAL to ext_image_dhash_pairs —
    any LZW/palette defect shows up as a hash-bit mismatch."""
    from uofi_payroll_etl_main_demo_spark.ext.dedup import hamming_pairs_64
    from uofi_payroll_etl_main_demo_spark.ext.multimodal import (
        image_dhash,
        synthetic_gradient_images_gif,
    )

    media = synthetic_gradient_images_gif(spark, n=48)
    sigs = image_dhash(media)
    return hamming_pairs_64(
        sigs, "media_id", "dhash", max_hamming=3
    ).select("id_a", "id_b", F.col("hamming").cast("int").alias("hamming"))


REGISTRY["ext_image_dhash_gif_pairs"] = (
    q_image_dhash_gif_pairs,
    _sql_image_dhash_pairs(),
)


def q_image_dhash_jpeg_pairs(spark, sf_dir):
    """Perceptual dedup over REAL baseline-JPEG payloads (stdlib+numpy
    entropy decode, ext/jpeg.py): separated-pattern fixture → dHash →
    banded Hamming pairs at threshold 6. JPEG is LOSSY, so per-hash
    values drift ≤2 bits off the lossless law (pinned in
    tests/test_jpeg.py::test_separated_jpeg_margins) — but the
    PAIR SET is exact by margin arithmetic: twins are losslessly
    identical (observed ≤ 4 after both ends drift) while cross-pattern
    hashes sit ≥ 17 bits apart losslessly (observed ≥ 13), so
    threshold 6 detects exactly the 24 (2g, 2g+1) twin pairs and the
    oracle is their closed form — the same lossy-codec exactness
    argument as ext_video_keyframes_avi. `hamming` itself is
    quantization-dependent and deliberately NOT in the output contract
    (the lossless PPM/PNG/GIF twins value-check every bit). Was
    rows-only through r10; VERDICT r10 #3 asked for a drivable oracle."""
    from uofi_payroll_etl_main_demo_spark.ext.dedup import hamming_pairs_64
    from uofi_payroll_etl_main_demo_spark.ext.multimodal import (
        image_dhash,
        synthetic_separated_images_jpeg,
    )

    media = synthetic_separated_images_jpeg(spark, n=48)
    sigs = image_dhash(media)
    return hamming_pairs_64(
        sigs, "media_id", "dhash", max_hamming=6
    ).select("id_a", "id_b")


REGISTRY["ext_image_dhash_jpeg_pairs"] = (
    q_image_dhash_jpeg_pairs,
    # twin pairs, closed form: (2g, 2g+1) for each of the 24 patterns
    "SELECT CAST(2 * g AS BIGINT) AS id_a, CAST(2 * g + 1 AS BIGINT) AS id_b "
    "FROM range(0, 24) t(g)",
)


def q_audio_energy_hash_pairs(spark, sf_dir):
    """Perceptual audio dedup: REAL PCM-WAV decode → 64-bit energy-step
    fingerprint (integer sum-of-squares per window, one bit per rising
    step) → pigeonhole-banded Hamming pairs via ``hamming_pairs_64``.
    Odd ids are polarity-inverted twins of their even neighbor —
    bytewise different, energy-identical — the phase-flip/re-encode
    case an audio fingerprint must collapse. Oracle: the integer sample
    law is closed-form; DuckDB recomputes every window energy, bit and
    distance exactly."""
    from uofi_payroll_etl_main_demo_spark.ext.dedup import hamming_pairs_64
    from uofi_payroll_etl_main_demo_spark.ext.multimodal import (
        audio_energy_hash,
        synthetic_patterned_audio,
    )

    media = synthetic_patterned_audio(spark, n=32)
    sigs = audio_energy_hash(media)
    return hamming_pairs_64(
        sigs, "media_id", "ehash", max_hamming=3
    ).select("id_a", "id_b", F.col("hamming").cast("int").alias("hamming"))


def _sql_audio_energy_hash_pairs(
    n: int = 32, windows: int = 64, win: int = 50, max_hamming: int = 3
) -> str:
    return f"""
WITH e AS (
  SELECT i, w, sum(k * k) AS e FROM (
    SELECT i, j // {win} AS w,
      (((i // 2) * 31 + j * j * 17 + (j // {win}) * 29) % 401) - 200 AS k
    FROM range(0, {n}) t(i), range(0, {windows * win}) s(j)) kk
  GROUP BY i, w
),
bits AS (
  SELECT a.i, a.w AS idx, CASE WHEN b.e > a.e THEN 1 ELSE 0 END AS bit
  FROM e a JOIN e b ON a.i = b.i AND b.w = a.w + 1 WHERE a.w < 63
),
hv AS (
  SELECT i, CAST(sum(CASE WHEN bit = 1 THEN (1::BIGINT << idx)
                     ELSE 0 END) AS BIGINT) AS ehash
  FROM bits GROUP BY i
)
SELECT a.i AS id_a, b.i AS id_b,
       CAST(bit_count(xor(a.ehash, b.ehash)) AS INTEGER) AS hamming
FROM hv a JOIN hv b ON a.i < b.i
WHERE bit_count(xor(a.ehash, b.ehash)) <= {max_hamming}
"""


REGISTRY["ext_audio_energy_hash_pairs"] = (
    q_audio_energy_hash_pairs,
    _sql_audio_energy_hash_pairs(),
)


def q_audio_mulaw_hash_pairs(spark, sf_dir):
    """Compressed-audio dedup: the same patterned clips as
    ``ext_audio_energy_hash_pairs`` but written through the REAL G.711
    mu-law encoder (WAV format code 7, ext/multimodal.py
    mulaw_wav_bytes) — the ``decode_audio`` dispatcher routes them
    through ``mulaw_expand`` and the identical energy-hash path, so
    the lossy-telephony re-encode rides the SAME pipeline as PCM.
    Oracle: the mu-law quantization is deterministic integer math —
    DuckDB recomputes it from the seg-threshold formulation of the
    public ``g711.c`` algorithm (deliberately a DIFFERENT formulation
    than the numpy frexp encoder, so the two laws are independent) and
    then every window energy, bit and Hamming distance exactly. Sign
    symmetry keeps the polarity twins energy-identical even after
    quantization."""
    from uofi_payroll_etl_main_demo_spark.ext.dedup import hamming_pairs_64
    from uofi_payroll_etl_main_demo_spark.ext.multimodal import (
        audio_energy_hash,
        synthetic_patterned_audio,
    )

    media = synthetic_patterned_audio(spark, n=32, codec="mulaw")
    sigs = audio_energy_hash(media)
    return hamming_pairs_64(
        sigs, "media_id", "ehash", max_hamming=3
    ).select("id_a", "id_b", F.col("hamming").cast("int").alias("hamming"))


def _sql_audio_mulaw_hash_pairs(
    n: int = 32, windows: int = 64, win: int = 50, max_hamming: int = 3
) -> str:
    return f"""
WITH lin AS (
  SELECT i, j,
    (((i // 2) * 31 + j * j * 17 + (j // {win}) * 29) % 401) - 200 AS k
  FROM range(0, {n}) t(i), range(0, {windows * win}) s(j)
),
seg AS (
  SELECT i, j, k, least(abs(k), 32635) + 132 AS x0,
    CASE WHEN least(abs(k), 32635) + 132 <= 255 THEN 1
         WHEN least(abs(k), 32635) + 132 <= 511 THEN 2
         WHEN least(abs(k), 32635) + 132 <= 1023 THEN 4
         WHEN least(abs(k), 32635) + 132 <= 2047 THEN 8
         WHEN least(abs(k), 32635) + 132 <= 4095 THEN 16
         WHEN least(abs(k), 32635) + 132 <= 8191 THEN 32
         WHEN least(abs(k), 32635) + 132 <= 16383 THEN 64
         ELSE 128 END AS p2
  FROM lin
),
quant AS (
  SELECT i, j,
    (CASE WHEN k < 0 THEN -1 ELSE 1 END)
      * ((((x0 // (8 * p2)) % 16) * 8 + 132) * p2 - 132) AS y
  FROM seg
),
e AS (
  SELECT i, j // {win} AS w, sum(y * y) AS e FROM quant GROUP BY i, j // {win}
),
bits AS (
  SELECT a.i, a.w AS idx, CASE WHEN b.e > a.e THEN 1 ELSE 0 END AS bit
  FROM e a JOIN e b ON a.i = b.i AND b.w = a.w + 1 WHERE a.w < 63
),
hv AS (
  SELECT i, CAST(sum(CASE WHEN bit = 1 THEN (1::BIGINT << idx)
                     ELSE 0 END) AS BIGINT) AS ehash
  FROM bits GROUP BY i
)
SELECT a.i AS id_a, b.i AS id_b,
       CAST(bit_count(xor(a.ehash, b.ehash)) AS INTEGER) AS hamming
FROM hv a JOIN hv b ON a.i < b.i
WHERE bit_count(xor(a.ehash, b.ehash)) <= {max_hamming}
"""


REGISTRY["ext_audio_mulaw_hash_pairs"] = (
    q_audio_mulaw_hash_pairs,
    _sql_audio_mulaw_hash_pairs(),
)


def q_audio_alaw_hash_pairs(spark, sf_dir):
    """Compressed-audio dedup through the OTHER G.711 companding law:
    the patterned clips re-encoded as A-law WAV (format code 6,
    ext/multimodal.py alaw_wav_bytes) → ``decode_audio`` dispatch →
    the identical energy-hash path. A-law is NOT sign-symmetric
    (negatives fold as ``-m - 1`` per the public ``g711.c``), so the
    polarity twins quantize to slightly different energies — measured
    hamming ≤ 3, still inside the pairing threshold — which makes this
    row a sharper oracle than mu-law: any sign-handling defect in
    either engine's law moves pairs across the threshold. Oracle:
    DuckDB recomputes the A-law quantization from the seg-threshold
    formulation (``v = k//8`` / ``(-k-1)//8`` under DuckDB's
    truncating ``//`` — equal to the encoder's arithmetic shift; CASE
    ladder for the segment; validated equal to the numpy law over the
    full int16 range), then every window energy, bit and Hamming
    distance exactly."""
    from uofi_payroll_etl_main_demo_spark.ext.dedup import hamming_pairs_64
    from uofi_payroll_etl_main_demo_spark.ext.multimodal import (
        audio_energy_hash,
        synthetic_patterned_audio,
    )

    media = synthetic_patterned_audio(spark, n=32, codec="alaw")
    sigs = audio_energy_hash(media)
    return hamming_pairs_64(
        sigs, "media_id", "ehash", max_hamming=3
    ).select("id_a", "id_b", F.col("hamming").cast("int").alias("hamming"))


def _sql_audio_alaw_hash_pairs(
    n: int = 32, windows: int = 64, win: int = 50, max_hamming: int = 3
) -> str:
    return f"""
WITH lin AS (
  SELECT i, j,
    (((i // 2) * 31 + j * j * 17 + (j // {win}) * 29) % 401) - 200 AS k0
  FROM range(0, {n}) t(i), range(0, {windows * win}) s(j)
),
pol AS (
  SELECT i, j, CASE WHEN i % 2 = 1 THEN -k0 ELSE k0 END AS k FROM lin
),
vv AS (
  SELECT i, j, k,
    CASE WHEN k >= 0 THEN k // 8 ELSE (-k - 1) // 8 END AS v
  FROM pol
),
sg AS (
  SELECT i, j, k, v,
    CASE WHEN v <= 31 THEN 0 WHEN v <= 63 THEN 1 WHEN v <= 127 THEN 2
         WHEN v <= 255 THEN 3 WHEN v <= 511 THEN 4 WHEN v <= 1023 THEN 5
         WHEN v <= 2047 THEN 6 WHEN v <= 4095 THEN 7 ELSE 8 END AS s
  FROM vv
),
quant AS (
  SELECT i, j,
    (CASE WHEN k >= 0 THEN 1 ELSE -1 END)
      * (CASE WHEN s >= 8 THEN 32256
              WHEN s = 0 THEN ((v // 2) % 16) * 16 + 8
              ELSE (((v // (1::BIGINT << greatest(s, 1))) % 16) * 16 + 264)
                   * (1::BIGINT << (s - 1)) END) AS y
  FROM sg
),
e AS (
  SELECT i, j // {win} AS w, sum(y * y) AS e FROM quant GROUP BY i, j // {win}
),
bits AS (
  SELECT a.i, a.w AS idx, CASE WHEN b.e > a.e THEN 1 ELSE 0 END AS bit
  FROM e a JOIN e b ON a.i = b.i AND b.w = a.w + 1 WHERE a.w < 63
),
hv AS (
  SELECT i, CAST(sum(CASE WHEN bit = 1 THEN (1::BIGINT << idx)
                     ELSE 0 END) AS BIGINT) AS ehash
  FROM bits GROUP BY i
)
SELECT a.i AS id_a, b.i AS id_b,
       CAST(bit_count(xor(a.ehash, b.ehash)) AS INTEGER) AS hamming
FROM hv a JOIN hv b ON a.i < b.i
WHERE bit_count(xor(a.ehash, b.ehash)) <= {max_hamming}
"""


REGISTRY["ext_audio_alaw_hash_pairs"] = (
    q_audio_alaw_hash_pairs,
    _sql_audio_alaw_hash_pairs(),
)


def q_audio_spectral_hash_pairs(spark, sf_dir):
    """Spectral audio dedup (ext/multimodal.py audio_spectral_hash):
    per-64-sample Walsh–Hadamard transform → dominant sequency
    (argmax |coefficient|, ties low) → rising-step bits → banded
    Hamming pairs. Invariant to polarity AND any positive gain — the
    renormalized re-encode an energy fingerprint can't collapse.
    Oracle: DuckDB rebuilds the transform from the closed form
    ``H[t][u] = (-1)^popcount(t & u)`` (no matrix literal), takes the
    same tie-broken argmax per window, then bits and pairs exactly."""
    from uofi_payroll_etl_main_demo_spark.ext.dedup import hamming_pairs_64
    from uofi_payroll_etl_main_demo_spark.ext.multimodal import (
        audio_spectral_hash,
        synthetic_patterned_audio,
    )

    media = synthetic_patterned_audio(spark, n=32)
    sigs = audio_spectral_hash(media, window_samples=64)
    return hamming_pairs_64(
        sigs, "media_id", "shash", max_hamming=3
    ).select("id_a", "id_b", F.col("hamming").cast("int").alias("hamming"))


def _sql_audio_spectral_hash_pairs(
    n: int = 32,
    total: int = 64 * 50,
    win: int = 64,
    pat_win: int = 50,
    max_hamming: int = 3,
) -> str:
    return f"""
WITH px AS (
  SELECT i, j,
    (CASE WHEN i % 2 = 1 THEN -1 ELSE 1 END)
      * ((((i // 2) * 31 + j * j * 17 + (j // {pat_win}) * 29) % 401) - 200)
      AS k
  FROM range(0, {n}) t(i), range(0, {total}) s(j)
),
coef AS (
  SELECT px.i, px.j // {win} AS w, uu.u,
         sum(px.k * (CASE WHEN bit_count((px.j % {win}) & uu.u) % 2 = 0
                          THEN 1 ELSE -1 END)) AS y
  FROM px, range(0, {win}) uu(u)
  GROUP BY px.i, px.j // {win}, uu.u
),
dom AS (
  SELECT i, w, u AS d FROM (
    SELECT i, w, u,
           row_number() OVER (PARTITION BY i, w
                              ORDER BY abs(y) DESC, u ASC) AS rn
    FROM coef
  ) WHERE rn = 1
),
bits AS (
  SELECT a.i, a.w AS idx, CASE WHEN b.d > a.d THEN 1 ELSE 0 END AS bit
  FROM dom a JOIN dom b ON a.i = b.i AND b.w = a.w + 1
),
hv AS (
  SELECT i, CAST(sum(CASE WHEN bit = 1 THEN (1::BIGINT << idx)
                     ELSE 0 END) AS BIGINT) AS shash
  FROM bits GROUP BY i
)
SELECT a.i AS id_a, b.i AS id_b,
       CAST(bit_count(xor(a.shash, b.shash)) AS INTEGER) AS hamming
FROM hv a JOIN hv b ON a.i < b.i
WHERE bit_count(xor(a.shash, b.shash)) <= {max_hamming}
"""


REGISTRY["ext_audio_spectral_hash_pairs"] = (
    q_audio_spectral_hash_pairs,
    _sql_audio_spectral_hash_pairs(),
)


def q_audio_adpcm_hash_pairs(spark, sf_dir):
    """Compressed-audio dedup through a SEQUENTIAL codec: IMA ADPCM
    (WAV format code 17 — 4-bit delta coding with an adaptive step
    index, ext/multimodal.py adpcm_wav_bytes/decode_wav_adpcm). Unlike
    the memoryless G.711 companders, every decoded sample depends on
    the running (predictor, step-index) state, so the DuckDB oracle
    simulates the whole encode→decode state machine in a RECURSIVE CTE
    — one iteration per nibble position, all 32×128 blocks advancing
    in parallel (the encoder resets the step index at each 16-byte /
    25-sample block boundary precisely so blocks are independent; the
    header carries the index, so the container stays spec-exact).
    Fixture: amplitude-modulated triangle waves
    (synthetic_smooth_audio) — deltas the 4-bit coder can track;
    measured twin hamming 0, cross-pattern min 4, so threshold 3
    yields exactly the 16 polarity-twin pairs. The white-noise
    patterned fixture is deliberately NOT used: ADPCM smears it until
    distinct patterns collide (cross min 0 — measured, recorded in the
    fixture docstring)."""
    from uofi_payroll_etl_main_demo_spark.ext.dedup import hamming_pairs_64
    from uofi_payroll_etl_main_demo_spark.ext.multimodal import (
        audio_energy_hash,
        synthetic_smooth_audio,
    )

    media = synthetic_smooth_audio(spark, n=32)
    sigs = audio_energy_hash(media)
    return hamming_pairs_64(
        sigs, "media_id", "ehash", max_hamming=3
    ).select("id_a", "id_b", F.col("hamming").cast("int").alias("hamming"))


def _sql_audio_adpcm_hash_pairs(
    n: int = 32, windows: int = 64, win: int = 50, max_hamming: int = 3
) -> str:
    from uofi_payroll_etl_main_demo_spark.ext.multimodal import (
        _IMA_STEP_TABLE,
    )

    total = windows * win
    # the quantizer, spelled once and inlined — REPEATED subexpressions
    # are deliberate (recursive CTEs can't lateral-chain), and integer-
    # exact: step > 0 so // == >> at every site
    d0 = "abs(s - pred)"
    b4 = f"(CASE WHEN {d0} >= step THEN 1 ELSE 0 END)"
    d1 = f"({d0} - step * {b4})"
    b2 = f"(CASE WHEN {d1} >= step // 2 THEN 1 ELSE 0 END)"
    d2 = f"({d1} - (step // 2) * {b2})"
    b1 = f"(CASE WHEN {d2} >= step // 4 THEN 1 ELSE 0 END)"
    diff = f"(step // 8 + (step // 4) * {b1} + (step // 2) * {b2} + step * {b4})"
    sgn = "(CASE WHEN s - pred < 0 THEN -1 ELSE 1 END)"
    nmag = f"({b4} * 4 + {b2} * 2 + {b1})"
    didx = (
        f"(CASE WHEN {nmag} <= 3 THEN -1 WHEN {nmag} = 4 THEN 2 "
        f"WHEN {nmag} = 5 THEN 4 WHEN {nmag} = 6 THEN 6 ELSE 8 END)"
    )
    steps_values = ", ".join(
        f"({si}, {sv})" for si, sv in enumerate(_IMA_STEP_TABLE)
    )
    return f"""
WITH RECURSIVE step_t(si, step) AS (
  VALUES {steps_values}
),
dec(i, blk, t, pred, idx) AS (
  SELECT i, blk, 0,
         (CASE WHEN i % 2 = 1 THEN -1 ELSE 1 END)
           * (50 + ((i // 2) * 13 + ((blk * 25) // {win}) * 7) % 100)
           * (25 - abs((blk * 25) % {win} - 25)),
         0
  FROM range(0, {n}) a(i), range(0, {total // 25}) b(blk)
  UNION ALL
  SELECT i, blk, t + 1,
    greatest(least(pred + {sgn} * {diff}, 32767), -32768),
    greatest(least(idx + {didx}, 88), 0)
  FROM (
    SELECT d.i, d.blk, d.t, d.pred, d.idx, st.step,
      (CASE WHEN d.i % 2 = 1 THEN -1 ELSE 1 END)
        * (50 + ((d.i // 2) * 13 + ((d.blk * 25 + d.t + 1) // {win}) * 7) % 100)
        * (25 - abs((d.blk * 25 + d.t + 1) % {win} - 25)) AS s
    FROM dec d JOIN step_t st ON st.si = d.idx
    WHERE d.t < 24
  )
),
e AS (
  SELECT i, (blk * 25 + t) // {win} AS w, sum(pred * pred) AS e
  FROM dec GROUP BY i, (blk * 25 + t) // {win}
),
bits AS (
  SELECT a.i, a.w AS idx, CASE WHEN b.e > a.e THEN 1 ELSE 0 END AS bit
  FROM e a JOIN e b ON a.i = b.i AND b.w = a.w + 1 WHERE a.w < 63
),
hv AS (
  SELECT i, CAST(sum(CASE WHEN bit = 1 THEN (1::BIGINT << idx)
                     ELSE 0 END) AS BIGINT) AS ehash
  FROM bits GROUP BY i
)
SELECT a.i AS id_a, b.i AS id_b,
       CAST(bit_count(xor(a.ehash, b.ehash)) AS INTEGER) AS hamming
FROM hv a JOIN hv b ON a.i < b.i
WHERE bit_count(xor(a.ehash, b.ehash)) <= {max_hamming}
"""


REGISTRY["ext_audio_adpcm_hash_pairs"] = (
    q_audio_adpcm_hash_pairs,
    _sql_audio_adpcm_hash_pairs(),
)


def q_video_dhash_pairs(spark, sf_dir):
    """Video near-dup dedup from sampled frames: per-frame perceptual
    dHash (REAL PPM decode) → equi-join on (frame_idx, dhash) → pair
    match-fraction threshold (ext/multimodal.py video_near_dup_pairs).
    Odd video ids are luminance-identical re-encode twins — every
    frame matches, fraction 1. Oracle: the frame pixel law is
    closed-form, so DuckDB recomputes every frame hash and the full
    match matrix."""
    from uofi_payroll_etl_main_demo_spark.ext.multimodal import (
        synthetic_video_frame_images,
        video_near_dup_pairs,
    )

    frames = synthetic_video_frame_images(spark, n_videos=12, frames=8)
    return video_near_dup_pairs(frames, n_frames=8, min_match_fraction=0.5)


def _sql_video_dhash_pairs(
    n_videos: int = 12, frames: int = 8, width: int = 18, height: int = 16,
    min_frac: float = 0.5,
) -> str:
    return f"""
WITH px AS (
  SELECT v, f, r, c,
         3 + ((v // 2) * 37 + f * 23 + c * c * 11 + r * 7) % 237 AS gray
  FROM range(0, {n_videos}) vv(v), range(0, {frames}) ff(f),
       range(0, {height}) rr(r), range(0, {width}) cc(c)
),
bm AS (
  SELECT v, f, r // 2 AS br, c // 2 AS bc, avg(gray) AS m
  FROM px GROUP BY v, f, r // 2, c // 2
),
bits AS (
  SELECT a.v, a.f, a.br * 8 + a.bc AS idx,
         CASE WHEN b.m > a.m THEN 1 ELSE 0 END AS bit
  FROM bm a JOIN bm b
    ON a.v = b.v AND a.f = b.f AND a.br = b.br AND b.bc = a.bc + 1
  WHERE a.bc < 8
),
hv AS (
  SELECT v, f,
    CAST(sum(CASE WHEN idx = 63 AND bit = 1 THEN -9223372036854775808
             WHEN bit = 1 THEN (1::BIGINT << idx) ELSE 0 END) AS BIGINT)
      AS dhash
  FROM bits GROUP BY v, f
)
SELECT a.v AS vid_a, b.v AS vid_b, CAST(count(*) AS BIGINT) AS n_match,
       round(count(*) / {frames}.0, 6) AS match_fraction
FROM hv a JOIN hv b ON a.f = b.f AND a.dhash = b.dhash AND a.v < b.v
GROUP BY a.v, b.v
HAVING count(*) / {frames}.0 >= {min_frac}
"""


REGISTRY["ext_video_dhash_pairs"] = (
    q_video_dhash_pairs,
    _sql_video_dhash_pairs(),
)


def q_incremental_image_dedup(spark, sf_dir):
    """Media CDC: which NEW images near-duplicate the EXISTING corpus —
    dHash both sides, one pigeonhole banding, new×old pairs only
    (ext/dedup.py incremental_hamming_pairs_64, the signature-agnostic
    twin of the text CDC operators; daily cost tracks the batch, never
    corpus²). Corpus = even fixture ids, batch = their odd
    luminance-identical re-encode twins → every new item must report
    its base at hamming 0. Closed-form oracle over the shared dHash
    CTE."""
    from uofi_payroll_etl_main_demo_spark.ext.dedup import (
        incremental_hamming_pairs_64,
    )
    from uofi_payroll_etl_main_demo_spark.ext.multimodal import (
        image_dhash,
        synthetic_gradient_images,
    )

    media = synthetic_gradient_images(spark, n=48)
    sigs = image_dhash(media)
    corpus = sigs.filter(F.col("media_id") % 2 == 0)
    batch = sigs.filter(F.col("media_id") % 2 == 1)
    return incremental_hamming_pairs_64(
        corpus, batch, "media_id", "dhash", max_hamming=3
    ).select(
        "new_id", "old_id", F.col("hamming").cast("int").alias("hamming")
    )


def _sql_incremental_image_dedup(n: int = 48, max_hamming: int = 3) -> str:
    return f"""
WITH {_sql_image_dhash_hv(n)}
SELECT b.i AS new_id, a.i AS old_id,
       CAST(bit_count(xor(a.dhash, b.dhash)) AS INTEGER) AS hamming
FROM hv a JOIN hv b ON a.i % 2 = 0 AND b.i % 2 = 1
WHERE bit_count(xor(a.dhash, b.dhash)) <= {max_hamming}
"""


REGISTRY["ext_incremental_image_dedup"] = (
    q_incremental_image_dedup,
    _sql_incremental_image_dedup(),
)


def q_quality_calibrated_filter(spark, sf_dir):
    """Per-source quality CALIBRATION: raw quality scores are not
    comparable across sources (a boilerplate-heavy source saturates
    low), so production filters threshold the per-source percentile,
    not the raw score. One window per source (percent_rank over
    (quality, doc_id) — deterministic tie-break), keep the top 40% of
    EACH source; output carries raw + calibrated score. Partitioned
    rank = one shuffle on source; no global sort."""
    from pyspark.sql import Window

    from uofi_payroll_etl_main_demo_spark.ext.textstats import (
        curation_scores,
    )

    docs = _t(spark, sf_dir, "documents")
    # ONE scan, zero joins: source passes through the fused scorer
    scored = curation_scores(docs, keep_cols=("source",)).select(
        "doc_id", "source", F.round("quality", 6).alias("quality")
    )
    w = Window.partitionBy("source").orderBy("quality", "doc_id")
    return (
        scored.withColumn(
            "q_pctile", F.round(F.percent_rank().over(w), 6)
        )
        .filter(F.col("q_pctile") >= 0.6)
        .select("doc_id", "source", "quality", "q_pctile")
    )


def _sql_quality_calibrated_filter() -> str:
    return f"""
WITH t AS (SELECT doc_id, source, CASE WHEN trim(text) = '' THEN []
             ELSE {_TOKS} END AS toks, text FROM documents),
q AS (SELECT doc_id, source, round(
    0.4 * least(len(toks) / 100.0, 1.0)
    + 0.4 * (CASE WHEN len(toks) > 0
             THEN CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
             ELSE 0.0 END)
    + 0.2 * (1.0 - least(
        (CASE WHEN length(text) > 0
         THEN CAST(len(regexp_extract_all(text, '{_SQL_PUNCT}')) AS DOUBLE)
              / length(text) ELSE 0.0 END) * 5, 1.0)), 6) AS quality
  FROM t),
r AS (SELECT doc_id, source, quality,
        round(percent_rank() OVER (PARTITION BY source
              ORDER BY quality, doc_id), 6) AS q_pctile
      FROM q)
SELECT doc_id, source, quality, q_pctile FROM r WHERE q_pctile >= 0.6
"""


REGISTRY["ext_quality_calibrated_filter"] = (
    q_quality_calibrated_filter,
    _sql_quality_calibrated_filter(),
)


def q_text_embed_topk(spark, sf_dir):
    """Text→vector→ANN end-to-end WITHOUT a model: hashed bag-of-words
    embedding (functions/text.py hashed_bow_* — md5 feature hashing,
    L2-normalized, exact cross-engine) over the documents table, then
    top-10 cosine neighbors of doc 0. The query vector is collected
    once (one row, constant-size by construction — the same literal
    pattern as ext_topk_cosine) and inlined, so scoring is a narrow
    map + distributed partial top-k, no join at all. Swapping the
    closed-form embedder for a model inference column leaves the whole
    plan unchanged — this is the RAG/semantic-search spine."""
    from uofi_payroll_etl_main_demo_spark.ext.textstats import (
        hashed_bow_embeddings,
    )

    docs = _t(spark, sf_dir, "documents")
    emb = hashed_bow_embeddings(docs).withColumnRenamed("v", "__v")
    qv = emb.filter(F.col("doc_id") == 0).head()["__v"]
    qlit = F.array(*[F.lit(float(x)) for x in qv])
    dot = F.aggregate(
        F.zip_with(F.col("__v"), qlit, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        emb.filter(F.col("doc_id") != 0)
        .select("doc_id", dot.alias("__s"))
        .orderBy(F.desc("__s"), F.asc("doc_id"))
        .limit(10)
        .select("doc_id", F.round("__s", 6).alias("score"))
    )


def _sql_text_embed_topk(dim: int = 16, k: int = 10) -> str:
    return f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
bk AS (SELECT doc_id, list_transform(toks,
         tk -> ('0x' || substr(md5(tk), 1, 15))::BIGINT % {dim}) AS b
       FROM t WHERE len(toks) > 0),
cnt AS (SELECT doc_id, list_transform(range(0, {dim}),
          j -> CAST(len(list_filter(b, x -> x = j)) AS DOUBLE)) AS c
        FROM bk),
emb AS (SELECT doc_id, list_transform(c, x -> x / sqrt(
          list_aggregate(list_transform(c, y -> y * y), 'sum'))) AS v
        FROM cnt),
qv AS (SELECT v FROM emb WHERE doc_id = 0)
SELECT doc_id,
       round(list_dot_product(e.v, (SELECT v FROM qv)), 6) AS score
FROM emb e WHERE doc_id <> 0
ORDER BY list_dot_product(e.v, (SELECT v FROM qv)) DESC, doc_id
LIMIT {k}
"""


REGISTRY["ext_text_embed_topk"] = (q_text_embed_topk, _sql_text_embed_topk())


def _bow_query_vec(text: str, dim: int = 16) -> list[float]:
    """Driver-side hashed-BOW of a literal query string under the SAME
    law as ``functions.text.hashed_bow_buckets`` (md5[:15] % dim,
    counts, L2-normalize) — inlined as a literal on both engine sides,
    the QUERY_VEC pattern."""
    import hashlib
    import math

    counts = [0] * dim
    for tok in text.split():
        counts[int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % dim] += 1
    n = math.sqrt(sum(c * c for c in counts)) or 1.0
    return [c / n for c in counts]


PASSAGE_QUERY_TEXT = "data panel review quality window"
_PASSAGE_QV = _bow_query_vec(PASSAGE_QUERY_TEXT)


def q_passage_topk(spark, sf_dir):
    """PASSAGE-level retrieval with doc-level max pooling — the
    late-interaction/RAG shape: tumbling 32-token chunks, hashed-BOW
    embedding PER CHUNK (composite (doc_id, chunk_idx) key through the
    codegen explode+agg embedder), cosine against a literal query
    embedding, then each document scores as its BEST chunk (max score,
    ties to the lowest chunk_idx) and the top 10 documents return with
    the winning passage index. Retrieval granularity is passages —
    long documents can't bury a relevant span in their average — while
    the result stays doc-level. Scoring is a narrow map over chunk
    rows; doc pooling is one max-agg; k-selection is distributed
    TakeOrderedAndProject. Swapping the closed-form embedder for a
    model column changes nothing downstream."""
    from uofi_payroll_etl_main_demo_spark.ext.textstats import (
        bow_bucket_expr,
    )
    from uofi_payroll_etl_main_demo_spark.functions.text import tokenize_ws

    docs = _t(spark, sf_dir, "documents")
    # POSITIONAL chunking (r8): tumbling windows mean a token's chunk
    # is floor(pos / size) — so the chunk-text rebuild (slice →
    # array_join → re-tokenize → re-md5 per token of a string we just
    # assembled) is pure waste; explode tokens ONCE with positions and
    # bucket them directly. Identical values by construction: tokens
    # contain no whitespace, so the join/split round-trip the old path
    # did was the identity, and the bucket law is the shared
    # bow_bucket_expr. The score arithmetic replays the embedder's
    # exact association ((c_j / norm) * q_j, left-to-right, 0.0 seed)
    # so results stay bit-identical to the hashed_bow_embeddings form.
    dim, size = 16, 32
    tok = docs.select(
        "doc_id",
        F.posexplode(tokenize_ws("text")).alias("__p", "__t"),
    ).select(
        "doc_id",
        F.floor(F.col("__p") / size).cast("int").alias("chunk_idx"),
        bow_bucket_expr("__t", dim).alias("__bk"),
    )
    aggs = [
        F.sum(F.when(F.col("__bk") == j, 1).otherwise(0))
        .cast("double")
        .alias(f"__c{j}")
        for j in range(dim)
    ]
    g = tok.groupBy("doc_id", "chunk_idx").agg(*aggs)
    cols = [F.col(f"__c{j}") for j in range(dim)]
    norm = F.sqrt(sum((c * c for c in cols), F.lit(0.0)))
    score = sum(
        ((c / norm) * F.lit(float(q)) for c, q in zip(cols, _PASSAGE_QV)),
        F.lit(0.0),
    )
    best = (
        g.select("doc_id", "chunk_idx", score.alias("__s"))
        .groupBy("doc_id")
        .agg(F.max(F.struct(F.col("__s"), (-F.col("chunk_idx")).alias("__ni"))).alias("__b"))
        .select(
            "doc_id",
            (-F.col("__b.__ni")).cast("int").alias("best_chunk_idx"),
            F.col("__b.__s").alias("__s"),
        )
    )
    return (
        best.orderBy(F.desc("__s"), F.asc("doc_id"))
        .limit(10)
        .select(
            "doc_id", "best_chunk_idx", F.round("__s", 6).alias("score")
        )
    )


def _sql_passage_topk(dim: int = 16, size: int = 32, k: int = 10) -> str:
    qv = "[" + ", ".join(repr(x) for x in _PASSAGE_QV) + "]"
    return f"""
WITH t AS (SELECT doc_id, CASE WHEN trim(text) = '' THEN []
             ELSE {_TOKS} END AS toks FROM documents),
c AS (SELECT doc_id, len(toks) AS n, toks,
        CASE WHEN len(toks) > 0 THEN
          CAST(floor((greatest(len(toks) - {size}, 0) + {size - 1})
               / {size}.0) AS INT) + 1
        ELSE 0 END AS nc FROM t),
ch AS (SELECT doc_id, CAST(i AS INT) AS chunk_idx,
         toks[i * {size} + 1 : i * {size} + {size}] AS ctoks
       FROM (SELECT doc_id, toks, unnest(range(0, nc)) AS i FROM c)),
bk AS (SELECT doc_id, chunk_idx, list_transform(ctoks,
         tk -> ('0x' || substr(md5(tk), 1, 15))::BIGINT % {dim}) AS b
       FROM ch WHERE len(ctoks) > 0),
cnt AS (SELECT doc_id, chunk_idx, list_transform(range(0, {dim}),
          j -> CAST(len(list_filter(b, x -> x = j)) AS DOUBLE)) AS cv
        FROM bk),
emb AS (SELECT doc_id, chunk_idx, list_transform(cv, x -> x / sqrt(
          list_aggregate(list_transform(cv, y -> y * y), 'sum'))) AS v
        FROM cnt),
scored AS (SELECT doc_id, chunk_idx,
             list_dot_product(v, {qv}) AS s FROM emb),
best AS (SELECT doc_id, chunk_idx AS best_chunk_idx, s,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY s DESC, chunk_idx) AS rn
         FROM scored)
SELECT doc_id, best_chunk_idx, round(s, 6) AS score
FROM best WHERE rn = 1
ORDER BY s DESC, doc_id LIMIT {k}
"""


REGISTRY["ext_passage_topk"] = (q_passage_topk, _sql_passage_topk())


def q_chunk_dedup_stats(spark, sf_dir):
    """Passage-level dedup: chunk every document (32-token tumbling
    windows), dedup chunks GLOBALLY on md5 (survivor = first by
    (doc_id, chunk_idx)), report per-doc survival — the
    paragraph-granularity dedup public pipelines run after doc-level
    dedup. The dedup shuffles (hash, id, idx) — never chunk text."""
    from uofi_payroll_etl_main_demo_spark.ext.textstats import (
        chunk_documents,
    )

    chunks = chunk_documents(
        _t(spark, sf_dir, "documents"), size=32, stride=32
    )
    # same keep-first law as chunk_dedup_rewrite (min struct per hash,
    # map-side combinable — the window form sorted every chunk key);
    # the stats only need COUNTS per doc, so winners aggregate straight
    # to (doc_id, n_surviving) and join the per-doc chunk counts on
    # already-aligned partitioning — no chunk-key join-back at all
    keys = chunks.select(
        "doc_id", "chunk_idx", F.md5("chunk_text").alias("__h")
    )
    surv = (
        keys.groupBy("__h")
        .agg(F.min(F.struct("doc_id", "chunk_idx")).alias("__w"))
        .groupBy(F.col("__w.doc_id").alias("doc_id"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_surviving"))
    )
    per_doc = keys.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks")
    )
    return per_doc.join(surv, "doc_id", "left").select(
        "doc_id",
        "n_chunks",
        F.coalesce("n_surviving", F.lit(0)).cast("bigint").alias(
            "n_surviving"
        ),
    )


def _sql_chunk_dedup_stats(size: int = 32, stride: int = 32) -> str:
    return f"""
WITH t AS (SELECT doc_id, CASE WHEN trim(text) = '' THEN []
             ELSE {_TOKS} END AS toks FROM documents),
c AS (SELECT doc_id, len(toks) AS n, toks,
        CASE WHEN len(toks) > 0 THEN
          CAST(floor((greatest(len(toks) - {size}, 0) + {stride - 1})
               / {stride}.0) AS INT) + 1
        ELSE 0 END AS nc FROM t),
ch AS (SELECT doc_id, CAST(i AS INT) AS chunk_idx,
         md5(array_to_string(
           toks[i * {stride} + 1 : i * {stride} + {size}], ' ')) AS h
       FROM (SELECT doc_id, n, toks, unnest(range(0, nc)) AS i FROM c)),
r AS (SELECT doc_id, chunk_idx,
        row_number() OVER (PARTITION BY h ORDER BY doc_id, chunk_idx)
          AS rn
      FROM ch)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_surviving
FROM r GROUP BY doc_id
"""


REGISTRY["ext_chunk_dedup_stats"] = (
    q_chunk_dedup_stats,
    _sql_chunk_dedup_stats(),
)


def q_chunk_dedup_rewrite(spark, sf_dir):
    """Corpus rewrite by global passage dedup (ext/textstats.py
    chunk_dedup_rewrite): tumbling 32-token chunks, corpus-wide exact
    keep-first, documents reassembled from surviving chunks — the
    span-removal transform (C4 / RefinedWeb line-dedup analog at token
    granularity) that PRODUCES the cleaned corpus the stats twin
    (`ext_chunk_dedup_stats`) only reports on."""
    from uofi_payroll_etl_main_demo_spark.ext.textstats import (
        chunk_dedup_rewrite,
    )

    return chunk_dedup_rewrite(
        _t(spark, sf_dir, "documents"), size=32
    )


def _sql_chunk_dedup_rewrite(size: int = 32) -> str:
    return f"""
WITH t AS (SELECT doc_id, CASE WHEN trim(text) = '' THEN []
             ELSE {_TOKS} END AS toks FROM documents),
c AS (SELECT doc_id, toks,
        CASE WHEN len(toks) > 0 THEN
          CAST(floor((greatest(len(toks) - {size}, 0) + {size - 1})
               / {size}.0) AS INT) + 1
        ELSE 0 END AS nc FROM t),
ch AS (SELECT doc_id, CAST(i AS INT) AS chunk_idx,
         array_to_string(
           toks[i * {size} + 1 : i * {size} + {size}], ' ') AS chunk_text
       FROM (SELECT doc_id, toks, unnest(range(0, nc)) AS i FROM c)),
r AS (SELECT doc_id, chunk_idx, chunk_text,
        row_number() OVER (PARTITION BY md5(chunk_text)
                           ORDER BY doc_id, chunk_idx) AS rn
      FROM ch),
g AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
        CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        coalesce(string_agg(CASE WHEN rn = 1 THEN chunk_text END, ' '
                            ORDER BY chunk_idx), '') AS text_clean
      FROM r GROUP BY doc_id)
SELECT d.doc_id,
       coalesce(g.n_chunks, 0) AS n_chunks,
       coalesce(g.n_kept, 0) AS n_kept,
       coalesce(g.text_clean, '') AS text_clean
FROM documents d LEFT JOIN g USING (doc_id)
"""


REGISTRY["ext_chunk_dedup_rewrite"] = (
    q_chunk_dedup_rewrite,
    _sql_chunk_dedup_rewrite(),
)


def q_rewrite_quarantine_report(spark, sf_dir):
    """Quarantine REPORT for the rewrite byte-cap valve: which
    documents a ``max_chunk_bytes`` cap would exclude, with the
    offending max tumbling-chunk byte length — the same accountability
    query the media quarantine has (`ext_media_quarantine_report`):
    a valve that silently drops rows is a data-loss bug, a valve whose
    quarantine set is one query away is an operational control. The
    report shares the valve's exact guard expression
    (``max_tumbling_chunk_bytes`` — one narrow fold over token byte
    lengths, chunk text never built), so report and valve cannot
    disagree. The cap here (170 B over 32-token chunks) sits inside
    the fixture corpus' chunk-size distribution (p90 ≈ 182 B), so the
    report is value-checked on a NON-empty quarantine set."""
    from uofi_payroll_etl_main_demo_spark.ext.textstats import (
        max_tumbling_chunk_bytes,
    )

    docs = _t(spark, sf_dir, "documents")
    mb = max_tumbling_chunk_bytes("text", 32)
    return (
        docs.select(
            "doc_id", mb.cast("bigint").alias("max_chunk_bytes")
        )
        .filter(F.col("max_chunk_bytes") > 170)
        .orderBy("doc_id")
    )


def _sql_rewrite_quarantine_report(size: int = 32, cap: int = 170) -> str:
    return f"""
WITH t AS (SELECT doc_id, CASE WHEN trim(text) = '' THEN []
             ELSE {_TOKS} END AS toks FROM documents),
c AS (SELECT doc_id, len(toks) AS n, toks,
        CASE WHEN len(toks) > 0 THEN
          CAST(floor((greatest(len(toks) - {size}, 0) + {size - 1})
               / {size}.0) AS INT) + 1
        ELSE 0 END AS nc FROM t),
ch AS (SELECT doc_id,
         strlen(array_to_string(
           toks[i * {size} + 1 : i * {size} + {size}], ' ')) AS cb
       FROM (SELECT doc_id, toks, unnest(range(0, nc)) AS i FROM c)),
mx AS (SELECT doc_id, CAST(max(cb) AS BIGINT) AS max_chunk_bytes
       FROM ch GROUP BY doc_id)
SELECT doc_id, max_chunk_bytes FROM mx
WHERE max_chunk_bytes > {cap} ORDER BY doc_id
"""


REGISTRY["ext_rewrite_quarantine_report"] = (
    q_rewrite_quarantine_report,
    _sql_rewrite_quarantine_report(),
)


def q_vocab_panel(spark, sf_dir):
    """Per-source vocabulary-health panel (ext/textstats.py
    vocab_panel): token occurrences, type count, hapax count,
    type-token ratio, dominant term + share — the Zipf-shape summary
    of a dataset card, one linear scan."""
    from uofi_payroll_etl_main_demo_spark.ext.textstats import vocab_panel

    return vocab_panel(_t(spark, sf_dir, "documents"))


def _sql_vocab_panel() -> str:
    return f"""
WITH tok AS (
  SELECT source, unnest({_TOKS}) AS t FROM documents
),
c AS (SELECT source, t, count(*) AS n FROM tok GROUP BY source, t),
top AS (SELECT source, max(struct_pack(n := n, t := t)) AS best,
          sum(n) AS total, count(*) AS types,
          sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS hapax
        FROM c GROUP BY source)
SELECT source,
  CAST(total AS BIGINT) AS total_tokens,
  CAST(types AS BIGINT) AS vocab_size,
  CAST(hapax AS BIGINT) AS hapax_count,
  round(CAST(types AS DOUBLE) / total, 6) AS type_token_ratio,
  best.t AS top_term,
  round(CAST(best.n AS DOUBLE) / total, 6) AS top_term_share
FROM top
"""


REGISTRY["ext_vocab_panel"] = (q_vocab_panel, _sql_vocab_panel())


def q_pipeline_rewrite_curation(spark, sf_dir):
    """Rewrite-then-curate composite: global passage-dedup REWRITE →
    re-score quality on the CLEANED text → drop now-empty/low-quality
    docs → per-source panel of the post-rewrite corpus. Demonstrates
    that the rewrite output (`text_clean`) feeds every downstream
    text operator unchanged — the dedup→rescore→mix loop of a real
    corpus refresh, one lazy plan."""
    from uofi_payroll_etl_main_demo_spark.ext.textstats import (
        chunk_dedup_rewrite,
        curation_scores,
    )

    docs = _t(spark, sf_dir, "documents")
    rw = chunk_dedup_rewrite(docs, size=32)
    rescored = curation_scores(
        rw.filter(F.col("n_kept") > 0), text_col="text_clean"
    )
    kept = rescored.filter(F.col("quality") >= 0.5).join(
        docs.select("doc_id", "source"), "doc_id"
    )
    # mean through DECIMAL(18,6) sums of round-6 per-doc values
    # (associative => partition-order independent, engine-exact)
    n = F.count(F.lit(1))
    return kept.select(
        "source", F.round("quality", 6).cast("decimal(18,6)").alias("__q")
    ).groupBy("source").agg(
        n.cast("bigint").alias("n_docs"),
        F.round(F.sum("__q").cast("double") / n, 6).alias("avg_quality"),
    )


def _sql_pipeline_rewrite_curation() -> str:
    # Rename text_clean -> text so the shared _TOKS / quality formula
    # applies verbatim to the rewritten corpus.
    return f"""
WITH rw AS ({_sql_chunk_dedup_rewrite()}),
txt AS (SELECT doc_id, text_clean AS text FROM rw WHERE n_kept > 0),
t AS (SELECT doc_id, text, CASE WHEN trim(text) = '' THEN []
        ELSE {_TOKS} END AS toks FROM txt),
q AS (SELECT doc_id,
    0.4 * least(len(toks) / 100.0, 1.0)
    + 0.4 * (CASE WHEN len(toks) > 0
             THEN CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
             ELSE 0.0 END)
    + 0.2 * (1.0 - least(
        (CASE WHEN length(text) > 0
         THEN CAST(len(regexp_extract_all(text, '{_SQL_PUNCT}')) AS DOUBLE)
              / length(text) ELSE 0.0 END) * 5, 1.0)) AS quality
  FROM t),
qd AS (SELECT doc_id, quality,
         CAST(round(quality, 6) AS DECIMAL(18,6)) AS qdec FROM q)
SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
       round(CAST(sum(qd.qdec) AS DOUBLE) / count(*), 6) AS avg_quality
FROM qd JOIN documents d USING (doc_id)
WHERE qd.quality >= 0.5
GROUP BY d.source
"""


REGISTRY["pipeline_rewrite_curation"] = (
    q_pipeline_rewrite_curation,
    _sql_pipeline_rewrite_curation(),
)


def q_minhash_estimate_audit(spark, sf_dir):
    """Sketch-accuracy audit (the MinHash sibling of the CMS report):
    for every verified near-dup pair, the SIGNATURE-estimated Jaccard
    (matching minima per 32-hash signature, integer ppm) beside the
    exact value — what calibrates num_hashes against the error budget.
    Portable family, so the estimate itself is oracle-exact."""
    from uofi_payroll_etl_main_demo_spark.ext.dedup import (
        minhash_signatures,
    )

    docs = _t(spark, sf_dir, "documents")
    pairs = minhash_near_dup_pairs(
        docs, num_hashes=32, bands=16, k=3, threshold=0.2,
        hash_family="portable",
    ).select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    sigs = minhash_signatures(
        docs, num_hashes=32, k=3, hash_family="portable"
    )
    sa = sigs.select(F.col("doc_id").alias("id_a"), F.col("sig").alias("__sa"))
    sb = sigs.select(F.col("doc_id").alias("id_b"), F.col("sig").alias("__sb"))
    matches = F.size(
        F.filter(
            F.zip_with(F.col("__sa"), F.col("__sb"), lambda x, y: x == y),
            lambda b: b,
        )
    )
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            "jaccard",
            (matches * 1_000_000 / F.lit(32))
            .cast("bigint")
            .alias("est_ppm"),
        )
    )


def _sql_minhash_estimate_audit(num_hashes: int = 32) -> str:
    return f"""
WITH pairs AS (SELECT id_a, id_b, jaccard
               FROM ({_sql_minhash_pairs()}) q),
t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           range(1, len(toks) - 3 + 2),
           i -> array_to_string(toks[i:i + 2], ' ')))) AS s
  FROM t WHERE len(toks) >= 3),
hx AS (SELECT doc_id,
         ('0x' || substr(md5(s), 1, 13))::BIGINT AS b1,
         ('0x' || substr(md5(s), 14, 13))::BIGINT AS b2
       FROM sh),
perms AS (SELECT doc_id, r.i, min(b1 + r.i * b2) AS m
          FROM hx CROSS JOIN range(0, {num_hashes}) r(i)
          GROUP BY doc_id, r.i),
est AS (
  SELECT p.id_a, p.id_b,
         CAST(sum(CASE WHEN a.m = b.m THEN 1 ELSE 0 END)
              * 1000000 // {num_hashes} AS BIGINT) AS est_ppm
  FROM pairs p
  JOIN perms a ON a.doc_id = p.id_a
  JOIN perms b ON b.doc_id = p.id_b AND a.i = b.i
  GROUP BY p.id_a, p.id_b)
SELECT p.id_a, p.id_b, p.jaccard, e.est_ppm
FROM pairs p JOIN est e ON p.id_a = e.id_a AND p.id_b = e.id_b
"""


REGISTRY["ext_minhash_estimate_audit"] = (
    q_minhash_estimate_audit,
    _sql_minhash_estimate_audit(),
)


def q_null_safe_join(spark, sf_dir):
    """J13 (extension): NULL-SAFE equi-join (`<=>` / IS NOT DISTINCT
    FROM) — messy-feed keys where NULL must match NULL instead of
    dropping the row (the reference's pandas merges treat NaN keys as
    equal on neither side; Spark offers both semantics). Fact keys are
    nulled deterministically; the dim carries an explicit NULL bucket
    row."""
    docs = _t(spark, sf_dir, "documents")
    fact = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 11 == 0, F.lit(None)).otherwise(
            F.col("source")
        ).alias("k"),
    )
    dim = (
        docs.select(F.col("source").alias("k"))
        .distinct()
        .unionByName(
            docs.sparkSession.createDataFrame([(None,)], "k string")
        )
        .withColumn("bucket_name", F.coalesce("k", F.lit("UNKNOWN")))
    )
    return (
        fact.join(dim, fact["k"].eqNullSafe(dim["k"]))
        .groupBy("bucket_name")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def _sql_null_safe_join() -> str:
    return """
WITH fact AS (
  SELECT doc_id,
         CASE WHEN doc_id % 11 = 0 THEN NULL ELSE source END AS k
  FROM documents),
dim AS (
  SELECT k, COALESCE(k, 'UNKNOWN') AS bucket_name FROM (
    SELECT DISTINCT source AS k FROM documents
    UNION ALL SELECT NULL))
SELECT d.bucket_name, CAST(count(*) AS BIGINT) AS n_docs
FROM fact f JOIN dim d ON f.k IS NOT DISTINCT FROM d.k
GROUP BY d.bucket_name
"""


REGISTRY["j13_null_safe_join"] = (q_null_safe_join, _sql_null_safe_join())


def q_session_window_native(spark, sf_dir):
    """W9 (extension): Spark-NATIVE session windows —
    ``session_window(ts, gap)`` in a batch groupBy (the built-in
    sibling of the applyInPandasWithState sessionizer; same 30-minute
    gap semantics, session end = last event + gap). Oracle rebuilds
    sessions via the lag/cumsum formulation and must agree exactly."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "session_start"
            ),
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "session_end"
            ),
            "n_events",
        )
    )


def _sql_session_window_native() -> str:
    return f"""
WITH s AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts), 1, 0)
                OVER (PARTITION BY user_id ORDER BY ts, event_id)
              > {30 * 60 * 1_000_000} THEN 1 ELSE 0 END AS ns
  FROM events),
sess AS (
  SELECT user_id, ts,
         sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS sid
  FROM s)
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
       strftime(max(ts) + INTERVAL '30 minutes',
                '%Y-%m-%d %H:%M:%S.%f') AS session_end,
       CAST(count(*) AS BIGINT) AS n_events
FROM sess GROUP BY user_id, sid
"""


REGISTRY["w9_session_window_native"] = (
    q_session_window_native,
    _sql_session_window_native(),
)


def q_windowed_distinct_users(spark, sf_dir):
    """A18 (extension): exact distinct users per hourly window and
    event type — the unique-actor rate panel (distinct aggregation
    under a time window; the HLL sibling is a9)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm").alias(
                "window_start"
            ),
            "event_type",
            "n_users",
        )
    )


def _sql_windowed_distinct_users() -> str:
    return """
SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M')
         AS window_start,
       event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY 1, 2
"""


REGISTRY["a18_windowed_distinct_users"] = (
    q_windowed_distinct_users,
    _sql_windowed_distinct_users(),
)


def q_embedding_outliers(spark, sf_dir):
    """Embedding QA: the 10 vectors FARTHEST from their own label
    centroid (lowest cosine) — mislabeled/corrupt-vector mining. The
    centroid table is label-count-sized and broadcasts onto the
    posexploded corpus; cosine is assembled from grouped per-dimension
    sums (64 double terms — far inside round-6)."""
    emb = _t(spark, sf_dir, "embeddings")
    # Corpus-sized centroid means through DECIMAL sums of round-6
    # components (partition-order exact — see q_label_centroids); the
    # remaining double sums are 64 fixed per-vector terms, far inside
    # round-6.
    cent = (
        emb.select(
            "label", F.posexplode(F.col("embedding").cast("array<double>"))
        )
        .groupBy("label", "pos")
        .agg(
            (
                F.sum(F.round("col", 6).cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("c")
        )
    )
    vec = emb.select(
        "vec_id", "label",
        F.posexplode(F.col("embedding").cast("array<double>")),
    )
    j = vec.join(F.broadcast(cent), ["label", "pos"])
    per_vec = j.groupBy("vec_id", "label").agg(
        F.sum(F.col("col") * F.col("c")).alias("dot"),
        F.sum(F.col("col") * F.col("col")).alias("vv"),
        F.sum(F.col("c") * F.col("c")).alias("cc"),
    )
    cos = F.col("dot") / (F.sqrt("vv") * F.sqrt("cc"))
    return (
        per_vec.select(
            "vec_id", "label", F.round(cos, 6).alias("cosine")
        )
        .orderBy(F.asc("cosine"), F.asc("vec_id"))
        .limit(10)
    )


def _sql_embedding_outliers(top_n: int = 10, dim: int = 64) -> str:
    return f"""
WITH v AS (
  SELECT vec_id, label, r.i AS pos,
         CAST(embedding[r.i] AS DOUBLE) AS x
  FROM embeddings CROSS JOIN range(1, {dim + 1}) r(i)),
cent AS (SELECT label, pos,
                CAST(sum(CAST(round(x, 6) AS DECIMAL(18,6))) AS DOUBLE)
                / count(*) AS c
         FROM v GROUP BY label, pos),
p AS (
  SELECT v.vec_id, v.label,
         sum(v.x * cent.c) AS dot,
         sum(v.x * v.x) AS vv,
         sum(cent.c * cent.c) AS cc
  FROM v JOIN cent ON v.label = cent.label AND v.pos = cent.pos
  GROUP BY v.vec_id, v.label)
SELECT vec_id, label,
       round(dot / (sqrt(vv) * sqrt(cc)), 6) AS cosine
FROM p ORDER BY cosine, vec_id LIMIT {top_n}
"""


REGISTRY["ext_embedding_outliers"] = (
    q_embedding_outliers,
    _sql_embedding_outliers(),
)


def q_embedding_norm_stats(spark, sf_dir):
    """Embedding QA: per-label L2-norm panel (count, mean of round-6
    norms through DECIMAL sums — partition-order exact — plus exact
    min/max) — the scale-drift check run before any cosine math
    assumes comparable magnitudes."""
    from uofi_payroll_etl_main_demo_spark.functions.vectors import l2_norm

    emb = _t(spark, sf_dir, "embeddings")
    n6 = F.round(l2_norm(F.col("embedding")), 6)
    base = emb.select(
        "label", n6.cast("decimal(18,6)").alias("__n")
    )
    cnt = F.count(F.lit(1))
    return base.groupBy("label").agg(
        cnt.alias("n_vecs"),
        F.round(F.sum("__n").cast("double") / cnt, 6).alias("avg_norm"),
        F.min("__n").cast("double").alias("min_norm"),
        F.max("__n").cast("double").alias("max_norm"),
    )


def _sql_embedding_norm_stats() -> str:
    return """
WITH n AS (
  SELECT label,
         CAST(round(sqrt(list_aggregate(list_transform(
           CAST(embedding AS DOUBLE[]), x -> x * x), 'sum')), 6)
           AS DECIMAL(18,6)) AS nn
  FROM embeddings)
SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
       round(CAST(sum(nn) AS DOUBLE) / count(*), 6) AS avg_norm,
       CAST(min(nn) AS DOUBLE) AS min_norm,
       CAST(max(nn) AS DOUBLE) AS max_norm
FROM n GROUP BY label
"""


REGISTRY["ext_embedding_norm_stats"] = (
    q_embedding_norm_stats,
    _sql_embedding_norm_stats(),
)


def q_zorder_key(spark, sf_dir):
    """Z-order (Morton) clustering key over lineitem's (part, supplier)
    dimensions — the layout law behind multi-dimensional zone-map
    pruning (ext/layout.py zorder_key; cf. Delta OPTIMIZE ZORDER BY).
    Pure integer Column arithmetic (clamp → exact-floor scale → bit
    interleave), no UDFs, one whole-stage-codegen projection. The
    modulo keeps the domain bounds CONSTANT across scale factors, and
    the (0, 4999) bounds exercise the non-identity scaling path
    ((x * 4095) // 4999). Oracle: DuckDB evaluates the expression text
    from zorder_key_sql — both engines share one generated law."""
    from uofi_payroll_etl_main_demo_spark.ext.layout import zorder_key

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    px = (F.col("l_partkey") % 5000).alias("px")
    sx = (F.col("l_suppkey") % 5000).alias("sx")
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            zorder_key([(px, 0, 4999), (sx, 0, 4999)], bits=12).alias("zkey"),
        )
        .orderBy("zkey", "l_orderkey", "l_linenumber")
        .limit(100)
    )


def _sql_zorder_key() -> str:
    from uofi_payroll_etl_main_demo_spark.ext.layout import zorder_key_sql

    expr = zorder_key_sql([("px", 0, 4999), ("sx", 0, 4999)], bits=12)
    return f"""
WITH base AS (
  SELECT l_orderkey, l_linenumber,
         l_partkey % 5000 AS px, l_suppkey % 5000 AS sx
  FROM lineitem)
SELECT l_orderkey, l_linenumber, {expr} AS zkey
FROM base
ORDER BY zkey, l_orderkey, l_linenumber
LIMIT 100
"""


REGISTRY["ext_zorder_key"] = (q_zorder_key, _sql_zorder_key())


def q_zorder_layout_stats(spark, sf_dir):
    """The WHY of z-ordering, measured: bucket lineitem by the top 6
    bits of the 24-bit Morton key (64 contiguous curve segments = the
    deterministic stand-in for range-partitioned output files) and
    report each bucket's min/max span on BOTH dimensions. Every bucket
    bounds every participating column — the per-file zone maps a scan
    prunes with; compare against a natural-order layout where only
    insertion order is bounded. Fixed-width ``zkey >> 6`` bucketing
    (not repartitionByRange) keeps the oracle sampling-free; the %64
    domain wraps even at the smallest fixture sf, so the driver's
    sf0.01 run covers all 64 buckets on the part dimension."""
    from uofi_payroll_etl_main_demo_spark.ext.layout import zorder_key

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    px = (F.col("l_partkey") % 64).alias("px")
    sx = (F.col("l_suppkey") % 64).alias("sx")
    keyed = li.select(
        (F.col("l_partkey") % 64).alias("px"),
        (F.col("l_suppkey") % 64).alias("sx"),
        zorder_key([(px, 0, 63), (sx, 0, 63)], bits=6).alias("zkey"),
    )
    return (
        keyed.groupBy(F.shiftright("zkey", 6).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("px").alias("px_min"),
            F.max("px").alias("px_max"),
            F.min("sx").alias("sx_min"),
            F.max("sx").alias("sx_max"),
        )
        .orderBy("bucket")
    )


def _sql_zorder_layout_stats() -> str:
    from uofi_payroll_etl_main_demo_spark.ext.layout import zorder_key_sql

    expr = zorder_key_sql([("px", 0, 63), ("sx", 0, 63)], bits=6)
    return f"""
WITH base AS (
  SELECT l_partkey % 64 AS px, l_suppkey % 64 AS sx FROM lineitem),
keyed AS (SELECT px, sx, {expr} AS zkey FROM base)
SELECT zkey >> 6 AS bucket, CAST(count(*) AS BIGINT) AS n_rows,
       min(px) AS px_min, max(px) AS px_max,
       min(sx) AS sx_min, max(sx) AS sx_max
FROM keyed GROUP BY zkey >> 6
ORDER BY bucket
"""


REGISTRY["ext_zorder_layout_stats"] = (
    q_zorder_layout_stats,
    _sql_zorder_layout_stats(),
)


def q_data_constraints(spark, sf_dir):
    """Data-quality constraint gate (validate/constraints.py — the
    Deequ/Great-Expectations shape): every row-predicate and
    uniqueness rule folds into ONE aggregate scan, and the
    foreign-key rule folds into the SAME scan as a broadcast hash
    probe (its dim is broadcast-sized by Catalyst's own stats) — the
    fact table is scanned exactly once, no anti-join job; a genuinely
    large dim would fall back to the anti-join path (both pinned in
    tests/test_validate.py). The l_discount bound is DELIBERATELY
    violated (TPC-H discounts go to 0.10) so the report's failed path
    is exercised, not just the all-green one."""
    from uofi_payroll_etl_main_demo_spark.validate.constraints import (
        check_data_constraints,
        foreign_key,
        in_range,
        matches,
        not_null,
        unique,
    )

    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    rules = [
        not_null("l_orderkey"),
        in_range("l_quantity", 1, 50),
        in_range("l_discount", 0.0, 0.08),
        matches("l_returnflag", "^[ARN]$"),
        unique("l_orderkey", "l_linenumber"),
        foreign_key("l_orderkey", orders, "o_orderkey"),
    ]
    return check_data_constraints(li, rules).orderBy("rule")


def _sql_data_constraints() -> str:
    return """
SELECT 'not_null(l_orderkey)' AS rule,
       (SELECT count(*) FROM lineitem) AS n_rows,
       (SELECT count(*) FROM lineitem WHERE l_orderkey IS NULL)
         AS n_violations
UNION ALL
SELECT 'in_range(l_quantity, 1, 50)',
       (SELECT count(*) FROM lineitem),
       (SELECT count(*) FROM lineitem
        WHERE NOT (l_quantity IS NOT NULL
                   AND l_quantity BETWEEN 1 AND 50))
UNION ALL
SELECT 'in_range(l_discount, 0.0, 0.08)',
       (SELECT count(*) FROM lineitem),
       (SELECT count(*) FROM lineitem
        WHERE NOT (l_discount IS NOT NULL
                   AND l_discount BETWEEN 0.0 AND 0.08))
UNION ALL
SELECT 'matches(l_returnflag, ^[ARN]$)',
       (SELECT count(*) FROM lineitem),
       (SELECT count(*) FROM lineitem
        WHERE NOT (l_returnflag IS NOT NULL
                   AND regexp_matches(l_returnflag, '^(?:^[ARN]$)$')))
UNION ALL
SELECT 'unique(l_orderkey, l_linenumber)',
       (SELECT count(*) FROM lineitem),
       (SELECT count(*) - count(DISTINCT (l_orderkey, l_linenumber))
        FROM lineitem)
UNION ALL
SELECT 'foreign_key(l_orderkey -> o_orderkey)',
       (SELECT count(*) FROM lineitem),
       (SELECT count(*) FROM lineitem l
        WHERE l.l_orderkey IS NOT NULL
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey))
"""


REGISTRY["ext_data_constraints"] = (
    q_data_constraints,
    f"""WITH rep AS ({_sql_data_constraints()})
SELECT rule, CAST(n_rows AS BIGINT) AS n_rows,
       CAST(n_violations AS BIGINT) AS n_violations,
       n_violations = 0 AS passed
FROM rep ORDER BY rule
""",
)


def q_skew_report(spark, sf_dir):
    """Shuffle-key skew diagnosis (operators/skew.py skew_report): the
    top keys of a prospective shuffle key with share, cumulative
    share and skew_factor = count/mean-per-key — the number
    with_salt's n_salts wants. Scale shape pinned in the operator: one
    partial-agg groupBy, a partial top-k (orderBy+limit — never a
    single-partition window over all keys), and a one-row driver
    total folded back as literals (the A5 aggregate→driver precedent;
    a join-based attach constant-folds into a BNLJ the plan lint
    bans). Fixture's lang column is genuinely skewed (en ≈ 44%)."""
    from uofi_payroll_etl_main_demo_spark.operators.skew import skew_report

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return skew_report(docs, ["lang"], top_n=10)


def _sql_skew_report() -> str:
    return """
WITH counts AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY lang),
tot AS (SELECT sum(cnt) AS total, count(*) AS n_keys FROM counts),
top AS (SELECT * FROM counts ORDER BY cnt DESC, lang LIMIT 10)
SELECT lang,
  CAST(row_number() OVER (ORDER BY cnt DESC, lang) AS INT) AS rank,
  CAST(cnt AS BIGINT) AS cnt,
  round(cnt * 100.0 / total, 4) AS share_pct,
  round(sum(cnt) OVER (ORDER BY cnt DESC, lang ROWS UNBOUNDED PRECEDING)
        * 100.0 / total, 4) AS cum_share_pct,
  round(cnt * n_keys * 1.0 / total, 4) AS skew_factor
FROM top, tot
"""


REGISTRY["ext_skew_report"] = (q_skew_report, _sql_skew_report())


_CDC_W, _CDC_D = 8, 64


def _sql_cdc_chunk_table(where: str = "", p: str = "") -> str:
    from uofi_payroll_etl_main_demo_spark.ext.cdc import CDC_M, CDC_P

    terms = " + ".join(
        f"(lag(code, {k}) OVER w * {pow(CDC_P, k, CDC_M)}::BIGINT) % {CDC_M}"
        if k
        else f"(code * 1::BIGINT) % {CDC_M}"
        for k in range(_CDC_W)
    )
    return f"""
{p}chars AS (
  SELECT doc_id, unnest(generate_series(0, length(text) - 1)) AS pos, text
  FROM documents {where}
),
{p}coded AS (
  SELECT doc_id, pos, ord(substr(text, CAST(pos AS INT) + 1, 1)) AS code
  FROM {p}chars
),
{p}hashed AS (
  SELECT doc_id, pos,
    CASE WHEN pos >= {_CDC_W - 1} THEN ({terms}) % {CDC_M}
         ELSE NULL END AS h
  FROM {p}coded
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
{p}assigned AS (
  SELECT doc_id, pos,
    COALESCE(sum(CASE WHEN h IS NOT NULL AND h % {_CDC_D} = 0 THEN 1
                      ELSE 0 END)
      OVER (PARTITION BY doc_id ORDER BY pos
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      0) AS chunk_idx
  FROM {p}hashed
),
{p}spans AS (
  SELECT doc_id, chunk_idx, min(pos) AS start, count(*) AS chunk_len
  FROM {p}assigned GROUP BY doc_id, chunk_idx
),
{p}chunk_table AS (
  SELECT CAST(c.doc_id AS BIGINT) AS doc_id,
         CAST(c.chunk_idx AS BIGINT) AS chunk_idx,
         CAST(c.start AS BIGINT) AS start,
         CAST(c.chunk_len AS BIGINT) AS chunk_len,
         md5(substr(d.text, CAST(c.start AS INT) + 1,
                    CAST(c.chunk_len AS INT))) AS chunk_hash
  FROM {p}spans c JOIN documents d USING (doc_id)
)"""


def q_cdc_chunks(spark, sf_dir):
    """Content-defined chunking over documents (ext/cdc.py): rolling
    window-hash boundaries (LBFS/Rabin family; W=8, divisor 64), one
    row per chunk with its md5. The Spark side is the PRODUCTION numpy
    mapInPandas path (no shuffle — each doc chunks independently); the
    oracle rebuilds the law declaratively with lag/window functions —
    a cross-IMPLEMENTATION differential, not a re-run of the same
    code. The windowed (stateless) law is what makes both the
    parallelism and the non-recursive oracle possible."""
    from uofi_payroll_etl_main_demo_spark.ext.cdc import cdc_chunks

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return cdc_chunks(docs, window=_CDC_W, divisor=_CDC_D)


REGISTRY["ext_cdc_chunks"] = (
    q_cdc_chunks,
    f"WITH {_sql_cdc_chunk_table()} SELECT * FROM chunk_table",
)


def q_cdc_chunk_dedup(spark, sf_dir):
    """Chunk-level duplication report: content-defined chunks shared
    by MORE THAN ONE document — what a chunk store would deduplicate,
    and what shifted/partially-edited near-dup docs still have in
    common when fixed-width chunking finds nothing. Shuffles only
    (hash, len, doc_id) — never chunk text."""
    from uofi_payroll_etl_main_demo_spark.ext.cdc import cdc_chunks

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ch = cdc_chunks(docs, window=_CDC_W, divisor=_CDC_D)
    return (
        ch.groupBy("chunk_hash", "chunk_len")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_occ"),
        )
        .filter(F.col("n_docs") >= 2)
    )


def q_cdc_containment(spark, sf_dir):
    """Batch-vs-corpus CDC containment (ext/cdc.py cdc_containment):
    how much of an incoming batch (doc_id % 4 == 0 — the deterministic
    stand-in for today's crawl) is chunk-level content already in the
    corpus (the other docs). CDC boundaries re-synchronize under
    edits, so moved-but-unchanged passages still match — the metric
    fixed-width chunking breaks. Incremental shape: batch chunk pass +
    one hash join against DISTINCT corpus hashes; chunk text never
    shuffles. Oracle: the chunk CTE twice (prefixed, WHERE-split) +
    the same left-join containment arithmetic."""
    from uofi_payroll_etl_main_demo_spark.ext.cdc import cdc_containment

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 4 != 0)
    batch = docs.filter(F.col("doc_id") % 4 == 0)
    return cdc_containment(
        corpus, batch, window=_CDC_W, divisor=_CDC_D
    )


_SQL_CDC_CONTAINMENT = f"""WITH {_sql_cdc_chunk_table(
        where="WHERE doc_id % 4 != 0", p="co_")},
{_sql_cdc_chunk_table(where="WHERE doc_id % 4 = 0", p="ba_")},
old AS (SELECT DISTINCT chunk_hash FROM co_chunk_table),
marked AS (
  SELECT b.doc_id, b.chunk_hash,
         CASE WHEN o.chunk_hash IS NOT NULL THEN 1 END AS seen
  FROM ba_chunk_table b LEFT JOIN old o USING (chunk_hash)
),
scored AS (
  SELECT doc_id, count(*) AS n_chunks, count(seen) AS n_seen
  FROM marked GROUP BY doc_id
),
base AS (SELECT DISTINCT doc_id FROM documents WHERE doc_id % 4 = 0)
SELECT base.doc_id,
       CAST(coalesce(s.n_chunks, 0) AS BIGINT) AS n_chunks,
       CAST(coalesce(s.n_seen, 0) AS BIGINT) AS n_seen,
       CASE WHEN coalesce(s.n_chunks, 0) = 0 THEN NULL
            ELSE round(s.n_seen * 1.0 / s.n_chunks, 6) END AS containment
FROM base LEFT JOIN scored s USING (doc_id)
"""

REGISTRY["ext_cdc_containment"] = (q_cdc_containment, _SQL_CDC_CONTAINMENT)


def q_cdc_containment_index(spark, sf_dir):
    """Persisted-CDC-chunk-index SERVING path (build→save→load→query
    lifecycle, ext/cdc_index.py): the corpus' distinct chunk-hash set
    for this snapshot is ensure-built ONCE (keyed by a corpus
    fingerprint — repeat queries load, never re-chunk) and the
    containment answer comes from the batch chunk pass + one hash
    join against the STORED set. Same split and params as
    ext_cdc_containment, so the index serves EXACTLY the inline
    operator's result and shares its SQL twin — the whole
    build→persist→load→serve path is value-checked."""
    from uofi_payroll_etl_main_demo_spark.ext.ann_index import (
        corpus_fingerprint,
    )
    from uofi_payroll_etl_main_demo_spark.ext.cdc_index import (
        ensure_cdc_index,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 4 != 0)
    batch = docs.filter(F.col("doc_id") % 4 == 0)
    doc_path = os.path.join(sf_dir, "documents.parquet")
    idx_dir = os.path.join(
        _ann_index_root(),
        f"cdc{_CDC_W}x{_CDC_D}_{os.path.basename(os.path.normpath(sf_dir))}",
    )
    index = ensure_cdc_index(
        corpus,
        idx_dir,
        corpus_tag=f"mod4!=0:{corpus_fingerprint(doc_path)}",
        window=_CDC_W,
        divisor=_CDC_D,
    )
    return index.query(batch)


REGISTRY["ext_cdc_containment_index"] = (
    q_cdc_containment_index,
    _SQL_CDC_CONTAINMENT,
)


def q_cdc_containment_postdelete(spark, sf_dir):
    """Containment serving AFTER a takedown (ext/cdc_index.py
    cdc_index_delete): corpus docs with ``doc_id % 8 == 1`` were
    erased from the persisted chunk store, and the oracle recomputes
    containment from the raw documents WITHOUT them — value-equality
    proves the owners-table refcounting is EXACT: hashes shared with
    surviving docs stayed, hashes only the erased docs held are gone
    (a bare hash-set store cannot make that distinction). Idempotent
    per corpus snapshot via the post-delete tag."""
    from uofi_payroll_etl_main_demo_spark.ext.ann_index import (
        _fs_exists,
        corpus_fingerprint,
    )
    from uofi_payroll_etl_main_demo_spark.ext.cdc_index import (
        _read_cdc_meta,
        cdc_index_build,
        cdc_index_delete,
        cdc_index_load,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 4 != 0)
    batch = docs.filter(F.col("doc_id") % 4 == 0)
    doc_path = os.path.join(sf_dir, "documents.parquet")
    fp = corpus_fingerprint(doc_path)
    post_tag = f"mod4!=0-del8m1:{fp}"
    idx_dir = os.path.join(
        _ann_index_root(),
        f"cdcdel{_CDC_W}x{_CDC_D}_"
        f"{os.path.basename(os.path.normpath(sf_dir))}",
    )
    index = None
    if _fs_exists(spark, f"{idx_dir}/meta"):
        try:
            meta = _read_cdc_meta(spark, idx_dir)
        except Exception:
            meta = None
        if (
            meta
            and meta["corpus_tag"] == post_tag
            and meta["window"] == _CDC_W
            and meta["divisor"] == _CDC_D
        ):
            index = cdc_index_load(spark, idx_dir)
    if index is None:
        cdc_index_build(
            corpus,
            idx_dir,
            window=_CDC_W,
            divisor=_CDC_D,
            corpus_tag=f"mod4!=0:{fp}",
        )
        cdc_index_delete(
            spark,
            idx_dir,
            corpus.filter(F.col("doc_id") % 8 == 1).select("doc_id"),
            new_corpus_tag=post_tag,
        )
        index = cdc_index_load(spark, idx_dir)
    return index.query(batch)


_SQL_CDC_CONTAINMENT_POSTDELETE = f"""WITH {_sql_cdc_chunk_table(
        where="WHERE doc_id % 4 != 0 AND doc_id % 8 != 1", p="co_")},
{_sql_cdc_chunk_table(where="WHERE doc_id % 4 = 0", p="ba_")},
old AS (SELECT DISTINCT chunk_hash FROM co_chunk_table),
marked AS (
  SELECT b.doc_id, b.chunk_hash,
         CASE WHEN o.chunk_hash IS NOT NULL THEN 1 END AS seen
  FROM ba_chunk_table b LEFT JOIN old o USING (chunk_hash)
),
scored AS (
  SELECT doc_id, count(*) AS n_chunks, count(seen) AS n_seen
  FROM marked GROUP BY doc_id
),
base AS (SELECT DISTINCT doc_id FROM documents WHERE doc_id % 4 = 0)
SELECT base.doc_id,
       CAST(coalesce(s.n_chunks, 0) AS BIGINT) AS n_chunks,
       CAST(coalesce(s.n_seen, 0) AS BIGINT) AS n_seen,
       CASE WHEN coalesce(s.n_chunks, 0) = 0 THEN NULL
            ELSE round(s.n_seen * 1.0 / s.n_chunks, 6) END AS containment
FROM base LEFT JOIN scored s USING (doc_id)
"""

REGISTRY["ext_cdc_containment_postdelete"] = (
    q_cdc_containment_postdelete,
    _SQL_CDC_CONTAINMENT_POSTDELETE,
)


def q_substring_dedup_spans(spark, sf_dir):
    """Exact repeated-substring spans over documents (ext/cdc.py
    substring_dedup_spans — the character-level dedup of Lee et al.,
    ACL 2022, at gram width 40): every maximal span whose 40-grams all
    occur >= 2 times in the corpus. Spark side: numpy gram hashes (no
    shuffle) → integer-only groupBy for duplicate hashes →
    gaps-and-islands merge. Oracle: DuckDB recomputes the polynomial
    gram law as a generated 40-term lag sum, then the identical
    dup-filter + islands pipeline — cross-implementation, and any
    off-by-one in either engine's gram indexing moves a span edge."""
    from uofi_payroll_etl_main_demo_spark.ext.cdc import (
        substring_dedup_spans,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return substring_dedup_spans(docs, width=_SUBDUP_W)


_SUBDUP_W = 40


def _sql_substring_dedup_spans() -> str:
    from uofi_payroll_etl_main_demo_spark.ext.cdc import CDC_M, CDC_P

    w = _SUBDUP_W
    terms = " + ".join(
        f"(lag(code, {k}) OVER win * {pow(CDC_P, k, CDC_M)}::BIGINT) % {CDC_M}"
        if k
        else f"(code * 1::BIGINT) % {CDC_M}"
        for k in range(w)
    )
    return f"""
WITH chars AS (
  SELECT doc_id, unnest(generate_series(0, length(text) - 1)) AS pos, text
  FROM documents
),
coded AS (
  SELECT doc_id, pos, ord(substr(text, CAST(pos AS INT) + 1, 1)) AS code
  FROM chars
),
grams AS (
  SELECT doc_id, pos - {w - 1} AS start, ({terms}) % {CDC_M} AS gh
  FROM coded
  WINDOW win AS (PARTITION BY doc_id ORDER BY pos)
  QUALIFY pos >= {w - 1}
),
dup AS (
  SELECT gh FROM grams GROUP BY gh HAVING count(*) >= 2
),
hits AS (
  SELECT g.doc_id, g.start FROM grams g JOIN dup USING (gh)
),
islands AS (
  SELECT doc_id, start,
         start - row_number() OVER (PARTITION BY doc_id ORDER BY start)
           AS grp
  FROM hits
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(min(start) AS BIGINT) AS span_start,
       CAST(max(start) - min(start) + {w} AS BIGINT) AS span_len
FROM islands GROUP BY doc_id, grp
"""


REGISTRY["ext_substring_dedup_spans"] = (
    q_substring_dedup_spans,
    _sql_substring_dedup_spans(),
)


def q_dsir_weights(spark, sf_dir):
    """DSIR-style data selection, step 1 (ext/dsir.py): per-document
    importance weights toward a TARGET domain (here lang='en') as the
    hashed-bucket log-likelihood ratio log p_target − log p_raw, each
    per-token log floor-quantized to integer bits via the
    corpus-proven bit-length law — exact cross-engine where a libm
    log would not be. One explode, one B-row model aggregate (both
    models fit together), one broadcast join back: the selector's
    cost is two token passes whatever the corpus size."""
    from uofi_payroll_etl_main_demo_spark.ext.dsir import dsir_weights

    return dsir_weights(
        _t(spark, sf_dir, "documents"), F.col("lang") == "en"
    )


def _sql_dsir_panel() -> str:
    return f"""
WITH t AS (
  SELECT doc_id, (lang = 'en') AS tgt, unnest({_TOKS}) AS tok
  FROM documents WHERE trim(text) != ''
),
bk AS (SELECT doc_id, tgt,
         ('0x' || substr(md5(tok), 1, 13))::BIGINT % 1024 AS bkt
       FROM t),
m AS (SELECT bkt, count(*) AS cnt_r,
        sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS cnt_t
      FROM bk GROUP BY bkt),
tot AS (SELECT sum(cnt_r) + 1024 AS r_tot, sum(cnt_t) + 1024 AS t_tot
        FROM m),
w AS (SELECT bkt,
        (length(bin(r_tot // (cnt_r + 1))) - 1)
        - (length(bin(t_tot // (cnt_t + 1))) - 1) AS wb
      FROM m, tot)
SELECT doc_id, count(*) AS n_tokens,
       CAST(sum(wb) AS BIGINT) AS dsir_bits_sum,
       round(sum(wb) * 1000.0 / count(*), 6) AS dsir_milli_bits
FROM bk JOIN w USING (bkt)
GROUP BY doc_id
"""


REGISTRY["ext_dsir_weights"] = (q_dsir_weights, _sql_dsir_panel())


def q_dsir_selection(spark, sf_dir):
    """DSIR-style data selection, step 2: the 50 pool documents whose
    per-token mean importance toward the target domain is highest
    (deterministic top-k on the exact panel — the reproducible variant
    of the paper's Gumbel resampling, whose float noise has no
    cross-engine-exact form; ordering law milli-bits DESC, n_tokens
    DESC, doc_id ASC)."""
    from uofi_payroll_etl_main_demo_spark.ext.dsir import dsir_select

    return dsir_select(
        _t(spark, sf_dir, "documents"), F.col("lang") == "en", take=50
    )


REGISTRY["ext_dsir_selection"] = (
    q_dsir_selection,
    f"""
WITH panel AS ({_sql_dsir_panel()})
SELECT * FROM panel
ORDER BY dsir_milli_bits DESC, n_tokens DESC, doc_id
LIMIT 50
""",
)


REGISTRY["ext_cdc_chunk_dedup"] = (
    q_cdc_chunk_dedup,
    f"""WITH {_sql_cdc_chunk_table()}
SELECT chunk_hash, chunk_len,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_occ
FROM chunk_table
GROUP BY chunk_hash, chunk_len
HAVING count(DISTINCT doc_id) >= 2
""",
)


# Driver-window rotation: the driver checks the FIRST 50 registry
# entries each round; _WINDOW_50 reorders the registry so the stalest
# cohort plus this round's new/changed rows come first (max-staleness
# policy, VERDICT r7+). History: r4 covered the never-checked
# remainder; r8 cleared the <=r3 cohort; r9 cleared the r4 cohort;
# r10 clears the r5 cohort AND the never-checked tail.
_WINDOW_50 = [
    # Round-12 rotation (max-staleness policy, VERDICT r11 item 9):
    # this round's CHANGED value-oracled rows whose latest green record
    # predates the change (the simhash scale-in rewrite and the
    # incremental tag-carry — ext_simhash_pairs r8, ext_incremental_dedup
    # r8, ext_incremental_simhash r9), then the r7-latest cohort — the
    # stalest after r11 cleared the r6 one (49 rows; includes the other
    # two changed rows, ext_dedup_method_agreement and
    # ext_minhash_index_query). 3 + 47 = 50: two single-row-aggregate
    # r7 rows (rel_promo_revenue, rel_top_supplier) are DEFERRED to the
    # r13 window to fit — both are covered by this round's full
    # check_oracle.py HEAD sweeps (OPTIMIZATION_r12.md).
    # Post-r12 target: no green row older than r8 (+ the 2 deferrals).
    # -- changed this round, stalest first (3) --
    "ext_simhash_pairs",
    "ext_incremental_dedup",
    "ext_incremental_simhash",
    # -- r7-latest cohort (47 of 49) --
    "a9_approx_distinct",
    "f_cleanse_normalize",
    "f_try_cast",
    "f_regexp_extract",
    "ext_zscore",
    "samp_hash_sample",
    "scd2_history",
    "ext_language_id",
    "ext_exact_dedup",
    "ext_embedding_pairs_bucketed",
    "ext_ivf_index_query",
    "ext_ivf_filtered_query",
    "ext_pq_index_query",
    "ext_pq_filtered_query",
    "ext_dedup_method_agreement",
    "ext_winnow_fingerprints",
    "ext_winnow_containment",
    "pipeline_cpa_shape",
    "ext_decontaminate",
    "ext_repetition_stats",
    "ext_pii_redact",
    "ext_shard_assign",
    "rel_part_type_revenue",
    "rel_returned_item_report",
    "rel_forecast_revenue",
    "rel_priority_late_orders",
    "rel_min_price_supplier",
    "rel_important_parts",
    "rel_parts_supplier_count",
    "rel_small_qty_revenue",
    "rel_brand_size_discount",
    "rel_promo_part_suppliers",
    "rel_waiting_suppliers",
    "ext_minhash_index_query",
    "ext_mixture_take",
    "ext_quality_classifier",
    "ext_dataset_card",
    "ext_hard_negatives",
    "ext_dedup_best_of_cluster",
    "a14_quantiles",
    "ext_image_dhash_pairs",
    "ext_video_keyframes_avi",
    "ext_video_dhash_pairs",
    "ext_rewrite_quarantine_report",
    "pipeline_rewrite_curation",
    "ext_cdc_containment",
    "ext_cdc_containment_index",
]


assert len(_WINDOW_50) == 50, len(_WINDOW_50)
_missing = [n for n in _WINDOW_50 if n not in REGISTRY]
assert not _missing, f"window names absent from REGISTRY: {_missing}"
REGISTRY = {
    **{n: REGISTRY[n] for n in _WINDOW_50},
    **{n: v for n, v in REGISTRY.items() if n not in _WINDOW_50},
}


def queries() -> dict[str, QueryFn]:
    return {name: fn for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None
    }
