"""Extra query-surface checks that the oracle can't express."""

from __future__ import annotations

from pyspark.sql import functions as F

from uofi_payroll_etl_main_demo_spark import queries as R
from uofi_payroll_etl_main_demo_spark.io.readers import read_parquet_table


def test_approx_distinct_within_error_bound(spark, sf_dir):
    li = read_parquet_table(spark, sf_dir, "lineitem")
    exact = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .collect()
    }
    rows = {r["l_returnflag"]: r for r in R.q_approx_distinct(spark, sf_dir).collect()}
    assert set(rows) == set(exact)
    for k, n in exact.items():
        assert rows[k]["exact_parts"] == n
        assert rows[k]["approx_within_5pct"]  # rsd=0.02, generous bound


def test_rows_only_queries_execute(spark, sf_dir):
    qs, osql = R.queries(), R.oracle_sql()
    for name in set(qs) - set(osql):
        df = qs[name](spark, sf_dir)
        assert df.count() >= 0, name  # executes without error


def test_event_funnel_stage_ordering(spark):
    """Funnel stages are strictly ordered: click after the first view,
    purchase after that click — a purchase BEFORE the click must not
    count, and users without views are absent."""
    from uofi_payroll_etl_main_demo_spark.queries import q_event_funnel
    import pyspark.sql.functions as F

    rows = [
        # user 1: view -> click -> purchase (full funnel)
        (1, "2024-01-01 00:00:00", 1, "view", 1.0, None),
        (2, "2024-01-01 00:10:00", 1, "click", 1.0, None),
        (3, "2024-01-01 00:20:00", 1, "purchase", 1.0, None),
        # user 2: purchase BEFORE click -> purchased must be False
        (4, "2024-01-01 00:00:00", 2, "view", 1.0, None),
        (5, "2024-01-01 00:05:00", 2, "purchase", 1.0, None),
        (6, "2024-01-01 00:10:00", 2, "click", 1.0, None),
        # user 3: no view at all -> absent
        (7, "2024-01-01 00:00:00", 3, "click", 1.0, None),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    import tempfile, os
    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    out = {r["user_id"]: r for r in q_event_funnel(spark, d).collect()}
    assert set(out) == {1, 2}
    assert out[1]["clicked"] and out[1]["purchased"]
    assert out[1]["view_to_click_us"] == 600_000_000
    assert out[1]["click_to_purchase_us"] == 600_000_000
    assert out[2]["clicked"] and not out[2]["purchased"]


def test_triangle_count_known_graph(spark):
    """K4 minus one edge has exactly 2 triangles; corner counts match
    hand computation (shared-edge nodes sit in both triangles)."""
    from uofi_payroll_etl_main_demo_spark.queries import REGISTRY
    import pyspark.sql.functions as F

    # bypass the text pipeline: feed the oriented edge logic directly
    e = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4)], "a long, b long"
    )
    tri = (
        e.alias("e1")
        .join(e.select(F.col("a").alias("b"), F.col("b").alias("c")), "b")
        .join(
            e.select(F.col("a").alias("a2"), F.col("b").alias("c2")),
            (F.col("a") == F.col("a2")) & (F.col("c") == F.col("c2")),
        )
        .select("a", "b", "c")
    )
    rows = sorted(tuple(r) for r in tri.collect())
    assert rows == [(1, 2, 3), (1, 2, 4)]


def test_corpus_diff_semantics(spark, sf_dir):
    """The diff categories must partition both snapshots correctly:
    added+changed+unchanged = |new|, removed+changed+unchanged = |old|."""
    from uofi_payroll_etl_main_demo_spark import queries as R

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_old = docs.filter(F.col("doc_id") % 10 != 0).count()
    n_new = docs.filter(F.col("doc_id") % 7 != 0).count()
    got = {
        r["status"]: r["n_docs"]
        for r in R.q_corpus_diff(spark, sf_dir).collect()
    }
    assert got.get("added", 0) + got.get("changed", 0) + got.get(
        "unchanged", 0
    ) == n_new
    assert got.get("removed", 0) + got.get("changed", 0) + got.get(
        "unchanged", 0
    ) == n_old
    assert got.get("changed", 0) > 0  # the rev2 tweak fires


def test_session_window_native_matches_manual_sessionize(spark, sf_dir):
    """Spark's built-in session_window must agree with the engine's
    lag/cumsum sessionizer on session count and total events."""
    from uofi_payroll_etl_main_demo_spark import queries as R
    from uofi_payroll_etl_main_demo_spark.io.readers import (
        read_parquet_table,
    )
    from uofi_payroll_etl_main_demo_spark.streaming.events import sessionize

    native = R.q_session_window_native(spark, sf_dir)
    manual = sessionize(
        read_parquet_table(spark, sf_dir, "events"), gap="30 minutes"
    )
    assert native.count() == manual.count()
    n_native = native.agg(F.sum("n_events")).first()[0]
    n_manual = manual.agg(F.sum("n_events")).first()[0]
    assert n_native == n_manual


def test_chunk_dedup_identical_docs_survive_once(spark):
    """Two identical documents: every chunk of the second is a global
    duplicate — zero survivors on the higher doc_id."""
    from uofi_payroll_etl_main_demo_spark import queries as R  # noqa: F401
    from pyspark.sql import Window
    from uofi_payroll_etl_main_demo_spark.ext.textstats import (
        chunk_documents,
    )

    text = " ".join(f"w{i}" for i in range(70))
    docs = spark.createDataFrame([(1, text), (2, text)], ["doc_id", "text"])
    chunks = chunk_documents(docs, size=32, stride=32)
    w = Window.partitionBy("__h").orderBy("doc_id", "chunk_idx")
    ranked = chunks.select(
        "doc_id", "chunk_idx", F.md5("chunk_text").alias("__h")
    ).withColumn("__rn", F.row_number().over(w))
    surv = {
        r["doc_id"]: r["n"]
        for r in ranked.filter("__rn = 1")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert surv.get(1, 0) == 3 and 2 not in surv
