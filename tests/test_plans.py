"""Physical-plan regression tests — the 100 TB posture as assertions.

These pin the *plan shapes* the engine depends on at scale: dimensions
broadcast (never sort-merge), filters reach the parquet scan, scans
read only referenced columns, narrow maps shuffle nothing. A change
that silently degrades one of these passes value-equality tests but
fails here.
"""

from __future__ import annotations

import pytest

from uofi_payroll_etl_main_demo_spark import queries as R
from uofi_payroll_etl_main_demo_spark.plans import inspect_plan


def test_pipeline_broadcasts_all_dims(spark, sf_dir):
    r = inspect_plan(R.q_pipeline_payroll_shape(spark, sf_dir))
    assert r.broadcast_joins >= 2  # part + supplier
    assert r.sort_merge_joins == 0  # fact side never shuffles for enrichment


def test_pipeline_pushdown_and_pruning(spark, sf_dir):
    r = inspect_plan(R.q_pipeline_payroll_shape(spark, sf_dir))
    scan = r.scan_for("lineitem")
    assert scan is not None
    assert "l_shipdate" in scan["pushed"]  # date range reached the scan
    # pruned: the 11-column table is read as only the 5 referenced cols
    assert scan["read_schema"].count(":") == 5
    part_scan = r.scan_for("part.parquet")
    assert part_scan and part_scan["read_schema"].count(":") == 2


def test_projection_is_narrow(spark, sf_dir):
    r = inspect_plan(R.q_projection(spark, sf_dir))
    assert r.exchanges == 0  # pure projection: no shuffle at any scale
    scan = r.scan_for("lineitem")
    assert scan["read_schema"].count(":") == 3


def test_enrichment_joins_broadcast(spark, sf_dir):
    r = inspect_plan(R.q_broadcast_left_join(spark, sf_dir))
    assert r.broadcast_joins >= 2  # nation + region
    assert r.sort_merge_joins == 0


def test_pricing_pushdown(spark, sf_dir):
    r = inspect_plan(R.q_pricing_summary(spark, sf_dir))
    scan = r.scan_for("lineitem")
    assert "l_shipdate" in scan["pushed"]
    assert r.sort_merge_joins == 0


def test_doc_stats_no_shuffle(spark, sf_dir):
    # per-document stats are a narrow map: zero shuffles
    r = inspect_plan(R.q_doc_stats(spark, sf_dir))
    assert r.exchanges == 0


def test_range_join_is_equi_join_not_theta(spark, sf_dir):
    """The band join must compile to a hash-partitionable EQUI-join on
    (key, bucket) — a nested-loop theta join would be O(n·m) at scale."""
    r = inspect_plan(R.q_range_join(spark, sf_dir))
    assert r.nested_loop_joins == 0


def test_exact_pairs_is_broadcast_nested_loop(spark, sf_dir):
    r = inspect_plan(R.q_embedding_pairs_exact(spark, sf_dir))
    assert r.nested_loop_joins >= 1  # right side broadcast, corpus stays put
    assert r.sort_merge_joins == 0
