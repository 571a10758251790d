"""Connected components / dedup clusters (ext/clusters.py)."""

import pytest
from pyspark.sql import functions as F

from uofi_payroll_etl_main_demo_spark.ext.clusters import (
    connected_components,
    dedup_survivors,
)


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "id_a bigint, id_b bigint")


def test_chain_collapses_to_min_id(spark):
    # a 6-node path: diameter forces multiple propagation sweeps
    pairs = _pairs(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)])
    got = {
        r["id"]: r["comp"] for r in connected_components(pairs).collect()
    }
    assert got == {i: 1 for i in range(1, 7)}


def test_separate_components_stay_separate(spark):
    pairs = _pairs(spark, [(1, 2), (2, 3), (10, 11), (20, 21), (21, 20)])
    comp = {
        r["id"]: r["comp"] for r in connected_components(pairs).collect()
    }
    assert comp[1] == comp[2] == comp[3] == 1
    assert comp[10] == comp[11] == 10
    assert comp[20] == comp[21] == 20


def test_long_chain_converges_logarithmically(spark):
    """Pointer jumping must resolve a 250-node path well inside the
    default sweep budget (plain propagation would need 250 sweeps)."""
    pairs = _pairs(spark, [(i, i + 1) for i in range(1, 250)])
    comp = {r["id"]: r["comp"] for r in connected_components(pairs).collect()}
    assert set(comp.values()) == {1} and len(comp) == 250


def test_max_iter_guard(spark):
    pairs = _pairs(spark, [(i, i + 1) for i in range(1, 12)])
    with pytest.raises(RuntimeError, match="no convergence"):
        connected_components(pairs, max_iter=1)


def test_dedup_survivors_keeps_min_and_untouched(spark):
    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in range(1, 8)], "doc_id bigint, text string"
    )
    pairs = _pairs(spark, [(2, 3), (3, 4), (6, 7)])
    kept = sorted(
        r["doc_id"] for r in dedup_survivors(docs, pairs).collect()
    )
    # cluster {2,3,4} → keep 2; cluster {6,7} → keep 6; 1 and 5 untouched
    assert kept == [1, 2, 5, 6]
