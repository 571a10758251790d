"""Sequence packing + shard assignment (ext/packing.py)."""

import pyspark.sql.functions as F
import pytest

from uofi_payroll_etl_main_demo_spark.ext.packing import (
    pack_greedy,
    shard_assignment,
)


@pytest.fixture(scope="module")
def docs_table(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def sized(spark):
    rows = [
        ("a", 1, 100),
        ("a", 2, 200),
        ("a", 3, 300),  # 100+200 fit in 512; +300 overflows -> bin 1
        ("a", 4, 600),  # oversize: own bin 2
        ("a", 5, 10),   # next bin 3 (600 already > cap)
        ("b", 1, 512),  # exact fit: bin 0
        ("b", 2, 1),    # bin 1
    ]
    return spark.createDataFrame(
        rows, "source string, doc_id bigint, n_tokens bigint"
    )


def test_pack_greedy_first_fit(sized):
    out = {
        (r["source"], r["doc_id"]): (r["seq_id"], r["offset"])
        for r in pack_greedy(sized, capacity=512).collect()
    }
    assert out[("a", 1)] == (0, 0)
    assert out[("a", 2)] == (0, 100)
    assert out[("a", 3)] == (1, 0)
    assert out[("a", 4)] == (2, 0)  # oversize row gets its own bin
    assert out[("a", 5)] == (3, 0)
    assert out[("b", 1)] == (0, 0)  # exact fit stays in its bin
    assert out[("b", 2)] == (1, 0)


def test_pack_greedy_invariants_on_documents(spark, docs_table):
    from uofi_payroll_etl_main_demo_spark.functions.text import token_count

    d = docs_table.select(
        "source", "doc_id", token_count("text").alias("n_tokens")
    )
    packed = pack_greedy(d, capacity=256)
    assert packed.count() == d.count()  # every row placed exactly once
    fills = (
        packed.groupBy("source", "seq_id")
        .agg(F.sum("n_tokens").alias("fill"), F.count("*").alias("n"))
        .collect()
    )
    # a bin only exceeds capacity when it holds a single oversize row
    assert all(r["fill"] <= 256 or r["n"] == 1 for r in fills)
    # partitioning-independence: same assignment after a repartition
    a = sorted(map(tuple, packed.collect()))
    b = sorted(map(tuple, pack_greedy(d.repartition(7), 256).collect()))
    assert a == b


def test_shard_assignment_dense_and_deterministic(spark, docs_table):
    out = shard_assignment(docs_table, n_shards=8)
    rows = out.collect()
    assert len(rows) == docs_table.count()
    assert {r["shard"] for r in rows} <= set(range(8))
    # positions are dense 0..n-1 within each shard
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["shard_pos"])
    for poss in by_shard.values():
        assert sorted(poss) == list(range(len(poss)))
    again = sorted(map(tuple, shard_assignment(docs_table, n_shards=8).collect()))
    assert again == sorted(map(tuple, rows))
