"""Temporal join operators (operators/temporal.py): as-of and band joins.

Edge cases a distributed as-of must get right: no prior match → null,
equal-timestamp inclusivity, deterministic tie-break among simultaneous
right rows, band boundary openness/closedness.
"""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from uofi_payroll_etl_main_demo_spark.operators.temporal import (
    asof_join,
    asof_join_sliced,
    range_join,
)


def _ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def quotes(spark):
    return spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), 100.0),
            (1, _ts("2024-01-01T10:05:00"), 101.0),
            (2, _ts("2024-01-01T09:00:00"), 50.0),
        ],
        "k bigint, ts timestamp, px double",
    )


@pytest.fixture(scope="module")
def trades(spark):
    return spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:03:00"), "t1"),  # after first quote
            (1, _ts("2024-01-01T10:05:00"), "t2"),  # ties second quote → inclusive
            (1, _ts("2024-01-01T09:59:00"), "t0"),  # before any quote → null
            (3, _ts("2024-01-01T12:00:00"), "t3"),  # key with no quotes → null
        ],
        "k bigint, ts timestamp, trade_id string",
    )


def test_asof_backward_inclusive(spark, quotes, trades):
    out = {
        r["trade_id"]: r["asof_px"]
        for r in asof_join(trades, quotes, on="k", payload=["px"]).collect()
    }
    assert out == {"t1": 100.0, "t2": 101.0, "t0": None, "t3": None}


def test_asof_preserves_left_rowcount_and_columns(spark, quotes, trades):
    out = asof_join(trades, quotes, on="k", payload=["px"])
    assert out.count() == trades.count()
    assert out.columns == [*trades.columns, "asof_ts", "asof_px"]


def test_asof_simultaneous_right_rows_tiebreak_deterministic(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T00:00:10"))], "k bigint, ts timestamp"
    )
    # two right rows at the SAME key+ts: max payload struct must win
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T00:00:05"), 1.0),
            (1, _ts("2024-01-01T00:00:05"), 9.0),
        ],
        "k bigint, ts timestamp, v double",
    )
    rows = asof_join(left, right, on="k", payload=["v"]).collect()
    assert [r["asof_v"] for r in rows] == [9.0]


def test_range_join_band_boundaries(spark):
    # band is (left_ts - 1h, left_ts]: exactly-1h-ago is OUT, instant is IN
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T12:00:00"), "L")], "k bigint, ts timestamp, tag string"
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T11:00:00"), "exactly_1h"),  # excluded (open)
            (1, _ts("2024-01-01T11:00:01"), "in_band"),
            (1, _ts("2024-01-01T12:00:00"), "same_instant"),  # included (closed)
            (1, _ts("2024-01-01T12:00:01"), "future"),  # excluded
            (2, _ts("2024-01-01T11:30:00"), "other_key"),  # excluded
        ],
        "k bigint, ts timestamp, name string",
    )
    got = sorted(
        r["r_name"]
        for r in range_join(
            left, right, on="k", right_payload=["name"]
        ).collect()
    )
    assert got == ["in_band", "same_instant"]


def test_range_join_no_duplicate_pairs_across_buckets(spark):
    # right rows spread across both buckets a left row probes; every
    # matched pair must appear exactly once
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T00:59:00"))], "k bigint, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T00:%02d:00" % m), m) for m in range(0, 60, 7)],
        "k bigint, ts timestamp, m int",
    )
    out = range_join(left, right, on="k", right_payload=["m"])
    ms = [r["r_m"] for r in out.collect()]
    assert sorted(ms) == sorted(set(ms))  # no dupes
    assert set(ms) == {m for m in range(0, 60, 7) if m <= 59}  # all in band


def test_asof_matches_pandas_merge_asof(spark):
    """Randomized differential vs pandas.merge_asof (an independent
    reference implementation of backward-inclusive as-of semantics)."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(42)
    n_l, n_r = 400, 300
    left_pd = pd.DataFrame(
        {
            "k": rng.integers(0, 8, n_l),
            "ts": pd.to_datetime(
                rng.integers(0, 10**6, n_l) * 10**6, utc=False
            ),
            "lid": np.arange(n_l),
        }
    )
    right_pd = pd.DataFrame(
        {
            "k": rng.integers(0, 8, n_r),
            "ts": pd.to_datetime(
                rng.integers(0, 10**6, n_r) * 10**6, utc=False
            ),
            "v": np.round(rng.random(n_r), 6),
        }
    )
    # merge_asof requires unique right (k, ts) for a deterministic pick;
    # mirror asof_join's tie rule (max payload) by pre-aggregating
    right_pd = right_pd.groupby(["k", "ts"], as_index=False)["v"].max()
    want = pd.merge_asof(
        left_pd.sort_values("ts"),
        right_pd.sort_values("ts"),
        on="ts",
        by="k",
        direction="backward",
        allow_exact_matches=True,
    ).set_index("lid")["v"]

    left = spark.createDataFrame(left_pd)
    right = spark.createDataFrame(right_pd)
    got = {
        r["lid"]: r["asof_v"]
        for r in asof_join(left, right, on="k", payload=["v"]).collect()
    }
    assert len(got) == n_l
    for lid, w in want.items():
        g = got[lid]
        if pd.isna(w):
            assert g is None
        else:
            assert g is not None and abs(g - w) < 1e-12


def test_sliced_asof_equals_plain(spark, sf_dir, quotes, trades):
    """The skew-resilient two-phase variant must be semantics-identical
    to the plain union+window form — on the fixtures (cross-slice
    carries, no-match keys) AND on real event data with slices small
    enough that most matches cross slice boundaries."""
    from uofi_payroll_etl_main_demo_spark.io.readers import read_parquet_table

    for slice_s in (60.0, 3600.0):
        a = asof_join(trades, quotes, on="k", payload=["px"])
        b = asof_join_sliced(
            trades, quotes, on="k", payload=["px"], slice_seconds=slice_s
        )
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    ev = read_parquet_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click")
    plain = asof_join(errors, clicks, on="user_id", payload=["value"])
    sliced = asof_join_sliced(
        errors, clicks, on="user_id", payload=["value"], slice_seconds=600.0
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, sliced.collect())
    )


def test_asof_single_shuffle_plan(spark, quotes, trades):
    """The as-of plan must contain exactly one exchange below the window
    (union + one hash partition by key) — no join operator at all."""
    plan = (
        asof_join(trades, quotes, on="k", payload=["px"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan
