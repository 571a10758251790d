"""Validation library — ports of the reference's inline assertions (§5.1)."""

from __future__ import annotations

from datetime import datetime

import pytest

from uofi_payroll_etl_main_demo_spark.validate import (
    ContractViolation,
    FreshnessError,
    check_format,
    check_freshness,
    check_schema_contract,
)


@pytest.fixture()
def df(spark):
    return spark.createDataFrame(
        [("1-123456", datetime(2024, 1, 1)), ("bad", datetime(2024, 6, 1))],
        "code string, ts timestamp",
    )


def test_schema_contract_ok(df):
    report = check_schema_contract(df, ["code", "ts"])
    assert report.ok


def test_schema_contract_missing_extra(df):
    with pytest.raises(ContractViolation) as ei:
        check_schema_contract(df, ["code", "nope"])
    assert "nope" in str(ei.value)
    report = check_schema_contract(df, ["code", "nope"], raise_on_fail=False)
    assert report.missing == ["nope"] and report.extra == ["ts"]


def test_schema_contract_order(df):
    report = check_schema_contract(
        df, ["ts", "code"], raise_on_fail=False
    )
    assert not report.ok and report.misplaced


def test_freshness(df):
    assert check_freshness(df, "ts", not_before=datetime(2023, 12, 31))
    with pytest.raises(FreshnessError):
        check_freshness(df, "ts", not_before=datetime(2024, 3, 1))


def test_check_format(df):
    count, sample = check_format(df, "code", r"^\d-\d{6}$")
    assert count == 1
    assert sample[0]["code"] == "bad"


def test_remote_store_conf_shape():
    from uofi_payroll_etl_main_demo_spark.session import remote_store_conf

    c = remote_store_conf()
    assert all(k.startswith("spark.") for k in c)
    assert "spark.hadoop.fs.s3a.committer.name" in c
    # no credential material anywhere in the template, and no provider
    # class pinned (Hadoop's default chain works on SDK v1 AND v2)
    assert not any(
        tok in v.lower() for v in c.values() for tok in ("key=", "secret")
    )
    assert not any("credentials.provider" in k for k in c)
    # every fs.* knob follows the requested scheme
    gcs = remote_store_conf(bucket_scheme="gs")
    fs_keys = [k for k in gcs if ".fs." in k]
    assert fs_keys and all(".fs.gs." in k for k in fs_keys)
    c2 = remote_store_conf(endpoint="http://localhost:9000",
                           path_style_access=True)
    assert c2["spark.hadoop.fs.s3a.endpoint"] == "http://localhost:9000"
    assert c2["spark.hadoop.fs.s3a.path.style.access"] == "true"


def test_data_constraints_exact_counts(spark):
    """Every rule kind against constructed data with KNOWN violation
    counts: null, out-of-range (NULL counts as a range violation),
    regex, duplicate-key surplus, dangling FK (NULL FK is NOT a
    violation), plus the satisfies escape hatch and the guards."""
    from uofi_payroll_etl_main_demo_spark.validate import (
        check_data_constraints,
        foreign_key,
        in_range,
        matches,
        not_null,
        satisfies,
        unique,
    )
    from pyspark.sql import functions as F

    rows = [
        # id, k,    v,    code
        (1, "a", 10.0, "AB"),
        (2, "a", 10.0, "AB"),      # duplicate (k, v)
        (3, None, -5.0, "xy"),     # null k, v out of range, bad code
        (4, "b", None, "CD"),      # null v -> range violation
        (5, "zz", 99.0, "EF"),     # v out of range, dangling FK
    ]
    df = spark.createDataFrame(rows, "id long, k string, v double, code string")
    dim = spark.createDataFrame([("a",), ("b",), (None,)], "dk string")
    rep = {
        r["rule"]: (r["n_rows"], r["n_violations"], r["passed"])
        for r in check_data_constraints(
            df,
            [
                not_null("k"),
                in_range("v", 0.0, 50.0),
                matches("code", "^[A-Z]{2}$"),
                unique("k", "v"),
                foreign_key("k", dim, "dk"),
                satisfies("id_even", F.col("id") % 2 == 0),
            ],
        ).collect()
    }
    assert rep["not_null(k)"] == (5, 1, False)
    assert rep["in_range(v, 0.0, 50.0)"] == (5, 3, False)  # -5, None, 99
    assert rep["matches(code, ^[A-Z]{2}$)"] == (5, 1, False)
    assert rep["unique(k, v)"] == (5, 1, False)  # one surplus row
    assert rep["foreign_key(k -> dk)"] == (5, 1, False)  # only 'zz'
    assert rep["id_even"] == (5, 3, False)

    # all-green report
    ok = check_data_constraints(df, [not_null("id"), unique("id")]).collect()
    assert all(r["passed"] and r["n_violations"] == 0 for r in ok)

    import pytest as _pytest

    with _pytest.raises(ValueError):
        check_data_constraints(df, [])
    with _pytest.raises(ValueError):
        check_data_constraints(df, [not_null("k"), not_null("k")])


def test_data_constraints_fk_only_and_anchored_matches(spark):
    """Review regressions: (a) an fk-ONLY rule list returns a one-row
    report instead of crashing on an empty struct explode; (b)
    matches() is FULL-match — a substring hit is still a violation."""
    from uofi_payroll_etl_main_demo_spark.validate import (
        check_data_constraints,
        foreign_key,
        matches,
    )

    df = spark.createDataFrame(
        [(1, "a", "AB"), (2, "zz", "xxAByy")], "id long, k string, code string"
    )
    dim = spark.createDataFrame([("a",)], "dk string")
    rep = check_data_constraints(df, [foreign_key("k", dim, "dk")]).collect()
    assert len(rep) == 1
    assert (rep[0]["rule"], rep[0]["n_rows"], rep[0]["n_violations"]) == (
        "foreign_key(k -> dk)", 2, 1,
    )
    rep2 = {
        r["rule"]: r["n_violations"]
        for r in check_data_constraints(
            df, [matches("code", "[A-Z]{2}")]
        ).collect()
    }
    # 'AB' fully matches; 'xxAByy' only CONTAINS a match -> violation
    assert rep2["matches(code, [A-Z]{2})"] == 1


def test_data_constraints_fk_fold_one_job_and_big_dim_parity(spark):
    """(a) With every fk dim broadcast-sized, the WHOLE gate is ONE
    job whose plan carries only broadcast hash probes (no sort-merge
    join, no second scan of the fact table); (b) forcing the big-dim
    path (fk_broadcast_bytes=0) returns the identical report — one
    law, two physical strategies."""
    from uofi_payroll_etl_main_demo_spark.validate import (
        check_data_constraints,
        foreign_key,
        in_range,
        not_null,
        unique,
    )

    fact = spark.range(1000).selectExpr(
        "id", "id % 97 AS fk1", "id % 31 AS fk2", "id % 50 AS v"
    )
    dim1 = spark.range(90).selectExpr("id AS d1")  # 90..96 dangle
    dim2 = spark.range(31).selectExpr("id AS d2")  # none dangle
    rules = [
        not_null("id"),
        in_range("v", 0, 49),
        unique("id"),
        foreign_key("fk1", dim1, "d1"),
        foreign_key("fk2", dim2, "d2"),
    ]

    folded = check_data_constraints(fact, rules).orderBy("rule")
    plan = folded._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan
    # the FACT side is scanned exactly once (the probes feed the one
    # shared aggregate); the anti-join path re-scans it per fk rule
    assert plan.count("Range (0, 1000") == 1
    tracker = spark.sparkContext.statusTracker()

    def njobs(tag, df):
        spark.sparkContext.setJobGroup(tag, tag)
        try:
            return df.collect(), len(tracker.getJobIdsForGroup(tag))
        finally:
            spark.sparkContext.setJobGroup(None, None)

    got, jobs_folded = njobs("fkfold", folded)
    anti = check_data_constraints(
        fact, rules, fk_broadcast_bytes=0
    ).orderBy("rule")
    assert anti._jdf.queryExecution().executedPlan().toString().count(
        "Range (0, 1000"
    ) > 1
    want, jobs_anti = njobs("fkanti", anti)
    # fewer scheduler round-trips than the anti-join form (broadcast
    # builds are their own jobs, so ==1 is not the right pin)
    assert jobs_folded < jobs_anti
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    rep = {r["rule"]: r["n_violations"] for r in got}
    # ids with id % 97 in 90..96: 90..96 + 187..193 ... per 97-block
    dangling = sum(1 for i in range(1000) if i % 97 >= 90)
    assert rep["foreign_key(fk1 -> d1)"] == dangling
    assert rep["foreign_key(fk2 -> d2)"] == 0
