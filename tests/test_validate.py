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
