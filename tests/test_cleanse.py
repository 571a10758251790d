"""Cleanse builders: reference-parity semantics (SURVEY.md §2.9, §4.3).

Covers the three semantics gaps the engine must encode: null-propagating
concat, decimal-string stripping, tri-state missing.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from uofi_payroll_etl_main_demo_spark.functions.cleanse import (
    clean_column_names,
    coalesce_fill,
    concat_key,
    dedupe_column_names,
    ensure_string,
    fiscal_year,
    is_missing,
    normalize_numeric_string,
    rename_columns,
    select_contract,
    split_code_name,
    strip_decimal_str,
    to_timestamp_coerce,
)


def one_col(spark, values, dtype="string"):
    return spark.createDataFrame([(v,) for v in values], f"v {dtype}")


def evl(spark, values, expr, dtype="string"):
    return [r["out"] for r in one_col(spark, values, dtype).select(expr.alias("out")).collect()]


def test_strip_decimal_str(spark):
    got = evl(spark, ["1234.0", " 77.0 ", "12.5", "abc", None], strip_decimal_str("v"))
    assert got == ["1234", "77", "12.5", "abc", None]


def test_normalize_numeric_string(spark):
    got = evl(
        spark,
        [" 123.00 ", "123.0", "123", "12.5", " x ", "", None],
        normalize_numeric_string("v"),
    )
    assert got == ["123", "123", "123", "12.5", "x", "", None]


def test_normalize_numeric_string_int_float_edge_parity(spark):
    """The reference gate is isdigit-after-one-dot-removal +
    float-is-integer, canonicalized via int(float(x)) — leading zeros
    strip, trailing dots drop, all-zero values collapse to '0'
    (etl_payroll_pipeline_demo.py:673-682; ADVICE r7 edge cases)."""
    got = evl(
        spark,
        ["00123.0", "123.", "0123", "000", ".0", "1.2.3", "-123.0", "123.50"],
        normalize_numeric_string("v"),
    )
    # python oracle for the gated inputs: int(float(x)) stringified
    assert got == ["123", "123", "123", "0", "0", "1.2.3", "-123.0", "123.50"]


def test_ensure_string_trims_and_keeps_null(spark):
    got = evl(spark, ["  a  ", None], ensure_string("v"))
    assert got == ["a", None]


def test_is_missing_tristate(spark):
    got = evl(spark, [None, "", "  ", "nan", " NaN ", "x", "NAN"], is_missing("v"))
    assert got == [True, True, True, True, True, False, False]


def test_concat_key_propagates_null(spark):
    df = spark.createDataFrame([("a", "b"), ("a", None)], "x string, y string")
    got = [r["k"] for r in df.select(concat_key("x", "y").alias("k")).collect()]
    # pandas `a + '-' + b` parity: any null operand -> null result
    # (concat_ws would have produced "a" for the second row).
    assert got == ["a-b", None]


def test_coalesce_fill_treats_blank_as_missing(spark):
    df = spark.createDataFrame(
        [("", "fb"), ("nan", "fb"), ("x", "fb"), (None, None)],
        "a string, b string",
    )
    got = [r["c"] for r in df.select(coalesce_fill("a", "b").alias("c")).collect()]
    assert got == ["fb", "fb", "x", None]


def test_split_code_name(spark):
    code, name = split_code_name("v")
    df = one_col(spark, ["1-Engineering", "9-A-B", "NoHyphen"])
    got = df.select(code.alias("c"), name.alias("n")).collect()
    assert [(r["c"], r["n"]) for r in got] == [
        ("1", "Engineering"),
        ("9", "A-B"),  # max 1 split: remainder keeps inner hyphens
        ("NoHyphen", None),
    ]


def test_to_timestamp_coerce_null_on_garbage(spark):
    got = evl(spark, ["2024-01-02 03:04:05", "garbage", None], to_timestamp_coerce("v"))
    assert got[0] is not None and got[1] is None and got[2] is None


def test_fiscal_year_boundaries(spark):
    df = one_col(
        spark, ["2023-06-30 23:59:59", "2023-07-01 00:00:00"], dtype="string"
    ).select(F.col("v").cast("timestamp").alias("v"))
    got = [r["fy"] for r in df.select(fiscal_year("v").alias("fy")).collect()]
    assert got == [2023, 2024]  # Jul 1 starts the next fiscal year


def test_clean_column_names(spark):
    df = spark.createDataFrame([(1, 2)], [" a ", "b  "])
    assert clean_column_names(df).columns == ["a", "b"]


def test_rename_columns_tolerates_absent(spark):
    df = spark.createDataFrame([(1, 2)], ["a", "b"])
    out = rename_columns(df, {"a": "x", "zz": "never"})
    assert out.columns == ["x", "b"]


def test_select_contract_nullfills_missing(spark):
    df = spark.createDataFrame([(1, "n")], ["id", "name"])
    out = select_contract(df, [("ID", "id"), ("Name", "name"), ("Extra", None)])
    row = out.collect()[0]
    assert out.columns == ["ID", "Name", "Extra"]
    assert row["Extra"] is None


def test_dedupe_column_names(spark):
    df = spark.createDataFrame([(1, 2, 3)], ["a", "b", "a2"])
    df = df.toDF("a", "b", "a")  # duplicate name
    out = dedupe_column_names(df)
    assert out.columns == ["a", "b"]
    assert out.collect()[0]["a"] == 1  # first occurrence kept


# ---------------------------- property tests ----------------------------

_digit_strings = st.from_regex(r"\d{1,8}", fullmatch=True)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(_digit_strings, min_size=1, max_size=8))
def test_strip_decimal_idempotent(spark, codes):
    values = [c + ".0" for c in codes] + codes
    once = evl(spark, values, strip_decimal_str("v"))
    twice = evl(spark, once, strip_decimal_str("v"))
    assert once == twice  # idempotence
    assert once[: len(codes)] == codes  # ".0" suffix stripped exactly


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.one_of(st.none(), st.text(alphabet=" abn", max_size=4)),
        min_size=1,
        max_size=8,
    )
)
def test_concat_key_null_iff_operand_null(spark, xs):
    df = spark.createDataFrame([(x, "k") for x in xs], "x string, y string")
    got = [r["o"] for r in df.select(concat_key("x", "y").alias("o")).collect()]
    for x, o in zip(xs, got):
        assert (o is None) == (x is None)
        if x is not None:
            assert o == f"{x}-k"


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.one_of(
            st.none(),
            st.sampled_from(["", " ", "nan", "NaN", " nan "]),
            st.text(alphabet="abc", min_size=1, max_size=4),
        ),
        min_size=1,
        max_size=10,
    )
)
def test_is_missing_matches_pandas_semantics(spark, xs):
    got = evl(spark, xs, is_missing("v"))
    expect = [
        x is None or str(x).strip() in ("", "nan", "NaN") for x in xs
    ]
    assert got == expect
