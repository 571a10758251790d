"""CPA certification pipeline (reference §3.3, lines 482-799).

union-by-name → date parse/bounds → fiscal-year filter → schema
contract → derive/validate → enrich → filter → dedup cascade →
normalize → split → rename/project.

The mid-pipeline assertions (freshness 508-512, schema contract
522-554, format check 564-581) are driver actions over tiny aggregates
between lazy segments — the only forced evaluations before the sink.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from uofi_payroll_etl_main_demo_spark.functions.cleanse import (
    clean_column_names,
    coalesce_fill,
    concat_key,
    dedupe_column_names,
    ensure_string,
    normalize_numeric_string,
    rename_columns,
    split_code_name,
    to_timestamp_coerce,
)
from uofi_payroll_etl_main_demo_spark.operators.aggregates import mode_by_group
from uofi_payroll_etl_main_demo_spark.operators.dedup import dedup_keep_first
from uofi_payroll_etl_main_demo_spark.operators.joins import safe_left_join
from uofi_payroll_etl_main_demo_spark.operators.setops import union_by_name
from uofi_payroll_etl_main_demo_spark.validate.contracts import (
    check_format,
    check_freshness,
    check_schema_contract,
)

# The 34-column input contract (reference 522-529).
CPA_EXPECTED_COLUMNS = [
    "UIN", "PAY_YEAR", "PAY_ID", "PAY_NBR", "PAY_SEQ", "TRAN_ID",
    "TRAN_COMPNT", "ADJ_REASON", "TRAN_CREATE_DT", "TRAN_CLOSED_DT",
    "JOB", "JOB_TITLE", "JOB_TS_COAS", "JOB_TS_ORGN", "JOB_ECLS",
    "COLLEGE", "OWNING_UIN", "LAST_NAME", "FIRST_NAME",
    "UI_ENTERPRISE_ID", "EMAIL_ADDR", "HRLY_RATE", "RT_LEAVE_DT",
    "RT_ENTER_DT", "RT_CREATE_DT", "LVL", "ROLE", "ACTION",
    "ROUTED_BY_UIN", "RETURNED_FLAG", "TRAN_ROUTE_DT",
    "ELAPSED_WORK_TIME", "ROUTE_STOP_TIME", "ELAPSED_TRAN_TIME",
]

# Final rename + 20-column output projection (reference 711-738).
CPA_RENAMES = {
    "UIN": "UIN",
    "TRAN_ID": "Transaction ID",
    "TRAN_CREATE_DT": "Created Date",
    "TRAN_CLOSED_DT": "Closed Date",
    "JOB_TITLE": "Job Title",
    "JOB_ECLS": "Job E-Class",
    "HRLY_RATE": "Hourly Rate",
    "LAST_NAME": "Last Name",
    "FIRST_NAME": "First Name",
    "EMAIL_ADDR": "Email",
    "ROLE": "Role",
    "ACTION": "Action",
}

CPA_OUTPUT_COLUMNS = [
    "UIN", "UIN Job", "Transaction ID", "Created Date", "Closed Date",
    "Job Title", "Job E-Class", "TS-Org Code", "TS-Org Title",
    "Dept TS-Org", "TS-Org Dept Title", "Time Entry Method",
    "Overtime FLSA", "College Code", "College Name", "Hourly Rate",
    "Last Name", "First Name", "Email", "Role",
]


def fiscal_window(fiscal_year_end: int) -> tuple[datetime, datetime]:
    """Jul 1 (year-1) → Jun 30 (year) (reference 499-503)."""
    return (
        datetime(fiscal_year_end - 1, 7, 1),
        datetime(fiscal_year_end, 6, 30, 23, 59, 59),
    )


def cpa_pipeline(
    cert_bw: DataFrame,
    cert_mn: DataFrame,
    ts_org: DataFrame,
    ts_dept: DataFrame,
    overtime: DataFrame,
    te_m: DataFrame,
    *,
    fiscal_year_end: int,
    order_by: list[Column | str] | None = None,
    strict: bool = True,
) -> DataFrame:
    """BW + MN certification extracts → enriched 20-column output.

    ``strict=True`` runs the reference's hard assertions (freshness
    raise 508-512, exact schema contract 530-554); format violations
    are counted but never fatal (reference warns and proceeds, 564-581).
    """
    # -- union by name (reference 487-491, U1) --
    df = union_by_name(clean_column_names(cert_bw), clean_column_names(cert_mn))

    # -- parse + bound dates (reference 494-518) --
    df = df.withColumn(
        "TRAN_CREATE_DT", to_timestamp_coerce("TRAN_CREATE_DT")
    ).withColumn("TRAN_CLOSED_DT", to_timestamp_coerce("TRAN_CLOSED_DT"))
    fy_start, fy_end = fiscal_window(fiscal_year_end)
    if strict:
        # hard failure if data predates one fiscal year before the window
        check_freshness(
            df, "TRAN_CREATE_DT", not_before=datetime(fiscal_year_end - 2, 7, 1)
        )
    df = df.filter(F.col("TRAN_CREATE_DT").between(F.lit(fy_start), F.lit(fy_end)))

    # -- schema contract (reference 522-554: name AND position) --
    if strict:
        check_schema_contract(df, CPA_EXPECTED_COLUMNS, strict_order=True)

    # -- derive + validate (reference 557-591) --
    df = df.withColumn("JOB_TS_COAS", ensure_string("JOB_TS_COAS")).withColumn(
        "JOB_TS_ORGN", ensure_string("JOB_TS_ORGN")
    )
    df = df.withColumn("TS-Org Code", concat_key("JOB_TS_COAS", "JOB_TS_ORGN"))
    df = df.withColumn("Dept TS-Org", F.substring("TS-Org Code", 1, 5))
    check_format(df, "TS-Org Code", r"^\d-\d{6}$")  # telemetry, non-fatal
    check_format(df, "Dept TS-Org", r"^\d-\d{3}$")
    df = df.withColumn(
        "UIN Job", concat_key(ensure_string("UIN"), ensure_string("JOB"))
    )

    # -- enrich (reference 598-663, J4-J7 + mode map) --
    df = safe_left_join(
        df, clean_column_names(ts_org), ["TS-Org Code"], payload=["TS-Org Title"]
    )
    df = safe_left_join(
        df,
        clean_column_names(ts_dept),
        {"Dept TS-Org": "TS-Org Dept Code"},
        payload=["TS-Org Dept Title"],
    )
    te_clean = clean_column_names(te_m)
    df = safe_left_join(
        df,
        te_clean,
        ["UIN Job"],
        payload=["Time Entry Method", "Time Entry Type"],
    )
    te_mode = mode_by_group(
        te_clean.na.drop(subset=["TE M", "Time Entry Method"]),
        "TE M",
        "Time Entry Method",
        "__te_mode",
    )
    if "TE M" in df.columns:
        df = safe_left_join(df, te_mode, ["TE M"], payload=["__te_mode"], dedup_dim=False)
        df = df.withColumn(
            "Time Entry Method", coalesce_fill("Time Entry Method", "__te_mode")
        ).drop("__te_mode")
    df = safe_left_join(
        df,
        clean_column_names(overtime),
        {"JOB_ECLS": "Job Eclass", "PAY_ID": "Pay ID"},
        payload=["Overtime FLSA"],
    )

    # -- filter + dedup cascade (reference 666-695) --
    df = df.filter(F.col("ACTION") == F.lit("3 - Apply"))
    df = df.dropDuplicates()  # full-row distinct (667)
    ob = order_by or [F.asc("TRAN_ID"), F.asc("UIN Job")]
    df = dedup_keep_first(df, ["UIN Job"], ob)  # keep-first (668)
    df = dedup_keep_first(df, ["TRAN_ID"], ob)  # keep-first (695)

    # -- normalize numeric-ish strings (reference 669-682, F15) --
    for c in ("UIN", "JOB", "PAY_NBR", "PAY_SEQ"):
        if c in df.columns:
            df = df.withColumn(c, normalize_numeric_string(c))

    # -- COLLEGE split (reference 698-706, F6) --
    code, name = split_code_name("COLLEGE")
    df = df.withColumn("College Code", code).withColumn("College Name", name)

    # -- rename + project + duplicate-column prune (reference 711-741) --
    df = rename_columns(df, CPA_RENAMES)
    df = dedupe_column_names(df)
    keep = [c for c in CPA_OUTPUT_COLUMNS if c in df.columns]
    return df.select(*keep)
