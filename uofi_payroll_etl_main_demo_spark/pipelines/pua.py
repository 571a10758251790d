"""PUA payroll-adjustment pipeline (reference §3.2, lines 206-479).

Stage order mirrors the reference exactly — cleanse/derive → enrich
(three broadcast left joins + mode lookup) → project → dedup →
default-fill → output contract — but every stage is a lazy Column
expression, so the whole pipeline is ONE Catalyst plan: the dimension
joins broadcast, projections collapse, and nothing materializes until
the sink.

Determinism: the reference's ``drop_duplicates(keep='first')`` meant
"first in file order" (line 343). A distributed engine has no input
order, so the pipeline takes an explicit ``order_by`` for the dedup
stage (SURVEY.md §7.3 hard part 1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from uofi_payroll_etl_main_demo_spark.functions.cleanse import (
    clean_column_names,
    coalesce_fill,
    concat_key,
    ensure_string,
    is_missing,
    rename_columns,
    select_contract,
    strip_decimal_str,
    to_timestamp_coerce,
)
from uofi_payroll_etl_main_demo_spark.operators.aggregates import mode_by_group
from uofi_payroll_etl_main_demo_spark.operators.dedup import dedup_keep_first
from uofi_payroll_etl_main_demo_spark.operators.joins import safe_left_join

# Header-variant tolerance (reference lines 281-286).
VARIANT_RENAMES = {
    "ADj Reason Code": "ADJ Reason Code",
    "Adj Reason Code": "ADJ Reason Code",
    "Adj Reason": "ADJ Reason DESC",
}

# Output contract: (output_name, source_name); an absent source → all-
# null column (reference 393-398). This is the reference's FULL
# 26-column PreTAM ``col_map`` OrderedDict (etl_payroll_pipeline_demo.py
# 362-389) with the post-build header renames already applied
# ("TS Org" → "TS ORG", "Adjustment Reason" → "Adjustment Reason
# Description"; ref 417-425) — the exact headers the reference writes.
PUA_COL_MAP = [
    ("UIN", "UIN"),
    ("Pay ID", "Pay ID"),
    ("Year", "Year"),
    ("Pay #", "Pay #"),
    ("Seq #", "Seq #"),
    ("Job Number", "Job Number"),
    ("College Code", "College Code"),
    ("College Name", "College Name"),
    ("College", "College"),
    ("TS COA", "TS COA"),
    ("TS ORG", "TS ORG"),
    ("TS-Org Code", "TS-Org Code"),
    ("TS-Org Title", "TS-Org Title"),
    ("Dept Code", "DEPT Code"),
    ("TS-Org Dept Code", "TS-Org Dept Code"),
    ("TS-Org Dept Title", "TS-Org Dept Title"),
    ("E-Class Code", "ECLS"),
    ("E-Class", "ECLS DESC"),
    ("TE M", "TE M"),
    ("Time Entry", "Time Entry"),
    ("Overtime", "Overtime"),
    ("Earn Code", "Earn Code"),
    ("Earn Code Description", "DESCRIPTION"),
    ("Adjustment Reason Code", "ADJ Reason Code"),
    ("Adjustment Reason Description", "ADJ Reason DESC"),
    ("Calc Date", "Calc Date"),
]

_CODE_COLS = ["POSN", "SUFF", "DEPT Code"]
_TRIM_COLS = [
    "UIN", "Year", "Pay ID", "Pay #", "Seq #", "TS COA", "TS ORG",
    "ECLS", "ECLS DESC", "TE M", "College Code", "College Name",
    "Earn Code", "DESCRIPTION",
]


def pua_pipeline(
    pua: DataFrame,
    ts_org: DataFrame,
    ts_dept: DataFrame,
    overtime: DataFrame,
    te_m: DataFrame,
    *,
    order_by: list[Column | str] | None = None,
) -> DataFrame:
    """PUA fact table → enriched, deduplicated, contract-shaped output.

    Inputs are the raw frames the reference loads at lines 94/123-149;
    ``order_by`` defines the keep-first dedup order (defaults to the
    business-key columns themselves — stable, if arbitrary, survivors).
    """
    df = clean_column_names(pua)
    df = rename_columns(df, VARIANT_RENAMES)

    # -- cleanse / derive (reference 252-286) --
    for c in _TRIM_COLS:
        if c in df.columns:
            df = df.withColumn(c, ensure_string(c))
    for c in _CODE_COLS:
        if c in df.columns:
            df = df.withColumn(c, strip_decimal_str(c))
    df = (
        df.withColumn("TS-Org Code", concat_key("TS COA", "TS ORG"))
        .withColumn("TS-Org Department Code", concat_key("TS COA", "DEPT Code"))
        .withColumn(
            "Pay Event",
            F.concat(F.col("Year"), F.col("Pay ID"), F.col("Pay #"), F.col("Seq #")),
        )
        .withColumn("Job Number", concat_key("POSN", "SUFF"))
        .withColumn("College", concat_key("College Code", "College Name"))
    )

    # -- enrich: broadcast left joins (reference 288-308, J1-J3) --
    df = safe_left_join(
        df, clean_column_names(ts_org), ["TS-Org Code"], payload=["TS-Org Title"]
    )
    # Dept join: pandas left_on/right_on KEEPS the right key column
    # ("TS-Org Dept Code" — value where matched, null where not), and
    # the reference's col_map emits it (column 15); carry it as a
    # payload copy since safe_left_join drops the dim-side key.
    dept_dim = clean_column_names(ts_dept).withColumn(
        "__dept_key", F.col("TS-Org Dept Code")
    )
    df = safe_left_join(
        df,
        dept_dim,
        {"TS-Org Department Code": "TS-Org Dept Code"},
        payload=["TS-Org Dept Title", "__dept_key"],
    ).withColumnRenamed("__dept_key", "TS-Org Dept Code")
    df = df.withColumn(
        # dept title falls back to the fact's own Department Name,
        # IN PLACE under the reference's column name (ref 301-302)
        "TS-Org Dept Title",
        coalesce_fill("TS-Org Dept Title", "Department Name"),
    )
    df = safe_left_join(
        df,
        clean_column_names(overtime),
        {"ECLS": "Job Eclass"},
        payload=["Overtime FLSA"],
    ).withColumnRenamed("Overtime FLSA", "Overtime")

    # -- mode lookup join (reference 313-325, A1/J10): the mapped mode
    # fills "Time Entry" — the existing Time Entry value wins where
    # non-blank, else the TE M → mode map; an unmapped TE M stays null
    # (pandas .map gives NaN — no fallback to the code itself) --
    te_clean = clean_column_names(te_m).na.drop(
        subset=["TE M", "Time Entry Method"]
    )
    te_mode = mode_by_group(te_clean, "TE M", "Time Entry Method", "__te_mode")
    df = safe_left_join(df, te_mode, ["TE M"], payload=["__te_mode"], dedup_dim=False)
    if "Time Entry" in df.columns:
        df = df.withColumn(
            "Time Entry", coalesce_fill("Time Entry", "__te_mode")
        )
    else:
        df = df.withColumn("Time Entry", F.col("__te_mode"))
    df = df.drop("__te_mode")

    # -- dedup on business key (reference 343, W2 determinism port) --
    keys = ["UIN", "Pay Event", "Job Number"]
    df = dedup_keep_first(df, keys, order_by or [F.asc(k) for k in keys])

    # -- type-finalize + default-fill (reference 347-357) --
    df = df.withColumn("Calc Date", to_timestamp_coerce("Calc Date"))
    df = df.withColumn(
        "ADJ Reason Code",
        F.when(is_missing("ADJ Reason Code"), F.lit("INT")).otherwise(
            F.col("ADJ Reason Code")
        ),
    ).withColumn(
        "ADJ Reason DESC",
        F.when(is_missing("ADJ Reason DESC"), F.lit("Internal")).otherwise(
            F.col("ADJ Reason DESC")
        ),
    )

    # -- output contract (reference 362-400, P2) --
    return select_contract(df, PUA_COL_MAP)
