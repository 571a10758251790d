"""Cleanse/derive column builders — reference parity surface.

Each builder re-expresses one scalar helper or idiom of the reference
(`/root/reference/etl_payroll_pipeline_demo.py`, cited per function) as a
vectorized Spark Column expression. Zero Python UDFs: everything stays
JVM-side inside whole-stage codegen (SURVEY.md §2.9, §2.11).

Semantics gaps vs naive Spark (SURVEY.md §4.3) handled here:
- null-propagating concat (pandas ``+`` yields NaN on NaN input;
  ``concat_ws`` would skip nulls) → ``concat_key`` uses ``F.concat``.
- tri-state missing (NULL, ``''``, literal ``'nan'``/``'NaN'``) →
  ``is_missing``.
- decimal-string normalization (``"123.0"`` → ``"123"``) →
  ``strip_decimal_str`` / ``normalize_numeric_string``.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ColumnOrName = Column | str


def _col(c: ColumnOrName) -> Column:
    return F.col(c) if isinstance(c, str) else c


def clean_column_names(df: DataFrame) -> DataFrame:
    """Strip whitespace from every column name.

    Reference: ``clean_column_names`` at etl_payroll_pipeline_demo.py:215-217
    (applied again at 487-488, 670). Metadata-only — no plan change.
    """
    return df.toDF(*[c.strip() for c in df.columns])


def ensure_string(c: ColumnOrName) -> Column:
    """Cast to string and trim; NULL stays NULL.

    Reference: ``ensure_string`` at etl_payroll_pipeline_demo.py:228-231.
    """
    return F.trim(_col(c).cast("string"))


def strip_decimal_str(c: ColumnOrName) -> Column:
    """Normalize Excel-float codes: ``"1234.0"`` → ``"1234"``, trimmed string.

    Reference: ``strip_decimal_str`` at etl_payroll_pipeline_demo.py:219-222
    (use sites 259, 272-273). NULL propagates.
    """
    return F.regexp_replace(F.trim(_col(c).cast("string")), r"\.0$", "")


def normalize_numeric_string(c: ColumnOrName) -> Column:
    """Whole-value normalization of integral-looking strings.

    Reference: the per-cell ``int(float(x))`` lambda at
    etl_payroll_pipeline_demo.py:673-682 — gate is pandas'
    isdigit-after-removing-one-dot test plus ``float(x).is_integer()``,
    then ``int(float(x))`` canonicalizes: ``" 123.00 "`` → ``"123"``,
    ``"00123.0"`` → ``"123"``, ``"123."`` → ``"123"``, ``"0123"`` →
    ``"123"``, ``".0"`` → ``"0"``; anything non-integral just trimmed.
    Mirrored here string-side (gate = unsigned digits with one
    optional dot followed only by zeros; canonical form = integer part
    with leading zeros stripped, empty → "0"). Two deliberate
    divergences, both where the reference's FLOAT round-trip loses
    information the string still has: (1) >15-digit integrals stay
    exact where ``int(float(x))`` would round them; (2) a non-zero
    fraction that float-rounds to an integer (``"1.9999999999999999"``
    → reference ``"2"``) fails the string gate and passes through
    trimmed — the string-side law never invents digits the input
    doesn't contain. Vectorized, no UDF.
    """
    t = F.trim(_col(c).cast("string"))
    int_part = F.regexp_extract(t, r"^(\d*)", 1)
    canon = F.coalesce(
        F.nullif(F.regexp_replace(int_part, r"^0+", ""), F.lit("")),
        F.lit("0"),
    )
    return F.when(t.rlike(r"^(\d+(\.0*)?|\.0+)$"), canon).otherwise(t)


def normalize_cell(c: ColumnOrName) -> Column:
    """Full-fidelity port of the reference's per-column cleanup chain
    at etl_payroll_pipeline_demo.py:673-682: the ``int(float(x))``
    coercion for integral digit-strings (:func:`normalize_numeric_string`
    — pandas' ``isdigit`` gate excludes signs, so negatives skip it;
    leading-zero and trailing-dot integrals canonicalize exactly as
    ``int(float(x))`` does),
    THEN the unconditional trailing-``.0`` strip pandas applies to
    EVERY cell (``.str.replace(r'\\.0$', '')``: ``'-123.0'``→``'-123'``,
    ``'v1.0'``→``'v1'``).

    One deliberate divergence: the reference's ``astype(str)`` turns
    missing cells into the literal string ``'nan'``; here NULL stays
    NULL — typed-null outputs instead of stringified sentinels.
    :func:`is_missing` treats both as missing, and Spark's
    distinct/keep-first treat nulls as equal (as pandas does equal
    ``'nan'`` strings), so the reference's dedup cascade behaves
    identically; only the output representation differs.
    """
    return F.regexp_replace(normalize_numeric_string(c), r"\.0$", "")


def is_missing(c: ColumnOrName) -> Column:
    """Tri-state missing predicate: NULL, blank, or literal 'nan'/'NaN'.

    Reference: mask at etl_payroll_pipeline_demo.py:354
    (``isna() | astype(str).str.strip().isin(['','nan','NaN'])``).
    """
    col = _col(c)
    return col.isNull() | F.trim(col.cast("string")).isin("", "nan", "NaN")


def concat_key(*cols: ColumnOrName, sep: str = "-") -> Column:
    """Null-PROPAGATING separator concat (pandas ``a + '-' + b`` parity).

    Reference: derived keys at etl_payroll_pipeline_demo.py:257, 261, 269,
    274, 278, 558, 591. pandas ``+`` yields NaN if any operand is NaN;
    Spark's ``concat_ws`` would silently skip nulls instead, so we use
    ``F.concat`` which propagates (SURVEY.md §4.3).
    """
    parts: list[Column] = []
    for i, c in enumerate(cols):
        if i and sep:
            parts.append(F.lit(sep))
        parts.append(_col(c))
    return F.concat(*parts)


def concat_ws_skipnull(sep: str, *cols: ColumnOrName) -> Column:
    """Null-SKIPPING concat (Spark native `concat_ws`), exposed for contrast."""
    return F.concat_ws(sep, *[_col(c) for c in cols])


def coalesce_fill(primary: ColumnOrName, *fallbacks: ColumnOrName) -> Column:
    """``fillna(other_col)`` parity: first non-missing wins, where missing
    includes blank/'nan' strings (tri-state).

    Reference: etl_payroll_pipeline_demo.py:302 (Dept title fallback),
    321-324 / 647-650 (mapped-value fallback).
    """
    expr = F.when(~is_missing(primary), _col(primary))
    for fb in fallbacks:
        expr = expr.when(~is_missing(fb), _col(fb))
    return expr.otherwise(F.lit(None))


def null_string_col() -> Column:
    """All-null string column for absent output-contract sources.

    Reference: etl_payroll_pipeline_demo.py:393-398.
    """
    return F.lit(None).cast("string")


def to_timestamp_coerce(c: ColumnOrName, fmt: str | None = None) -> Column:
    """Timestamp parse with null-on-failure (``errors='coerce'`` parity).

    Reference: etl_payroll_pipeline_demo.py:350, 407, 494, 685, 689.
    Spark's ``try_to_timestamp`` gives coerce semantics regardless of
    ANSI mode.
    """
    col = _col(c)
    if fmt is None:
        return F.try_to_timestamp(col.cast("string"))
    return F.try_to_timestamp(col.cast("string"), F.lit(fmt))


def fiscal_year(c: ColumnOrName, start_month: int = 7) -> Column:
    """Fiscal year of a timestamp: FY labeled by ending calendar year
    (Jul 1 year-1 → Jun 30 year ⇒ FY = year).

    Reference: fiscal window arithmetic at
    etl_payroll_pipeline_demo.py:499-512.
    """
    col = _col(c)
    return (
        F.year(col) + F.when(F.month(col) >= start_month, F.lit(1)).otherwise(F.lit(0))
    ).cast("int")


def split_code_name(
    c: ColumnOrName, sep: str = "-", max_split: int = 2
) -> tuple[Column, Column]:
    """Split ``"<code>-<name>"`` into (code, nullable name), 1 split max.

    Reference: COLLEGE split loop at etl_payroll_pipeline_demo.py:698-706 —
    a row-wise Python loop there; a vectorized expression pair here.
    """
    parts = F.split(_col(c), sep, max_split)
    code = F.trim(F.element_at(parts, 1))
    name = F.when(F.size(parts) > 1, F.trim(F.element_at(parts, 2)))
    return code, name


def select_contract(
    df: DataFrame, col_map: Iterable[tuple[str, str | None]]
) -> DataFrame:
    """Output-contract projection: rename + reorder + null-fill missing.

    ``col_map`` is an ordered sequence of ``(output_name, source_name)``;
    a source of None or one absent from ``df`` materializes as an
    all-null string column.

    Reference: the 26-column ``col_map`` OrderedDict projection at
    etl_payroll_pipeline_demo.py:362-400 (P2 in SURVEY.md §2.2).
    """
    exprs = []
    have = set(df.columns)
    for out_name, src in col_map:
        if src is not None and src in have:
            exprs.append(F.col(src).alias(out_name))
        else:
            exprs.append(null_string_col().alias(out_name))
    return df.select(*exprs)


def rename_columns(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """Bulk rename, tolerating absent sources (header-variant tolerance).

    Reference: variant renames at etl_payroll_pipeline_demo.py:281-286,
    416-420, 711-732.
    """
    present = {k: v for k, v in mapping.items() if k in df.columns}
    return df.withColumnsRenamed(present)


def dedupe_column_names(df: DataFrame) -> DataFrame:
    """Keep the first occurrence of each duplicated column name.

    Reference: ``df.loc[:, ~df.columns.duplicated()]`` at
    etl_payroll_pipeline_demo.py:741.
    """
    # Selecting a duplicated name is ambiguous in Spark; go positional via
    # a unique temporary naming, then alias the first occurrence back.
    tmp = df.toDF(*[f"__c{i}" for i in range(len(df.columns))])
    seen: set[str] = set()
    keep: list[Column] = []
    for i, name in enumerate(df.columns):
        if name not in seen:
            seen.add(name)
            keep.append(F.col(f"__c{i}").alias(name))
    return tmp.select(*keep)
