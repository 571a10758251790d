"""Schema-contract / freshness / format validation (SURVEY.md §5.1).

The reference enforces correctness with inline runtime validations, not
tests; they are product surface and are ported here as a library:

- exact column contract with diagnostics
  (etl_payroll_pipeline_demo.py:522-554),
- data-freshness hard failure (508-512),
- regex format validation of derived keys (564-581).

All checks run as driver actions over TINY aggregates (counts, column
lists) — they never collect data rows, so they are safe between lazy
plan segments at any scale.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class ContractViolation(AssertionError):
    """Schema does not match the expected contract."""


class FreshnessError(ValueError):
    """Data is older than the allowed window (reference's hard raise 508-512)."""


@dataclass
class SchemaReport:
    ok: bool
    missing: list[str] = field(default_factory=list)
    extra: list[str] = field(default_factory=list)
    misplaced: list[tuple[str, int, int]] = field(default_factory=list)  # (col, expected_pos, actual_pos)


def check_schema_contract(
    df: DataFrame,
    expected_columns: list[str],
    *,
    strict_order: bool = True,
    raise_on_fail: bool = True,
) -> SchemaReport:
    """Exact column name (+ optional order) contract with diagnostics.

    Reference: the 34-column check at 522-554, which reports missing,
    extra, and misplaced columns before failing.
    """
    actual = list(df.columns)
    missing = [c for c in expected_columns if c not in actual]
    extra = [c for c in actual if c not in expected_columns]
    misplaced = []
    if strict_order and not missing and not extra:
        for i, (e, a) in enumerate(zip(expected_columns, actual)):
            if e != a:
                misplaced.append((e, i, actual.index(e)))
    ok = not (missing or extra or misplaced)
    report = SchemaReport(ok=ok, missing=missing, extra=extra, misplaced=misplaced)
    if not ok and raise_on_fail:
        raise ContractViolation(
            f"schema contract failed: missing={missing} extra={extra} "
            f"misplaced={misplaced}"
        )
    return report


def check_freshness(
    df: DataFrame,
    ts_col: str,
    *,
    not_before,
    raise_on_fail: bool = True,
) -> bool:
    """Fail if any timestamp is older than ``not_before``.

    Reference: 508-512 — raises ValueError when transactions predate
    one fiscal year before the processing window. One tiny min()
    aggregate; no row collection.
    """
    mn = df.agg(F.min(ts_col).alias("mn")).first()["mn"]
    ok = mn is None or mn >= not_before
    if not ok and raise_on_fail:
        raise FreshnessError(
            f"{ts_col} has data at {mn}, older than allowed {not_before}"
        )
    return ok


def check_format(
    df: DataFrame,
    col: Column | str,
    pattern: str,
    *,
    sample: int = 5,
) -> tuple[int, list]:
    """Count (and sample) rows whose value does NOT fully match
    ``pattern`` (reference 564-581: `^\\d-\\d{6}$` and `^\\d-\\d{3}$`
    checks with `.head()` previews of violators).

    Returns ``(violation_count, sample_rows)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    bad = df.filter(~F.coalesce(c.rlike(pattern), F.lit(False)))
    count = bad.count()
    rows = bad.limit(sample).collect() if count else []
    return count, rows
