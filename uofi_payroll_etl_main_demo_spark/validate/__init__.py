"""Validation library — the reference's inline assertions as product surface."""

from uofi_payroll_etl_main_demo_spark.validate.contracts import (  # noqa: F401
    ContractViolation,
    FreshnessError,
    check_format,
    check_freshness,
    check_schema_contract,
)
