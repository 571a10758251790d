"""Validation library — the reference's inline assertions as product surface."""

from uofi_payroll_etl_main_demo_spark.validate.constraints import (  # noqa: F401
    Rule,
    check_data_constraints,
    foreign_key,
    in_range,
    matches,
    not_null,
    satisfies,
    unique,
)
from uofi_payroll_etl_main_demo_spark.validate.contracts import (  # noqa: F401
    ContractViolation,
    FreshnessError,
    check_format,
    check_freshness,
    check_schema_contract,
)
