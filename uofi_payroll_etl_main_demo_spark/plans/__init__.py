"""Physical-plan inspection utilities.

The engine's scale posture (broadcast dims, pushdown, pruned scans,
bounded shuffles) is a *property of the plans*, not just the results —
these helpers read ``explain``-formatted plans so tests can pin those
properties and fail when a change silently degrades them (e.g. a
broadcast join falling back to sort-merge, or a filter no longer
reaching the parquet scan).
"""

from uofi_payroll_etl_main_demo_spark.plans.inspect import (  # noqa: F401
    PlanReport,
    formatted_plan,
    inspect_plan,
)
