"""Reference pipeline compositions (SURVEY.md §3.2 / §3.3).

The two end-to-end dataflows of the reference script, re-expressed as
pure ``sources → DataFrame`` functions over lazy Spark plans. Each
pipeline is a single logical plan from sources to output contract —
Catalyst sees the whole chain (projection collapse, broadcast joins,
pushdown); the only driver actions are the validation checks between
lazy segments, which aggregate tiny values only.
"""

from uofi_payroll_etl_main_demo_spark.pipelines.cpa import (  # noqa: F401
    CPA_COL_MAP,
    CPA_EXPECTED_COLUMNS,
    CPA_OUTPUT_COLUMNS,
    cpa_pipeline,
)
from uofi_payroll_etl_main_demo_spark.pipelines.pua import (  # noqa: F401
    PUA_COL_MAP,
    pua_pipeline,
)
