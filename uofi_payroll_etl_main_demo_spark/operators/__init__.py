"""Relational operators: join builders, dedup, aggregates, set ops."""

from uofi_payroll_etl_main_demo_spark.operators.aggregates import (  # noqa: F401
    mode_by_group,
    mode_lookup_map,
    null_count,
)
from uofi_payroll_etl_main_demo_spark.operators.dedup import (  # noqa: F401
    dedup_keep_first,
    distinct_rows,
)
from uofi_payroll_etl_main_demo_spark.operators.joins import (  # noqa: F401
    FanOutError,
    FanOutWarning,
    anti_join,
    enrich_left,
    safe_left_join,
    semi_join,
)
from uofi_payroll_etl_main_demo_spark.operators.history import (  # noqa: F401
    scd2_intervals,
)
from uofi_payroll_etl_main_demo_spark.operators.sampling import (  # noqa: F401
    hash_bucket,
    hash_sample,
    stratified_hash_sample,
)
from uofi_payroll_etl_main_demo_spark.operators.temporal import (  # noqa: F401
    asof_join,
    asof_join_sliced,
    range_join,
)
from uofi_payroll_etl_main_demo_spark.operators.skew import (  # noqa: F401
    salted_left_join,
    two_phase_agg,
    with_salt,
)
from uofi_payroll_etl_main_demo_spark.operators.setops import (  # noqa: F401
    except_rows,
    intersect_rows,
    union_by_name,
)
