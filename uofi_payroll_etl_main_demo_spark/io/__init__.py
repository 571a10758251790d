"""Sources, sinks, and the file-inventory catalog."""

from uofi_payroll_etl_main_demo_spark.io.catalog import (  # noqa: F401
    build_file_inventory,
    resolve_source,
)
from uofi_payroll_etl_main_demo_spark.io.datasources import (  # noqa: F401
    HAS_PYTHON_DATASOURCE,
    SyntheticDocsDataSource,
)
from uofi_payroll_etl_main_demo_spark.io.readers import (  # noqa: F401
    read_csv,
    read_excel,
    read_jsonl,
    read_orc,
    read_parquet_table,
    read_tables,
)
from uofi_payroll_etl_main_demo_spark.io.writers import (  # noqa: F401
    compact_parquet,
    date_stamped_name,
    write_bucketed,
    write_csv,
    write_partitioned_sorted,
    write_jsonl,
    write_excel,
    write_orc,
    write_parquet,
)
