"""Sinks (SURVEY.md §2.1 S6/S7/S9).

Parquet (partitioned) is the scale sink. CSV supports both the scale
layout (one file per partition) and single-file parity with the
reference's ``to_csv`` (coalesce(1)). Excel is a driver-side bridge
like its reader twin.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def date_stamped_name(prefix: str, ext: str, when: datetime | None = None) -> str:
    """``<prefix>_MMDDYYYY.<ext>`` — reference's output naming
    (etl_payroll_pipeline_demo.py:432, 438-439, 750, 758-759)."""
    when = when or datetime.now()
    return f"{prefix}_{when.strftime('%m%d%Y')}.{ext.lstrip('.')}"


def write_parquet(
    df: DataFrame, path: str, *, partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_partitioned_sorted(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    sort_by: list[str],
    files_per_partition: int = 1,
    mode: str = "overwrite",
) -> None:
    """Hive-partitioned parquet with controlled file count and in-file
    ordering — the 100 TB output-layout sink.

    Without the explicit ``repartition(partition_by)``, EVERY upstream
    task writes a file into EVERY partition directory: tasks ×
    partitions small files, the classic small-files failure at scale.
    Repartitioning by the partition columns first sends each partition's
    rows to ``files_per_partition`` tasks (salted when >1), and
    ``sortWithinPartitions`` gives parquet min/max row-group statistics
    that downstream range predicates prune on.
    """
    parts = [F.col(c) for c in partition_by]
    if files_per_partition > 1:
        salt = (F.crc32(F.concat_ws("\x00", *sort_by)) % files_per_partition)
        out = df.repartition(*parts, salt)
    else:
        out = df.repartition(*parts)
    (
        out.sortWithinPartitions(*partition_by, *sort_by)
        .write.mode(mode)
        .partitionBy(*partition_by)
        .parquet(path)
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: list[str],
    num_buckets: int = 32,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table — the co-located-join layout.

    Two tables bucketed by the same keys into the same bucket count
    join WITHOUT a shuffle exchange on either side (each bucket pair
    joins locally). At 100 TB this is the difference between shuffling
    the fact table per join and never shuffling it: pay the
    partitioning cost once at write time, reuse it every query.
    """
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_by)
    if sort_by:
        w = w.sortBy(*sort_by)
    w.saveAsTable(table)


def write_csv(
    df: DataFrame, path: str, *, single_file: bool = False, mode: str = "overwrite"
) -> None:
    """CSV sink (reference S6 at 444-445, 764-765). ``single_file=True``
    matches the reference's one-artifact output; leave False at scale so
    every task writes its own part."""
    out = df.coalesce(1) if single_file else df
    out.write.mode(mode).option("header", True).csv(path)


def write_jsonl(df: DataFrame, path: str, *, mode: str = "overwrite") -> None:
    """JSON-lines sink (one object per row, one file per task)."""
    df.write.mode(mode).json(path)


def write_orc(df: DataFrame, path: str, *, mode: str = "overwrite") -> None:
    """ORC sink (first-party columnar writer, one file per task)."""
    df.write.mode(mode).orc(path)


def compact_parquet(
    spark,
    path: str,
    target_file_mb: int = 128,
    sort_by: list[str] | None = None,
) -> int:
    """Rewrite a parquet directory into ~``target_file_mb`` files —
    the small-files maintenance job every long-lived table needs
    (streaming sinks and fine-grained partitions accrete KB-scale files
    whose per-file open/footer cost eventually dominates scans).

    Reads the current bytes on disk, repartitions to
    ``ceil(bytes / target)``, writes to a temp directory, then swaps it
    in with two renames: old → ``__old``, temp → live, delete ``__old``.
    A crash between the renames leaves the data recoverable under one
    of the two names — never deleted-but-not-replaced. (Directory
    renames are not a transaction: a concurrent reader can still catch
    the instant between them; a table format with a metadata pointer —
    Iceberg/Delta — is the true-atomicity path.) Returns the new file
    count.
    """
    import glob
    import math
    import os
    import shutil

    files = glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    total = sum(os.path.getsize(f) for f in files)
    n = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    out = df.repartition(n)
    if sort_by:
        out = out.sortWithinPartitions(*sort_by)
    tmp = path.rstrip("/") + "__compact_tmp"
    old = path.rstrip("/") + "__compact_old"
    out.write.mode("overwrite").parquet(tmp)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return len(glob.glob(os.path.join(path, "*.parquet")))


def write_excel(df: DataFrame, path: str) -> None:
    """Excel sink via driver-side pandas (reference S7 at 460-461,
    780-781). Collects to the driver — human-sized outputs only.
    Falls back to the pure-stdlib SpreadsheetML writer
    (``io/xlsx_lite.py``) when openpyxl is absent."""
    pdf = df.toPandas()
    try:
        pdf.to_excel(path, index=False, engine="openpyxl")
    except ImportError:
        import pandas as pd

        from uofi_payroll_etl_main_demo_spark.io.xlsx_lite import write_xlsx

        rows = [list(pdf.columns)]
        for rec in pdf.itertuples(index=False):
            rows.append([None if pd.isna(v) else v for v in rec])
        write_xlsx(rows, path)
