"""File-inventory catalog: list files as a DataFrame, resolve sources.

Reference: ``list_files_recursive`` (etl_payroll_pipeline_demo.py:40-61)
walks a Box folder tree and emits one metadata row per file
(file_name, file_path, extension, file_id, size_bytes, modified_at,
created_at); the script then QUERIES that table with pattern predicates
to decide which physical file backs each logical input (77-104, 134,
155-183). Here the walk is a local/remote-FS ``os.walk`` and the
inventory is a small driver-built DataFrame — catalog metadata, not
data — while the predicates become Column expressions.
"""

from __future__ import annotations

import os
from datetime import datetime, timezone

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

INVENTORY_SCHEMA = T.StructType(
    [
        T.StructField("file_name", T.StringType()),
        T.StructField("file_path", T.StringType()),
        T.StructField("extension", T.StringType()),
        T.StructField("file_id", T.StringType()),
        T.StructField("size_bytes", T.LongType()),
        T.StructField("modified_at", T.TimestampType()),
        T.StructField("created_at", T.TimestampType()),
    ]
)


def build_file_inventory(spark: SparkSession, root: str) -> DataFrame:
    """Recursive directory walk → one-row-per-file metadata DataFrame.

    Reference parity: list_files_recursive 40-61 (S2 in SURVEY.md §2.1).
    """
    rows = []
    for dirpath, _dirnames, filenames in os.walk(root):
        for name in sorted(filenames):
            path = os.path.join(dirpath, name)
            try:
                st = os.stat(path)
            except OSError:
                continue
            _, ext = os.path.splitext(name)
            rows.append(
                Row(
                    file_name=name,
                    file_path=path,
                    extension=ext.lower(),
                    file_id=path,
                    size_bytes=int(st.st_size),
                    modified_at=datetime.fromtimestamp(st.st_mtime, timezone.utc).replace(tzinfo=None),
                    created_at=datetime.fromtimestamp(st.st_ctime, timezone.utc).replace(tzinfo=None),
                )
            )
    return spark.createDataFrame(rows, INVENTORY_SCHEMA)


def resolve_source(
    inventory: DataFrame,
    *,
    name_contains: str | None = None,
    name_regex: str | None = None,
    extensions: list[str] | None = None,
    name_equals: str | None = None,
) -> str | None:
    """Pick the first matching file path from the inventory, or None.

    Ports the reference's source-resolution predicates (S5 / P3-P6,
    P10-P11): case-insensitive contains (78), regex contains (83),
    extension IN-list (79/84), exact lowercase name equality (134).
    First match is deterministic: ordered by file_name (the reference's
    "first" was listing order).
    """
    df = inventory
    if name_contains is not None:
        # pandas `.str.contains(case=False, na=False)`: null name → no match.
        pred = F.upper(F.col("file_name")).contains(name_contains.upper())
        df = df.filter(F.coalesce(pred, F.lit(False)))
    if name_regex is not None:
        df = df.filter(F.col("file_name").rlike(name_regex))
    if extensions is not None:
        df = df.filter(F.col("extension").isin([e.lower() for e in extensions]))
    if name_equals is not None:
        df = df.filter(F.lower(F.col("file_name")) == name_equals.lower())
    first = df.orderBy("file_name").select("file_path").limit(1).collect()
    return first[0]["file_path"] if first else None
