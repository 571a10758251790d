"""Sources (SURVEY.md §2.1 S3/S4/S10).

Parquet is the scale path (vectorized scan, predicate pushdown, column
pruning). CSV is a first-class Spark reader. Excel has no first-party
Spark source, so it is a DRIVER-SIDE pandas bridge
(``pd.read_excel`` → ``spark.createDataFrame`` over Arrow) — correct
for the reference's human-sized payroll workbooks
(etl_payroll_pipeline_demo.py:94, 102, 161), and explicitly NOT a
100 TB path; anything large must arrive as parquet/CSV.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TPCH_TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


# Tables whose timestamp columns need normalization to the engine's
# TIMESTAMP (UTC wall-clock) contract. Two generations of TESTDATA
# exist: parquet TIMESTAMP(NANOS) (reads as bigint under the legacy
# conf) and plain TIMESTAMP(MICROS, isAdjustedToUTC=false) (reads as
# TIMESTAMP_NTZ under Spark's NTZ inference). Both are rewritten to
# TimestampType so downstream operators (windows, unix_micros,
# watermarks) see one type. Gated on this map / an explicit argument —
# a column that merely happens to be named "ts" in some other table is
# never rewritten.
NANOS_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def read_parquet_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    nanos_cols: tuple[str, ...] | None = None,
) -> DataFrame:
    """One driver test table (TESTDATA.md layout).

    Parquet TIMESTAMP(NANOS) columns (the events.ts column) are illegal
    for Spark's reader by default; for the known-nanos tables
    (``NANOS_TS_COLS``, overridable via ``nanos_cols``) read them as raw
    nanos via the ``nanosAsLong`` legacy conf and truncate to micros —
    exactly what a micros-native engine (DuckDB, Spark itself) does with
    nano input. The conf is only touched for those tables.
    """
    nanos = NANOS_TS_COLS.get(name, ()) if nanos_cols is None else nanos_cols
    if nanos:
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            # Engine contract: timestamps are UTC-naive wall clocks (the
            # parquet NANOS column is isAdjustedToUTC=false). A non-UTC
            # session would render timestamp_micros shifted; pin the
            # engine's documented UTC contract (session.get_spark sets
            # the same) so queries behave identically under any caller's
            # session.
            spark.conf.set("spark.sql.session.timeZone", "UTC")
        except Exception:  # pragma: no cover - conf absent on future versions
            pass
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for field in df.schema.fields:
        if field.name not in nanos:
            continue
        kind = field.dataType.simpleString()
        if kind == "bigint":
            # integer division keeps full int64 precision (a double
            # round-trip would corrupt nano timestamps > 2^53).
            df = df.withColumn(
                field.name, F.expr(f"timestamp_micros({field.name} div 1000)")
            )
        elif kind == "timestamp_ntz":
            # micros-generation TESTDATA: the parquet column is a naive
            # wall clock; under the pinned UTC session this cast is a
            # pure type change (identical micros), aligning with the
            # nanos path above and with DuckDB's read of the same file.
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
    return df


def read_tables(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> dict[str, DataFrame]:
    return {
        n: read_parquet_table(spark, sf_dir, n) for n in (names or TPCH_TABLES)
    }


def read_csv(
    spark: SparkSession,
    path: str,
    *,
    header: bool = True,
    infer_schema: bool = True,
    schema=None,
) -> DataFrame:
    """CSV source (reference S4: lookup CSVs at 133-143, certs 178/183).

    Pass an explicit ``schema`` in production — inference reads the data
    twice and guesses; the default mirrors the reference's inference.
    """
    reader = spark.read.option("header", header)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", infer_schema)
    return reader.csv(path)


def read_jsonl(
    spark: SparkSession, path: str, *, schema=None
) -> DataFrame:
    """JSON-lines source. Explicit ``schema`` avoids the inference scan
    (two passes over the data) — pass one in production."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_orc(spark: SparkSession, path: str, *, schema=None) -> DataFrame:
    """ORC source — the columnar alternative where the lake standard is
    ORC (Hive-heritage warehouses). First-party Spark reader: predicate
    pushdown, column pruning, and vectorized decode all apply exactly
    as for parquet."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def read_excel(
    spark: SparkSession, path: str, sheet_name: int | str = 0
) -> DataFrame:
    """Excel source via the driver-side pandas bridge (reference S3).

    Prefers ``pd.read_excel`` (openpyxl); when openpyxl is absent it
    falls back to the pure-stdlib SpreadsheetML reader
    (``io/xlsx_lite.py``), so workbooks load in minimal environments
    too. Parquet/CSV remain the scale ingest paths; first row is the
    header, matching the reference's default.
    """
    try:
        import pandas as pd
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError("pandas required for the Excel bridge") from exc
    try:
        pdf = pd.read_excel(path, sheet_name=sheet_name)
    except ImportError:
        from uofi_payroll_etl_main_demo_spark.io.xlsx_lite import read_xlsx

        rows = read_xlsx(path, sheet_name)
        if not rows:
            raise ValueError(f"{path}: empty worksheet")
        header = [str(h) for h in rows[0]]
        pdf = pd.DataFrame(rows[1:], columns=header)
    # Excel columns routinely arrive as mixed object dtype; stringify
    # non-numeric object columns so Arrow conversion cannot fail.
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype("string")
    return spark.createDataFrame(pdf)
