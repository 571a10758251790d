"""Z-order (Morton-curve) data layout for multi-dimensional pruning.

At 100 TB a scan is only as cheap as the files it can SKIP. Parquet
carries per-file / per-row-group min-max statistics ("zone maps"), and
Spark prunes against them — but sorting by one column makes only THAT
column's zone maps selective. Interleaving the bits of several columns
into one Morton key and range-sorting by it bounds EVERY participating
column inside each file, so a filter on any subset of the z-order
columns skips most files (the technique behind Delta Lake's
``OPTIMIZE ZORDER BY`` and ClickHouse/DuckDB space-filling-curve
layouts — public literature: Morton 1966; "Interleave bits by Binary
Magic Numbers" is the classic bit-twiddling form, but the general
k-column form below unrolls per bit).

Everything here is pure integer Column arithmetic — no UDFs, fully
inside whole-stage codegen, and reproducible bit-for-bit in ANSI SQL
(the registry twins build the same expression text for DuckDB).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "compact_parquet",
    "prune_files",
    "zorder_key",
    "zorder_key_sql",
    "zorder_layout",
    "parquet_zone_maps",
]


def _norm(col: Column, lo: int, hi: int, bits: int) -> Column:
    """Scale an integer column into [0, 2**bits) with EXACT integer
    math. Spark's ``/`` is double division, so the quotient is taken
    as ``floor(n / d)`` — exact here because the guards bound the
    numerator under 2**48 (both operands representable, and the
    worst-case rounding error ``q * 2**-52 < 2**-36`` is smaller than
    the smallest nonzero remainder fraction ``1/d > 2**-32``), and
    identical to the oracle's truncating ``//`` because every operand
    is non-negative after clamping."""
    if hi <= lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi}]")
    if hi - lo > (1 << 32):
        raise ValueError(f"domain wider than 2^32 ([{lo}, {hi}])")
    if bits > 19:
        raise ValueError(f"bits = {bits} breaks the exact-floor bound (max 19)")
    top = (1 << bits) - 1
    clamped = F.least(F.greatest(col.cast("long"), F.lit(lo)), F.lit(hi))
    return F.floor((clamped - F.lit(lo)) * top / F.lit(hi - lo)).cast("long")


def zorder_key(cols, bits: int = 16) -> Column:
    """Morton key Column interleaving ``cols`` — a list of
    ``(column, lo, hi)`` triples (column name or Column, inclusive
    integer bounds). Bit ``b`` of normalized column ``j`` lands at
    position ``b * k + j``, so the total width is ``bits * k`` and
    must fit a signed long (``bits * k <= 62`` enforced).

    Bounds are explicit (not sampled) so the key is DETERMINISTIC and
    oracle-reproducible; pass domain bounds or conservative clamps.
    """
    k = len(cols)
    if k < 1:
        raise ValueError("need at least one column")
    if bits * k > 62:
        raise ValueError(f"bits*k = {bits * k} exceeds signed-long range")
    key = F.lit(0).cast("long")
    for j, (c, lo, hi) in enumerate(cols):
        n = _norm(F.col(c) if isinstance(c, str) else c, int(lo), int(hi), bits)
        for b in range(bits):
            key = key.bitwiseOR(
                F.shiftleft(F.shiftright(n, b).bitwiseAND(F.lit(1)), b * k + j)
            )
    return key


def zorder_key_sql(cols, bits: int = 16) -> str:
    """The ANSI-SQL text of :func:`zorder_key` over the same
    ``(column_name, lo, hi)`` triples — the DuckDB oracle twin builds
    its expression from here so the two engines share one law."""
    k = len(cols)
    if k < 1:
        raise ValueError("need at least one column")
    if bits * k > 62:
        raise ValueError(f"bits*k = {bits * k} exceeds signed-long range")
    if bits > 19:
        raise ValueError(f"bits = {bits} breaks the exact-floor bound (max 19)")
    top = (1 << bits) - 1
    terms = []
    for j, (name, lo, hi) in enumerate(cols):
        lo, hi = int(lo), int(hi)
        # same guards as the Spark twin (_norm) — the "one law, two
        # engines" contract includes failing identically at build time
        if hi <= lo:
            raise ValueError(f"need hi > lo, got [{lo}, {hi}]")
        if hi - lo > (1 << 32):
            raise ValueError(f"domain wider than 2^32 ([{lo}, {hi}])")
        n = (
            f"(((least(greatest(CAST({name} AS BIGINT), {lo}), {hi})"
            f" - {lo}) * {top}) // {hi - lo})"
        )
        for b in range(bits):
            terms.append(f"((({n} >> {b}) & 1) << {b * k + j})")
    return "(" + " | ".join(terms) + ")"


def zorder_layout(
    df: DataFrame,
    cols,
    bits: int = 16,
    num_partitions: "int | None" = None,
    key_col: str = "_zkey",
) -> DataFrame:
    """Cluster ``df`` for multi-dimensional zone-map pruning: compute
    the Morton key, range-partition by it (one contiguous curve
    segment per output file) and sort within partitions, then drop the
    key. Write the result with ``.write.parquet`` and every
    participating column's per-file min-max becomes selective.

    ``repartitionByRange`` samples to pick boundaries — fine for a
    WRITE path (layout quality, not answer correctness, is at stake);
    the deterministic registry twins bucket by ``key >> shift``
    instead so the oracle never depends on sampling.
    """
    keyed = df.withColumn(key_col, zorder_key(cols, bits))
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    return (
        keyed.repartitionByRange(parts, F.col(key_col))
        .sortWithinPartitions(key_col)
        .drop(key_col)
    )


def compact_parquet(
    spark,
    src: str,
    dst: str,
    target_bytes: int = 128 * 1024 * 1024,
    zorder_cols=None,
    bits: int = 16,
) -> dict:
    """OPTIMIZE-style compaction: rewrite a parquet directory into
    ~``target_bytes`` files (the small-files problem — a 100 TB table
    accreted from streaming micro-batches or per-task writes pays a
    per-file open/footer/scheduling cost that dwarfs the data; Delta's
    OPTIMIZE, Iceberg's rewrite_data_files are this operation).

    File count = ceil(input_bytes / target_bytes) from the REAL
    on-disk listing (compressed bytes — the honest estimator for the
    rewrite's output, same codec in and out). Plain compaction uses
    ``coalesce`` (merges partitions WITHOUT a shuffle); passing
    ``zorder_cols`` upgrades the rewrite to :func:`zorder_layout`
    (one shuffle, and the output gets multi-dimensional zone maps —
    compact + cluster in a single pass, like OPTIMIZE ZORDER BY).

    Returns {files_in, files_out, bytes_in} for the caller's log.
    ``dst`` must not equal ``src`` (parquet can't overwrite its own
    input mid-read)."""
    import glob
    import os

    if os.path.abspath(dst) == os.path.abspath(src):
        raise ValueError("dst must differ from src")
    if target_bytes < 1:
        raise ValueError(f"target_bytes must be >= 1: {target_bytes}")
    files = [
        f
        for f in glob.glob(os.path.join(src, "*.parquet"))
        if os.path.isfile(f)
    ]
    if not files:
        raise ValueError(f"no parquet files under {src}")
    bytes_in = sum(os.path.getsize(f) for f in files)
    n_out = max(1, -(-bytes_in // target_bytes))
    df = spark.read.parquet(src)
    if zorder_cols:
        out = zorder_layout(df, zorder_cols, bits=bits, num_partitions=n_out)
    else:
        out = df.coalesce(n_out)
    out.write.mode("error").parquet(dst)
    files_out = len(glob.glob(os.path.join(dst, "*.parquet")))
    return {"files_in": len(files), "files_out": files_out,
            "bytes_in": bytes_in}


def prune_files(path: str, box: "dict[str, tuple]") -> "list[str]":
    """Explicit zone-map pruning: the parquet files under ``path``
    whose footer min/max INTERSECTS every ``column: (lo, hi)`` range —
    i.e. the only files a scan of that predicate box must read. Spark
    already prunes row groups once files are opened; this prunes at
    the FILE level before listing ever reaches the scan, which is the
    lever for non-partitioned-but-clustered layouts (z-ordered
    directories, sorted exports):

        spark.read.parquet(*prune_files(path, {"a": (lo, hi), ...}))

    Conservative by construction: a file with missing stats for any
    box column is KEPT (never skip what you can't bound); empty
    (zero-row) files are dropped. Returns absolute paths; empty list
    means the predicate provably selects nothing."""
    import os

    if not box:
        raise ValueError("need at least one column range")
    maps = parquet_zone_maps(path, list(box))
    keep = []
    for m in maps:
        if not m["num_rows"]:
            continue
        ok = True
        for c, (lo, hi) in box.items():
            cmin, cmax = m[f"{c}_min"], m[f"{c}_max"]
            if cmin is None or cmax is None:
                continue  # unbounded column: keep the file
            if cmax < lo or cmin > hi:
                ok = False
                break
        if ok:
            keep.append(os.path.abspath(os.path.join(path, m["file"])))
    return keep


def parquet_zone_maps(path: str, columns) -> "list[dict]":
    """Read back the per-file zone maps (min/max per column) of a
    parquet directory via the parquet FOOTERS — the metadata a scan
    planner prunes with, so this is the ground truth for "did the
    layout make pruning possible". Footer reads are metadata-only
    (no row groups are decoded) and the file list is driver-side by
    construction (one dict per FILE, not per row)."""
    import glob
    import os

    import pyarrow.parquet as pq

    out = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        meta = pq.ParquetFile(f).metadata
        row = {"file": os.path.basename(f), "num_rows": meta.num_rows}
        # column indices from the FILE schema, not row group 0 — a
        # zero-row-group file (empty DataFrame write) has no group 0.
        # .path keeps the dotted path_in_schema semantics for nested
        # columns (.name would be just the leaf and can collide)
        schema_names = {
            meta.schema.column(i).path: i for i in range(meta.num_columns)
        }
        for c in columns:
            i = schema_names.get(c)
            if i is None:
                # schema-evolved directory: a file predating the
                # column reports unknown stats (None), which every
                # consumer treats as "cannot bound — keep"
                row[f"{c}_min"] = None
                row[f"{c}_max"] = None
                continue
            mins, maxs = [], []
            for g in range(meta.num_row_groups):
                st = meta.row_group(g).column(i).statistics
                if st is None or not st.has_min_max:
                    mins, maxs = None, None
                    break
                mins.append(st.min)
                maxs.append(st.max)
            row[f"{c}_min"] = min(mins) if mins else None
            row[f"{c}_max"] = max(maxs) if maxs else None
        out.append(row)
    return out
