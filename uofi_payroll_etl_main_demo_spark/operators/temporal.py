"""Temporal joins — as-of and range (band) joins.

The reference has no temporal joins (its only time use is a range
*filter*, SURVEY.md §2.2 P7); these are engine extensions in the class
of operators a time-series / event pipeline needs. Both are built to
avoid the naive O(n·m) theta-join physical plan Spark would pick for an
inequality join condition:

- ``asof_join``: union both sides and resolve the match with ONE window
  pass per key — a single hash shuffle on the key columns, no join at
  all. This is the classic distributed as-of shape (union + last-known
  carry-forward); wall-clock scales with rows/partition, not pairs.
- ``range_join``: quantize time into buckets as wide as the band, then
  EQUI-join on (key, bucket) — each left row lands in at most two
  buckets, so the join is hash-partitioned and AQE-skew-splittable,
  and the exact band predicate filters the at-most-2× candidates.
  (Same trick Databricks' range-join optimization applies under the
  hood; expressed here with plain DataFrame ops.)

Determinism: as-of ties (several right rows at the same key+timestamp)
are resolved by pre-aggregating the right side to one row per
(key, ts) — callers pick the aggregate; default keeps the max payload
struct. A distributed engine must not leave tie-break to row order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload: list[str] | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Backward inclusive as-of join: for every left row, attach the
    latest right row with ``right_ts <= left_ts`` on the same key.

    Output: all left columns + ``<prefix><right_ts>`` + prefixed
    payload columns (null when no prior right row exists).

    Physical shape: tag sides, union, one window over (key) ordered by
    (ts, side) with a last-non-null carry-forward, filter back to left
    rows. Exactly one shuffle (hash by key); no broadcast requirement
    on either side, so both sides may be 100 TB-scale. Right rows sort
    BEFORE left rows at equal timestamps, which is what makes the match
    inclusive.
    """
    keys = [on] if isinstance(on, str) else list(on)
    payload = list(payload or [])

    # One row per (key, ts) on the right: deterministic tie-break by
    # greatest payload struct (struct comparison is field-ordered).
    r_payload = F.struct(
        F.col(right_ts).alias(prefix + right_ts),
        *[F.col(c).alias(prefix + c) for c in payload],
    )
    l_struct = F.struct(*[F.col(c) for c in left.columns])
    l_type = left.select(l_struct.alias("__l")).schema["__l"].dataType
    r = (
        right.filter(F.col(right_ts).isNotNull())
        .groupBy(*keys, right_ts)
        .agg(F.max(r_payload).alias("__p"))
        .select(
            *keys,
            F.col(right_ts).alias("__ts"),
            F.lit(0).alias("__side"),
            F.col("__p"),
            F.lit(None).cast(l_type).alias("__l"),
        )
    )
    l = left.select(
        *keys,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__p"].dataType).alias("__p"),
        l_struct.alias("__l"),
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l.unionByName(r)
        .withColumn("__m", F.last("__p", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    out_cols = [F.col(f"__l.{c}").alias(c) for c in left.columns]
    out_cols += [
        F.col(f"__m.{prefix}{c}").alias(prefix + c)
        for c in [right_ts, *payload]
    ]
    return matched.select(*out_cols)


def asof_join_sliced(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload: list[str] | None = None,
    prefix: str = "asof_",
    slice_seconds: float = 86400.0,
) -> DataFrame:
    """Skew-resilient variant of :func:`asof_join` (same semantics).

    ``asof_join`` windows by key alone — one pathological key (a bot
    user, a hot instrument) serializes its entire history into a single
    task. This variant splits time into ``slice_seconds`` slices and
    resolves in two phases:

    1. within-slice pass windowed by (key, slice) — the hot key's rows
       now spread across time-slice tasks;
    2. carry-in pass over the per-(key, slice) summaries (one row per
       key×slice — orders of magnitude smaller than the data), where a
       per-key window is harmless, joined back and coalesced with the
       within-slice match.

    Three narrow shuffles total, none keyed by the raw hot key alone.
    Pick ``slice_seconds`` so a hot key's densest slice fits a task;
    the plain variant stays preferable when keys are well distributed.
    """
    keys = [on] if isinstance(on, str) else list(on)
    payload = list(payload or [])

    def _slice(ts: Column) -> Column:
        return F.floor(ts.cast("double") / F.lit(float(slice_seconds))).cast(
            "long"
        )

    r_payload = F.struct(
        F.col(right_ts).alias(prefix + right_ts),
        *[F.col(c).alias(prefix + c) for c in payload],
    )
    l_struct = F.struct(*[F.col(c) for c in left.columns])
    l_type = left.select(l_struct.alias("__l")).schema["__l"].dataType
    r = (
        right.filter(F.col(right_ts).isNotNull())
        .groupBy(*keys, right_ts)
        .agg(F.max(r_payload).alias("__p"))
        .select(
            *keys,
            F.col(right_ts).alias("__ts"),
            F.lit(0).alias("__side"),
            F.col("__p"),
            F.lit(None).cast(l_type).alias("__l"),
        )
    )
    l = left.select(
        *keys,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__p"].dataType).alias("__p"),
        l_struct.alias("__l"),
    )
    u = l.unionByName(r).withColumn("__slice", _slice(F.col("__ts")))

    # Phase 1: within-slice carry-forward, partitioned by (key, slice).
    w_slice = (
        Window.partitionBy(*keys, "__slice")
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("__m", F.last("__p", ignorenulls=True).over(w_slice))

    # Phase 2: per-(key, slice) summary -> carry-in from earlier slices.
    # The summary frame has ONE row per key x slice, so the per-key
    # window here touches slice counts, not row counts.
    summary = u.groupBy(*keys, "__slice").agg(
        F.max("__p").alias("__slice_last")
    )
    w_carry = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__slice").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = summary.select(
        *keys,
        "__slice",
        F.last("__slice_last", ignorenulls=True).over(w_carry).alias(
            "__carry"
        ),
    )
    matched = (
        u.filter(F.col("__side") == 1)
        .join(carry, [*keys, "__slice"], "left")
        .withColumn("__m", F.coalesce("__m", "__carry"))
    )
    out_cols = [F.col(f"__l.{c}").alias(c) for c in left.columns]
    out_cols += [
        F.col(f"__m.{prefix}{c}").alias(prefix + c)
        for c in [right_ts, *payload]
    ]
    return matched.select(*out_cols)


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_seconds: float = -3600.0,
    upper_seconds: float = 0.0,
    right_payload: list[str] | None = None,
    prefix: str = "r_",
) -> DataFrame:
    """Band join: pair each left row with every right row on the same
    key whose timestamp lies in ``(left_ts + lower, left_ts + upper]``
    (seconds offsets; default = the preceding hour, exclusive of the
    left row's own instant).

    Output: all left columns + prefixed right payload columns, one row
    per matched pair (left rows with no match are absent — compose with
    a left join for outer semantics).

    Physical shape: both sides bucketed to ``width = upper - lower``
    seconds; a left row's band spans at most two buckets, so the plan
    is explode(≤2) → hash equi-join on (key, bucket) → exact band
    filter. No theta-join, no broadcast requirement; bucket hotspots
    are ordinary join skew handled by AQE.
    """
    keys = [on] if isinstance(on, str) else list(on)
    payload = list(right_payload or [])
    width = float(upper_seconds - lower_seconds)
    if width <= 0:
        raise ValueError("upper_seconds must exceed lower_seconds")

    def _bucket(ts: Column, offset: float) -> Column:
        return F.floor(
            (ts.cast("double") + F.lit(offset)) / F.lit(width)
        ).cast("long")

    lt = F.col("__lts")
    l = left.withColumn("__lts", F.col(left_ts)).withColumn(
        "__b",
        F.array_distinct(
            F.array(_bucket(lt, lower_seconds), _bucket(lt, upper_seconds))
        ),
    )
    l = l.select(*left.columns, "__lts", F.explode("__b").alias("__bucket"))
    r = right.select(
        *[F.col(k).alias(f"__rk_{k}") for k in keys],
        F.col(right_ts).alias("__rts"),
        *[F.col(c).alias(prefix + c) for c in payload],
    ).withColumn("__bucket", _bucket(F.col("__rts"), 0.0))
    joined = l.join(
        r,
        [l["__bucket"] == r["__bucket"]]
        + [l[k] == r[f"__rk_{k}"] for k in keys],
        "inner",
    )
    band = (
        F.col("__rts").cast("double")
        > F.col("__lts").cast("double") + F.lit(lower_seconds)
    ) & (
        F.col("__rts").cast("double")
        <= F.col("__lts").cast("double") + F.lit(upper_seconds)
    )
    return joined.filter(band).select(
        *left.columns,
        F.col("__rts").alias(prefix + right_ts),
        *[F.col(prefix + c) for c in payload],
    )
