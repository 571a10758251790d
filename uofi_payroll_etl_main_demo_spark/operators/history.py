"""Slowly-changing-dimension history (SCD type 2) from change events.

The reference's pipelines snapshot lookup dimensions per run (SURVEY.md
§2.3 — every join input is "the current file"); a warehouse-grade
engine also needs the historical form: given a stream of per-key
change rows, produce validity intervals [valid_from, valid_to) with an
``is_current`` flag.

Scale shape: ONE window pass partitioned by key (lead over the change
timestamp) — a single hash shuffle, no self-join, no driver state.
Determinism: callers supply tie-break columns so simultaneous changes
order totally (the same hard-part-1 rule as keep-first dedup,
SURVEY.md §7.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_intervals(
    df: DataFrame,
    key: list[str] | str,
    ts: str,
    attrs: list[str],
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Change rows → SCD2 validity intervals.

    Output: key cols + attrs + ``valid_from`` (= the row's ``ts``),
    ``valid_to`` (next change's ts, null for the open interval), and
    ``is_current``. One row per input change row.
    """
    keys = [key] if isinstance(key, str) else list(key)
    order = [F.col(ts).asc()] + [F.col(c).asc() for c in (tiebreak or [])]
    w = Window.partitionBy(*keys).orderBy(*order)
    nxt = F.lead(ts).over(w)
    return df.select(
        *keys,
        *attrs,
        F.col(ts).alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    keys: list[str],
) -> DataFrame:
    """Snapshot MERGE: the parquet-snapshot equivalent of Delta/Iceberg
    ``MERGE WHEN MATCHED THEN UPDATE WHEN NOT MATCHED THEN INSERT`` —
    update rows replace matching base rows by key, the rest insert.

    Shape: left-anti join base against the (deduped) update keys, then
    union the updates — one shuffle on the key, no full-outer join and
    no per-column coalesce pyramid. At 100 TB the anti join probes a
    broadcast/bucketed key set; the untouched majority of the base
    streams through unjoined. ``updates`` must be key-unique (enforce
    upstream with ``dedup_keep_first``) — duplicate update keys would
    insert duplicates, exactly like Delta's multiple-matches error.
    """
    upd_keys = updates.select(*keys).distinct()
    return base.join(upd_keys, keys, "left_anti").unionByName(updates)
