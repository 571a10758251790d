"""Structured Streaming surface (extension — SURVEY.md §2.10).

The reference is batch-only; these operators give the engine the
streaming equivalents a continuously-fed events table needs. Every
transform is written against a plain DataFrame so the SAME code runs
in batch (for oracle-differential testing) and on a ``readStream``
source (for streaming semantics) — the Structured Streaming model's
core guarantee.
"""

from uofi_payroll_etl_main_demo_spark.streaming.corpus import (  # noqa: F401
    ingest_constrained_stream,
    ingest_containment_stream,
    ingest_dedup_stream,
    ingest_dedup_stream_indexed,
)
from uofi_payroll_etl_main_demo_spark.streaming.events import (  # noqa: F401
    correlate_streams,
    dedup_events,
    enrich_stream,
    event_type_rollup,
    read_events_stream,
    sessionize,
    windowed_event_counts,
    write_stream_foreach_batch,
)
