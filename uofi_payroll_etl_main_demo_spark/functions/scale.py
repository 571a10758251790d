"""Scale-adaptive input parallelism for per-row-HEAVY stages.

A small corpus reads as one parquet row group → ONE scan task, so
everything up to the first exchange (tokenize, shingle/array HOFs,
hashing, partial aggregation) runs single-threaded no matter how many
cores the cluster has. ``scale_input_parallelism`` round-robin
repartitions the RAW input rows to ``defaultParallelism`` — but ONLY
when the scan has fewer partitions than that, so at any real corpus
scale (where the scan already has more partitions than cores) it is a
no-op and nothing here is tuned to local mode. The exchange that does
fire moves exactly the projected bytes of a tiny input, which is why
callers should pass a PROJECTED frame (id + the columns the heavy
stage actually reads).

This is the guide's "make partitioning scale-adaptive (derive from
input size) rather than a constant tuned for either local mode or the
cluster" rule applied to scan-side parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def scale_input_parallelism(df: DataFrame) -> DataFrame:
    """Repartition ``df`` up to ``defaultParallelism`` iff its plan
    currently yields fewer partitions (tiny scans); identity otherwise.

    Round-robin (keyless) repartition: perfectly even spread for the
    downstream per-row work, deterministic under retries via Spark's
    sort-before-repartition default. Output VALUES of every caller are
    partitioning-independent (pure per-row maps into commutative
    aggregations), so this never changes what a query computes."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
