"""Training-batch assembly: sequence packing and shard assignment.

The last mile of a pre-training data pipeline (after cleaning, dedup,
and splitting): documents are packed into fixed-capacity context
windows and dealt into a fixed number of output shards in a
deterministic global shuffle. Beyond the reference's scope
(etl_payroll_pipeline_demo.py stops at workbook export) — this is the
LLM-data-pipeline extension surface.

Scale shapes:

- ``pack_greedy``: greedy first-fit packing is inherently sequential
  WITHIN a stream (each bin decision depends on the running fill), so
  it distributes across groups, not within one: ``applyInPandas``
  collects each group onto one executor and runs the linear greedy
  scan there. That is the honest statement of the operator — at 100 TB
  you pack per (source, day, shard-of-corpus) so every group is
  bounded, and groups fan out across the cluster. The scan itself is
  O(n) and Arrow-batched.
- ``shard_assignment``: one narrow map (md5 bucket) + one shuffle on
  the shard key for the in-shard position — exactly the
  two-exchange cost of any deterministic global shuffle. The md5
  bucket is engine-portable (same trick as
  ``operators.sampling.hash_bucket``), so the oracle reproduces the
  assignment AND the positions row-for-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_greedy(
    df: DataFrame,
    capacity: int,
    group_col: str = "source",
    order_col: str = "doc_id",
    size_col: str = "n_tokens",
) -> DataFrame:
    """Greedy first-fit sequence packing per group.

    Scanning the group's rows in ``order_col`` order, each row joins
    the current bin if its ``size_col`` still fits in ``capacity``,
    else it opens the next bin (an oversize row gets a bin of its own —
    bins never split a row). Returns the input keys plus:

    - ``seq_id``  — 0-based bin number within the group
    - ``offset``  — fill level before this row was placed

    Deterministic given (group, order, size) — the DuckDB oracle
    reproduces it exactly with a recursive CTE walking the same order.
    """
    import pandas as pd
    from pyspark.sql import types as T

    schema_out = T.StructType(
        [
            df.schema[group_col],
            df.schema[order_col],
            df.schema[size_col],
            T.StructField("seq_id", T.LongType()),
            T.StructField("offset", T.LongType()),
        ]
    )
    cap = int(capacity)

    def pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(order_col, kind="mergesort").reset_index(
            drop=True
        )
        seq_ids, offsets = [], []
        bin_id, used = 0, 0
        for sz in pdf[size_col].astype("int64"):
            if used > 0 and used + sz > cap:
                bin_id, used = bin_id + 1, 0
            seq_ids.append(bin_id)
            offsets.append(used)
            used += sz
        return pd.DataFrame(
            {
                group_col: pdf[group_col],
                order_col: pdf[order_col],
                size_col: pdf[size_col],
                "seq_id": pd.Series(seq_ids, dtype="int64"),
                "offset": pd.Series(offsets, dtype="int64"),
            }
        )

    cols = [group_col, order_col, size_col]
    return df.select(*cols).groupBy(group_col).applyInPandas(
        pack, schema=schema_out
    )


def shard_assignment(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 16,
) -> DataFrame:
    """Deterministic global shuffle into ``n_shards`` output shards.

    ``shard`` is the engine-portable md5 bucket of the id (stable
    across runs, partitionings, and engines); ``shard_pos`` is the
    row's rank within its shard ordered by (md5-hash, id) — i.e. a
    pseudo-random but fully reproducible within-shard order, which is
    what a training loader wants (shuffled data, byte-identical
    re-runs). One narrow map + one shuffle on ``shard``.
    """
    h = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10
    ).cast("bigint")
    w = Window.partitionBy("shard").orderBy("h", id_col)
    return (
        df.select(F.col(id_col), h.alias("h"))
        .withColumn("shard", (F.col("h") % n_shards).cast("int"))
        .withColumn("shard_pos", F.row_number().over(w).cast("bigint") - 1)
        .select(id_col, "shard", "shard_pos")
    )
