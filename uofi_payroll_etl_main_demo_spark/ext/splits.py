"""Leakage-safe train/eval splitting — cluster-aware corpus partitioning.

Random row-level splits LEAK at corpus scale: near-duplicate documents
land on both sides of the train/eval boundary and the eval set silently
measures memorization instead of generalization. The pipeline idiom is
CLUSTER-aware splitting: compute near-duplicate clusters first, then
split on a deterministic hash of the CLUSTER representative, so every
member of a cluster lands on the same side by construction.

Scale shape (what survives 100 TB):

- cluster labels come from the iterative connected-components operator
  (hash-partitioned join + groupBy-min sweeps with ``localCheckpoint``
  lineage truncation — see ``ext/clusters.py``); only doc IDS flow
  through it, never text;
- the label frame covers only the DUPLICATED subset of the corpus
  (docs that appear in at least one near-dup pair) — typically a small
  fraction — so the corpus-side join is against a relatively small
  build side that AQE will broadcast when it fits;
- singleton docs coalesce to themselves as representative, adding
  zero rows to the label frame;
- the split decision itself is the engine-portable md5 bucket from
  ``operators/sampling.py`` — a narrow expression, no extra shuffle,
  bit-identical in any engine (the DuckDB oracle reproduces the exact
  assignment, which no seed-based randomSplit can promise).

Reference scope: the reference pipeline has no train/eval concept
(single-output ETL); this extends the dedup stack
(``uofi-payroll-etl-main_demo`` has no analogue) for LLM-corpus use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from uofi_payroll_etl_main_demo_spark.ext.clusters import connected_components
from uofi_payroll_etl_main_demo_spark.operators.sampling import hash_bucket


def cluster_aware_split(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    eval_pct: int = 10,
    buckets: int = 100,
) -> DataFrame:
    """Assign every doc to 'train' or 'eval', near-dup clusters intact.

    ``pairs`` is any near-dup edge frame (id_a, id_b) — ngram/minhash/
    simhash output. Returns (id_col, cluster_rep, split) for EVERY row
    of ``docs``: cluster members share their component-min id as
    ``cluster_rep``; singletons are their own rep. The split is
    ``eval`` iff the rep's md5 bucket lands below ``eval_pct``, so the
    boundary never cuts through a cluster.
    """
    comp = connected_components(pairs)
    labels = comp.select(
        F.col("id").alias("__sid"), F.col("comp").alias("__rep")
    )
    joined = docs.join(labels, docs[id_col] == labels["__sid"], "left")
    rep = F.coalesce(F.col("__rep"), F.col(id_col))
    return joined.select(
        F.col(id_col),
        rep.alias("cluster_rep"),
        F.when(hash_bucket(rep, buckets) < eval_pct, F.lit("eval"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )


def cluster_aware_split3(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    val_pct: int = 5,
    test_pct: int = 5,
    buckets: int = 100,
) -> DataFrame:
    """Three-way leakage-safe split (train/val/test), clusters intact.

    Same shape as :func:`cluster_aware_split`, with the md5 bucket of
    the cluster representative partitioned into three ranges:
    [0, val_pct) → 'val', [val_pct, val_pct+test_pct) → 'test',
    the rest → 'train'. One hash decides all three memberships, so the
    splits are disjoint and exhaustive by construction — no doc (or
    cluster) can land in two sets, which two independent binary splits
    cannot promise.
    """
    comp = connected_components(pairs)
    labels = comp.select(
        F.col("id").alias("__sid"), F.col("comp").alias("__rep")
    )
    joined = docs.join(labels, docs[id_col] == labels["__sid"], "left")
    rep = F.coalesce(F.col("__rep"), F.col(id_col))
    b = hash_bucket(rep, buckets)
    return joined.select(
        F.col(id_col),
        rep.alias("cluster_rep"),
        F.when(b < val_pct, F.lit("val"))
        .when(b < val_pct + test_pct, F.lit("test"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )
