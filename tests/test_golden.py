"""Golden-output determinism: identical CSV bytes under any partitioning.

The reference's outputs were deterministic because pandas is single-
process; the engine must reproduce that byte-for-byte under ANY input
partitioning (SURVEY §5.2 item 3). Each pipeline runs twice — once on
the fixture as-is, once repartitioned adversarially — and the two
deterministically-ordered CSV serializations must be identical.
"""

from __future__ import annotations

import pytest

from uofi_payroll_etl_main_demo_spark import queries as R


def _csv_bytes(df) -> bytes:
    cols = sorted(df.columns)
    pdf = df.toPandas()[cols].sort_values(cols).reset_index(drop=True)
    return pdf.to_csv(index=False).encode()


@pytest.mark.parametrize(
    "name",
    ["pipeline_payroll_shape", "w2_dedup_keep_first", "a1_mode_by_group",
     "stream_sessionize", "pricing_summary", "pipeline_curation",
     "tj_asof_join", "scd2_history", "samp_hash_sample",
     "pipeline_cpa_shape", "w7_locf_fill",
     "ext_semantic_dedup", "stream_dedup", "ext_unigram_surprisal",
     "a17_salted_agg", "ext_dedup_best_of_cluster"],
)
def test_output_stable_under_repartition(spark, sf_dir, name):
    fn = R.queries()[name]
    base = _csv_bytes(fn(spark, sf_dir))
    # second run under a different shuffle width — survivors, modes,
    # sums, and session boundaries must not move
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        again = _csv_bytes(fn(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert base == again
