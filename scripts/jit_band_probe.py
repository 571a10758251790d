"""JIT-band probe: same plan, cold session vs warmed session.

The r9 verdict flagged ext_repetition_stats (idle 3.06 s vs r4 driver
1.28 s) and ext_simhash_pairs (3.01 vs 2.40) as possible regressions.
Round-10 bisect found NO plan change since the r4 measurements (the
operator sources are byte-identical; the tokenizer hardening in
between measures the same or faster under these loads). What moved is
the MEASUREMENT BAND: both rows lean on interpreted higher-order-
function expression evaluation (array_sort + fold lambdas; 64
conditional sums over md5-derived bits), whose JVM JIT compilation
warms GRADUALLY across many invocations — a 2-query idle session
never reaches the steady state a 100+-query bench suite reaches.

This probe reproduces both ends from one HEAD build:

  phase A (near-cold): 1 warmup + min-of-2 for each row, nothing else
          run in the session — the r9 verdict's idle methodology.
  phase B (warmed):    run a battery of text-family queries first
          (tokenize/shingle/HOF shapes), then the same 1+min-of-2 —
          the driver bench's in-suite methodology.

Usage: python scripts/jit_band_probe.py   (idle machine, sf0.1)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from uofi_payroll_etl_main_demo_spark import queries as R
from uofi_payroll_etl_main_demo_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROWS = ["ext_repetition_stats", "ext_simhash_pairs"]
WARMERS = [
    "ext_doc_stats",
    "ext_language_id",
    "ext_ngram_jaccard",
    "ext_minhash_pairs",
    "ext_gopher_rules",
    "ext_dup_ngram_stats",
    "ext_tfidf_top_terms",
    "ext_unigram_surprisal",
    "ext_vocab_panel",
    "ext_pathological_text_stats",
]


def _min2(spark, fn) -> float:
    samples = []
    for _ in range(3):  # 1 warmup + 2 timed, keep min (bench law)
        t0 = time.perf_counter()
        fn(spark, SF).write.format("noop").mode("overwrite").save()
        samples.append(time.perf_counter() - t0)
        spark.catalog.clearCache()
    return round(min(samples[1:]), 3)


def main() -> None:
    spark = get_spark(
        app_name="jit-band-probe",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = R.queries()
    R.q_projection(spark, SF).limit(1).collect()

    cold = {name: _min2(spark, qs[name]) for name in ROWS}
    for name in WARMERS:
        qs[name](spark, SF).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
    warm = {name: _min2(spark, qs[name]) for name in ROWS}

    print(f"{'row':<24} {'cold_min2_s':>12} {'warm_min2_s':>12}")
    for name in ROWS:
        print(f"{name:<24} {cold[name]:>12.3f} {warm[name]:>12.3f}")


if __name__ == "__main__":
    main()
