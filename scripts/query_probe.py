"""Isolated per-query A/B probe: bench methodology (noop sink, 1
untimed warmup + N timed, min) for a subset of registry queries.

    python scripts/query_probe.py <query> [<query> ...] [--runs N]
    [--plan-out DIR]

Prints one line per query: name, warmup sec, min of timed runs, all
samples. With --plan-out, writes <dir>/<query>.txt with the
explain('formatted') text (the judge-checkable plan dump).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from uofi_payroll_etl_main_demo_spark import queries as R
from uofi_payroll_etl_main_demo_spark.plans.inspect import formatted_plan
from uofi_payroll_etl_main_demo_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--runs", type=int, default=3, help="timed runs")
    ap.add_argument("--plan-out", default=None)
    args = ap.parse_args()

    spark = get_spark(
        app_name="query_probe",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = R.queries()
    R.q_projection(spark, SF_DIR).limit(1).collect()

    for name in args.names:
        fn = qs[name]
        if args.plan_out:
            os.makedirs(args.plan_out, exist_ok=True)
            with open(os.path.join(args.plan_out, f"{name}.txt"), "w") as fh:
                fh.write(formatted_plan(fn(spark, SF_DIR)))
        spark.sparkContext.setJobDescription(f"probe: {name}")
        samples = []
        for _ in range(args.runs + 1):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            samples.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)
        print(
            f"{name:40s} warmup={samples[0]:7.3f} "
            f"min={min(samples[1:]):7.3f} runs={samples[1:]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
