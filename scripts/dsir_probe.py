"""DSIR selector scale probe: cost must track TOKENS, nothing else.

The selector's structure (one token explode → one B-row model
aggregate → broadcast join back) has no pair graph and no corpus-sized
shuffle state, so wall time should grow ~linearly in token volume and
the model table stays 1024 rows at every factor. Replication keeps
each original document's text verbatim (ids offset), which also
checks a structural invariant: uniform replication multiplies every
bucket count by N, leaving the MODELS' probability ratios — and
therefore every original document's weight — unchanged up to the
Laplace +1 term (reported as max |Δmilli-bits| vs factor 1).

Usage: python scripts/dsir_probe.py [FACTOR ...]   (default 1 8 32)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from uofi_payroll_etl_main_demo_spark.ext.dsir import dsir_weights
from uofi_payroll_etl_main_demo_spark.session import get_spark

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 8, 32]
    spark = get_spark(app_name="dsir_probe")
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet(os.path.join(BASE, "documents.parquet"))
    n0 = base.count()
    ref = None
    out = []
    for factor in factors:
        docs = base
        if factor > 1:
            reps = spark.range(factor).select(F.col("id").alias("__rep"))
            docs = base.crossJoin(reps).select(
                (F.col("doc_id") + F.col("__rep") * (n0 * 10)).alias(
                    "doc_id"
                ),
                "text",
                "lang",
                "source",
            )
        docs = docs.persist()
        n = docs.count()
        w = dsir_weights(docs, F.col("lang") == "en")
        w.write.format("noop").mode("overwrite").save()  # warm
        samples = []
        for _ in range(2):
            t0 = time.time()
            w.write.format("noop").mode("overwrite").save()
            samples.append(time.time() - t0)
        wall = round(min(samples), 2)
        got = {
            r["doc_id"]: r["dsir_milli_bits"]
            for r in w.filter(F.col("doc_id") < n0).collect()
        }
        if ref is None:
            ref = got
            drift = 0.0
        else:
            drift = max(
                abs(got[d] - ref[d]) for d in ref if d in got
            )
        row = {
            "factor": factor,
            "docs": n,
            "wall_s": wall,
            "max_weight_drift_milli_bits": round(drift, 3),
        }
        out.append(row)
        print(json.dumps(row), flush=True)
        docs.unpersist()
    print(json.dumps({"probe": "dsir_scale", "rows": out}))


if __name__ == "__main__":
    main()
