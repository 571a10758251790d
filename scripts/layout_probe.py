"""Z-order layout probe: does the Morton layout actually buy scans?

Replicates lineitem FACTOR×, writes the same rows twice — natural
(insertion) order vs z-ordered by (l_partkey, l_suppkey) — then runs
an identical 2-dimensional range-filter aggregate on both and reports
(a) wall time, (b) the fraction of FILES whose footer min/max
intersects the predicate box, i.e. the planner's can't-skip set.
Natural order leaves every file spanning the whole domain (nothing
skippable); the z-order layout bounds both dimensions per file, so
selectivity translates into skipped I/O. At 100 TB this is the
difference between touching ~every file and touching O(selectivity).

Usage:
    python scripts/layout_probe.py [FACTOR] [files_per_layout]

Layouts are cached under /tmp/layout_probe_<factor>x.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from uofi_payroll_etl_main_demo_spark.ext.layout import (
    parquet_zone_maps,
    zorder_layout,
)
from uofi_payroll_etl_main_demo_spark.session import get_spark

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def build(spark, factor: int, files: int) -> tuple[str, str, int, int]:
    root = f"/tmp/layout_probe_{factor}x"
    nat, zed = f"{root}/natural", f"{root}/zorder"
    li = spark.read.parquet(f"{BASE}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice"
    )
    pmax = li.selectExpr("max(l_partkey)").first()[0]
    smax = li.selectExpr("max(l_suppkey)").first()[0]
    if not os.path.exists(f"{root}/_done"):
        reps = spark.range(factor).select(F.col("id").alias("rep"))
        big = li.crossJoin(F.broadcast(reps)).select(
            (F.col("l_orderkey") * factor + F.col("rep")).alias("l_orderkey"),
            "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice",
        )
        # natural = whatever order the shuffle delivers (round-robin),
        # the layout a pipeline writes when nobody thinks about it
        big.repartition(files).write.mode("overwrite").parquet(nat)
        zorder_layout(
            spark.read.parquet(nat),
            [("l_partkey", 1, int(pmax)), ("l_suppkey", 1, int(smax))],
            bits=16,
            num_partitions=files,
        ).write.mode("overwrite").parquet(zed)
        open(f"{root}/_done", "w").close()
    return nat, zed, int(pmax), int(smax)


def cant_skip_fraction(path: str, box: dict) -> float:
    maps = [
        m
        for m in parquet_zone_maps(path, ["l_partkey", "l_suppkey"])
        if m["num_rows"]
    ]
    if not maps:
        raise ValueError(f"no non-empty parquet files under {path}")
    hit = 0
    for m in maps:
        inter = all(
            m[f"{c}_min"] is not None
            and m[f"{c}_max"] >= lo
            and m[f"{c}_min"] <= hi
            for c, (lo, hi) in box.items()
        )
        hit += inter
    return round(hit / len(maps), 3)


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    files = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    spark = get_spark(app_name=f"layout-probe-{factor}x")
    spark.sparkContext.setLogLevel("ERROR")
    nat, zed, pmax, smax = build(spark, factor, files)

    # a ~ (1/16)^2 box in the middle of both domains
    pbox = (pmax // 2, pmax // 2 + max(pmax // 16, 1))
    sbox = (smax // 2, smax // 2 + max(smax // 16, 1))
    box = {"l_partkey": pbox, "l_suppkey": sbox}
    pred = (
        (F.col("l_partkey").between(*pbox))
        & (F.col("l_suppkey").between(*sbox))
    )

    for name, path in (("natural", nat), ("zorder", zed)):
        # footer-level prunability (what a planner can skip)
        frac = cant_skip_fraction(path, box)
        # measured scan: count + sum under the 2-D predicate
        for _warm in range(2):
            t0 = time.perf_counter()
            row = (
                spark.read.parquet(path)
                .filter(pred)
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum("l_quantity").alias("q"),
                )
                .first()
            )
            dt = round(time.perf_counter() - t0, 3)
        print(json.dumps({
            "layout": name, "factor": factor, "files": files,
            "cant_skip_file_fraction": frac,
            "filtered_rows": row["n"], "scan_sec": dt,
        }))


if __name__ == "__main__":
    main()
