"""pipeline_rewrite_curation: Spark vs DuckDB across corpus scale.

The composite has been the bench's top local-ratio weak row two rounds
running (~6× vs its DuckDB twin at sf0.1). This probe answers whether
that ratio is a SCALE defect (a plan that degrades) or a small-corpus
constant (a fused single-process pipeline beating a staged distributed
one on ~2 MB of text): run the SAME query on BOTH engines over the
corpus replicated FACTOR× (scale_probe's near-identical variants, so
the dedup load grows with the corpus) and record the walls. A plan
shaped right for 100 TB shows Spark growing sub-linearly / tracking
output while the single-process twin grows at least linearly — the
ratio collapsing toward and past 1 as the data grows is the negative
result's proof ("the floors are the whole story").

Usage:
    python scripts/rewrite_ratio_probe.py [FACTOR ...]   # default 1 16 64
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from uofi_payroll_etl_main_demo_spark import queries as Q
from uofi_payroll_etl_main_demo_spark.session import get_spark
from scripts.scale_probe import build_corpus


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 16, 64]
    spark = get_spark(app_name="rewrite_ratio_probe")
    spark.sparkContext.setLogLevel("ERROR")
    sql = Q._sql_pipeline_rewrite_curation()
    out = []
    for factor in factors:
        sf_dir = build_corpus(spark, factor)
        # warm: footer caches + JIT on both engines, untimed
        Q.q_pipeline_rewrite_curation(spark, sf_dir).limit(1).collect()
        t0 = time.perf_counter()
        n_rows = Q.q_pipeline_rewrite_curation(spark, sf_dir).count()
        spark_s = round(time.perf_counter() - t0, 2)
        spark.catalog.clearCache()
        con = duckdb.connect()
        # build_corpus writes Spark parquet DIRECTORIES; glob the parts
        con.sql(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
        )
        t0 = time.perf_counter()
        duck_rows = len(con.sql(sql).fetchall())
        duck_s = round(time.perf_counter() - t0, 2)
        con.close()
        rec = {
            "factor": factor,
            "spark_s": spark_s,
            "duckdb_s": duck_s,
            "ratio": round(spark_s / max(duck_s, 1e-9), 2),
            "rows": n_rows,
            "rows_match": n_rows == duck_rows,
        }
        out.append(rec)
        print(json.dumps(rec), flush=True)
    print(json.dumps({"probe": "rewrite_ratio", "points": out}))


if __name__ == "__main__":
    main()
