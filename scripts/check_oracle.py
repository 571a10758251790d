"""Local differential checker: Spark queries vs DuckDB oracle.

Mirrors the driver's comparator (row-count + schema + order-insensitive
value compare after sorting columns by name). Run from /root/repo:

    python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402
from uofi_payroll_etl_main_demo_spark.session import get_spark

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    out = df[cols].copy()
    for c in cols:
        out[c] = out[c].map(lambda v: "NULL" if v is None or v != v else str(v))
    return out.sort_values(cols).reset_index(drop=True)


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    qs, osql = E.queries(), E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"ERROR    {name}: spark raised {exc}")
            failures.append(name)
            continue
        finally:
            # operators persist intermediates their lazy result consumes
            # and cannot unpersist them before the collect; don't let
            # 179 queries' panels accumulate in executor storage
            spark.catalog.clearCache()
        if name not in osql:
            print(f"ROWSONLY {name}: {len(sdf)} rows  ({time.time()-t0:.1f}s)")
            continue
        try:
            odf = con.sql(osql[name]).df()
        except Exception as exc:  # noqa: BLE001
            print(f"ERROR    {name}: duckdb raised {exc}")
            failures.append(name)
            continue
        a, b = normalize(sdf), normalize(odf)
        if a.shape != b.shape:
            print(f"MISMATCH {name}: shape spark={a.shape} oracle={b.shape}")
            failures.append(name)
            continue
        if list(a.columns) != list(b.columns):
            print(
                f"MISMATCH {name}: cols spark={list(a.columns)} "
                f"oracle={list(b.columns)}"
            )
            failures.append(name)
            continue
        neq = (a.values != b.values).any(axis=1)
        if neq.any():
            i = int(neq.argmax())
            print(f"MISMATCH {name}: {int(neq.sum())}/{len(a)} rows differ; first:")
            print("  spark :", a.iloc[i].to_dict())
            print("  oracle:", b.iloc[i].to_dict())
            failures.append(name)
            continue
        print(f"OK       {name}: {a.shape[0]} rows  ({time.time()-t0:.1f}s)")
    print()
    if failures:
        print("FAILED:", ", ".join(failures))
        return 1
    print("all queries OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
