"""DuckDB-side baseline timings: run every oracle SQL at a scale dir.

BASELINE.md's operative target is "within 2× of DuckDB on the same
parquet at the same scale factor". This script produces the DuckDB
side: each ``oracle_sql()`` entry executed (fully materialized) against
the same files bench.py uses, printed as one JSON line mirroring
bench.py's shape.

Usage: python scripts/bench_duckdb.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as E

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    # --headline: sweep only bench.py's headline rows (the ratio
    # comparison set) instead of all twins. SPARK_GRAFT_DUCK_TIMEOUT
    # (seconds): interrupt any single query past the budget and record
    # it as -budget (a quadratic twin at a big sf can grind for hours;
    # a negative timing says "DNF at N s" without stalling the sweep).
    names = None
    if "--headline" in sys.argv:
        import bench as B

        names = set(B.HEADLINE)
    budget = float(os.environ.get("SPARK_GRAFT_DUCK_TIMEOUT", "0") or 0)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    timings: dict[str, float] = {}
    for name, sql in E.oracle_sql().items():
        if names is not None and name not in names:
            continue
        timer = None
        if budget:
            import threading

            timer = threading.Timer(budget, con.interrupt)
            timer.start()
        t0 = time.perf_counter()
        try:
            con.sql(sql).fetchall()
            timings[name] = round(time.perf_counter() - t0, 3)
        except duckdb.InterruptException:
            timings[name] = -budget
        finally:
            if timer is not None:
                timer.cancel()
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "duckdb_oracle_total_wall",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )


if __name__ == "__main__":
    main()
