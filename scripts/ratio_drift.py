"""Per-row ratio drift across a scale decade (VERDICT r10 #1).

Loads the engine bench lines and DuckDB twin sweeps at two scale
factors and prints a markdown drift table: per-row spark/duckdb ratio
at each sf, the ratio's growth across the decade, and a flag for any
row whose ratio grows more than DRIFT_FLAG (1.5x) — the verdict's
"explain or fix" threshold.

Usage:
  python scripts/ratio_drift.py BENCH_A.json DUCK_A.json \
                                BENCH_B.json DUCK_B.json
(A = smaller sf, B = larger sf)
"""

from __future__ import annotations

import json
import sys

DRIFT_FLAG = 1.5


def load(path: str) -> dict:
    with open(path) as fh:
        return json.loads(fh.readline())


def main() -> None:
    ba, da, bb, db = (load(p) for p in sys.argv[1:5])
    qa, xa = ba["queries"], da["queries"]
    qb, xb = bb["queries"], db["queries"]
    closed = set(ba.get("closed_form_oracle") or [])
    rows = []
    dnf = []
    for name in qa:
        if name not in qb or name not in xa or name not in xb:
            continue
        if xa[name] < 0 or xb[name] < 0:
            # negative twin timing = DuckDB interrupted at the budget
            # (DNF) — the engine WON that row outright; report apart,
            # exclude from ratio sums (a lower bound would understate
            # the win)
            dnf.append((name, qa[name], xa[name], qb[name], xb[name]))
            continue
        ra = qa[name] / max(xa[name], 1e-9)
        rb = qb[name] / max(xb[name], 1e-9)
        rows.append((name, qa[name], xa[name], ra, qb[name], xb[name], rb,
                     rb / max(ra, 1e-9)))
    print(f"| query | sf{ba['sf']} spark/duck (ratio) | "
          f"sf{bb['sf']} spark/duck (ratio) | ratio drift | flag |")
    print("|---|---|---|---|---|")
    rows.sort(key=lambda r: -r[7])
    for name, sa, xa_, sb, xb_ in dnf:
        fmt = lambda v: f"DNF@{-v:.0f}s" if v < 0 else f"{v:.2f}"
        print(f"| {name} | {sa:.2f}/{fmt(xa_)} | {sb:.2f}/{fmt(xb_)} "
              f"| — | **engine wins (twin DNF)** |")

    flagged = 0
    for name, sa, xa_, ra, sb, xb_, rb, drift in rows:
        flag = ""
        if drift > DRIFT_FLAG and rb > 1.0 and sb >= 1.0:
            flag = "**DRIFT**"
            flagged += 1
        cf = " (cf)" if name in closed else ""
        print(f"| {name}{cf} | {sa:.2f}/{xa_:.2f} ({ra:.2f}x) "
              f"| {sb:.2f}/{xb_:.2f} ({rb:.2f}x) | {drift:.2f}x | {flag} |")
    ta, tda = sum(qa[n] for n, *_ in
                  [(r[0],) for r in rows]), sum(xa[r[0]] for r in rows)
    tb, tdb = sum(qb[r[0]] for r in rows), sum(xb[r[0]] for r in rows)
    comp_rows = [r for r in rows if r[0] not in closed]
    ca, cda = sum(r[1] for r in comp_rows), sum(r[2] for r in comp_rows)
    cb, cdb = sum(r[4] for r in comp_rows), sum(r[5] for r in comp_rows)
    print()
    print(f"all-twins: sf{ba['sf']} {ta:.1f}/{tda:.1f} = {ta/tda:.2f}x ; "
          f"sf{bb['sf']} {tb:.1f}/{tdb:.1f} = {tb/tdb:.2f}x")
    print(f"comp-equiv ({len(comp_rows)} rows): "
          f"sf{ba['sf']} {ca:.1f}/{cda:.1f} = {ca/cda:.2f}x ; "
          f"sf{bb['sf']} {cb:.1f}/{cdb:.1f} = {cb/cdb:.2f}x")
    print(f"flagged (> {DRIFT_FLAG}x drift, >1x twin, >=1s): {flagged}")


if __name__ == "__main__":
    main()
