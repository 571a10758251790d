"""Data-quality constraint checks (the Deequ/Great-Expectations shape).

`contracts.check_schema_contract` guards the SHAPE of a table; these
rules guard its CONTENT — the gate a training-data pipeline runs
before a corpus snapshot is blessed. Design for 100 TB: every
row-predicate rule and every uniqueness rule folds into ONE aggregate
scan (a rule must never cost a table pass). Referential rules fold
into the SAME scan when their dimension is broadcast-sized (gated on
Catalyst's plan-stats size, no probe job): each becomes a broadcast
LEFT join against the distinct dim keys — a per-row hash probe
feeding the shared aggregate, so the all-small-dims gate is ONE job
end to end (plan-pinned). Only a genuinely large dimension adds a
job, because its anti-join is irreducibly a distributed join. (A
literal ``IN <set>`` fold was measured and rejected: 150k keys pushed
the single-pass scan from ~1 s to ~85 s — giant in-sets fall off
codegen; the broadcast hash probe is the fast fold.)

Report: one row per rule — (rule, n_rows, n_violations, passed) —
returned as a DataFrame so the gate composes with the rest of the
engine (write it, join it, alert on it).
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "Rule",
    "not_null",
    "in_range",
    "matches",
    "satisfies",
    "unique",
    "foreign_key",
    "check_data_constraints",
]


class Rule(NamedTuple):
    name: str
    kind: str  # 'row' | 'unique' | 'fk'
    payload: object


def not_null(col: str) -> Rule:
    """Violated by NULL values of ``col``."""
    return Rule(f"not_null({col})", "row", F.col(col).isNotNull())


def in_range(col: str, lo, hi) -> Rule:
    """Violated outside ``[lo, hi]``; NULLs violate too (a bound check
    that silently passes missing data is not a bound check)."""
    return Rule(
        f"in_range({col}, {lo}, {hi})",
        "row",
        F.col(col).isNotNull() & F.col(col).between(F.lit(lo), F.lit(hi)),
    )


def matches(col: str, pattern: str) -> Rule:
    """Violated when ``col`` does not FULLY match ``pattern`` (or is
    NULL) — the pattern is wrapped ``^(?:...)$`` internally because
    ``rlike``/``regexp_matches`` are substring searches and a quality
    gate that passes partial matches is not a gate. Keep patterns
    engine-portable (no bare ``\\s`` — see the repo's regex-class
    rules) if the report feeds an oracle, and mirror the same wrap in
    the oracle SQL."""
    return Rule(
        f"matches({col}, {pattern})",
        "row",
        F.col(col).isNotNull() & F.col(col).rlike(f"^(?:{pattern})$"),
    )


def satisfies(name: str, predicate: Column) -> Rule:
    """Escape hatch: any boolean Column; rows where it is not TRUE
    (false or NULL) violate."""
    return Rule(name, "row", predicate)


def unique(*cols: str) -> Rule:
    """Violated by every row beyond the first of a duplicated key —
    ``n_violations = count(*) - count(DISTINCT key)``, computed inside
    the same single aggregate scan as the row rules. NULL-containing
    keys group by their null pattern (SQL DISTINCT semantics)."""
    return Rule(f"unique({', '.join(cols)})", "unique", tuple(cols))


def foreign_key(col: str, dim: DataFrame, dim_col: str) -> Rule:
    """Violated by non-NULL values of ``col`` absent from
    ``dim[dim_col]`` (NULL FKs are not violations — add
    :func:`not_null` if they should be). Folds into the shared
    one-pass scan as a broadcast hash probe when the dim is
    broadcast-sized; costs one anti-join otherwise (see
    :func:`check_data_constraints`)."""
    return Rule(f"foreign_key({col} -> {dim_col})", "fk", (col, dim, dim_col))


def _plan_size_bytes(df: DataFrame) -> "int | None":
    """Catalyst's own size estimate for a plan (the statistic Spark's
    broadcast decision reads) — no job, no probe; None when the JVM
    call fails so callers degrade to the conservative path."""
    try:
        return int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()  # type: ignore[attr-defined]
        )
    except Exception:
        return None


def check_data_constraints(
    df: DataFrame, rules, fk_broadcast_bytes: int = 10 << 20
) -> DataFrame:
    """Evaluate ``rules`` against ``df`` → one report row per rule:
    ``(rule, n_rows, n_violations, passed)``, in the rules' order
    nowhere guaranteed (sort the report). All row/unique rules share
    ONE aggregate pass over ``df``; an fk rule whose dimension's
    Catalyst size estimate is at most ``fk_broadcast_bytes`` (default
    10 MB, Spark's own broadcast default) folds into that same pass as
    a broadcast hash probe; larger dims add one anti-join each.
    """
    rules = list(rules)
    if not rules:
        raise ValueError("need at least one rule")
    names = [r.name for r in rules]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate rule names: {sorted(names)}")

    aggs = [F.count(F.lit(1)).alias("__n")]
    fold = []
    probe = df
    join_fks = []
    for idx, r in enumerate(rules):
        if r.kind == "row":
            aggs.append(
                F.count_if(~F.coalesce(r.payload, F.lit(False))).alias(
                    f"__v{idx}"
                )
            )
            fold.append(idx)
        elif r.kind == "unique":
            key = F.struct(*[F.col(c) for c in r.payload])
            aggs.append(
                (F.count(F.lit(1)) - F.count_distinct(key)).alias(f"__v{idx}")
            )
            fold.append(idx)
        elif r.kind == "fk":
            col, dim, dim_col = r.payload
            size = _plan_size_bytes(dim)
            if size is None or size > fk_broadcast_bytes:
                join_fks.append(r)
                continue
            # broadcast-probe fold: LEFT join the DISTINCT non-null dim
            # keys (distinct — a duplicated key would fan out df's rows
            # and corrupt every folded count) and count rows whose
            # non-null fk found no key. Same semantics as the
            # anti-join: NULL fks never violate, NULL dim keys
            # whitelist nothing.
            keys = (
                dim.select(F.col(dim_col).alias(f"__fkk{idx}"))
                .where(F.col(dim_col).isNotNull())
                .distinct()
            )
            probe = probe.join(
                F.broadcast(keys),
                F.col(col) == F.col(f"__fkk{idx}"),
                "left",
            )
            aggs.append(
                F.count_if(
                    F.col(col).isNotNull() & F.col(f"__fkk{idx}").isNull()
                ).alias(f"__v{idx}")
            )
            fold.append(idx)
        else:
            raise ValueError(f"unknown rule kind: {r.kind!r}")

    wide = probe.agg(*aggs)
    fk_rules = join_fks
    if fk_rules:
        # the shared aggregate materializes ONCE driver-side (1 row —
        # the A5 aggregate→driver precedent): its __n supplies every
        # fk row's total WITHOUT a second table pass, attaching a
        # 1-row frame would be the BroadcastNestedLoopJoin the plan
        # lint bans, and the fk-only case (fold empty) needs no
        # explode at all
        wrow = wide.first()
        n_total = int(wrow["__n"])
        report = df.sparkSession.createDataFrame(
            [
                (rules[idx].name, n_total, int(wrow[f"__v{idx}"]))
                for idx in fold
            ],
            "rule string, n_rows long, n_violations long",
        )
    else:
        # no fk rules → fold is non-empty (rules is non-empty and
        # every kind folds) and the report stays fully lazy
        per_rule = F.array(
            *[
                F.struct(
                    F.lit(rules[idx].name).alias("rule"),
                    F.col("__n").cast("long").alias("n_rows"),
                    F.col(f"__v{idx}").cast("long").alias("n_violations"),
                )
                for idx in fold
            ]
        )
        report = wide.select(F.explode(per_rule).alias("p")).select("p.*")

    for r in fk_rules:
        col, dim, dim_col = r.payload
        viol = (
            df.select(F.col(col).alias("__k"))
            .filter(F.col("__k").isNotNull())
            .join(
                dim.select(F.col(dim_col).alias("__k")).distinct(),
                "__k",
                "left_anti",
            )
            .agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
        )
        report = report.unionByName(
            viol.select(
                F.lit(r.name).alias("rule"),
                F.lit(n_total).cast("long").alias("n_rows"),
                "n_violations",
            )
        )

    return report.withColumn("passed", F.col("n_violations") == 0)
