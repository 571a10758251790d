"""Read Spark physical plans into a checkable report."""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The ``explain('formatted')`` text without printing to stdout."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


@dataclass
class PlanReport:
    """Digest of the physical plan's scale-relevant properties."""

    broadcast_joins: int = 0
    sort_merge_joins: int = 0
    nested_loop_joins: int = 0
    exchanges: int = 0
    scans: list[dict] = field(default_factory=list)  # {location, read_schema, pushed}

    def scan_for(self, table: str) -> dict | None:
        for s in self.scans:
            if table in s["location"]:
                return s
        return None


def inspect_plan(df: DataFrame) -> PlanReport:
    text = formatted_plan(df)
    report = PlanReport(
        broadcast_joins=text.count("BroadcastHashJoin"),
        sort_merge_joins=text.count("SortMergeJoin"),
        nested_loop_joins=text.count("BroadcastNestedLoopJoin"),
        # BroadcastExchange is dim movement (intended); count only
        # shuffle exchanges, the scale-relevant kind.
        exchanges=len(re.findall(r"\bExchange hashpartitioning|\(\d+\) Exchange\b", text)),
    )
    # Parse per-scan sections: Location / PushedFilters / ReadSchema.
    for m in re.finditer(
        r"Scan parquet.*?Location:.*?\[(?P<loc>[^\]]*)\].*?"
        r"(?:PushedFilters: \[(?P<pushed>[^\]]*)\].*?)?"
        r"ReadSchema: (?P<schema>\S+)",
        text,
        re.DOTALL,
    ):
        report.scans.append(
            {
                "location": m.group("loc"),
                "pushed": (m.group("pushed") or "").strip(),
                "read_schema": m.group("schema"),
            }
        )
    return report
