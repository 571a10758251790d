"""PageRank in integer micro-points — graph centrality as corpus
quality signal, exactly reproducible across engines.

Web-corpus pipelines derive document quality weights from link-graph
centrality (the original PageRank use case: rank a crawl's pages so
filtering/sampling can prefer well-linked sources). This implements
power iteration in the canonical Spark shape:

- the edge list is the partitioned dataset; per iteration the plan is
  one equi-join (edges × ranks on src) + one groupBy-sum (contributions
  per dst) — both hash-partitioned on node id, no driver data;
- ``localCheckpoint`` after every sweep truncates lineage (same
  rationale as ``ext/clusters.py``: an unbounded iterative plan
  re-derives every previous sweep);
- edges joined with static out-degrees ONCE and persisted, so the loop
  body touches only the (node, rank) frame.

Determinism across engines is the interesting part: floating-point
PageRank is order-dependent (per-node sums of double contributions),
so tiny differences amplify over iterations and a value-exact oracle
is impossible. Ranks here are BIGINT MICRO-POINTS (1.0 == 1e9):
contribution = rank div outdeg (integer), damping = (85 * sum) div 100
(integer) — integer sums are associative-commutative-EXACT, so a fixed
iteration count yields bit-identical ranks in Spark and in a DuckDB
unrolled-CTE oracle. (Same trick as the BM25 integer scores in
``queries.py``.) Truncation loses < outdeg micro-points per node per
sweep — noise at 1e9 scale, and identically-truncated on both engines.

Reference scope: no analogue in ``uofi-payroll-etl-main_demo`` (an
eager single-output ETL); this is part of the LLM-corpus extension
surface alongside dedup clustering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000_000  # 1.0 in micro-points


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 6,
    damping_pct: int = 85,
) -> DataFrame:
    """Fixed-iteration integer PageRank over a directed edge list.

    Every node must have out-degree >= 1 (feed a symmetrized edge list
    for undirected graphs — dangling-node mass redistribution is out of
    scope). Returns (node, pr) with ``pr`` in micro-points; a fixed
    ``iterations`` count (not a convergence test) keeps the unrolled
    SQL oracle finite and the result engine-exact.
    """
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")).distinct()
    deg = e.groupBy("s").agg(F.count(F.lit(1)).alias("outdeg"))
    # static (src, dst, outdeg) frame: built once, reused every sweep
    ed = e.join(deg, "s").persist()
    nodes = deg.select(F.col("s").alias("node"))
    ranks = nodes.select(
        "node", F.lit(SCALE).cast("bigint").alias("pr")
    ).localCheckpoint(eager=True)
    teleport = (100 - damping_pct) * SCALE // 100
    for _ in range(iterations):
        contrib = ed.join(ranks, ed["s"] == ranks["node"]).select(
            F.col("d"), F.expr("pr div outdeg").alias("c")
        )
        inc = contrib.groupBy(F.col("d").alias("n2")).agg(
            F.sum("c").alias("inc")
        )
        ranks = (
            nodes.join(inc, nodes["node"] == inc["n2"], "left")
            .select(
                "node",
                (
                    F.lit(teleport)
                    + F.expr(
                        f"({damping_pct} * coalesce(inc, 0L)) div 100"
                    )
                )
                .cast("bigint")
                .alias("pr"),
            )
            .localCheckpoint(eager=True)
        )
    ed.unpersist()
    return ranks
