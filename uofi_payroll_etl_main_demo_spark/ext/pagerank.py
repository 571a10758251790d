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
    checkpoint_every: int = 8,
) -> DataFrame:
    """Fixed-iteration integer PageRank over a directed edge list.

    Every node must have out-degree >= 1 (feed a symmetrized edge list
    for undirected graphs — dangling-node mass redistribution is out of
    scope). Returns (node, pr) with ``pr`` in micro-points; a fixed
    ``iterations`` count (not a convergence test) keeps the unrolled
    SQL oracle finite and the result engine-exact.

    ``checkpoint_every`` bounds lineage depth: sweeps between
    checkpoints stay LAZY, so a short run (the common case) compiles
    into ONE Spark job instead of paying the per-job scheduling floor
    once per sweep — measured 7.0 s → 2.0 s for 6 sweeps at bench
    scale. Long runs still truncate lineage periodically (same
    rationale as ``ext/clusters.py``).
    """
    # ONE distinct over the edge list, cached — deg, nodes, and the
    # per-sweep frame all read this cache instead of re-running the
    # distinct shuffle (it is consumed 3+ times; uncached, the setup
    # cost was 3× the six sweeps combined at bench scale)
    e = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .distinct()
        .persist()
    )
    deg = e.groupBy("s").agg(F.count(F.lit(1)).alias("outdeg"))
    # node set materialized eagerly; this also populates the e cache
    nodes = deg.select(F.col("s").alias("node")).localCheckpoint(eager=True)
    # static (src, dst, outdeg) frame: outdeg is O(nodes) rows, so it
    # BROADCASTS onto the cached edge list — no edge shuffle, ever
    ed = e.join(F.broadcast(deg), "s").persist()
    ranks = nodes.select("node", F.lit(SCALE).cast("bigint").alias("pr"))
    teleport = (100 - damping_pct) * SCALE // 100
    for it in range(1, iterations + 1):
        # ranks / contributions are O(nodes) rows — broadcast them into
        # the big cached edge frame so the loop body's only exchange is
        # the map-side-combined contribution aggregation; the edge list
        # itself is NEVER reshuffled after the initial persist
        contrib = ed.join(
            F.broadcast(ranks), ed["s"] == ranks["node"]
        ).select(F.col("d"), F.expr("pr div outdeg").alias("c"))
        inc = contrib.groupBy(F.col("d").alias("n2")).agg(
            F.sum("c").alias("inc")
        )
        ranks = nodes.join(
            F.broadcast(inc), nodes["node"] == inc["n2"], "left"
        ).select(
            "node",
            (
                F.lit(teleport)
                + F.expr(f"({damping_pct} * coalesce(inc, 0L)) div 100")
            )
            .cast("bigint")
            .alias("pr"),
        )
        if it % checkpoint_every == 0 and it < iterations:
            ranks = ranks.localCheckpoint(eager=True)
    ed.unpersist()
    return ranks
