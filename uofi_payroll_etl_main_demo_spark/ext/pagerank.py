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

from uofi_payroll_etl_main_demo_spark.session import iterative_conf

SCALE = 1_000_000_000  # 1.0 in micro-points


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 6,
    damping_pct: int = 85,
    checkpoint_every: int = 8,
    state_partitions: int | None = None,
    assume_distinct: bool = False,
) -> DataFrame:
    """Fixed-iteration integer PageRank over a directed edge list.

    Every node must have out-degree >= 1 (feed a symmetrized edge list
    for undirected graphs — dangling-node mass redistribution is out of
    scope). Returns (node, pr) with ``pr`` in micro-points; a fixed
    ``iterations`` count (not a convergence test) keeps the unrolled
    SQL oracle finite and the result engine-exact.

    ``checkpoint_every`` bounds lineage depth for long runs; short runs
    (the common case) stay lazy between the eager endpoints. The whole
    iteration executes under ``iterative_conf`` — AQE off, state-sized
    shuffle width — and the result is materialized inside that scope
    (measured 7.0 s → ~2.3 s for 6 sweeps at bench scale; see
    ``session.iterative_conf`` for why).
    """
    spark = edges.sparkSession
    with iterative_conf(spark, state_partitions):
        # ONE distinct over the edge list, cached — deg, nodes, and the
        # per-sweep frame all read this cache instead of re-running the
        # distinct shuffle (it is consumed 3+ times; uncached, the
        # setup cost was 3× the six sweeps combined at bench scale).
        # ``assume_distinct`` skips it when the caller guarantees
        # uniqueness (e.g. a symmetrized union of an already-distinct
        # oriented edge set) — one full edge shuffle saved.
        e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        if not assume_distinct:
            e = e.distinct()
        e = e.persist()
        deg = e.groupBy("s").agg(F.count(F.lit(1)).alias("outdeg"))
        # node set materialized eagerly; this also populates the e cache
        nodes = deg.select(F.col("s").alias("node")).localCheckpoint(
            eager=True
        )
        # static (src, dst, outdeg) frame: outdeg is O(nodes) rows, so
        # it BROADCASTS onto the cached edge list — no edge shuffle
        ed = e.join(F.broadcast(deg), "s").persist()
        teleport = (100 - damping_pct) * SCALE // 100
        # pr_i(s) = teleport + (damping * inc_i(s)) div 100, with
        # inc_i(s)=0 for nodes nothing links to. Rather than
        # materializing that as a per-sweep (node, pr) frame — a second
        # broadcast join per sweep against `nodes` — fold the formula
        # INTO the next sweep's contribution join: every sweep is then
        # exactly one broadcast left-join onto the cached edge frame +
        # one map-side-combined aggregation, and sweep 1 (uniform
        # pr = SCALE) needs no join at all. Values are bit-identical.
        pr_expr = (
            f"(cast({teleport} as bigint)"
            f" + ({damping_pct} * coalesce(inc, 0L)) div 100)"
        )
        contrib = ed.select(
            F.col("d"),
            F.expr(f"cast({SCALE} as bigint) div outdeg").alias("c"),
        )
        inc = None
        for it in range(1, iterations + 1):
            inc = contrib.groupBy(F.col("d").alias("n2")).agg(
                F.sum("c").alias("inc")
            )
            if it % checkpoint_every == 0 and it < iterations:
                inc = inc.localCheckpoint(eager=True)
            if it < iterations:
                contrib = ed.join(
                    F.broadcast(inc), ed["s"] == inc["n2"], "left"
                ).select(
                    F.col("d"), F.expr(f"{pr_expr} div outdeg").alias("c")
                )
        ranks = (
            nodes.join(F.broadcast(inc), nodes["node"] == inc["n2"], "left")
            .select("node", F.expr(pr_expr).cast("bigint").alias("pr"))
            .localCheckpoint(eager=True)
        )
        ed.unpersist()
        e.unpersist()
    return ranks
