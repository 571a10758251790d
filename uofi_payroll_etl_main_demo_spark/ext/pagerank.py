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

SIZE-ADAPTIVE JOIN STRATEGY (same philosophy as ``ext/clusters.py``'s
driver/distributed split): the per-sweep (node, rank) frame is O(nodes).
Below ``broadcast_threshold`` nodes it broadcasts onto the persisted
edge frame — zero edge movement per sweep. Above it (billion-node
graphs, where a broadcast would have to fit the whole rank frame in
every executor) the sweep becomes a SHUFFLED HASH join: the edge frame
is hash-partitioned on src ONCE when it is persisted, so every sweep
shuffles only the O(nodes) rank frame while the O(edges) side never
moves again — and the ``shuffle_hash`` hint avoids re-sorting the edge
partitions every sweep (a sort-merge join would). Values are
bit-identical on both paths.

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

# Above this node count the per-sweep rank frame stops broadcasting and
# the sweep switches to a shuffled-hash join (see module docstring).
# 4M (node, rank) rows ≈ 64 MB serialized — the session's broadcast
# ceiling.
BROADCAST_NODE_THRESHOLD = 4_000_000


def _maybe_broadcast(df: DataFrame, small: bool) -> DataFrame:
    """Broadcast when the frame is known-small, else pin a shuffled
    hash join (build side = this frame) so the big streamed side is
    neither re-shuffled (it is already hash-partitioned on the key)
    nor re-sorted (as sort-merge would per sweep)."""
    return F.broadcast(df) if small else df.hint("shuffle_hash")


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 6,
    damping_pct: int = 85,
    checkpoint_every: int = 8,
    state_partitions: int | None = None,
    assume_distinct: bool = False,
    broadcast_threshold: int = BROADCAST_NODE_THRESHOLD,
    dangling: bool = False,
) -> DataFrame:
    """Fixed-iteration integer PageRank over a directed edge list.

    With ``dangling=False`` (the fast path) every node must have
    out-degree >= 1 (feed a symmetrized edge list for undirected
    graphs); nodes appearing only as destinations are not ranked. With
    ``dangling=True`` the node set is src ∪ dst and the rank mass of
    out-degree-0 nodes is redistributed uniformly each sweep — one
    driver SCALAR per sweep (the dangling mass sum), never a data
    collect: pr_i(v) = teleport + damping*(inc_i(v) + dm_{i} div n)
    div 100 with dm_i = Σ ranks of dangling nodes after sweep i-1.

    Returns (node, pr) with ``pr`` in micro-points; a fixed
    ``iterations`` count (not a convergence test) keeps the unrolled
    SQL oracle finite and the result engine-exact.

    ``broadcast_threshold`` is the size-adaptivity valve (module
    docstring); pass 0 to force the shuffled-hash path in tests.
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
        if dangling:
            nodes = (
                e.select(F.col("s").alias("node"))
                .unionByName(e.select(F.col("d").alias("node")))
                .distinct()
                .localCheckpoint(eager=True)
            )
        else:
            # node set materialized eagerly; also populates the e cache
            nodes = deg.select(F.col("s").alias("node")).localCheckpoint(
                eager=True
            )
        # the size probe: O(1) driver scalar off the checkpointed node
        # frame — decides broadcast vs shuffled-hash for EVERY join
        # against an O(nodes) frame below
        n_nodes = nodes.count()
        small = n_nodes <= broadcast_threshold
        # static (src, dst, outdeg) frame, persisted once. Small path:
        # deg broadcasts onto the cached edge list (no edge shuffle at
        # all). Big path: one edge shuffle onto hash(s) HERE, then the
        # persisted frame keeps that partitioning so the per-sweep
        # joins on s never move the edges again.
        ed = e.join(_maybe_broadcast(deg, small), "s").persist()
        teleport = (100 - damping_pct) * SCALE // 100
        if dangling:
            ranks = _pagerank_dangling(
                nodes, deg, ed, n_nodes, teleport, damping_pct,
                iterations, small,
            )
        else:
            ranks = _pagerank_no_dangling(
                nodes, ed, teleport, damping_pct, iterations,
                checkpoint_every, small,
            )
        ed.unpersist()
        e.unpersist()
    return ranks


def _pagerank_no_dangling(
    nodes: DataFrame,
    ed: DataFrame,
    teleport: int,
    damping_pct: int,
    iterations: int,
    checkpoint_every: int,
    small: bool,
) -> DataFrame:
    # pr_i(s) = teleport + (damping * inc_i(s)) div 100, with
    # inc_i(s)=0 for nodes nothing links to. Rather than
    # materializing that as a per-sweep (node, pr) frame — a second
    # join per sweep against `nodes` — fold the formula INTO the next
    # sweep's contribution join: every sweep is then exactly one join
    # onto the cached edge frame + one map-side-combined aggregation,
    # and sweep 1 (uniform pr = SCALE) needs no join at all. Values
    # are bit-identical.
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
                _maybe_broadcast(inc, small), ed["s"] == inc["n2"], "left"
            ).select(
                F.col("d"), F.expr(f"{pr_expr} div outdeg").alias("c")
            )
    return (
        nodes.join(
            _maybe_broadcast(inc, small), nodes["node"] == inc["n2"], "left"
        )
        .select("node", F.expr(pr_expr).cast("bigint").alias("pr"))
        .localCheckpoint(eager=True)
    )


def _pagerank_dangling(
    nodes: DataFrame,
    deg: DataFrame,
    ed: DataFrame,
    n_nodes: int,
    teleport: int,
    damping_pct: int,
    iterations: int,
    small: bool,
) -> DataFrame:
    """Dangling-mass variant: materializes the (node, pr) frame each
    sweep (it is needed for the dangling-mass scalar anyway — the
    per-sweep eager checkpoint doubles as lineage truncation)."""
    dang = nodes.join(
        _maybe_broadcast(deg, small), nodes["node"] == deg["s"], "left_anti"
    ).localCheckpoint(eager=True)
    pr = nodes.select(
        "node", F.lit(SCALE).cast("bigint").alias("pr")
    ).localCheckpoint(eager=True)
    for _ in range(iterations):
        # dangling mass: ONE driver integer per sweep (exact — integer
        # sum), never a collect of the rank frame
        dm = (
            pr.join(_maybe_broadcast(dang, small), "node", "left_semi")
            .agg(F.sum("pr"))
            .first()[0]
        )
        share = (dm or 0) // n_nodes
        contrib = ed.join(
            _maybe_broadcast(pr.withColumnRenamed("node", "n0"), small),
            ed["s"] == F.col("n0"),
        ).select(F.col("d"), F.expr("pr div outdeg").alias("c"))
        inc = contrib.groupBy(F.col("d").alias("n2")).agg(
            F.sum("c").alias("inc")
        )
        pr = (
            nodes.join(
                _maybe_broadcast(inc, small),
                nodes["node"] == inc["n2"],
                "left",
            )
            .select(
                "node",
                F.expr(
                    f"(cast({teleport} as bigint)"
                    f" + ({damping_pct} * (coalesce(inc, 0L)"
                    f" + cast({share} as bigint))) div 100)"
                ).alias("pr"),
            )
            .localCheckpoint(eager=True)
        )
    dang.unpersist()
    return pr
