"""Connected components / dedup clusters (ext/clusters.py)."""

import pytest
from pyspark.sql import functions as F

from uofi_payroll_etl_main_demo_spark.ext.clusters import (
    connected_components,
    dedup_survivors,
)


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "id_a bigint, id_b bigint")


def test_chain_collapses_to_min_id(spark):
    # a 6-node path: diameter forces multiple propagation sweeps
    pairs = _pairs(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)])
    got = {
        r["id"]: r["comp"] for r in connected_components(pairs).collect()
    }
    assert got == {i: 1 for i in range(1, 7)}


def test_separate_components_stay_separate(spark):
    pairs = _pairs(spark, [(1, 2), (2, 3), (10, 11), (20, 21), (21, 20)])
    comp = {
        r["id"]: r["comp"] for r in connected_components(pairs).collect()
    }
    assert comp[1] == comp[2] == comp[3] == 1
    assert comp[10] == comp[11] == 10
    assert comp[20] == comp[21] == 20


def test_long_chain_converges_logarithmically(spark):
    """Pointer jumping must resolve a 250-node path well inside the
    default sweep budget (plain propagation would need 250 sweeps).
    driver_threshold=0 forces the distributed path under test."""
    pairs = _pairs(spark, [(i, i + 1) for i in range(1, 250)])
    comp = {
        r["id"]: r["comp"]
        for r in connected_components(pairs, driver_threshold=0).collect()
    }
    assert set(comp.values()) == {1} and len(comp) == 250


def test_max_iter_guard(spark):
    pairs = _pairs(spark, [(i, i + 1) for i in range(1, 12)])
    with pytest.raises(RuntimeError, match="no convergence"):
        connected_components(pairs, max_iter=1, driver_threshold=0)


def test_cc_driver_and_distributed_paths_agree(spark):
    """The size-adaptive driver union-find shortcut must be
    bit-identical to the distributed label propagation on the same
    graph (including isolated edges and chains)."""
    edges = [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (5, 5)]
    pairs = _pairs(spark, [(a, b) for a, b in edges if a != b])
    via_driver = {
        r["id"]: r["comp"] for r in connected_components(pairs).collect()
    }
    via_dist = {
        r["id"]: r["comp"]
        for r in connected_components(pairs, driver_threshold=0).collect()
    }
    assert via_driver == via_dist and len(via_driver) == 9


def test_cc_star_keeps_self_loop_only_nodes(spark):
    """A node appearing ONLY in self-loop pairs must survive every CC
    engine with label (x, x) — star contraction drops self-loops
    before its first round, so it must restore such nodes from the
    input's node set (review finding: the three paths must return the
    same ROW SET, not just the same labels on shared rows)."""
    from uofi_payroll_etl_main_demo_spark.ext.clusters import (
        connected_components,
        connected_components_star,
    )

    pairs = _pairs(spark, [(1, 2), (2, 3), (7, 7)])
    want = {1: 1, 2: 1, 3: 1, 7: 7}
    got_star = {
        r["id"]: r["comp"] for r in connected_components_star(pairs).collect()
    }
    got_uf = {
        r["id"]: r["comp"] for r in connected_components(pairs).collect()
    }
    got_lp = {
        r["id"]: r["comp"]
        for r in connected_components(
            pairs, driver_threshold=0
        ).collect()
    }
    assert got_star == want
    assert got_uf == want
    assert got_lp == want


def test_cc_density_routing_and_three_path_agreement(spark, monkeypatch):
    """Above driver_threshold, the density switch routes SPARSE graphs
    (avg degree ≤ star_max_degree) to star contraction and DENSE ones
    to label propagation — and all three engines return identical
    labels on the same graph (measured basis in BASELINE.md: star
    1.6–1.8× faster at degree 7–31, 1.6× slower at degree 140)."""
    import uofi_payroll_etl_main_demo_spark.ext.clusters as C

    # sparse: a 40-node path, avg degree < 2
    sparse = _pairs(spark, [(i, i + 1) for i in range(40)])
    # dense: two K9 cliques, avg degree 8
    dense_edges = [
        (g * 100 + a, g * 100 + b)
        for g in range(2)
        for a in range(9)
        for b in range(a + 1, 9)
    ]
    dense = _pairs(spark, dense_edges)

    calls = []
    real_star, real_lp = C._cc_star, C._cc_label_prop
    monkeypatch.setattr(
        C, "_cc_star", lambda *a, **k: calls.append("star") or real_star(*a, **k)
    )
    monkeypatch.setattr(
        C,
        "_cc_label_prop",
        lambda *a, **k: calls.append("lp") or real_lp(*a, **k),
    )
    got_sparse = {
        r["id"]: r["comp"]
        for r in C.connected_components(
            sparse, driver_threshold=1, star_max_degree=4
        ).collect()
    }
    assert calls == ["star"]
    got_dense = {
        r["id"]: r["comp"]
        for r in C.connected_components(
            dense, driver_threshold=1, star_max_degree=4
        ).collect()
    }
    assert calls == ["star", "lp"]
    # same labels from the driver union-find ground truth
    truth_sparse = {
        r["id"]: r["comp"] for r in C.connected_components(sparse).collect()
    }
    truth_dense = {
        r["id"]: r["comp"] for r in C.connected_components(dense).collect()
    }
    assert got_sparse == truth_sparse
    assert got_dense == truth_dense


def test_dedup_survivors_keeps_min_and_untouched(spark):
    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in range(1, 8)], "doc_id bigint, text string"
    )
    pairs = _pairs(spark, [(2, 3), (3, 4), (6, 7)])
    kept = sorted(
        r["doc_id"] for r in dedup_survivors(docs, pairs).collect()
    )
    # cluster {2,3,4} → keep 2; cluster {6,7} → keep 6; 1 and 5 untouched
    assert kept == [1, 2, 5, 6]


# ------------------- cluster-aware split / pagerank -----------------------


def test_cluster_aware_split_keeps_clusters_whole(spark):
    from uofi_payroll_etl_main_demo_spark.ext.splits import (
        cluster_aware_split,
    )

    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in range(1, 101)], "doc_id bigint, text string"
    )
    pairs = _pairs(spark, [(i, i + 1) for i in range(1, 50, 2)] + [(90, 95)])
    out = cluster_aware_split(docs, pairs, eval_pct=30).collect()
    assert len(out) == 100  # every doc assigned exactly once
    by_rep: dict[int, set[str]] = {}
    for r in out:
        by_rep.setdefault(r["cluster_rep"], set()).add(r["split"])
    # no cluster straddles the boundary
    assert all(len(s) == 1 for s in by_rep.values())
    # pair members share a rep (spot-check) and singletons are own rep
    rep = {r["doc_id"]: r["cluster_rep"] for r in out}
    assert rep[90] == rep[95] and rep[1] == rep[2]
    assert rep[60] == 60
    # both sides non-empty at eval_pct=30 on 100 docs
    splits = {r["split"] for r in out}
    assert splits == {"train", "eval"}


def test_cluster_aware_split_deterministic(spark):
    from uofi_payroll_etl_main_demo_spark.ext.splits import (
        cluster_aware_split,
    )

    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in range(1, 40)], "doc_id bigint, text string"
    )
    pairs = _pairs(spark, [(1, 2), (2, 3), (10, 11)])
    a = sorted(map(tuple, cluster_aware_split(docs, pairs).collect()))
    b = sorted(map(tuple, cluster_aware_split(docs, pairs).collect()))
    assert a == b


def test_pagerank_star_center_dominates(spark):
    from uofi_payroll_etl_main_demo_spark.ext.pagerank import SCALE, pagerank

    # undirected star: center 1 <-> leaves 2..9 (symmetrized edges)
    fwd = [(1, i) for i in range(2, 10)]
    edges = spark.createDataFrame(
        fwd + [(b, a) for a, b in fwd], "src bigint, dst bigint"
    )
    pr = {r["node"]: r["pr"] for r in pagerank(edges, iterations=6).collect()}
    leaves = [pr[i] for i in range(2, 10)]
    assert pr[1] > max(leaves) * 3  # hub concentrates mass
    assert len(set(leaves)) == 1  # symmetric leaves tie exactly
    # teleport floor and rough mass conservation (integer truncation
    # only ever loses mass)
    assert all(v >= 15 * SCALE // 100 for v in pr.values())
    assert sum(pr.values()) <= 9 * SCALE


def test_pagerank_deterministic_across_runs(spark):
    from uofi_payroll_etl_main_demo_spark.ext.pagerank import pagerank

    fwd = [(i, i % 7 + 1) for i in range(1, 8)] + [(3, 5), (5, 1)]
    edges = spark.createDataFrame(
        fwd + [(b, a) for a, b in fwd], "src bigint, dst bigint"
    )
    a = sorted(map(tuple, pagerank(edges, iterations=5).collect()))
    b = sorted(
        map(tuple, pagerank(edges.repartition(7), iterations=5).collect())
    )
    assert a == b  # partitioning-independent (integer sums are exact)


def test_pagerank_shuffle_path_matches_broadcast_path(spark):
    """Size-adaptivity parity: broadcast_threshold=0 forces the
    shuffled-hash sweep path; values must be bit-identical to the
    broadcast path (integer arithmetic is order-independent)."""
    from uofi_payroll_etl_main_demo_spark.ext.pagerank import pagerank

    fwd = [(i, (i * 3) % 11 + 1) for i in range(1, 12)] + [(2, 7), (7, 2)]
    edges = spark.createDataFrame(
        fwd + [(b, a) for a, b in fwd], "src bigint, dst bigint"
    )
    a = sorted(map(tuple, pagerank(edges, iterations=5).collect()))
    b = sorted(
        map(
            tuple,
            pagerank(edges, iterations=5, broadcast_threshold=0).collect(),
        )
    )
    assert a == b


def test_pagerank_shuffle_path_plan_has_no_broadcast(spark):
    """Above the node threshold the per-sweep join must NOT broadcast
    the O(nodes) rank frame: pin the shuffled-hash join shape of the
    sweep building block (_maybe_broadcast(small=False))."""
    from uofi_payroll_etl_main_demo_spark.ext.pagerank import (
        _maybe_broadcast,
    )
    from uofi_payroll_etl_main_demo_spark.session import iterative_conf

    ed = spark.createDataFrame(
        [(i, i + 1, 2) for i in range(50)], "s bigint, d bigint, outdeg bigint"
    )
    inc = spark.createDataFrame(
        [(i, i * 10) for i in range(50)], "n2 bigint, inc bigint"
    )
    with iterative_conf(spark):
        swept = ed.join(
            _maybe_broadcast(inc, small=False), ed["s"] == inc["n2"], "left"
        )
        plan = swept._sc._jvm.PythonSQLUtils.explainString(
            swept._jdf.queryExecution(), "formatted"
        )
    assert "BroadcastHashJoin" not in plan
    assert "ShuffledHashJoin" in plan
    # and the small path does broadcast
    swept_small = ed.join(
        _maybe_broadcast(inc, small=True), ed["s"] == inc["n2"], "left"
    )
    plan_small = swept_small._sc._jvm.PythonSQLUtils.explainString(
        swept_small._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastHashJoin" in plan_small


def test_pagerank_dangling_mass_redistribution(spark):
    """Directed star 1→{2..6}: leaves are dangling. With dangling=True
    their mass is redistributed (ranks exceed the teleport floor and
    total mass stays ≈ n*SCALE); node set includes dst-only nodes."""
    from uofi_payroll_etl_main_demo_spark.ext.pagerank import SCALE, pagerank

    edges = spark.createDataFrame(
        [(1, i) for i in range(2, 7)], "src bigint, dst bigint"
    )
    pr = {
        r["node"]: r["pr"]
        for r in pagerank(edges, iterations=6, dangling=True).collect()
    }
    assert set(pr) == {1, 2, 3, 4, 5, 6}  # dst-only nodes ranked
    teleport_floor = 15 * SCALE // 100
    # the hub receives only teleport + dangling share, but the SHARE
    # must lift it above the bare floor (mass actually redistributed)
    assert pr[1] > teleport_floor
    # truncation only loses mass; redistribution keeps the total near
    # n*SCALE instead of draining toward teleport-only
    total = sum(pr.values())
    assert 0.9 * 6 * SCALE < total <= 6 * SCALE
    leaves = [pr[i] for i in range(2, 7)]
    assert len(set(leaves)) == 1  # symmetric leaves tie exactly
    assert leaves[0] > pr[1]  # leaves get the hub's outbound mass too


def test_cc_and_survivors_empty_pair_graph(spark):
    """Empty near-dup graph: CC returns an empty labeling and
    dedup_survivors keeps the corpus untouched (the common case at
    strict thresholds — must not error or drop rows)."""
    from uofi_payroll_etl_main_demo_spark.ext.clusters import (
        connected_components,
        dedup_survivors,
    )

    pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(pairs).count() == 0
    docs = spark.createDataFrame([(i, f"d{i}") for i in range(5)],
                                 ["doc_id", "text"])
    kept = dedup_survivors(docs, pairs, id_col="doc_id")
    assert sorted(r["doc_id"] for r in kept.collect()) == [0, 1, 2, 3, 4]


def test_iterative_conf_restores_session_state(spark):
    """iterative_conf must leave the session exactly as found — a leak
    would silently run every later query with AQE off and a tiny
    shuffle width."""
    from uofi_payroll_etl_main_demo_spark.ext.clusters import (
        connected_components,
    )
    from uofi_payroll_etl_main_demo_spark.session import iterative_conf

    before = (
        spark.conf.get("spark.sql.adaptive.enabled"),
        spark.conf.get("spark.sql.shuffle.partitions"),
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    connected_components(pairs).collect()
    with iterative_conf(spark, 4):
        assert spark.conf.get("spark.sql.adaptive.enabled") == "false"
        assert spark.conf.get("spark.sql.shuffle.partitions") == "4"
    after = (
        spark.conf.get("spark.sql.adaptive.enabled"),
        spark.conf.get("spark.sql.shuffle.partitions"),
    )
    assert before == after


def test_split3_disjoint_exhaustive_and_cluster_safe(spark):
    from uofi_payroll_etl_main_demo_spark.ext.splits import (
        cluster_aware_split3,
    )

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(200)], ["doc_id", "text"]
    )
    pairs = spark.createDataFrame(
        [(i, i + 100) for i in range(50)], ["id_a", "id_b"]
    )
    out = cluster_aware_split3(docs, pairs, val_pct=10, test_pct=10)
    rows = out.collect()
    assert len(rows) == 200  # exhaustive, one row per doc
    by_id = {r["doc_id"]: r for r in rows}
    assert set(r["split"] for r in rows) <= {"train", "val", "test"}
    for i in range(50):  # cluster members agree
        assert by_id[i]["split"] == by_id[i + 100]["split"]
        assert by_id[i]["cluster_rep"] == by_id[i + 100]["cluster_rep"] == i
    splits = {s: sum(1 for r in rows if r["split"] == s)
              for s in ("train", "val", "test")}
    assert splits["train"] > splits["val"] > 0 and splits["test"] > 0
