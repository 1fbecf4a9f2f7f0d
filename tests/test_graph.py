"""PageRank gates: exact numpy power-iteration parity (same update, same
dangling correction), mass conservation, convergence, and known-value
checks on a hand-solvable graph."""

from __future__ import annotations

import numpy as np
import pytest

from market_data_mining_project_spark.operators.graph import pagerank


def _numpy_pagerank(edges, damping, iterations):
    """Reference: the SAME per-iteration update as operators/graph.py on a
    dense matrix — not a different convergence criterion."""
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    w = np.zeros((n, n))
    for s, d, wt in edges:
        w[idx[s], idx[d]] += wt
    out_w = w.sum(axis=1)
    r = np.full(n, 1.0 / n)
    base = (1.0 - damping) / n
    for _ in range(iterations):
        dangling = r[out_w == 0].sum()
        contrib = np.zeros(n)
        for i in range(n):
            if out_w[i] > 0:
                contrib += r[i] * w[i] / out_w[i]
        r = base + damping * (contrib + dangling / n)
    return dict(zip(nodes, r))


def test_pagerank_matches_numpy_same_update(spark):
    edges = [
        (1, 2, 3.0), (2, 1, 1.0), (2, 3, 2.0), (3, 1, 5.0),
        (4, 1, 1.0),  # 5 is dangling (appears only as dst)
        (1, 5, 1.0),
    ]
    df = spark.createDataFrame(edges, "src long, dst long, w double")
    got = {
        r.node: (r.rank, r.n_iterations)
        for r in pagerank(
            df, weight="w", max_iterations=12, tol=0.0, small_graph_nodes=0
        ).collect()  # force the DISTRIBUTED path — the local one has its own test
    }
    iters = next(iter(got.values()))[1]
    assert iters == 12  # tol=0 forces the full run — parity at exact count
    want = _numpy_pagerank(edges, 0.85, 12)
    assert set(got) == set(want)
    for node, (rank, _) in got.items():
        assert rank == pytest.approx(want[node], abs=1e-12), node
    assert sum(r for r, _ in got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_converges_and_conserves_mass(spark, sf_dir):
    from market_data_mining_project_spark.plans.analytics_domain import (
        q_brand_centrality,
    )

    rows = q_brand_centrality(spark, sf_dir).collect()
    assert rows
    assert sum(r.rank for r in rows) == pytest.approx(1.0, abs=1e-5)
    assert rows[0].n_iterations < 30  # converged before the cap
    # co-occurrence graph is symmetric and dense here: no rank collapses
    assert min(r.rank for r in rows) > 0


def test_pagerank_uniform_on_symmetric_cycle(spark):
    """A symmetric unweighted cycle is vertex-transitive — every node must
    get exactly rank 1/N."""
    n = 5
    edges = [(i, (i + 1) % n) for i in range(n)] + [((i + 1) % n, i) for i in range(n)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = pagerank(df, max_iterations=20).collect()
    for r in got:
        assert r.rank == pytest.approx(1.0 / n, abs=1e-9)


def test_pagerank_local_path_equals_distributed(spark):
    """The small-graph driver solve and the distributed join loop run the
    same update — identical ranks to float tolerance at a fixed iteration
    count."""
    edges = [(1, 2, 2.0), (2, 3, 1.0), (3, 1, 4.0), (1, 3, 1.0), (4, 2, 1.0)]
    df = spark.createDataFrame(edges, "src long, dst long, w double")
    local = {
        r.node: r.rank
        for r in pagerank(df, weight="w", max_iterations=10, tol=0.0).collect()
    }
    dist = {
        r.node: r.rank
        for r in pagerank(
            df, weight="w", max_iterations=10, tol=0.0, small_graph_nodes=0
        ).collect()
    }
    assert set(local) == set(dist)
    for node in local:
        assert local[node] == pytest.approx(dist[node], abs=1e-12), node


def test_pagerank_rejects_bad_damping(spark):
    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError):
        pagerank(df, damping=1.0)


def test_pagerank_rejects_nonpositive_weights(spark):
    """Zero/negative/NULL weights corrupt the two paths differently (NULL
    transition probs drop mass; 0/0 poisons the local solve) — both must
    refuse loudly instead."""
    for rows in ([(1, 2, 0.0)], [(1, 2, -1.0)], [(1, 2, None)]):
        df = spark.createDataFrame(rows, "src long, dst long, w double")
        with pytest.raises(ValueError, match="strictly positive"):
            pagerank(df, weight="w")
        with pytest.raises(ValueError, match="strictly positive"):
            pagerank(df, weight="w", small_graph_nodes=0)


def test_pagerank_check_every_overshoot_bounded(spark):
    """Distributed-loop economics: the convergence test runs only every
    check_every-th iteration, so a run stops at the first multiple of
    check_every at/after true convergence (≤ check_every−1 overshoot) —
    and check_every=1 reproduces the per-iteration stop. Ranks at both
    settings agree (extra iterations past convergence move ranks < tol)."""
    n = 5
    edges = [(i, (i + 1) % n) for i in range(n)] + [
        ((i + 1) % n, i) for i in range(n)
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    every = {
        r.node: (r.rank, r.n_iterations)
        for r in pagerank(
            df, max_iterations=30, small_graph_nodes=0, check_every=1
        ).collect()
    }
    batched = {
        r.node: (r.rank, r.n_iterations)
        for r in pagerank(
            df, max_iterations=30, small_graph_nodes=0, check_every=5
        ).collect()
    }
    it1 = next(iter(every.values()))[1]
    it5 = next(iter(batched.values()))[1]
    assert it5 % 5 == 0 or it5 == 30
    assert it1 <= it5 < it1 + 5, (it1, it5)
    for node in every:
        assert every[node][0] == pytest.approx(batched[node][0], abs=1e-7)


def test_pagerank_node_gate_precedes_collect(spark):
    """Few edges but too many nodes for the local path: the reordered gate
    must route to the distributed loop (node count decided BEFORE any
    collect) and still produce a rank distribution."""
    edges = [(i, i + 1) for i in range(20)]
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = pagerank(
        df, max_iterations=10, small_graph_nodes=5, small_graph_edges=1000
    ).collect()
    assert len(rows) == 21
    assert sum(r.rank for r in rows) == pytest.approx(1.0, abs=1e-6)


def test_pagerank_rejects_bad_check_every_on_both_paths(spark):
    """check_every is validated up front — the driver-local path must
    reject the same arguments the distributed path would, before any
    Spark job runs."""
    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="check_every"):
        pagerank(df, check_every=0)  # small graph -> local path
    with pytest.raises(ValueError, match="check_every"):
        pagerank(df, check_every=0, small_graph_nodes=0)
