"""Iterative graph analytics over DataFrame edge lists.

Not in the reference (its graph-adjacent output is the pairwise
co-occurrence table, ``Website/market/views.py:199-235``) — added as an
engine capability alongside the pointer-doubled connected components in
``dedup.dup_clusters``: the OTHER canonical iterative distributed graph
computation, weighted PageRank, expressed as per-iteration DataFrame
joins with explicit lineage control.

Scale shape: the rank frame is |nodes| rows; each iteration is one
co-partitioned join of ranks onto the (larger) edge list, one hash
aggregate back to nodes, and a broadcast of two scalars (dangling mass,
convergence delta). Lineage is cut every iteration with
``localCheckpoint`` — the ``dup_clusters`` idiom — so 20 iterations
don't build a 20-deep plan. Hot destination nodes are ordinary
aggregation skew (AQE/salting territory), never a cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..session import truncate_lineage


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    damping: float = 0.85,
    max_iterations: int = 30,
    tol: float = 1e-8,
    small_graph_nodes: int = 10_000,
    small_graph_edges: int = 1_000_000,
    check_every: int = 5,
) -> DataFrame:
    """Weighted PageRank over a directed edge list.

    ``rank(v) = (1−d)/N + d·(Σ_{u→v} rank(u)·w(u→v)/out_w(u) + dangling/N)``
    where ``out_w(u)`` is u's total outgoing weight and ``dangling`` is the
    rank mass sitting on nodes with no outgoing edges (redistributed
    uniformly, the standard correction — without it rank mass leaks and
    the result is not a distribution). Unweighted graphs pass
    ``weight=None`` (every edge weighs 1).

    Iterates to ``max_iterations`` or until ``max |Δrank| <= tol``.
    Returns (node, rank, n_iterations) — ranks sum to 1 up to float
    rounding; ``n_iterations`` is constant on every row so callers can
    audit convergence. Duplicate (src, dst) edges are summed into one
    weighted edge up front.

    ``check_every`` — distributed-loop economics: the convergence test is
    a driver action, so the distributed path evaluates it only every
    ``check_every``-th iteration (and at the cap); Δrank rides INSIDE the
    checkpointed rank frame (the update joins the old ranks anyway, so
    the per-row |Δ| is free), making the test a cheap scan of |nodes|
    rows, never a re-join. A run may therefore overshoot convergence by
    up to ``check_every − 1`` cheap extra iterations — the standard
    trade against one driver round-trip per iteration. The driver-local
    path checks every iteration (no job cost there), so ``n_iterations``
    can differ between paths by design; ranks still agree to float
    tolerance.

    Exact parity with a dense numpy power iteration on the collected
    edge list is pytest-pinned (tests/test_graph.py) — both run the SAME
    update, so they agree to float tolerance, not merely in ranking
    order.

    Dual execution path (the ``assign_cells`` expression-vs-Arrow
    philosophy): below ``small_graph_nodes`` AND ``small_graph_edges``
    the aggregated edge list is collected and the identical update loop
    runs driver-local in numpy — per-iteration JOB SCHEDULING dominates
    distributed fixpoints on small graphs (measured: 25 nodes × 7
    iterations cost ~13 s as Spark jobs, <1 s driver-local). Above
    either bound the per-iteration DataFrame joins run distributed; set
    both to 0 to force that path. The two paths agree to float
    tolerance (pytest-pinned)."""
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0, 1), got {damping}")
    if check_every < 1:
        # validated up front, BEFORE any Spark job and on BOTH paths — the
        # driver-local path ignores the knob but must reject the same
        # arguments the distributed path would
        raise ValueError(f"check_every must be >= 1, got {check_every}")
    w = F.col(weight).cast("double") if weight else F.lit(1.0)
    e = (
        edges.select(
            F.col(src).alias("__src"), F.col(dst).alias("__dst"), w.alias("__w")
        )
        .groupBy("__src", "__dst")
        .agg(F.sum("__w").alias("__w"))
        .transform(truncate_lineage)
    )
    # one pass validates weights AND sizes the dual-path decision: a zero,
    # negative or NULL edge weight corrupts both paths differently (NULL
    # transition probabilities drop rank mass distributed; 0/0 → NaN
    # poisons the local solve), so it is an input error, not a semantics
    stats = e.agg(
        F.count(F.lit(1)).alias("n_edges"),
        F.sum(
            F.when(F.col("__w").isNull() | (F.col("__w") <= 0), 1).otherwise(0)
        ).alias("bad"),
    ).first()
    if stats.n_edges and stats.bad:
        raise ValueError(
            f"pagerank requires strictly positive edge weights; "
            f"{stats.bad} of {stats.n_edges} aggregated edges are NULL or <= 0"
        )
    if stats.n_edges == 0:
        spark = e.sparkSession
        from pyspark.sql.types import StructField, StructType

        node_type = e.schema["__src"].dataType
        return spark.createDataFrame(
            [],
            StructType([StructField("node", node_type)]),
        ).withColumn("rank", F.lit(0.0)).withColumn("n_iterations", F.lit(0))
    # ONE distinct-node frame serves the dual-path gate, the node count
    # AND the distributed loop: the gate's count is the same job the
    # distributed path needs anyway (so routing distributed pays nothing
    # extra), the node check still precedes any row transfer (no
    # speculative 1M-row collect for a too-wide graph), and routing local
    # merely materializes a ≤small_graph_nodes checkpoint first
    nodes = (
        e.select(F.col("__src").alias("node"))
        .unionByName(e.select(F.col("__dst").alias("node")))
        .distinct()
        .transform(truncate_lineage)
    )
    # nodes is checkpointed EAGERLY even when the local path below wins the
    # gate: the distributed path reuses it (ranks init + dangling mass), and
    # on the local path the frame is node-gated small — a deliberate,
    # bounded over-materialization, not a leak
    n = nodes.count()
    if stats.n_edges <= small_graph_edges and n <= small_graph_nodes:
        rows = e.collect()
        node_set = {r["__src"] for r in rows} | {r["__dst"] for r in rows}
        return _pagerank_local(
            e.sparkSession, e.schema["__src"].dataType, rows,
            sorted(node_set), damping, max_iterations, tol,
        )
    out_w = e.groupBy(F.col("__src").alias("node")).agg(
        F.sum("__w").alias("__out_w")
    )
    # per-edge transition probability, fixed across iterations
    trans = (
        e.join(out_w.withColumnRenamed("node", "__src"), "__src")
        .select("__src", "__dst", (F.col("__w") / F.col("__out_w")).alias("__p"))
        .transform(truncate_lineage)
    )
    # derived from the CHECKPOINTED trans, then checkpointed itself: the
    # per-iteration dangling anti-join must not re-run the edge aggregate
    has_out = (
        trans.select(F.col("__src").alias("node")).distinct().transform(truncate_lineage)
    )
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    base = (1.0 - damping) / n
    iterations = 0
    for _ in range(max_iterations):
        iterations += 1
        # dangling mass stays IN the plan as a broadcast 1-row frame — a
        # driver .first() here would add another action per iteration and
        # a driver round-trip the distributed shape doesn't need
        dangling = ranks.join(has_out, "node", "left_anti").agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dangling")
        )
        contribs = (
            trans.join(ranks.withColumnRenamed("node", "__src"), "__src")
            .groupBy(F.col("__dst").alias("node"))
            .agg(F.sum(F.col("__p") * F.col("rank")).alias("__in"))
        )
        # the update joins the OLD ranks (not the bare node list) so the
        # per-row |Δrank| lands inside the same checkpointed frame — the
        # convergence test below is then a scan of materialized |nodes|
        # rows, never a second join or a re-run of the contrib aggregate
        new_rank = F.lit(base) + F.lit(damping) * (
            F.coalesce(F.col("__in"), F.lit(0.0)) + F.col("__dangling") / n
        )
        new_ranks = (
            ranks.withColumnRenamed("rank", "__old")
            .join(contribs, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                new_rank.alias("rank"),
                F.abs(new_rank - F.col("__old")).alias("__delta"),
            )
            .transform(truncate_lineage)
        )
        ranks = new_ranks.select("node", "rank")
        if iterations % check_every == 0 or iterations == max_iterations:
            delta = new_ranks.agg(F.max("__delta")).first()[0]
            if delta <= tol:
                break
    return ranks.withColumn("n_iterations", F.lit(iterations))


def _pagerank_local(
    spark, node_type, edge_rows, node_list, damping: float,
    max_iterations: int, tol: float,
) -> DataFrame:
    """Driver-local power iteration for small graphs — the SAME update as
    the distributed loop (dangling correction included), on the
    already-collected aggregated edge list. Bounded by the small_graph_*
    caps checked by the caller."""
    import numpy as np

    idx = {v: i for i, v in enumerate(node_list)}
    n = len(node_list)
    srcs, dsts, ws = [], [], []
    out_w = np.zeros(n)
    for r in edge_rows:
        srcs.append(idx[r["__src"]])
        dsts.append(idx[r["__dst"]])
        ws.append(r["__w"])
        out_w[idx[r["__src"]]] += r["__w"]
    srcs, dsts, ws = np.array(srcs), np.array(dsts), np.array(ws)
    p = ws / out_w[srcs]  # per-edge transition probability
    has_out = out_w > 0
    r = np.full(n, 1.0 / n)
    base = (1.0 - damping) / n
    iterations = 0
    for _ in range(max_iterations):
        iterations += 1
        dangling = r[~has_out].sum()
        contrib = np.bincount(dsts, weights=p * r[srcs], minlength=n)
        new_r = base + damping * (contrib + dangling / n)
        delta = np.abs(new_r - r).max()
        r = new_r
        if delta <= tol:
            break
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        StructField,
        StructType,
    )

    # a FRESH StructType — StructType.add mutates in place, so extending a
    # source frame's cached schema object would corrupt that frame
    schema = StructType(
        [
            StructField("node", node_type),
            StructField("rank", DoubleType()),
            StructField("n_iterations", IntegerType()),
        ]
    )
    return spark.createDataFrame(
        [(v, float(r[i]), iterations) for v, i in idx.items()], schema
    )
