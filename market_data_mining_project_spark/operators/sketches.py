"""Mergeable-sketch aggregates (HLL distinct counts, KLL-style quantiles).

Not in the reference (its cardinalities are exact pandas ``nunique`` /
T-SQL ``COUNT(DISTINCT)``) — added as first-class engine capability
because at 100 TB the exact forms stop composing: a COUNT(DISTINCT) per
dimension re-shuffles the fact table per grain, while a SKETCH is built
once at the finest grain and then MERGED to any coarser grain without
touching the data again (the Druid/BigQuery rollup design). Spark ships
Apache DataSketches HLL natively (``hll_sketch_agg`` / ``hll_union_agg``
/ ``hll_sketch_estimate``) — binary, mergeable, and deterministic for a
given input multiset, which is what the tests pin.

The quantile side uses ``percentile_approx`` (GK sketch): single pass,
bounded memory at any scale — the ``approxQuantile(…, 0.0)`` exact-mode
memory cliff documented in round 6 item 7 is exactly what this avoids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sketch_rollup(
    df: DataFrame,
    keys: list[str],
    distinct_col: str,
    value_col: str,
    lg_k: int = 12,
    quantiles: tuple[float, ...] = (0.5, 0.95, 0.99),
    accuracy: int = 10_000,
) -> DataFrame:
    """Finest-grain sketch table: per ``keys`` group, an HLL sketch of
    ``distinct_col`` (kept as BINARY — the mergeable artifact), its
    estimate, approximate quantiles of ``value_col``, and exact row
    counts. ONE map-side-combinable hash aggregate; the sketch column is
    what downstream rollups merge instead of rescanning the fact table."""
    qs = F.percentile_approx(F.col(value_col), list(quantiles), accuracy)
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(F.col(distinct_col), F.lit(lg_k)).alias("hll_sketch"),
        F.count(F.lit(1)).alias("n_rows"),
        qs.alias("value_quantiles"),
    ).withColumn(
        "distinct_estimate", F.hll_sketch_estimate("hll_sketch").cast("long")
    )


def merge_sketches(rollup: DataFrame, keys: list[str]) -> DataFrame:
    """Re-aggregate a sketch table to a coarser grain WITHOUT touching the
    fact table: HLL sketches union over the same multiset a direct sketch
    would see, so estimates agree to within estimator noise — EXACTLY
    while sketches are in sparse/coupon mode (small distinct counts, the
    fixture regime), and to a fraction of a percent once dense (a union
    falls back from the HIP estimator to the composite one; the pytest
    gate pins a 0.5% bound, not bit-equality, for that reason). Row
    counts add exactly. ``keys`` may be empty for the global rollup."""
    agg = [
        F.hll_union_agg("hll_sketch").alias("hll_sketch"),
        F.sum("n_rows").alias("n_rows"),
    ]
    g = rollup.groupBy(*keys) if keys else rollup.groupBy()
    return g.agg(*agg).withColumn(
        "distinct_estimate", F.hll_sketch_estimate("hll_sketch").cast("long")
    )


def value_histogram(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    out_value: str = "value",
) -> DataFrame:
    """Bounded counting histogram — the EXACT mergeable quantile artifact
    for bounded integer domains (money-in-cents, durations-in-seconds):
    one (keys…, value, cnt) row per distinct value per grain, built in a
    single map-side-combinable hash aggregate.

    Where GK (``percentile_approx``) is approximate and NOT mergeable as
    a Spark column (a coarser-grain quantile pays a second fact scan —
    the honest caveat in :func:`sketch_rollup`'s catalog entry before
    this), counting histograms merge by integer ADDITION: any
    partitioning/grain of the data sums to the same table, so quantiles
    at every coarser grain derive from one fine-grain build with ZERO
    re-scan — the same exact-integer move the ``value_anomalies``
    comparison makes. Artifact size is bounded by the value domain
    (≤ |distinct values| per grain — ~10⁵ rows for any cents-priced
    catalog), independent of row count. NULL values carry no quantile
    information and are excluded."""
    v = F.col(value_col)
    return (
        df.filter(v.isNotNull())
        .groupBy(*keys, v.alias(out_value))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def histogram_quantiles(
    hist: DataFrame,
    keys: list[str],
    quantiles: tuple[float, ...],
    value_col: str = "value",
    prefix: str = "q",
) -> DataFrame:
    """Merge a counting histogram to the ``keys`` grain (``[]`` = global)
    and derive EXACT quantiles by cumulative walk — Spark's exact
    ``percentile`` semantics reproduced from the merged counts: position
    ``p = q·(n−1)``, linear interpolation between the bracketing values
    (``lo`` = smallest value with cumulative count ≥ ⌊p⌋+1, ``hi`` = the
    next one), so the result equals ``F.percentile`` over the raw rows
    bit-for-bit (pytest-pinned).

    Plan: one hash aggregate re-merges the histogram (integer addition),
    one window walks the ≤|distinct values| summary rows per grain, one
    final aggregate picks the brackets — the fact table is never
    touched. The global grain windows over a single partition, which is
    fine BECAUSE the frame is the bounded histogram, not the data.
    Output: ``keys… , {prefix}0..{prefix}k-1`` (double), ``n_values``."""
    from pyspark.sql import Window

    bad = [q for q in quantiles if not (0.0 <= float(q) <= 1.0)]
    if bad:
        # out-of-range q fails SILENTLY otherwise: q>1 finds no lo bracket
        # (NULL column), q<0 clamps to the minimum — both look like answers
        raise ValueError(
            f"histogram_quantiles: quantiles must be in [0.0, 1.0], got {bad!r}"
        )

    merged = hist.groupBy(*keys, value_col).agg(F.sum("cnt").alias("__c"))
    w_cum = (
        Window.partitionBy(*keys)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy(*keys).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    base = merged.select(
        *keys,
        F.col(value_col),
        F.sum("__c").over(w_cum).alias("__cum"),
        F.sum("__c").over(w_all).alias("__n"),
    )
    aggs = []
    for i, q in enumerate(quantiles):
        pos = F.lit(float(q)) * (F.col("__n") - 1).cast("double")
        k = F.floor(pos)
        aggs.append(
            F.min(F.when(F.col("__cum") >= k + 1, F.col(value_col))).alias(
                f"__lo{i}"
            )
        )
        aggs.append(
            F.min(F.when(F.col("__cum") >= k + 2, F.col(value_col))).alias(
                f"__hi{i}"
            )
        )
    aggs.append(F.max("__n").alias("__n"))
    g = base.groupBy(*keys) if keys else base.groupBy()
    agged = g.agg(*aggs)
    out: list = list(keys)
    for i, q in enumerate(quantiles):
        pos = F.lit(float(q)) * (F.col("__n") - 1).cast("double")
        lower = F.floor(pos)
        higher = F.ceil(pos)
        lo = F.col(f"__lo{i}").cast("double")
        # the top value has no successor: hi falls back to lo (the weight
        # on hi is 0 there by construction; the coalesce keeps it total)
        hi = F.coalesce(F.col(f"__hi{i}"), F.col(f"__lo{i}")).cast("double")
        # EXACTLY Spark's Percentile interpolation — the weighted form
        # (higher−pos)·lo + (pos−lower)·hi, NOT lo + frac·(hi−lo): the two
        # differ in the last ulp and the gate is bit-for-bit equality
        interp = F.when(higher == lower, lo).otherwise(
            (higher.cast("double") - pos) * lo
            + (pos - lower.cast("double")) * hi
        )
        out.append(interp.alias(f"{prefix}{i}"))
    out.append(F.col("__n").alias("n_values"))
    return agged.select(*out)


def _cms_cells(item_col: str, depth: int, width: int, seed: int):
    """The (row, hash-bucket) cell array shared by build and probe — ONE
    definition so the two sides cannot drift: CMS guarantees hold only
    when build and estimate use bit-identical (depth, width, seed)
    hashing. Callers of :func:`cms_estimate` must pass the SAME
    parameters the sketch was built with; a mismatch probes different
    buckets and silently voids the ``estimate >= true`` guarantee."""
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("r"),
                F.pmod(
                    F.xxhash64(F.col(item_col).cast("string"), F.lit(seed + i)),
                    F.lit(width),
                ).alias("b"),
            )
            for i in range(depth)
        ]
    )


def cms_build(
    df: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 1024,
    seed: int = 7,
) -> DataFrame:
    """Count-Min frequency sketch as a (row, bucket, cnt) counter table —
    the third mergeable sketch beside HLL (distinct) and GK (quantiles):
    bounded-memory frequency estimation with the one-sided guarantee
    ``estimate >= true`` and ``estimate <= true + (e/width)·N`` with
    probability ``1 − e^(−depth)`` (Cormode & Muthukrishnan 2005).

    Spark shape: each item explodes to its ``depth`` (row, hash-bucket)
    cells (``xxhash64`` seeded per row — deterministic across runs and
    engines) and ONE map-side-combinable hash aggregate counts cells.
    The artifact is ≤ depth×width rows regardless of input size — the
    100 TB point: partial sketches from any partitioning of the data
    MERGE by integer addition (:func:`cms_merge`, pytest-pinned EXACTLY
    equal to a one-shot build), so frequency tables compose across
    ingest batches without rescanning."""
    if depth < 1 or width < 2:
        raise ValueError(f"need depth >= 1 and width >= 2, got {depth}/{width}")
    cells = _cms_cells(item_col, depth, width, seed)
    return (
        df.filter(F.col(item_col).isNotNull())
        .select(F.explode(cells).alias("__cell"))
        .groupBy(
            F.col("__cell.r").alias("row"), F.col("__cell.b").alias("bucket")
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(sketches: list[DataFrame]) -> DataFrame:
    """Merge partial CMS counter tables built with the SAME
    (depth, width, seed): counters add cell-wise — integer-exact, so a
    merged sketch is bit-identical to one built over the concatenated
    input."""
    if not sketches:
        raise ValueError("cms_merge needs at least one sketch")
    u = sketches[0]
    for s in sketches[1:]:
        u = u.unionByName(s)
    return u.groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    cms: DataFrame,
    items: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 1024,
    seed: int = 7,
) -> DataFrame:
    """Point-estimate frequencies for candidate ``items`` against a CMS
    counter table: each item probes its ``depth`` cells and takes the MIN
    (absent cell = 0 — the item was never counted there). The counter
    table is ≤ depth×width rows, so the probe join broadcasts it; output
    adds ``cms_freq`` to the items frame.

    Output is one row per DISTINCT non-null item: ``(item_col,
    cms_freq)`` — other ``items`` columns are dropped and duplicate items
    collapse (join the result back on ``item_col`` to annotate a wider
    frame). ``depth``/``width``/``seed`` MUST match the build (see
    :func:`_cms_cells` — a mismatch probes different buckets and silently
    voids the overestimate guarantee).

    NULL items are excluded, mirroring :func:`cms_build`: a NULL never
    enters the sketch, but ``xxhash64`` of a NULL string still yields a
    seed-derived hash, so probing it would return a spurious non-zero
    count from whatever real items share those cells."""
    items = items.filter(F.col(item_col).isNotNull())
    cells = _cms_cells(item_col, depth, width, seed)
    probes = items.select(item_col, F.explode(cells).alias("__cell")).select(
        item_col,
        F.col("__cell.r").alias("row"),
        F.col("__cell.b").alias("bucket"),
    )
    return (
        probes.join(F.broadcast(cms), ["row", "bucket"], "left")
        .groupBy(item_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_freq"))
    )
