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
