"""Differential analysis + statistical tests (SURVEY.md §2.9 M15, M16).

The reference's differential module (``Website/market/dunnhumby/views.py:
1531-2574``) pivots department×quarter / ×season / segment×dept / store×dept
sales matrices, then runs scipy tests (chi² + Cramér's V, Welch t + Cohen's
d, Mann-Whitney U + rank-biserial, KS) on the pivoted cells.

Spark-first split of responsibilities:

- The PIVOT and every *test statistic* are computed distributed — group-by
  aggregates and window ranks, never a dense driver-side matrix. At 100 TB
  the sample moments / rank sums reduce map-side; only O(groups) scalars
  reach the driver.
- The p-value (a scalar transform of the final statistic) uses
  ``functions.stats`` — driver-side math on numbers, not data.

Statistic identities (all SQL-expressible, so DuckDB can oracle-check them):
    chi² = Σ (obs − exp)² / exp,  exp = row_tot × col_tot / N
    Welch t = (m̄₁ − m̄₂) / √(s₁²/n₁ + s₂²/n₂)
    U = R₁ − n₁(n₁+1)/2  (R₁ = rank sum of sample 1, average ranks for ties)
    KS D = max |ECDF₁ − ECDF₂|
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from market_data_mining_project_spark.functions import stats as ST


def pivot_matrix(
    df: DataFrame, row: str, col: str, value: str, agg: str = "sum",
    values: list | None = None,
) -> DataFrame:
    """groupBy().pivot() sales/count matrix (reference views.py:1597-1645).

    Without ``values``, ``pivot`` collects the distinct col values (small —
    quarters/seasons/depts) then plans a single hash aggregate. Pass the
    known ``values`` explicitly to skip that extra distinct job AND pin the
    output schema (the scale-friendly form).
    """
    agg_expr = {"sum": F.sum(value), "count": F.count(value), "avg": F.avg(value)}[agg]
    pivoted = (
        df.groupBy(row).pivot(col, values)
        if values is not None
        else df.groupBy(row).pivot(col)
    )
    return pivoted.agg(agg_expr)


def chi2_components(df: DataFrame, row: str, col: str, weight: str | None = None) -> DataFrame:
    """Per-cell chi² contributions over a contingency of (row, col).

    Fully distributed: cell/row/col/grand totals via one aggregate + window
    sums — no driver-side matrix. Returns (row, col, observed, expected,
    component).
    """
    w = F.count(F.lit(1)) if weight is None else F.sum(weight)
    cells = df.groupBy(row, col).agg(w.cast("double").alias("observed"))
    row_w = Window.partitionBy(row)
    col_w = Window.partitionBy(col)
    all_w = Window.partitionBy()
    return (
        cells.withColumn("row_total", F.sum("observed").over(row_w))
        .withColumn("col_total", F.sum("observed").over(col_w))
        .withColumn("grand_total", F.sum("observed").over(all_w))
        .withColumn("expected", F.col("row_total") * F.col("col_total") / F.col("grand_total"))
        .withColumn(
            "component",
            (F.col("observed") - F.col("expected")) ** 2 / F.col("expected"),
        )
        .select(row, col, "observed", "expected", "component")
    )


def chi2_test(df: DataFrame, row: str, col: str, weight: str | None = None) -> dict:
    """Full chi² test with Cramér's V (reference compute_statistics,
    views.py:1756-1847). Distributed statistic; scalar p-value on the driver.
    """
    # NULL labels are excluded from the TABLE, not just the r/c counts:
    # countDistinct skips NULLs, so a NULL-label cell previously added its
    # component to chi2 while shrinking dof by one column — a systematically
    # deflated p-value
    df = df.filter(F.col(row).isNotNull() & F.col(col).isNotNull())
    comp = chi2_components(df, row, col, weight)
    agg = comp.agg(
        F.sum("component").alias("chi2"),
        F.countDistinct(row).alias("r"),
        F.countDistinct(col).alias("c"),
        F.sum("observed").alias("n"),
    ).collect()[0]
    if agg.chi2 is None:  # zero contingency cells: nothing to test
        raise ValueError(f"chi2_test: no rows for ({row!r}, {col!r})")
    dof = (agg.r - 1) * (agg.c - 1)
    p = ST.chi2_sf(agg.chi2, dof) if dof > 0 else 1.0
    k = min(agg.r, agg.c)
    cramers_v = (agg.chi2 / (agg.n * (k - 1))) ** 0.5 if k > 1 and agg.n > 0 else 0.0
    return {
        "statistic": float(agg.chi2),
        "dof": int(dof),
        "p_value": float(p),
        "cramers_v": float(cramers_v),
        "n": float(agg.n),
    }


def welch_moments(df: DataFrame, group: str, value: str) -> DataFrame:
    """Per-group (n, mean, variance) — the sufficient statistics for Welch's
    t. One map-side-combinable aggregate; works for any number of groups."""
    return df.groupBy(group).agg(
        F.count(value).cast("double").alias("n"),
        F.avg(value).alias("mean"),
        F.var_samp(value).alias("var"),
    )


def welch_t_test(df: DataFrame, group: str, value: str, g1, g2) -> dict:
    """Welch unequal-variance t-test + Cohen's d (reference views.py:1849-1886).

    Raises ValueError when a group is absent or has fewer than 2 samples —
    var_samp is NULL for singletons and the Welch dof is undefined."""
    rows = {r[group]: r for r in welch_moments(df.filter(F.col(group).isin([g1, g2])), group, value).collect()}
    missing = [g for g in (g1, g2) if g not in rows]
    if missing:
        raise ValueError(f"welch_t_test: group(s) {missing!r} absent from {group!r}")
    small = [g for g in (g1, g2) if rows[g]["n"] < 2]
    if small:
        raise ValueError(f"welch_t_test: group(s) {small!r} need n >= 2 samples")
    a, b = rows[g1], rows[g2]
    se2 = a["var"] / a["n"] + b["var"] / b["n"]
    if se2 == 0:
        # both groups constant: scipy's convention — nan when the (constant)
        # means are equal, signed infinity otherwise, never a ZeroDivisionError
        diff = a["mean"] - b["mean"]
        t = float("nan") if diff == 0 else math.copysign(float("inf"), diff)
        dof = float("nan")
        p = float("nan") if diff == 0 else 0.0
    else:
        t = (a["mean"] - b["mean"]) / se2**0.5
        # Welch–Satterthwaite degrees of freedom
        dof = se2**2 / (
            (a["var"] / a["n"]) ** 2 / (a["n"] - 1)
            + (b["var"] / b["n"]) ** 2 / (b["n"] - 1)
        )
        p = 2.0 * ST.t_sf(abs(t), dof)
    pooled = (((a["n"] - 1) * a["var"] + (b["n"] - 1) * b["var"]) / (a["n"] + b["n"] - 2)) ** 0.5
    cohens_d = (a["mean"] - b["mean"]) / pooled if pooled > 0 else 0.0
    return {
        "statistic": float(t),
        "dof": float(dof),
        "p_value": float(p),
        "cohens_d": float(cohens_d),
        "mean_1": float(a["mean"]),
        "mean_2": float(b["mean"]),
    }


#: Cap on the DISTINCT-VALUE frame the rank/ECDF cumulative windows walk.
#: The walk is single-task by design (it derives global ranks), safe only
#: because it runs over the per-value histogram, not the rows — but a
#: continuous double column can have |distinct| ≈ |rows|, silently turning
#: the walk back into a global row sort. Past this cap the plan RAISES at
#: execution (lazy, in-plan — no extra validation pass) instead: quantize
#: the metric (cents, millis) or sample first, like the reference's capped
#: stat samples (views.py:1708-1754). 4M values ≈ 100 MB of walk state in
#: the one task — comfortable; 100× that is not.
#:
#: Honest limit of the lazy guard: the raise fires INSIDE the window task,
#: i.e. after that task has already sorted/buffered the distinct-value frame
#: — an input whose |distinct| is so far past the cap that the buffer itself
#: OOMs (≈400M+ values, ~10 GB in one task) dies with an executor OOM before
#: the guard's message surfaces. Callers ingesting unquantized continuous
#: columns of that cardinality should run an upfront
#: ``approx_count_distinct`` pre-check (one cheap map-side aggregate) before
#: invoking the walk; for every realistic quantized metric (days, cents,
#: ranks) the lazy in-plan guard is both sufficient and free.
MAX_RANK_DISTINCT_VALUES = 4_000_000


def _bounded_walk(nv: Column, expr: Column, op: str) -> Column:
    """Wrap a histogram-walk output so exceeding the distinct-value cap
    fails loudly AT EXECUTION, inside the same single pass (the guard rides
    the load-bearing column — Catalyst cannot prune it)."""
    return F.when(
        nv > MAX_RANK_DISTINCT_VALUES,
        F.raise_error(
            F.concat(
                F.lit(
                    f"{op}: distinct-value count "
                ),
                nv.cast("string"),
                F.lit(
                    f" exceeds MAX_RANK_DISTINCT_VALUES={MAX_RANK_DISTINCT_VALUES}; "
                    "the single-task rank walk would degrade to a global row "
                    "sort — quantize the value column or sample the input"
                ),
            )
        ).cast("double"),
    ).otherwise(expr)


def rank_sums(df: DataFrame, group: str, value: str) -> DataFrame:
    """Tie-aware average-rank sums WITHOUT ranking individual rows.

    Two phases: (1) one map-side-combinable aggregate collapses the pooled
    sample to per-(value, group) counts — |distinct values| ≪ N rows; (2) a
    cumulative window over that small per-value frame derives each value's
    average rank analytically (rows_before + (ties+1)/2), and the per-group
    rank sum is Σ n_g(v)·avg_rank(v). Full rows never funnel through a
    single-partition sort — only the distinct-value histogram does. (The
    reference instead caps the sample at 2.5K rows, views.py:1708-1754; this
    stays exact AND distributed.) Inputs whose distinct-value count exceeds
    ``MAX_RANK_DISTINCT_VALUES`` fail loudly at execution instead of
    silently single-task-sorting the data."""
    per_gv = df.groupBy(value, group).agg(
        F.count(F.lit(1)).cast("double").alias("n_gv")
    )
    vals = per_gv.groupBy(value).agg(F.sum("n_gv").alias("t"))
    # unpartitioned windows over the distinct-value histogram only —
    # ≤ MAX_RANK_DISTINCT_VALUES rows by the in-plan guard below (benign
    # WindowExec single-partition warning)
    w_cum = Window.orderBy(F.col(value).asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.orderBy(F.col(value).asc()).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked_vals = vals.withColumn("cum_t", F.sum("t").over(w_cum)).withColumn(
        # ranks occupied by a tied value v: (cum_t - t, cum_t]; their mean
        "avg_rank",
        _bounded_walk(
            F.count(F.lit(1)).over(w_all),
            F.col("cum_t") - F.col("t") + (F.col("t") + F.lit(1.0)) / 2.0,
            "rank_sums",
        ),
    )
    return (
        per_gv.join(F.broadcast(ranked_vals.select(value, "avg_rank")), value)
        .groupBy(group)
        .agg(
            F.sum(F.col("n_gv") * F.col("avg_rank")).alias("rank_sum"),
            F.sum("n_gv").alias("n"),
        )
    )


def mann_whitney_u(df: DataFrame, group: str, value: str, g1, g2) -> dict:
    """Mann-Whitney U with tie-corrected normal approximation + rank-biserial
    effect size (reference views.py:1888-1917; tie correction matches
    scipy.stats.mannwhitneyu's sigma so p-values agree on tied data)."""
    # NULL values never join the rank frame (NULL != NULL in the equi-join),
    # so they were already absent from rank_sum and n1/n2 — but the tie
    # aggregate below kept the NULL group and understated the variance.
    # Exclude them from the sample up front so both aggregates agree.
    sub = df.filter(F.col(group).isin([g1, g2]) & F.col(value).isNotNull())
    rows = {r[group]: r for r in rank_sums(sub, group, value).collect()}
    missing = [g for g in (g1, g2) if g not in rows]
    if missing:
        raise ValueError(f"mann_whitney_u: group(s) {missing!r} absent from {group!r}")
    a, b = rows[g1], rows[g2]
    n1, n2 = a["n"], b["n"]
    n = n1 + n2
    # Σ(t³ − t) over tied-value groups — one tiny aggregate of per-value counts
    tie_term = (
        sub.groupBy(value)
        .agg(F.count(F.lit(1)).cast("double").alias("t"))
        .agg(F.sum(F.col("t") ** 3 - F.col("t")).alias("tt"))
        .collect()[0]["tt"]
        or 0.0
    )
    u1 = a["rank_sum"] - n1 * (n1 + 1) / 2.0
    u = min(u1, n1 * n2 - u1)
    mu = n1 * n2 / 2.0
    variance = n1 * n2 * (n + 1) / 12.0 - n1 * n2 * tie_term / (12.0 * n * (n - 1))
    sigma = variance**0.5 if variance > 0 else 0.0
    z = (u - mu) / sigma if sigma > 0 else 0.0
    p = 2.0 * ST.norm_sf(abs(z))
    rank_biserial = 1.0 - 2.0 * u1 / (n1 * n2)
    return {
        "statistic": float(u),
        "z": float(z),
        "p_value": float(min(p, 1.0)),
        "rank_biserial": float(rank_biserial),
    }


def ks_statistic(df: DataFrame, group: str, value: str, g1, g2) -> DataFrame:
    """Distributed two-sample KS D = max over pooled values of |ECDF₁ − ECDF₂|.

    Same two-phase shape as ``rank_sums``: per-value group counts first (one
    map-side-combinable aggregate — ties collapse here, so the ECDF step at a
    tied value completes naturally), then cumulative sums over the small
    distinct-value histogram. No row-level global sort. Same
    ``MAX_RANK_DISTINCT_VALUES`` execution-time bound as
    :func:`rank_sums`.

    NULL values are excluded from the sample (the mann_whitney_u rule —
    scipy drops NaNs the same way): an unfiltered NULL formed its own grid
    row that sorted FIRST in the cumulative walk, i.e. counted as a data
    point below every real value, inflating both the group sizes and D
    itself (found by the r9 randomized fuzz case, seed 7)."""
    sub = df.filter(
        F.col(group).isin([g1, g2]) & F.col(value).isNotNull()
    ).select(group, value)
    per_v = sub.groupBy(value).agg(
        F.sum(F.when(F.col(group) == g1, 1.0).otherwise(0.0)).alias("t1"),
        F.sum(F.when(F.col(group) == g2, 1.0).otherwise(0.0)).alias("t2"),
    )
    # unpartitioned windows over the distinct-value histogram only —
    # ≤ MAX_RANK_DISTINCT_VALUES rows by the in-plan guard below (benign
    # WindowExec single-partition warning)
    w = Window.orderBy(F.col(value).asc()).rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.orderBy(F.col(value).asc()).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cdf = per_v.withColumn(
        "c1",
        _bounded_walk(F.count(F.lit(1)).over(w_all), F.sum("t1").over(w), "ks_statistic"),
    ).withColumn("c2", F.sum("t2").over(w))
    totals = per_v.agg(F.sum("t1").alias("n1"), F.sum("t2").alias("n2"))
    # try_divide: an empty group must surface as a NULL statistic for the
    # caller's absent-group ValueError, not as an ANSI ArithmeticException
    return cdf.crossJoin(F.broadcast(totals)).select(
        F.max(
            F.abs(
                F.try_divide(F.col("c1"), F.col("n1"))
                - F.try_divide(F.col("c2"), F.col("n2"))
            )
        ).alias("ks_d"),
        # group sizes ride along from the totals frame this plan already
        # computed — callers need them for the p-value, and a separate
        # count aggregation would be a redundant pass over the fact table
        F.first("n1").alias("n1"),
        F.first("n2").alias("n2"),
    )


def ks_test(df: DataFrame, group: str, value: str, g1, g2) -> dict:
    """Two-sample KS test (reference views.py:1919-1934); asymptotic p-value.

    Raises ValueError when either group is empty/absent (the same contract
    as welch_t_test / mann_whitney_u — an absent group is caller error,
    not a NULL statistic)."""
    row = ks_statistic(df, group, value, g1, g2).collect()[0]
    n1 = int(row["n1"] or 0)
    n2 = int(row["n2"] or 0)
    if n1 == 0 or n2 == 0:
        missing = [g for g, n in ((g1, n1), (g2, n2)) if n == 0]
        raise ValueError(f"ks_test: group(s) {missing!r} absent from {group!r}")
    p = ST.ks_sf(row["ks_d"], n1, n2)
    return {"statistic": float(row["ks_d"]), "p_value": float(p), "n1": n1, "n2": n2}


def data_assessment(df: DataFrame, day: str, customer: str, basket: str) -> DataFrame:
    """M16 data readiness summary (reference churn_data_assessment.py):
    temporal range, volumes, per-customer lifetime span."""
    per_cust = df.groupBy(customer).agg(
        (F.max(day) - F.min(day)).cast("double").alias("lifetime_span")
    )
    span = per_cust.agg(
        F.round(F.avg("lifetime_span"), 4).alias("avg_lifetime_span"),
        F.max("lifetime_span").cast("double").alias("max_lifetime_span"),
    )
    totals = df.agg(
        F.min(day).alias("min_day"),
        F.max(day).alias("max_day"),
        F.count(F.lit(1)).alias("row_count"),
        F.countDistinct(customer).alias("customers"),
        F.countDistinct(basket).alias("baskets"),
    )
    return totals.crossJoin(span)
