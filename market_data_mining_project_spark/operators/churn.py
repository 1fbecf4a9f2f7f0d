"""Churn feature engineering + label generation (SURVEY.md §2.9 M7).

The reference builds churn training data by splitting history at
``max(day) − churn_days`` and labeling a customer churned iff they never
re-appear in the future window (``Website/market/dunnhumby/analytics.py:
438-512``). Feature engineering and labeling are a single declarative plan:

- the split point is one scalar aggregate computed BEFORE any filter
  (SURVEY §7.4.9 — the label asymmetry the reference depends on);
- history features: RFM (A5) + purchase-gap stats (W2 lag window) + product
  variety (countDistinct) — all map-side-combinable aggregates on one
  shuffle keyed by customer;
- label: left-semi/anti membership against future purchasers (J11) —
  a broadcast-able distinct key set;
- demographics join (J3) stays a broadcast hash join.

Nothing here collects; the labeled feature frame feeds MLlib directly
(``ml/churn_model.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from market_data_mining_project_spark.functions.expressions import money, safe_ratio


DEFAULT_SWEEP_THRESHOLDS = tuple(round(0.10 + 0.03 * i, 2) for i in range(7))


def churn_threshold_sweep(
    scored: DataFrame,
    score: str = "churn_probability",
    label: str = "churned",
    thresholds: tuple[float, ...] = DEFAULT_SWEEP_THRESHOLDS,
) -> DataFrame:
    """Decision-threshold sweep over an already-scored frame (reference
    ``Website/market/dunnhumby/management/commands/optimize_churn_model.py:
    16-57``: sweep ``range(10, 31, 3)``, report accuracy + churn recall per
    threshold, pick the max-recall one). The reference re-prepares and
    re-trains a model per threshold; here the model is trained once and the
    sweep is pure counting over its scores — predicted-churn iff
    ``score >= t`` — which is what the sweep actually measures.

    ONE scan: every threshold's confusion matrix is a conditional sum in a
    single global aggregate (map-side combinable, no crossJoin row
    multiplication, no per-threshold pass), then the 1-row result is
    unpivoted with ``stack``. Scales as O(rows) regardless of threshold
    count. Output: (threshold, tp, fp, fn, tn, churn_recall, accuracy,
    is_best) with is_best = max recall, ties to the lowest threshold
    (pandas ``idxmax`` keeps the first occurrence).
    """
    pos = F.col(label) == 1
    aggs = []
    for i, t in enumerate(thresholds):
        pred = F.col(score) >= F.lit(float(t))
        aggs += [
            F.sum(F.when(pred & pos, 1).otherwise(0)).alias(f"tp_{i}"),
            F.sum(F.when(pred & ~pos, 1).otherwise(0)).alias(f"fp_{i}"),
            F.sum(F.when(~pred & pos, 1).otherwise(0)).alias(f"fn_{i}"),
            F.sum(F.when(~pred & ~pos, 1).otherwise(0)).alias(f"tn_{i}"),
        ]
    stacked = ", ".join(
        f"CAST({t} AS DOUBLE), tp_{i}, fp_{i}, fn_{i}, tn_{i}"
        for i, t in enumerate(thresholds)
    )
    long = scored.agg(*aggs).select(
        F.expr(f"stack({len(thresholds)}, {stacked}) AS (threshold, tp, fp, fn, tn)")
    )
    metrics = long.select(
        "threshold",
        "tp",
        "fp",
        "fn",
        "tn",
        F.round(
            safe_ratio(F.col("tp").cast("double"), (F.col("tp") + F.col("fn")).cast("double")), 6
        ).alias("churn_recall"),
        F.round(
            safe_ratio(
                (F.col("tp") + F.col("tn")).cast("double"),
                (F.col("tp") + F.col("fp") + F.col("fn") + F.col("tn")).cast("double"),
            ),
            6,
        ).alias("accuracy"),
    )
    # #thresholds rows total — a global window here is O(len(thresholds)),
    # not a scale concern
    best_w = Window.orderBy(F.col("churn_recall").desc(), F.col("threshold").asc())
    return metrics.withColumn(
        "is_best", (F.row_number().over(best_w) == 1).cast("int")
    ).orderBy("threshold")


def split_day(fact: DataFrame, day: str, churn_days: int) -> int:
    """``max(day) − churn_days`` computed on the FULL table (analytics.py:456)."""
    mx = fact.agg(F.max(day)).collect()[0][0]
    if mx is None:
        raise ValueError(
            "churn split needs at least one fact row: max("
            f"{day}) is NULL on an empty/fully-filtered frame"
        )
    return mx - churn_days


def churn_features(
    fact: DataFrame,
    customer: str,
    basket: str,
    day: str,
    sales: str,
    item: str,
    churn_days: int,
    cutoff: int | None = None,
) -> DataFrame:
    """Labeled churn feature frame (M7; reference analytics.py:438-512).

    Returns one row per customer active in history, with columns:
    recency, frequency, monetary, avg_basket_value, avg_purchase_gap,
    product_variety, active_days, churned (1 = absent from future window).
    ``cutoff`` overrides the computed split day (for deterministic oracles).
    """
    split = cutoff if cutoff is not None else split_day(fact, day, churn_days)
    history = fact.filter(F.col(day) <= split)
    future = fact.filter(F.col(day) > split)

    gaps_w = Window.partitionBy(customer).orderBy(F.col(day).asc())
    # consecutive-purchase gaps over distinct active days (W2)
    active_days = history.select(customer, day).distinct()
    gaps = (
        active_days.withColumn("gap", F.col(day) - F.lag(day).over(gaps_w))
        .groupBy(customer)
        .agg(F.avg("gap").alias("avg_purchase_gap"))
    )

    # money summed as DECIMAL(18,2) then cast to double: double summation is
    # partition-order dependent, which would make the hash gate flaky at scale
    feats = history.groupBy(customer).agg(
        (F.lit(split) - F.max(day)).alias("recency"),
        F.countDistinct(basket).alias("frequency"),
        F.sum(money(sales)).cast("double").alias("monetary"),
        F.countDistinct(item).alias("product_variety"),
        F.countDistinct(day).alias("active_days"),
    )

    future_customers = future.select(customer).distinct()
    return (
        feats.join(gaps, customer, "left")
        .join(
            future_customers.withColumn("__returned", F.lit(1)), customer, "left"
        )
        .withColumn("churned", F.when(F.col("__returned").isNotNull(), 0).otherwise(1))
        .withColumn(
            "avg_basket_value",
            F.round(safe_ratio(F.col("monetary"), F.col("frequency").cast("double")), 6),
        )
        .withColumn("monetary", F.round("monetary", 2))
        .withColumn("avg_purchase_gap", F.round(F.coalesce("avg_purchase_gap", F.lit(0.0)), 6))
        .drop("__returned")
        .select(
            customer,
            "recency",
            "frequency",
            "monetary",
            "avg_basket_value",
            "avg_purchase_gap",
            "product_variety",
            "active_days",
            "churned",
        )
    )
