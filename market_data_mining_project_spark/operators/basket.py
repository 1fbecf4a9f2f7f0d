"""Basket / department / product rollups (SURVEY.md §2.4 A1–A4, §2.9 M6).

The reference computes these as raw SQL GROUP BYs over the 2.6M-row
transactions table (``Website/market/dunnhumby/views.py:867-1017``,
``analytics.py:330-402``). Spark-first shape:

- fact → (broadcast) dim join → hash aggregate → TakeOrderedAndProject;
- partial (map-side) aggregation is automatic, so the shuffle carries one row
  per group per partition, not per input row — at 100 TB the network moves
  |groups|×|partitions|, not |rows|;
- money summed as DECIMAL for order-independent exactness across executors.

All functions are schema-generic (column names parameterized) so the same
operator binds to the Dunnhumby schema (basket_id/product_id/sales_value)
and to the driver's TPC-H-ish tables (l_orderkey/l_partkey/l_extendedprice).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from market_data_mining_project_spark.functions.expressions import money


def global_stats(
    fact: DataFrame, basket: str, product: str, customer: str, sales: str
) -> DataFrame:
    """One-pass global scalar aggregates (A1; reference views.py:878-888)."""
    return fact.agg(
        F.count(F.lit(1)).alias("total_rows"),
        F.countDistinct(basket).alias("total_baskets"),
        F.countDistinct(product).alias("total_products"),
        F.countDistinct(customer).alias("total_customers"),
        F.sum(money(sales)).cast("double").alias("total_sales"),
        F.round(F.sum(money(sales)).cast("double") / F.count(F.lit(1)), 6).alias("avg_sales"),
    )


def basket_rollup(fact: DataFrame, basket: str, customer: str, product: str, quantity: str, sales: str) -> DataFrame:
    """Per-basket rollup (A2/M6; reference views.py:891-902, analytics.py:340-351).

    GROUP BY (basket, customer) — one shuffle keyed on the basket id. On the
    real schema basket_id is globally unique per customer visit, so skew is
    bounded by max basket size (~tens of lines).
    """
    return fact.groupBy(basket, customer).agg(
        F.sum(quantity).alias("total_items"),
        F.sum(money(sales)).cast("double").alias("total_value"),
        F.countDistinct(product).alias("unique_products"),
        F.count(F.lit(1)).alias("line_count"),
    )


def category_rollup(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    category: str,
    basket: str,
    quantity: str,
    sales: str,
    product: str,
) -> DataFrame:
    """Per-category rollup after a broadcast dim join (A3; reference
    views.py:906-918 department table). The dim (product/part) is
    broadcast — no shuffle of the fact table for the join; the single
    shuffle is the ~30-group aggregate, which partial-aggregates map-side
    down to |categories| rows per task.
    """
    joined = fact.join(F.broadcast(dim.select(key, category)), key, "inner")
    return joined.filter(F.col(category).isNotNull()).groupBy(category).agg(
        F.count(F.lit(1)).alias("transaction_count"),
        F.sum(money(sales)).cast("double").alias("total_sales"),
        F.round(F.sum(money(sales)).cast("double") / F.count(F.lit(1)), 6).alias("avg_sales"),
        F.sum(quantity).alias("total_quantity"),
        F.countDistinct(product).alias("unique_products"),
        F.countDistinct(basket).alias("unique_baskets"),
    )


def product_rollup(fact: DataFrame, product: str, basket: str, quantity: str, sales: str) -> DataFrame:
    """Per-product rollup (A4; reference views.py:922-927, admin.py:84-89)."""
    return fact.groupBy(product).agg(
        F.count(F.lit(1)).alias("purchase_count"),
        F.countDistinct(basket).alias("basket_count"),
        F.sum(money(sales)).cast("double").alias("total_sales"),
        F.sum(quantity).alias("total_quantity"),
    )


def department_mix(
    fact: DataFrame, dim: DataFrame, key: str, category: str, basket: str
) -> DataFrame:
    """Per-basket category mix as a native map column (M6; the reference
    stores this as a JSONField dict, models.py:143-160, built via
    ``STRING_AGG(DISTINCT department)`` analytics.py:347)."""
    joined = fact.join(F.broadcast(dim.select(key, category)), key, "inner")
    # NULL categories are excluded like category_rollup does — they cannot
    # be map keys (map_from_entries raises NULL_MAP_KEY at runtime), and a
    # "no department" bucket in a department-mix map is not a department
    joined = joined.filter(F.col(category).isNotNull())
    per_cat = joined.groupBy(basket, category).agg(F.count(F.lit(1)).alias("cnt"))
    return per_cat.groupBy(basket).agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct(F.col(category), F.col("cnt"))))
        ).alias("department_mix"),
        # per_cat is grouped by (basket, category), so category is already
        # unique within each basket group — count(category) gives the same
        # value (NULL group contributes 0, matching countDistinct) without
        # the distinct-aggregate expand path
        F.count(F.col(category)).alias("unique_departments"),
    )
