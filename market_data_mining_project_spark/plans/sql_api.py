"""Spark SQL API queries — the reference's interface IS raw SQL strings
(``django.db.connection.cursor()``; SURVEY.md §3), so the engine must accept
SQL, not only the DataFrame DSL. These queries register temp views and run
``spark.sql`` text that is simultaneously valid DuckDB SQL — one string, two
engines, hash-identical results (dialect-neutral ANSI only).

Catalyst compiles these to the same plans as the DSL equivalents (SQL and
DataFrame API are two frontends to one optimizer), so everything in §4
(pushdown, pruning, broadcast, AQE) applies unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from market_data_mining_project_spark.sources.tables import register_views

# Four SQL reports in ONE column-aligned statement (slot merge of the
# former sql_pricing_summary + sql_revenue_rollups entries, joined in r12
# by the former sql_repurchase_exists — every cell of all four still
# hash-checks; measures a scope doesn't use are pinned to typed zeros per
# the oracle determinism rules):
#   'pricing'      — TPC-H Q1-shaped pricing summary (conditional money
#                    math, multi-aggregate, single wide scan; the classic
#                    whole-stage-codegen showcase)
#   'segment_topk' — TPC-H Q3-shaped segment top-k (3-way join + filter +
#                    top-k — broadcast-join + TakeOrderedAndProject)
#   'nation'       — nation rollup through two dims (join reordering +
#                    COUNT DISTINCT)
#   'repurchase'   — the J6 banded correlated EXISTS (reference repurchase
#                    label ml_models.py:262-293): per-order 30-day
#                    repurchase labels, one row per order (key1=orderkey,
#                    key2=custkey, label in count_order) — per-row label
#                    parity is preserved, Catalyst still rewrites the
#                    correlated subquery to a semi join
#                    (test_sql_exists_rewrites_to_semi_join)
SQL_REPORTS = """
SELECT 'pricing' AS scope,
       l_returnflag AS key1,
       l_linestatus AS key2,
       CAST(0 AS BIGINT) AS customers,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       -- exact-sum averages: AVG over raw doubles is an order-dependent
       -- float sum (Spark's partial-merge order vs DuckDB's sequential),
       -- and a half-ulp drift at a x.xxxxx5 boundary flips ROUND(...,6).
       -- DECIMAL sums are exact in both engines, so sum-then-divide is
       -- bit-identical (l_discount is genuinely fractional; l_quantity
       -- gets the same form for uniformity)
       ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity), 6) AS avg_qty,
       ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_discount), 6) AS avg_disc,
       COUNT(*) AS count_order,
       'ALL' AS detail
FROM lineitem
GROUP BY l_returnflag, l_linestatus
UNION ALL
SELECT 'segment_topk' AS scope,
       CAST(o_orderkey AS STRING) AS key1,
       '' AS key2,
       CAST(0 AS BIGINT) AS customers,
       revenue,
       CAST(0 AS DOUBLE) AS sum_base_price,
       CAST(0 AS DOUBLE) AS sum_qty,
       CAST(0 AS DOUBLE) AS avg_qty,
       CAST(0 AS DOUBLE) AS avg_disc,
       CAST(0 AS BIGINT) AS count_order,
       o_orderpriority AS detail
FROM (
  SELECT o_orderkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue,
         o_orderpriority
  FROM customer
  JOIN orders ON c_custkey = o_custkey
  JOIN lineitem ON l_orderkey = o_orderkey
  WHERE c_mktsegment = 'BUILDING'
  GROUP BY o_orderkey, o_orderpriority
  ORDER BY revenue DESC, o_orderkey ASC
  LIMIT 20
) seg
UNION ALL
SELECT 'nation' AS scope,
       n_name AS key1,
       '' AS key2,
       COUNT(DISTINCT c_custkey) AS customers,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       CAST(0 AS DOUBLE) AS sum_base_price,
       CAST(0 AS DOUBLE) AS sum_qty,
       CAST(0 AS DOUBLE) AS avg_qty,
       CAST(0 AS DOUBLE) AS avg_disc,
       CAST(0 AS BIGINT) AS count_order,
       'ALL' AS detail
FROM nation
JOIN customer ON c_nationkey = n_nationkey
JOIN orders ON o_custkey = c_custkey
GROUP BY n_name
UNION ALL
SELECT 'repurchase' AS scope,
       CAST(o1.o_orderkey AS STRING) AS key1,
       CAST(o1.o_custkey AS STRING) AS key2,
       CAST(0 AS BIGINT) AS customers,
       CAST(0 AS DOUBLE) AS revenue,
       CAST(0 AS DOUBLE) AS sum_base_price,
       CAST(0 AS DOUBLE) AS sum_qty,
       CAST(0 AS DOUBLE) AS avg_qty,
       CAST(0 AS DOUBLE) AS avg_disc,
       CAST(CASE WHEN EXISTS (
           SELECT 1 FROM orders o2
           WHERE o2.o_custkey = o1.o_custkey
             AND o2.o_orderdate > o1.o_orderdate
             AND o2.o_orderdate <= o1.o_orderdate + INTERVAL 30 DAY
       ) THEN 1 ELSE 0 END AS BIGINT) AS count_order,
       'ALL' AS detail
FROM orders o1
"""

_VIEWS = ("lineitem", "orders", "customer", "nation")


def _run(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    register_views(spark, sf_dir, _VIEWS)
    return spark.sql(sql)


def q_sql_reports(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run(spark, sf_dir, SQL_REPORTS)


QUERIES = {
    "sql_reports": q_sql_reports,
}

# the oracle is the SAME string Spark executes — by construction
ORACLE = {
    "sql_reports": SQL_REPORTS,
}
