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

# TPC-H Q1-shaped pricing summary — conditional money math, multi-aggregate,
# single wide scan; the classic whole-stage-codegen showcase.
SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS sum_disc_price,
       ROUND(AVG(CAST(l_quantity AS DOUBLE)), 6) AS avg_qty,
       ROUND(AVG(CAST(l_discount AS DOUBLE)), 6) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""

# Two revenue rollups in one statement (one oracle slot): the TPC-H
# Q3-shaped segment top-k (3-way join + filter + top-k — broadcast-join +
# TakeOrderedAndProject showcase) UNION ALL the nation-level rollup through
# two dims (join-reordering + COUNT DISTINCT showcase). Column-aligned with a
# scope tag; counts default to 0, not NULL, per the oracle determinism rules.
SQL_REVENUE_ROLLUPS = """
SELECT 'segment_topk' AS scope,
       CAST(o_orderkey AS STRING) AS rollup_key,
       0 AS customers,
       revenue,
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
       n_name AS rollup_key,
       COUNT(DISTINCT c_custkey) AS customers,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       'ALL' AS detail
FROM nation
JOIN customer ON c_nationkey = n_nationkey
JOIN orders ON o_custkey = c_custkey
GROUP BY n_name
"""

# Banded correlated EXISTS (J6; reference repurchase label ml_models.py:262-293)
# — Catalyst rewrites the correlated subquery into a left semi join natively;
# the same text runs on DuckDB, per-row label parity.
SQL_REPURCHASE_EXISTS = """
SELECT o1.o_orderkey,
       o1.o_custkey,
       CASE WHEN EXISTS (
           SELECT 1 FROM orders o2
           WHERE o2.o_custkey = o1.o_custkey
             AND o2.o_orderdate > o1.o_orderdate
             AND o2.o_orderdate <= o1.o_orderdate + INTERVAL 30 DAY
       ) THEN 1 ELSE 0 END AS repurchase_30d
FROM orders o1
"""

_VIEWS = ("lineitem", "orders", "customer", "nation")


def _run(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    register_views(spark, sf_dir, _VIEWS)
    return spark.sql(sql)


def q_sql_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run(spark, sf_dir, SQL_PRICING_SUMMARY)


def q_sql_revenue_rollups(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run(spark, sf_dir, SQL_REVENUE_ROLLUPS)


def q_sql_repurchase_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run(spark, sf_dir, SQL_REPURCHASE_EXISTS)


QUERIES = {
    "sql_pricing_summary": q_sql_pricing_summary,
    "sql_revenue_rollups": q_sql_revenue_rollups,
    "sql_repurchase_exists": q_sql_repurchase_exists,
}

# the oracle is the SAME string Spark executes — by construction
ORACLE = {
    "sql_pricing_summary": SQL_PRICING_SUMMARY,
    "sql_revenue_rollups": SQL_REVENUE_ROLLUPS,
    "sql_repurchase_exists": SQL_REPURCHASE_EXISTS,
}
