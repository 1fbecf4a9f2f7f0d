"""Relational-core queries (SURVEY.md §2.2–§2.8) on the TPC-H-ish test tables.

Binding (FIXTURES.md §4): lineitem≈transactions fact (l_orderkey≈basket_id,
l_partkey≈product_id, l_extendedprice≈sales_value), orders≈basket grain
(o_custkey≈household_key), part≈product dim, customer≈household dim.

Determinism rules for oracle parity (each query's DuckDB SQL must hash-match):
- money summed as DECIMAL(18,2) → cast DOUBLE at the end (order-independent);
- averages = double division + ROUND(…, 6) (identical IEEE on both engines);
- every LIMIT is preceded by a total order (unique tiebreaker column);
- window functions always carry a unique tiebreaker in ORDER BY.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from market_data_mining_project_spark.functions.expressions import money
from market_data_mining_project_spark.operators import basket as B
from market_data_mining_project_spark.operators import relational as R
from market_data_mining_project_spark.sources.tables import load_table


def _li(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "lineitem")


def _orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "orders")


def _part(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "part")


# --- A1: one-pass global scalar aggregates -----------------------------------


def q_global_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _li(spark, sf_dir)
    return B.global_stats(
        li, basket="l_orderkey", product="l_partkey", customer="l_suppkey", sales="l_extendedprice"
    )


SQL_GLOBAL_STATS = """
SELECT COUNT(*) AS total_rows,
       COUNT(DISTINCT l_orderkey) AS total_baskets,
       COUNT(DISTINCT l_partkey) AS total_products,
       COUNT(DISTINCT l_suppkey) AS total_customers,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_sales,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_sales
FROM lineitem
"""


# --- A3/O1 flagship: category rollup (dept-revenue analogue), top 15 ---------


def q_category_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _li(spark, sf_dir).withColumnRenamed("l_partkey", "p_partkey")
    rolled = B.category_rollup(
        li,
        _part(spark, sf_dir),
        key="p_partkey",
        category="p_type",
        basket="l_orderkey",
        quantity="l_quantity",
        sales="l_extendedprice",
        product="p_partkey",
    ).withColumnRenamed("p_type", "category")
    return R.top_n(rolled, 15, ["total_sales", "category"])


SQL_CATEGORY_ROLLUP = """
SELECT p_type AS category,
       COUNT(*) AS transaction_count,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_sales,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_sales,
       SUM(l_quantity) AS total_quantity,
       COUNT(DISTINCT p_partkey) AS unique_products,
       COUNT(DISTINCT l_orderkey) AS unique_baskets
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_type IS NOT NULL
GROUP BY p_type
ORDER BY total_sales DESC, category DESC
LIMIT 15
"""


# --- A2/O1: per-basket rollup, top 25 by value --------------------------------


def q_basket_rollup_top25(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _li(spark, sf_dir)
    rolled = B.basket_rollup(
        li,
        basket="l_orderkey",
        customer="l_suppkey",
        product="l_partkey",
        quantity="l_quantity",
        sales="l_extendedprice",
    )
    # The reference's TOP 25 baskets by total value (views.py:891-902);
    # the FULL group key (l_orderkey, l_suppkey) tiebreaks — l_orderkey
    # alone is not a total order (two suppliers in one order can tie on
    # total_value exactly, and the two engines may then keep different rows
    # at the limit boundary).
    return R.top_n(rolled, 25, ["total_value", "l_orderkey", "l_suppkey"])


SQL_BASKET_ROLLUP_TOP25 = """
SELECT l_orderkey, l_suppkey,
       SUM(l_quantity) AS total_items,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
       COUNT(DISTINCT l_partkey) AS unique_products,
       COUNT(*) AS line_count
FROM lineitem
GROUP BY l_orderkey, l_suppkey
ORDER BY total_value DESC, l_orderkey DESC, l_suppkey DESC
LIMIT 25
"""


# --- A4/A6: product rollup with HAVING ----------------------------------------


def q_product_rollup_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _li(spark, sf_dir)
    rolled = B.product_rollup(
        li, product="l_partkey", basket="l_orderkey", quantity="l_quantity", sales="l_extendedprice"
    )
    return rolled.filter(F.col("basket_count") >= 5)


SQL_PRODUCT_ROLLUP_HAVING = """
SELECT l_partkey,
       COUNT(*) AS purchase_count,
       COUNT(DISTINCT l_orderkey) AS basket_count,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_sales,
       SUM(l_quantity) AS total_quantity
FROM lineitem
GROUP BY l_partkey
HAVING COUNT(DISTINCT l_orderkey) >= 5
"""


# --- P1/P2/P3/P4: projected scan with pushed-down predicates ------------------


def q_filtered_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _li(spark, sf_dir)
    projected = R.project(
        li, ["l_orderkey", "l_partkey", "l_quantity", "l_extendedprice", "l_returnflag"]
    )
    ranged = R.filter_ranges(
        projected, {"l_quantity": (10, 30), "l_extendedprice": (1000.0, None)}
    )
    return R.filter_isin(ranged, "l_returnflag", ["A", "R"]).filter(
        F.col("l_partkey").isNotNull()
    )


SQL_FILTERED_SCAN = """
SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice, l_returnflag
FROM lineitem
WHERE l_quantity BETWEEN 10 AND 30
  AND l_extendedprice >= 1000.0
  AND l_returnflag IN ('A', 'R')
  AND l_partkey IS NOT NULL
"""


# --- P5: case-insensitive search over string columns ---------------------------


def q_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _part(spark, sf_dir)
    return R.search(part, "prom", ["p_name", "p_type", "p_brand"]).select(
        "p_partkey", "p_name", "p_brand", "p_type"
    )


SQL_SEARCH = """
SELECT p_partkey, p_name, p_brand, p_type
FROM part
WHERE lower(p_name) LIKE '%prom%'
   OR lower(p_type) LIKE '%prom%'
   OR lower(p_brand) LIKE '%prom%'
"""


def q_scan_search_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1/P2/P3 projected+range+IN scan (former ``filtered_scan``) stacked
    over the P5 icontains search (former ``search_icontains``) in ONE
    oracled entry — a column-aligned UNION tagged by ``grain``, every cell
    of both former entries still hash-checked (the r9 slot-merge
    discipline: thin related entries share a window slot; the freed slot
    oracles ``ewma_trend``). Both legs stay independent predicate scans —
    the union adds no join/shuffle, and each leg's filters still push into
    its parquet scan (plan-asserted)."""
    scan = q_filtered_scan(spark, sf_dir).select(
        F.lit("scan").alias("grain"),
        F.col("l_orderkey").cast("long").alias("k1"),
        F.col("l_partkey").cast("long").alias("k2"),
        F.col("l_quantity").cast("double").alias("v1"),
        F.col("l_extendedprice").cast("double").alias("v2"),
        F.col("l_returnflag").alias("s1"),
        F.lit("").alias("s2"),
        F.lit("").alias("s3"),
    )
    search = q_search(spark, sf_dir).select(
        F.lit("search").alias("grain"),
        F.col("p_partkey").cast("long").alias("k1"),
        F.lit(-1).cast("long").alias("k2"),
        F.lit(-1.0).alias("v1"),
        F.lit(-1.0).alias("v2"),
        F.col("p_name").alias("s1"),
        F.col("p_brand").alias("s2"),
        F.col("p_type").alias("s3"),
    )
    return scan.unionByName(search)


SQL_SCAN_SEARCH_AUDIT = f"""
SELECT 'scan' AS grain, CAST(l_orderkey AS BIGINT) AS k1,
       CAST(l_partkey AS BIGINT) AS k2, CAST(l_quantity AS DOUBLE) AS v1,
       CAST(l_extendedprice AS DOUBLE) AS v2, l_returnflag AS s1,
       '' AS s2, '' AS s3
FROM ({SQL_FILTERED_SCAN})
UNION ALL
SELECT 'search' AS grain, CAST(p_partkey AS BIGINT) AS k1,
       CAST(-1 AS BIGINT) AS k2, -1.0 AS v1, -1.0 AS v2,
       p_name AS s1, p_brand AS s2, p_type AS s3
FROM ({SQL_SEARCH})
"""


# --- O3/O4: multi-column sort + offset pagination + keyset (seek) page ----------


def q_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both pagination idioms in one result, tagged by ``page_method``:
    offset page 3 (O3/O4, reference views.py:1337-1350) and the keyset/seek
    page after key 5000 (O4 scale variant — the seek predicate pushes into
    the parquet scan, so page 10⁶ costs page 1)."""
    orders = _orders(spark, sf_dir).select("o_orderkey", "o_custkey", "o_totalprice")
    offset_page = R.paginate(
        orders,
        order=[F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        page=3,
        page_size=50,
    )
    seek_page = R.keyset_page(orders, key="o_orderkey", after=5000, page_size=50)
    return offset_page.withColumn("page_method", F.lit("offset")).unionByName(
        seek_page.withColumn("page_method", F.lit("keyset"))
    )


SQL_PAGINATION = """
SELECT *, 'offset' AS page_method FROM (
  SELECT o_orderkey, o_custkey, o_totalprice
  FROM orders
  ORDER BY o_totalprice DESC, o_orderkey ASC
  LIMIT 50 OFFSET 150
)
UNION ALL
SELECT *, 'keyset' AS page_method FROM (
  SELECT o_orderkey, o_custkey, o_totalprice
  FROM orders
  WHERE o_orderkey > 5000
  ORDER BY o_orderkey ASC
  LIMIT 50
)
"""


# --- U2/A13 + P8: one table-health audit row (dedup keep-max ⨯ dirty repair) ----


def q_repair_dedup_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-health audit in one row — the U2/A13 keep-max dedup aggregate
    cross-joined with the P8 dirty-data-repair aggregate (reference
    ``UPDATE ... SET sales_value=0 WHERE sales_value<0``, admin.py:372-380,
    and the duplicate-line cleanup idiom). Both sides are 1-row aggregates
    over lineitem; the cross join is a broadcast of scalars, so the plan is
    two scans + two hash aggregates, no shuffle join."""
    li = _li(spark, sf_dir)
    deduped = R.dedup_keep_max(
        li,
        keys=["l_orderkey", "l_partkey"],
        tiebreak=["l_linenumber", "l_extendedprice", "l_quantity"],
    )
    dedup_agg = deduped.agg(
        F.count(F.lit(1)).alias("dedup_rows"),
        F.sum("l_linenumber").alias("linenumber_sum"),
        F.sum(money("l_extendedprice")).cast("double").alias("dedup_sales"),
    )
    repaired = li.withColumn(
        "l_discount_repaired",
        F.when(F.col("l_discount") < 0, F.lit(0.0)).otherwise(F.col("l_discount")),
    )
    repair_agg = repaired.agg(
        F.count(F.lit(1)).alias("rows_total"),
        F.count(F.when(F.col("l_discount") < 0, 1)).alias("rows_repaired"),
        F.round(F.sum("l_discount_repaired"), 4).alias("discount_after_repair"),
    )
    return repair_agg.crossJoin(F.broadcast(dedup_agg))


def q_repair_recompute_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row table-health + mutation audit: the U2/A13 dedup aggregate ×
    the P8 repair aggregate × the S9 delete-and-recompute before/after row.
    All three sides are 1-row aggregates, so the cross joins are scalar
    broadcasts — merging them costs nothing but frees oracle-window slots
    for decontamination and the product-grain rules (every column of the
    former separate entries is still hash-checked here)."""
    return q_repair_dedup_audit(spark, sf_dir).crossJoin(
        F.broadcast(q_basket_recompute(spark, sf_dir))
    )


SQL_REPAIR_DEDUP_AUDIT = """
WITH ranked AS (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY l_orderkey, l_partkey
      ORDER BY l_linenumber DESC, l_extendedprice DESC, l_quantity DESC) AS rn
  FROM lineitem
), dedup AS (
  SELECT COUNT(*) AS dedup_rows,
         CAST(SUM(l_linenumber) AS BIGINT) AS linenumber_sum,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS dedup_sales
  FROM ranked WHERE rn = 1
), repair AS (
  SELECT COUNT(*) AS rows_total,
         COUNT(CASE WHEN l_discount < 0 THEN 1 END) AS rows_repaired,
         ROUND(SUM(CASE WHEN l_discount < 0 THEN 0.0 ELSE l_discount END), 4) AS discount_after_repair
  FROM lineitem
)
SELECT repair.rows_total, repair.rows_repaired, repair.discount_after_repair,
       dedup.dedup_rows, dedup.linenumber_sum, dedup.dedup_sales
FROM repair CROSS JOIN dedup
"""


# --- W2: per-customer order-gap stats (purchase-gap analogue) -------------------


def q_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _orders(spark, sf_dir).withColumn(
        "order_day", F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
    )
    w = Window.partitionBy("o_custkey").orderBy("order_day", "o_orderkey")
    gaps = orders.withColumn("gap", F.col("order_day") - F.lag("order_day").over(w))
    return (
        gaps.filter(F.col("gap").isNotNull())
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("gap_count"),
            F.round(F.avg("gap"), 6).alias("avg_gap_days"),
            F.max("gap").alias("max_gap_days"),
        )
    )


SQL_ORDER_GAPS = """
WITH seq AS (
  SELECT o_custkey,
         datediff('day', DATE '1995-01-01', o_orderdate) AS order_day,
         datediff('day', DATE '1995-01-01', o_orderdate)
           - LAG(datediff('day', DATE '1995-01-01', o_orderdate)) OVER (
               PARTITION BY o_custkey
               ORDER BY datediff('day', DATE '1995-01-01', o_orderdate), o_orderkey) AS gap
  FROM orders
)
SELECT o_custkey,
       COUNT(*) AS gap_count,
       ROUND(AVG(CAST(gap AS DOUBLE)), 6) AS avg_gap_days,
       MAX(gap) AS max_gap_days
FROM seq WHERE gap IS NOT NULL
GROUP BY o_custkey
"""


# --- A7 + skew path: time-bucketed aggregation via salted two-phase agg ---------


def q_monthly_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-bucket rollup (A7) computed through the skew-resistant salted
    two-phase aggregation — result-identical to the plain groupBy, which is
    exactly what the oracle checks. At 100 TB a hot month (holiday spike)
    overwhelms a single reducer; salting on hash(o_custkey) spreads the hot
    month's rows across customer-hash buckets, so no reducer sees more of a
    month than its largest single customer. (countDistinct exactness forces
    the salt to be the counted column — each customer must land in exactly
    one bucket — so single-customer skew specifically is NOT split; for
    that shape use a row-random salt and drop the distinct count.)"""
    orders = _orders(spark, sf_dir).withColumn(
        "month_bucket", F.year("o_orderdate") * 100 + F.month("o_orderdate")
    ).withColumn("price_d", money("o_totalprice"))
    agg = R.salted_agg(
        orders,
        keys=["month_bucket"],
        aggs={
            "order_count": ("count", "o_orderkey"),
            "total_sales": ("sum", "price_d"),
            "active_customers": ("count_distinct", "o_custkey"),
        },
        salt_buckets=16,
        salt_col="o_custkey",
    )
    return agg.select(
        "month_bucket",
        "order_count",
        F.col("total_sales").cast("double").alias("total_sales"),
        "active_customers",
    )


SQL_MONTHLY_SALES = """
SELECT YEAR(o_orderdate) * 100 + MONTH(o_orderdate) AS month_bucket,
       COUNT(*) AS order_count,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_sales,
       COUNT(DISTINCT o_custkey) AS active_customers
FROM orders
GROUP BY 1
"""


# --- A8: multi-horizon conditional aggregation in one pass ----------------------


def q_conditional_horizons(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference computes 4 time-horizon stats in one scan with
    SUM(CASE WHEN day >= threshold ...) (ml_models.py:793-826). Analogue:
    per-brand sales in trailing windows anchored at 2001-01-01 / 2000-01-01 /
    1998-01-01."""
    li = _li(spark, sf_dir).withColumnRenamed("l_partkey", "p_partkey")
    joined = li.join(F.broadcast(_part(spark, sf_dir).select("p_partkey", "p_brand")), "p_partkey")

    def since(year: int):
        return F.col("l_shipdate") >= F.lit(f"{year}-01-01").cast("timestamp")

    return joined.groupBy("p_brand").agg(
        F.sum(F.when(since(2001), money("l_extendedprice")).otherwise(F.lit(0).cast("decimal(18,2)")))
        .cast("double")
        .alias("sales_recent"),
        F.sum(F.when(since(2000), money("l_extendedprice")).otherwise(F.lit(0).cast("decimal(18,2)")))
        .cast("double")
        .alias("sales_1y"),
        F.sum(F.when(since(1998), money("l_extendedprice")).otherwise(F.lit(0).cast("decimal(18,2)")))
        .cast("double")
        .alias("sales_3y"),
        F.countDistinct(F.when(since(2000), F.col("l_orderkey"))).alias("baskets_1y"),
        F.count(F.lit(1)).alias("total_lines"),
    )


SQL_CONDITIONAL_HORIZONS = """
SELECT p_brand,
       CAST(SUM(CASE WHEN l_shipdate >= TIMESTAMP '2001-01-01' THEN CAST(l_extendedprice AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS sales_recent,
       CAST(SUM(CASE WHEN l_shipdate >= TIMESTAMP '2000-01-01' THEN CAST(l_extendedprice AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS sales_1y,
       CAST(SUM(CASE WHEN l_shipdate >= TIMESTAMP '1998-01-01' THEN CAST(l_extendedprice AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS sales_3y,
       COUNT(DISTINCT CASE WHEN l_shipdate >= TIMESTAMP '2000-01-01' THEN l_orderkey END) AS baskets_1y,
       COUNT(*) AS total_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""


# --- J10/J11: anti-join + semi-join (active vs lapsed customers) ------------------


def q_semi_anti_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _orders(spark, sf_dir)
    customer = load_table(spark, sf_dir, "customer")
    cutoff = F.lit("2001-01-01").cast("timestamp")
    recent = orders.filter(F.col("o_orderdate") >= cutoff).select("o_custkey").distinct()
    ever = orders.select("o_custkey").distinct()
    active = customer.join(recent, customer.c_custkey == recent.o_custkey, "left_semi")
    lapsed = (
        customer.join(ever, customer.c_custkey == ever.o_custkey, "left_semi")
        .join(recent, customer.c_custkey == recent.o_custkey, "left_anti")
    )
    return (
        active.select("c_custkey").withColumn("status", F.lit("active"))
        .unionByName(lapsed.select("c_custkey").withColumn("status", F.lit("lapsed")))
    )


SQL_SEMI_ANTI_CUSTOMERS = """
SELECT c_custkey, 'active' AS status FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
              AND o_orderdate >= TIMESTAMP '2001-01-01')
UNION ALL
SELECT c_custkey, 'lapsed' AS status FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2001-01-01')
"""


# --- F9: JSON extraction over events ---------------------------------------------


def q_events_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    # floor(TRY double) → long on BOTH engines: a direct string→INT cast
    # NULLs "1.5" on Spark but ROUNDS it to 2 on DuckDB, and a malformed k
    # hard-errors the DuckDB oracle — floor-of-double truncates identically
    # and malformed values null-skip identically (integer-only fixtures are
    # byte-unchanged)
    k = F.floor(F.get_json_object("props", "$.k").cast("double")).cast("long")
    return (
        events.withColumn("k_val", k)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.sum("k_val").alias("k_sum"),
            F.round(F.avg(F.col("k_val").cast("double")), 6).alias("k_avg"),
            F.countDistinct("user_id").alias("unique_users"),
        )
    )


SQL_EVENTS_JSON = """
SELECT event_type,
       COUNT(*) AS event_count,
       CAST(SUM(CAST(FLOOR(TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE)) AS BIGINT)) AS BIGINT) AS k_sum,
       ROUND(AVG(CAST(FLOOR(TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE)) AS BIGINT)), 6) AS k_avg,
       COUNT(DISTINCT user_id) AS unique_users
FROM events
GROUP BY event_type
"""


# --- M15 shape: pivoted category × year sales matrix -------------------------------


def q_pivot_category_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _li(spark, sf_dir).withColumnRenamed("l_partkey", "p_partkey")
    joined = li.join(F.broadcast(_part(spark, sf_dir).select("p_partkey", "p_type")), "p_partkey")
    years = list(range(1995, 2002))
    return (
        joined.withColumn("yr", F.year("l_shipdate"))
        .groupBy("p_type")
        .pivot("yr", years)
        .agg(F.sum(money("l_extendedprice")).cast("double"))
        .na.fill(0.0, [str(y) for y in years])
        .select("p_type", *[F.col(str(y)).alias(f"y{y}") for y in years])
    )


SQL_PIVOT_CATEGORY_YEAR = """
SELECT p_type,
       {cols}
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_type
""".format(
    cols=",\n       ".join(
        "CAST(COALESCE(SUM(CASE WHEN YEAR(l_shipdate) = {y} THEN CAST(l_extendedprice AS DECIMAL(18,2)) END), 0) AS DOUBLE) AS y{y}".format(y=y)
        for y in range(1995, 2002)
    )
)


# --- A-family: multi-grain ROLLUP in one pass --------------------------------------


def q_sales_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical GROUPING-SETS aggregate: order count + revenue at
    (year, priority), (year) and grand-total grains in ONE pass
    (``rollup`` expands the sets inside a single Expand+HashAggregate —
    the OLAP multi-grain rollup without re-scanning per grain, the same
    lattice economics as the sketch rollup but exact). Subtotal rows are
    disambiguated from real data by ``grouping_level`` (GROUPING bitmask,
    identical in both engines) and the aggregated-out keys are coalesced
    to typed sentinels (-1 / 'ALL'), the non-null canonicalization rule."""
    o = _orders(spark, sf_dir).select(
        F.year("o_orderdate").alias("yr"),
        F.col("o_orderpriority").alias("priority"),
        money("o_totalprice").alias("p"),
    )
    agg = o.rollup("yr", "priority").agg(
        F.count(F.lit(1)).alias("order_count"),
        F.sum("p").cast("double").alias("total_sales"),
        (F.grouping("yr") * 2 + F.grouping("priority"))
        .cast("int")
        .alias("grouping_level"),
    )
    return agg.select(
        F.coalesce(F.col("yr"), F.lit(-1)).alias("yr"),
        F.coalesce(F.col("priority"), F.lit("ALL")).alias("priority"),
        "grouping_level",
        "order_count",
        "total_sales",
    )


SQL_SALES_ROLLUP = """
WITH o AS (
  SELECT CAST(YEAR(o_orderdate) AS INT) AS yr,
         o_orderpriority AS priority,
         CAST(o_totalprice AS DECIMAL(18,2)) AS p
  FROM orders
)
SELECT COALESCE(yr, -1) AS yr,
       COALESCE(priority, 'ALL') AS priority,
       CAST(GROUPING(yr) * 2 + GROUPING(priority) AS INT) AS grouping_level,
       COUNT(*) AS order_count,
       CAST(SUM(p) AS DOUBLE) AS total_sales
FROM o
GROUP BY ROLLUP (yr, priority)
"""


# --- cohort retention: acquisition-quarter × activity-offset matrix ----------------


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: customers grouped by acquisition quarter (their
    first order), counted as retained in every quarter-offset in which
    they ordered again — the (cohort, offset) matrix behind every
    retention curve. Shape: one min-aggregate for the cohort anchor, one
    broadcast-free equi-join back on the customer key (co-partitioned
    with the activity aggregate), one distinct count per cell; quarter
    indices are pure integer math (year*4 + quarter) and the retention
    ratio exports as parts-per-million integer division — nothing in the
    row can hit a cross-engine double-rounding tie."""
    o = _orders(spark, sf_dir).select(
        "o_custkey",
        (F.year("o_orderdate") * 4 + F.quarter("o_orderdate") - 1).cast("long").alias("qidx"),
    )
    cohort = o.groupBy("o_custkey").agg(F.min("qidx").alias("cohort_q"))
    # cohort has one row per customer by construction — plain count,
    # not a needless two-phase distinct aggregate
    cohort_sizes = cohort.groupBy("cohort_q").agg(
        F.count(F.lit(1)).alias("cohort_customers")
    )
    activity = (
        o.join(cohort, "o_custkey")
        .groupBy("cohort_q", (F.col("qidx") - F.col("cohort_q")).alias("offset_q"))
        .agg(F.countDistinct("o_custkey").alias("retained_customers"))
    )
    return activity.join(cohort_sizes, "cohort_q").select(
        "cohort_q",
        "offset_q",
        "retained_customers",
        "cohort_customers",
        # parts-per-million via integer division — a ROUND(double, 6)
        # export here is the same x/2^k half-ulp tie family the
        # rolling_user_features entry documents; integers can't tie
        F.expr("(retained_customers * 1000000) DIV cohort_customers").alias(
            "retained_ppm"
        ),
    )


SQL_COHORT_RETENTION = """
WITH o AS (
  SELECT o_custkey,
         CAST(YEAR(o_orderdate) * 4 + QUARTER(o_orderdate) - 1 AS BIGINT) AS qidx
  FROM orders
), cohort AS (
  SELECT o_custkey, MIN(qidx) AS cohort_q FROM o GROUP BY o_custkey
), sizes AS (
  SELECT cohort_q, COUNT(*) AS cohort_customers
  FROM cohort GROUP BY cohort_q
), activity AS (
  SELECT c.cohort_q, o.qidx - c.cohort_q AS offset_q,
         COUNT(DISTINCT o.o_custkey) AS retained_customers
  FROM o JOIN cohort c USING (o_custkey)
  GROUP BY c.cohort_q, o.qidx - c.cohort_q
)
SELECT a.cohort_q, a.offset_q, a.retained_customers, s.cohort_customers,
       (a.retained_customers * 1000000) // s.cohort_customers AS retained_ppm
FROM activity a JOIN sizes s USING (cohort_q)
"""


# --- W1: deterministic stratified sample -------------------------------------------


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling (ml_models.py:294-311) with a deterministic
    hash order key standing in for NEWID() so the oracle can reproduce it
    (crc32 on both engines would differ — use md5 hex, identical in both)."""
    orders = _orders(spark, sf_dir)
    sampled = R.stratified_sample(
        orders.withColumn("yr", F.year("o_orderdate")),
        bucket=F.col("yr"),
        per_bucket=20,
        order_key=F.md5(F.col("o_orderkey").cast("string")),
    )
    return sampled.groupBy("yr").agg(
        F.count(F.lit(1)).alias("sampled"),
        F.sum("o_orderkey").alias("key_sum"),
    )


SQL_STRATIFIED_SAMPLE = """
WITH ranked AS (
  SELECT YEAR(o_orderdate) AS yr, o_orderkey,
         ROW_NUMBER() OVER (PARTITION BY YEAR(o_orderdate)
                            ORDER BY md5(CAST(o_orderkey AS VARCHAR))) AS rn
  FROM orders
)
SELECT yr, COUNT(*) AS sampled, CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
FROM ranked WHERE rn <= 20
GROUP BY yr
"""




# --- S8: schema introspection ---------------------------------------------------


def q_schema_introspect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema catalog scan (S8; reference check_schema.py:14-36 reads
    INFORMATION_SCHEMA.COLUMNS). Spark's analogue is df.schema — exposed
    relationally so it oracles against DuckDB's information_schema."""
    orders = _orders(spark, sf_dir)
    rows = [(i + 1, f.name) for i, f in enumerate(orders.schema.fields)]
    return spark.createDataFrame(rows, ["ordinal", "column_name"])


SQL_SCHEMA_INTROSPECT = """
SELECT CAST(ordinal_position AS BIGINT) AS ordinal, column_name
FROM information_schema.columns
WHERE table_name = 'orders'
"""


# --- S9: mutation → recompute-downstream (the immutable-storage idiom) ------------


def q_basket_recompute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-mutation path, Spark-first (S9; reference deletes one transaction
    then UPDATEs the basket's analysis row, views.py:2773-2796). On immutable
    columnar storage the idiom is delete-as-filter + recompute-downstream
    (Delta's MERGE/DELETE compiles to the same rewrite): drop the first line
    of the first multi-line basket, re-aggregate that basket, emit the
    before/after audit row."""
    li = _li(spark, sf_dir)
    basket = (
        li.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 2)
        .agg(F.min("l_orderkey").alias("b"))
    )
    t = li.join(F.broadcast(basket), li["l_orderkey"] == F.col("b")).drop("b")
    victim = t.agg(F.min("l_linenumber").alias("vln"))
    before = t.agg(
        F.count(F.lit(1)).alias("lines_before"),
        F.sum("l_quantity").alias("items_before"),
        F.sum(money("l_extendedprice")).cast("double").alias("value_before"),
    )
    after = (
        t.crossJoin(F.broadcast(victim))
        .filter(F.col("l_linenumber") != F.col("vln"))
        .agg(
            F.count(F.lit(1)).alias("lines_after"),
            F.sum("l_quantity").alias("items_after"),
            F.sum(money("l_extendedprice")).cast("double").alias("value_after"),
        )
    )
    return (
        basket.withColumnRenamed("b", "basket")
        .crossJoin(F.broadcast(before))
        .crossJoin(F.broadcast(after))
    )


SQL_BASKET_RECOMPUTE = """
WITH b AS (
  SELECT MIN(l_orderkey) AS basket
  FROM (SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING COUNT(*) >= 2)
), t AS (
  SELECT * FROM lineitem WHERE l_orderkey = (SELECT basket FROM b)
), v AS (
  SELECT MIN(l_linenumber) AS vln FROM t
), before AS (
  SELECT COUNT(*) AS lines_before,
         SUM(l_quantity) AS items_before,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS value_before
  FROM t
), after AS (
  SELECT COUNT(*) AS lines_after,
         SUM(l_quantity) AS items_after,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS value_after
  FROM t WHERE l_linenumber <> (SELECT vln FROM v)
)
SELECT b.basket, before.*, after.*
FROM b CROSS JOIN before CROSS JOIN after
"""

SQL_REPAIR_RECOMPUTE_AUDIT = f"""
SELECT rd.*, br.*
FROM ({SQL_REPAIR_DEDUP_AUDIT}) rd CROSS JOIN ({SQL_BASKET_RECOMPUTE}) br
"""


# --- O5: custom categorical ordering ----------------------------------------------

_PRIORITY_ORDER = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


def q_categorical_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed strategic-list ordering (O5; reference sorts segments by a
    hardcoded list, views.py:3438-3455): rank categories by their position
    in a business-defined array, not lexically."""
    orders = _orders(spark, sf_dir)
    agg = orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count"),
        F.round(F.sum(money("o_totalprice")).cast("double"), 2).alias("total_value"),
    )
    pos = F.array_position(
        F.array(*[F.lit(x) for x in _PRIORITY_ORDER]), F.col("o_orderpriority")
    )
    # a priority OUTSIDE the strategic list ranks LAST (len+1), identically
    # on both engines: array_position yields 0 for missing, list_position
    # yields NULL — left unaligned, a dirty/new priority value hash-diverges
    rank = F.when(pos == 0, F.lit(len(_PRIORITY_ORDER) + 1)).otherwise(pos)
    return agg.withColumn("strategic_rank", rank.cast("bigint")).orderBy("strategic_rank")


SQL_CATEGORICAL_ORDER = """
SELECT o_orderpriority,
       COUNT(*) AS order_count,
       ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_value,
       CAST(COALESCE(list_position(['1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW'], o_orderpriority), 6) AS BIGINT) AS strategic_rank
FROM orders
GROUP BY o_orderpriority
"""


# --- slot-merged audit battery (F9 × O5 × S8 × S1/S4/S6) ---------------------------


def q_relational_audits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Four thin relational audits in ONE oracled entry (slot merge, the
    ``pivot_brand_matrices``/``stats_assessment`` idiom — every cell of all
    four former entries still hash-checks): the JSON-field event rollup
    (F9, former ``events_json``) × strategic categorical ordering (O5,
    former ``categorical_order``) × schema introspection (S8, former
    ``schema_introspect``) × the CSV export→validate→land round trip
    (S1+S4+S6, former ``csv_roundtrip``), cross-joined on their tiny
    (≤ handful-of-rows) frames. CSV columns are prefixed ``csv_`` so the
    round trip's ``total_value`` can't collide with the categorical one."""
    from market_data_mining_project_spark.plans.pipeline_io import q_csv_roundtrip

    csv = q_csv_roundtrip(spark, sf_dir).select(
        F.col("imported").alias("csv_imported"),
        F.col("total_value").alias("csv_total_value"),
        F.col("customers").alias("csv_customers"),
    )
    return (
        q_events_json(spark, sf_dir)
        .crossJoin(F.broadcast(q_categorical_order(spark, sf_dir)))
        .crossJoin(F.broadcast(q_schema_introspect(spark, sf_dir)))
        .crossJoin(F.broadcast(csv))
    )




# SQL_CSV_ROUNDTRIP lives in pipeline_io (the module that owns the
# round-trip query); pipeline_io imports nothing from this module, so the
# top-level import cannot cycle.
from market_data_mining_project_spark.plans.pipeline_io import SQL_CSV_ROUNDTRIP

SQL_RELATIONAL_AUDITS = f"""
SELECT * FROM ({SQL_EVENTS_JSON}) ej
CROSS JOIN ({SQL_CATEGORICAL_ORDER}) co
CROSS JOIN ({SQL_SCHEMA_INTROSPECT}) si
CROSS JOIN (SELECT imported AS csv_imported, total_value AS csv_total_value,
                   customers AS csv_customers FROM ({SQL_CSV_ROUNDTRIP}) c) cr
"""


QUERIES = {
    # q_global_stats serves through analytics_domain's merged
    # "stats_assessment" entry (A1 × M16 in one oracled single-row frame);
    # events_json + categorical_order + schema_introspect + csv_roundtrip
    # serve through the merged "relational_audits" entry
    "category_rollup": q_category_rollup,
    "basket_rollup_top25": q_basket_rollup_top25,
    "product_rollup_having": q_product_rollup_having,
    # filtered_scan + search_icontains serve through the merged
    # scan_search_audit entry (r10 slot merge; functions + SQL stay here)
    "scan_search_audit": q_scan_search_audit,
    "pagination": q_pagination,
    # repair_recompute_audit serves through llm_pipeline's merged
    # vocab_stats_audit entry (stats_repair_audit rode vocab_coverage in
    # r6p3; function + SQL stay here, reused through the chain)
    "order_gaps": q_order_gaps,
    "monthly_sales": q_monthly_sales,
    # conditional_horizons serves through analytics_domain's merged
    # brand_outlook entry (function + SQL stay here, reused there)
    "semi_anti_customers": q_semi_anti_customers,
    # pivot_category_year serves through analytics_domain's merged
    # pivot_brand_matrices entry (function + SQL stay here, reused there)
    "sales_rollup": q_sales_rollup,
    "cohort_retention": q_cohort_retention,
    "stratified_sample": q_stratified_sample,
    "relational_audits": q_relational_audits,
}

ORACLE = {
    "category_rollup": SQL_CATEGORY_ROLLUP,
    "basket_rollup_top25": SQL_BASKET_ROLLUP_TOP25,
    "product_rollup_having": SQL_PRODUCT_ROLLUP_HAVING,
    "scan_search_audit": SQL_SCAN_SEARCH_AUDIT,
    "pagination": SQL_PAGINATION,
    "order_gaps": SQL_ORDER_GAPS,
    "monthly_sales": SQL_MONTHLY_SALES,
    "semi_anti_customers": SQL_SEMI_ANTI_CUSTOMERS,
    "sales_rollup": SQL_SALES_ROLLUP,
    "cohort_retention": SQL_COHORT_RETENTION,
    "stratified_sample": SQL_STRATIFIED_SAMPLE,
    "relational_audits": SQL_RELATIONAL_AUDITS,
}
