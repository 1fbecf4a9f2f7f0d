"""Seeded randomized differential harness (r8, VERDICT item 2).

Review passes 8–11 kept finding latent cross-engine divergences exactly
where the fixed fixtures had no coverage (NULL categories, '1.5' casts,
.xx5 rounding edges, ties at LIMIT boundaries). This harness hunts that
bug class SYSTEMATICALLY: a seeded generator produces random small tables
stacked with the hostile inputs (NULLs in keys/values/text, heavy ties,
.xx5 half-edges, unicode/empty/whitespace text, empty/singleton tables,
skewed keys), pushes them through the core operators on Spark AND DuckDB,
and diffs the outputs through the oracle harness comparator.

Every failure reproduces from the printed seed:
    FUZZ REPRO seed=<n> case=<name>
"""

from __future__ import annotations

import os
import random

import duckdb
import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from market_data_mining_project_spark.operators import relational as R
from market_data_mining_project_spark.operators import temporal as TEMP
from tests.oracle_harness import compare

#: 20 seeds/case in the CI budget; crank via SPARK_GRAFT_FUZZ_SEEDS for a
#: soak run (seeds are stable: seed k means the same table at any count)
N_SEEDS = int(os.environ.get("SPARK_GRAFT_FUZZ_SEEDS", "20"))

_CATS = ["a", "b", "B", "Ü", "über", "", " pad ", None]
_TXTS = [
    "Alpha Beta",
    "alphabet",
    "γράμμα",  # greek
    "",
    "   ",
    "naïve mix",
    "x" * 50,
    None,
    "12.5",
    "tail b",
]


def _gen_rows(rng: random.Random, n: int) -> list[tuple]:
    rows = []
    for i in range(n):
        k = None if rng.random() < 0.10 else (1 if rng.random() < 0.35 else rng.randint(0, 6))
        roll = rng.random()
        if roll < 0.12:
            v = None
        elif roll < 0.40:
            v = float(rng.randint(0, 5))  # heavy ties
        elif roll < 0.60:
            v = (rng.randint(0, 99) * 10 + 5) / 1000.0  # .xx5 half-edges
        else:
            v = round(rng.uniform(-100.0, 100.0), 3)
        d = None if rng.random() < 0.05 else rng.randint(0, 30)
        rows.append((i, k, rng.choice(_CATS), v, d, rng.choice(_TXTS)))
    return rows


_SCHEMA = "id long, k long, cat string, v double, d long, txt string"


def _registered_pair(spark, rng: random.Random):
    """One random table in BOTH engines (arrow → DuckDB keeps int columns
    int — a pandas round-trip would float-ify nullable ints)."""
    n = rng.choice([0, 1, 2, rng.randint(3, 50)])
    rows = _gen_rows(rng, n)
    tbl = pa.table(
        {
            "id": pa.array([r[0] for r in rows], pa.int64()),
            "k": pa.array([r[1] for r in rows], pa.int64()),
            "cat": pa.array([r[2] for r in rows], pa.string()),
            "v": pa.array([r[3] for r in rows], pa.float64()),
            "d": pa.array([r[4] for r in rows], pa.int64()),
            "txt": pa.array([r[5] for r in rows], pa.string()),
        }
    )
    sdf = spark.createDataFrame(rows, _SCHEMA)
    con = duckdb.connect()
    con.register("t", tbl)
    return sdf, con


# --- cases: each returns (spark_df, duck_rel) over the same random table ----


def case_grouped_rollup(sdf, con, rng):
    buckets = rng.choice([1, 3, 16])
    got = R.salted_agg(
        sdf,
        ["k"],
        {"s": ("sum", "v"), "c": ("count", "v"), "mx": ("max", "d"), "mn": ("min", "d")},
        salt_buckets=buckets,
    )
    rel = con.sql(
        "SELECT k, SUM(v) AS s, COUNT(v) AS c, MAX(d) AS mx, MIN(d) AS mn FROM t GROUP BY k"
    )
    return got, rel


def case_salted_count_distinct(sdf, con, rng):
    got = R.salted_agg(
        sdf, ["k"], {"nd": ("count_distinct", "cat")},
        salt_buckets=rng.choice([2, 8]), salt_col="cat",
    )
    rel = con.sql("SELECT k, COUNT(DISTINCT cat) AS nd FROM t GROUP BY k")
    return got, rel


def case_top_n(sdf, con, rng):
    n = rng.randint(1, 12)
    asc = rng.random() < 0.5
    got = R.top_n(sdf, n, ["v", "id"], ascending=asc)
    order = "v ASC NULLS FIRST, id ASC" if asc else "v DESC NULLS LAST, id DESC"
    rel = con.sql(f"SELECT * FROM t ORDER BY {order} LIMIT {n}")
    return got, rel


def case_paginate(sdf, con, rng):
    page, size = rng.randint(0, 4), rng.randint(1, 10)
    got = R.paginate(sdf, [F.col("v").asc(), F.col("id").asc()], page, size)
    rel = con.sql(
        f"SELECT * FROM t ORDER BY v ASC NULLS FIRST, id ASC "
        f"LIMIT {size} OFFSET {page * size}"
    )
    return got, rel


def case_keyset_page(sdf, con, rng):
    after = rng.choice([None, rng.randint(-1, 40)])
    size = rng.randint(1, 10)
    got = R.keyset_page(sdf, "id", after, size)
    where = "" if after is None else f"WHERE id > {after}"
    rel = con.sql(f"SELECT * FROM t {where} ORDER BY id ASC LIMIT {size}")
    return got, rel


def case_dedup_keep_max(sdf, con, rng):
    got = R.dedup_keep_max(sdf, ["k"], ["v", "id"])
    rel = con.sql(
        "SELECT * FROM t QUALIFY ROW_NUMBER() OVER "
        "(PARTITION BY k ORDER BY v DESC NULLS LAST, id DESC) = 1"
    )
    return got, rel


def case_lag_diff(sdf, con, rng):
    got = R.lag_diff(sdf, "k", "id", out="gap")
    rel = con.sql(
        "SELECT *, id - LAG(id) OVER (PARTITION BY k ORDER BY id) AS gap FROM t"
    )
    return got, rel


def case_ntile_histogram(sdf, con, rng):
    n = rng.randint(1, 7)
    desc = rng.random() < 0.5
    got = R.ntile_score_histogram(sdf, "v", n, "s", "id", descending=desc)
    order = "v DESC NULLS LAST, id ASC" if desc else "v ASC NULLS FIRST, id ASC"
    rel = con.sql(f"SELECT *, CAST(NTILE({n}) OVER (ORDER BY {order}) AS INT) AS s FROM t")
    return got, rel


def case_search(sdf, con, rng):
    needle = rng.choice(["a", "ALPHA", "γ", "1", "2.5", "pad", "5", "B"])
    got = R.search(sdf, needle, ["txt", "cat", "v", "k"])
    low = needle.lower().replace("'", "''")
    preds = [f"contains(lower(txt), '{low}')", f"contains(lower(cat), '{low}')"]
    try:
        num = float(needle)
        preds += [f"v = {num!r}", f"k = {num!r}"]
    except ValueError:
        pass
    rel = con.sql(f"SELECT * FROM t WHERE {' OR '.join(preds)}")
    return got, rel


def case_filter_project(sdf, con, rng):
    lo, hi = sorted((round(rng.uniform(-50, 50), 2), round(rng.uniform(-50, 50), 2)))
    got = R.project(R.filter_ranges(sdf, {"v": (lo, hi)}), ["id", "v"])
    rel = con.sql(f"SELECT id, v FROM t WHERE v >= {lo} AND v <= {hi}")
    return got, rel


def _events_pair(spark, rng: random.Random):
    """(eid, k, ts) event table: NULL ts rows test the exclusion contract;
    duplicate (k, ts) pairs test the tiebreaker."""
    n = rng.choice([0, 1, rng.randint(3, 40)])
    rows = [
        (
            i,
            rng.randint(0, 3),
            None if rng.random() < 0.08 else rng.randint(0, 120),
        )
        for i in range(n)
    ]
    tbl = pa.table(
        {
            "eid": pa.array([r[0] for r in rows], pa.int64()),
            "k": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array([r[2] for r in rows], pa.int64()),
        }
    )
    sdf = spark.createDataFrame(rows, "eid long, k long, ts long")
    con = duckdb.connect()
    con.register("t", tbl)
    return sdf, con


def case_sessionize(spark, rng):
    sdf, con = _events_pair(spark, rng)
    gap = rng.randint(1, 25)
    bucket = rng.choice([None, 7, 50])  # bucketed path vs the SQL twin too
    got = TEMP.sessionize(sdf, "k", "ts", gap, "eid", bucket_secs=bucket)
    rel = con.sql(  # noqa: F841 — con returned too: a dropped connection closes the relation
        f"""
        WITH base AS (SELECT * FROM t WHERE ts IS NOT NULL),
        lagged AS (
          SELECT *, ts - LAG(ts) OVER (PARTITION BY k ORDER BY ts, eid) AS g
          FROM base
        )
        SELECT eid, k, ts,
               CAST(SUM(CASE WHEN g <= {gap} THEN 0 ELSE 1 END) OVER (
                 PARTITION BY k ORDER BY ts, eid ROWS UNBOUNDED PRECEDING
               ) AS BIGINT) AS session_seq
        FROM lagged
        """
    )
    return got, rel, con


def case_asof(spark, rng):
    nl = rng.choice([0, 1, rng.randint(3, 30)])
    nr = rng.choice([0, 1, rng.randint(3, 30)])
    lrows = [
        (i, rng.randint(0, 2), None if rng.random() < 0.08 else rng.randint(0, 100))
        for i in range(nl)
    ]
    rseen: dict = {}
    for _ in range(nr):
        key = (rng.randint(0, 2), None if rng.random() < 0.08 else rng.randint(0, 100))
        rseen[key] = None if rng.random() < 0.15 else round(rng.uniform(0, 10), 3)
    rrows = [(k, ts, p) for (k, ts), p in rseen.items()]
    left = spark.createDataFrame(lrows, "lid long, k long, lts long")
    right = spark.createDataFrame(rrows, "k long, rts long, p double")
    con = duckdb.connect()
    con.register(
        "lt",
        pa.table(
            {
                "lid": pa.array([r[0] for r in lrows], pa.int64()),
                "k": pa.array([r[1] for r in lrows], pa.int64()),
                "lts": pa.array([r[2] for r in lrows], pa.int64()),
            }
        ),
    )
    con.register(
        "rt",
        pa.table(
            {
                "k": pa.array([r[0] for r in rrows], pa.int64()),
                "rts": pa.array([r[1] for r in rrows], pa.int64()),
                "p": pa.array([r[2] for r in rrows], pa.float64()),
            }
        ),
    )
    direction = rng.choice(["backward", "forward", "nearest"])
    tol = rng.choice([None, rng.randint(1, 30)])
    bucket = rng.choice([None, 10, 1000])  # bucketed stitch vs native ASOF
    j = TEMP.asof_join(
        left, right, "k", "lts", "rts", ["p"],
        tolerance_secs=tol, bucket_secs=bucket, direction=direction,
    )
    got = j.select(
        "lid", "k", "lts",
        F.coalesce(F.col("p"), F.lit(-999.0)).alias("p"),
        F.coalesce(F.col("matched_ts"), F.lit(-1).cast("long")).alias("mts"),
    )
    tol_pred = "TRUE" if tol is None else f"ABS(lts - mts) <= {tol}"
    if direction in ("backward", "forward"):
        op = ">=" if direction == "backward" else "<="
        match_sql = f"""
          SELECT l.lid, l.k, l.lts, r.p AS mp, r.rts AS mts
          FROM l ASOF LEFT JOIN r ON l.k = r.k AND l.lts {op} r.rts
        """
    else:
        # nearest = closer of backward/forward; exact ties resolve backward
        match_sql = """
          SELECT b.lid, b.k, b.lts,
                 CASE WHEN b.mts IS NOT NULL AND (f.mts IS NULL
                           OR b.lts - b.mts <= f.mts - b.lts)
                      THEN b.mp ELSE f.mp END AS mp,
                 CASE WHEN b.mts IS NOT NULL AND (f.mts IS NULL
                           OR b.lts - b.mts <= f.mts - b.lts)
                      THEN b.mts ELSE f.mts END AS mts
          FROM (SELECT l.lid, l.k, l.lts, r.p AS mp, r.rts AS mts
                FROM l ASOF LEFT JOIN r ON l.k = r.k AND l.lts >= r.rts) b
          JOIN (SELECT l.lid, r.p AS mp, r.rts AS mts
                FROM l ASOF LEFT JOIN r ON l.k = r.k AND l.lts <= r.rts) f
          USING (lid)
        """
    rel = con.sql(
        f"""
        WITH l AS (SELECT * FROM lt WHERE lts IS NOT NULL),
        r AS (SELECT * FROM rt WHERE rts IS NOT NULL),
        m AS ({match_sql})
        SELECT lid, k, lts,
               COALESCE(CASE WHEN {tol_pred} THEN mp END, -999.0) AS p,
               COALESCE(CASE WHEN {tol_pred} THEN mts END, CAST(-1 AS BIGINT)) AS mts
        FROM m
        """
    )
    return got, rel, con


def case_histogram_quantiles(sdf, con, rng):
    from market_data_mining_project_spark.operators import sketches as SK

    # integer-domain metric: derive cents from v (NULLs ride through and
    # must be excluded identically by both engines). FLOOR explicitly:
    # a bare double→int CAST diverges (Spark truncates toward zero,
    # DuckDB rounds) — the known cross-engine cast trap
    cents = sdf.withColumn("cents", F.floor(F.col("v") * 100).cast("long"))
    got = SK.histogram_quantiles(
        SK.value_histogram(cents, ["k"], "cents"), ["k"], (0.25, 0.5, 0.9)
    )
    rel = con.sql(
        """
        SELECT k,
               quantile_cont(CAST(cents AS DOUBLE), 0.25) AS q0,
               quantile_cont(CAST(cents AS DOUBLE), 0.5) AS q1,
               quantile_cont(CAST(cents AS DOUBLE), 0.9) AS q2,
               COUNT(*) AS n_values
        FROM (SELECT k, CAST(FLOOR(v * 100) AS BIGINT) AS cents FROM t WHERE v IS NOT NULL)
        GROUP BY k
        """
    )
    return got, rel


def case_ohlc_rollup(spark, rng):
    sdf, con = _events_pair(spark, rng)
    bucket = rng.choice([7, 30, 60])
    vals = sdf.withColumn(
        "v", F.when(F.col("eid") % 7 == 0, None).otherwise((F.col("eid") * 13 % 50) / 2.0)
    )
    got = TEMP.ohlc_rollup(vals, "ts", "v", ["k"], bucket, "eid")
    # the twin re-derives open/close via row_number windows (a different
    # algorithm than min_by/max_by over the tiebreak struct)
    rel = con.sql(
        f"""
        WITH vals AS (
          SELECT *, CASE WHEN eid % 7 = 0 THEN NULL
                         ELSE CAST((eid * 13 % 50) AS DOUBLE) / 2.0 END AS v,
                 CAST(FLOOR(CAST(ts AS DOUBLE) / {bucket}) * {bucket} AS BIGINT)
                   AS bucket_epoch
          FROM t
        ), rn AS (
          SELECT *,
                 ROW_NUMBER() OVER (PARTITION BY k, bucket_epoch ORDER BY ts, eid) AS ra,
                 ROW_NUMBER() OVER (PARTITION BY k, bucket_epoch ORDER BY ts DESC, eid DESC) AS rd
          FROM vals
        )
        SELECT k, bucket_epoch,
               MAX(CASE WHEN ra = 1 THEN v END) AS open,
               MAX(v) AS high, MIN(v) AS low,
               MAX(CASE WHEN rd = 1 THEN v END) AS close,
               COUNT(*) AS n_events,
               ROUND(SUM(v), 2) AS total_value
        FROM rn GROUP BY k, bucket_epoch
        """
    )
    return got, rel, con


def case_range_join_count(spark, rng):
    nl = rng.choice([0, 1, rng.randint(3, 30)])
    nr = rng.choice([0, 1, rng.randint(3, 30)])
    lrows = [
        (i, None if rng.random() < 0.08 else rng.randint(0, 100)) for i in range(nl)
    ]
    rrows = [
        (None if rng.random() < 0.08 else rng.randint(0, 100), round(rng.uniform(0, 9), 2))
        for _ in range(nr)
    ]
    left = spark.createDataFrame(lrows, "lid long, lts long")
    right = spark.createDataFrame(rrows, "rts long, rv double")
    con = duckdb.connect()
    con.register(
        "lt",
        pa.table(
            {
                "lid": pa.array([r[0] for r in lrows], pa.int64()),
                "lts": pa.array([r[1] for r in lrows], pa.int64()),
            }
        ),
    )
    con.register(
        "rt",
        pa.table(
            {
                "rts": pa.array([r[0] for r in rrows], pa.int64()),
                "rv": pa.array([r[1] for r in rrows], pa.float64()),
            }
        ),
    )
    radius = rng.choice([0, 1, rng.randint(2, 20)])
    band = rng.choice([None, 1, 3, 50])  # band width must never change results
    got = TEMP.range_join_count(left, right, "lts", "rts", radius, agg_value="rv", band_secs=band)
    rel = con.sql(
        f"""
        SELECT l.lid, l.lts,
               CAST(COUNT(r.rts) AS BIGINT) AS n_in_range,
               ROUND(COALESCE(SUM(r.rv), 0.0), 2) AS value_in_range
        FROM lt l LEFT JOIN rt r ON ABS(l.lts - r.rts) <= {radius}
        GROUP BY l.lid, l.lts
        """
    )
    return got, rel, con


def case_pairwise_rules(spark, rng):
    """Association-rule metrics at RANDOM min_support values — hunting the
    threshold class pass 10 fixed by hand: min_count must be the MLlib-exact
    ceil of the IEEE double product on every engine (int() floors one below
    the threshold at products like 100 x 0.29)."""
    from market_data_mining_project_spark.operators import rules as RULES

    n_baskets = rng.choice([1, 3, rng.randint(4, 25)])
    items = ["a", "b", "c", "d", "e", "f"]
    rows = []
    for b in range(n_baskets):
        for _ in range(rng.randint(0, 5)):
            rows.append((b, rng.choice(items)))  # duplicate (basket, item) legal
    min_support = rng.choice([0.01, 0.1, 0.29, 0.33, round(rng.uniform(0.05, 0.6), 2)])
    sdf = spark.createDataFrame(rows, "basket long, item string")
    con = duckdb.connect()
    con.register(
        "t",
        pa.table(
            {
                "basket": pa.array([r[0] for r in rows], pa.int64()),
                "item": pa.array([r[1] for r in rows], pa.string()),
            }
        ),
    )
    got = RULES.pairwise_rules(sdf, "basket", "item", min_support=min_support)
    rel = con.sql(
        f"""
        WITH ib AS (SELECT DISTINCT basket, item FROM t),
        tot AS (SELECT COUNT(DISTINCT basket) AS n FROM ib),
        mc AS (SELECT GREATEST(1, CAST(CEIL(n * {min_support!r}) AS BIGINT)) AS m, n FROM tot),
        freq AS (
          SELECT item, COUNT(*) AS item_baskets FROM ib GROUP BY item
          HAVING COUNT(*) >= (SELECT m FROM mc)
        ),
        pairs AS (
          SELECT a.item AS item_a, b.item AS item_b, COUNT(*) AS pair_baskets
          FROM ib a JOIN ib b ON a.basket = b.basket AND a.item < b.item
          WHERE a.item IN (SELECT item FROM freq) AND b.item IN (SELECT item FROM freq)
          GROUP BY 1, 2 HAVING COUNT(*) >= (SELECT m FROM mc)
        ),
        directed AS (
          SELECT item_a AS antecedent, item_b AS consequent, pair_baskets FROM pairs
          UNION ALL
          SELECT item_b, item_a, pair_baskets FROM pairs
        )
        SELECT d.antecedent, d.consequent,
               CAST(d.pair_baskets AS BIGINT) AS pair_baskets,
               CAST(fa.item_baskets AS BIGINT) AS antecedent_baskets,
               CAST(fb.item_baskets AS BIGINT) AS consequent_baskets,
               ROUND(CAST(d.pair_baskets AS DOUBLE) / (SELECT n FROM mc), 6) AS support,
               ROUND(CAST(d.pair_baskets AS DOUBLE) / fa.item_baskets, 6) AS confidence,
               ROUND((CAST(d.pair_baskets AS DOUBLE) / fa.item_baskets)
                     / (CAST(fb.item_baskets AS DOUBLE) / (SELECT n FROM mc)), 6) AS lift
        FROM directed d
        JOIN freq fa ON d.antecedent = fa.item
        JOIN freq fb ON d.consequent = fb.item
        """
    )
    return got, rel, con


def case_pivot_matrix(sdf, con, rng):
    """groupBy().pivot() matrix vs DuckDB conditional aggregation. Explicit
    pivot values (the scale-friendly schema-pinned form); sum/avg only —
    Spark's pivot emits NULL for an absent (row, col) combo where a
    conditional COUNT would emit 0, so count is not cross-engine
    pivot-expressible."""
    from market_data_mining_project_spark.operators import diff as DF_

    agg = rng.choice(["sum", "avg"])
    vals = ["a", "b", "über"]
    got = DF_.pivot_matrix(sdf, "k", "cat", "v", agg=agg, values=vals)
    fn = {"sum": "SUM", "avg": "AVG"}[agg]
    cells = ", ".join(
        f"{fn}(CASE WHEN cat = '{c}' THEN v END) AS \"{c}\"" for c in vals
    )
    rel = con.sql(f"SELECT k, {cells} FROM t GROUP BY k")
    return got, rel


def case_token_budget(sdf, con, rng):
    """Bucketed two-phase token-budget selection vs the naive window-cumsum
    form in DuckDB — random budgets and bucket counts stress the boundary
    bucket. NULL scores are out of contract (score_range must bound the
    column), so both sides exclude them; NULL token counts contribute
    nothing on either engine."""
    from market_data_mining_project_spark.operators import text as TXT_

    budget = rng.choice([0, 1, rng.randint(2, 60)])
    buckets = rng.choice([3, 10, 1000])
    scored = sdf.filter(F.col("v").isNotNull())
    got = TXT_.token_budget_select(
        scored, "cat", "v", "d", "id", budget,
        num_buckets=buckets, score_range=(-100.0, 100.0),
    )
    rel = con.sql(
        f"""
        SELECT id, k, cat, v, d, txt FROM (
          SELECT *, COALESCE(SUM(d) OVER (
            PARTITION BY cat ORDER BY v DESC, id ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre
          FROM t WHERE v IS NOT NULL
        ) WHERE pre < {budget}
        """
    )
    return got, rel


def case_span_coverage(sdf, con, rng):
    """Span-level dup coverage (Lee et al. positional n-grams) vs the
    DuckDB gram twin at a RANDOM gram width and min_docs — the oracled
    entry pins only n=5/min_docs=2."""
    from market_data_mining_project_spark.operators import dedup as D_

    n = rng.randint(1, 4)
    min_docs = rng.randint(2, 3)
    got = D_.dup_span_coverage(sdf, "txt", "id", n=n, min_docs=min_docs)
    rel = con.sql(
        f"""
        WITH toks AS (
          SELECT id,
                 list_filter(regexp_split_to_array(trim(txt), '\\s+'), x -> x <> '') AS ts
          FROM t WHERE txt IS NOT NULL
        ), g AS (
          SELECT id,
                 unnest([array_to_string(ts[i:i+{n - 1}], ' ')
                         FOR i IN range(1, greatest(len(ts) - {n}, 0) + 2)]) AS gram
          FROM toks WHERE len(ts) > 0
        ), pg AS (
          SELECT id, gram, COUNT(*) AS n_pos FROM g GROUP BY 1, 2
        ), sh AS (
          SELECT gram FROM pg GROUP BY gram HAVING COUNT(*) >= {min_docs}
        )
        SELECT pg.id,
               CAST(SUM(n_pos) AS BIGINT) AS n_spans,
               CAST(SUM(CASE WHEN sh.gram IS NOT NULL THEN n_pos ELSE 0 END) AS BIGINT)
                 AS dup_spans
        FROM pg LEFT JOIN sh USING (gram)
        GROUP BY pg.id
        """
    )
    return got, rel


def case_mixture_plan(spark, rng):
    """Uniform mixture-plan arithmetic at random volumes (zero / NULL /
    missing sources) vs the DuckDB twin of SQL_MIXTURE_PLAN — the
    IEEE-double expression structure must agree term for term."""
    from market_data_mining_project_spark.operators import corpus as C_

    srcs = ["sa", "sb", "sc", None]
    n = rng.randint(1, 12)
    rows = [
        (
            rng.choice(srcs),
            rng.choice([None, 0, 0, rng.randint(1, 500)]),
        )
        for _ in range(n)
    ]
    rows.append(("sa", rng.randint(1, 500)))  # ≥1 positive source: a plan exists
    sdf = spark.createDataFrame(rows, "src string, tk long")
    con = duckdb.connect()
    con.register(
        "t",
        pa.table(
            {
                "src": pa.array([r[0] for r in rows], pa.string()),
                "tk": pa.array([r[1] for r in rows], pa.int64()),
            }
        ),
    )
    got = C_.mixture_weights(sdf, "src", "tk")
    rel = con.sql(
        """
        WITH tok AS (
          SELECT src AS source, CAST(COALESCE(SUM(tk), 0) AS BIGINT) AS tokens
          FROM t GROUP BY src
        ), s AS (
          SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM tok WHERE tokens > 0
        ), b AS (
          SELECT MIN(tokens * 1.0 / (1.0 / s.n)) AS budget FROM tok, s WHERE tokens > 0
        )
        SELECT t.source, t.tokens,
               ROUND(CASE WHEN t.tokens > 0 THEN 1.0 / s.n ELSE 0.0 END, 6) AS weight,
               ROUND(CASE WHEN t.tokens > 0 THEN (1.0 / s.n) * b.budget / t.tokens
                          ELSE 0.0 END, 6) AS sample_rate,
               CAST(TRUNC(CASE WHEN t.tokens > 0 THEN (1.0 / s.n) * b.budget
                               ELSE 0.0 END) AS BIGINT) AS expected_tokens
        FROM tok t, s, b
        """
    )
    return got, rel, con


def case_document_chunks(spark, rng):
    """Fixed-width overlapping char chunking vs the DuckDB twin at RANDOM
    (chunk_size, overlap) — the oracled entry pins only (120, 30). Unicode
    multi-byte characters land ON chunk boundaries: both engines must count
    CHARACTERS (not bytes) in length/substring and hash the chunk's UTF-8
    bytes identically."""
    from market_data_mining_project_spark.operators import text as TXT_

    chunk = rng.randint(2, 40)
    overlap = rng.randint(0, chunk - 1)
    stride = chunk - overlap
    pool = ["αβγδε", "ascii text here", "naïve é ü ñ", "", "x" * 95, "中文字符串测试",
            "mixed ü中x", None, " padded  ", "🙂emoji🙂"]
    n = rng.choice([0, 1, rng.randint(2, 25)])
    rows = [(i, rng.choice(pool)) for i in range(n)]
    sdf = spark.createDataFrame(rows, "id long, txt string")
    con = duckdb.connect()
    con.register(
        "t",
        pa.table(
            {
                "id": pa.array([r[0] for r in rows], pa.int64()),
                "txt": pa.array([r[1] for r in rows], pa.string()),
            }
        ),
    )
    got = TXT_.document_chunks(sdf, "txt", "id", chunk_size=chunk, overlap=overlap)
    rel = con.sql(
        f"""
        WITH d AS (
          SELECT id, txt, length(txt) AS len FROM t WHERE txt IS NOT NULL
        ), counts AS (
          SELECT id, txt,
                 CASE WHEN len <= {chunk} THEN CAST(0 AS BIGINT)
                      ELSE (len - {chunk} + {stride - 1}) // {stride} END AS last_idx
          FROM d
        ), exploded AS (
          SELECT id, txt, unnest(generate_series(0, last_idx)) AS chunk_idx
          FROM counts
        )
        SELECT id, chunk_idx,
               CAST(chunk_idx * {stride} + 1 AS BIGINT) AS chunk_start,
               CAST(length(substring(txt, CAST(chunk_idx * {stride} + 1 AS INT), {chunk})) AS BIGINT)
                   AS chunk_len,
               md5(substring(txt, CAST(chunk_idx * {stride} + 1 AS INT), {chunk})) AS chunk_md5
        FROM exploded
        """
    )
    return got, rel, con



_TABLE_CASES = {
    "grouped_rollup": case_grouped_rollup,
    "salted_count_distinct": case_salted_count_distinct,
    "top_n": case_top_n,
    "paginate": case_paginate,
    "keyset_page": case_keyset_page,
    "dedup_keep_max": case_dedup_keep_max,
    "lag_diff": case_lag_diff,
    "ntile_histogram": case_ntile_histogram,
    "search": case_search,
    "filter_project": case_filter_project,
    "histogram_quantiles": case_histogram_quantiles,
    "pivot_matrix": case_pivot_matrix,
    "token_budget": case_token_budget,
    "span_coverage": case_span_coverage,
}

_EVENT_CASES = {
    "sessionize": case_sessionize,
    "asof_join": case_asof,
    "ohlc_rollup": case_ohlc_rollup,
    "range_join_count": case_range_join_count,
    "pairwise_rules": case_pairwise_rules,
    "mixture_plan": case_mixture_plan,
    "document_chunks": case_document_chunks,
}


@pytest.mark.parametrize("case", sorted(_TABLE_CASES))
def test_fuzz_relational_case_matches_duckdb(spark, case):
    fn = _TABLE_CASES[case]
    for seed in range(N_SEEDS):
        rng = random.Random(1000 * seed + 17)
        sdf, con = _registered_pair(spark, rng)
        got, rel = fn(sdf, con, rng)
        errors = compare(case, got, rel)
        assert not errors, f"FUZZ REPRO seed={seed} case={case}\n" + "\n".join(errors)


@pytest.mark.parametrize("case", sorted(_EVENT_CASES))
def test_fuzz_temporal_case_matches_duckdb(spark, case):
    fn = _EVENT_CASES[case]
    for seed in range(N_SEEDS):
        rng = random.Random(9000 * seed + 23)
        got, rel, con = fn(spark, rng)  # con held: GC closes the relation with it
        errors = compare(case, got, rel)
        con.close()
        assert not errors, f"FUZZ REPRO seed={seed} case={case}\n" + "\n".join(errors)


# --- stats family: pure-Python/numpy references (r9, VERDICT item 4) --------
#
# χ²/Welch/MWU/KS return scalar dicts, not frames, and their p-values use the
# repo's own special functions (scipy is not in this container) — so the
# differential reference recomputes STATISTIC/dof/effect-size with an
# independent algorithm (full sorts and dict contingencies instead of
# histogram walks and window cumsums) in plain Python, and recomputes the
# p-value through the same special function ON THE REFERENCE STATISTIC: any
# plumbing divergence between the distributed statistic and the scalar tail
# still surfaces. Generated micro-data stacks the hostile features the fixed
# fixtures lack: ties everywhere, NULL groups/values, constant groups, n=1,
# absent groups (the documented ValueError contract).

import math

from market_data_mining_project_spark.functions import stats as ST
from market_data_mining_project_spark.operators import diff as DIFF

_G1, _G2 = "g1", "g2"


def _stats_rows(rng: random.Random):
    groups = [_G1, _G2, "other", None]
    n = rng.choice([2, 3, rng.randint(4, 40)])
    rows = []
    for i in range(n):
        g = rng.choice(groups)
        roll = rng.random()
        if roll < 0.10:
            v = None
        elif roll < 0.55:
            v = float(rng.randint(0, 4))  # heavy ties
        elif roll < 0.65:
            v = 7.0  # constant-group fodder
        else:
            v = round(rng.uniform(-10, 10), 2)
        rows.append((i, g, v))
    return rows


def _close(a, b, tol=1e-9):
    if a is None or b is None:
        return a is b
    fa, fb = float(a), float(b)
    if math.isnan(fa) or math.isnan(fb):
        return math.isnan(fa) and math.isnan(fb)
    if math.isinf(fa) or math.isinf(fb):
        return fa == fb
    return math.isclose(fa, fb, rel_tol=tol, abs_tol=tol)


def _assert_dicts_close(case, seed, got, want):
    assert set(got) == set(want), f"FUZZ REPRO seed={seed} case={case}: keys {got} vs {want}"
    for k in want:
        assert _close(got[k], want[k]), (
            f"FUZZ REPRO seed={seed} case={case}: {k} got={got[k]!r} want={want[k]!r}"
        )


def stats_case_welch(spark, rng):
    rows = _stats_rows(rng)
    df = spark.createDataFrame(rows, "id long, g string, v double")
    samples = {
        g: [v for (_, gg, v) in rows if gg == g and v is not None] for g in (_G1, _G2)
    }
    bad = [g for g, s in samples.items() if len(s) < 2]
    if bad:
        with pytest.raises(ValueError):
            DIFF.welch_t_test(df, "g", "v", _G1, _G2)
        return
    import numpy as np

    a, b = (np.array(samples[g], dtype=float) for g in (_G1, _G2))
    na, nb = len(a), len(b)
    va, vb = a.var(ddof=1), b.var(ddof=1)
    se2 = va / na + vb / nb
    if se2 == 0:
        d0 = a.mean() - b.mean()
        t = float("nan") if d0 == 0 else math.copysign(float("inf"), d0)
        dof, p = float("nan"), (float("nan") if d0 == 0 else 0.0)
    else:
        t = (a.mean() - b.mean()) / se2**0.5
        dof = se2**2 / ((va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1))
        p = 2.0 * ST.t_sf(abs(t), dof)
    pooled = (((na - 1) * va + (nb - 1) * vb) / (na + nb - 2)) ** 0.5
    want = {
        "statistic": float(t),
        "dof": float(dof),
        "p_value": float(p),
        "cohens_d": float((a.mean() - b.mean()) / pooled) if pooled > 0 else 0.0,
        "mean_1": float(a.mean()),
        "mean_2": float(b.mean()),
    }
    return DIFF.welch_t_test(df, "g", "v", _G1, _G2), want


def stats_case_chi2(spark, rng):
    # second label column: coarse value buckets (NULL-able both sides)
    rows = [
        (i, g, None if v is None else f"b{int(v) % 3}")
        for (i, g, v) in _stats_rows(rng)
    ]
    df = spark.createDataFrame(rows, "id long, g string, c string")
    obs: dict = {}
    for _, g, c in rows:
        if g is None or c is None:
            continue
        obs[(g, c)] = obs.get((g, c), 0) + 1
    if not obs:
        with pytest.raises(ValueError):
            DIFF.chi2_test(df, "g", "c")
        return
    n = sum(obs.values())
    row_t: dict = {}
    col_t: dict = {}
    for (g, c), o in obs.items():
        row_t[g] = row_t.get(g, 0) + o
        col_t[c] = col_t.get(c, 0) + o
    # components over OBSERVED cells only — chi2_components aggregates the
    # (row, col) cell frame, absent combos contribute nothing (documented
    # reference-parity semantics, mirrored here)
    chi2 = sum((o - row_t[g] * col_t[c] / n) ** 2 / (row_t[g] * col_t[c] / n)
               for (g, c), o in obs.items())
    r, c_ = len(row_t), len(col_t)
    dof = (r - 1) * (c_ - 1)
    k = min(r, c_)
    want = {
        "statistic": float(chi2),
        "dof": int(dof),
        "p_value": float(ST.chi2_sf(chi2, dof)) if dof > 0 else 1.0,
        "cramers_v": float((chi2 / (n * (k - 1))) ** 0.5) if k > 1 and n > 0 else 0.0,
        "n": float(n),
    }
    return DIFF.chi2_test(df, "g", "c"), want


def stats_case_mwu(spark, rng):
    rows = _stats_rows(rng)
    df = spark.createDataFrame(rows, "id long, g string, v double")
    pooled = sorted(
        (v, g) for (_, g, v) in rows if g in (_G1, _G2) and v is not None
    )
    n1 = sum(1 for _, g in pooled if g == _G1)
    n2 = len(pooled) - n1
    if n1 == 0 or n2 == 0:
        with pytest.raises(ValueError):
            DIFF.mann_whitney_u(df, "g", "v", _G1, _G2)
        return
    # tie-aware average ranks via one full sort (independent algorithm —
    # the operator never ranks rows, it walks the value histogram)
    ranks: dict = {}
    i = 0
    while i < len(pooled):
        j = i
        while j < len(pooled) and pooled[j][0] == pooled[i][0]:
            j += 1
        avg = (i + 1 + j) / 2.0  # mean of ranks i+1..j
        for t in range(i, j):
            ranks[t] = avg
        i = j
    r1 = sum(ranks[t] for t in range(len(pooled)) if pooled[t][1] == _G1)
    n = n1 + n2
    tie_term = 0.0
    i = 0
    while i < len(pooled):
        j = i
        while j < len(pooled) and pooled[j][0] == pooled[i][0]:
            j += 1
        t = float(j - i)
        tie_term += t**3 - t
        i = j
    u1 = r1 - n1 * (n1 + 1) / 2.0
    u = min(u1, n1 * n2 - u1)
    mu = n1 * n2 / 2.0
    variance = n1 * n2 * (n + 1) / 12.0 - n1 * n2 * tie_term / (12.0 * n * (n - 1))
    sigma = variance**0.5 if variance > 0 else 0.0
    z = (u - mu) / sigma if sigma > 0 else 0.0
    want = {
        "statistic": float(u),
        "z": float(z),
        "p_value": float(min(2.0 * ST.norm_sf(abs(z)), 1.0)),
        "rank_biserial": float(1.0 - 2.0 * u1 / (n1 * n2)),
    }
    return DIFF.mann_whitney_u(df, "g", "v", _G1, _G2), want


def stats_case_ks(spark, rng):
    rows = _stats_rows(rng)
    df = spark.createDataFrame(rows, "id long, g string, v double")
    s1 = sorted(v for (_, g, v) in rows if g == _G1 and v is not None)
    s2 = sorted(v for (_, g, v) in rows if g == _G2 and v is not None)
    # the operator pools NULL values into the ECDF grid (they form their own
    # histogram row); scipy-style references drop them — mirror the operator:
    # a NULL value contributes to neither count, so it cannot move D, but it
    # IS a grid point. Dropping it is therefore equivalent; keep drop form.
    if not s1 or not s2:
        with pytest.raises(ValueError):
            DIFF.ks_test(df, "g", "v", _G1, _G2)
        return
    grid = sorted(set(s1) | set(s2))
    import bisect

    d = max(
        abs(bisect.bisect_right(s1, x) / len(s1) - bisect.bisect_right(s2, x) / len(s2))
        for x in grid
    )
    want = {
        "statistic": float(d),
        "p_value": float(ST.ks_sf(d, len(s1), len(s2))),
        "n1": len(s1),
        "n2": len(s2),
    }
    return DIFF.ks_test(df, "g", "v", _G1, _G2), want


_STATS_CASES = {
    "welch_t": stats_case_welch,
    "chi2": stats_case_chi2,
    "mann_whitney_u": stats_case_mwu,
    "ks": stats_case_ks,
}


@pytest.mark.parametrize("case", sorted(_STATS_CASES))
def test_fuzz_stats_case_matches_reference(spark, case):
    fn = _STATS_CASES[case]
    for seed in range(N_SEEDS):
        rng = random.Random(5000 * seed + 31)
        out = fn(spark, rng)
        if out is None:
            continue  # ValueError contract asserted inside the case
        got, want = out
        _assert_dicts_close(case, seed, got, want)


# --- PII redaction: Python-re reference (same patterns, ASCII classes) ------


_PII_PROSE = [
    "Call me maybe",
    "totals were 42 and 7",
    "release v1.2.3 shipped",
    "order 20240101 confirmed",  # ISO-date near-miss: must NOT redact
    "range 1990-1995 ok",
    "12345678 invoice",  # 8 digits: below the >=9 phone floor
    "a@b bare at",  # no TLD: not an email
    "www. broken scheme",
    "naïve café prose",  # non-ASCII word chars around boundaries
]
_PII_PLANTS = [
    "see https://ex.com/a?b=1#f for details",
    "or www.mirror-site.org/path today",
    "mail first.last+tag@ex.co.uk now",
    "host 192.168.0.1 responded",
    "dial +1 (415) 555-0123 4 anytime",
    "fax 041.555.012.345 received",
]


def stats_case_pii(spark, rng):
    """redact_pii / pii_counts (Java regex, Catalyst chain) vs Python re
    with re.ASCII — mirroring Java's default ASCII \\w/\\b/\\d classes — on
    randomly assembled prose + plants + near-misses. Counts follow the same
    progressive-redaction order on both sides."""
    import re

    from market_data_mining_project_spark.operators import text as TXT_

    n_docs = rng.randint(1, 8)
    docs = []
    for i in range(n_docs):
        pieces = [
            rng.choice(_PII_PLANTS if rng.random() < 0.4 else _PII_PROSE)
            for _ in range(rng.randint(0, 5))
        ]
        docs.append((i, rng.choice([" ", "\n"]).join(pieces)))
    df = spark.createDataFrame(docs, "id long, txt string")
    got = {
        r.id: (r.red, (r.pii.url, r.pii.email, r.pii.ip, r.pii.phone))
        for r in df.select(
            "id",
            TXT_.redact_pii(F.col("txt")).alias("red"),
            TXT_.pii_counts(F.col("txt")).alias("pii"),
        ).collect()
    }
    for i, txt in docs:
        staged = txt
        counts = []
        for token, pattern in TXT_._PII_PATTERNS:
            pat = re.compile(pattern, re.ASCII)
            counts.append(len(pat.findall(staged)))
            staged = pat.sub(token, staged)
        assert got[i][0] == staged, (
            f"FUZZ REPRO case=pii id={i}: redacted {got[i][0]!r} != {staged!r}"
        )
        assert got[i][1] == tuple(counts), (
            f"FUZZ REPRO case=pii id={i}: counts {got[i][1]} != {tuple(counts)} ({txt!r})"
        )


def test_fuzz_pii_matches_python_re(spark):
    for seed in range(N_SEEDS):
        rng = random.Random(7000 * seed + 41)
        stats_case_pii(spark, rng)
