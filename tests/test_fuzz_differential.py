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
}

_EVENT_CASES = {
    "sessionize": case_sessionize,
    "asof_join": case_asof,
    "ohlc_rollup": case_ohlc_rollup,
    "range_join_count": case_range_join_count,
    "pairwise_rules": case_pairwise_rules,
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
