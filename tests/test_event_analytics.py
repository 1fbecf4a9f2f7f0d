"""Sessionization, daily resample/LOCF, and per-user anomaly detection —
the r6 part-3 event-analytics family (plans/events_temporal.py).

Each query has a DuckDB hash oracle; these tests pin the SEMANTICS the
oracle can't see (gap boundaries, LOCF fill correctness, the exact-integer
2σ rule vs a float reference) plus the plan shapes the 100 TB story
depends on (one shuffle for sessionize, no second exchange for the
session aggregate)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from market_data_mining_project_spark.plans.events_temporal import (
    q_daily_resample_locf,
    q_session_stats,
    q_value_anomalies,
)


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    d = str(tmp_path)
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    return d


def _ts(s):
    import datetime

    return datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=s)


# --- sessionization -------------------------------------------------------


def test_session_gap_boundary_exact(spark, tmp_path):
    """A 7200 s gap keeps one session; 7201 s splits. Counts, bounds and
    cent-sums are exact."""
    rows = [
        # user 1: three events, second exactly at the gap, third one past it
        (1, _ts(0), 1, "view", 1.00, "{}"),
        (2, _ts(7200), 1, "view", 2.00, "{}"),
        (3, _ts(7200 + 7201), 1, "view", 4.00, "{}"),
        # user 2: single event
        (4, _ts(50), 2, "click", 10.00, "{}"),
    ]
    d = _write_events(spark, tmp_path, rows)
    got = {
        (r.user_id, r.session_seq): (r.n_events, r.value_cents, r.duration_secs)
        for r in q_session_stats(spark, d).collect()
    }
    assert got == {
        (1, 1): (2, 300, 7200),
        (1, 2): (1, 400, 0),
        (2, 1): (1, 1000, 0),
    }


def test_session_stats_conserves_events_and_value(spark, sf_dir):
    """Sessions partition the event set: totals over sessions == totals
    over raw events (no event lost or double-counted by the windowing)."""
    sess = q_session_stats(spark, sf_dir).agg(
        F.sum("n_events").alias("n"), F.sum("value_cents").alias("c")
    ).first()
    from market_data_mining_project_spark.sources.tables import load_table

    raw = load_table(spark, sf_dir, "events").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("c"),
    ).first()
    assert (sess.n, sess.c) == (raw.n, raw.c)


def test_session_stats_bucketed_exchange_shape(spark, sf_dir):
    """The shipped entry is the bounded-state bucketed sessionizer; its
    exchange budget is the documented skew trade-off: every full-data
    exchange is at the (user_id, __bkt) grain (so one hot user spreads
    over its buckets — the 100× guarantee) except the final
    per-session regroup; the only bare-user_id exchange carries the TINY
    per-(key, bucket) summary frame. More bare-key full-data exchanges
    would mean the hot-key-unsafe plain path leaked back in."""
    df = q_session_stats(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    lines = [
        ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln
    ]
    bucketed = [ln for ln in lines if "__bkt" in ln]
    bare = [ln for ln in lines if "__bkt" not in ln and "session_seq" not in ln]
    final = [ln for ln in lines if "session_seq" in ln]
    # two (user, bucket) window exchanges (local + recomputed summary side),
    # one tiny-summary carry exchange, one final regroup
    assert len(bucketed) == 2, plan
    assert len(bare) == 1, plan  # the summary carry — |key × bucket| rows only
    assert len(final) == 1, plan


# --- daily resample + LOCF ------------------------------------------------


def test_resample_locf_fills_gaps(spark, tmp_path):
    """Spine covers min..max day per user; unobserved days carry the last
    observed day's cents and flag 0."""
    day = 86400
    rows = [
        (1, _ts(0), 1, "view", 5.00, "{}"),          # day 19723
        (2, _ts(3 * day + 10), 1, "view", 7.50, "{}"),  # day 19726
        (3, _ts(10), 2, "view", 1.00, "{}"),
    ]
    d = _write_events(spark, tmp_path, rows)
    got = {
        (r.user_id, r.day): (r.n_events, r.day_cents, r.is_observed, r.locf_cents)
        for r in q_daily_resample_locf(spark, d).collect()
    }
    # derive the expected day index the same way the query does (epoch of
    # the naive fixture timestamp under the local session timezone) — a
    # hard-coded 19723 would break east-of-UTC hosts
    d0 = int(_ts(0).timestamp()) // 86400
    assert got == {
        (1, d0): (1, 500, 1, 500),
        (1, d0 + 1): (0, 0, 0, 500),
        (1, d0 + 2): (0, 0, 0, 500),
        (1, d0 + 3): (1, 750, 1, 750),
        (2, d0): (1, 100, 1, 100),
    }


def test_resample_locf_two_exchange_plan(spark, sf_dir):
    """The documented plan: the daily rollup shuffles its map-side-combined
    (user, day) rows and everything else shares one user_id exchange —
    exactly two hash exchanges (repartitioning raw events by user to force
    one would move strictly more bytes at scale)."""
    plan = (
        q_daily_resample_locf(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 2, plan


def test_resample_spine_is_dense_and_total(spark, sf_dir):
    """Per user: exactly (max−min+1) spine rows, no NULL anywhere (the
    first day is always observed, so LOCF is total)."""
    out = q_daily_resample_locf(spark, sf_dir).cache()
    try:
        per_user = out.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n"),
            (F.max("day") - F.min("day") + 1).alias("span"),
        )
        assert per_user.filter(F.col("n") != F.col("span")).count() == 0
        nulls = out.filter(
            F.col("locf_cents").isNull() | F.col("day_cents").isNull()
        ).count()
        assert nulls == 0
    finally:
        out.unpersist()


# --- per-user anomalies ---------------------------------------------------


def test_value_anomalies_match_float_zscore(spark, sf_dir):
    """The integer 2σ rule must agree with a float z-score reference away
    from the boundary, and every flagged row must be strictly outside 2σ
    even when computed in floats (the integer rule is exact; the float
    check uses a 1e-9 relative guard for its own rounding)."""
    import pandas as pd

    from market_data_mining_project_spark.sources.tables import load_table

    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "user_id", F.round(F.col("value") * 100).cast("long").alias("cents"))
        .toPandas()
    )
    flagged = {
        r.event_id for r in q_value_anomalies(spark, sf_dir).collect()
    }
    stats = ev.groupby("user_id")["cents"].agg(["count", "mean", "std"])
    want = set()
    for row in ev.itertuples():
        n, m, sd = stats.loc[row.user_id]
        if n >= 10 and abs(row.cents - m) > 2 * sd * (1 + 1e-9):
            want.add(row.event_id)
        elif n >= 10 and abs(row.cents - m) > 2 * sd * (1 - 1e-9):
            want.add(row.event_id)  # boundary band: either verdict is fine
    # every float-certain anomaly is flagged; nothing outside the band is
    certain = {
        row.event_id
        for row in ev.itertuples()
        if stats.loc[row.user_id]["count"] >= 10
        and abs(row.cents - stats.loc[row.user_id]["mean"])
        > 2 * stats.loc[row.user_id]["std"] * (1 + 1e-9)
    }
    assert certain <= flagged <= want
    assert flagged, "fixture should contain anomalies"


def test_value_anomalies_small_n_excluded(spark, tmp_path):
    """Users with fewer than 10 events never emit anomalies, and a planted
    outlier in a 12-event user is caught."""
    rows = [(i, _ts(i), 1, "view", 10.0, "{}") for i in range(9)]  # n=9: excluded
    rows += [(100 + i, _ts(i), 2, "view", 10.0 + (i % 3), "{}") for i in range(11)]
    rows += [(200, _ts(99), 2, "view", 500.0, "{}")]  # the outlier (n=12)
    d = _write_events(
        spark, tmp_path, [(e, t, u, k, v, p) for (e, t, u, k, v, p) in rows]
    )
    got = q_value_anomalies(spark, d).collect()
    assert {r.event_id for r in got} == {200}
    assert got[0].n_user == 12


# --- EWMA -----------------------------------------------------------------


def _ewma_ref(values, alpha):
    """Pure-Python reference: y0 = v0; y = (1-a)y + a v."""
    y = values[0]
    out = [y]
    for v in values[1:]:
        y = (1.0 - alpha) * y + alpha * v
        out.append(y)
    return out


def test_ewma_matches_python_recursion(spark, tmp_path):
    from market_data_mining_project_spark.operators.temporal import ewma

    vals = [10.0, 20.0, 5.0, 80.0, 1.0, 33.0]
    rows = [(i, _ts(i * 60), 7, "view", v, "{}") for i, v in enumerate(vals)]
    d = _write_events(spark, tmp_path, rows)
    from market_data_mining_project_spark.sources.tables import load_table

    ev = load_table(spark, d, "events")
    got = (
        ewma(ev, "user_id", "ts", "value", alpha=0.3, tiebreak_col="event_id")
        .orderBy("event_id")
        .collect()
    )
    want = _ewma_ref(vals, 0.3)
    for r, w in zip(got, want):
        assert abs(r.ewma - w) < 1e-12, (r.event_id, r.ewma, w)


def test_ewma_bucketed_equals_plain(spark, sf_dir):
    """The bounded-state bucket-stitch path must reproduce the plain
    single-task recursion at two bucket widths (float associativity)."""
    from market_data_mining_project_spark.operators.temporal import ewma
    from market_data_mining_project_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    plain = {
        r.event_id: r.ewma
        for r in ewma(ev, "user_id", "ts", "value", 0.2, "event_id").collect()
    }
    for bucket in (86400, 6 * 3600):
        b = {
            r.event_id: r.ewma
            for r in ewma(
                ev, "user_id", "ts", "value", 0.2, "event_id", bucket_secs=bucket
            ).collect()
        }
        assert b.keys() == plain.keys()
        for eid, v in plain.items():
            assert abs(b[eid] - v) <= 1e-9 * max(1.0, abs(v)), (bucket, eid)


def test_ewma_trend_entry_bounds(spark, sf_dir):
    """Catalog entry: EWMA lies within each user's running min/max prefix
    envelope (a smoothing must not overshoot)."""
    from market_data_mining_project_spark.plans.events_temporal import q_ewma_trend
    from pyspark.sql import Window

    out = q_ewma_trend(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_epoch", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    checked = out.withColumn("lo", F.min("value").over(w)).withColumn(
        "hi", F.max("value").over(w)
    )
    bad = checked.filter(
        (F.col("ewma_value") < F.col("lo") - 1e-6)
        | (F.col("ewma_value") > F.col("hi") + 1e-6)
    ).count()
    assert bad == 0


def test_value_anomalies_wide_integer_power_sums(spark, tmp_path):
    """Magnitudes that overflow an int64 power sum (12 events of ~$10M →
    Σc² ≈ 1.2×10¹⁹ > 2⁶³) must still flag correctly in BOTH engines —
    the decimal/hugeint accumulation regression. The Spark flags are
    checked against a float reference and against the DuckDB oracle text
    run on the same parquet."""
    import duckdb
    import numpy as np

    base = 10_000_000.0  # $10M → 10⁹ cents, c² = 10¹⁸
    vals = [base + i * 1000 for i in range(11)] + [base * 3]  # planted outlier
    rows = [(i, _ts(i * 60), 1, "view", v, "{}") for i, v in enumerate(vals)]
    d = _write_events(spark, tmp_path, rows)
    got = {r.event_id for r in q_value_anomalies(spark, d).collect()}

    cents = np.round(np.array(vals) * 100)
    m, sd = cents.mean(), cents.std(ddof=1)
    want = {i for i, c in enumerate(cents) if abs(c - m) > 2 * sd}
    assert got == want == {11}

    from market_data_mining_project_spark.plans.events_temporal import (
        SQL_VALUE_ANOMALIES,
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet/*.parquet'"
    )
    oracle = {r[0] for r in con.execute(SQL_VALUE_ANOMALIES).fetchall()}
    assert oracle == got


def test_drawdown_zero_high_sentinel(spark, tmp_path):
    """A first value that rounds to 0 cents makes the running high 0 —
    drawdown_ppm must export the 0 sentinel, never NULL."""
    from market_data_mining_project_spark.plans.events_temporal import (
        q_rolling_user_features,
    )

    rows = [
        (1, _ts(0), 1, "view", 0.001, "{}"),   # 0 cents → run max 0
        (2, _ts(60), 1, "view", 2.00, "{}"),   # high becomes 200
        (3, _ts(120), 1, "view", 1.00, "{}"),  # 50% drawdown
    ]
    d = _write_events(spark, tmp_path, rows)
    got = {
        r.event_id: (r.run_max_cents, r.drawdown_ppm)
        for r in q_rolling_user_features(spark, d).collect()
    }
    assert got == {1: (0, 0), 2: (200, 0), 3: (200, 500000)}


def test_sessionize_bucketed_equals_plain_exactly(spark, sf_dir):
    """The bounded-state bucket-stitch sessionizer is integer logic end to
    end — bucketed must equal plain EXACTLY at multiple widths, including
    widths smaller than the gap (boundary flags then hinge on the
    previous non-empty bucket, the hardest case)."""
    from market_data_mining_project_spark.operators.temporal import sessionize
    from market_data_mining_project_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.col("ts").cast("long").alias("te")
    )
    plain = {
        r.event_id: r.session_seq
        for r in sessionize(e, "user_id", "te", 7200, "event_id").collect()
    }
    for width in (86400, 3600, 1800):  # 1800 < the 7200 gap
        b = {
            r.event_id: r.session_seq
            for r in sessionize(
                e, "user_id", "te", 7200, "event_id", bucket_secs=width
            ).collect()
        }
        assert b == plain, width


def test_sessionize_null_timestamps_excluded_both_paths(spark):
    """NULL-timestamp rows are excluded identically on both paths (the
    documented contract) — without the filter the plain window would
    session them while the bucketed join would silently drop them."""
    from market_data_mining_project_spark.operators.temporal import sessionize

    df = spark.createDataFrame(
        [(1, None, 5), (2, None, 5), (3, 100, 5), (4, 10000, 5)],
        "event_id long, te long, user_id long",
    )
    plain = {(r.event_id, r.session_seq) for r in sessionize(df, "user_id", "te", 7200, "event_id").collect()}
    bucketed = {
        (r.event_id, r.session_seq)
        for r in sessionize(df, "user_id", "te", 7200, "event_id", bucket_secs=3600).collect()
    }
    assert plain == bucketed == {(3, 1), (4, 2)}


def test_ewma_null_key_and_null_ts_rows(spark):
    """Review-pinned contracts: a NULL key is a legitimate group on BOTH
    paths (pandas groupby must not silently drop it — dropna=False), and
    NULL-timestamp rows are excluded on BOTH paths (no ordering
    information, the sessionize contract)."""
    from market_data_mining_project_spark.operators.temporal import ewma

    rows = [
        (1, 10, _ts(0), 5.0),
        (2, 10, _ts(100), 15.0),
        (3, None, _ts(0), 7.0),    # NULL key — its own group
        (4, None, _ts(50), 9.0),
        (5, 10, None, 99.0),       # NULL ts — excluded
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    plain = {
        r.event_id: r.ewma
        for r in ewma(df, "user_id", "ts", "value", 0.5, "event_id").collect()
    }
    buck = {
        r.event_id: r.ewma
        for r in ewma(
            df, "user_id", "ts", "value", 0.5, "event_id", bucket_secs=60
        ).collect()
    }
    assert set(plain) == set(buck) == {1, 2, 3, 4}
    assert plain[3] == buck[3] == 7.0
    assert abs(plain[4] - 8.0) < 1e-12 and abs(buck[4] - 8.0) < 1e-12
    assert abs(buck[2] - 10.0) < 1e-12


def test_sketch_rollup_keeps_all_null_value_type(spark, tmp_path):
    """An event type whose values are ALL NULL has no histogram rows but
    must keep its n_rows/distinct row (left join; NULL quantiles — the
    pre-histogram behavior)."""
    from market_data_mining_project_spark.plans.events_temporal import (
        q_sketch_rollup,
    )

    rows = [
        (1, _ts(0), 1, "view", 5.0, "{}"),
        (2, _ts(10), 2, "view", 7.0, "{}"),
        (3, _ts(20), 1, "ghost", None, "{}"),
        (4, _ts(30), 2, "ghost", None, "{}"),
    ]
    d = _write_events(spark, tmp_path, rows)
    got = {r.event_type: r for r in q_sketch_rollup(spark, d).collect()}
    assert "ghost" in got
    assert got["ghost"].n_rows == 2
    assert got["ghost"].p50 is None
    assert got["view"].p50 is not None
