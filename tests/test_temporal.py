"""Ground-truth tests for the temporal operators (as-of join, OHLC rollup,
banded range join) — brute-force per-row twins on crafted frames plus plan
assertions that the scale shapes hold (no pair enumeration, no cartesian)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from market_data_mining_project_spark.operators import temporal as TEMP


def _ts(minute: float) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=minute)


@pytest.fixture(scope="module")
def asof_frames(spark):
    left = spark.createDataFrame(
        [
            (1, 100, _ts(10.0)),   # after r@5 → match 5
            (2, 100, _ts(20.0)),   # exactly at r@20 → simultaneous match
            (3, 100, _ts(3.0)),    # before any right row → no match
            (4, 200, _ts(50.0)),   # other key, after r@40 → match 40
            (5, 300, _ts(7.0)),    # key with no right rows at all
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, _ts(5.0), 1.5),
            (100, _ts(20.0), 2.5),
            (100, _ts(30.0), 3.5),  # in the future of every left row
            (200, _ts(40.0), 4.5),
        ],
        "user_id long, ts timestamp, pvalue double",
    )
    return left, right


def test_asof_join_backward_semantics(spark, asof_frames):
    left, right = asof_frames
    out = TEMP.asof_join(left, right, "user_id", "ts", "ts", ["pvalue"])
    got = {r.event_id: (r.pvalue, r.matched_ts) for r in out.collect()}
    assert len(got) == 5, "every left row must survive"
    epoch = lambda m: int(_ts(m).timestamp())
    assert got[1] == (1.5, epoch(5.0))
    assert got[2] == (2.5, epoch(20.0)), ">= semantics: simultaneous right row matches"
    assert got[3] == (None, None)
    assert got[4] == (4.5, epoch(40.0))
    assert got[5] == (None, None)


def test_asof_join_tolerance_nulls_stale_matches(spark, asof_frames):
    left, right = asof_frames
    out = TEMP.asof_join(
        left, right, "user_id", "ts", "ts", ["pvalue"], tolerance_secs=360
    )
    got = {r.event_id: r.pvalue for r in out.collect()}
    assert got[1] == 1.5      # 5 min old, inside 6-min tolerance
    assert got[2] == 2.5      # 0 s old
    assert got[4] is None     # 10 min old — nulled by tolerance


def test_asof_join_matches_brute_force_on_events(spark, sf_dir):
    """On the real events table, the window formulation must equal the
    per-row brute-force maximum-prior lookup."""
    from market_data_mining_project_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type").isin("view", "click")).select(
        "event_id", "user_id", "ts"
    ).limit(200)
    right = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("pvalue"))
    )
    out = {
        r.event_id: (r.pvalue, r.matched_ts)
        for r in TEMP.asof_join(left, right, "user_id", "ts", "ts", ["pvalue"]).collect()
    }
    purchases = {}
    for r in right.collect():
        purchases.setdefault(r.user_id, []).append((r.ts, r.pvalue))
    for row in left.collect():
        prior = [(t, v) for t, v in purchases.get(row.user_id, []) if t <= row.ts]
        want = max(prior) if prior else None
        got = out[row.event_id]
        if want is None:
            assert got == (None, None), row.event_id
        else:
            assert got == (want[1], int(want[0].timestamp())), row.event_id


def test_ohlc_rollup_matches_brute_force(spark):
    rows = [
        # one bucket, deliberate ts tie on the OPEN (event_id breaks it)
        ("a", 1, _ts(0.0), 10.0),
        ("a", 0, _ts(0.0), 11.0),   # same ts, lower id → this is the open
        ("a", 2, _ts(30.0), 5.0),
        ("a", 3, _ts(59.0), 8.0),   # close
        # second bucket, single event: open=high=low=close
        ("a", 4, _ts(70.0), 3.0),
        # other key shares bucket 0
        ("b", 5, _ts(1.0), 100.0),
    ]
    df = spark.createDataFrame(
        rows, "event_type string, event_id long, ts timestamp, value double"
    )
    out = TEMP.ohlc_rollup(df, "ts", "value", ["event_type"], 3600, "event_id")
    got = {(r.event_type, r.bucket_epoch): r.asDict() for r in out.collect()}
    b0 = int(dt.datetime(2024, 1, 1).timestamp())
    a0 = got[("a", b0)]
    assert (a0["open"], a0["high"], a0["low"], a0["close"]) == (11.0, 11.0, 5.0, 8.0)
    assert (a0["n_events"], a0["total_value"]) == (4, 34.0)
    a1 = got[("a", b0 + 3600)]
    assert (a1["open"], a1["high"], a1["low"], a1["close"]) == (3.0, 3.0, 3.0, 3.0)
    assert got[("b", b0)]["open"] == 100.0
    assert len(got) == 3


def test_range_join_count_matches_brute_force(spark, sf_dir):
    from market_data_mining_project_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", F.col("ts").cast("long").alias("lts")
    ).limit(150)
    right = ev.filter(F.col("event_type") == "error")
    out = {
        r.event_id: (r.n_in_range, r.value_in_range)
        for r in TEMP.range_join_count(
            left, right, "lts", "ts", radius_secs=900, agg_value="value"
        ).collect()
    }
    errs = [(int(r.ts.timestamp()), r.value) for r in right.collect()]
    for row in left.collect():
        hits = [(t, v) for t, v in errs if abs(row.lts - t) <= 900]
        assert out[row.event_id][0] == len(hits), row.event_id
        assert out[row.event_id][1] == pytest.approx(
            round(sum(v for _, v in hits), 2) if hits else 0.0, abs=0.011
        ), row.event_id
    assert len(out) == 150


def test_range_join_band_width_is_semantics_free(spark, sf_dir):
    """Band width is a physical knob: halving it must not change results."""
    from market_data_mining_project_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", F.col("ts").cast("long").alias("lts")
    ).limit(80)
    right = ev.filter(F.col("event_type") == "error")
    a = TEMP.range_join_count(left, right, "lts", "ts", 900, band_secs=900)
    b = TEMP.range_join_count(left, right, "lts", "ts", 900, band_secs=450)
    assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}


def test_temporal_plans_avoid_cartesian_and_python(spark, sf_dir):
    """Scale-shape assertions: the as-of entry is a window over ONE shuffle
    (no join node at all), and the range join is a banded equi-join — no
    CartesianProduct / BroadcastNestedLoopJoin anywhere, no Python eval."""
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()

    def plan_of(name):
        return qs[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()

    from market_data_mining_project_spark.plans import events_temporal as ET

    qs = {**qs, "range_join_errors": ET.q_range_join_errors}
    for name in ("asof_enrichment", "ohlc_rollup", "range_join_errors"):
        plan = plan_of(name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "EvalPython" not in plan, name
    assert "Window" not in plan_of("ohlc_rollup"), (
        "OHLC must be one hash aggregate, not a window"
    )
    # the shipped catalog entry is the BUCKETED as-of: the in-bucket carry
    # window plus the per-(key,bucket) summary carry window, stitched by an
    # EQUI-join on (key, bucket) — never an inequality join (those appear
    # as Cartesian/BNLJ, excluded above). Exactly two Window nodes: more
    # would mean a per-payload carry regression (the match must ride ONE
    # struct).
    asof = plan_of("asof_enrichment")
    assert asof.count("windowspecdefinition") == 2, (
        "bucketed as-of = in-bucket carry + summary carry, sharing structs"
    )


def test_asof_join_bucketed_equals_plain(spark, sf_dir):
    """bucket_secs is a physical (skew) knob: for ANY width the bucketed
    two-phase stitch must reproduce the single-window result exactly —
    including buckets with no right rows (carry-in) and left rows before
    any purchase (still unmatched)."""
    from market_data_mining_project_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type").isin("view", "click")).select(
        "event_id", "user_id", "ts"
    )
    right = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("pvalue"))
    )
    plain = {
        r.event_id: (r.pvalue, r.matched_ts)
        for r in TEMP.asof_join(left, right, "user_id", "ts", "ts", ["pvalue"]).collect()
    }
    for bucket in (3600, 86400):  # hourly forces heavy stitching at sf0.001
        got = {
            r.event_id: (r.pvalue, r.matched_ts)
            for r in TEMP.asof_join(
                left, right, "user_id", "ts", "ts", ["pvalue"], bucket_secs=bucket
            ).collect()
        }
        assert got == plain, f"bucket_secs={bucket}"


def test_asof_join_bucketed_tolerance(spark, asof_frames):
    """Tolerance composes with the bucketed path (applied after stitch)."""
    left, right = asof_frames
    out = TEMP.asof_join(
        left, right, "user_id", "ts", "ts", ["pvalue"],
        tolerance_secs=360, bucket_secs=60,
    )
    got = {r.event_id: r.pvalue for r in out.collect()}
    assert got[1] == 1.5 and got[2] == 2.5 and got[4] is None


def test_asof_join_null_payload_match_is_not_skipped(spark):
    """A matched right row whose payload is NULL must win over an older
    non-null row (ASOF matches on TIME; the payload rides as-is) — in the
    plain path, the bucketed path, and under tolerance math."""
    left = spark.createDataFrame(
        [(1, 100, _ts(25.0))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(100, _ts(5.0), 1.5), (100, _ts(20.0), None)],
        "user_id long, ts timestamp, pvalue double",
    )
    for bucket in (None, 60):
        row = TEMP.asof_join(
            left, right, "user_id", "ts", "ts", ["pvalue"], bucket_secs=bucket
        ).collect()[0]
        assert row.pvalue is None, f"bucket={bucket}: stale payload served"
        assert row.matched_ts == int(_ts(20.0).timestamp()), f"bucket={bucket}"
    # tolerance is measured against the REAL match (t=20, 300 s old): the
    # match is fresh, so the NULL payload stands (not nulled, not replaced)
    row = TEMP.asof_join(
        left, right, "user_id", "ts", "ts", ["pvalue"], tolerance_secs=600
    ).collect()[0]
    assert row.pvalue is None and row.matched_ts == int(_ts(20.0).timestamp())


def test_asof_join_forward_semantics(spark, asof_frames):
    """direction='forward': earliest right with right_ts >= left_ts."""
    left, right = asof_frames
    for bucket in (None, 60):
        out = TEMP.asof_join(
            left, right, "user_id", "ts", "ts", ["pvalue"],
            direction="forward", bucket_secs=bucket,
        )
        got = {r.event_id: (r.pvalue, r.matched_ts) for r in out.collect()}
        epoch = lambda m: int(_ts(m).timestamp())
        assert got[1] == (2.5, epoch(20.0)), bucket   # next right after t=10
        assert got[2] == (2.5, epoch(20.0)), bucket   # simultaneous (>=)
        assert got[3] == (1.5, epoch(5.0)), bucket    # next right after t=3
        assert got[4] == (None, None), bucket         # nothing after t=50
        assert got[5] == (None, None), bucket


def test_asof_join_nearest_semantics(spark, asof_frames):
    """direction='nearest': closer of backward/forward; ties → backward."""
    left, right = asof_frames
    for bucket in (None, 60):
        out = TEMP.asof_join(
            left, right, "user_id", "ts", "ts", ["pvalue"],
            direction="nearest", bucket_secs=bucket,
        )
        got = {r.event_id: (r.pvalue, r.matched_ts) for r in out.collect()}
        epoch = lambda m: int(_ts(m).timestamp())
        assert got[1] == (1.5, epoch(5.0)), bucket    # 5 min back vs 10 fwd
        assert got[2] == (2.5, epoch(20.0)), bucket   # exact
        assert got[3] == (1.5, epoch(5.0)), bucket    # only forward exists (2 min)
        assert got[4] == (4.5, epoch(40.0)), bucket   # only backward exists
        assert got[5] == (None, None), bucket


def test_asof_join_nearest_tie_prefers_backward(spark):
    left = spark.createDataFrame(
        [(1, 9, _ts(10.0))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(9, _ts(5.0), 1.0), (9, _ts(15.0), 2.0)],
        "user_id long, ts timestamp, pvalue double",
    )
    row = TEMP.asof_join(
        left, right, "user_id", "ts", "ts", ["pvalue"], direction="nearest"
    ).collect()[0]
    assert row.pvalue == 1.0 and row.matched_ts == int(_ts(5.0).timestamp())


def test_asof_join_forward_matches_brute_force_on_events(spark, sf_dir):
    from market_data_mining_project_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type").isin("view", "click")).select(
        "event_id", "user_id", "ts"
    ).limit(200)
    right = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("pvalue"))
    )
    out = {
        r.event_id: (r.pvalue, r.matched_ts)
        for r in TEMP.asof_join(
            left, right, "user_id", "ts", "ts", ["pvalue"], direction="forward"
        ).collect()
    }
    purchases = {}
    for r in right.collect():
        purchases.setdefault(r.user_id, []).append((r.ts, r.pvalue))
    for row in left.collect():
        after = [(t, v) for t, v in purchases.get(row.user_id, []) if t >= row.ts]
        want = min(after) if after else None
        got = out[row.event_id]
        if want is None:
            assert got == (None, None), row.event_id
        else:
            assert got == (want[1], int(want[0].timestamp())), row.event_id


def test_rolling_user_features_boundary_inclusive(spark, tmp_path):
    """RANGE frame boundary: an event exactly 7 days (604800 s) older is
    INCLUDED; one second older is not. Peers at the same second all count."""
    from market_data_mining_project_spark.plans.events_temporal import (
        q_rolling_user_features,
    )

    base = dt.datetime(2024, 3, 1)
    rows = [
        (1, 7, base, 10.0),
        (2, 7, base + dt.timedelta(seconds=604800), 5.0),      # exactly 7d later
        (3, 7, base + dt.timedelta(seconds=604801), 2.0),      # 7d + 1s later
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    import os
    d = str(tmp_path)
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    got = {r.event_id: (r.n_events_7d, r.value_7d_cents, r.avg_value_7d_microunits)
           for r in q_rolling_user_features(spark, d).collect()}
    assert got[1] == (1, 1000, 10_000_000)
    assert got[2] == (2, 1500, 7_500_000), "event exactly 604800 s earlier must be in frame"
    assert got[3] == (2, 700, 3_500_000), "frame slid past the first event"


def test_asof_join_rejects_payload_name_collision(spark, asof_frames):
    """A payload column that collides with a left column would silently
    REPLACE the caller's column (the final select re-emits payload names
    from the matched struct) — must raise instead."""
    left, right = asof_frames
    import pytest

    with pytest.raises(ValueError, match="collide"):
        TEMP.asof_join(
            left, right.withColumnRenamed("pvalue", "event_id"),
            "user_id", "ts", "ts", ["event_id"],
        )


def test_asof_join_bucketed_keeps_null_key_groups(spark):
    """A NULL key is a legitimate partition on the plain path's window;
    the bucketed stitch joins are null-safe so bucketed == plain holds
    for those groups too (incl. a cross-bucket carry)."""
    left = spark.createDataFrame(
        [(1, None, _ts(10.0)), (2, None, _ts(60 * 26.0)), (3, 100, _ts(10.0))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(None, _ts(5.0), 1.5), (100, _ts(5.0), 9.9)],
        "user_id long, ts timestamp, pvalue double",
    )
    plain = {
        r.event_id: (r.pvalue, r.matched_ts)
        for r in TEMP.asof_join(
            left, right, "user_id", "ts", "ts", ["pvalue"]
        ).collect()
    }
    # bucket width 1200 s: event 2 sits ~26 min in, several buckets past
    # the right row — the match must arrive via the cross-bucket carry
    bucketed = {
        r.event_id: (r.pvalue, r.matched_ts)
        for r in TEMP.asof_join(
            left, right, "user_id", "ts", "ts", ["pvalue"], bucket_secs=1200
        ).collect()
    }
    epoch = int(_ts(5.0).timestamp())
    assert plain == bucketed == {
        1: (1.5, epoch),
        2: (1.5, epoch),
        3: (9.9, epoch),
    }


def test_asof_join_excludes_null_timestamps(spark):
    """NULL timestamps carry no as-of position: NULL-ts left rows emit no
    row, NULL-ts right rows never match (they'd otherwise carry forward
    under backward with matched_ts NULL, untouchable by tolerance) —
    pinned on both paths."""
    left = spark.createDataFrame(
        [(1, 100, _ts(10.0)), (2, 100, None)],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(100, None, 66.6), (100, _ts(5.0), 1.5)],
        "user_id long, ts timestamp, pvalue double",
    )
    for kw in ({}, {"bucket_secs": 600}):
        out = {
            r.event_id: (r.pvalue, r.matched_ts)
            for r in TEMP.asof_join(
                left, right, "user_id", "ts", "ts", ["pvalue"], **kw
            ).collect()
        }
        assert out == {1: (1.5, int(_ts(5.0).timestamp()))}, kw
    # forward: a NULL-ts left row must not take the earliest right row
    fwd = TEMP.asof_join(
        left, right, "user_id", "ts", "ts", ["pvalue"], direction="forward"
    ).collect()
    assert [r.event_id for r in fwd] == [1]


def test_asof_join_rejects_matched_ts_collision(spark, asof_frames):
    left, right = asof_frames
    with pytest.raises(ValueError, match="collide"):
        TEMP.asof_join(
            left.withColumn("matched_ts", F.lit(0)),
            right, "user_id", "ts", "ts", ["pvalue"],
        )


def test_range_join_zero_radius_and_bad_inputs(spark):
    """radius 0 = exactly-co-timestamped (single band, Δt=0 filter);
    negative radius and non-positive band are input errors, not silent
    wrong counts."""
    left = spark.createDataFrame(
        [(1, _ts(1.0)), (2, _ts(2.0))], "event_id long, lts timestamp"
    )
    right = spark.createDataFrame(
        [(_ts(1.0),), (_ts(1.0),), (_ts(3.0),)], "ts timestamp"
    )
    out = {
        r.event_id: r.n_in_range
        for r in TEMP.range_join_count(left, right, "lts", "ts", 0).collect()
    }
    assert out == {1: 2, 2: 0}
    with pytest.raises(ValueError, match="radius"):
        TEMP.range_join_count(left, right, "lts", "ts", -5)
    with pytest.raises(ValueError, match="band"):
        TEMP.range_join_count(left, right, "lts", "ts", 10, band_secs=0)


def test_asof_join_rejects_reserved_payload_names(spark):
    from market_data_mining_project_spark.operators import temporal as TEMP

    left = spark.createDataFrame([(1, 100)], "k long, t long").select(
        "k", F.col("t").cast("timestamp").alias("t")
    )
    right = spark.createDataFrame([(1, 50, 9.0)], "k long, rt long, pvalue double").select(
        "k", F.col("rt").cast("timestamp").alias("rt"), "pvalue"
    )
    for bad in (["k", "pvalue"], ["__side"], ["rt"]):
        with pytest.raises(ValueError, match="collide"):
            TEMP.asof_join(left, right, key="k", left_ts="t", right_ts="rt", payload_cols=bad)


def test_asof_and_session_oracles_align_on_null_ts(spark, tmp_path):
    """A NULL-timestamp event must be handled identically by the Spark plan
    and the DuckDB oracle: EXCLUDED (the operator contract) — previously the
    native ASOF LEFT JOIN kept it with sentinels and the session oracle
    opened a phantom session for it."""
    import duckdb

    from market_data_mining_project_spark.plans import events_temporal as ET
    from tests.oracle_harness import compare

    rows = [
        (1, 1000, 7, "view", 1.0, "{}"),
        (2, 900, 7, "purchase", 5.0, "{}"),
        (3, None, 7, "view", 2.0, "{}"),
        (4, None, 7, "purchase", 9.0, "{}"),
        (5, 2000, 8, "click", 3.0, "{}"),
    ]
    spark.createDataFrame(
        rows, "event_id long, te long, user_id long, event_type string, value double, props string"
    ).select(
        "event_id", F.col("te").cast("timestamp").alias("ts"),
        "user_id", "event_type", "value", "props",
    ).write.parquet(f"{tmp_path}/events.parquet")

    con = duckdb.connect()
    con.execute(
        # Spark writes a directory layout; DuckDB needs the part-file glob
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{tmp_path}/events.parquet/*.parquet')"
    )
    asof = ET.q_asof_enrichment(spark, str(tmp_path))
    assert compare("asof_null_ts", asof, con.sql(ET.SQL_ASOF_ENRICHMENT)) == []
    sess = ET.q_session_stats(spark, str(tmp_path))
    assert compare("session_null_ts", sess, con.sql(ET.SQL_SESSION_STATS)) == []
