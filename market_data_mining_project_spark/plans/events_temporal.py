"""Temporal event-analytics queries — as-of join, OHLC rollup, range join.

Beyond the reference's surface (its time logic is day-granular pandas
arithmetic, ``Website/market/dunnhumby/ml_models.py:262-293``): these are
the three canonical market-data time operations, bound to the synthetic
``events`` table. Each has a DuckDB hash oracle — notably the as-of join
is verified against DuckDB's NATIVE ``ASOF LEFT JOIN`` operator, i.e. an
independent algorithm (binary-search probe) checking the Spark
union-plus-window formulation result-for-result.

All timestamps are exported as epoch seconds (integer canonicalization,
the ``pipeline_io`` streaming-entry convention — timestamps are
engine-format dependent, integers hash identically everywhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from market_data_mining_project_spark.operators import temporal as TEMP
from market_data_mining_project_spark.sources.tables import load_table


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


def q_asof_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time enrichment: every view/click event is annotated with
    the SAME user's latest prior (or simultaneous) purchase value and the
    staleness of that purchase in whole seconds. The right side is
    pre-aggregated to one row per (user, ts) so the as-of match is
    deterministic under ties. No-prior-purchase events keep the row with
    sentinel values (-1.0 / -1, the non-null canonicalization rule).

    Spark plan: the BOUNDED-STATE bucketed as-of path
    (operators/temporal.asof_join with ``bucket_secs=86400``) — the
    carry window is grained (user, day-bucket) so one hot key never
    sorts its whole history in a single task; buckets stitch through
    the tiny per-(key, bucket) summary carry. Bucketed == plain is
    exact (integer/struct carry, pytest-pinned), so the DuckDB native
    ASOF LEFT JOIN oracle hash is unchanged — two independent
    algorithms, hash-identical output. The daily width is the tick-data
    default; any width gives the same rows."""
    ev = _events(spark, sf_dir)
    left = ev.filter(F.col("event_type").isin("view", "click")).select(
        "event_id", "user_id", "event_type", "ts", "value"
    )
    right = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("pvalue"))
    )
    j = TEMP.asof_join(
        left, right, "user_id", "ts", "ts", ["pvalue"], bucket_secs=86400
    )
    return j.select(
        "event_id",
        "user_id",
        "event_type",
        F.col("ts").cast("long").alias("ts_epoch"),
        "value",
        F.coalesce(F.col("pvalue"), F.lit(-1.0)).alias("last_purchase_value"),
        F.coalesce(
            F.col("ts").cast("long") - F.col("matched_ts"), F.lit(-1).cast("long")
        ).alias("secs_since_purchase"),
        F.col("matched_ts").isNotNull().cast("int").alias("has_prior"),
    )


SQL_ASOF_ENRICHMENT = """
WITH l AS (
  -- ts IS NOT NULL mirrors asof_join's documented NULL-exclusion contract:
  -- a NULL-ts event carries no as-of position and is dropped, not emitted
  -- with sentinel values (the Spark plan filters it; the native ASOF LEFT
  -- JOIN would have kept it)
  SELECT event_id, user_id, event_type, ts, value
  FROM events WHERE event_type IN ('view', 'click') AND ts IS NOT NULL
), p AS (
  SELECT user_id, ts, MAX(value) AS pvalue
  FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL
  GROUP BY user_id, ts
)
SELECT l.event_id, l.user_id, l.event_type,
       epoch_ms(l.ts) // 1000 AS ts_epoch,
       l.value,
       COALESCE(p.pvalue, -1.0) AS last_purchase_value,
       COALESCE(epoch_ms(l.ts) // 1000 - epoch_ms(p.ts) // 1000,
                CAST(-1 AS BIGINT)) AS secs_since_purchase,
       CASE WHEN p.ts IS NULL THEN 0 ELSE 1 END AS has_prior
FROM l ASOF LEFT JOIN p ON l.user_id = p.user_id AND l.ts >= p.ts
"""


def q_ohlc_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC candles per event type (the hypertable
    continuous-aggregate shape): open/high/low/close/volume/value in ONE
    map-side-combinable hash aggregate — ``min_by``/``max_by`` over the
    deterministic (ts, event_id) struct, no window, no second scan. The
    oracle re-derives open/close via row_number windows — again a
    different algorithm, same hash."""
    return TEMP.ohlc_rollup(
        _events(spark, sf_dir),
        "ts",
        "value",
        ["event_type"],
        bucket_secs=3600,
        tiebreak_col="event_id",
    )


SQL_OHLC_ROLLUP = """
WITH e AS (
  SELECT event_type,
         (epoch_ms(ts) // 1000 // 3600) * 3600 AS bucket_epoch,
         value, ts, event_id
  FROM events
), r AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY event_type, bucket_epoch
                            ORDER BY ts ASC, event_id ASC) AS ra,
         ROW_NUMBER() OVER (PARTITION BY event_type, bucket_epoch
                            ORDER BY ts DESC, event_id DESC) AS rd
  FROM e
)
SELECT event_type, bucket_epoch,
       MAX(CASE WHEN ra = 1 THEN value END) AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       MAX(CASE WHEN rd = 1 THEN value END) AS close,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 2) AS total_value
FROM r GROUP BY event_type, bucket_epoch
"""


def q_range_join_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval proximity join: for every purchase event, the count and
    summed value of error events (any user — incident correlation) within
    ±15 minutes. Spark plan is the banded range join (right side bucketed
    by 900 s band, left exploded to its 3 candidate bands, equi-join then
    exact |Δt| filter — join degree bounded by band occupancy, never
    |L|×|R|); the oracle is the naive inequality join, affordable at
    oracle scale."""
    ev = _events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").cast("long").alias("ts_epoch"), "value"
    )
    errors = ev.filter(F.col("event_type") == "error")
    out = TEMP.range_join_count(
        purchases, errors, "ts_epoch", "ts", radius_secs=900, agg_value="value"
    )
    return out.select(
        "event_id",
        "user_id",
        "ts_epoch",
        "value",
        F.col("n_in_range").alias("n_errors_15min"),
        F.col("value_in_range").alias("error_value_15min"),
    )


SQL_RANGE_JOIN_ERRORS = """
WITH p AS (
  SELECT event_id, user_id, epoch_ms(ts) // 1000 AS ts_epoch, value
  FROM events WHERE event_type = 'purchase'
), e AS (
  SELECT epoch_ms(ts) // 1000 AS rts, value AS rv
  FROM events WHERE event_type = 'error'
)
SELECT p.event_id, p.user_id, p.ts_epoch, p.value,
       COUNT(e.rts) AS n_errors_15min,
       ROUND(COALESCE(SUM(e.rv), 0), 2) AS error_value_15min
FROM p LEFT JOIN e ON ABS(p.ts_epoch - e.rts) <= 900
GROUP BY p.event_id, p.user_id, p.ts_epoch, p.value
"""


def q_rolling_user_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day per-user activity features at every event (the
    rolling-window feature shape every churn/fraud model consumes): event
    count, total and average value over a RANGE frame — time-based, not
    row-based, so sparse and dense users get the same 7-day semantics.
    One shuffle on user_id, one sorted window.

    Everything exported is INTEGER-exact: the frame boundary compares
    epoch-second longs, money sums in cents (the 2-decimal values are
    exactly representable there), and the average is integer division in
    cents×10⁴ — a ROUND(AVG(double)) export hit a genuine half-ulp tie at
    sf0.1 (sum/2ᵏ frames land exactly on the .5 boundary at any rounding
    precision, and the two engines' double-rounding paths break the tie
    differently), so no double leaves this query except the raw value.

    r6 widening, same grain/window family so ZERO extra plan cost beyond
    three more window expressions over the already-sorted frames: the
    trailing 7-day variance NUMERATOR n·Σc²−(Σc)² (the exact-integer
    volatility signal — divide by n·(n−1) downstream for σ²), the
    running all-time high, and the drawdown from it in parts-per-million
    (the market-data running-max-relative-decline indicator; cents are
    positive so the ppm division is tie-free integer math). The variance
    numerator is n²-scaled: it stays inside int64 while
    frame_rows² × max_cents² < 2⁶³ (≈3×10⁴ frame rows at 10⁵ cents) —
    frames past that need the DECIMAL(38,0)/HUGEINT cast the
    `value_anomalies` comparison uses."""
    from pyspark.sql import Window

    ev = _events(spark, sf_dir).select(
        "event_id",
        "user_id",
        F.col("ts").cast("long").alias("ts_epoch"),
        "value",
        F.round(F.col("value") * 100).cast("long").alias("__cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_epoch")
        .rangeBetween(-7 * 86400, 0)
    )
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("ts_epoch")
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    return (
        ev.select(
            "event_id",
            "user_id",
            "ts_epoch",
            "value",
            "__cents",
            F.count(F.lit(1)).over(w).alias("n_events_7d"),
            F.sum("__cents").over(w).alias("value_7d_cents"),
            F.sum(F.col("__cents") * F.col("__cents")).over(w).alias("__sq_7d"),
            F.max("__cents").over(wrun).alias("run_max_cents"),
        )
        .withColumn(
            "avg_value_7d_microunits",
            F.expr("(value_7d_cents * 10000) DIV n_events_7d"),
        )
        .withColumn(
            "var_7d_numerator",
            F.col("n_events_7d") * F.col("__sq_7d")
            - F.col("value_7d_cents") * F.col("value_7d_cents"),
        )
        .withColumn(
            # a zero running high (first value rounds to 0 cents) would be
            # a NULL division — sentinel 0 per the non-null export rule
            "drawdown_ppm",
            F.expr(
                "CASE WHEN run_max_cents > 0 THEN"
                " ((run_max_cents - __cents) * 1000000) DIV run_max_cents"
                " ELSE 0 END"
            ),
        )
        .drop("__cents", "__sq_7d")
    )


SQL_ROLLING_USER_FEATURES = """
WITH e AS (
  SELECT event_id, user_id, epoch_ms(ts) // 1000 AS ts_epoch, value,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events
)
SELECT event_id, user_id, ts_epoch, value,
       COUNT(*) OVER w AS n_events_7d,
       CAST(SUM(cents) OVER w AS BIGINT) AS value_7d_cents,
       CAST(MAX(cents) OVER wrun AS BIGINT) AS run_max_cents,
       (CAST(SUM(cents) OVER w AS BIGINT) * 10000) // (COUNT(*) OVER w)
           AS avg_value_7d_microunits,
       COUNT(*) OVER w * CAST(SUM(cents * cents) OVER w AS BIGINT)
         - CAST(SUM(cents) OVER w AS BIGINT) * CAST(SUM(cents) OVER w AS BIGINT)
           AS var_7d_numerator,
       CASE WHEN CAST(MAX(cents) OVER wrun AS BIGINT) > 0 THEN
         ((CAST(MAX(cents) OVER wrun AS BIGINT) - cents) * 1000000)
           // CAST(MAX(cents) OVER wrun AS BIGINT)
       ELSE 0 END AS drawdown_ppm
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY ts_epoch
             RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW),
       wrun AS (PARTITION BY user_id ORDER BY ts_epoch
             RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


def q_funnel_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel per user: first view → first click AT OR
    AFTER that view → first purchase at or after that click; the stage
    reached (0–3) and the view→purchase conversion time. The canonical
    product-analytics sequence query, expressed as three conditional MIN
    aggregates chained by equi-joins on user (each stage's events filter
    against the previous stage's anchor timestamp) — all hash-partitioned
    on user_id, no per-user iteration, no window over unbounded history.
    Un-reached stages export -1 sentinels (non-null canonicalization)."""
    ev = _events(spark, sf_dir).select(
        "user_id", "event_type", F.col("ts").cast("long").alias("te")
    )
    views = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("te").alias("t_view")
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .join(views, "user_id")
        .filter(F.col("te") >= F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("te").alias("t_click"))
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .join(clicks, "user_id")
        .filter(F.col("te") >= F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("te").alias("t_purchase"))
    )
    users = ev.select("user_id").distinct()
    out = (
        users.join(views, "user_id", "left")
        .join(clicks, "user_id", "left")
        .join(purchases, "user_id", "left")
    )
    stage = (
        F.col("t_view").isNotNull().cast("int")
        + F.col("t_click").isNotNull().cast("int")
        + F.col("t_purchase").isNotNull().cast("int")
    )
    neg = F.lit(-1).cast("long")
    return out.select(
        "user_id",
        stage.alias("funnel_stage"),
        F.coalesce(F.col("t_view"), neg).alias("t_view"),
        F.coalesce(F.col("t_click"), neg).alias("t_click"),
        F.coalesce(F.col("t_purchase"), neg).alias("t_purchase"),
        F.coalesce(F.col("t_purchase") - F.col("t_view"), neg).alias(
            "secs_to_convert"
        ),
    )


SQL_FUNNEL_ANALYSIS = """
WITH e AS (
  SELECT user_id, event_type, epoch_ms(ts) // 1000 AS te FROM events
), v AS (
  SELECT user_id, MIN(te) AS t_view FROM e WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, MIN(te) AS t_click
  FROM e JOIN v USING (user_id)
  WHERE event_type = 'click' AND te >= t_view
  GROUP BY e.user_id
), p AS (
  SELECT e.user_id, MIN(te) AS t_purchase
  FROM e JOIN c USING (user_id)
  WHERE event_type = 'purchase' AND te >= t_click
  GROUP BY e.user_id
), u AS (
  SELECT DISTINCT user_id FROM e
)
SELECT u.user_id,
       CAST((v.t_view IS NOT NULL) AS INT) + CAST((c.t_click IS NOT NULL) AS INT)
           + CAST((p.t_purchase IS NOT NULL) AS INT) AS funnel_stage,
       COALESCE(v.t_view, CAST(-1 AS BIGINT)) AS t_view,
       COALESCE(c.t_click, CAST(-1 AS BIGINT)) AS t_click,
       COALESCE(p.t_purchase, CAST(-1 AS BIGINT)) AS t_purchase,
       COALESCE(p.t_purchase - v.t_view, CAST(-1 AS BIGINT)) AS secs_to_convert
FROM u
LEFT JOIN v USING (user_id)
LEFT JOIN c USING (user_id)
LEFT JOIN p USING (user_id)
"""


def q_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based batch sessionization (2-hour inactivity gap): the
    canonical event-analytics operator the streaming entry does with
    ``session_window`` state, expressed for batch as lag → new-session
    flag → running sum → per-session aggregate. ONE shuffle total: the
    lag window and the running sum share the (user_id, ts) sort, and the
    final groupBy(user_id, session_seq) is satisfied by the window's
    existing hash partitioning on user_id (HashPartitioning on a PREFIX
    of the grouping keys meets ClusteredDistribution — no second
    exchange; asserted in tests/test_event_analytics.py). Everything
    exported is integer-exact: epochs, cents, counts.

    This catalog entry SHIPS the bounded-state ``bucket_secs`` path
    (weekly buckets): the session counter is a prefix sum, so it
    bucket-stitches with per-task state bounded by bucket occupancy —
    the 100×-safe plan under one hot key. Bucketed == plain EXACTLY at
    any width (integer logic, pytest-pinned), so the oracle hash is
    identical to the plain path's."""
    e = _events(spark, sf_dir).select(
        "event_id",
        "user_id",
        F.col("ts").cast("long").alias("te"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    numbered = TEMP.sessionize(
        e, "user_id", "te", 7200, "event_id", bucket_secs=7 * 86400
    )
    return numbered.groupBy("user_id", "session_seq").agg(
        F.min("te").alias("session_start"),
        F.max("te").alias("session_end"),
        (F.max("te") - F.min("te")).alias("duration_secs"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum("cents").alias("value_cents"),
    )


SQL_SESSION_STATS = """
WITH e AS (
  -- ts IS NOT NULL: sessionize excludes NULL-timestamp rows (they have no
  -- position in a gap-based session); without the filter the window
  -- orders them NULLS LAST and the NULL LAG comparison opens a phantom
  -- session the Spark plan never produces
  SELECT event_id, user_id, epoch_ms(ts) // 1000 AS te,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events WHERE ts IS NOT NULL
), flagged AS (
  SELECT *, CASE WHEN te - LAG(te) OVER w <= 7200 THEN 0 ELSE 1 END AS new_s
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY te, event_id)
), numbered AS (
  SELECT *, CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY te, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS session_seq
  FROM flagged
)
SELECT user_id, session_seq, MIN(te) AS session_start, MAX(te) AS session_end,
       MAX(te) - MIN(te) AS duration_secs, COUNT(*) AS n_events,
       CAST(SUM(cents) AS BIGINT) AS value_cents
FROM numbered GROUP BY user_id, session_seq
"""


def q_daily_resample_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling to a regular daily grid with gap-fill: per
    user, a dense day spine from first to last activity (``sequence`` +
    explode — the spine is GENERATED on the executors, sized by each
    user's own span, never collected), daily aggregates left-joined on,
    and missing days filled with the last observed day's total
    (last-observation-carried-forward via ``last(ignorenulls)`` over a
    running frame). The hypertable ``time_bucket_gapfill`` shape.

    Plan (two exchanges, DELIBERATELY not one): the daily rollup
    partially aggregates map-side and shuffles only its combined
    (user, day) rows — at scale strictly fewer bytes than repartitioning
    every raw event by user_id would move to force single-exchange
    reuse; the bounds aggregate, spine explode and LOCF window share the
    user_id clustering from the second exchange. Exchange count pinned
    in tests/test_event_analytics.py. The first spine day per user is
    always observed (it IS min day), so LOCF never sees a leading NULL
    and the output is total."""
    from pyspark.sql import Window

    e = _events(spark, sf_dir).select(
        "user_id",
        (F.col("ts").cast("long") / F.lit(86400)).cast("long").alias("day"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    daily = e.groupBy("user_id", "day").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum("cents").alias("day_cents"),
    )
    spine = (
        e.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select("user_id", F.explode(F.sequence("d0", "d1")).alias("day"))
    )
    joined = spine.join(daily, ["user_id", "day"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        "user_id",
        "day",
        F.coalesce(F.col("n_obs"), F.lit(0).cast("long")).alias("n_events"),
        F.coalesce(F.col("day_cents"), F.lit(0).cast("long")).alias("day_cents"),
        F.col("n_obs").isNotNull().cast("int").alias("is_observed"),
        F.last("day_cents", ignorenulls=True).over(w).alias("locf_cents"),
    )


SQL_DAILY_RESAMPLE_LOCF = """
WITH e AS (
  SELECT user_id, epoch_ms(ts) // 1000 // 86400 AS day,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events
), daily AS (
  SELECT user_id, day, COUNT(*) AS n_obs, CAST(SUM(cents) AS BIGINT) AS day_cents
  FROM e GROUP BY user_id, day
), spine AS (
  SELECT user_id, unnest(generate_series(MIN(day), MAX(day))) AS day
  FROM e GROUP BY user_id
)
SELECT s.user_id, s.day,
       COALESCE(d.n_obs, 0) AS n_events,
       COALESCE(d.day_cents, CAST(0 AS BIGINT)) AS day_cents,
       CASE WHEN d.user_id IS NULL THEN 0 ELSE 1 END AS is_observed,
       last_value(d.day_cents IGNORE NULLS) OVER (
         PARTITION BY s.user_id ORDER BY s.day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_cents
FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
"""


def q_value_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user statistical outlier detection: events whose value sits
    more than 2 sample standard deviations from that user's own mean
    (~5% of this exponential-ish fixture). The 2σ comparison is EXACT
    integer arithmetic — |v−μ| > 2σ rearranged over cents-integer power
    sums as (n−1)·(c·n−Σc)² > 4·n·(n·Σc²−(Σc)²), so no
    variance-algorithm or double-rounding difference between engines can
    flip a boundary row. Wide-integer discipline END-TO-END: Σc² is
    ACCUMULATED in DECIMAL/HUGEINT (a 64-bit power sum wraps silently in
    Spark and errors in DuckDB already at ~10⁵ events of 10⁵ cents), and
    the cubic-in-n comparison products are DECIMAL(38,0)/HUGEINT — exact
    to 10³⁸ in both engines, i.e. unbounded for any physical per-key
    history. Every EXPORTED column stays comfortably BIGINT. Plan: one
    hash aggregate for the per-user power sums + one co-partitioned join
    back on user_id."""
    e = _events(spark, sf_dir).select(
        "event_id",
        "user_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    s = e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_user"),
        F.sum("cents").alias("sc"),
        F.sum(F.col("cents").cast("decimal(19,0)") * F.col("cents")).alias("sq"),
    )
    dec = "decimal(38,0)"
    n_, sc_, sq_, c_ = (
        F.col("n_user").cast(dec),
        F.col("sc").cast(dec),
        F.col("sq").cast(dec),
        F.col("cents").cast(dec),
    )
    dev = c_ * n_ - sc_
    lhs = (n_ - F.lit(1)) * dev * dev
    rhs = F.lit(4) * n_ * (n_ * sq_ - sc_ * sc_)
    return (
        e.join(s, "user_id")
        .filter((F.col("n_user") >= 10) & (lhs > rhs))
        .select(
            "event_id",
            "user_id",
            "cents",
            "n_user",
            (F.col("cents") * F.col("n_user") - F.col("sc")).alias("dev_x_n_cents"),
        )
    )


SQL_VALUE_ANOMALIES = """
WITH e AS (
  SELECT event_id, user_id, CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events
), s AS (
  -- Σc² accumulates in HUGEINT (cents*cents in 64-bit wraps/errors at
  -- ~10⁵ events of 10⁵ cents); comparison terms likewise stay HUGEINT
  SELECT user_id, COUNT(*) AS n_user, CAST(SUM(cents) AS BIGINT) AS sc,
         SUM(CAST(cents AS HUGEINT) * cents) AS sq
  FROM e GROUP BY user_id
)
SELECT e.event_id, e.user_id, e.cents, s.n_user,
       e.cents * s.n_user - s.sc AS dev_x_n_cents
FROM e JOIN s USING (user_id)
WHERE s.n_user >= 10
  AND CAST(s.n_user - 1 AS HUGEINT)
        * (CAST(e.cents AS HUGEINT) * s.n_user - s.sc)
        * (CAST(e.cents AS HUGEINT) * s.n_user - s.sc)
      > CAST(4 AS HUGEINT) * s.n_user
        * (CAST(s.n_user AS HUGEINT) * s.sq - CAST(s.sc AS HUGEINT) * s.sc)
"""


def q_ewma_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponential moving average of event value (α=0.2) beside
    the raw value and its deviation from trend — the stateful
    linear-recurrence smoothing no standard SQL window expresses (hence
    rows-only: DuckDB has no EWMA; pytest pins the recursion exactly
    against a pure-Python reference, and the bounded-state bucketed path
    against the plain one).

    This catalog entry SHIPS the bounded-state ``bucket_secs`` path
    (weekly buckets), exploiting the recurrence's linearity: per-bucket
    Arrow passes emit local + decay with state bounded by bucket
    occupancy, carry states chain over the tiny per-bucket summary, one
    join back — no task ever holds a hot key's full history. Bucketed
    == plain to float associativity (pytest-pinned at two widths)."""
    ev = _events(spark, sf_dir).select(
        "event_id", "user_id", "ts", F.col("value").cast("double").alias("value")
    )
    out = TEMP.ewma(
        ev,
        "user_id",
        "ts",
        "value",
        alpha=0.2,
        tiebreak_col="event_id",
        bucket_secs=7 * 86400,
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("ts").cast("long").alias("ts_epoch"),
        "value",
        F.round("ewma", 6).alias("ewma_value"),
        F.round(F.col("value") - F.col("ewma"), 6).alias("trend_deviation"),
    )


def sql_ewma_trend(user_mod: int | None = None) -> str:
    """The ewma twin, optionally restricted to the deterministic user
    sample ``user_id % user_mod = 0`` — the scale-tier form (see
    ``scripts/sweep_scale.py``). The recursion's cost is
    O(max_rank × |users|) and per-user sequences are INDEPENDENT, so a
    user sample divides the twin's cost by ``user_mod`` while each sampled
    user's recurrence is still stepped at its FULL history depth — the
    per-user depth coverage is undiminished; only user breadth (already a
    homogeneous population by construction of the fixture) is sampled.
    ``None`` (the driver-tier default) is the whole-population twin."""
    pred = f"\n    AND user_id % {int(user_mod)} = 0" if user_mod else ""
    return SQL_EWMA_TREND.replace(
        "WHERE value IS NOT NULL", f"WHERE value IS NOT NULL{pred}", 1
    )


SQL_EWMA_TREND = """
WITH RECURSIVE e AS (
  SELECT event_id, user_id, epoch_ms(ts) // 1000 AS ts_epoch,
         CAST(value AS DOUBLE) AS value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
  WHERE value IS NOT NULL
), ul AS (
  -- one row per user carrying the ordered value sequence: the recursion
  -- below steps against THIS |users|-row table, not the |events|-row one.
  -- The first twin shape joined rec to e on rn = r.rn + 1, which probes
  -- the FULL events table once per iteration — O(max_rank x |events|),
  -- ~25e9 row-scans at the sf5 tier (max rank 4950, 5M events; measured
  -- as an hours-long grind, r10). List indexing makes each iteration
  -- O(|users|), total O(|events|) like the operator itself.
  SELECT user_id, MAX(rn) AS n, LIST(value ORDER BY rn) AS vs
  FROM e GROUP BY user_id
), rec AS (
  -- the linear recurrence itself, row by row per user: y_1 = v_1,
  -- y_t = 0.8*y_{t-1} + 0.2*v_t (pandas ewm adjust=False) — the same
  -- double arithmetic in the same order as the e-join form, so results
  -- are bit-identical; only the probe side changed.
  SELECT user_id, 1 AS rn, vs[1] AS ewma FROM ul
  UNION ALL
  SELECT r.user_id, r.rn + 1, 0.8 * r.ewma + 0.2 * ul.vs[r.rn + 1]
  FROM rec r JOIN ul ON ul.user_id = r.user_id
  WHERE r.rn < ul.n
)
SELECT e.event_id, e.user_id, CAST(e.ts_epoch AS BIGINT) AS ts_epoch, e.value,
       ROUND(r.ewma, 6) AS ewma_value,
       ROUND(e.value - r.ewma, 6) AS trend_deviation
FROM e JOIN rec r ON e.user_id = r.user_id AND e.rn = r.rn
"""


def q_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch audit: per event type, HLL-estimated distinct
    users + EXACT value quantiles beside exact counts. Every coarse-grain
    column derives from fine-grain MERGEABLE artifacts with zero re-scan
    of the fact table — the rollup-lattice move that makes 100 TB rollups
    composable: the 'ALL' row's distinct count UNIONS the per-type HLL
    sketches, and BOTH quantile grains walk ONE per-(type, cents)
    counting histogram (``sketches.value_histogram``). The histogram
    replaces the r6 entry's honest caveat (GK isn't a mergeable Spark
    column, so global quantiles paid a second ``percentile_approx``
    scan): the value domain is integer cents, so the bounded histogram
    merges by addition and the derived quantiles are EXACT — pinned
    bit-for-bit against ``F.percentile`` in tests/test_sketches.py.
    Rows-only: sketch internals have no DuckDB twin; pytest gates pin
    estimate-vs-exact error, sketch-union bounds, and the histogram
    exactness."""
    from market_data_mining_project_spark.operators import sketches as SK

    ev = _events(spark, sf_dir).withColumn(
        "cents", F.round(F.col("value") * 100).cast("long")
    )
    # drop the GK column BEFORE caching: an InMemoryRelation freezes its
    # schema, so pruning the unused percentile_approx out of the aggregate
    # only happens if the projection precedes the cache (plan-asserted in
    # tests/test_sketches.py)
    fine = (
        SK.sketch_rollup(ev, ["event_type"], "user_id", "value")
        .drop("value_quantiles")
        .cache()
    )
    hist = SK.value_histogram(ev, ["event_type"], "cents").cache()

    def _money(col: str):  # cents-domain quantile → 2-decimal money
        return F.round(F.col(col) / 100.0, 2)

    per_type_q = SK.histogram_quantiles(
        hist, ["event_type"], (0.5, 0.95, 0.99)
    )
    # LEFT join: an event type whose values are all NULL has no histogram
    # rows but must keep its n_rows/distinct row (NULL quantiles, as the
    # former percentile_approx formulation emitted). NULL-SAFE: a NULL
    # event_type is a legitimate group in both frames and must match
    # itself.
    ptq = per_type_q.withColumnRenamed("event_type", "__qt")
    per_type = fine.join(
        ptq, fine["event_type"].eqNullSafe(F.col("__qt")), "left"
    ).select(
        "event_type",
        "n_rows",
        "distinct_estimate",
        _money("q0").alias("p50"),
        _money("q1").alias("p95"),
        _money("q2").alias("p99"),
    )
    all_q = SK.histogram_quantiles(hist, [], (0.5, 0.95, 0.99))
    merged = (
        SK.merge_sketches(fine, [])
        .crossJoin(all_q)
        .select(
            F.lit("ALL").alias("event_type"),
            "n_rows",
            "distinct_estimate",
            _money("q0").alias("p50"),
            _money("q1").alias("p95"),
            _money("q2").alias("p99"),
        )
    )
    return per_type.unionByName(merged)


QUERIES = {
    "asof_enrichment": q_asof_enrichment,
    "ohlc_rollup": q_ohlc_rollup,
    # range_join_errors serves through pipeline_io's merged
    # range_join_audit entry (r10; function + SQL stay here, reused there)
    "rolling_user_features": q_rolling_user_features,
    "funnel_analysis": q_funnel_analysis,
    "session_stats": q_session_stats,
    "daily_resample_locf": q_daily_resample_locf,
    "value_anomalies": q_value_anomalies,
    # ewma_trend: r10 — hash-oracled via a DuckDB RECURSIVE CTE that steps
    # the linear recurrence rank by rank (no SQL *window* expresses EWMA,
    # but recursion does; the slot came from the scan_search_audit merge)
    "ewma_trend": q_ewma_trend,
    "sketch_rollup": q_sketch_rollup,
}

ORACLE = {
    "asof_enrichment": SQL_ASOF_ENRICHMENT,
    "ohlc_rollup": SQL_OHLC_ROLLUP,
    "rolling_user_features": SQL_ROLLING_USER_FEATURES,
    "funnel_analysis": SQL_FUNNEL_ANALYSIS,
    "session_stats": SQL_SESSION_STATS,
    "daily_resample_locf": SQL_DAILY_RESAMPLE_LOCF,
    "value_anomalies": SQL_VALUE_ANOMALIES,
    "ewma_trend": SQL_EWMA_TREND,
    # sketch_rollup: rows-only (sketch internals; pytest gates)
}
