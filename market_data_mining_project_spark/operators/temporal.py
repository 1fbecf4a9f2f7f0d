"""Temporal join/rollup operators over event streams.

Not in the reference (its time logic is day-granular pandas arithmetic,
e.g. ``Website/market/dunnhumby/ml_models.py:262-293`` correlated
repurchase horizons) — added as first-class engine capabilities: the three
canonical time-series operations a market-data workload runs constantly
and vanilla SQL engines struggle to express at scale.

All three avoid the naive O(n·m) inequality-join plan:

- :func:`asof_join` — one shuffle on the join key, then a single sorted
  window pass (union + last-non-null carry-forward). No pair enumeration:
  each row is touched once regardless of how many right rows precede it.
- :func:`ohlc_rollup` — ONE hash aggregate (``min_by``/``max_by`` over a
  deterministic ``(ts, tiebreak)`` struct): open/close need no window and
  no second scan, and partial aggregation runs map-side.
- :func:`range_join_count` — banded blocking: the left side is exploded to
  the (bounded, 2·⌈radius/band⌉+1-wide) set of bands its radius can touch
  and joined band-to-band, so the join degree is bounded by band
  occupancy, never |left|×|right|.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    tolerance_secs: int | None = None,
    bucket_secs: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for every left row, attach the payload of the matching
    right row on the same ``key`` (the point-in-time join of quote/trade
    enrichment). ``direction`` follows pandas ``merge_asof``:

    - ``"backward"`` (default) — LATEST right row with ``right_ts <=
      left_ts``.
    - ``"forward"`` — EARLIEST right row with ``right_ts >= left_ts``.
    - ``"nearest"`` — whichever of the two is closer in time; exact-tie
      distances resolve to the backward (earlier) row, deterministically.

    Plan shape (the 100 TB story): tag both sides, union, ONE shuffle on
    ``key``, then a single ascending-``(ts, side)`` window carrying the
    last RIGHT-row match struct forward (ts + payload together — a matched
    row whose payload value is NULL still wins over older rows, per ASOF
    semantics) — right rows sort before left rows at equal timestamps so
    an exactly-simultaneous right row is visible, per as-of convention
    (``>=``). Each row is touched once; there is no inequality join and no
    per-left-row probe. Matched right timestamp is carried as
    ``matched_ts`` (epoch seconds, long) for tolerance / staleness math.

    ``bucket_secs`` — the SKEW escape hatch. ``None`` partitions the
    window by ``key`` alone: one hot key (a symbol carrying a large share
    of all events) sorts its entire history in one task. Setting it
    re-grains the window to ``(key, floor(ts/bucket))`` — per-task state
    is bounded by bucket occupancy — and stitches buckets with a carry-in
    join: per-bucket last-right summaries (a tiny ``|key×bucket|`` frame)
    get a prefix carry over buckets, exactly the bounded-state two-phase
    idiom of ``text.token_budget_select``. Results are identical for any
    bucket width (pytest-pinned); choose ~daily buckets for tick data.

    The caller must make the right side unique per ``(key, right_ts)``
    (pre-aggregate); ties inside one timestamp would otherwise resolve by
    union order, which is not deterministic under shuffles.

    ``tolerance_secs``: matches farther than the tolerance (in either
    direction) are nulled out (payload AND ``matched_ts``), mirroring
    pandas ``merge_asof``'s ``tolerance``.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward/forward/nearest, got {direction!r}")
    clash = (set(payload_cols) | {"matched_ts"}) & set(left.columns)
    if clash:
        # the final select re-emits payload names (and the unconditional
        # matched_ts) from the matched struct — a colliding left column
        # would yield a silent replace or an ambiguous duplicate
        raise ValueError(
            f"output columns collide with left columns: {sorted(clash)}; "
            "rename the left columns or the right payload before joining"
        )
    # payload names must also be disjoint from the join machinery: the key
    # or right-ts in payload_cols duplicates a select column (a far-away
    # unionByName error), and a reserved internal name would be silently
    # OVERWRITTEN by the side/ts/bucket tags — the payload would carry the
    # tag value for every matched row
    reserved = {key, right_ts, "__side", "__ats", "__bkt"}
    bad = reserved & set(payload_cols)
    if bad:
        raise ValueError(
            f"payload_cols {sorted(bad)} collide with the join key/timestamp "
            "or reserved internal columns (__side/__ats/__bkt); rename them "
            "on the right side before joining"
        )
    dirs = ("backward", "forward") if direction == "nearest" else (direction,)
    lt = F.col(left_ts).cast("timestamp")
    rt = F.col(right_ts).cast("timestamp")
    # NULL timestamps carry no as-of position and are EXCLUDED on both
    # sides and both paths (the sessionize/ewma contract): a NULL __ats
    # sorts FIRST ascending and LAST descending, so without the filter a
    # NULL-ts right row's payload would carry forward under backward with
    # matched_ts NULL (untouchable by tolerance — abs(x−NULL) is NULL)
    # and a NULL-ts left row would take the earliest right row under
    # forward; the bucketed stitch would additionally diverge on the NULL
    # bucket id.
    l_tagged = (
        left.filter(lt.isNotNull())
        .withColumn("__side", F.lit(0))
        .withColumn("__ats", lt)
    )
    r_tagged = (
        right.filter(rt.isNotNull())
        .select(
            F.col(key),
            rt.alias("__ats"),
            *[F.col(c) for c in payload_cols],
        )
        .withColumn("__side", F.lit(1))
    )
    # unionByName with missing columns nulled: left keeps its own schema,
    # right contributes only key/ts/payload
    u = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    part = [key] if bucket_secs is None else [key, "__bkt"]
    if bucket_secs is not None:
        u = u.withColumn("__bkt", F.floor(F.col("__ats").cast("long") / bucket_secs))
    # The whole match (ts + every payload column) is carried as ONE struct:
    # the struct is non-null whenever a right row exists, so a matched row
    # whose payload value is NULL still wins over an older non-null row —
    # exactly the ASOF semantics (match on time, take the payload as-is),
    # and what tolerance math must see. Per-column ignorenulls carries
    # would instead "see through" NULL payloads to stale rows. One struct
    # also means one window expression per direction — a single Window
    # node (two for "nearest", sharing the one Exchange).
    match_struct = F.struct(
        F.col("__ats").cast("long").alias("__mts"),
        *[F.col(c).alias(c) for c in payload_cols],
    )
    # backward walks time ascending (last right ≤ t); forward walks time
    # DESCENDING so "last preceding" means first right ≥ t. Right rows
    # sort before left at equal ts in both (side desc) — `>=`/`<=`
    # inclusive semantics.
    carries = {}
    for d in dirs:
        ats = F.col("__ats").asc() if d == "backward" else F.col("__ats").desc()
        w = (
            Window.partitionBy(*part)
            .orderBy(ats, F.col("__side").desc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carries[d] = F.last(
            F.when(F.col("__side") == 1, match_struct), ignorenulls=True
        ).over(w).alias(f"__m_{d}")
    carried = u.select(
        *[F.col(c) for c in u.columns if c not in payload_cols], *carries.values()
    )
    if bucket_secs is not None:
        for d in dirs:
            carried = _stitch_bucket_carry(
                carried, r_tagged, key, payload_cols, bucket_secs, d
            )
    out = carried.filter(F.col("__side") == 0)
    if direction == "nearest":
        mb, mf = F.col("__m_backward"), F.col("__m_forward")
        lts = F.col("__ats").cast("long")
        take_b = mf.isNull() | (
            mb.isNotNull() & ((lts - mb["__mts"]) <= (mf["__mts"] - lts))
        )
        out = out.withColumn("__m", F.when(take_b, mb).otherwise(mf))
    else:
        out = out.withColumn("__m", F.col(f"__m_{direction}"))
    if tolerance_secs is not None:
        stale = (
            F.abs(F.col("__ats").cast("long") - F.col("__m.__mts"))
            > F.lit(tolerance_secs)
        )
        out = out.withColumn("__m", F.when(~stale, F.col("__m")))
    keep = [
        c
        for c in out.columns
        if c not in ("__m", "__m_backward", "__m_forward", "__side", "__ats", "__bkt")
    ]
    return out.select(
        *keep,
        F.col("__m.__mts").alias("matched_ts"),
        *[F.col(f"__m.{c}").alias(c) for c in payload_cols],
    )


def _stitch_bucket_carry(
    carried: DataFrame,
    r_tagged: DataFrame,
    key: str,
    payload_cols: list[str],
    bucket_secs: int,
    direction: str,
) -> DataFrame:
    """Cross-bucket stitch for the bucketed as-of window: rows whose bucket
    holds no matching right row take the nearest right match of a PRIOR
    (backward) / LATER (forward) bucket. The prefix carry runs over the
    tiny per-(key, bucket) summary frame (≤ one row per key×bucket), so no
    task ever holds more than one bucket of raw rows. The carry moves the
    same match struct as the in-bucket window — NULL payload fields ride
    inside a non-null struct, so they can't be skipped for another
    bucket's value."""
    mcol = f"__m_{direction}"
    match_struct = F.struct(
        F.col("__ats").cast("long").alias("__mts"),
        *[F.col(c).alias(c) for c in payload_cols],
    )
    pick = F.max_by if direction == "backward" else F.min_by
    bucket_best = (
        r_tagged.withColumn(
            "__bkt", F.floor(F.col("__ats").cast("long") / bucket_secs)
        )
        .groupBy(key, "__bkt")
        .agg(pick(match_struct, F.col("__ats")).alias("__bl"))
    )
    all_buckets = carried.select(key, "__bkt").distinct()
    order = F.col("__bkt").asc() if direction == "backward" else F.col("__bkt").desc()
    w_prev = (
        Window.partitionBy(key)
        .orderBy(order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # both stitch joins are NULL-SAFE on the key: a NULL key is a
    # legitimate partition on the plain path's window, so the bucketed
    # path must not lose its carry to SQL's NULL != NULL (same contract
    # as the sessionize/ewma carry joins)
    bb = bucket_best.withColumnRenamed(key, "__bk").withColumnRenamed(
        "__bkt", "__bb"
    )
    carry_in = (
        all_buckets.join(
            bb,
            F.col(key).eqNullSafe(F.col("__bk")) & (F.col("__bkt") == F.col("__bb")),
            "left",
        )
        .select(
            key,
            "__bkt",
            F.last("__bl", ignorenulls=True).over(w_prev).alias("__cin"),
        )
        .withColumnRenamed(key, "__ck")
        .withColumnRenamed("__bkt", "__cb")
    )
    stitched = carried.join(
        carry_in,
        F.col(key).eqNullSafe(F.col("__ck")) & (F.col("__bkt") == F.col("__cb")),
        "left",
    )
    keep = [c for c in carried.columns if c != mcol]
    return stitched.select(
        *keep, F.coalesce(F.col(mcol), F.col("__cin")).alias(mcol)
    )


def _tiebroken(ts: Column, tiebreak: Column) -> Column:
    """Deterministic ordering struct: struct comparison is lexicographic,
    so (ts, tiebreak) totally orders rows even under timestamp ties."""
    return F.struct(ts.alias("t"), tiebreak.alias("b"))


def ohlc_rollup(
    events: DataFrame,
    ts_col: str,
    value_col: str,
    key_cols: list[str],
    bucket_secs: int,
    tiebreak_col: str,
) -> DataFrame:
    """Time-bucketed OHLC (the hypertable continuous-aggregate shape):
    per ``key × floor(ts/bucket)`` bucket — open (value at earliest
    ``(ts, tiebreak)``), high, low, close (value at latest), event count,
    total value.

    ONE hash aggregate, no window: ``min_by``/``max_by`` over the
    deterministic ``(ts, tiebreak)`` struct pick open/close inside the
    same partial-aggregating pass that computes high/low/count/sum — the
    whole rollup is map-side-combinable and shuffles only
    |keys × buckets| partial rows, the ideal 100 TB rollup plan.
    """
    ts = F.col(ts_col).cast("timestamp")
    order = _tiebroken(ts, F.col(tiebreak_col))
    bucket = (F.floor(ts.cast("long") / bucket_secs) * bucket_secs).alias(
        "bucket_epoch"
    )
    v = F.col(value_col)
    return (
        events.groupBy(*key_cols, bucket)
        .agg(
            F.min_by(v, order).alias("open"),
            F.max(v).alias("high"),
            F.min(v).alias("low"),
            F.max_by(v, order).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(v), 2).alias("total_value"),
        )
    )


def sessionize(
    df: DataFrame,
    key: str,
    ts_col: str,
    gap_secs: int,
    tiebreak_col: str,
    bucket_secs: int | None = None,
    out_col: str = "session_seq",
) -> DataFrame:
    """Gap-based session assignment: per key, rows more than ``gap_secs``
    after their predecessor start a new session; ``out_col`` numbers
    sessions 1..N in time order. Exported rows = input rows + the
    session counter (plus a ``__ts`` epoch column dropped here).

    Plain path: ONE shuffle on ``key`` — the lag test and the running
    session-start sum share one sorted window (and a downstream
    ``groupBy(key, session)`` still reuses the exchange: prefix
    partitioning satisfies the grouping).

    ``bucket_secs`` — the bounded-state SKEW path, all-JVM (the session
    counter is a PREFIX SUM of start flags, so it bucket-stitches like
    every linear carry here): (1) a per-(key, time-bucket) window
    computes in-bucket start flags and their running sum — per-task
    state bounded by bucket occupancy; (2) the TINY per-bucket summary
    frame (first/last ts + in-bucket start count) decides each bucket's
    BOUNDARY flag against the previous non-empty bucket's last event
    (empty buckets simply don't appear, so ``lag`` over the summary IS
    the previous event) and prefix-sums the session starts before each
    bucket; (3) one co-partitioned join adds boundary + prefix to the
    in-bucket running sum. Integer logic throughout — bucketed == plain
    EXACTLY, any width (pytest-pinned).

    Rows with a NULL timestamp carry no ordering information and are
    EXCLUDED from both paths (documented contract, same as NULL values
    in :func:`ewma`) — without the filter the two paths would diverge:
    the plain window sorts NULLs into sessions while a NULL bucket id
    can never survive the bucketed path's equi-join."""
    t = F.col(ts_col).cast("timestamp").cast("long")
    base = df.filter(t.isNotNull()).withColumn("__ts", t)
    if bucket_secs is None:
        w = Window.partitionBy(key).orderBy("__ts", tiebreak_col)
        start = F.when(
            F.col("__ts") - F.lag("__ts").over(w) <= gap_secs, 0
        ).otherwise(1)
        return base.withColumn(
            out_col,
            F.sum(start).over(w.rowsBetween(Window.unboundedPreceding, 0)),
        ).drop("__ts")

    base = base.withColumn("__bkt", F.floor(F.col("__ts") / bucket_secs))
    wb = Window.partitionBy(key, "__bkt").orderBy("__ts", tiebreak_col)
    # first row of a bucket gets start=0 locally; its true start flag is
    # the bucket's boundary flag, added from the summary carry below
    local_start = F.when(F.lag("__ts").over(wb).isNull(), 0).when(
        F.col("__ts") - F.lag("__ts").over(wb) > gap_secs, 1
    ).otherwise(0)
    local = base.withColumn(
        "__lcum",
        F.sum(local_start).over(wb.rowsBetween(Window.unboundedPreceding, 0)),
    )
    summary = local.groupBy(key, "__bkt").agg(
        F.min("__ts").alias("__first_ts"),
        F.max("__ts").alias("__last_ts"),
        F.max("__lcum").alias("__local_flags"),
    )
    ws = Window.partitionBy(key).orderBy("__bkt")
    prev_last = F.lag("__last_ts").over(ws)
    boundary = F.when(prev_last.isNull(), 1).when(
        F.col("__first_ts") - prev_last > gap_secs, 1
    ).otherwise(0)
    carry = summary.withColumn("__f", boundary).withColumn(
        "__before",
        F.coalesce(
            F.sum(F.col("__f") + F.col("__local_flags")).over(
                ws.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    )
    # NULL-SAFE join for the same reason as the ewma carry: a NULL key
    # sessionizes as its own group on the plain path and must survive here
    cj = (
        carry.select(key, "__bkt", "__f", "__before")
        .withColumnRenamed(key, "__ck")
        .withColumnRenamed("__bkt", "__cb")
    )
    return (
        local.join(
            cj,
            local[key].eqNullSafe(F.col("__ck"))
            & (local["__bkt"] == F.col("__cb")),
        )
        .withColumn(
            out_col, (F.col("__before") + F.col("__f") + F.col("__lcum")).cast("long")
        )
        .drop("__ts", "__bkt", "__lcum", "__f", "__before", "__ck", "__cb")
    )


def ewma(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    alpha: float,
    tiebreak_col: str,
    bucket_secs: int | None = None,
    out_col: str = "ewma",
) -> DataFrame:
    """Exponential moving average per key over time order — the canonical
    stateful linear recurrence (momentum/trend smoothing) that NO standard
    SQL window can express: ``y_t = (1-α)·y_{t-1} + α·v_t`` with the
    pandas ``adjust=False`` convention ``y_0 = v_0`` (equivalently: the
    pre-history state IS the key's first value).

    Plain path (``bucket_secs=None``): one shuffle on ``key``, one
    Arrow-batched ``applyInPandas`` pass running the C-speed ``ewm``
    recursion per key — linear, but the whole key history sits in one
    task (same caveat as an unbucketed as-of window).

    ``bucket_secs`` — the bounded-state SKEW path, exploiting that the
    recurrence is LINEAR: within bucket ``b`` holding values v_1..v_m and
    entering with carry state s, every row decomposes as
    ``y_i = local_i + (1-α)^i · s`` where ``local_i`` is the same
    recursion started from 0 (NULL-valued rows are dropped up front —
    they carry no state and emit no row, identically on both paths). So:
    (1) ONE ``mapInPandas`` pass over (key, bucket)-hash-partitioned,
    partition-sorted rows emits ``local_i`` and the decay ``(1-α)^i`` —
    per-task state is one PARTITION (sized by the shuffle setting), never
    one key's history, and the Arrow overhead is per-partition, NOT
    per-group (an earlier ``applyInPandas`` grouping on (key, bucket)
    was semantically identical but paid per-group Arrow batches: 10×
    slower on real widths where |keys×buckets| ≫ |keys|). Groups are
    contiguous after the sort, so the vectorized in-batch recursion uses
    pandas' cython ``groupby(...).ewm`` with a zero-state correction
    (``z_i = y_i − (1−α)^i·v_first``, exact algebra), and the single
    group that can straddle an Arrow-batch boundary chains through the
    same linearity; (2) the carry states chain over the TINY per-(key,
    bucket) summary frame (``s_{b+1} = local_end_b + (1-α)^{m_b}·s_b`` —
    one Python loop per key over ≤ |buckets| rows, the same prefix-carry
    idiom as :func:`_stitch_bucket_carry`); (3) one co-partitioned join
    puts the carry back. Deep history decays through denormals to exact
    0 — the mathematically correct forgetting. Bucketed == plain to
    float associativity (pytest-pinned at two widths)."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    import pandas as pd  # noqa: F401  (Arrow path)

    ts_long = F.col(ts_col).cast("timestamp").cast("long")
    # NULL-valued rows carry no state and emit no row (documented
    # contract): without this, the two paths would DIVERGE — pandas ewm
    # skips NaN mid-series, but a NULL first value would seed the bucketed
    # carry with NaN and poison the whole key. NULL timestamps likewise
    # carry no ordering information and are excluded on BOTH paths (the
    # :func:`sessionize` contract): the plain sort would place them
    # arbitrarily last while a NULL bucket id cannot ride the bucketed
    # grain.
    base = df.filter(
        F.col(value_col).isNotNull() & ts_long.isNotNull()
    ).withColumn("__ts", ts_long)
    schema_base = base.schema

    def _sorted(pdf):
        return pdf.sort_values(["__ts", tiebreak_col], kind="mergesort")

    if bucket_secs is None:
        out_schema = ", ".join(
            [f"`{f.name}` {f.dataType.simpleString()}" for f in schema_base.fields]
            + [f"`{out_col}` double"]
        )

        def _plain(pdf):
            pdf = _sorted(pdf)
            pdf[out_col] = (
                pdf[value_col].astype("float64").ewm(alpha=alpha, adjust=False).mean()
            )
            return pdf

        return (
            base.groupBy(key)
            .applyInPandas(_plain, schema=out_schema)
            .drop("__ts")
        )

    base = base.withColumn("__bkt", F.floor(F.col("__ts") / bucket_secs))
    local_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in base.schema.fields]
        + ["`__local` double", "`__decay` double"]
    )
    decay = 1.0 - alpha

    def _local_iter(batches):
        import numpy as np

        # the single (key, bucket) group that can straddle an Arrow-batch
        # boundary (groups are contiguous after the partition sort, so at
        # most the LAST group of a batch continues): (key, bkt) -> (z, i)
        tail: dict = {}
        for pdf in batches:
            if pdf.empty:
                continue
            # dropna=False: a NULL key is a legitimate group on the plain
            # path (Spark groups NULLs), so the bucketed path must keep it
            # too — pandas' default dropna=True would silently exclude the
            # rows and int(NaN) the tail state
            g = pdf.groupby([key, "__bkt"], sort=False, dropna=False)
            i = (g.cumcount() + 1).to_numpy()
            # cython grouped recursion with pandas' y_1 = v_1 convention;
            # zero-state correction z_i = y_i − (1−α)^i·v_first is exact
            # algebra (both satisfy the same linear recursion).
            # GroupBy.ewm does NOT return rows in first-appearance order
            # (verified on real batches — groups can come back key-sorted),
            # so realign through the original-index level explicitly;
            # .to_numpy() straight off the result silently misassigns
            # whole group blocks.
            y_ser = g[value_col].ewm(alpha=alpha, adjust=False).mean()
            y = (
                y_ser.droplevel(list(range(y_ser.index.nlevels - 1)))
                .reindex(pdf.index)
                .to_numpy()
            )
            vfirst = g[value_col].transform("first").astype("float64").to_numpy()
            d_i = decay ** i.astype("float64")
            z = y - d_i * vfirst
            def _gid(pos):
                # NaN-normalized group id: a NULL key arrives as NaN and
                # NaN != NaN would break the cross-batch continuation match
                return tuple(
                    None if pd.isna(x) else x
                    for x in (pdf[key].iat[pos], pdf["__bkt"].iat[pos])
                )

            def _mask(gid):
                parts = []
                for col, want in zip((pdf[key], pdf["__bkt"]), gid):
                    parts.append(col.isna() if want is None else col == want)
                return (parts[0] & parts[1]).to_numpy()

            first_gid = _gid(0)
            if first_gid in tail:
                # continuation: fold the prior state in via linearity and
                # shift this group's decay exponents by the prior length
                z_prev, i_prev = tail.pop(first_gid)
                cont = _mask(first_gid)
                z[cont] = z[cont] + d_i[cont] * z_prev
                d_i[cont] = d_i[cont] * (decay ** float(i_prev))
                i = i.copy()
                i[cont] += i_prev
            tail = {_gid(-1): (float(z[-1]), int(i[-1]))}
            out = pdf.copy()
            out["__local"] = z
            out["__decay"] = d_i
            yield out

    local = (
        base.repartition(key, "__bkt")
        .sortWithinPartitions(key, "__bkt", "__ts", tiebreak_col)
        .mapInPandas(_local_iter, schema=local_schema)
    )
    summary = (
        local.groupBy(key, "__bkt")
        .agg(
            F.count(F.lit(1)).alias("__m"),
            F.max_by("__local", _tiebroken(F.col("__ts"), F.col(tiebreak_col))).alias(
                "__local_end"
            ),
            F.min_by(
                F.col(value_col).cast("double"),
                _tiebroken(F.col("__ts"), F.col(tiebreak_col)),
            ).alias("__first_val"),
        )
    )
    key_type = summary.schema[key].dataType.simpleString()
    carry_schema = f"`{key}` {key_type}, `__bkt` bigint, `__cin` double"

    def _carry_iter(batches):
        # ONE mapInPandas pass over key-partitioned, (key, __bkt)-sorted
        # summary rows — the same recursion the former groupBy(key).
        # applyInPandas ran, minus its per-GROUP Arrow cost: with |keys|
        # groups of ≤ |buckets| rows each, per-group batching paid one
        # Arrow slice + pandas construction + Python call PER KEY (~4 ms
        # × |keys| — measured 3.7 s of a 4.9 s entry at sf0.1, serialized
        # in one post-AQE task). Partition-level batches amortize that to
        # one crossing per task; the Python-float arithmetic below is
        # expression-identical to the old _carry, so carry states are
        # bit-identical. The one group that can straddle an Arrow batch
        # boundary chains through ``tail`` (the _local_iter idiom);
        # NaN-normalized key identity keeps a NULL key's buckets chained.
        tail: dict = {}
        for pdf in batches:
            if pdf.empty:
                continue
            import pandas as pd

            keys = [None if pd.isna(k) else k for k in pdf[key]]
            ms = pdf["__m"].tolist()
            les = pdf["__local_end"].tolist()
            firsts = pdf["__first_val"].tolist()
            cins = []
            prev = object()  # sentinel != any key value
            s = 0.0
            for pos in range(len(keys)):
                k = keys[pos]
                if pos == 0 and k in tail:
                    s = tail.pop(k)
                elif k != prev or pos == 0:
                    # pre-history state = the key's first value
                    s = float(firsts[pos])
                cins.append(s)
                s = float(les[pos]) + (1.0 - alpha) ** int(ms[pos]) * s
                prev = k
            tail = {keys[-1]: s}
            out = pdf[[key, "__bkt"]].copy()
            out["__cin"] = cins
            yield out

    carry = (
        summary.repartition(key)
        .sortWithinPartitions(key, "__bkt")
        .mapInPandas(_carry_iter, schema=carry_schema)
    )
    # NULL-SAFE carry join: a NULL key is a legitimate group on the plain
    # path (Spark windows/groupBys treat NULL as a value), so the stitch
    # must not lose it to SQL's NULL != NULL
    cj = carry.withColumnRenamed(key, "__ck").withColumnRenamed("__bkt", "__cb")
    return (
        local.join(
            cj,
            local[key].eqNullSafe(F.col("__ck"))
            & (local["__bkt"] == F.col("__cb")),
        )
        .withColumn(out_col, F.col("__local") + F.col("__decay") * F.col("__cin"))
        .drop("__ts", "__bkt", "__local", "__decay", "__ck", "__cb", "__cin")
    )


def range_join_count(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    radius_secs: int,
    agg_value: str | None = None,
    band_secs: int | None = None,
) -> DataFrame:
    """Banded range join: for every left row, count (and optionally sum a
    value over) right rows whose timestamp lies within ``±radius_secs``.

    Naive SQL is an inequality cross join — O(|L|·|R|) comparisons. The
    scale shape here is banded blocking: right rows hash into
    ``floor(ts/band)`` bands; each left row is exploded to the
    ⌈radius/band⌉·2+1 bands its radius can touch (a small constant) and
    equi-joined band-to-band before the exact ``|Δt| <= radius`` filter.
    Join degree is bounded by band occupancy — skewed bands can further be
    salted exactly like any hot equi-join key. Default band = radius, i.e.
    3 candidate bands per left row.

    Left rows with no right row in range keep count 0 / sum 0.0 (left
    join + coalesce). Columns: left columns + ``n_in_range`` +
    (``value_in_range`` when ``agg_value``). Left rows must be distinct
    (carry a key column): the post-join regroup groups by all left
    columns, so fully-identical left rows would collapse into one.

    ``radius_secs=0`` is the exactly-co-timestamped query (one candidate
    band, exact ``Δt = 0`` filter); negative radii and non-positive band
    widths are input errors.
    """
    if radius_secs < 0:
        raise ValueError(f"radius_secs must be >= 0, got {radius_secs}")
    band = band_secs if band_secs is not None else max(radius_secs, 1)
    if band <= 0:
        raise ValueError(f"band_secs must be > 0, got {band_secs}")
    n_bands = -(-radius_secs // band)  # ceil
    le = F.col(left_ts).cast("timestamp").cast("long")
    re_ = F.col(right_ts).cast("timestamp").cast("long")
    offsets = F.array(*[F.lit(i) for i in range(-n_bands, n_bands + 1)])
    l_exp = left.withColumn("__lts", le).withColumn(
        "__band",
        F.explode(
            F.transform(offsets, lambda o: F.floor(F.col("__lts") / band) + o)
        ),
    )
    r_banded = right.select(
        re_.alias("__rts"),
        F.floor(re_ / band).alias("__band"),
        *( [F.col(agg_value).alias("__rv")] if agg_value else [] ),
    )
    hit = F.abs(F.col("__lts") - F.col("__rts")) <= radius_secs
    joined = l_exp.join(r_banded, "__band", "left").withColumn(
        "__hit", F.when(hit, 1).otherwise(0)
    )
    group_cols = [c for c in left.columns]
    aggs = [F.sum("__hit").cast("long").alias("n_in_range")]
    if agg_value:
        aggs.append(
            F.round(
                F.coalesce(F.sum(F.when(hit, F.col("__rv"))), F.lit(0.0)), 2
            ).alias("value_in_range")
        )
    return joined.groupBy(*group_cols).agg(*aggs)
