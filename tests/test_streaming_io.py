"""Streaming / multimodal / CSV-IO ground-truth checks: bounded streaming
replays must agree with the equivalent batch aggregation; mapInPandas
features must agree with driver-side recomputation; CSV validation must
quarantine bad rows and FK orphans."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from market_data_mining_project_spark.operators import multimodal as MM
from market_data_mining_project_spark.sources import csv_io
from market_data_mining_project_spark.sources.tables import load_table
from market_data_mining_project_spark.streaming import events as EV


def test_running_user_totals_match_batch(spark, sf_dir):
    """The custom stateful op's final per-user totals must equal the batch
    groupBy over the same data (single availableNow batch ⇒ one update each)."""
    stream = EV.read_event_stream(spark, sf_dir)
    totals = EV.running_user_totals(stream)
    name = "t_user_totals"
    EV.run_bounded(totals, name, tempfile.mkdtemp(), output_mode="update")
    sink_rows = spark.table(name).collect()
    # totals are monotone per user — keep each user's LARGEST update so the
    # check is order-independent even if several micro-batches emitted
    streamed: dict = {}
    for r in sink_rows:
        cur = streamed.get(r.user_id)
        if cur is None or r.events_seen > cur[0]:
            streamed[r.user_id] = (r.events_seen, r.value_total)

    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum(F.coalesce("value", F.lit(0.0))), 2).alias("v"))
        .collect()
    )
    assert streamed
    # BOTH directions: every batch user streamed, and no phantom users
    assert set(streamed) == {r.user_id for r in batch}
    for r in batch:
        assert streamed[r.user_id][0] == r.n, r.user_id
        assert abs(streamed[r.user_id][1] - r.v) < 0.02, r.user_id


def test_streaming_emits_finalized_windows_canary(spark, sf_dir):
    """Canary: the bounded replay must FINALIZE windows, not just run.

    Round 3 regression: the events loader force-read a timestamp[us] `ts`
    column as int64 nanos and div-1000'd it into January 1970, so every event
    landed in one day-window whose end stayed beyond the watermark — append
    mode emitted 0 rows while every plan/oracle remained syntactically fine.
    This test pins both the symptom (0 finalized windows/sessions) and the
    root cause (a corrupted event-time domain) with direct messages so the
    next silent 0-row regression is diagnosable in seconds.
    """
    import datetime as dt

    lo, hi = (
        load_table(spark, sf_dir, "events").agg(F.min("ts"), F.max("ts")).collect()[0]
    )
    assert lo is not None and lo.year >= 2000, (
        f"events.ts min is {lo!r} — the loader is misreading the parquet "
        "physical type (epoch-era values mean a nanos/micros unit mismatch)"
    )
    assert (hi - lo) > dt.timedelta(days=1), (
        f"events.ts spans only {hi - lo} — day windows can never close under "
        "a 1-hour watermark, so append-mode streaming will emit 0 rows"
    )

    stream = EV.read_event_stream(spark, sf_dir)
    EV.run_bounded(EV.windowed_event_stats(stream), "canary_win", tempfile.mkdtemp())
    n_windows = spark.table("canary_win").count()
    assert n_windows > 0, (
        "windowed_event_stats finalized 0 windows in a bounded replay: the "
        "watermark never passed any window end — check the events loader's "
        "ts decoding before suspecting the streaming plan"
    )

    EV.run_bounded(
        EV.sessionize_events(EV.read_event_stream(spark, sf_dir)),
        "canary_sess",
        tempfile.mkdtemp(),
    )
    assert spark.table("canary_sess").count() > 0, (
        "sessionize_events finalized 0 sessions in a bounded replay — same "
        "watermark-never-advances failure mode as the window canary"
    )


def test_streaming_approx_users_close_to_exact(spark, sf_dir):
    """approx_count_distinct (the streaming-legal distinct) stays within HLL
    tolerance of the exact batch count."""
    stream = EV.read_event_stream(spark, sf_dir)
    stats = EV.windowed_event_stats(stream, "1 day", "1 hour")
    name = "t_win_stats"
    EV.run_bounded(stats, name, tempfile.mkdtemp())
    approx = spark.table(name).agg(F.sum("approx_users")).collect()[0][0]

    ev = load_table(spark, sf_dir, "events")
    exact = (
        ev.groupBy(F.window("ts", "1 day"), "event_type")
        .agg(F.countDistinct("user_id").alias("u"))
        .agg(F.sum("u"))
        .collect()[0][0]
    )
    assert approx == pytest.approx(exact, rel=0.15)


def test_streaming_dedup_drops_replayed_events(spark, tmp_path):
    """Ingest-side dedup: replayed (duplicate-payload) events within the
    watermark are dropped; bounded replay emits exactly the distinct set."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = []
    for i in range(5):  # 5 distinct events...
        for rep in range(3):  # ...each replayed 3x within a minute
            rows.append((i, base + dt.timedelta(seconds=10 * i + rep), float(i)))
    src = tmp_path / "stream_src"
    spark.createDataFrame(rows, "user_id LONG, ts TIMESTAMP, value DOUBLE").coalesce(
        1
    ).write.parquet(str(src))

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    stream = spark.readStream.schema(schema).parquet(str(src))
    deduped = EV.streaming_dedup(stream, watermark="1 hour")
    EV.run_bounded(deduped, "dedup_sink", str(tmp_path / "ck"))
    out = spark.table("dedup_sink").collect()
    assert len(out) == 5
    assert sorted(r.user_id for r in out) == list(range(5))


def test_cross_watermark_dedup_reconciliation(spark, tmp_path):
    """The composed dedup pipeline: a duplicate payload arriving AFTER the
    watermark evicted its key's state is re-emitted by the stream operator
    (bounded state working as designed), and the periodic batch sweep
    (`reconcile_dedup_sink`) still ends with exactly one copy — keeping the
    earliest arrival."""
    import datetime as dt

    import os as _os
    import time as _time

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    # four micro-batches (the watermark lags one batch, and state eviction
    # runs at the END of the batch — after that batch's dedup):
    #   1. payload A at 12:00 — dedup state expires at 13:00
    #   2. watermark pusher at 16:00 (processed under wm 11:00)
    #   3. filler at 16:30 — processed under wm 15:00, so A's expired state
    #      is physically removed when this batch closes
    #   4. the SAME payload A replayed at 17:00 (not late: > watermark) —
    #      state is gone, so the stream operator re-emits it by design
    files = [
        [(1, base, 42.0)],
        [(2, base.replace(hour=16), 7.0)],
        [(4, base.replace(hour=16, minute=30), 8.0)],
        [(1, base.replace(hour=17), 42.0), (3, base.replace(hour=17, minute=30), 9.0)],
    ]
    src = tmp_path / "cw_src"
    schema = "user_id LONG, ts TIMESTAMP, value DOUBLE"
    now = _time.time()
    written: set = set()
    for i, rows in enumerate(files):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(str(src))
        # pin mtimes so the file source (ordered by modification time)
        # replays the horizons in fixture order
        for part in src.glob("part-*.parquet"):
            if part not in written:
                _os.utime(part, (now - 300 + 60 * i, now - 300 + 60 * i))
                written.add(part)

    stream = (
        spark.readStream.schema(
            T.StructType(
                [
                    T.StructField("user_id", T.LongType()),
                    T.StructField("ts", T.TimestampType()),
                    T.StructField("value", T.DoubleType()),
                ]
            )
        )
        .option("maxFilesPerTrigger", 1)  # one horizon per micro-batch
        .parquet(str(src))
    )
    deduped = EV.streaming_dedup(stream, watermark="1 hour")
    EV.run_bounded(deduped, "cw_dedup_sink", str(tmp_path / "cw_ck"))
    sink = spark.table("cw_dedup_sink")

    a_copies = sink.filter((F.col("user_id") == 1) & (F.col("value") == 42.0)).collect()
    assert len(a_copies) == 2, (
        "expected the replay to slip past the evicted state — if this is 1, "
        "the fixture no longer crosses watermark horizons and the test "
        "exercises nothing"
    )

    reconciled = EV.reconcile_dedup_sink(sink, time_col="ts")
    a_final = reconciled.filter((F.col("user_id") == 1) & (F.col("value") == 42.0)).collect()
    assert len(a_final) == 1
    assert a_final[0].ts == base  # earliest arrival wins
    # the distinct payloads all survive
    assert reconciled.count() == 4


def test_events_loader_adapts_to_both_ts_encodings(spark, tmp_path):
    """The events loader must read BOTH physical vintages of `ts` to the same
    logical timestamps: raw int64 nanoseconds (the original testdata, which
    Spark's footer conversion can't map) and timestamp[us] (the current one,
    which a forced-long read would corrupt into 1970)."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from market_data_mining_project_spark.sources import tables as TB

    stamps = [dt.datetime(2024, 3, 1, 12, 0, i) for i in range(4)]
    cols = {
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        "user_id": pa.array([10, 10, 11, 12], pa.int64()),
        "event_type": pa.array(["click"] * 4),
        "value": pa.array([1.0, 2.0, 3.0, 4.0]),
        "props": pa.array(["{}"] * 4),
    }
    nanos_dir, micros_dir = tmp_path / "nanos_sf", tmp_path / "micros_sf"
    for d in (nanos_dir, micros_dir):
        d.mkdir()
    ts_nanos = pa.array(
        [int(t.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000_000) for t in stamps],
        pa.int64(),
    )
    pq.write_table(
        pa.table({**cols, "ts": ts_nanos}), nanos_dir / "events.parquet"
    )
    pq.write_table(
        pa.table({**cols, "ts": pa.array(stamps, pa.timestamp("us"))}),
        micros_dir / "events.parquet",
    )

    assert TB.events_ts_is_nanos(str(nanos_dir / "events.parquet"))
    assert not TB.events_ts_is_nanos(str(micros_dir / "events.parquet"))

    read = lambda d: sorted(
        (r.event_id, r.ts) for r in TB.load_events(spark, str(d)).collect()
    )
    from_nanos, from_micros = read(nanos_dir), read(micros_dir)
    assert from_micros == [(i + 1, stamps[i]) for i in range(4)]
    # the int64-nanos file decodes to the same wall-clock instants
    assert [t for _, t in from_nanos] == [t for _, t in from_micros]


def test_media_mean_byte_ground_truth(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    media = MM.attach_media(docs, "doc_id", "text")
    feats = {r.media_id: r.mean_byte for r in MM.media_features(media).collect()}
    for r in docs.select("doc_id", "text").collect():
        b = r.text.encode("utf-8")
        expected = round(sum(b) / len(b), 6) if b else 0.0
        assert feats[r.doc_id] == pytest.approx(expected, abs=1e-6), r.doc_id


def test_decode_image_is_stubbed():
    with pytest.raises(NotImplementedError, match="pillow"):
        MM.decode_image(b"\x89PNG fake")


def test_frame_sample_covers_every_nth_chunk(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(20)
    media = MM.attach_media(docs, "doc_id", "text")
    frames = MM.frame_sample(media, every_n_chunks=4, chunk_size=256).collect()
    texts = {r.doc_id: r.text.encode("utf-8") for r in docs.collect()}
    by_media: dict = {}
    for f in frames:
        by_media.setdefault(f.media_id, []).append(f)
        blob = texts[f.media_id]
        assert bytes(f.chunk) == blob[f.chunk_index * 256 : (f.chunk_index + 1) * 256]
    for mid, fs in by_media.items():
        n_chunks = (len(texts[mid]) + 255) // 256
        assert sorted(f.chunk_index for f in fs) == list(range(0, n_chunks, 4))


def test_csv_validated_quarantines_bad_rows_and_orphans(spark, tmp_path):
    csv = tmp_path / "in.csv"
    csv.write_text(
        "id,custkey,amount\n"
        "1,10,5.50\n"
        "2,10,not_a_number\n"  # type error -> rejected
        "3,99,7.25\n"  # FK orphan
        "4,11,1.00\n"
    )
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("custkey", T.LongType()),
            T.StructField("amount", T.DoubleType()),
        ]
    )
    dim = spark.createDataFrame([(10,), (11,)], ["custkey"])
    load = csv_io.read_csv_validated(spark, str(csv), schema, fk=("custkey", dim))
    assert sorted(r.id for r in load.valid.collect()) == [1, 4]
    assert load.rejected.count() == 1
    assert [r.id for r in load.fk_orphans.collect()] == [3]


def test_text_profile_runs_unchanged_on_stream(spark, sf_dir, tmp_path):
    """Replay/live symmetry for the text pipeline: the same pure-column text
    operators (language ID, quality, fingerprint) run on a stream without
    modification, and a bounded replay reproduces the batch result exactly."""
    from market_data_mining_project_spark.operators import text as TXT

    docs = load_table(spark, sf_dir, "documents")
    batch = {
        r.doc_id: (r.detected_lang, r.quality, r.fingerprint)
        for r in TXT.text_profile(TXT.detect_language(docs, "text"), "text")
        .select("doc_id", "detected_lang", "quality", "fingerprint")
        .collect()
    }
    src = str(tmp_path / "docs_src")
    docs.select("doc_id", "lang", "text").write.parquet(src)
    stream = spark.readStream.schema("doc_id LONG, lang STRING, text STRING").parquet(src)
    profiled = TXT.text_profile(TXT.detect_language(stream, "text"), "text").select(
        "doc_id", "detected_lang", "quality", "fingerprint"
    )
    EV.run_bounded(profiled, "text_profile_stream", str(tmp_path / "ck"))
    streamed = {
        r.doc_id: (r.detected_lang, r.quality, r.fingerprint)
        for r in spark.table("text_profile_stream").collect()
    }
    assert streamed == batch


def test_jsonl_roundtrip_validates_and_quarantines(spark, tmp_path):
    """JSONL corpus interchange: malformed lines quarantined, FK orphans
    split out, valid docs round-trip export → import unchanged."""
    from market_data_mining_project_spark.sources import jsonl_io

    src = tmp_path / "in.jsonl"
    src.write_text(
        '{"doc_id": 1, "lang": "en", "text": "hello world"}\n'
        '{"doc_id": "not_a_number", "lang": "en", "text": "bad id"}\n'
        "this is not json at all\n"
        '{"doc_id": 3, "lang": "zz", "text": "orphan lang"}\n'
        '{"doc_id": 4, "lang": "fr", "text": "bonjour"}\n'
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("lang", T.StringType()),
            T.StructField("text", T.StringType()),
        ]
    )
    dim = spark.createDataFrame([("en",), ("fr",)], ["lang"])
    load = jsonl_io.read_jsonl_validated(spark, str(src), schema, fk=("lang", dim))
    assert sorted(r.doc_id for r in load.valid.collect()) == [1, 4]
    assert load.rejected.count() == 2
    assert [r.doc_id for r in load.fk_orphans.collect()] == [3]

    out = tmp_path / "out.jsonl"
    jsonl_io.export_jsonl(load.valid, str(out), columns=["doc_id", "text"])
    back = jsonl_io.read_jsonl_validated(
        spark,
        str(out),
        T.StructType(
            [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
        ),
    )
    assert {(r.doc_id, r.text) for r in back.valid.collect()} == {
        (1, "hello world"), (4, "bonjour"),
    }
    assert back.rejected.count() == 0


def test_csv_export_caps_and_headers(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    out = str(tmp_path / "export")
    csv_io.export_csv(orders, out, columns=["o_orderkey", "o_totalprice"], limit=100)
    back = spark.read.option("header", True).csv(out)
    assert back.count() == 100
    assert back.columns == ["o_orderkey", "o_totalprice"]


def test_streaming_enrichment_equals_batch(spark, sf_dir):
    """Stream-static enrichment replay == the identical batch plan under the
    same watermark-finalization rule (a window is emitted iff its end <=
    max event time - delay)."""
    import datetime

    import __spark_entry__ as entry_mod

    got = sorted(
        map(tuple, entry_mod.queries()["streaming_enriched"](spark, sf_dir).collect())
    )
    ev = load_table(spark, sf_dir, "events")
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    mx = ev.agg(F.max("ts")).collect()[0][0]
    cutoff = mx - datetime.timedelta(hours=1)
    want = sorted(
        map(
            tuple,
            (
                ev.join(F.broadcast(dim), "user_id", "left")
                .groupBy(F.window("ts", "1 day").alias("w"), "c_mktsegment")
                .agg(
                    F.count(F.lit(1)).alias("events"),
                    F.round(F.sum("value"), 2).alias("total_value"),
                )
                .filter(F.col("w.end") <= F.lit(cutoff))
                .select(
                    F.col("w.start").cast("long").alias("window_start_epoch"),
                    "c_mktsegment",
                    "events",
                    "total_value",
                )
                .collect()
            ),
        )
    )
    assert want, "replay should finalize at least one enriched window"
    assert got == want
    # enrichment happened: every emitted row carries a real segment
    assert all(r[1] is not None for r in got)


def test_event_stream_reads_directory_layout(spark, sf_dir, tmp_path):
    """events.parquet written as a DIRECTORY dataset (what any Spark writer
    produces) must stream every row — the leaf-name glob filter that
    single-file layouts need would silently match nothing here."""
    import os

    ev = load_table(spark, sf_dir, "events")
    want = ev.count()
    root = str(tmp_path / "dir_layout_sf")
    os.makedirs(root)
    ev.write.parquet(os.path.join(root, "events.parquet"))
    stream = EV.read_event_stream(spark, root)
    ck = tempfile.mkdtemp(prefix="ck_dirlayout_")
    EV.run_bounded(stream, "dirlayout_events", ck, "append")
    got = spark.table("dirlayout_events").count()
    assert got == want, f"directory-layout stream read {got} of {want} rows"


def test_streaming_range_join_equals_batch(spark, sf_dir):
    """The stream-stream interval join entry must equal the hash-oracled
    batch banded range join FRAME-FOR-FRAME (same pairs found by the
    symmetric hash join as by banded blocking, zero-match purchases
    re-attached)."""
    from market_data_mining_project_spark.plans import events_temporal as ET
    from market_data_mining_project_spark.plans import pipeline_io as PIO

    stream_rows = {
        r.event_id: (r.user_id, r.ts_epoch, r.value, r.n_errors_15min, r.error_value_15min)
        for r in PIO.q_streaming_range_join(spark, sf_dir).collect()
    }
    batch_rows = {
        r.event_id: (r.user_id, r.ts_epoch, r.value, r.n_errors_15min, r.error_value_15min)
        for r in ET.q_range_join_errors(spark, sf_dir).collect()
    }
    assert stream_rows == batch_rows
    assert any(v[3] > 0 for v in batch_rows.values()), "fixture has no matches"


def test_interval_join_requires_distinct_ts_names(spark):
    from market_data_mining_project_spark.streaming import events as EV
    import pytest as _pytest

    df = spark.range(1).select(F.col("id").cast("timestamp").alias("ts"))
    with _pytest.raises(ValueError):
        EV.interval_join_streams(df, df, "ts", "ts", 10)


def test_checkpoint_resume_keeps_frozen_state_partitions(spark, tmp_path):
    """The production failure mode run_bounded's docstring warns about:
    state-store partition count is spark.sql.shuffle.partitions AT THE
    FIRST BATCH, frozen into the checkpoint. Resuming the same checkpoint
    under a DIFFERENT session sizing must (a) keep the frozen store
    layout on disk and (b) keep state-dependent output correct — here,
    replayed batch-1 payloads arriving in batch 2 are still dropped, so
    the dedup state demonstrably survived the resume."""
    import datetime as dt
    import os

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    src = tmp_path / "resume_src"
    ck = str(tmp_path / "resume_ck")
    batch1 = [
        (i, base + dt.timedelta(seconds=10 * i), float(i)) for i in range(5)
    ]
    spark.createDataFrame(batch1, schema).coalesce(1).write.parquet(str(src))

    out_path = str(tmp_path / "resume_out")

    def _drain(sink: str, n_parts: int) -> None:
        stream = spark.readStream.schema(schema).parquet(str(src))
        EV.run_bounded(
            EV.streaming_dedup(stream, watermark="1 hour"),
            sink,
            ck,
            state_partitions=n_parts,
            sink_path=out_path,  # file sink: the resumable production shape
        )

    _drain("resume_sink_a", 4)
    assert len(spark.read.parquet(out_path).collect()) == 5

    # batch 2: exact replays of batch 1 + five new events, then resume
    # under a DIFFERENT partition setting
    batch2 = batch1 + [
        (i, base + dt.timedelta(seconds=10 * i), float(i)) for i in range(5, 10)
    ]
    spark.createDataFrame(batch2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    _drain("resume_sink_b", 16)

    out = spark.read.parquet(out_path).collect()
    # exactly once across the resume: the five NEW events appended, the
    # replayed payloads dropped against state written before the resume —
    # dedup state demonstrably round-tripped through the checkpoint
    assert sorted(r.user_id for r in out) == list(range(10)), out

    # the store layout on disk keeps the FROZEN width (4), not the
    # resume-time session setting (16)
    state_op = os.path.join(ck, "state", "0")
    widths = sorted(
        int(d) for d in os.listdir(state_op) if d.isdigit()
    )
    assert widths == list(range(4)), widths


def test_interval_join_validates_radius_band_and_columns(spark):
    """The stream twin mirrors the batch range join's validation: radius 0
    is the co-timestamped query, negative radius / zero band are errors,
    and shared non-ts column names are rejected up front (both sides
    survive into the output — an ambiguous reference would otherwise
    surface only at the first downstream select)."""
    df = spark.readStream.format("rate").load()
    l = df.select(F.col("timestamp").alias("lt"), F.col("value").alias("lv"))
    r = df.select(F.col("timestamp").alias("rt"), F.col("value").alias("rv"))
    # radius 0 builds a valid plan (single band)
    EV.interval_join_streams(l, r, "lt", "rt", 0)
    with pytest.raises(ValueError, match="radius"):
        EV.interval_join_streams(l, r, "lt", "rt", -1)
    with pytest.raises(ValueError, match="band"):
        EV.interval_join_streams(l, r, "lt", "rt", 10, band_secs=0)
    shared = df.select(F.col("timestamp").alias("rt"), "value")
    with pytest.raises(ValueError, match="share column names"):
        EV.interval_join_streams(
            l.withColumnRenamed("lv", "value"), shared, "lt", "rt", 10
        )


def test_reconcile_dedup_tiebreak_is_data_deterministic(spark):
    """Equal-timestamp duplicates under user keys keep the row picked by a
    FULL-ROW hash — a pure function of the data, not of partitioning."""
    import datetime as dt

    t = dt.datetime(2024, 1, 1)
    rows = [(7, t, "a"), (7, t, "b"), (8, t, "z")]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, payload string")
    kept = {
        r.user_id: r.payload
        for r in EV.reconcile_dedup_sink(df, keys=["user_id"]).collect()
    }
    # recompute the expected winner from the hash rule itself
    h = {
        r.payload: r.h
        for r in df.filter(F.col("user_id") == 7)
        .select("payload", F.xxhash64("user_id", "ts", "payload").alias("h"))
        .collect()
    }
    want = min(h, key=lambda p: h[p])
    assert kept[7] == want and kept[8] == "z"
    again = {
        r.user_id: r.payload
        for r in EV.reconcile_dedup_sink(
            df.repartition(7), keys=["user_id"]
        ).collect()
    }
    assert again == kept


def test_streaming_range_join_empty_events(spark, tmp_path):
    """An empty (or fully filtered) events table returns the empty frame
    with the real schema — not a NoneType TypeError from the horizon
    min/max scan."""
    from market_data_mining_project_spark.plans import pipeline_io as PIO

    empty = spark.createDataFrame(
        [], "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    empty.write.parquet(f"{tmp_path}/events.parquet")
    out = PIO.q_streaming_range_join(spark, str(tmp_path))
    assert out.count() == 0
    assert out.columns == [
        "event_id", "user_id", "ts_epoch", "value",
        "n_errors_15min", "error_value_15min",
    ]


def test_bounded_memory_sinks_keep_one_generation(spark, sf_dir):
    """Repeated catalog sweeps must not accumulate memory-sink tables:
    update-mode replays drop the previous generation's table, append-mode
    replays use a file sink and register no table at all."""
    from market_data_mining_project_spark.plans import pipeline_io as PIO

    first = PIO.q_running_user_totals(spark, sf_dir).collect()
    second = PIO.q_running_user_totals(spark, sf_dir).collect()
    assert sorted(map(tuple, first)) == sorted(map(tuple, second))
    live = [t.name for t in spark.catalog.listTables() if t.name.startswith("user_totals")]
    assert len(live) == 1, f"previous generations must be dropped, saw {live}"

    PIO.q_streaming_window_stats(spark, sf_dir).collect()
    assert not [t.name for t in spark.catalog.listTables() if t.name.startswith("win_stats")]


def test_events_ts_probe_sees_midprocess_rewrite(tmp_path):
    """The footer-probe memo is keyed on the file's (mtime, size) signature:
    rewriting events.parquet to the OTHER ts encoding in-process must
    re-probe — a path-keyed memo would force-long a micros file and collapse
    every timestamp toward 1970 with no error."""
    import datetime as dt
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from market_data_mining_project_spark.sources import tables as TB

    stamps = [dt.datetime(2024, 3, 1, 12, 0, i) for i in range(3)]
    path = tmp_path / "events.parquet"
    nanos = pa.array(
        [int(t.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000_000) for t in stamps],
        pa.int64(),
    )
    pq.write_table(pa.table({"ts": nanos}), path)
    assert TB.events_ts_is_nanos(str(path))
    pq.write_table(pa.table({"ts": pa.array(stamps, pa.timestamp("us"))}), path)
    os.utime(path, ns=(os.stat(path).st_mtime_ns + 1, os.stat(path).st_mtime_ns + 1))
    assert not TB.events_ts_is_nanos(str(path))


def test_validated_load_releases_cached_raw(spark, tmp_path):
    """import_to_parquet is the terminal step of the landing flow — after it
    returns, the raw CSV cache must not stay pinned in executor storage."""
    csv = tmp_path / "in_csv"
    spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string").write.option(
        "header", True
    ).csv(str(csv))
    schema = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("v", T.StringType())]
    )
    load = csv_io.read_csv_validated(spark, str(csv), schema)
    assert load._raw.storageLevel.useMemory or load._raw.storageLevel.useDisk
    counts = csv_io.import_to_parquet(load, str(tmp_path / "landed"))
    assert counts["imported"] == 2
    assert not (load._raw.storageLevel.useMemory or load._raw.storageLevel.useDisk)


def test_crash_between_sink_and_checkpoint_commit_stays_exactly_once(spark, tmp_path):
    """r8 crash injection: a micro-batch commits in TWO steps — the file
    sink's manifest entry (_spark_metadata/N) first, the checkpoint's
    commits/N second. A crash in between leaves a batch the sink durably
    wrote but the checkpoint believes unprocessed; on restart the engine
    REPLAYS that batch, and exactly-once holds only if the FileStreamSink
    consults its manifest and skips the already-committed write. Simulate
    exactly that window by deleting the newest commits/N after a drained
    run, then resume with new input — the sink must show every row exactly
    once: no batch-0 duplicates, no missing batch-1 rows."""
    import datetime as dt
    import os

    base = dt.datetime(2024, 3, 1, 9, 0, 0)
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    src = tmp_path / "crash_src"
    ck = str(tmp_path / "crash_ck")
    out_path = str(tmp_path / "crash_out")
    batch1 = [(i, base + dt.timedelta(seconds=i), float(i)) for i in range(5)]
    spark.createDataFrame(batch1, schema).coalesce(1).write.parquet(str(src))

    def _drain(sink: str) -> None:
        stream = spark.readStream.schema(schema).parquet(str(src))
        EV.run_bounded(
            stream.withColumn("doubled", F.col("value") * 2),
            sink,
            ck,
            state_partitions=4,
            sink_path=out_path,
        )

    _drain("crash_sink_a")
    assert sorted(r.user_id for r in spark.read.parquet(out_path).collect()) == list(range(5))
    commits = sorted(f for f in os.listdir(os.path.join(ck, "commits")) if f.isdigit())
    assert commits, "expected at least one checkpoint commit"

    # the injected crash: sink manifest for the last batch EXISTS, its
    # checkpoint commit does not. Remove the hidden Hadoop checksum sibling
    # too — a stale .crc makes the replay's rewrite look like a concurrent
    # writer instead of a clean crash window.
    os.remove(os.path.join(ck, "commits", commits[-1]))
    crc = os.path.join(ck, "commits", f".{commits[-1]}.crc")
    if os.path.exists(crc):
        os.remove(crc)

    batch2 = [(i, base + dt.timedelta(seconds=i), float(i)) for i in range(5, 10)]
    spark.createDataFrame(batch2, schema).coalesce(1).write.mode("append").parquet(str(src))
    _drain("crash_sink_b")

    got = sorted(r.user_id for r in spark.read.parquet(out_path).collect())
    assert got == list(range(10)), f"not exactly-once after crash replay: {got}"
    # the engine really did REPLAY the uncommitted batch (its commit file
    # is back) and then processed the new one
    commits_after = sorted(
        int(f) for f in os.listdir(os.path.join(ck, "commits")) if f.isdigit()
    )
    assert commits_after == [0, 1], commits_after


def test_streaming_state_audit_grains_agree(spark, sf_dir):
    """The r11 merged entry: the streaming dedup grain and the batch
    reconcile-sweep grain run independent algorithms over the same
    replayed input and must agree row-for-row; the replay slice must
    actually be dropped (deduped count < raw + replay count); the totals
    grain must match the raw per-user aggregate."""
    from market_data_mining_project_spark.plans import pipeline_io as PIO
    from market_data_mining_project_spark.sources.tables import load_table

    out = PIO.q_streaming_state_audit(spark, sf_dir).collect()
    by_grain = {}
    for r in out:
        by_grain.setdefault(r.grain, []).append(
            (r.user_id, r.events_seen, r.value_total)
        )
    assert set(by_grain) == {"totals", "stream_dedup", "batch_dedup"}
    assert sorted(by_grain["stream_dedup"]) == sorted(by_grain["batch_dedup"])

    ev = load_table(spark, sf_dir, "events")
    raw_count = ev.count()
    replay_count = ev.filter(F.col("event_id") % 7 == 0).count()
    deduped_count = sum(n for _, n, _ in by_grain["stream_dedup"])
    # every replayed payload is a duplicate of a raw one — the dedup must
    # drop at least the whole replay slice
    assert deduped_count <= raw_count
    assert deduped_count < raw_count + replay_count

    exact = {
        (r.user_id, r.events_seen, r.value_total)
        for r in ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("events_seen"),
            F.round(F.sum("value"), 2).alias("value_total"),
        )
        .collect()
    }
    assert set(by_grain["totals"]) == exact
