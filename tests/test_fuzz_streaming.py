"""Streaming fuzz: randomized multi-batch replays vs independent Python
twins of the watermark semantics (r10, VERDICT item 6).

The batch-operator fuzz harness (test_fuzz_differential) stops at batch
plans; the streaming entries were fixed-fixture equals-batch gates. Here
every case randomizes event times, watermark delays, late-data fractions,
session gaps and the micro-batch file split, then replays through the REAL
streaming operators (file source, maxFilesPerTrigger=1, availableNow) and
checks against a from-scratch simulation of Spark's documented two-watermark
rule, pinned empirically before writing the twins:

  - batch i filters late rows with lateWM_i  = maxET(batches ≤ i-2) − delay
    (the PREVIOUS batch's eviction watermark — Spark's
    watermarkForLateEvents), predicate: window/session END ≤ lateWM drops;
  - batch i evicts+emits (append mode) with evictWM_i = maxET(≤ i-1) − delay;
  - availableNow runs a final no-data batch, so the last eviction uses
    maxET(all) − delay.

Values are multiples of 0.25 so every sum is exact in binary and ROUND(x, 2)
can never flip on summation order between engines.

Failures print the seed: reproduce with the same case + seed.
"""

from __future__ import annotations

import glob
import math
import os
import random
import shutil

import pytest
from pyspark.sql import functions as F

from market_data_mining_project_spark.streaming import events as EV

#: streaming replays cost seconds each (micro-batch machinery +
#: checkpoint), so the default seed budget is a quarter of the batch
#: harness's; crank both via SPARK_GRAFT_FUZZ_SEEDS.
N_SEEDS = max(4, int(os.environ.get("SPARK_GRAFT_FUZZ_SEEDS", "20")) // 4)

BASE = 1_700_000_000
SCHEMA = "user_id long, ts timestamp, value double, event_type string"


def _gen_batches(rng: random.Random):
    """Random event rows split into 2-4 ordered micro-batch files. Later
    files deliberately contain earlier timestamps (natural lateness) plus
    an injected fraction of VERY late rows (behind the running max by
    several delays)."""
    n_users = rng.randint(1, 5)
    horizon = rng.randint(2, 40) * 3600
    n = rng.randint(30, 90)
    rows = [
        (rng.randint(1, n_users), BASE + rng.randint(0, horizon),
         rng.randrange(0, 40) * 0.25, rng.choice(("view", "click", "buy")))
        for _ in range(n)
    ]
    n_files = rng.randint(2, 4)
    batches = [[] for _ in range(n_files)]
    for r in rows:
        batches[rng.randrange(n_files)].append(r)
    # very-late injections into non-first files
    for _ in range(rng.randint(0, 8)):
        i = rng.randrange(1, n_files)
        batches[i].append(
            (rng.randint(1, n_users), BASE + rng.randint(0, horizon // 4),
             rng.randrange(0, 40) * 0.25, rng.choice(("view", "click", "buy")))
        )
    return [b for b in batches if b]


def _write_stream_dir(spark, tmp_path, batches):
    """One leaf parquet file per batch, mtimes ordered so the file source
    replays them as separate micro-batches in order."""
    d = str(tmp_path / "src")
    os.makedirs(d, exist_ok=True)
    for i, rows in enumerate(batches):
        df = (
            spark.createDataFrame(
                rows, "user_id long, ts_epoch long, value double, event_type string"
            )
            .select(
                "user_id", F.timestamp_seconds("ts_epoch").alias("ts"),
                "value", "event_type",
            )
        )
        stage = os.path.join(d, f"_stage{i}")
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        dest = os.path.join(d, f"b{i:02d}.parquet")
        shutil.move(part, dest)
        shutil.rmtree(stage)
        os.utime(dest, (1000 + i, 1000 + i))
    return d


def _read_stream(spark, d):
    return spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", "1").parquet(d)


def _run_append_to_parquet(df, tmp_path, name):
    out = str(tmp_path / f"{name}_out")
    EV.run_bounded(df, name, str(tmp_path / f"{name}_ck"), sink_path=out)
    spark = df.sparkSession
    try:
        return spark.read.parquet(out)
    except Exception:  # zero finalized rows -> no files written
        return None


def _wm_steps(batches, delay):
    """(late_wm, evict_wm) per batch, plus the finalization eviction wm."""
    max_et = [-math.inf]  # max event time through batch i-1, prefix list
    for rows in batches:
        max_et.append(max(max_et[-1], max(r[1] for r in rows)))
    steps = []
    for i in range(len(batches)):
        late = (max_et[i - 1] - delay) if i >= 2 else -math.inf
        evict = (max_et[i] - delay) if i >= 1 else -math.inf
        steps.append((late, evict))
    return steps, max_et[-1] - delay


def case_tumbling_window(spark, tmp_path, rng):
    width = rng.choice([600, 1800, 3600, 7200])
    delay_min = rng.randint(5, 120)
    delay = delay_min * 60
    batches = _gen_batches(rng)
    d = _write_stream_dir(spark, tmp_path, batches)
    stats = EV.windowed_event_stats(
        _read_stream(spark, d), window=f"{width // 60} minutes",
        watermark=f"{delay_min} minutes",
    )
    got_df = _run_append_to_parquet(stats, tmp_path, "fz_win")
    got = {}
    if got_df is not None:
        for r in got_df.collect():
            got[(int(r.window_start.timestamp()), r.event_type)] = (
                r.events, r.total_value,
            )

    # twin: simulate the two-watermark rule over epoch-aligned windows
    steps, final_wm = _wm_steps(batches, delay)
    state: dict[tuple, list] = {}
    emitted: dict[tuple, tuple] = {}
    for (late_wm, evict_wm), rows in zip(steps, batches):
        for _, ts, v, et in rows:
            start = (ts // width) * width
            if start + width <= late_wm:
                continue  # late: window end behind the late-events watermark
            k = (start, et)
            state.setdefault(k, [0, 0.0])
            state[k][0] += 1
            state[k][1] += v
        for k in [k for k in state if k[0] + width <= evict_wm]:
            n, sv = state.pop(k)
            emitted[k] = (n, round(sv, 2))
    for k in [k for k in state if k[0] + width <= final_wm]:
        n, sv = state.pop(k)
        emitted[k] = (n, round(sv, 2))
    assert got == emitted


def case_session_window(spark, tmp_path, rng):
    gap = rng.choice([300, 600, 1800, 3600])
    delay_min = rng.randint(5, 120)
    delay = delay_min * 60
    batches = _gen_batches(rng)
    d = _write_stream_dir(spark, tmp_path, batches)
    sess = EV.sessionize_events(
        _read_stream(spark, d), gap=f"{gap // 60} minutes",
        watermark=f"{delay_min} minutes",
    )
    got_df = _run_append_to_parquet(sess, tmp_path, "fz_sess")
    got = set()
    if got_df is not None:
        for r in got_df.collect():
            got.add(
                (r.user_id, int(r.session_start.timestamp()),
                 int(r.session_end.timestamp()), r.events, r.session_value)
            )

    steps, final_wm = _wm_steps(batches, delay)
    state: dict[int, list] = {}  # user -> [(ts, v)]
    emitted = set()

    def merge(rows):
        rows = sorted(rows)
        out, cur = [], [rows[0]]
        cur_end = rows[0][0] + gap
        for t, v in rows[1:]:
            if t < cur_end:  # session windows merge on OVERLAP [ts, ts+gap)
                cur.append((t, v))
                cur_end = max(cur_end, t + gap)
            else:
                out.append((cur, cur_end))
                cur, cur_end = [(t, v)], t + gap
        out.append((cur, cur_end))
        return out

    def step(evict_wm):
        for u in list(state):
            keep = []
            for rows, end in merge(state[u]):
                if end <= evict_wm:
                    emitted.add(
                        (u, rows[0][0], end, len(rows),
                         round(sum(v for _, v in rows), 2))
                    )
                else:
                    keep.extend(rows)
            if keep:
                state[u] = keep
            else:
                del state[u]

    for (late_wm, evict_wm), rows in zip(steps, batches):
        for u, ts, v, _et in rows:
            if ts + gap <= late_wm:
                continue
            state.setdefault(u, []).append((ts, v))
        step(evict_wm)
    step(final_wm)
    assert got == emitted


def case_dedup_reconcile(spark, tmp_path, rng):
    """The composed ingest-dedup contract, which is implementation-
    independent where dropDuplicatesWithinWatermark alone is not (a dup
    beyond the delay MAY be re-emitted): streaming dedup at ingest, batch
    reconcile over the sink — the final frame must equal exact batch dedup
    keeping the earliest arrival per payload, for ANY dup placement."""
    delay_min = rng.randint(5, 60)
    n_users = rng.randint(1, 4)
    horizon = rng.randint(2, 20) * 3600
    used_ts = set()

    def fresh_ts():
        while True:
            t = BASE + rng.randint(0, horizon)
            if t not in used_ts:
                used_ts.add(t)
                return t

    payloads = [
        (rng.randint(1, n_users), rng.randrange(0, 40) * 0.25,
         rng.choice(("view", "click", "buy")))
        for _ in range(rng.randint(10, 30))
    ]
    rows = [(u, fresh_ts(), v, et) for u, v, et in payloads]
    # duplicate a random subset at random other times (near AND far)
    for u, ts, v, et in list(rows):
        for _ in range(rng.randint(0, 2)):
            rows.append((u, fresh_ts(), v, et))
    n_files = rng.randint(2, 4)
    batches = [[] for _ in range(n_files)]
    for r in rows:
        batches[rng.randrange(n_files)].append(r)
    batches = [b for b in batches if b]
    d = _write_stream_dir(spark, tmp_path, batches)
    deduped = EV.streaming_dedup(
        _read_stream(spark, d), watermark=f"{delay_min} minutes"
    )
    sink_df = _run_append_to_parquet(deduped, tmp_path, "fz_dedup")
    assert sink_df is not None, "dedup sink empty"
    sink = [
        (r.user_id, round(r.value, 2), r.event_type, int(r.ts.timestamp()))
        for r in sink_df.collect()
    ]
    final = EV.reconcile_dedup_sink(sink_df)
    got = {
        (r.user_id, round(r.value, 2), r.event_type, int(r.ts.timestamp()))
        for r in final.collect()
    }

    # The implementation-independent contract (streaming dedup keeps the
    # first ARRIVAL, which need not be the earliest event time, and a dup
    # beyond the delay may legitimately re-emit — so the twin asserts set
    # properties over the rows that SURVIVE the late filter, which the
    # probe pinned as: batch-i rows with ts ≤ lateWM_i are dropped, where
    # lateWM_i = maxET(batches ≤ i-2) − delay (the two-watermark rule):
    steps, _ = _wm_steps(batches, delay_min * 60)
    surviving = {
        (u, round(v, 2), et, ts)
        for (late_wm, _), rows_b in zip(steps, batches)
        for u, ts, v, et in rows_b
        if ts > late_wm
    }
    surv_payloads = {(u, v, et) for u, v, et, _ in surviving}
    # 1. every sink row is a real surviving input row (nothing invented,
    #    nothing late resurrected)
    assert set(sink) <= surviving
    # 2. no on-time payload lost anywhere in the pipeline
    assert {(u, v, et) for u, v, et, _ in sink} == surv_payloads
    # 3. reconcile keeps EXACTLY one row per payload...
    assert {(u, v, et) for u, v, et, _ in got} == surv_payloads
    assert len(got) == len(surv_payloads)
    # 4. ...namely the earliest-event-time row among the sink's survivors
    best: dict[tuple, int] = {}
    for u, v, et, ts in sink:
        if (u, v, et) not in best or ts < best[(u, v, et)]:
            best[(u, v, et)] = ts
    assert got == {(u, v, et, ts) for (u, v, et), ts in best.items()}


def case_running_totals(spark, tmp_path, rng):
    """Update-mode stateful totals (applyInPandasWithState): whatever the
    random file split, the LAST emission per user equals the plain batch
    sums — per-user state survives micro-batch boundaries exactly once."""
    batches = _gen_batches(rng)
    d = _write_stream_dir(spark, tmp_path, batches)
    name = f"fz_totals_{rng.randint(0, 10**9)}"
    totals = EV.running_user_totals(_read_stream(spark, d))
    EV.run_bounded(totals, name, str(tmp_path / "tot_ck"), output_mode="update")
    rows = spark.table(name).collect()
    spark.catalog.dropTempView(name)
    got = {}
    for r in rows:  # events_seen is monotone per user -> max = final
        if r.user_id not in got or r.events_seen > got[r.user_id][0]:
            got[r.user_id] = (r.events_seen, r.value_total)
    want = {}
    for rows_b in batches:
        for u, _, v, _et in rows_b:
            n, sv = want.get(u, (0, 0.0))
            want[u] = (n + 1, sv + v)
    want = {u: (n, round(sv, 2)) for u, (n, sv) in want.items()}
    assert got == want


_STREAM_CASES = {
    "tumbling_window": case_tumbling_window,
    "session_window": case_session_window,
    "dedup_reconcile": case_dedup_reconcile,
    "running_totals": case_running_totals,
}


@pytest.mark.parametrize("case", sorted(_STREAM_CASES))
def test_fuzz_streaming_case_matches_twin(spark, case, tmp_path):
    fn = _STREAM_CASES[case]
    for seed in range(N_SEEDS):
        rng = random.Random(7000 * seed + 23)
        sub = tmp_path / f"{case}_{seed}"
        sub.mkdir()
        try:
            fn(spark, sub, rng)
        except AssertionError as exc:
            raise AssertionError(f"FUZZ REPRO seed={seed} case={case}: {exc}") from exc
