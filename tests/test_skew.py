"""Skewed-key stress tests: the scale claims behind the salted aggregate and
the shingle-df cap, proven on deliberately skewed fixtures (one hot key
holding ~50% of all rows) with plan + runtime-distribution assertions, not
just result parity on uniform data."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from market_data_mining_project_spark.operators import dedup as D
from market_data_mining_project_spark.operators.relational import salted_agg

SALT_BUCKETS = 16


@pytest.fixture(scope="module")
def hot_month_df(spark):
    """40k rows; month '2024-01' carries 50% of them (the hot reducer key),
    the rest spread over 20 months."""
    n = 40_000
    base = spark.range(n).select(
        "id",
        F.when(F.col("id") % 2 == 0, F.lit("2024-01"))
        .otherwise(F.concat(F.lit("2025-"), F.lpad((F.col("id") % 20).cast("string"), 2, "0")))
        .alias("month"),
        (F.col("id") % 97).cast("double").alias("v"),
    )
    return base.cache()


def test_salted_agg_on_hot_key_matches_plain_groupby(spark, hot_month_df):
    salted = salted_agg(
        hot_month_df,
        keys=["month"],
        aggs={"n": ("count", "v"), "s": ("sum", "v"), "mx": ("max", "v")},
        salt_buckets=SALT_BUCKETS,
        salt_col="id",
    )
    plain = (
        hot_month_df.groupBy("month")
        .agg(F.count("v").alias("n"), F.sum("v").alias("s"), F.max("v").alias("mx"))
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_agg_plan_shuffles_on_salt_first(spark, hot_month_df):
    """The physical plan must carry TWO aggregate phases with the first
    exchange keyed on (month, __salt) — that is the mechanism that splits
    the hot key across reducers; without it the test above passes on any
    plain groupBy."""
    salted = salted_agg(
        hot_month_df,
        keys=["month"],
        aggs={"n": ("count", "v")},
        salt_buckets=SALT_BUCKETS,
        salt_col="id",
    )
    plan = salted._jdf.queryExecution().executedPlan().toString()
    flat = plan.replace("\n", " ")
    assert flat.count("HashAggregate") >= 4, "expected partial+final pairs for two phases"
    assert "__salt" in flat, "salt column missing from the physical plan"
    # the plan prints ROOT-first, so the DEEPEST (data-splitting, phase-1)
    # exchange is the LAST one printed. Its partitioning key list — the text
    # inside hashpartitioning(...) — must contain the salt; checking "after
    # the first Exchange" would match the phase-2 month-only shuffle's
    # segment, which merely CONTAINS a salt-keyed aggregate below it.
    keylists = [
        seg.split(")", 1)[0]
        for seg in flat.split("Exchange hashpartitioning(")[1:]
    ]
    assert keylists, "no hash-partitioned exchange in the plan"
    assert "__salt" in keylists[-1], (
        "deepest shuffle is not keyed on the salt — hot key lands on one reducer"
    )
    assert "__salt" not in keylists[0], (
        "final shuffle must re-key on the bare group key, not the salt"
    )


def test_salted_agg_bounds_max_reducer_group(spark, hot_month_df):
    """Task-input bound: with a deterministic salt column, the largest
    partial-aggregate group (= the max rows any single reducer task pulls
    for one key in phase 1) must be ~hot/SALT_BUCKETS, never the whole hot
    key. This is the quantity that OOMs a reducer at 100 TB."""
    total = hot_month_df.count()
    hot_rows = hot_month_df.filter(F.col("month") == "2024-01").count()
    assert hot_rows >= total * 0.45  # fixture really is skewed

    # recompute exactly the salt expression salted_agg(salt_col="id") uses
    partial_groups = (
        hot_month_df.withColumn(
            "__salt", F.pmod(F.crc32(F.col("id").cast("string")), F.lit(SALT_BUCKETS))
        )
        .groupBy("month", "__salt")
        .count()
    )
    max_group = partial_groups.agg(F.max("count")).collect()[0][0]
    n_groups = partial_groups.count()
    # crc32 spreads the hot key near-uniformly; 2x headroom on the ideal split
    assert max_group <= 2 * (hot_rows / SALT_BUCKETS), (
        f"hot-key split failed: one partial group holds {max_group} of {hot_rows} hot rows"
    )
    assert n_groups > 21, "salt produced no extra groups — no split happened"


@pytest.fixture(scope="module")
def hot_shingle_docs(spark):
    """120 docs, every one containing the same hot sentence (a shingle with
    df = 120 = 100% of docs) plus a unique tail — the inverted-index
    self-join's m² skew bomb. Two real near-dups (300/301) share their full
    text so the cap must NOT lose them."""
    hot = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, f"{hot} unique tail {i} alpha beta gamma delta {i}") for i in range(120)]
    rows.append((300, "genuine duplicate content first variant shares every token here"))
    rows.append((301, "genuine duplicate content first variant shares every token here"))
    return spark.createDataFrame(rows, "doc_id LONG, text STRING").cache()


def test_shingle_df_cap_defuses_hot_shingle_join(spark, hot_shingle_docs):
    """With the cap, shingles shared by >max_shingle_df docs never enter the
    self-join: the max join-key fan-out (rows per shuffle key, the per-task
    input of the pair join) is bounded by the cap, and the m² pair bomb
    (120·119/2 ≈ 7.1k pairs from one hot sentence) never materializes."""
    cap = 10
    # the capped inverted index is exactly what enters the self-join —
    # recompute it and assert the per-key fan-out bound that keeps task
    # input flat at scale
    sh = (
        hot_shingle_docs.select(
            F.col("doc_id").alias("doc"),
            F.explode(D.shingles(F.col("text"), 3)).alias("sh"),
        ).distinct()
    )
    uncapped_max_df = sh.groupBy("sh").count().agg(F.max("count")).collect()[0][0]
    assert uncapped_max_df >= 100, "fixture lost its hot shingle"

    hot = sh.groupBy("sh").count().filter(F.col("count") > cap).select("sh")
    capped = sh.join(hot, "sh", "left_anti")
    capped_max_df = capped.groupBy("sh").count().agg(F.max("count")).collect()[0][0]
    assert capped_max_df <= cap, "cap failed to bound the join-key fan-out"

    pairs = D.ngram_jaccard_pairs(
        hot_shingle_docs, "text", "doc_id", shingle_n=3, threshold=0.8, max_shingle_df=cap
    )
    got = {(r.doc_a, r.doc_b) for r in pairs.collect()}
    # the real duplicate survives the cap; the 7k hot-sentence pairs do not
    assert (300, 301) in got
    assert len(got) < 50, f"hot shingle still exploded into {len(got)} pairs"


def test_token_budget_plan_windows_only_the_boundary_bucket(spark):
    """The scale property of token_budget_select: the keep-whole branch is a
    pure semi-join filter (no sort), and the single Window in the plan runs
    only over the boundary-bucket subset — no group is ever sorted whole."""
    from market_data_mining_project_spark.operators import text as TXT

    rows = [(i, "en", (i % 100) / 100.0, 50) for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id LONG, lang STRING, score DOUBLE, tokens LONG")
    # budget = 10 whole buckets (10000 tokens) + 25 spare, so the walk keeps
    # ten buckets as pure filters and opens ONE boundary bucket for the rest
    kept = TXT.token_budget_select(
        df, "lang", "score", "tokens", "doc_id", budget=10_025, num_buckets=100
    )
    plan = kept._jdf.queryExecution().executedPlan().toString().replace("\n", " ")
    # exactly one Window (the boundary slice), and it sits behind the
    # boundary-bucket semi-filter join, never over the full input
    assert plan.count("Window") == 1
    assert "LeftSemi" in plan  # keep-whole branch is filter-only
    # correctness of the split: 100 buckets × 20 docs × 50 tokens → the ten
    # top buckets whole (200 docs) + one boundary doc for the 25-token tail
    ids = sorted(r.doc_id for r in kept.collect())
    assert len(ids) == 201
    assert min((i % 100) for i in ids) >= 89


def test_uncapped_hot_shingle_really_is_a_bomb(spark, hot_shingle_docs):
    """Control: without the cap the same fixture emits the quadratic pair
    set — the thing the cap exists to prevent (run at toy scale only)."""
    pairs = D.ngram_jaccard_pairs(
        hot_shingle_docs, "text", "doc_id", shingle_n=3, threshold=0.0, max_shingle_df=None
    )
    assert pairs.count() >= (120 * 119) // 2
