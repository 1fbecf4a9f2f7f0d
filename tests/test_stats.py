"""Tail-function accuracy against published table values, and the
distributed test statistics against hand-computable micro-cases
(mirrors the reference's independent-recount validation style)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from market_data_mining_project_spark.functions import stats as ST


@pytest.mark.parametrize(
    ("stat", "dof", "expected"),
    [(3.841, 1, 0.05), (5.991, 2, 0.05), (9.488, 4, 0.05), (6.635, 1, 0.01)],
)
def test_chi2_sf_table_values(stat, dof, expected):
    assert math.isclose(ST.chi2_sf(stat, dof), expected, rel_tol=5e-4)


@pytest.mark.parametrize(
    ("t", "dof", "expected"),
    [(2.228, 10, 0.025), (1.812, 10, 0.05), (2.576, 1e9, 0.005)],
)
def test_t_sf_table_values(t, dof, expected):
    assert math.isclose(ST.t_sf(t, dof), expected, rel_tol=1e-3)


def test_norm_sf():
    assert math.isclose(ST.norm_sf(1.959964), 0.025, rel_tol=1e-4)
    assert math.isclose(ST.norm_sf(0.0), 0.5, rel_tol=1e-12)


def test_ks_sf_bounds():
    assert ST.ks_sf(0.0, 100, 100) == 1.0
    assert ST.ks_sf(0.9, 100, 100) < 1e-6
    assert 0 < ST.ks_sf(0.15, 200, 200) < 0.5


def test_chi2_test_micro(spark):
    # 2x2 with known chi2 = N(ad-bc)^2 / (r1 r2 c1 c2) = 4.0
    rows = [("a", "x")] * 15 + [("a", "y")] * 5 + [("b", "x")] * 10 + [("b", "y")] * 10
    df = spark.createDataFrame(rows, ["g", "h"])
    from market_data_mining_project_spark.operators.diff import chi2_test

    res = chi2_test(df, "g", "h")
    expected = 40 * (15 * 10 - 5 * 10) ** 2 / (20 * 20 * 25 * 15)
    assert math.isclose(res["statistic"], expected, rel_tol=1e-9)
    assert res["dof"] == 1
    assert math.isclose(res["cramers_v"], math.sqrt(expected / 40), rel_tol=1e-9)
    assert 0 < res["p_value"] < 1


def test_welch_t_micro(spark):
    a = [1.0, 2.0, 3.0, 4.0, 5.0]
    b = [2.0, 4.0, 6.0, 8.0, 10.0]
    df = spark.createDataFrame(
        [("a", v) for v in a] + [("b", v) for v in b], ["g", "v"]
    )
    from market_data_mining_project_spark.operators.diff import welch_t_test

    res = welch_t_test(df, "g", "v", "a", "b")
    # hand computation: mean diff -3, se^2 = 2.5/5 + 10/5 = 2.5
    assert math.isclose(res["statistic"], -3 / math.sqrt(2.5), rel_tol=1e-9)
    assert 0 < res["p_value"] < 1


def test_mann_whitney_micro(spark):
    # disjoint samples → U = 0, |rank_biserial| = 1
    df = spark.createDataFrame(
        [("a", float(v)) for v in (1, 2, 3)] + [("b", float(v)) for v in (10, 11, 12)],
        ["g", "v"],
    )
    from market_data_mining_project_spark.operators.diff import mann_whitney_u

    res = mann_whitney_u(df, "g", "v", "a", "b")
    assert res["statistic"] == 0.0
    assert abs(res["rank_biserial"]) == 1.0
    assert res["p_value"] < 0.1


def test_mann_whitney_tie_correction(spark):
    """Tied data: sigma must carry the scipy tie correction
    n1·n2/12 · Σ(t³−t)/(n(n−1)) subtracted from the variance."""
    df = spark.createDataFrame(
        [("a", float(v)) for v in (1, 2, 2, 3)] + [("b", float(v)) for v in (2, 3, 3, 4)],
        ["g", "v"],
    )
    from market_data_mining_project_spark.operators.diff import mann_whitney_u

    res = mann_whitney_u(df, "g", "v", "a", "b")
    # hand computation: ranks a = 1+3+3+6 → U1 = 3, U = 3, mu = 8,
    # tie_term = (3³−3)+(3³−3) = 48, var = 12 − 16·48/(12·8·7) = 10.857142857...
    assert res["statistic"] == 3.0
    expected_sigma = math.sqrt(12.0 - 16.0 * 48.0 / (12.0 * 8.0 * 7.0))
    expected_p = 2.0 * ST.norm_sf(5.0 / expected_sigma)
    assert math.isclose(res["p_value"], expected_p, rel_tol=1e-9)


def test_stat_test_group_guards(spark):
    """Absent or singleton groups raise clear errors instead of
    TypeError/KeyError/ZeroDivision."""
    from market_data_mining_project_spark.operators.diff import mann_whitney_u, welch_t_test

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 3.0)], ["g", "v"]
    )
    with pytest.raises(ValueError, match="absent"):
        welch_t_test(df, "g", "v", "a", "zzz")
    with pytest.raises(ValueError, match="n >= 2"):
        welch_t_test(df, "g", "v", "a", "b")  # b is a singleton
    with pytest.raises(ValueError, match="absent"):
        mann_whitney_u(df, "g", "v", "zzz", "b")


def test_ks_micro(spark):
    # identical samples → D = 0; disjoint → D = 1
    same = spark.createDataFrame(
        [("a", float(v)) for v in range(10)] + [("b", float(v)) for v in range(10)],
        ["g", "v"],
    )
    from market_data_mining_project_spark.operators.diff import ks_test

    assert ks_test(same, "g", "v", "a", "b")["statistic"] == 0.0
    disjoint = spark.createDataFrame(
        [("a", float(v)) for v in range(10)] + [("b", float(v + 100)) for v in range(10)],
        ["g", "v"],
    )
    assert ks_test(disjoint, "g", "v", "a", "b")["statistic"] == 1.0


def test_seeded_noise_deterministic(spark):
    """F12: the reference uses salt-randomized Python hash() for noise
    (ml_models.py:881-883) — ours must reproduce across sessions/executors."""
    from market_data_mining_project_spark.functions.expressions import seeded_noise

    df = spark.createDataFrame([(i, f"m{i % 3}") for i in range(100)], ["pid", "model"])
    a = df.select("pid", seeded_noise(F.col("model"), F.col("pid")).alias("n")).collect()
    b = df.select("pid", seeded_noise(F.col("model"), F.col("pid")).alias("n")).collect()
    assert [r.n for r in a] == [r.n for r in b]
    assert all(-0.03 <= r.n <= 0.03 for r in a)
    assert len({round(r.n, 9) for r in a}) > 10  # actually varies


def test_ks_test_absent_group_raises(spark):
    from market_data_mining_project_spark.operators import diff as DIFF

    df = spark.createDataFrame([("a", 1.0), ("a", 2.0), ("b", 3.0)], "g string, v double")
    with pytest.raises(ValueError, match="absent"):
        DIFF.ks_test(df, "g", "v", "a", "zzz")


def test_welch_constant_groups_follow_scipy_convention(spark):
    """Two zero-variance groups: nan when the means agree, signed infinity
    when they differ — never a ZeroDivisionError."""
    import math

    from market_data_mining_project_spark.operators import diff as DIFF

    same = spark.createDataFrame(
        [("a", 5.0), ("a", 5.0), ("b", 5.0), ("b", 5.0)], "g string, v double"
    )
    r = DIFF.welch_t_test(same, "g", "v", "a", "b")
    assert math.isnan(r["statistic"]) and math.isnan(r["p_value"])
    diff = spark.createDataFrame(
        [("a", 9.0), ("a", 9.0), ("b", 5.0), ("b", 5.0)], "g string, v double"
    )
    r2 = DIFF.welch_t_test(diff, "g", "v", "a", "b")
    assert math.isinf(r2["statistic"]) and r2["statistic"] > 0
    assert r2["p_value"] == 0.0


def test_chi2_empty_input_raises(spark):
    from market_data_mining_project_spark.operators import diff as DIFF

    df = spark.createDataFrame([], "r string, c string")
    with pytest.raises(ValueError, match="no rows"):
        DIFF.chi2_test(df, "r", "c")


def test_search_numeric_needle_skips_nonnumeric_columns(spark):
    import datetime

    from market_data_mining_project_spark.operators import relational as R

    df = spark.createDataFrame(
        [("seven", 7, datetime.date(2020, 1, 7)), ("other", 9, datetime.date(2020, 1, 9))],
        "name string, n int, d date",
    )
    got = R.search(df, "7", ["name", "n", "d"]).collect()
    # matches the numeric column by equality and skips the date column
    # instead of failing analysis
    assert {r.name for r in got} == {"seven"}


def test_harness_row_alignment_is_ulp_insensitive():
    """Near-tied float sort keys (Spark's partial-merge order vs DuckDB's
    sequential sum) and int-vs-double cells must not misalign rows — a
    correct query previously FAILed when str-sort ordered the two sides
    differently."""
    from tests.oracle_harness import compare

    class FakeDF:
        def __init__(self, cols, rows):
            self.columns = cols
            self._rows = rows

        def collect(self):
            return self._rows

    class FakeRel:
        def __init__(self, cols, rows):
            self.columns = cols
            self._rows = rows

        def fetchall(self):
            return self._rows

    # scores tie at 9 significant digits but differ in the last ulp, and
    # the engines emit them in OPPOSITE orders; ids must still pair up
    s = FakeDF(["score", "id"], [(0.30000000000000002, 1), (0.3, 2)])
    d = FakeRel(["score", "id"], [(0.30000000000000004, 2), (0.3, 1)])
    assert compare("t", s, d) == []
    # int on one side, double on the other: same sort key
    s2 = FakeDF(["n", "id"], [(5, 1)])
    d2 = FakeRel(["n", "id"], [(5.0, 1)])
    assert compare("t2", s2, d2) == []
    # a REAL value difference still fails
    s3 = FakeDF(["n", "id"], [(5, 1)])
    d3 = FakeRel(["n", "id"], [(6, 1)])
    assert compare("t3", s3, d3) != []


def test_harness_rejects_unknown_query_names(spark, sf_dir):
    from tests.oracle_harness import run_all

    with pytest.raises(SystemExit, match="unknown query names"):
        run_all(spark, sf_dir, only=["no_such_query_xyz"])


def test_bench_fresh_warm_degrades_instead_of_discarding(monkeypatch):
    """A failed/timed-out fresh child must degrade the bench artifact to
    cold+warm, never throw away the two passes already measured."""
    import bench

    def boom(sf_dir, cache_root):
        raise RuntimeError("child crashed")

    monkeypatch.setattr(bench, "_fresh_warm_pass", boom)
    assert bench._fresh_warm_or_none("/x", "/y") is None


def test_chi2_and_mwu_exclude_null_labels_and_values(spark):
    """NULL labels/values must be excluded from the WHOLE computation, not
    just the parts where Spark skips them implicitly: chi2 previously
    summed NULL-label cells into the statistic while countDistinct shrank
    dof; MWU counted NULL values in the tie correction that the rank join
    had already dropped — both deflated p-values."""
    from market_data_mining_project_spark.operators import diff as D

    base = [("a", "x"), ("a", "y"), ("b", "x"), ("b", "y"), ("a", "x"), ("b", "y")]
    df = spark.createDataFrame(base + [("a", None), (None, "x")], "r string, c string")
    clean = spark.createDataFrame(base, "r string, c string")
    got = D.chi2_test(df, "r", "c")
    want = D.chi2_test(clean, "r", "c")
    assert got == want

    vals = [("g1", 1.0), ("g1", 2.0), ("g1", 2.0), ("g2", 2.0), ("g2", 3.0), ("g2", 4.0)]
    vdf = spark.createDataFrame(vals + [("g1", None), ("g1", None)], "g string, v double")
    vclean = spark.createDataFrame(vals, "g string, v double")
    got_u = D.mann_whitney_u(vdf, "g", "v", "g1", "g2")
    want_u = D.mann_whitney_u(vclean, "g", "v", "g1", "g2")
    assert got_u == want_u


def test_search_skips_interval_columns(spark):
    """'interval day to second' startswith 'int' — the numeric-equality
    branch must not capture interval dtypes."""
    from market_data_mining_project_spark.operators.relational import search

    df = spark.createDataFrame([(1, "a5b")], "id long, name string").withColumn(
        "dur", F.expr("INTERVAL 5 DAYS")
    )
    got = search(df, "5", ["dur", "name"]).collect()
    assert len(got) == 1  # matched via the string column only, no crash


def test_salted_agg_fallback_salt_is_deterministic(spark):
    """The no-salt-col fallback hashes ROW CONTENT (retry-stable), never a
    nondeterministic id: same input -> same salt assignment -> results
    equal the unsalted groupBy even with NULL cells."""
    from market_data_mining_project_spark.operators.relational import salted_agg

    df = spark.createDataFrame(
        [("k", 1.0), ("k", None), ("k", 2.0), ("j", 4.0)] * 10, "k string, x double"
    )
    got = {
        (r.k): (r.s, r.n)
        for r in salted_agg(df, ["k"], {"s": ("sum", "x"), "n": ("count", "x")}).collect()
    }
    want = {
        (r.k): (r.s, r.n)
        for r in df.groupBy("k").agg(F.sum("x").alias("s"), F.count("x").alias("n")).collect()
    }
    assert got == want


def test_rank_walk_distinct_value_cap_raises_loudly(spark, monkeypatch):
    """r8: the single-task rank/ECDF walk is safe only over a BOUNDED
    distinct-value histogram. Past MAX_RANK_DISTINCT_VALUES the plan must
    raise at execution (in-plan guard, no extra validation pass), never
    silently degrade to a global row sort."""
    from market_data_mining_project_spark.operators import diff as DIFF

    rows = [("a" if i % 2 else "b", float(i)) for i in range(20)]
    df = spark.createDataFrame(rows, "g string, v double")

    monkeypatch.setattr(DIFF, "MAX_RANK_DISTINCT_VALUES", 10)
    with pytest.raises(Exception, match="MAX_RANK_DISTINCT_VALUES"):
        DIFF.rank_sums(df, "g", "v").collect()
    with pytest.raises(Exception, match="MAX_RANK_DISTINCT_VALUES"):
        DIFF.ks_statistic(df, "g", "v", "a", "b").collect()

    # at/below the cap both still produce their exact outputs
    monkeypatch.setattr(DIFF, "MAX_RANK_DISTINCT_VALUES", 20)
    got = {r.g: (r.rank_sum, r.n) for r in DIFF.rank_sums(df, "g", "v").collect()}
    # values 0..19 distinct: rank of v=i is i+1; group a holds odd i
    assert got["a"] == (sum(i + 1 for i in range(20) if i % 2), 10.0)
    ks = DIFF.ks_statistic(df, "g", "v", "a", "b").collect()[0]
    assert abs(ks.ks_d - 0.1) < 1e-12  # alternating values: ECDFs differ by 1/10
