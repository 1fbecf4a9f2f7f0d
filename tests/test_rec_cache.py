"""Versioned recommendation cache (M14 serving surface; reference
customer_recommendation_cache, customers/models.py:71-85 + views.py:203-224):
hit serves without recompute; a rules refresh (new rules_version) or a new
alpha invalidates and recomputes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from market_data_mining_project_spark.operators.recommend import RecommendationCache


def _recs(spark, tag: int):
    return spark.createDataFrame(
        [(1, f"Brand#{tag}", 0.9, 1), (1, f"Brand#{tag + 1}", 0.5, 2), (2, f"Brand#{tag}", 0.7, 1)],
        "user LONG, item STRING, hybrid_score DOUBLE, rec_rank INT",
    )


def test_hit_invalidate_recompute_cycle(spark, tmp_path):
    cache = RecommendationCache(str(tmp_path / "recs"))
    calls = []

    def compute(tag):
        def fn():
            calls.append(tag)
            return _recs(spark, tag)

        return fn

    # cold: miss → compute + store
    out1 = cache.serve(spark, 0.6, "v1", compute(10))
    assert calls == [10]
    assert {r.item for r in out1.filter(F.col("user") == 1).collect()} == {"Brand#10", "Brand#11"}

    # warm: same (alpha, rules_version) → served from parquet, no recompute
    out2 = cache.serve(spark, 0.6, "v1", compute(99))
    assert calls == [10]
    assert sorted(map(tuple, out1.collect())) == sorted(map(tuple, out2.collect()))

    # rules refresh: version token changes → stale → recompute into a NEW
    # per-version slot
    out3 = cache.serve(spark, 0.6, "v2", compute(20))
    assert calls == [10, 20]
    assert {r.item for r in out3.filter(F.col("user") == 1).collect()} == {"Brand#20", "Brand#21"}

    # slots are per-version (published atomically, never destroyed by a
    # later version): the old blend stays addressable, but the serving path
    # keys on the CURRENT rules_version so stale versions are never
    # consulted — serving v2 again must not recompute
    old = cache.lookup(spark, 0.6, "v1")
    assert old is not None
    assert {r.item for r in old.filter(F.col("user") == 1).collect()} == {"Brand#10", "Brand#11"}
    cache.serve(spark, 0.6, "v2", compute(99))
    assert calls == [10, 20]

    # alpha is part of the key too (reference caches per-alpha blends)
    cache.serve(spark, 0.3, "v2", compute(30))
    assert calls == [10, 20, 30]


def test_lookup_on_never_populated_path_is_miss(spark, tmp_path):
    cache = RecommendationCache(str(tmp_path / "nope"))
    assert cache.lookup(spark, 0.5, "v1") is None


# --- max_neighbors: the capped k-NN serving path vs exact CF ------------------


def _ui_fixture(spark):
    """(user, item, cnt): query user 0 co-purchases with users 1..6 at
    strictly decreasing similarity (higher user id → fewer shared items)."""
    rows = []
    items = [f"i{j}" for j in range(8)]
    for it in items:
        rows.append((0, it, 2))
    for v in range(1, 7):
        for it in items[: 8 - v]:  # user v shares 8-v items with user 0
            rows.append((v, it, 1))
        rows.append((v, f"only{v}", 3))  # plus an item user 0 never bought
    return spark.createDataFrame(rows, "user LONG, item STRING, cnt LONG")


def test_cf_max_neighbors_generous_cap_equals_exact(spark):
    from market_data_mining_project_spark.operators.recommend import cosine_cf_scores

    ui = _ui_fixture(spark)
    q = spark.createDataFrame([(0,)], "user LONG")
    exact = cosine_cf_scores(None, "user", "item", q, k=10, ui=ui).collect()
    capped = cosine_cf_scores(None, "user", "item", q, k=10, max_neighbors=100, ui=ui).collect()
    assert sorted(map(tuple, exact)) == sorted(map(tuple, capped))


def test_cf_max_neighbors_prunes_neighborhood_before_scoring(spark):
    """With cap=2 only the top-2 most-similar users contribute: items owned
    solely by pruned neighbors must vanish from the candidates, and the
    surviving scores must equal a driver-side recomputation from exactly
    those two neighborhoods."""
    from market_data_mining_project_spark.operators.recommend import (
        cosine_cf_scores,
        user_similarities,
    )

    ui = _ui_fixture(spark)
    q = spark.createDataFrame([(0,)], "user LONG")
    sims = {
        r.other_user: r.sim for r in user_similarities(ui, q).collect()
    }
    assert len(sims) == 6  # all co-purchasers are candidates pre-cap
    top2 = sorted(sims, key=lambda u: (-sims[u], u))[:2]

    capped = cosine_cf_scores(None, "user", "item", q, k=10, max_neighbors=2, ui=ui).collect()
    got = {r.item: r.score for r in capped}
    # only the top-2 neighbors' exclusive items may appear
    assert set(got) == {f"only{u}" for u in top2}
    for u in top2:
        assert got[f"only{u}"] == pytest.approx(sims[u] * 3, abs=1e-6)


def test_cf_capped_plan_adds_windowed_prune(spark):
    """Plan difference on record: the capped variant carries the row_number
    window over the similarity frame; the exact default does not."""
    from market_data_mining_project_spark.operators.recommend import cosine_cf_scores

    ui = _ui_fixture(spark)
    q = spark.createDataFrame([(0,)], "user LONG")
    exact_plan = (
        cosine_cf_scores(None, "user", "item", q, k=5, ui=ui)
        ._jdf.queryExecution().executedPlan().toString()
    )
    capped_plan = (
        cosine_cf_scores(None, "user", "item", q, k=5, max_neighbors=2, ui=ui)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "__nr" in capped_plan and "__nr" not in exact_plan


def test_empty_result_is_a_hit_not_a_perpetual_miss(spark, tmp_path):
    """A legitimately-empty recommendation set must cache like any other:
    validity lives in the stamp sidecar, not in row counts — the row-count
    probe this replaced recomputed (and crashed the caller on None) every
    serve whenever compute() produced zero rows."""
    cache = RecommendationCache(str(tmp_path / "recs"))
    calls = []

    def compute():
        calls.append(1)
        return spark.createDataFrame(
            [], "user LONG, item STRING, hybrid_score DOUBLE, rec_rank INT"
        )

    out1 = cache.serve(spark, 0.5, "v1", compute)
    assert out1 is not None and out1.count() == 0
    assert calls == [1]
    out2 = cache.serve(spark, 0.5, "v1", compute)
    assert out2 is not None and out2.count() == 0
    assert calls == [1], "empty cached result must not trigger recompute"
    # a version bump still invalidates
    cache.serve(spark, 0.5, "v2", compute)
    assert calls == [1, 1]
