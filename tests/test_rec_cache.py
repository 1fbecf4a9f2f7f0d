"""Versioned recommendation cache (M14 serving surface; reference
customer_recommendation_cache, customers/models.py:71-85 + views.py:203-224):
hit serves without recompute; a rules refresh (new rules_version) or a new
alpha invalidates and recomputes."""

from __future__ import annotations

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

    # rules refresh: version token changes → stale → recompute + overwrite
    out3 = cache.serve(spark, 0.6, "v2", compute(20))
    assert calls == [10, 20]
    assert {r.item for r in out3.filter(F.col("user") == 1).collect()} == {"Brand#20", "Brand#21"}

    # the old version is gone (single-slot overwrite, reference semantics)
    assert cache.lookup(spark, 0.6, "v1") is None

    # alpha is part of the key too (reference caches per-alpha blends)
    cache.serve(spark, 0.3, "v2", compute(30))
    assert calls == [10, 20, 30]


def test_lookup_on_never_populated_path_is_miss(spark, tmp_path):
    cache = RecommendationCache(str(tmp_path / "nope"))
    assert cache.lookup(spark, 0.5, "v1") is None
