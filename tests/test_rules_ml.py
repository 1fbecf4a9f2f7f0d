"""Cross-implementation agreement checks (SURVEY.md §5: the reference's three
rule miners implicitly agree — our tests make that explicit) plus MLlib
pipeline quality gates."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from market_data_mining_project_spark.operators import recommend as REC
from market_data_mining_project_spark.operators import rules as RULES
from market_data_mining_project_spark.sources.tables import load_table


def _brand_fact(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").withColumnRenamed("l_partkey", "p_partkey")
    part = load_table(spark, sf_dir, "part")
    return li.join(F.broadcast(part.select("p_partkey", "p_brand")), "p_partkey")


def test_fpgrowth_agrees_with_pairwise(spark, sf_dir):
    """FPGrowth 1⇒1 rules must carry identical support/confidence/lift to the
    self-join pairwise miner at equal minSupport (SURVEY §7.4.6)."""
    fact = _brand_fact(spark, sf_dir)
    pairwise = {
        (r.antecedent, r.consequent): r
        for r in RULES.pairwise_rules(
            fact, basket="l_orderkey", item="p_brand", min_support=0.02
        ).collect()
    }
    fp = [
        r
        for r in RULES.fpgrowth_rules(
            fact, basket="l_orderkey", item="p_brand", min_support=0.02, min_confidence=0.0
        ).collect()
        if len(r.antecedent) == 1 and len(r.consequent) == 1
    ]
    assert fp, "FPGrowth returned no 1=>1 rules"
    checked = 0
    for r in fp:
        key = (r.antecedent[0], r.consequent[0])
        if key not in pairwise:
            continue  # pairwise also enforces min pair support; FP does not per-pair
        p = pairwise[key]
        assert math.isclose(r.support, p.support, abs_tol=1e-6), key
        assert math.isclose(r.confidence, p.confidence, abs_tol=1e-6), key
        assert math.isclose(r.lift, p.lift, abs_tol=1e-6), key
        checked += 1
    assert checked >= 5, f"only {checked} overlapping rules compared"


def test_rule_metric_identities(spark, sf_dir):
    """Recount one rule's support/confidence/lift independently, the way the
    reference's validate_results.py:104-139 does."""
    fact = _brand_fact(spark, sf_dir)
    rules = RULES.pairwise_rules(fact, basket="l_orderkey", item="p_brand", min_support=0.02)
    top = rules.orderBy(F.col("lift").desc(), "antecedent", "consequent").first()
    ib = fact.select("l_orderkey", "p_brand").distinct()
    total = ib.select("l_orderkey").distinct().count()
    n_a = ib.filter(F.col("p_brand") == top.antecedent).count()
    n_b = ib.filter(F.col("p_brand") == top.consequent).count()
    n_ab = (
        ib.filter(F.col("p_brand") == top.antecedent)
        .select("l_orderkey")
        .join(ib.filter(F.col("p_brand") == top.consequent).select("l_orderkey"), "l_orderkey")
        .count()
    )
    assert top.pair_baskets == n_ab
    assert math.isclose(top.support, round(n_ab / total, 6), abs_tol=1e-9)
    assert math.isclose(top.confidence, round(n_ab / n_a, 6), abs_tol=1e-9)
    assert math.isclose(top.lift, round((n_ab / n_a) / (n_b / total), 6), abs_tol=2e-6)


def test_als_runs_and_ranks(spark, sf_dir):
    fact = _brand_fact(spark, sf_dir).join(
        load_table(spark, sf_dir, "orders").select(
            F.col("o_orderkey").alias("l_orderkey"), "o_custkey"
        ),
        "l_orderkey",
    )
    recs = REC.als_recommendations(fact, "o_custkey", "p_brand", k=3, rank=4, seed=42)
    rows = recs.collect()
    assert rows
    per_user: dict = {}
    for r in rows:
        per_user.setdefault(r.user, []).append(r.rec_rank)
    for user, ranks in per_user.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), user


def test_category_rules_equals_pairwise_over_shared_frame(spark, sf_dir):
    """M4's convenience wrapper (dim join inside) must produce exactly the
    rules the catalog's shared-frame binding produces — the materialized
    distinct (basket, brand) path and the live dim-join path are the same
    logical plan."""
    from market_data_mining_project_spark.plans.analytics_domain import _basket_brands

    li = load_table(spark, sf_dir, "lineitem").withColumnRenamed("l_partkey", "p_partkey")
    part = load_table(spark, sf_dir, "part")
    via_wrapper = {
        (r.antecedent, r.consequent): (r.support, r.confidence, r.lift)
        for r in RULES.category_rules(
            li, part, key="p_partkey", category="p_brand", basket="l_orderkey",
            min_support=0.02, min_confidence=0.05, item_cap=None,
        ).collect()
    }
    via_shared = {
        (r.antecedent, r.consequent): (r.support, r.confidence, r.lift)
        for r in RULES.pairwise_rules(
            None, basket="l_orderkey", item="p_brand",
            min_support=0.02, min_confidence=0.05, item_cap=None,
            ib=_basket_brands(spark, sf_dir),
        ).collect()
    }
    assert via_wrapper == via_shared and via_wrapper


def test_churn_model_quality(spark, sf_dir):
    """M8 gate: GBT churn classifier beats chance on held-out data
    (the reference reports accuracy ~0.7-0.9; tiny sf gives noisier AUC)."""
    from market_data_mining_project_spark.ml.pipelines import train_classifier
    from market_data_mining_project_spark.plans.analytics_domain import q_churn_features

    feats = q_churn_features(spark, sf_dir)
    cols = [
        "recency", "frequency", "monetary", "avg_basket_value",
        "avg_purchase_gap", "product_variety", "active_days",
    ]
    trained = train_classifier(feats, cols, "churned", kind="gradient_boost")
    assert trained.metrics["auc"] > 0.55, trained.metrics
    assert trained.metrics["accuracy"] > 0.5, trained.metrics


def test_churn_feature_importances_gates(spark, sf_dir, tmp_path, monkeypatch):
    """M8 explainability gate: the surfaced importances must be a valid
    distribution over EXACTLY the assembler's feature names (sum 1, all
    ≥ 0, rank ordered by importance desc), and must come from the same
    cached artifact churn_model_scores trains (no refit on a warm cache —
    proven by a sentinel check on the artifact directory's mtime)."""
    import os

    from market_data_mining_project_spark.plans.analytics_domain import (
        CHURN_FEATURE_COLS,
        q_churn_feature_importances,
    )

    monkeypatch.setenv("SPARK_GRAFT_MODEL_DIR", str(tmp_path / "churn_imp"))
    rows = q_churn_feature_importances(spark, sf_dir).collect()
    assert [r.feature for r in rows] != [] and len(rows) == len(CHURN_FEATURE_COLS)
    assert {r.feature for r in rows} == set(CHURN_FEATURE_COLS)
    assert all(r.importance >= 0.0 for r in rows)
    assert abs(sum(r.importance for r in rows) - 1.0) < 1e-3
    got = sorted(rows, key=lambda r: r.importance_rank)
    assert [r.importance_rank for r in got] == list(range(1, len(rows) + 1))
    assert all(a.importance >= b.importance for a, b in zip(got, got[1:]))

    # warm-cache path: artifact untouched, identical output
    from market_data_mining_project_spark.ml.persistence import model_cache_root

    root = model_cache_root()
    artifacts = [os.path.join(root, d) for d in os.listdir(root) if d.startswith("churn_gbt-")]
    assert artifacts, "first call must have persisted the shared churn model"
    before = os.stat(artifacts[0]).st_mtime_ns
    again = q_churn_feature_importances(spark, sf_dir).collect()
    assert os.stat(artifacts[0]).st_mtime_ns == before, "warm cache must not refit"
    assert sorted(map(tuple, again)) == sorted(map(tuple, rows))


def test_churn_threshold_sweep_matches_driver_recount(spark, sf_dir):
    """Threshold-sweep gate (reference optimize_churn_model.py): the single
    scan's per-threshold confusion counts, recall and accuracy must equal a
    driver-side recomputation over the same (score, label) pairs, and the
    is_best row must be the max-recall threshold (ties → lowest threshold,
    pandas idxmax semantics). Runs on a synthetic scored frame so the gate is
    exact and independent of GBT seed stability."""
    from market_data_mining_project_spark.operators.churn import (
        DEFAULT_SWEEP_THRESHOLDS,
        churn_threshold_sweep,
    )

    rng_rows = [
        # (score, label): crafted so recall strictly drops across thresholds
        (float(f"0.{(7 * i + 3) % 100:02d}"), 1 if i % 3 == 0 else 0)
        for i in range(200)
    ]
    scored = spark.createDataFrame(rng_rows, "churn_probability DOUBLE, churned INT")
    out = {r.threshold: r for r in churn_threshold_sweep(scored).collect()}
    assert set(out) == set(DEFAULT_SWEEP_THRESHOLDS)

    best_by_recall = None
    for t in DEFAULT_SWEEP_THRESHOLDS:
        tp = sum(1 for s, y in rng_rows if s >= t and y == 1)
        fp = sum(1 for s, y in rng_rows if s >= t and y == 0)
        fn = sum(1 for s, y in rng_rows if s < t and y == 1)
        tn = sum(1 for s, y in rng_rows if s < t and y == 0)
        r = out[t]
        assert (r.tp, r.fp, r.fn, r.tn) == (tp, fp, fn, tn), t
        assert r.churn_recall == pytest.approx(tp / (tp + fn), abs=1e-6), t
        assert r.accuracy == pytest.approx((tp + tn) / len(rng_rows), abs=1e-6), t
        if best_by_recall is None or r.churn_recall > best_by_recall[1]:
            best_by_recall = (t, r.churn_recall)
    assert [t for t, r in out.items() if r.is_best] == [best_by_recall[0]]

    # end-to-end shape on the real scored frame: one row per threshold,
    # exactly one winner
    from market_data_mining_project_spark.plans.analytics_domain import (
        q_churn_threshold_sweep,
    )

    sweep = q_churn_threshold_sweep(spark, sf_dir).collect()
    assert len(sweep) == len(DEFAULT_SWEEP_THRESHOLDS)
    assert sum(r.is_best for r in sweep) == 1
    n = sum(r.tp + r.fp + r.fn + r.tn for r in sweep) / len(sweep)
    assert all(r.tp + r.fp + r.fn + r.tn == n for r in sweep)


def test_cf_scores_exclude_purchased(spark, sf_dir):
    fact = _brand_fact(spark, sf_dir).join(
        load_table(spark, sf_dir, "orders").select(
            F.col("o_orderkey").alias("l_orderkey"), "o_custkey"
        ),
        "l_orderkey",
    )
    qu = fact.select(F.col("o_custkey").alias("user")).filter(F.col("user") % 100 == 0).distinct()
    recs = REC.cosine_cf_scores(fact, "o_custkey", "p_brand", qu, k=5)
    assert qu.count() > 0, "fixture must contain query users"
    assert recs.count() > 0, "CF must produce recommendations for the fixture"
    purchased = REC.user_item_counts(fact, "o_custkey", "p_brand").select("user", "item")
    overlap = recs.join(purchased, ["user", "item"]).count()
    assert overlap == 0


def test_quality_classifier_gates(spark, sf_dir):
    """The model-based quality filter must actually learn the heuristic it
    distills: held-out AUC high, probabilities valid, every doc scored."""
    from market_data_mining_project_spark.ml.pipelines import (
        score_with_probability,
        train_quality_classifier,
    )
    from market_data_mining_project_spark.operators import text as TXT
    from market_data_mining_project_spark.plans.llm_pipeline import q_quality_classifier

    out = q_quality_classifier(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    assert len(out) == docs.count()
    assert all(0.0 <= r.quality_prob <= 1.0 for r in out)
    assert all(r.predicted in (0, 1) and r.heuristic_label in (0, 1) for r in out)
    # both classes must exist (the 0.75-quantile label is non-degenerate)
    assert {r.heuristic_label for r in out} == {0, 1}

    # held-out AUC gate on the underlying trainer
    prof = TXT.text_profile(docs, "text").withColumn(
        "__toks", TXT.tokens(F.col("text"))
    )
    thresh = prof.stat.approxQuantile("quality", [0.75], 0.0)[0]
    labeled = prof.withColumn("label", (F.col("quality") >= thresh).cast("int"))
    trained = train_quality_classifier(labeled, "label")
    assert trained.metrics["auc"] >= 0.85, trained.metrics

    # full-corpus agreement with the heuristic label should be strong
    agree = sum(1 for r in out if r.predicted == r.heuristic_label) / len(out)
    assert agree >= 0.8, f"classifier agrees with heuristic on only {agree:.0%}"


def test_sequential_patterns_containment_recount(spark, sf_dir):
    """PrefixSpan frequencies recounted EXACTLY: a pattern's freq must
    equal the number of customers whose day-ordered basket sequence
    contains it as an ordered subsequence with itemset-subset step
    matching (gaps allowed) — the Pei et al. support definition."""
    from market_data_mining_project_spark.operators import rules as RULES
    from market_data_mining_project_spark.plans.analytics_domain import (
        _brand_fact,
        q_sequential_patterns,
    )

    fact = _brand_fact(spark, sf_dir)
    seqs = {
        r[0]: [set(step) for step in r[1]]
        for r in RULES.sequence_itemsets(
            fact, "o_custkey", "day", "p_brand"
        ).collect()
    }
    pats = q_sequential_patterns(spark, sf_dir).collect()
    assert pats, "fixture should yield frequent sequential patterns"

    def contains(seq, pattern_steps):
        i = 0
        for step in seq:
            if i < len(pattern_steps) and pattern_steps[i] <= step:
                i += 1
        return i == len(pattern_steps)

    # exact recount for a deterministic slice: top-5 by (freq, pattern)
    # plus the 5 rarest — covers both ends of the support range
    check = pats[:5] + pats[-5:]
    for row in check:
        steps = [set(s.split("|")) for s in row.pattern.split(">")]
        want = sum(1 for s in seqs.values() if contains(s, steps))
        assert want == row.freq, (row.pattern, want, row.freq)
    # support floor: nothing below ceil(0.3 * n_customers)
    import math

    floor = math.ceil(0.3 * len(seqs))
    assert all(r.freq >= floor for r in pats)


def test_binary_metrics_reports_eval_size(spark):
    """accuracy==0.0 is ambiguous (all-wrong vs no rows) — n_eval is the
    degenerate-split signal consumers gate on (q_horizon_predictions raises
    on n_eval<=0 instead of multiplying a 0.0 accuracy into every brand's
    confidence)."""
    from market_data_mining_project_spark.ml.pipelines import binary_metrics

    empty = spark.createDataFrame([], "label double, prediction double, rawPrediction string")
    m = binary_metrics(empty)
    assert m["n_eval"] == 0.0 and m["accuracy"] == 0.0

    some = spark.createDataFrame(
        [(1.0, 1.0, "x"), (0.0, 1.0, "x"), (0.0, 0.0, "x")],
        "label double, prediction double, rawPrediction string",
    )
    m2 = binary_metrics(some)
    assert m2["n_eval"] == 3.0
    assert abs(m2["accuracy"] - 2 / 3) < 1e-9


def test_churn_scores_band_consistent_with_stored_probability(spark, sf_dir):
    """The persisted (churn_probability, risk_band) pair must be internally
    consistent: re-banding the STORED (rounded) probability reproduces the
    stored band (banding the unrounded score could disagree at band
    boundaries after rounding)."""
    from market_data_mining_project_spark.functions.expressions import churn_risk_label
    from market_data_mining_project_spark.plans.analytics_domain import q_churn_model_scores

    scores = q_churn_model_scores(spark, sf_dir)
    mismatched = scores.filter(
        F.col("risk_band") != churn_risk_label(F.col("churn_probability"))
    ).count()
    assert mismatched == 0


def test_split_day_raises_on_empty_fact(spark):
    from market_data_mining_project_spark.operators import churn as CH

    empty = spark.createDataFrame([], "o_custkey long, day int")
    with pytest.raises(ValueError, match="at least one fact row"):
        CH.split_day(empty, "day", 90)


def test_department_mix_excludes_null_categories(spark):
    """A NULL category cannot be a map key (NULL_MAP_KEY at runtime) and is
    not a department — the mix excludes it like category_rollup does."""
    from market_data_mining_project_spark.operators.basket import department_mix

    fact = spark.createDataFrame([(1, 10), (1, 11), (1, 12)], "b long, k long")
    dim = spark.createDataFrame([(10, "d1"), (11, None), (12, "d2")], "k long, cat string")
    rows = department_mix(fact, dim, key="k", category="cat", basket="b").collect()
    assert len(rows) == 1
    assert rows[0].department_mix == {"d1": 1, "d2": 1}
    assert rows[0].unique_departments == 2


def test_pairwise_min_count_is_mllib_ceil(spark):
    """min_count = ceil(total * min_support) like MLlib FPGrowth: a pair in
    exactly floor(total*s) baskets sits BELOW the support threshold and must
    be dropped (int() previously floored and admitted it)."""
    from market_data_mining_project_spark.operators import rules as R

    # 10 baskets; items a,b co-occur in 2 of them -> support 0.2
    rows = [(i, it) for i in range(1, 3) for it in ("a", "b")]
    rows += [(i, "c") for i in range(3, 11)]
    ib = spark.createDataFrame(rows, "b long, item string")
    # threshold 0.25 -> ceil(2.5) = 3 -> the 2-basket pair is OUT
    out = R.pairwise_rules(None, basket="b", item="item", ib=ib, min_support=0.25, min_confidence=0.0)
    assert out.count() == 0
    # threshold 0.2 -> ceil(2.0) = 2 -> the pair is IN (both directions)
    out2 = R.pairwise_rules(None, basket="b", item="item", ib=ib, min_support=0.2, min_confidence=0.0)
    assert out2.count() == 2


def test_quantile_edge_scores_null_metric_scores_null(spark):
    """An all-NULL-sales customer must not land in the TOP bucket on the
    approx path: NULL metric -> NULL score, agreeing with the exact path."""
    from market_data_mining_project_spark.operators import rfm as RFM

    df = spark.createDataFrame(
        [(1, 10, 5, 100.0), (2, 20, 6, 200.0), (3, 30, 7, None)],
        "cust long, recency int, frequency int, monetary double",
    )
    for exact in (False, True):
        got = {
            r.cust: r.monetary_score
            for r in RFM.quantile_edge_scores(df, exact=exact).collect()
        }
        assert got[3] is None, f"exact={exact}: {got}"
        assert got[1] is not None and got[2] is not None
