"""IVF ANN recall gate + M9 horizon-label model-grid training."""

from __future__ import annotations

from pyspark.sql import functions as F

from market_data_mining_project_spark.operators import similarity as SIM
from market_data_mining_project_spark.sources.tables import load_table


def test_ivf_topk_recall_vs_exact(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in SIM.cosine_topk(emb, queries, "embedding", "vec_id", k=5).collect()
    }
    # nprobe=8 of 16 cells scans ~half the corpus — recall should be high
    approx = {
        (r.query_id, r.neighbor_id)
        for r in SIM.ivf_topk(
            emb, queries, "embedding", "vec_id", k=5, n_cells=16, nprobe=8, seed=42
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"IVF recall {recall:.2f}"


def test_ivf_probes_scan_fraction(spark, sf_dir):
    """nprobe/n_cells bounds the scanned fraction: candidate count per query
    must be well below the corpus size."""
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    queries = emb.filter(F.col("vec_id") < 3)
    assigned, model = SIM.ivf_assign(emb, "embedding", "vec_id", n_cells=16, seed=42)
    sizes = assigned.groupBy("cell").count().collect()
    assert len(sizes) > 8  # KMeans actually split the space
    biggest4 = sum(sorted((r["count"] for r in sizes), reverse=True)[:4])
    assert biggest4 < n  # probing 4 cells cannot touch the whole corpus


def test_horizon_grid_trains(spark, sf_dir):
    """M9: the 4-horizon labels train a real classifier grid (2 fast kinds
    here; the full 4-kind grid is the same call with all kinds)."""
    from market_data_mining_project_spark.ml.pipelines import train_model_grid
    from market_data_mining_project_spark.plans.analytics_domain import q_horizon_labels

    labels = q_horizon_labels(spark, sf_dir)
    # features available at prediction time: the purchase-day coordinates
    feats = labels.withColumn("day_of_year", F.col("day") % 365)
    grid = train_model_grid(
        feats,
        feature_cols=["day", "day_of_year"],
        label_col="buy_90d",
        kinds=("random_forest", "gradient_boost"),
    )
    for kind, trained in grid.items():
        assert 0.0 <= trained.metrics["accuracy"] <= 1.0, kind
        assert trained.metrics["f1"] > 0.3, (kind, trained.metrics)


def test_horizon_labels_monotone(spark, sf_dir):
    """Longer horizons can only add positives: buy_30d ≤ buy_90d ≤ ... per row."""
    from market_data_mining_project_spark.plans.analytics_domain import q_horizon_labels

    labels = q_horizon_labels(spark, sf_dir)
    bad = labels.filter(
        (F.col("buy_30d") > F.col("buy_90d"))
        | (F.col("buy_90d") > F.col("buy_180d"))
        | (F.col("buy_180d") > F.col("buy_365d"))
    ).count()
    assert bad == 0
