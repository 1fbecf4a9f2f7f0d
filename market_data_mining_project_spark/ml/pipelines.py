"""MLlib training pipelines (SURVEY.md §2.9 M8, M9).

The reference trains sklearn models on pandas frames fetched from SQL Server
(churn XGBoost: ``Website/market/dunnhumby/ml_models.py:1130-1251``;
the 4-horizon × 4-model grid: ``ml_models.py:216-596``). Spark-first, the
labeled feature frame is a DataFrame plan (operators/churn.py, the
repurchase-label semi-join) and training crosses to the JVM through one
``Pipeline.fit`` — no driver-side feature matrices.

Model mapping (SURVEY §7.4.4-7.4.5):
    XGBClassifier            → GBTClassifier (gradient-boosted trees)
    RandomForestClassifier   → RandomForestClassifier
    MLPClassifier(128,64,32) → MultilayerPerceptronClassifier
    SVC(rbf)                 → LinearSVC (RBF kernel has no MLlib equivalent;
                               the reference itself subsamples SVC to 5K rows)
    "gradient_boost" (an RF clone in the reference, ml_models.py:541)
                             → a real GBT, intent over bug-fidelity

All estimators get explicit seeds; `handleInvalid='keep'` mirrors the
reference's LabelEncoder unknown→0 fallback (ml_models.py:424-430).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import (
    GBTClassifier,
    LinearSVC,
    MultilayerPerceptronClassifier,
    RandomForestClassifier,
)
from pyspark.ml.evaluation import (
    BinaryClassificationEvaluator,
    MulticlassClassificationEvaluator,
)
from pyspark.ml.feature import StandardScaler, VectorAssembler
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SEED = 42


@dataclass
class TrainedModel:
    model: PipelineModel
    metrics: dict[str, float]


def _assembler(feature_cols: list[str]) -> list:
    return [
        VectorAssembler(inputCols=feature_cols, outputCol="__raw", handleInvalid="keep"),
        StandardScaler(inputCol="__raw", outputCol="features", withMean=True, withStd=True),
    ]


def _classifier(kind: str, n_features: int, label: str = "label", overrides: dict | None = None):
    common = dict(featuresCol="features", labelCol=label)
    common.update(overrides or {})
    if kind == "random_forest":
        # reference: RF(150 trees, depth 15) — ml_models.py:538-540
        return RandomForestClassifier(**{"numTrees": 150, "maxDepth": 15, "seed": SEED, **common})
    if kind == "gradient_boost":
        return GBTClassifier(**{"maxIter": 60, "maxDepth": 5, "seed": SEED, **common})
    if kind == "neural_network":
        # reference MLP hidden layers (128, 64, 32) — ml_models.py:64-69
        return MultilayerPerceptronClassifier(
            **{"layers": [n_features, 128, 64, 32, 2], "maxIter": 100, "seed": SEED, **common}
        )
    if kind == "svm":
        return LinearSVC(**{"maxIter": 50, **common})
    raise ValueError(f"unknown model kind: {kind}")


def binary_metrics(predictions: DataFrame, label: str = "label") -> dict[str, float]:
    out: dict[str, float] = {}
    try:
        out["auc"] = BinaryClassificationEvaluator(
            labelCol=label, metricName="areaUnderROC"
        ).evaluate(predictions)
    except Exception:  # LinearSVC rawPrediction still works; guard anyway
        pass
    for metric in ("accuracy", "weightedPrecision", "weightedRecall", "f1"):
        out[metric] = MulticlassClassificationEvaluator(
            labelCol=label, metricName=metric
        ).evaluate(predictions)
    return out


def train_classifier(
    labeled: DataFrame,
    feature_cols: list[str],
    label_col: str,
    kind: str = "gradient_boost",
    train_fraction: float = 0.8,
    overrides: dict | None = None,
) -> TrainedModel:
    """Assemble → scale → fit one classifier; metrics on the held-out split.

    The 80/20 split uses a seeded randomSplit (the reference's stratified
    train_test_split, ml_models.py:535-536 — MLlib randomSplit is the
    distributed analogue). ``overrides`` patches estimator params (e.g.
    smaller maxIter/numTrees for test fixtures)."""
    df = labeled.withColumn("label", F.col(label_col).cast("double"))
    train, test = df.randomSplit([train_fraction, 1 - train_fraction], seed=SEED)
    stages = _assembler(feature_cols) + [_classifier(kind, len(feature_cols), overrides=overrides)]
    model = Pipeline(stages=stages).fit(train)
    metrics = binary_metrics(model.transform(test))
    return TrainedModel(model=model, metrics=metrics)


def train_model_grid(
    labeled: DataFrame,
    feature_cols: list[str],
    label_col: str,
    kinds: tuple[str, ...] = ("random_forest", "gradient_boost", "neural_network", "svm"),
    overrides: dict[str, dict] | None = None,
) -> dict[str, TrainedModel]:
    """The reference's model grid for one horizon (ml_models.py:538-567).
    ``overrides`` maps kind → estimator-param patches."""
    return {
        kind: train_classifier(
            labeled, feature_cols, label_col, kind,
            overrides=(overrides or {}).get(kind),
        )
        for kind in kinds
    }


def score_with_probability(
    model: PipelineModel, df: DataFrame, out: str = "churn_probability"
) -> DataFrame:
    """predict_proba analogue: P(class=1) extracted from the probability
    vector (reference scores all customers, ml_models.py:1216-1239)."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(df)
    if "probability" in scored.columns:
        return scored.withColumn(out, vector_to_array("probability")[1])
    # margin-only models (LinearSVC): logistic-squash the raw margin
    return scored.withColumn(
        out, 1.0 / (1.0 + F.exp(-vector_to_array("rawPrediction")[1]))
    )
