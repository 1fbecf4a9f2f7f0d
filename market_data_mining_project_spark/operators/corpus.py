"""Corpus-level curation operators: domain mixture weighting and
leakage-free fold assignment.

Both are the standard last-mile steps of a training-data pipeline:

- mixture weighting (The Pile / LLaMA style): given per-source token
  volumes and a target mixture, derive per-source sampling rates — scaled
  so the scarcest source pins the budget (no source upsampled past
  ``max_epochs``).
- leakage-free splits: near-duplicate documents must land in the SAME
  fold, or the validation set leaks training content (the dedup-aware
  split argued by Lee et al. 2021 §6). Folds are assigned per near-dup
  CLUSTER (via the connected-components resolver), so every member
  inherits its cluster's fold; singletons hash their own id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mixture_weights(
    docs: DataFrame,
    source_col: str,
    tokens_col: str,
    target: dict[str, float] | None = None,
    max_epochs: float = 1.0,
) -> DataFrame:
    """Per-source sampling plan toward a target mixture.

    ``target`` maps source → desired weight (normalized internally);
    None = uniform. The achievable corpus budget is pinned by the
    scarcest source: B = min_s(tokens_s × max_epochs / w_s), so
    ``sample_rate_s = w_s × B / tokens_s`` never exceeds ``max_epochs``
    (rate > 1 means upsampling/repetition, allowed up to that cap).

    One map-side-combined aggregate (|sources| rows), then driver-side
    arithmetic on that tiny frame — the same M15 micro-matrix pattern.
    Returns (source, tokens, weight, sample_rate, expected_tokens).
    """
    totals = (
        docs.groupBy(F.col(source_col).alias("source"))
        .agg(F.sum(F.col(tokens_col)).alias("tokens"))
        .collect()
    )
    toks = {r.source: r.tokens for r in totals}
    if target is None:
        target = {s: 1.0 for s in toks}
    unknown = set(target) - set(toks)
    if unknown:
        raise ValueError(f"target names sources absent from the corpus: {sorted(unknown)}")
    z = sum(target.values())
    weights = {s: w / z for s, w in target.items()}
    budget = min(toks[s] * max_epochs / w for s, w in weights.items() if w > 0)
    rows = [
        (
            s,
            int(toks[s]),
            round(weights.get(s, 0.0), 6),
            round(weights.get(s, 0.0) * budget / toks[s], 6) if toks[s] else 0.0,
            int(weights.get(s, 0.0) * budget),
        )
        for s in sorted(toks)
    ]
    return docs.sparkSession.createDataFrame(
        rows,
        "source string, tokens bigint, weight double, sample_rate double, expected_tokens bigint",
    )


def leakage_free_folds(
    docs: DataFrame,
    clusters: DataFrame,
    id_col: str,
    k: int = 5,
) -> DataFrame:
    """Assign every document a fold in [0, k) such that near-duplicate
    documents NEVER straddle folds: members of a dup cluster hash their
    cluster representative, singletons hash their own id.

    ``clusters`` is the (doc, cluster) frame from
    :func:`operators.dedup.dup_clusters` — cluster ids are the component's
    min doc id, so hashing the cluster id IS hashing the representative.
    Shape: one left join on id (the clusters side holds only dup-cluster
    members — broadcast-sized on real corpora where dups are the
    minority) + a hash map. Deterministic: xxhash64 of the value, no
    partition dependence.
    """
    key = F.coalesce(F.col("cluster"), F.col(id_col)).cast("string")
    return (
        docs.join(
            clusters.withColumnRenamed("doc", id_col).select(id_col, "cluster"),
            id_col,
            "left",
        )
        .withColumn("fold", F.pmod(F.xxhash64(key), F.lit(k)).cast("int"))
        .drop("cluster")
    )
