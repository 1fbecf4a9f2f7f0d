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
    # SUM over an all-NULL tokens column is NULL -> 0: that source exists
    # but contributes no countable mass, which must plan (rate 0), not
    # TypeError in the arithmetic below
    toks = {r.source: (r.tokens or 0) for r in totals}
    if target is None:
        # uniform over the sources that HAVE tokens: a zero/NULL-token
        # source cannot be targeted (it would pin the budget at 0) but must
        # still plan — it gets a weight-0 / rate-0 row in the output
        target = {s: 1.0 for s in toks if toks[s]}
    if not target or not any(w > 0 for w in target.values()):
        raise ValueError("no positively-weighted source with tokens to plan")
    unknown = set(target) - set(toks)
    if unknown:
        raise ValueError(f"target names sources absent from the corpus: {sorted(unknown)}")
    z = sum(target.values())
    weights = {s: w / z for s, w in target.items()}
    # a POSITIVELY-weighted source with zero tokens pins the budget at 0 —
    # every other source's rate silently zeroes. That's a broken request,
    # not a plan: fail loudly instead
    starved = sorted((s for s, w in weights.items() if w > 0 and not toks[s]), key=str)
    if starved:
        raise ValueError(
            f"target weights positive for zero-token sources {starved}; "
            "a zero-token source pins the achievable budget at 0 — drop it "
            "from the target or fix its token counts"
        )
    budget = min(toks[s] * max_epochs / w for s, w in weights.items() if w > 0)
    rows = [
        (
            s,
            int(toks[s]),
            round(weights.get(s, 0.0), 6),
            round(weights.get(s, 0.0) * budget / toks[s], 6) if toks[s] else 0.0,
            int(weights.get(s, 0.0) * budget),
        )
        # None-safe sort: a corpus mixing NULL and named sources must plan,
        # not TypeError — NULL sorts first (it can't compare to str)
        for s in sorted(toks, key=lambda s: (s is not None, s))
    ]
    return docs.sparkSession.createDataFrame(
        rows,
        "source string, tokens bigint, weight double, sample_rate double, expected_tokens bigint",
    )


def apply_mixture(
    docs: DataFrame,
    plan: DataFrame,
    source_col: str,
    id_col: str,
    seed: int = 42,
) -> DataFrame:
    """Execute a :func:`mixture_weights` plan: per-source deterministic
    sampling at ``sample_rate`` — rates < 1 keep a hash-selected subset,
    rates > 1 REPEAT documents (epoch-style upsampling, the LLaMA/Pile
    recipe), with the fractional part resolved per document so the
    expected kept-token mass equals ``rate × source_tokens`` exactly.

    Deterministic, not random: each doc gets ``floor(rate)`` full copies
    plus one more iff ``hash_frac(id, seed) < frac(rate)`` — a seeded
    hash uniform in [0,1), so the sample is reproducible across runs,
    machines and partitionings (``rand()`` is none of those), and a
    driver recount can verify it exactly. The hash is the first 32 bits
    of ``md5(id || ':' || seed)`` rather than Spark's ``xxhash64``: MD5
    is the one seeded-uniform primitive BOTH engines of the oracle
    harness compute bit-identically (DuckDB has no xxhash64; its
    ``hash()`` is engine-private), which is what lets the whole
    mixture-apply audit be hash-checked against an independent DuckDB
    twin instead of staying rows-only. Still a JVM-side codegen'd
    expression — no Python in the hot path. Shape: one broadcast join of
    the |sources|-row plan + one bounded ``explode(sequence)`` — no
    shuffle beyond the plan broadcast. Output adds ``copy`` (0-based
    repetition index) so downstream packing can distinguish epochs.
    """
    rates = plan.select(
        F.col("source").alias("__src"), F.col("sample_rate").alias("__rate")
    )
    # null-SAFE plan join: mixture_weights emits a plan row for a NULL
    # source group, and a plain equi-join would silently drop every
    # NULL-source document (NULL never equi-joins NULL) — token mass would
    # vanish with no audit signal
    joined = docs.join(
        F.broadcast(rates), F.col(source_col).eqNullSafe(F.col("__src"))
    ).drop("__src")
    # k / 2^32 with k the first 8 md5 hex digits: k < 2^32 <= 2^53 so the
    # double quotient is EXACT, and the same expression is replicable in
    # DuckDB as CAST('0x' || substr(md5(id || ':seed'), 1, 8) AS BIGINT)
    frac_hash = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col(id_col).cast("string"), F.lit(str(seed)))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        / F.lit(4294967296.0)
    )
    n_copies = (
        F.floor(F.col("__rate"))
        + (frac_hash < (F.col("__rate") - F.floor(F.col("__rate")))).cast("long")
    ).cast("int")
    return (
        joined.withColumn("__n", n_copies)
        .filter(F.col("__n") > 0)
        .withColumn(
            "copy", F.explode(F.sequence(F.lit(0), F.col("__n") - 1))
        )
        .drop("__rate", "__n")
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
    partition dependence. The join side's cluster column rides under a
    private name so a ``docs`` frame that already carries a ``cluster``
    column (natural in a dedup pipeline feeding this) passes through
    untouched instead of hitting AMBIGUOUS_REFERENCE.
    """
    key = F.coalesce(F.col("__cluster"), F.col(id_col)).cast("string")
    return (
        docs.join(
            clusters.select(
                F.col("doc").alias(id_col), F.col("cluster").alias("__cluster")
            ),
            id_col,
            "left",
        )
        .withColumn("fold", F.pmod(F.xxhash64(key), F.lit(k)).cast("int"))
        .drop("__cluster")
    )
