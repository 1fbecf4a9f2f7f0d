"""Association-rule mining (SURVEY.md §2.9 M1–M4, §2.3 J4/J5).

The reference ships three implementations: a SQL pair self-join
(``Website/market/dunnhumby/views.py:133-348``), a pure-Python Apriori
(``analytics.py:15-184``) and a streamed category miner
(``views.py:361-678``). Spark-first, there are two paths:

- :func:`pairwise_rules` — 1⇒1 rules exactly like the reference's SQL path:
  distinct (basket, item) → self-join on basket with ``item_a < item_b`` →
  distinct-basket pair counts → join per-item counts → metric expressions.
  All shuffles key on ``basket``/pair; AQE handles skewed popular items.
  At 100 TB the frequent-item pre-filter (Apriori monotonicity, reference
  views.py:414-437) is what bounds the pair explosion — applied here BEFORE
  the self-join so Catalyst pushes it into both scan branches.
- :func:`fpgrowth_rules` — multi-item rules via ``pyspark.ml.fpm.FPGrowth``
  (same frequent-itemset semantics as the reference's Apriori at equal
  minSupport, SURVEY §7.4.6), the scalable replacement for level-wise
  candidate generation.

Metric identities (validate_results.py:104-139):
    support    = pair_baskets / total_baskets
    confidence = pair_baskets / antecedent_baskets
    lift       = confidence / (consequent_baskets / total_baskets)
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..session import truncate_lineage

try:  # MLlib import gated so a missing mllib build degrades gracefully
    from pyspark.ml.fpm import FPGrowth, PrefixSpan

    HAS_FPGROWTH = True
except ImportError:  # pragma: no cover
    HAS_FPGROWTH = False


def item_baskets(fact: DataFrame, basket: str, item: str) -> DataFrame:
    """Distinct (basket, item) pairs — dedups multi-line purchases so that
    COUNT(*) == COUNT(DISTINCT basket) downstream (reference counts
    DISTINCT basket_id throughout, views.py:219-233)."""
    return fact.select(basket, item).distinct()


def frequent_items(
    fact: DataFrame | None,
    basket: str,
    item: str,
    min_count: int,
    cap: int | None = None,
    ib: DataFrame | None = None,
) -> DataFrame:
    """Items appearing in ≥ min_count distinct baskets (A6; reference
    frequent-1 pruning with candidate caps, views.py:414-437). A prebuilt
    ``ib`` (distinct basket-item frame — e.g. a materialized derived table
    shared across the rule miners) skips re-deduplicating ``fact``."""
    if ib is None:
        ib = item_baskets(fact, basket, item)
    counts = (
        ib.groupBy(item)
        .agg(F.count(F.lit(1)).alias("item_baskets"))
        .filter(F.col("item_baskets") >= min_count)
    )
    if cap is not None:
        counts = counts.orderBy(F.col("item_baskets").desc(), F.col(item).asc()).limit(cap)
    return counts


def pair_counts(
    fact: DataFrame | None,
    basket: str,
    item: str,
    min_count: int,
    item_cap: int | None = None,
    ib: DataFrame | None = None,
    freq: DataFrame | None = None,
) -> DataFrame:
    """Co-occurrence pair counts via self-join (J4; reference views.py:199-235).

    Apriori pruning first: only frequent items enter the self-join, so the
    shuffle is |frequent items' baskets|², not |all baskets|². The join keys
    on ``basket`` — a co-partitioned shuffle both sides reuse. Pass a
    prebuilt ``freq`` (the frequent_items frame a caller already built for
    its rule metrics) so the aggregate isn't planned twice — the DataFrame
    API does not dedupe identical subtrees.

    The semi-join prune is FORCED broadcast only under ``item_cap`` (the
    frame is then ≤ cap rows by construction); an uncapped frequent set is
    unbounded, so Spark's size-based auto-broadcast decides there.
    """
    if ib is None:
        ib = item_baskets(fact, basket, item)
    if freq is None:
        freq = frequent_items(None, basket, item, min_count, item_cap, ib=ib)
    freq_sel = freq.select(item)
    ib = ib.join(
        F.broadcast(freq_sel) if item_cap is not None else freq_sel, item, "left_semi"
    )
    a = ib.select(F.col(basket).alias("__b"), F.col(item).alias("item_a"))
    b = ib.select(F.col(basket).alias("__b"), F.col(item).alias("item_b"))
    pairs = a.join(b, "__b").filter(F.col("item_a") < F.col("item_b"))
    return (
        pairs.groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("pair_baskets"))
        .filter(F.col("pair_baskets") >= min_count)
    )


def pairwise_rules(
    fact: DataFrame | None,
    basket: str,
    item: str,
    min_support: float = 0.01,
    min_confidence: float = 0.0,
    min_lift: float = 0.0,
    max_results: int | None = None,
    item_cap: int | None = None,
    ib: DataFrame | None = None,
) -> DataFrame:
    """1⇒1 association rules, both directions (M3; reference views.py:133-348).

    Returns columns: antecedent, consequent, pair_baskets, antecedent_baskets,
    consequent_baskets, support, confidence, lift — floats rounded to 6.

    Pass a prebuilt ``ib`` (distinct basket-item frame, e.g. the materialized
    derived table shared with the FPGrowth and hybrid paths) so the basket
    total, the frequent-item counts and the pair self-join all read one
    columnar scan instead of each re-deduplicating the fact; ``fact`` is then
    unused and may be None.
    """
    if ib is None:
        ib = item_baskets(fact, basket, item)
    total = ib.select(basket).distinct().count()
    # MLlib-exact: FPGrowth computes ceil(minSupport * n) on the IEEE double
    # product, and the SQL twins CEIL the same DOUBLE product — all three
    # agree bit-for-bit. int() FLOORED, so a pair strictly below min_support
    # passed the filter (and 100 * 0.29 -> 28.999... -> 28 drifted one
    # below the exact threshold).
    min_count = max(1, math.ceil(total * min_support))

    freq = frequent_items(None, basket, item, min_count, item_cap, ib=ib)
    pairs = pair_counts(None, basket, item, min_count, item_cap, ib=ib, freq=freq)

    counts_a = freq.select(F.col(item).alias("antecedent"), F.col("item_baskets").alias("antecedent_baskets"))
    counts_b = freq.select(F.col(item).alias("consequent"), F.col("item_baskets").alias("consequent_baskets"))

    # Both rule directions from each unordered pair (reference emits A→B and B→A).
    directed = pairs.selectExpr(
        "item_a as antecedent", "item_b as consequent", "pair_baskets"
    ).unionByName(
        pairs.selectExpr("item_b as antecedent", "item_a as consequent", "pair_baskets")
    )

    # same broadcast policy as pair_counts: force it only when item_cap
    # bounds the frame; otherwise let size-based auto-broadcast decide
    if item_cap is not None:
        counts_a, counts_b = F.broadcast(counts_a), F.broadcast(counts_b)
    rules = (
        directed.join(counts_a, "antecedent")
        .join(counts_b, "consequent")
        .withColumn("support", F.round(F.col("pair_baskets") / F.lit(total), 6))
        .withColumn("confidence", F.round(F.col("pair_baskets") / F.col("antecedent_baskets"), 6))
        .withColumn(
            "lift",
            F.round(
                (F.col("pair_baskets") / F.col("antecedent_baskets"))
                / (F.col("consequent_baskets") / F.lit(total)),
                6,
            ),
        )
        .filter((F.col("confidence") >= min_confidence) & (F.col("lift") >= min_lift))
        .select(
            "antecedent",
            "consequent",
            "pair_baskets",
            "antecedent_baskets",
            "consequent_baskets",
            "support",
            "confidence",
            "lift",
        )
    )
    if max_results is not None:
        rules = rules.orderBy(
            F.col("lift").desc(), F.col("antecedent").asc(), F.col("consequent").asc()
        ).limit(max_results)
    return rules


def category_rules(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    category: str,
    basket: str,
    min_support: float = 0.01,
    min_confidence: float = 0.0,
    item_cap: int | None = 1000,
    max_results: int | None = None,
) -> DataFrame:
    """Category-level rules (M4; reference dept/commodity miners,
    views.py:361-678): broadcast-join the dim, then mine categories as items.

    The reference streams sorted rows through a Python cursor loop
    (views.py:461-479) — here the same semantics are the pairwise miner over
    (basket, category)."""
    cat_fact = fact.join(F.broadcast(dim.select(key, category)), key, "inner").filter(
        F.col(category).isNotNull()
    )
    return pairwise_rules(
        cat_fact,
        basket,
        category,
        min_support=min_support,
        min_confidence=min_confidence,
        item_cap=item_cap,
        max_results=max_results,
    )


def basket_itemsets(
    fact: DataFrame | None, basket: str, item: str, ib: DataFrame | None = None
) -> DataFrame:
    """Per-basket distinct item arrays for FPGrowth (sorted for determinism).
    A prebuilt ``ib`` (already-distinct basket-item frame) skips the dedup."""
    if ib is None:
        ib = fact.select(basket, item).distinct()
    return ib.groupBy(basket).agg(F.sort_array(F.collect_list(item)).alias("items"))


def fpgrowth_rules(
    fact: DataFrame | None,
    basket: str,
    item: str,
    min_support: float = 0.01,
    min_confidence: float = 0.2,
    ib: DataFrame | None = None,
) -> DataFrame:
    """Multi-item rules via MLlib FPGrowth (M1/M2; replaces the reference's
    level-wise Apriori, analytics.py:56-160 — same frequent-itemset
    semantics at equal minSupport, SURVEY §7.4.6).

    Returns antecedent array, consequent array, support/confidence/lift.
    ``ib`` as in :func:`pairwise_rules` — the shared distinct basket-item
    frame; ``fact`` may then be None.
    """
    if not HAS_FPGROWTH:  # pragma: no cover
        raise NotImplementedError("pyspark.ml.fpm.FPGrowth unavailable in this build")
    baskets = basket_itemsets(fact, basket, item, ib=ib).withColumn(
        "items", F.col("items").cast("array<string>")
    )
    model = FPGrowth(
        itemsCol="items", minSupport=min_support, minConfidence=min_confidence
    ).fit(baskets)
    return model.associationRules.select(
        F.col("antecedent"),
        F.col("consequent"),
        F.round("support", 6).alias("support"),
        F.round("confidence", 6).alias("confidence"),
        F.round("lift", 6).alias("lift"),
    )


def sequence_itemsets(
    fact: DataFrame, key: str, step: str, item: str
) -> DataFrame:
    """Per-key ordered sequence of itemsets for PrefixSpan: distinct items
    per (key, step) collected into a step-sorted array of arrays. Items
    inside a step are sorted and the steps ordered by the step column, so
    the sequence frame is deterministic under shuffles. Two hash
    aggregates / two exchanges, both map-side combinable — shuffling the
    combined per-(key, step) rows then the per-step arrays moves fewer
    bytes than one raw repartition by key would (same deliberate
    trade-off as `daily_resample_locf`; note partitioning on (key, step)
    does NOT satisfy a key-only regroup, so exchange reuse is
    impossible in that direction)."""
    per_step = (
        fact.select(key, step, item)
        .groupBy(key, step)
        .agg(F.sort_array(F.collect_set(item)).alias("__items"))
    )
    return per_step.groupBy(key).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct(F.col(step).alias("s"), F.col("__items").alias("i")))),
            lambda x: x["i"],
        ).alias("sequence")
    )


def sequential_patterns(
    sequences: DataFrame,
    min_support: float = 0.1,
    max_pattern_length: int = 3,
    max_local_proj_db_size: int = 32_000_000,
) -> DataFrame:
    """Frequent sequential patterns via MLlib PrefixSpan (Pei et al. 2001,
    the projected-database algorithm MLlib distributes) — the ORDERED
    sibling of the FPGrowth basket rules: "customers who buy brand A in
    one order later buy brand B". Input is the ``sequence`` frame from
    :func:`sequence_itemsets`; output flattens each pattern to a
    canonical string (steps ``>``-joined, items ``|``-joined, itemsets
    SORTED — MLlib orders items inside a mined itemset by its internal
    descending-frequency rank, which is partition-order-dependent under
    frequency ties, so canonicalizing here is what makes the output
    deterministic and twin-comparable) beside its absolute frequency.
    At ``max_pattern_length <= 2`` the support counts ARE
    SQL-expressible (single items; same-step pairs via a day-level
    self-join; step-ordered pairs via min-day(A) < max-day(B)), which is
    how the catalog's `sequential_patterns` entry is hash-oracled; the
    exact containment-recount pytest gate remains for the general
    depth."""
    if not HAS_FPGROWTH:  # pragma: no cover
        raise NotImplementedError("pyspark.ml.fpm.PrefixSpan unavailable in this build")
    ps = PrefixSpan(
        minSupport=min_support,
        maxPatternLength=max_pattern_length,
        maxLocalProjDBSize=max_local_proj_db_size,
        sequenceCol="sequence",
    )
    # PrefixSpan makes several passes over its input (item counting +
    # the distributed mining stages), and the RETURNED frame is lazy —
    # its lineage reaches back through groupByKey/LocalPrefixSpan to the
    # input scan, so every downstream action would re-mine. Cache the
    # input for the passes, then localCheckpoint the (small) pattern
    # frame to truncate that lineage BEFORE releasing the cache.
    sequences = sequences.cache()
    try:
        pats = ps.findFrequentSequentialPatterns(sequences).transform(
            truncate_lineage
        )
    finally:
        sequences.unpersist()
    return pats.select(
        F.array_join(
            F.transform("sequence", lambda s: F.array_join(F.array_sort(s), "|")), ">"
        ).alias("pattern"),
        F.size("sequence").alias("n_steps"),
        F.col("freq").cast("long").alias("freq"),
    )
