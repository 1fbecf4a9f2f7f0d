"""Full-text retrieval over the document corpus — BM25 ranking.

Not in the reference (retail analytics has no text search beyond the P5
``icontains`` scan) — added as a first-class training-data-pipeline
capability: corpus curation constantly runs keyword probes ("find the docs
about X") for quality audits, targeted decontamination and topical
sampling, and BM25 (Robertson et al., the Lucene/Elasticsearch default) is
the standard ranking function for that.

Distributed shape (the inverted-index shape, expressed declaratively):

1. one scan tokenizes each doc, keeps its length, and filters the token
   array to the query terms BEFORE exploding — shuffle volume is matched
   term instances only, never the whole corpus vocabulary;
2. ``groupBy(doc, term)`` term frequencies (map-side combined);
3. per-term document frequencies are a tiny ``groupBy(term)`` over that
   frame (≤ |query| rows, broadcast back);
4. scoring is pure column math; top-k is ``orderBy().limit()`` →
   ``TakeOrderedAndProject`` (per-partition heaps, no global sort).

Corpus statistics (N, avgdl) are one map-side-combined aggregate collected
as a single driver scalar row (the M15 micro-matrix pattern). For a
repeated-query serving deployment, materialize the full (term, doc, tf,
dl) posting-list frame once (``build_index``) bucketed by term, and run
:func:`bm25_topk_indexed` per query against it — the per-query cost is
then a semi-join on the query's terms, not a corpus scan.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from market_data_mining_project_spark.operators.text import lower_tokens


def build_index(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Materializable posting-list frame: one row per (doc, term) with the
    term frequency and the doc length. Bucket/partition it by ``term`` when
    writing so query-time lookups prune to the query's buckets."""
    base = docs.select(
        F.col(id_col).alias("doc_id"), lower_tokens(F.col(text_col)).alias("__ts")
    )
    return (
        base.select("doc_id", F.size("__ts").alias("dl"), F.explode("__ts").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl"))
    )


def corpus_stats(docs: DataFrame, text_col: str) -> tuple[int, float]:
    """(N, avgdl) — one aggregate, one driver scalar row. NULL text stays
    NULL (not size's legacy −1) so avg skips it, like the SQL twin's
    AVG over the tokenizer's NULL output; N still counts every doc."""
    dl = F.when(
        F.col(text_col).isNull(), F.lit(None)
    ).otherwise(F.size(lower_tokens(F.col(text_col))))
    row = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(dl).alias("avgdl"),
    ).collect()[0]
    return int(row["n"]), float(row["avgdl"] or 0.0)


def _score(k1: float, b: float, n_docs: int, avgdl: float):
    idf = F.log(1.0 + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5))
    tf_norm = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.lit(avgdl))
    )
    return idf * tf_norm


def _rank(
    hits: DataFrame, n_docs: int, avgdl: float, k: int, k1: float, b: float
) -> DataFrame:
    """Shared df → score → deterministic-top-k tail of both ranking paths —
    ONE copy, so a scoring or tie-break change cannot silently break the
    'identical scores to bm25_topk' contract of the indexed path."""
    dfreq = hits.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = hits.join(F.broadcast(dfreq), "term").groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("int").alias("matched_terms"),
        F.round(F.sum(_score(k1, b, n_docs, avgdl)), 4).alias("score"),
    )
    return scored.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents for a bag-of-words query under BM25.

    Returns (doc_id, matched_terms, score) ordered by (score desc, doc_id
    asc) — fully deterministic, ties broken on id. Terms are matched
    lowercase-exact (the tokenizer is the same whitespace split the rest of
    the text stack uses). One corpus scan; see the module docstring for the
    scale shape and :func:`bm25_topk_indexed` for the serving path.
    """
    terms = sorted({t.lower() for t in query_terms})
    n_docs, avgdl = corpus_stats(docs, text_col)
    # a degenerate corpus (no docs / no tokens) produces zero hit rows, so
    # the normal plan already returns an empty frame with the REAL schema
    # (a hardcoded empty-schema branch would diverge for non-long id_col);
    # the dummy avgdl only keeps the per-row expression division-safe
    avgdl = avgdl or 1.0
    base = docs.select(
        F.col(id_col).alias("doc_id"), lower_tokens(F.col(text_col)).alias("__ts")
    )
    hits = (
        base.select(
            "doc_id",
            F.size("__ts").alias("dl"),
            F.explode(F.filter("__ts", lambda t: t.isin(terms))).alias("term"),
        )
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl"))
    )
    return _rank(hits, n_docs, avgdl, k, k1, b)


def bm25_topk_indexed(
    index: DataFrame,
    n_docs: int,
    avgdl: float,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Serving path: rank against a pre-built :func:`build_index` frame.
    The query's terms prune the posting lists (an ``isin`` filter that
    reaches the parquet scan of a term-partitioned index); no corpus scan.
    Identical scores to :func:`bm25_topk` on the same corpus."""
    terms = sorted({t.lower() for t in query_terms})
    avgdl = avgdl or 1.0  # degenerate-corpus guard, same as bm25_topk
    hits = index.filter(F.col("term").isin(terms))
    return _rank(hits, n_docs, avgdl, k, k1, b)


def bm25_score_py(
    corpus: list[tuple[int, str]], query_terms: list[str], k1: float = 1.2, b: float = 0.75
) -> dict[int, float]:
    """Pure-Python reference implementation for pytest ground truth."""
    terms = sorted({t.lower() for t in query_terms})
    toked = {i: t.lower().split() for i, t in corpus}
    n = len(toked)
    avgdl = sum(len(v) for v in toked.values()) / n if n else 0.0
    df = {t: sum(1 for v in toked.values() if t in v) for t in terms}
    out: dict[int, float] = {}
    for i, v in toked.items():
        s = 0.0
        for t in terms:
            tf = v.count(t)
            if tf == 0:
                continue
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(v) / avgdl))
        if s > 0:
            out[i] = round(s, 4)
    return out
