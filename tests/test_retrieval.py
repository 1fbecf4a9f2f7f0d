"""BM25 retrieval: pure-Python reference parity, scan/index equivalence,
and the top-k plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from market_data_mining_project_spark.operators import retrieval as RET

CORPUS = [
    (1, "spark runs fast spark scales spark"),
    (2, "vector search over a vector index"),
    (3, "slow scans are slow and slow again slow"),
    (4, "nothing relevant here at all"),
    (5, "spark vector slow"),
    (6, "a very long document " + "padding filler words " * 40 + "spark"),
]
QUERY = ["spark", "vector", "slow"]


def _spark_scores(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    out = RET.bm25_topk(docs, QUERY, "text", "doc_id", k=10)
    return {r["doc_id"]: (r["matched_terms"], r["score"]) for r in out.collect()}


def test_bm25_matches_python_reference(spark):
    got = _spark_scores(spark)
    want = RET.bm25_score_py(CORPUS, QUERY)
    assert set(got) == set(want), "matched-doc sets differ"
    for doc, score in want.items():
        assert abs(got[doc][1] - score) < 1e-6, f"doc {doc}: {got[doc][1]} != {score}"
    # doc 4 has no query terms → absent; doc 5 matches all three terms
    assert 4 not in got
    assert got[5][0] == 3


def test_bm25_ranking_properties(spark):
    """tf saturation + length normalization: the short all-terms doc must
    outrank the long doc whose single 'spark' hit is buried in filler."""
    got = _spark_scores(spark)
    assert got[5][1] > got[6][1]
    # repetition raises the per-term score sublinearly: doc 1 (3× spark)
    # beats doc 6 (1× spark, much longer), both single-term matches
    assert got[1][1] > got[6][1]


def test_bm25_indexed_equals_scan(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    n_docs, avgdl = RET.corpus_stats(docs, "text")
    index = RET.build_index(docs, "text", "doc_id")
    via_index = RET.bm25_topk_indexed(index, n_docs, avgdl, QUERY, k=10)
    via_scan = RET.bm25_topk(docs, QUERY, "text", "doc_id", k=10)
    assert sorted(map(tuple, via_index.collect())) == sorted(map(tuple, via_scan.collect()))


def test_bm25_empty_and_no_match(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert RET.bm25_topk(empty, QUERY, "text", "doc_id").count() == 0
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    assert RET.bm25_topk(docs, ["zzzunseen"], "text", "doc_id").count() == 0


def test_bm25_catalog_plan_is_take_ordered(spark, sf_dir):
    """The catalog binding's top-k must compile to TakeOrderedAndProject
    (per-partition heaps), never a global sort."""
    import __spark_entry__ as entry_mod

    df = entry_mod.queries()["bm25_search"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    # the per-term document-frequency table joins broadcast, never shuffled
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_bm25_monotone_in_k(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    top2 = RET.bm25_topk(docs, QUERY, "text", "doc_id", k=2).collect()
    top5 = RET.bm25_topk(docs, QUERY, "text", "doc_id", k=5).collect()
    assert [r["doc_id"] for r in top2] == [r["doc_id"] for r in top5][:2]


def test_bm25_index_bucketed_by_term_aggregates_without_shuffle(spark, sf_dir):
    """The serving-path story: a term-bucketed posting-list table computes
    per-term document frequencies WITHOUT a shuffle (bucket-key aggregate),
    and the query's isin filter reaches the scan. Scores must equal the
    one-scan path."""
    from market_data_mining_project_spark.operators.dedup import ensure_parallelism
    from market_data_mining_project_spark.sources import materialize as MAT
    from market_data_mining_project_spark.sources.tables import load_table

    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    n_docs, avgdl = RET.corpus_stats(docs, "text")
    MAT.write_bucketed_table(
        RET.build_index(docs, "text", "doc_id"), "bm25_index", "term", n_buckets=8
    )
    try:
        index = spark.table("bm25_index")
        terms = ["spark", "vector", "slow"]
        hits = index.filter(F.col("term").isin(terms))
        dfreq = hits.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
        assert not MAT.plan_has_shuffle(dfreq), "bucket-key agg must not shuffle"
        plan = hits._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters" in plan and "In(term" in plan.replace(" ", "").replace(
            "\n", ""
        ), "query terms must prune the posting-list scan"
        via_index = sorted(
            map(tuple, RET.bm25_topk_indexed(index, n_docs, avgdl, terms, k=15).collect())
        )
        via_scan = sorted(
            map(tuple, RET.bm25_topk(docs, terms, "text", "doc_id", k=15).collect())
        )
        assert via_index == via_scan
    finally:
        spark.sql("DROP TABLE IF EXISTS bm25_index")


def test_corpus_stats_null_text_skips_avgdl(spark):
    """NULL text contributes to N but not avgdl (size's legacy -1 must not
    average in), matching the SQL twin's AVG-over-NULL-skipping."""
    from market_data_mining_project_spark.operators.retrieval import corpus_stats

    df = spark.createDataFrame([(1, "a b c"), (2, "d e"), (3, None)], "id long, text string")
    n, avgdl = corpus_stats(df, "text")
    assert n == 3
    assert abs(avgdl - 2.5) < 1e-12
