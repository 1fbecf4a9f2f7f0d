"""Ground-truth validation for the non-SQL-expressible ops (SURVEY.md §5):
MinHash-LSH and SimHash are checked against exact n-gram Jaccard / exact
cosine, mirroring the reference's independent-recount validation style
(reference validate_results.py:78-139)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from market_data_mining_project_spark.operators import dedup as D
from market_data_mining_project_spark.operators import similarity as SIM
from market_data_mining_project_spark.sources.tables import load_table


def test_minhash_lsh_recall_vs_exact_jaccard(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    truth = {
        (r.doc_a, r.doc_b)
        for r in D.ngram_jaccard_pairs(docs, "text", "doc_id", shingle_n=3, threshold=0.8).collect()
    }
    cand = {
        (r.doc_a, r.doc_b)
        for r in D.minhash_lsh_candidates(
            docs, "text", "doc_id", num_hashes=32, bands=8, shingle_n=3
        ).collect()
    }
    assert truth, "test data should contain at least one >=0.8-Jaccard near-dup pair"
    recall = len(truth & cand) / len(truth)
    assert recall >= 0.9, f"LSH recall {recall:.2f} too low ({len(truth)} true pairs)"


def test_ngram_jaccard_df_cap_keeps_recall(spark, sf_dir):
    """The hot-shingle document-frequency cap (the quadratic-fan-out guard)
    must not lose true near-dup pairs at a sane setting: shingles shared by
    more than max_df docs carry no near-dup signal on this fixture."""
    docs = load_table(spark, sf_dir, "documents")
    truth = {
        (r.doc_a, r.doc_b)
        for r in D.ngram_jaccard_pairs(docs, "text", "doc_id", 3, 0.5).collect()
    }
    capped = {
        (r.doc_a, r.doc_b)
        for r in D.ngram_jaccard_pairs(
            docs, "text", "doc_id", 3, 0.5, max_shingle_df=20
        ).collect()
    }
    assert truth, "fixture should contain near-dup pairs"
    assert truth <= capped, f"df cap lost pairs: {truth - capped}"
    # the cap shrinks |A∪B| too, so it can ADMIT pairs as well as lose them —
    # bound that false-positive side: any capped-only pair must still have a
    # true (uncapped) Jaccard near the 0.5 threshold, never a far-off pair
    extra = capped - truth
    if extra:
        true_j = {
            (r.doc_a, r.doc_b): r.jaccard
            for r in D.ngram_jaccard_pairs(docs, "text", "doc_id", 3, 0.0).collect()
        }
        for pair in extra:
            assert true_j.get(pair, 0.0) >= 0.4, (
                f"df cap admitted far-from-threshold pair {pair} "
                f"(true jaccard {true_j.get(pair, 0.0)})"
            )


def test_simhash_flags_exact_dups(spark, sf_dir):
    """Identical texts have identical simhashes (hamming 0) and must always
    pair. The sf fixture carries no exact text dups (the former corpus-only
    version of this test was vacuous), so copies of the first three docs
    are PLANTED under new ids."""
    base = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # offset derived from the real max id — a fixed offset would collide
    # with genuine doc_ids at larger scale factors
    offset = base.agg(F.max("doc_id")).collect()[0][0] + 1
    planted = base.filter(F.col("doc_id") < 3).select(
        (F.col("doc_id") + offset).alias("doc_id"), "text"
    )
    docs = base.unionByName(planted)
    exact_pairs = (
        docs.alias("a")
        .join(docs.alias("b"), F.expr("md5(a.text) = md5(b.text) AND a.doc_id < b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .collect()
    )
    assert len(exact_pairs) >= 3, "planted duplicates missing"
    near = {
        (r.doc_a, r.doc_b)
        for r in D.simhash_near_dups(docs, "text", "doc_id", max_hamming=3).collect()
    }
    for r in exact_pairs:
        assert (r.doc_a, r.doc_b) in near, f"exact dup {(r.doc_a, r.doc_b)} missed by simhash"


def test_lsh_topk_recall_vs_exact_cosine(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = SIM.cosine_topk(emb, queries, "embedding", "vec_id", k=5).collect()
    # synthetic embeddings have weak top-k similarity (cos ~0.3) — LSH's
    # hardest case; few bits + many tables is the right operating point
    approx = SIM.lsh_topk(
        emb, queries, "embedding", "vec_id", k=5, dim=64, bits=4, tables=16, seed=42
    ).collect()
    exact_set = {(r.query_id, r.neighbor_id) for r in exact}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.6, f"LSH ANN recall {recall:.2f} vs exact too low"


def test_exact_dedup_removes_all_text_dups(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    kept = D.exact_dedup(docs, "text", "doc_id")
    assert kept.groupBy(F.md5("text")).count().filter(F.col("count") > 1).count() == 0
    assert kept.count() == docs.select(F.md5("text")).distinct().count()


def test_corpus_prep_consistency(spark, sf_dir):
    """End-to-end corpus prep: kept set must contain no exact dups, respect
    the quality floor, keep exactly one representative per near-dup cluster,
    and report budgets that add up."""
    from market_data_mining_project_spark.operators import text as TXT
    from market_data_mining_project_spark.plans.llm_pipeline import q_corpus_prep

    docs = load_table(spark, sf_dir, "documents")
    report = {r.detected_lang: r for r in q_corpus_prep(spark, sf_dir).collect()}
    assert report, "corpus prep should keep documents"
    total_kept = sum(r.docs_kept for r in report.values())
    # recompute the stage outputs independently: the kept total must equal
    # exact-deduped docs minus near-dup cluster members plus one
    # representative per cluster — the keep-one contract, exactly
    prof = TXT.text_profile(TXT.detect_language(docs, "text"), "text")
    kept = D.exact_dedup(prof.filter(F.col("quality") >= 0.3), "text", "doc_id")
    pairs = D.ngram_jaccard_pairs(
        kept, "text", "doc_id", shingle_n=3, threshold=0.5, max_shingle_df=100
    )
    clusters = D.dup_clusters(pairs.select("doc_a", "doc_b"))
    n_kept = kept.count()
    members = clusters.count()
    n_clusters = clusters.select("cluster").distinct().count()
    assert total_kept == n_kept - members + n_clusters
    for r in report.values():
        assert r.avg_quality >= 0.3
        assert r.bpe_tokens > 0


def test_dup_clusters_match_networkx_free_ground_truth(spark, sf_dir):
    """Connected components vs a driver-side union-find over the same edges."""
    from market_data_mining_project_spark.operators.dedup import dup_clusters, ngram_jaccard_pairs
    from market_data_mining_project_spark.sources.tables import load_table as lt

    docs = lt(spark, sf_dir, "documents")
    pairs = [(r.doc_a, r.doc_b) for r in
             ngram_jaccard_pairs(docs, "text", "doc_id", 3, 0.5).collect()]
    # union-find ground truth
    parent: dict = {}
    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    truth = {x: find(x) for x in parent}
    got = {r.doc: r.cluster for r in dup_clusters(
        spark.createDataFrame(pairs, ["doc_a", "doc_b"])).collect()}
    assert got == truth


def test_ngram_contamination_matches_driver_recount(spark, sf_dir):
    """Decontamination gate: the distributed overlap counts must equal an
    exact driver-side recomputation of distinct 5-gram intersections, and
    decontaminate() must drop exactly the flagged ids."""
    docs = load_table(spark, sf_dir, "documents")
    eval_df = docs.filter(F.col("doc_id") % 50 == 0)
    train = docs.filter(F.col("doc_id") % 50 != 0)
    flagged = {
        r.doc_id: r.overlap_grams
        for r in D.ngram_contamination(train, eval_df, "text", "doc_id", n=5).collect()
    }

    def grams(text, n=5):
        toks = [t for t in text.split() if t]
        if len(toks) <= n:
            return {" ".join(toks[:n])} if toks else set()
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    eval_grams = set()
    for r in eval_df.select("text").collect():
        eval_grams |= grams(r.text)
    expected = {}
    for r in train.select("doc_id", "text").collect():
        k = len(grams(r.text) & eval_grams)
        if k >= 1:
            expected[r.doc_id] = k
    assert flagged == expected
    assert expected, "fixture should contain contaminated docs (dup corpus)"

    kept = D.decontaminate(train, eval_df, "text", "doc_id", n=5)
    kept_ids = {r.doc_id for r in kept.select("doc_id").collect()}
    train_ids = {r.doc_id for r in train.select("doc_id").collect()}
    assert kept_ids == train_ids - set(expected)


def test_token_budget_bucketed_equals_naive(spark, sf_dir):
    """The scale-path bucketed selection must keep EXACTLY the documents the
    naive full-sort cumsum keeps (same relationship as blocked vs naive
    cosine): per-group budget filled high-score-down, pre-inclusion total
    strictly under budget, ties by id."""
    from market_data_mining_project_spark.operators import text as TXT

    docs = load_table(spark, sf_dir, "documents")
    prof = TXT.text_profile(TXT.detect_language(docs, "text"), "text").withColumn(
        "bpe_tokens", TXT.bpe_ish_token_count(F.col("text"))
    ).select("doc_id", "detected_lang", "quality", "bpe_tokens")
    args = ("detected_lang", "quality", "bpe_tokens", "doc_id")
    for budget in (500, 5_000, 10**9):
        naive = TXT.token_budget_select_naive(prof, *args, budget=budget)
        fast = TXT.token_budget_select(prof, *args, budget=budget)
        assert sorted(r.doc_id for r in naive.collect()) == sorted(
            r.doc_id for r in fast.collect()
        ), f"budget={budget}"


def test_token_budget_selection_matches_driver_recount(spark, sf_dir):
    """Exact ground truth: recompute the selection in plain Python and
    compare doc sets and budget accounting."""
    from market_data_mining_project_spark.operators import text as TXT

    docs = load_table(spark, sf_dir, "documents")
    prof = TXT.text_profile(TXT.detect_language(docs, "text"), "text").withColumn(
        "bpe_tokens", TXT.bpe_ish_token_count(F.col("text"))
    ).select("doc_id", "detected_lang", "quality", "bpe_tokens")
    budget = 2_000
    rows = prof.collect()
    expected: dict[str, list] = {}
    for r in sorted(rows, key=lambda r: (r.detected_lang, -r.quality, r.doc_id)):
        grp = expected.setdefault(r.detected_lang, [0, set()])
        if grp[0] < budget:
            grp[0] += r.bpe_tokens
            grp[1].add(r.doc_id)
    got = TXT.token_budget_select(
        prof, "detected_lang", "quality", "bpe_tokens", "doc_id", budget=budget
    ).collect()
    got_by_lang: dict[str, set] = {}
    for r in got:
        got_by_lang.setdefault(r.detected_lang, set()).add(r.doc_id)
    assert got_by_lang == {g: ids for g, (_tok, ids) in expected.items()}
    # budget respected up to one overshooting doc per group
    for g, rs in got_by_lang.items():
        toks = {r.doc_id: r.bpe_tokens for r in rows if r.detected_lang == g}
        total = sum(toks[d] for d in rs)
        largest = max(toks[d] for d in rs)
        assert total - largest < budget


def test_repetition_signals_hand_built_strings(spark):
    """Gopher-style repetition columns on constructed docs: template spam
    scores high, natural prose low, degenerate docs are 0 not NULL."""
    from market_data_mining_project_spark.operators import text as TXT

    rows = [
        (1, "buy now buy now buy now buy now"),  # one bigram dominates
        (2, "the quick brown fox jumps over lazy dogs"),  # all bigrams unique
        (3, "word"),  # single token: no bigrams
        (4, ""),  # empty
        (5, "a b a b a b"),
    ]
    df = spark.createDataFrame(rows, "id LONG, text STRING")
    out = {
        r.id: (r.tb, r.dt)
        for r in df.select(
            "id",
            TXT.top_bigram_fraction(F.col("text")).alias("tb"),
            TXT.dup_token_ratio(F.col("text")).alias("dt"),
        ).collect()
    }
    # doc 1: 7 bigrams, "buy now" appears 4 times -> 4/7; 8 tokens 2 distinct
    assert out[1][0] == pytest.approx(4 / 7, abs=1e-6)
    assert out[1][1] == pytest.approx(1 - 2 / 8, abs=1e-6)
    # doc 2: every bigram unique -> 1/7; every token unique -> 0
    assert out[2][0] == pytest.approx(1 / 7, abs=1e-6)
    assert out[2][1] == 0.0
    assert out[3] == (0.0, 0.0)
    assert out[4] == (0.0, 0.0)
    # doc 5: bigrams [a b, b a, a b, b a, a b] -> 3/5; tokens 6, 2 distinct
    assert out[5][0] == pytest.approx(3 / 5, abs=1e-6)
    assert out[5][1] == pytest.approx(1 - 2 / 6, abs=1e-6)


def test_redact_pii_hand_built_strings(spark):
    """Redaction gate: each category is replaced with its typed token, prose
    survives, and counts agree with the redaction."""
    from market_data_mining_project_spark.operators import text as TXT

    rows = [
        (1, "contact me at alice@example.com or bob.smith+x@mail.co.uk today"),
        (2, "see https://example.com/a?b=c and www.test.org/path for docs"),
        (3, "server at 192.168.1.10 answered"),
        (4, "call +1 (555) 123-4567 or 555-123-4567 now"),
        (5, "plain prose with numbers like 42 and 7 stays untouched"),
        (6, "mixed: http://x.io/u@v 10.0.0.1 c@d.org"),
    ]
    df = spark.createDataFrame(rows, "id LONG, text STRING")
    out = {
        r.id: (r.red, r.cnt)
        for r in df.select(
            "id",
            TXT.redact_pii(F.col("text")).alias("red"),
            TXT.pii_counts(F.col("text")).alias("cnt"),
        ).collect()
    }
    assert out[1][0] == "contact me at <EMAIL> or <EMAIL> today"
    assert out[1][1].email == 2
    assert out[2][0] == "see <URL> and <URL> for docs"
    assert out[2][1].url == 2
    assert out[3][0] == "server at <IP> answered"
    assert out[3][1].ip == 1
    # the audit must count what the sequential chain redacts: an IPv4 also
    # matches the phone regex on raw text, but the chain replaces it with
    # <IP> first — so phone must be 0 here, not 1
    assert out[3][1].phone == 0
    assert out[4][0] == "call <PHONE> or <PHONE> now"
    assert out[4][1].phone >= 2
    assert out[6][1].ip == 1 and out[6][1].phone == 0
    assert out[5][0] == rows[4][1]  # untouched
    assert out[6][0] == "mixed: <URL> <IP> <EMAIL>"


def test_dup_span_coverage_matches_driver_recount(spark, sf_dir):
    """Exact recount of the Lee-et-al-style span-coverage signal in pure
    Python over the collected corpus: per-position 5-grams, shared = gram
    in >= 2 distinct docs; Spark's (n_spans, dup_spans) must match per doc,
    and the corpus must actually carry signal (near-dup clusters exist)."""
    docs = load_table(spark, sf_dir, "documents")
    got = {
        r.doc_id: (r.n_spans, r.dup_spans)
        for r in D.dup_span_coverage(docs, "text", "doc_id", n=5, min_docs=2).collect()
    }

    n = 5
    raw = [(r.doc_id, r.text) for r in docs.select("doc_id", "text").collect()]
    per_doc: dict[int, list[str]] = {}
    for doc_id, text in raw:
        toks = [t for t in text.strip().split() if t]
        if not toks:
            continue
        grams = [
            " ".join(toks[i : i + n]) for i in range(max(len(toks) - n, 0) + 1)
        ]
        per_doc[doc_id] = grams
    df_count: dict[str, int] = {}
    for grams in per_doc.values():
        for g in set(grams):
            df_count[g] = df_count.get(g, 0) + 1
    want = {
        doc_id: (
            len(grams),
            sum(1 for g in grams if df_count[g] >= 2),
        )
        for doc_id, grams in per_doc.items()
    }
    assert got == want
    assert any(d > 0 for _, d in got.values()), "corpus should contain shared spans"
    # exact duplicate docs exist in the corpus -> full coverage on them
    assert any(ns == ds and ds > 0 for ns, ds in got.values())


def test_cluster_profile_gates(spark, sf_dir):
    """Seeded KMeans corpus map: k clusters, sizes sum to the corpus, every
    cluster coheres better around its own centroid than the corpus does
    around the global centroid, and label purity is a valid fraction."""
    emb = load_table(spark, sf_dir, "embeddings")
    total = emb.count()
    prof = SIM.cluster_profile(
        emb, "embedding", "vec_id", label_col="label", k=10, seed=42
    ).collect()
    assert len(prof) == 10
    assert sum(r.size for r in prof) == total
    assert all(-1.0 <= r.cohesion <= 1.0 for r in prof)
    assert all(0.0 < r.purity <= 1.0 for r in prof)
    assert all(0 <= r.top_label <= 9 for r in prof)
    assert all(r.top_label_n <= r.size for r in prof)

    # baseline: one global centroid (k=1); per-cluster fit should beat it
    # on average. Computed directly — MLlib KMeans requires k >= 2.
    import math

    vecs = [r.embedding for r in emb.select("embedding").collect()]
    dim = len(vecs[0])
    centroid = [sum(v[i] for v in vecs) / len(vecs) for i in range(dim)]
    cnorm = math.sqrt(sum(x * x for x in centroid))
    base_cohesion = sum(
        sum(a * b for a, b in zip(v, centroid))
        / (math.sqrt(sum(a * a for a in v)) * cnorm)
        for v in vecs
    ) / len(vecs)
    mean_cohesion = sum(r.cohesion * r.size for r in prof) / total
    assert mean_cohesion > base_cohesion, (
        f"k=10 mean cohesion {mean_cohesion:.4f} should beat the "
        f"global-centroid baseline {base_cohesion:.4f}"
    )

    # determinism: same seed, same profile
    again = SIM.cluster_profile(
        emb, "embedding", "vec_id", label_col="label", k=10, seed=42
    ).collect()
    assert sorted(map(tuple, prof)) == sorted(map(tuple, again))


def test_sequence_packing_conservation_and_caps(spark, sf_dir):
    """Packing invariants: every token of every doc lands in exactly one
    sequence, no sequence exceeds seq_len, full-chunk sequences are exactly
    seq_len, fill efficiency is high, and the assignment is deterministic."""
    from market_data_mining_project_spark.operators import packing as PK
    from market_data_mining_project_spark.operators import text as TXT

    L = 256  # small seq_len so the fixture corpus exercises chunking
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", TXT.bpe_ish_token_count(F.col("text")).alias("t")
    )
    truth = {r.doc_id: r.t for r in docs.collect() if r.t > 0}
    # buckets sized to the fixture (~50 docs): the operator's guidance is
    # buckets ~ docs/1e6 — the 64-bucket default is for real corpora, and
    # one-doc buckets cannot pack
    assigned = PK.pack_sequences(docs, "doc_id", "t", seq_len=L, buckets=4).collect()

    per_doc: dict = {}
    per_seq: dict = {}
    for r in assigned:
        per_doc[r.doc_id] = per_doc.get(r.doc_id, 0) + r.piece_tokens
        per_seq.setdefault(r.seq_id, []).append(r.piece_tokens)
    assert per_doc == truth, "token conservation violated"
    assert all(sum(v) <= L for v in per_seq.values()), "sequence overflow"
    for seq_id, v in per_seq.items():
        if seq_id.startswith("full#"):
            assert v == [L], "full chunks must fill their sequence exactly"

    # fill efficiency of the packed (non-full-chunk) sequences: FFD leaves
    # at most a tail of under-filled bins; demand a strong mean fill
    packed = [sum(v) for s, v in per_seq.items() if s.startswith("b")]
    assert packed, "fixture should produce packed sequences"
    mean_fill = sum(packed) / (L * len(packed))
    assert mean_fill >= 0.8, f"mean fill {mean_fill:.2f} too low"

    again = PK.pack_sequences(docs, "doc_id", "t", seq_len=L, buckets=4).collect()
    assert sorted(map(tuple, assigned)) == sorted(map(tuple, again))


def test_sequence_packing_stats_roundtrip(spark, sf_dir):
    from market_data_mining_project_spark.plans.llm_pipeline import q_sequence_packing

    stats = q_sequence_packing(spark, sf_dir).collect()
    assert stats
    assert all(0.0 < r.fill_ratio <= 1.0 for r in stats)
    assert all(r.n_pieces >= 1 for r in stats)


def test_mixture_plan_matches_recount(spark, sf_dir):
    """Exact driver recount of the mixture plan: uniform target, budget
    pinned by the scarcest source, rate = w*B/tokens capped at 1 epoch."""
    from market_data_mining_project_spark.operators import text as TXT
    from market_data_mining_project_spark.plans.llm_pipeline import q_mixture_plan

    docs = load_table(spark, sf_dir, "documents").select(
        "source", TXT.bpe_ish_token_count(F.col("text")).alias("t")
    )
    toks: dict = {}
    for r in docs.collect():
        toks[r.source] = toks.get(r.source, 0) + r.t
    w = 1.0 / len(toks)
    budget = min(t / w for t in toks.values())
    got = {r.source: r for r in q_mixture_plan(spark, sf_dir).collect()}
    assert set(got) == set(toks)
    for s, t in toks.items():
        assert got[s].tokens == t
        assert abs(got[s].weight - round(w, 6)) < 1e-9
        assert abs(got[s].sample_rate - round(w * budget / t, 6)) < 1e-9
        assert got[s].sample_rate <= 1.0 + 1e-9  # budget pinned: no upsampling
        assert got[s].expected_tokens == int(w * budget)
    # the scarcest source is sampled whole
    assert any(abs(r.sample_rate - 1.0) < 1e-6 for r in got.values())


def test_mixture_handles_null_source_end_to_end(spark):
    """A corpus mixing NULL and named sources must plan (None-safe sort in
    mixture_weights) AND keep its NULL-source token mass through
    apply_mixture (eqNullSafe plan join) — neither a TypeError nor a silent
    drop."""
    from market_data_mining_project_spark.operators import corpus as C

    docs = spark.createDataFrame(
        [(1, "web", 100), (2, "web", 50), (3, None, 80), (4, None, 40)],
        "doc_id int, source string, t int",
    )
    plan = C.mixture_weights(docs, "source", "t")
    rows = {r.source: r for r in plan.collect()}
    assert set(rows) == {"web", None}
    assert rows[None].tokens == 120 and rows["web"].tokens == 150
    # scarcest source (NULL, 120 tokens) is sampled whole
    assert abs(rows[None].sample_rate - 1.0) < 1e-9
    sampled = C.apply_mixture(docs, plan, "source", "doc_id", seed=1)
    kept_null = sampled.filter(F.col("source").isNull())
    assert kept_null.count() > 0, "NULL-source docs must survive the plan join"
    assert kept_null.agg(F.sum("t")).collect()[0][0] == 120


def test_leakage_free_folds_keep_near_dups_together(spark, sf_dir):
    """No ≥0.5-Jaccard near-dup pair may straddle folds, every doc gets
    exactly one fold, and fold ids live in [0, k)."""
    from market_data_mining_project_spark.operators import corpus as C

    docs = load_table(spark, sf_dir, "documents")
    pairs = D.ngram_jaccard_pairs(docs, "text", "doc_id", shingle_n=3, threshold=0.5)
    clusters = D.dup_clusters(pairs.select("doc_a", "doc_b"))
    folded = C.leakage_free_folds(docs.select("doc_id"), clusters, "doc_id", k=5)
    fold_of = {r.doc_id: r.fold for r in folded.collect()}
    assert len(fold_of) == docs.count()
    assert all(0 <= f < 5 for f in fold_of.values())
    crossing = [
        (r.doc_a, r.doc_b)
        for r in pairs.collect()
        if fold_of[r.doc_a] != fold_of[r.doc_b]
    ]
    assert not crossing, f"near-dup pairs straddle folds: {crossing[:5]}"
    # sanity: the fixture has clusters AND multiple folds are used
    assert clusters.count() > 0
    assert len(set(fold_of.values())) > 1


def test_incremental_ingest_admission_rules(spark, sf_dir):
    """Handcrafted batch against a real corpus: exact replays and near-dup
    replays are rejected, novel docs are admitted, and a batch-internal
    duplicate admits exactly one representative."""
    docs = load_table(spark, sf_dir, "documents")
    existing = docs
    some = docs.orderBy("doc_id").limit(1).collect()[0]
    novel = "zq xv wq kj pl mn bv cx dz fw gy hk jl"  # vocabulary disjoint
    batch_rows = [
        (100001, some.text),                        # exact replay -> reject
        (100002, some.text + " extrasuffixtoken"),  # near-dup replay -> reject
        (100003, novel),                            # novel -> admit
        (100004, novel),                            # internal exact dup -> one survives
        (100005, "aa bb cc dd ee ff gg hh ii jj"),  # novel -> admit
    ]
    incoming = spark.createDataFrame(batch_rows, ["doc_id", "text"])
    admitted = {
        r.doc_id
        for r in D.incremental_ingest(
            existing, incoming, "text", "doc_id", shingle_n=3, threshold=0.5
        ).collect()
    }
    assert 100001 not in admitted, "exact replay of the corpus must be rejected"
    assert 100002 not in admitted, "near-dup replay of the corpus must be rejected"
    assert 100005 in admitted
    # internal dup: exactly the min-id representative of the novel pair
    assert 100003 in admitted and 100004 not in admitted


def test_incremental_ingest_cache_gate_is_semantics_free(spark, sf_dir):
    """The adaptive batch-cache gate is a pure performance choice: forced
    cache / forced no-cache / auto all admit the same docs, and the auto
    gate SKIPS the cache below INGEST_CACHE_MIN_CORPUS_ROWS (the sf0.1
    regression regime) so no `ingest_batch` slot is pinned."""
    docs = load_table(spark, sf_dir, "documents")
    incoming = docs.filter(F.col("doc_id") % 10 == 0).selectExpr(
        "doc_id + 1000000 AS doc_id", "concat(text, ' novelsuffix ', doc_id) AS text"
    )
    existing = docs.filter(F.col("doc_id") % 10 != 0)

    def run(flag):
        return {
            r.doc_id
            for r in D.incremental_ingest(
                existing, incoming, "text", "doc_id", cache_batch=flag
            ).collect()
        }

    D._PINNED_CACHES.pop("ingest_batch", None)
    auto = run(None)
    # test corpora sit far below the gate: auto must not have pinned a slot
    assert existing.count() < D.INGEST_CACHE_MIN_CORPUS_ROWS
    assert "ingest_batch" not in D._PINNED_CACHES
    assert run(True) == auto == run(False)
    assert "ingest_batch" in D._PINNED_CACHES  # forced-True pinned the slot


def test_cross_jaccard_matches_symmetric_metric(spark, sf_dir):
    """The asymmetric probe must compute the SAME jaccard as the symmetric
    pair miner: flags for a (existing, incoming) split equal the symmetric
    pairs that straddle the split."""
    docs = load_table(spark, sf_dir, "documents")
    existing = docs.filter(F.col("doc_id") % 10 != 0)
    incoming = docs.filter(F.col("doc_id") % 10 == 0)
    flagged = {
        r.doc_id: r.best_jaccard
        for r in D.cross_jaccard_flags(
            existing, incoming, "text", "doc_id", shingle_n=3, threshold=0.5
        ).collect()
    }
    sym = D.ngram_jaccard_pairs(docs, "text", "doc_id", shingle_n=3, threshold=0.5).collect()
    want: dict = {}
    for r in sym:
        for new, old in ((r.doc_a, r.doc_b), (r.doc_b, r.doc_a)):
            if new % 10 == 0 and old % 10 != 0:
                want[new] = max(want.get(new, 0.0), r.jaccard)
    assert set(flagged) == set(want)
    for k, v in want.items():
        assert abs(flagged[k] - round(v, 6)) < 1e-9


# --- SemDeDup (semantic_dedup) ---------------------------------------------------


def _planted_vectors(spark):
    """12 deterministic 8-dim vectors: ids 0/5/9 identical (one dup group),
    ids 2/3 identical (a second group), the rest pseudo-random distinct."""
    import math

    rows = []
    for i in range(12):
        base = 9 if i in (0, 5, 9) else (3 if i in (2, 3) else i)
        v = [math.sin(0.7 * base * (d + 1)) + 0.1 * base for d in range(8)]
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_semantic_dedup_drops_planted_duplicates(spark):
    emb = _planted_vectors(spark)
    ann = {
        r.vec_id: (r.rep, r.keep)
        for r in SIM.semantic_dedup(
            emb, "embedding", "vec_id", threshold=0.999, n_cells=3, seed=42, n_blocks=2
        ).collect()
    }
    assert len(ann) == 12
    # identical vectors land in the same KMeans cell, so each planted group
    # keeps exactly its min id
    assert ann[0] == (0, True) and ann[5] == (0, False) and ann[9] == (0, False)
    assert ann[2] == (2, True) and ann[3] == (2, False)
    singles = set(range(12)) - {0, 5, 9, 2, 3}
    for i in singles:
        assert ann[i] == (i, True)


def test_semantic_dedup_equals_components_within_cells(spark, sf_dir):
    """semantic_dedup must reproduce EXACTLY the components of the global
    pair set restricted to same-cell pairs (reps = component min ids) —
    the operator's contract at any k."""
    emb = load_table(spark, sf_dir, "embeddings")
    ann = SIM.semantic_dedup(
        emb, "embedding", "vec_id", threshold=0.4, n_cells=2, seed=42, n_blocks=4
    )
    # global ground truth: all >=0.4 pairs -> components -> min-id reps,
    # restricted to same-cell pairs (the operator's contract)
    cells = {r.vec_id: r.cell for r in ann.collect()}
    pairs = [
        (r.id_a, r.id_b)
        for r in SIM.cosine_near_dups(emb, "embedding", "vec_id", threshold=0.4).collect()
        if cells[r.id_a] == cells[r.id_b]
    ]
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want_dropped = {x for x in parent if find(x) != x}
    got_dropped = {r.vec_id for r in ann.filter(~F.col("keep")).collect()}
    assert got_dropped == want_dropped
    for r in ann.collect():
        want_rep = find(r.vec_id) if r.vec_id in parent else r.vec_id
        assert r.rep == want_rep, f"vec {r.vec_id}: rep {r.rep} != {want_rep}"


def test_semantic_dedup_is_subset_of_global_threshold_dedup(spark, sf_dir):
    """Cell partitioning can only MISS pairs, never invent them: the drop
    set under k cells is a subset of the global-threshold drop set."""
    emb = load_table(spark, sf_dir, "embeddings")
    celled = {
        r.vec_id
        for r in SIM.semantic_dedup(
            emb, "embedding", "vec_id", threshold=0.4, n_cells=8, seed=42, n_blocks=4
        )
        .filter(~F.col("keep"))
        .collect()
    }
    pairs = SIM.cosine_near_dups(emb, "embedding", "vec_id", threshold=0.4).collect()
    non_minimal = set()
    neighbors: dict = {}
    for r in pairs:
        neighbors.setdefault(r.id_a, set()).add(r.id_b)
        neighbors.setdefault(r.id_b, set()).add(r.id_a)
    # global drop set = every vec with a smaller id reachable in its component
    seen = set()
    for start in neighbors:
        if start in seen:
            continue
        comp = {start}
        stack = [start]
        while stack:
            x = stack.pop()
            for y in neighbors.get(x, ()):
                if y not in comp:
                    comp.add(y)
                    stack.append(y)
        seen |= comp
        m = min(comp)
        non_minimal |= comp - {m}
    assert celled <= non_minimal
    assert celled, "expected at least one same-cell near-dup at threshold 0.4"


# --- apply_mixture ---------------------------------------------------------------


def test_apply_mixture_matches_exact_recount(spark, sf_dir):
    """Copy counts are deterministic, so a driver-side recount from the
    per-doc hash fraction must match the operator exactly — floor(rate)
    copies plus one iff hash_frac < frac(rate)."""
    import math

    from market_data_mining_project_spark.operators import corpus as C
    from market_data_mining_project_spark.operators import text as TXT

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", TXT.bpe_ish_token_count(F.col("text")).alias("t")
    )
    plan = C.mixture_weights(
        docs, "source", "t", target={"src0": 4.0, "src1": 1.0, "src2": 1.0},
        max_epochs=2.5,
    )
    rates = {r.source: r.sample_rate for r in plan.collect()}
    assert any(r > 1.0 for r in rates.values()), "fixture must exercise repetition"
    assert any(0.0 < r < 1.0 for r in rates.values()), "fixture must exercise downsampling"
    assert any(r == 0.0 for r in rates.values()), "fixture must exercise dropping"

    sampled = C.apply_mixture(docs, plan, "source", "doc_id", seed=42)
    got: dict = {}
    for r in sampled.collect():
        got[r.doc_id] = got.get(r.doc_id, 0) + 1
    # independent recount: the md5 fraction recomputed in PURE PYTHON
    # (hashlib), not by re-evaluating the Spark expression — a stronger
    # mirror than the pre-r12 same-engine xxhash64 standalone eval
    import hashlib

    fr = {
        r.doc_id: int(
            hashlib.md5(f"{r.doc_id}:42".encode()).hexdigest()[:8], 16
        )
        / 4294967296.0
        for r in docs.select("doc_id").collect()
    }
    src = {r.doc_id: r.source for r in docs.collect()}
    for d, s in src.items():
        rate = rates[s]
        want = math.floor(rate) + (1 if fr[d] < rate - math.floor(rate) else 0)
        assert got.get(d, 0) == want, f"doc {d}: {got.get(d, 0)} copies != {want}"
    # copy indices are 0..n-1 per doc
    per_doc_copies: dict = {}
    for r in sampled.collect():
        per_doc_copies.setdefault(r.doc_id, []).append(r.copy)
    for d, cps in per_doc_copies.items():
        assert sorted(cps) == list(range(len(cps)))


def test_apply_mixture_hits_expected_token_mass(spark, sf_dir):
    from market_data_mining_project_spark.operators import corpus as C
    from market_data_mining_project_spark.operators import text as TXT

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", TXT.bpe_ish_token_count(F.col("text")).alias("t")
    )
    plan = C.mixture_weights(
        docs, "source", "t", target={"src0": 4.0, "src1": 1.0, "src2": 1.0},
        max_epochs=2.5,
    )
    sampled = C.apply_mixture(docs, plan, "source", "doc_id", seed=42)
    kept = {
        r.source: r.k
        for r in sampled.groupBy("source").agg(F.sum("t").alias("k")).collect()
    }
    for p in plan.collect():
        if p.expected_tokens == 0:
            continue
        # hash-resolved fractional epochs: kept mass within 35% of the plan
        # on the small fixture (uniformity tightens with corpus size)
        assert abs(kept.get(p.source, 0) - p.expected_tokens) <= 0.35 * p.expected_tokens, (
            p.source, kept.get(p.source, 0), p.expected_tokens,
        )
    again = C.apply_mixture(docs, plan, "source", "doc_id", seed=42)
    assert sorted(map(tuple, sampled.collect())) == sorted(map(tuple, again.collect()))


# --- review-pass regression guards ----------------------------------------------


def test_minhash_excludes_empty_docs_from_banding(spark):
    """Empty/whitespace docs have all-null signatures — banding them would
    put every empty doc in one constant bucket per band (m²/2 zero-Jaccard
    candidate pairs). They must be excluded; real dups must still pair."""
    docs = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "\t\n"),
         (4, "alpha beta gamma delta epsilon zeta"),
         (5, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    pairs = {
        (r.doc_a, r.doc_b)
        for r in D.minhash_lsh_candidates(
            docs, "text", "doc_id", num_hashes=32, bands=8, shingle_n=3
        ).collect()
    }
    assert (4, 5) in pairs
    empty_ids = {1, 2, 3}
    assert not any(a in empty_ids or b in empty_ids for a, b in pairs)


def test_minhash_rejects_indivisible_bands(spark):
    docs = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    with pytest.raises(ValueError, match="must divide"):
        D.minhash_lsh_candidates(docs, "text", "doc_id", num_hashes=30, bands=8)


def test_self_join_caches_use_single_slot_lifecycle(spark):
    """The minhash/simhash self-join caches pin an intermediate frame in
    executor storage, and Spark's ContextCleaner never unpersists on Python
    GC — so call N must RELEASE call N−1's frame: a long-lived session pins
    at most one frame per operator, not one per call."""
    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma doc number {i} with shared tokens") for i in range(6)],
        "doc_id long, text string",
    )
    # the second call uses DIFFERENT input: identical plans share one
    # CacheManager entry (keyed on the canonicalized plan), so a same-input
    # second call would make the released frame still LOOK cached
    docs2 = docs.filter("doc_id < 4")
    D.minhash_lsh_candidates(docs, "text", "doc_id").count()
    first = D._PINNED_CACHES["minhash_banded"]
    assert first.storageLevel.useMemory
    D.minhash_lsh_candidates(docs2, "text", "doc_id").count()
    second = D._PINNED_CACHES["minhash_banded"]
    assert second is not first
    assert not first.storageLevel.useMemory, "previous call's cache must be released"
    assert second.storageLevel.useMemory

    D.simhash_near_dups(docs, "text", "doc_id").count()
    sig1 = D._PINNED_CACHES["simhash_sig"]
    D.simhash_near_dups(docs2, "text", "doc_id").count()
    assert not sig1.storageLevel.useMemory
    assert D._PINNED_CACHES["simhash_sig"].storageLevel.useMemory


def test_dup_clusters_raises_when_chain_exceeds_iteration_cap(spark):
    """A chain component needs ~diameter rounds; exhausting the cap with
    labels still moving must fail loudly, not silently split the group."""
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="still changing"):
        D.dup_clusters(chain, max_iterations=2, small_graph_edges=0)
    ok = {(r.doc, r.cluster) for r in D.dup_clusters(
        chain, max_iterations=20, small_graph_edges=0
    ).collect()}
    assert ok == {(i, 0) for i in range(9)}


def test_blocked_cosine_rejects_non_integer_ids(spark):
    df = spark.createDataFrame(
        [("a", [1.0, 0.0]), ("b", [0.0, 1.0])], "vec_id string, embedding array<double>"
    )
    with pytest.raises(TypeError, match="non-integer"):
        SIM.cosine_near_dups_blocked(df, "embedding", "vec_id")


def test_media_pipeline_survives_null_payload(spark):
    from market_data_mining_project_spark.operators import multimodal as MM

    df = spark.createDataFrame([(1, "hello bytes"), (2, None)], "doc_id long, text string")
    media = MM.attach_media(df, "doc_id", "text")
    feats = {r.media_id: (r.n_bytes, r.mean_byte) for r in MM.media_features(media).collect()}
    assert feats[1][0] == len("hello bytes") and feats[1][1] > 0
    assert feats[2] == (0, 0.0)
    frames = MM.frame_sample(media, every_n_chunks=1, chunk_size=4).collect()
    assert all(r.media_id != 2 for r in frames)
    assert any(r.media_id == 1 for r in frames)


def test_dup_clusters_pointer_doubling_converges_on_long_chains(spark):
    """Pointer doubling gives ~log-diameter convergence: a 200-edge chain
    resolves well inside 10 rounds (linear propagation would need 200)."""
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(200)], "doc_a long, doc_b long"
    )
    got = {(r.doc, r.cluster) for r in D.dup_clusters(
        chain, max_iterations=10, small_graph_edges=0
    ).collect()}
    assert got == {(i, 0) for i in range(201)}


def test_dup_clusters_local_path_matches_distributed(spark):
    """The driver-local union-find (small-edge gate) must return exactly
    the distributed min-label propagation's rows — chains, a triangle
    merging into one component, an isolated pair, and a self-loop."""
    edges = [(5, 6), (6, 7), (2, 9), (9, 3), (3, 2), (40, 41), (50, 50), (8, 1)]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    local = {(r.doc, r.cluster) for r in D.dup_clusters(pairs).collect()}
    dist = {(r.doc, r.cluster) for r in D.dup_clusters(
        pairs, small_graph_edges=0
    ).collect()}
    assert local == dist
    assert local == {(5, 5), (6, 5), (7, 5), (2, 2), (9, 2), (3, 2),
                     (40, 40), (41, 40), (50, 50), (8, 1), (1, 1)}


def test_first_fit_tree_matches_linear_scan():
    """The segment-tree first-fit must place every piece in EXACTLY the bin
    the naive lowest-index linear scan would pick — packing outputs are
    pinned by downstream determinism gates, so the O(log bins) structure
    must be a pure speedup, never a different packing."""
    from market_data_mining_project_spark.operators.packing import _FirstFit

    seq_len = 1024
    # deterministic pseudo-random piece sizes in [1, seq_len)
    pieces = [(1 + (i * 2654435761) % (seq_len - 1)) for i in range(3000)]
    ff = _FirstFit(seq_len)
    fills: list[int] = []
    for t in pieces:
        for b, f in enumerate(fills):  # the replaced naive scan
            if f + t <= seq_len:
                fills[b] = f + t
                want = b
                break
        else:
            fills.append(t)
            want = len(fills) - 1
        assert ff.place(t) == want
    assert ff.n_bins == len(fills)


def test_mixture_weights_zero_token_sources(spark):
    """A zero/NULL-token source must PLAN under the default target (weight-0
    row, no crash) and FAIL LOUDLY when explicitly targeted (it would pin
    the achievable budget at 0, silently zeroing every source's rate)."""
    from market_data_mining_project_spark.operators import corpus as C

    docs = spark.createDataFrame(
        [("a", None), ("a", None), ("b", 10), ("b", 30)],
        "source string, t int",
    )
    plan = {r.source: r for r in C.mixture_weights(docs, "source", "t").collect()}
    assert plan["a"].tokens == 0 and plan["a"].weight == 0.0 and plan["a"].sample_rate == 0.0
    assert plan["b"].tokens == 40 and plan["b"].sample_rate == 1.0

    with pytest.raises(ValueError, match="zero-token"):
        C.mixture_weights(docs, "source", "t", target={"a": 1.0, "b": 1.0})
    with pytest.raises(ValueError, match="no positively-weighted"):
        C.mixture_weights(docs.filter(F.col("source") == "a"), "source", "t")


def test_leakage_free_folds_tolerates_docs_cluster_column(spark):
    """A docs frame already carrying a 'cluster' column (natural in a dedup
    pipeline feeding this) must pass through untouched — the join side's
    cluster rides under a private name."""
    from market_data_mining_project_spark.operators import corpus as C

    docs = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "y")], "doc_id long, cluster string"
    )
    clusters = spark.createDataFrame([(2, 1)], "doc long, cluster long")
    out = {r.doc_id: (r.cluster, r.fold) for r in C.leakage_free_folds(docs, clusters, "doc_id").collect()}
    assert {k: v[0] for k, v in out.items()} == {1: "x", 2: "x", 3: "y"}
    # doc 2 hashes its cluster representative (doc 1's id), so both members
    # of the pair land in the same fold
    assert out[1][1] == out[2][1]


def test_blocked_cosine_equals_naive_exactly(spark, sf_dir):
    """Blocked == naive BIT-FOR-BIT, cos values included: the matmul is only
    the candidate filter (epsilon margin); emitted values come from the same
    left-fold arithmetic the naive path's F.aggregate uses, rounded by the
    same JVM F.round — BLAS summation order can no longer flip a rounded
    value or a threshold verdict."""
    emb = load_table(spark, sf_dir, "embeddings").limit(40)
    naive = {
        (r.id_a, r.id_b): r.cos
        for r in SIM.cosine_near_dups(emb, "embedding", "vec_id", threshold=0.2).collect()
    }
    blocked = {
        (r.id_a, r.id_b): r.cos
        for r in SIM.cosine_near_dups_blocked(
            emb, "embedding", "vec_id", threshold=0.2, n_blocks=4
        ).collect()
    }
    assert blocked == naive and naive, f"{len(naive)} naive vs {len(blocked)} blocked"


def test_assign_cells_keep_cols_pass_through(spark):
    """keep_cols ride the assignment scan on BOTH physical paths — the
    consumer no longer pays a corpus-sized join-back for a projected-away
    column (cluster_profile's label)."""
    rows = [(i, [float(i % 3), float(i % 5)], f"lab{i % 2}") for i in range(12)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, lab string")
    cents = [[0.0, 0.0], [2.0, 4.0]]
    got = SIM.assign_cells(df, cents, "embedding", "vec_id", keep_cols=("lab",))
    assert set(got.columns) == {"vec_id", "embedding", "cell", "lab"}
    assert {r.vec_id: r.lab for r in got.collect()} == {i: f"lab{i % 2}" for i in range(12)}
    with pytest.raises(ValueError, match="collide"):
        SIM.assign_cells(df, cents, "embedding", "vec_id", keep_cols=("cell",))
    # id_col in keep_cols would emit a DUPLICATE output column that only
    # fails at the consumer's first ambiguous reference — guard it too
    with pytest.raises(ValueError, match="collide"):
        SIM.assign_cells(df, cents, "embedding", "vec_id", keep_cols=("vec_id",))


def test_zero_norm_vectors_dropped_on_both_cosine_paths(spark):
    """Cosine is UNDEFINED for zero vectors (0/0 → NaN). Spark's total order
    sorts NaN above every double, so the naive path's `cos >= threshold`
    used to ADMIT those pairs while the blocked path's numpy admit (IEEE:
    NaN >= x is False) dropped them. Both paths now drop them — the last
    input class where blocked == naive could break."""
    rows = [
        (1, [1.0, 0.0]),
        (2, [0.9, 0.1]),
        (3, [0.0, 0.0]),  # zero norm: every pairing with it is NaN
        (4, [0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    naive = {(r.id_a, r.id_b) for r in SIM.cosine_near_dups(df, threshold=0.5).collect()}
    blocked = {
        (r.id_a, r.id_b)
        for r in SIM.cosine_near_dups_blocked(df, threshold=0.5, n_blocks=2).collect()
    }
    assert naive == blocked == {(1, 2)}


def test_capped_index_caches_use_single_slot_lifecycle(spark):
    """r9: the CAPPED shingle-index frames (jaccard pair miner + both
    cross-jaccard sides) take the same single-slot lifecycle as the
    minhash/simhash caches — call N frees call N−1's pinned frame. Inputs
    DIFFER between calls (Spark's CacheManager keys on the canonicalized
    plan, so a same-input recache would share the entry and mask a leak)."""
    docs1 = spark.createDataFrame(
        [(i, f"alpha beta gamma tok{i} delta") for i in range(6)],
        "doc_id long, text string",
    )
    docs2 = spark.createDataFrame(
        [(i, f"omega psi chi tok{i} phi") for i in range(6)],
        "doc_id long, text string",
    )
    D.ngram_jaccard_pairs(docs1, "text", "doc_id", max_shingle_df=100).collect()
    first = D._PINNED_CACHES["jaccard_capped_index"]
    assert first.storageLevel.useMemory
    D.ngram_jaccard_pairs(docs2, "text", "doc_id", max_shingle_df=100).collect()
    assert not first.storageLevel.useMemory, "call N must free call N-1's frame"
    assert D._PINNED_CACHES["jaccard_capped_index"].storageLevel.useMemory
    # the uncapped path pins its OWN slot (r10: the salted self-join reads
    # the index 4×, past the recompute-beats-cache point) and must not
    # disturb the capped slot
    before = D._PINNED_CACHES["jaccard_capped_index"]
    D.ngram_jaccard_pairs(docs1, "text", "doc_id").collect()
    assert D._PINNED_CACHES["jaccard_capped_index"] is before
    assert D._PINNED_CACHES["jaccard_uncapped_index"].storageLevel.useMemory
    first_uncapped = D._PINNED_CACHES["jaccard_uncapped_index"]
    D.ngram_jaccard_pairs(docs2, "text", "doc_id").collect()
    assert not first_uncapped.storageLevel.useMemory, "call N must free call N-1's frame"
    # cross-jaccard pins (and recycles) BOTH side slots
    D.cross_jaccard_flags(docs1, docs2, "text", "doc_id", max_shingle_df=100).collect()
    assert D._PINNED_CACHES["cross_jaccard_corpus_index"].storageLevel.useMemory
    assert D._PINNED_CACHES["cross_jaccard_batch_index"].storageLevel.useMemory


def test_salted_self_join_equals_plain_on_hot_shingles(spark, sf_dir):
    """r10: the exact-jaccard memory wall fix. A hot shingle (df > salt_rows)
    takes the square-law salted join (`_bounded_self_pairs`); the result must
    be ROW-IDENTICAL to the plain self-join — salting changes the
    partitioning of the pair enumeration, never its contents. Fixture plants
    one stopword shingle shared by EVERY doc (the skew shape that OOMed sf5
    at default heap) plus genuine near-dup pairs; salt_rows=4 forces the hot
    path on 40 docs, salt_rows=10**9 forces the plain path."""
    rows = [(i, f"the quick fox tok{i} alpha beta gamma") for i in range(34)]
    rows += [(100 + j, "the quick fox jumped over lazy dogs") for j in range(3)]
    rows += [(200 + j, "the quick fox leaped over lazy dogs") for j in range(3)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    def mine(salt):
        return sorted(
            (r.doc_a, r.doc_b, r.n_inter, r.sz_a, r.sz_b, r.jaccard)
            for r in D.ngram_jaccard_pairs(
                docs, "text", "doc_id", shingle_n=3, threshold=0.0, salt_rows=salt
            ).collect()
        )

    plain = mine(10**9)
    salted = mine(4)
    assert plain, "fixture must produce pairs"
    assert salted == plain
    # the planted hot shingle really exercised multi-salt buckets: with
    # df=40 and salt_rows=4, n_salt = ceil((40/4)^2) = 100 > 1
    assert len({p[:2] for p in plain}) == len(plain), "pairs must be unique"


def test_salted_join_hot_docs_pair_with_everyone(spark):
    """Every doc shares the hot shingle, so the candidate set must include
    ALL unordered pairs — the property the left-replication/right-bucket
    scheme must not lose (a pair is produced exactly once, in the RIGHT
    doc's salt bucket)."""
    docs = spark.createDataFrame(
        [(i, f"common shingle here tail{i}") for i in range(12)],
        "doc_id long, text string",
    )
    sh = docs.select(
        F.col("doc_id").alias("doc"),
        F.explode(D.shingles(F.col("text"), 3)).alias("sh"),
    )
    got = {
        (r.doc_a, r.doc_b)
        for r in D._bounded_self_pairs(sh, salt_rows=3).collect()
    }
    expected = {(a, b) for a in range(12) for b in range(12) if a < b}
    # "common shingle here" is in all 12 docs -> each pair shares exactly 1
    assert expected <= got
