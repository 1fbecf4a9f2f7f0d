"""Char-ngram LM perplexity signal (CCNet-style): pure-Python parity,
in-domain vs out-of-domain ordering, edge cases."""

from __future__ import annotations

from pyspark.sql import functions as F

from market_data_mining_project_spark.operators import text as TXT

REF = [
    "the quick brown fox jumps over the lazy dog",
    "the dog and the fox play in the park",
    "a lazy afternoon in the quiet park",
]
SCORE = [
    (0, "the fox and the dog in the park"),      # in-domain
    (1, "zzzzqqqq xxxxx wwww zzzz qqq"),          # out-of-domain noise
    (2, "the quick brown fox"),                   # in-domain substring
    (3, "ab"),                                    # shorter than a trigram
    (4, ""),                                      # empty
]


def _scores(spark):
    ref = spark.createDataFrame([(t,) for t in REF], "text string")
    docs = spark.createDataFrame(SCORE, "doc_id long, text string")
    counts, total, vocab = TXT.char_ngram_lm(ref, "text", n=3)
    out = TXT.lm_nll_scores(docs, counts, total, vocab, "text", "doc_id", n=3)
    return {r.doc_id: (r.n_lm_grams, r.lm_nll) for r in out.collect()}, total, vocab


def test_lm_nll_matches_python_reference(spark):
    got, total, vocab = _scores(spark)
    want = TXT.lm_nll_py(REF, [t for _, t in SCORE], n=3)
    for i, (_, text) in enumerate(SCORE):
        assert abs(got[i][1] - want[i]) < 1e-6, f"doc {i}: {got[i][1]} != {want[i]}"
        assert got[i][0] == max(len(text) - 2, 0)
    assert total > 0 and vocab > 0


def test_lm_nll_orders_in_domain_below_noise(spark):
    got, _, _ = _scores(spark)
    assert got[0][1] < got[1][1], "in-domain text must have lower NLL than noise"
    assert got[2][1] < got[1][1]


def test_lm_nll_edge_docs_are_zero(spark):
    got, _, _ = _scores(spark)
    assert got[3] == (0, 0.0)
    assert got[4] == (0, 0.0)


def test_char_ngrams_positional_and_short_doc(spark):
    df = spark.createDataFrame([("AbcAb",), ("xy",), ("",)], "text string")
    rows = df.select(TXT.char_ngrams(F.col("text"), 3).alias("g")).collect()
    assert rows[0].g == ["abc", "bca", "cab"]  # lowercased, positional
    assert rows[1].g == []
    assert rows[2].g == []


def test_catalog_text_profile_carries_lm_signal(spark, sf_dir):
    import __spark_entry__ as entry_mod

    df = entry_mod.queries()["text_profile"](spark, sf_dir)
    rows = df.collect()
    assert {"lm_nll", "n_lm_grams"} <= set(df.columns)
    assert all(r.lm_nll > 0 for r in rows), "every corpus doc has trigrams"
    # the LM is trained on the ground-truth-English slice: averaged over
    # the corpus, en docs must score at or below the non-en mean NLL
    en = [r.lm_nll for r in rows if r.lang == "en"]
    other = [r.lm_nll for r in rows if r.lang != "en"]
    assert en and other
    assert sum(en) / len(en) <= sum(other) / len(other) + 0.5


def test_lm_empty_reference_corpus_degenerates_to_zero(spark):
    ref = spark.createDataFrame([], "text string")
    docs = spark.createDataFrame(SCORE, "doc_id long, text string")
    counts, total, vocab = TXT.char_ngram_lm(ref, "text", n=3)
    assert (total, vocab) == (0, 0)
    out = {r.doc_id: (r.n_lm_grams, r.lm_nll) for r in
           TXT.lm_nll_scores(docs, counts, total, vocab, "text", "doc_id", n=3).collect()}
    assert all(v[1] == 0.0 for v in out.values())
    assert out[0][0] == len(SCORE[0][1]) - 2


def test_document_chunks_conservation(spark, sf_dir):
    """Chunking invariants on the real corpus: chunks cover every
    character, adjacent chunks overlap by exactly 30 chars, stripping the
    overlaps reassembles the original text byte-for-byte, and every
    chunk_md5 matches a locally recomputed md5 of the same slice."""
    import hashlib

    from market_data_mining_project_spark.operators.text import document_chunks
    from market_data_mining_project_spark.sources.tables import load_table

    docs = {r.doc_id: r.text for r in load_table(spark, sf_dir, "documents").collect()}
    rows = document_chunks(
        load_table(spark, sf_dir, "documents"), chunk_size=120, overlap=30
    ).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(docs)
    for doc_id, chunks in by_doc.items():
        text = docs[doc_id]
        chunks.sort(key=lambda r: r.chunk_idx)
        assert [c.chunk_idx for c in chunks] == list(range(len(chunks)))
        rebuilt = ""
        for c in chunks:
            piece = text[c.chunk_start - 1 : c.chunk_start - 1 + 120]
            assert c.chunk_len == len(piece)
            assert c.chunk_md5 == hashlib.md5(piece.encode()).hexdigest()
            rebuilt += piece if not rebuilt else piece[30:]
        assert rebuilt == text, doc_id
        # full coverage: last chunk reaches the end; starts inside the
        # text (an empty text would still emit one zero-length chunk at
        # start 1 — the documented per-document-row guarantee)
        last = chunks[-1]
        assert last.chunk_start - 1 + last.chunk_len == len(text)
        assert last.chunk_start <= max(1, len(text))


def test_document_chunks_short_and_null(spark):
    """A text shorter than one chunk yields exactly one chunk; NULL text
    rows are excluded by contract."""
    from market_data_mining_project_spark.operators.text import document_chunks

    df = spark.createDataFrame(
        [(1, "short"), (2, None), (3, "x" * 120), (4, "y" * 121), (5, "")],
        "doc_id long, text string",
    )
    got = {}
    for r in document_chunks(df, chunk_size=120, overlap=30).collect():
        got.setdefault(r.doc_id, []).append((r.chunk_idx, r.chunk_len))
    assert got == {
        1: [(0, 5)],
        3: [(0, 120)],
        4: [(0, 120), (1, 31)],
        5: [(0, 0)],  # empty text keeps its one-row-per-document guarantee
    }


def test_pii_phone_spares_dates_and_short_numbers(spark):
    """The phone pattern requires >= 9 digits with ()-. and SPACE
    separators only: ISO dates, year ranges and 8-digit integers survive
    redaction (a redactor that eats prose is worse than one missing an
    exotic format), real phone shapes still redact, and digit runs no
    longer merge across newlines."""
    rows = [
        (1, "released 2020-01-01 and revised"),
        (2, "the war of 1914-1918 ended"),
        (3, "order 12345678 shipped"),
        (4, "call (555) 123-4567 now"),
        (5, "intl +49 30 901820 11"),
        (6, "line one 1234\n5678 line two"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {r.id: r.red for r in df.select("id", TXT.redact_pii(F.col("text")).alias("red")).collect()}
    assert "<PHONE>" not in out[1] and "2020-01-01" in out[1]
    assert "1914-1918" in out[2]
    assert "12345678" in out[3]
    assert out[4] == "call <PHONE> now"
    assert "<PHONE>" in out[5]
    assert "<PHONE>" not in out[6]


def test_stopwords_and_language_id_are_case_insensitive(spark):
    """Sentence-initial 'The' votes like 'the'; Title-Case docs must not
    come back 'und' with a zero stopword ratio."""
    df = spark.createDataFrame(
        [(1, "The End. The Beginning. The Road."), (2, "xqz wvu klm")],
        "id long, text string",
    )
    lang = {r.id: r.detected_lang for r in TXT.detect_language(df).collect()}
    assert lang[1] == "en" and lang[2] == "und"
    ratio = {
        r.id: r.s
        for r in df.select("id", TXT.stopword_ratio(F.col("text")).alias("s")).collect()
    }
    assert ratio[1] > 0.4 and ratio[2] == 0.0


def test_punct_ratio_is_unicode_aware(spark):
    """Accented letters and whitespace are NOT punctuation: a clean French
    sentence scores near zero; real punctuation still counts."""
    df = spark.createDataFrame(
        [(1, "où est née l'élève déjà"), (2, "a b\nc\td"), (3, "!!!???")],
        "id long, text string",
    )
    got = {
        r.id: r.p
        for r in df.select("id", TXT.punct_ratio(F.col("text")).alias("p")).collect()
    }
    assert got[1] < 0.1, got[1]  # only the apostrophe
    assert got[2] == 0.0
    assert got[3] == 1.0


def test_token_counts_zero_on_null_text(spark):
    """F.size(NULL) is -1 under legacy sizeOfNull — a NULL doc must count
    0 tokens, not deflate budget sums."""
    df = spark.createDataFrame([(1, None), (2, "two words")], "id long, text string")
    got = {
        r.id: (r.t, r.b)
        for r in df.select(
            "id",
            TXT.token_count(F.col("text")).alias("t"),
            TXT.bpe_ish_token_count(F.col("text")).alias("b"),
        ).collect()
    }
    assert got[1] == (0, 0)
    assert got[2] == (2, 2)
