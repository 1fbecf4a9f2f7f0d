"""BPE tokenizer induction: the classic textbook example, encode/train
consistency, conservation, and the distributed corpus audit."""

from __future__ import annotations

from pyspark.sql import functions as F

from market_data_mining_project_spark.operators import tokenize as TOK
from market_data_mining_project_spark.sources.tables import load_table

# the Sennrich et al. 2016 §3.2 toy vocabulary
TOY = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]


def test_train_bpe_textbook_example():
    merges = TOK.train_bpe(TOY, num_merges=4)
    # counts: (e,s)=9 and (es,t)=9 and (est,</w>)=9 dominate, then (l,o)=7
    assert merges == [("e", "s"), ("es", "t"), ("est", TOK.EOW), ("l", "o")]


def test_train_bpe_deterministic_and_bounded():
    a = TOK.train_bpe(TOY, num_merges=50, min_pair_count=2)
    b = TOK.train_bpe(list(reversed(TOY)), num_merges=50, min_pair_count=2)
    assert a == b, "merge list must not depend on input order"
    # early stop: merges exhaust once every surviving pair is < min count
    assert len(a) < 50


def test_encode_word_matches_training_segmentation():
    """Greedy rank-ordered encoding must reproduce the segmentation the
    training loop left each training word in."""
    merges = TOK.train_bpe(TOY, num_merges=10)
    ranks = {p: i for i, p in enumerate(merges)}
    # replay training merges directly on each word
    for word, _ in TOY:
        sym = list(word) + [TOK.EOW]
        for a, b in merges:
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            sym = out
        assert TOK.encode_word(word, ranks) == sym, word
    # unseen word composed of seen parts
    assert "".join(TOK.encode_word("lowest", ranks)) == "lowest" + TOK.EOW


def test_bpe_segment_words_conserves_and_matches_python(spark):
    merges = TOK.train_bpe(TOY, num_merges=6)
    ranks = {p: i for i, p in enumerate(merges)}
    words = spark.createDataFrame(
        [("low",), ("lowest",), ("newest",), ("unseenzz",)], "word string"
    )
    got = {r.word: list(r.pieces) for r in TOK.bpe_segment_words(words, merges).collect()}
    assert set(got) == {"low", "lowest", "newest", "unseenzz"}, "no word may be dropped"
    for w, pieces in got.items():
        assert "".join(pieces) == w + TOK.EOW, "pieces must concatenate to the word"
        assert pieces == TOK.encode_word(w, ranks)


def test_bpe_corpus_stats_match_python_recount(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    merges = TOK.train_bpe_from_corpus(docs, "text", num_merges=30)
    row = TOK.bpe_corpus_stats(docs, "text", merges).collect()[0]
    # pure-Python recount from the word table
    wf = {r.word: r.freq for r in TOK.word_freq_table(docs, "text").collect()}
    ranks = {p: i for i, p in enumerate(merges)}
    enc = {w: TOK.encode_word(w, ranks) for w in wf}
    total_words = sum(wf.values())
    total_tokens = sum(len(enc[w]) * c for w, c in wf.items())
    pieces = {p for ps in enc.values() for p in ps}
    assert row.total_words == total_words
    assert row.total_bpe_tokens == total_tokens
    assert row.pieces_in_use == len(pieces)
    assert abs(row.tokens_per_word - round(total_tokens / total_words, 4)) < 1e-9
    # merging must COMPRESS: fewer tokens than the character baseline and
    # at least one token per word
    assert total_words <= total_tokens
    chars = sum((len(w) + 1) * c for w, c in wf.items())
    assert total_tokens < chars


def test_bpe_catalog_entry_shape(spark, sf_dir):
    import __spark_entry__ as entry_mod

    rows = entry_mod.queries()["bpe_tokenizer"](spark, sf_dir).collect()
    # merge budget is 2000; tiny fixtures exhaust pairs earlier — the
    # contract is a contiguous rank sequence, not a fixed count
    assert 0 < len(rows) <= 2000
    assert [r.rank for r in sorted(rows, key=lambda r: r.rank)] == list(range(len(rows)))
    for r in rows:
        assert r.merged == r.left + r.right
        assert r.tokens_per_word >= 1.0


def test_train_bpe_incremental_matches_naive_on_toy():
    """The heap/incremental trainer must be merge-for-merge identical to
    the textbook recount loop — same counts, same tie-breaks, same early
    stop — on the toy vocabulary at several budgets."""
    for budget in (1, 4, 10, 50):
        assert TOK.train_bpe(TOY, budget) == TOK.train_bpe_naive(TOY, budget), budget
    assert TOK.train_bpe(TOY, 50, min_pair_count=5) == TOK.train_bpe_naive(
        TOY, 50, min_pair_count=5
    )


def test_train_bpe_incremental_matches_naive_on_fixture_corpus(spark, sf_dir):
    """Merge-identity on the real fixture word table (hundreds of words,
    deep merge chains) — the gate that the incremental pair-count
    maintenance is exactly the naive recount."""
    wf = [
        (r.word, r.freq)
        for r in TOK.word_freq_table(load_table(spark, sf_dir, "documents"), "text").collect()
    ]
    assert TOK.train_bpe(wf, 200) == TOK.train_bpe_naive(wf, 200)


def test_word_freq_table_cap_is_noop_on_fixture(spark, sf_dir):
    """top_v larger than the fixture vocabulary must change NOTHING — the
    cap exists for web-scale tables, not to alter small-corpus training."""
    docs = load_table(spark, sf_dir, "documents")
    full = {(r.word, r.freq) for r in TOK.word_freq_table(docs, "text").collect()}
    capped = {
        (r.word, r.freq)
        for r in TOK.word_freq_table(docs, "text", top_v=200_000).collect()
    }
    assert capped == full
    # and a binding cap keeps exactly the top-V by (freq desc, word asc)
    k = min(10, len(full))
    expect = sorted(full, key=lambda wf: (-wf[1], wf[0]))[:k]
    got = TOK.word_freq_table(docs, "text", top_v=k).collect()
    assert sorted((r.word, r.freq) for r in got) == sorted(expect)


def test_word_freq_table_min_count_filters_inside_aggregate(spark):
    docs = spark.createDataFrame(
        [("a a a b b c",), ("a b d",)], "text string"
    )
    got = {r.word: r.freq for r in TOK.word_freq_table(docs, "text", min_count=2).collect()}
    assert got == {"a": 4, "b": 3}


def test_doc_bpe_token_counts_match_python_encoding(spark, sf_dir):
    """The join-back per-doc piece counts must equal encoding every doc's
    tokens directly with the pure-Python encoder."""
    docs = load_table(spark, sf_dir, "documents").limit(60)
    wf = TOK.word_freq_table(docs, "text")
    merges = TOK.train_bpe([(r.word, r.freq) for r in wf.collect()], 100)
    ranks = {p: i for i, p in enumerate(merges)}
    got = {
        r.doc_id: r.bpe_pieces
        for r in TOK.doc_bpe_token_counts(docs, "text", "doc_id", merges, wf).collect()
    }
    for row in docs.select("doc_id", "text").collect():
        toks = [t for t in row.text.lower().split() if t]
        want = sum(len(TOK.encode_word(w, ranks)) for w in toks)
        assert got[row.doc_id] == want, row.doc_id
    assert len(got) == 60, "every doc must appear, even zero-token ones"


def test_doc_bpe_token_counts_zero_token_and_unseen_words(spark):
    """Docs with no tokens count 0; words missing from the (capped) table
    fall back to character granularity (len + 1 end marker)."""
    docs = spark.createDataFrame(
        [(1, "low low newest"), (2, "   "), (3, "zzzq")],
        "doc_id int, text string",
    )
    # train/encode table deliberately EXCLUDES doc 3's word (a capped tail)
    wf = TOK.word_freq_table(docs.filter("doc_id = 1"), "text")
    merges = TOK.train_bpe([(r.word, r.freq) for r in wf.collect()], 10)
    got = {
        r.doc_id: r.bpe_pieces
        for r in TOK.doc_bpe_token_counts(docs, "text", "doc_id", merges, wf).collect()
    }
    assert got[2] == 0
    assert got[3] == len("zzzq") + 1
    ranks = {p: i for i, p in enumerate(merges)}
    assert got[1] == sum(len(TOK.encode_word(w, ranks)) for w in ["low", "low", "newest"])


def test_tokenized_export_conserves_pieces(spark, sf_dir):
    """End-to-end export audit: every BPE piece entering the packer comes
    out in exactly one sequence, no sequence exceeds the cap, and packing
    is reasonably tight."""
    import __spark_entry__ as entry_mod

    row = entry_mod.queries()["tokenized_export"](spark, sf_dir).collect()[0]
    assert row.docs_in > 0 and row.total_pieces > 0
    # conservation: zero-token docs contribute nothing; all other pieces land
    assert row.packed_pieces == row.total_pieces
    assert row.sequences_out >= row.total_pieces / 1024  # cap respected
    assert 0.0 < row.mean_fill_ratio <= 1.0
    assert row.full_sequences >= 0


def test_literal_eow_marker_words_are_excluded(spark):
    """A corpus token equal to (or containing) the literal '</w>' marker
    must not pollute training statistics — boundary-marker pair counts and
    literal-character pair counts are different symbols."""
    docs = spark.createDataFrame(
        [("low low </w> x</w>y newest",)], "text string"
    )
    wf = {r.word: r.freq for r in TOK.word_freq_table(docs, "text").collect()}
    assert "</w>" not in wf and "x</w>y" not in wf
    assert wf == {"low": 2, "newest": 1}
    # the defensive twin inside train_bpe skips them even when fed directly
    merges = TOK.train_bpe([("</w>", 100), ("low", 5)], num_merges=3)
    assert merges == TOK.train_bpe([("low", 5)], num_merges=3)
