"""BPE tokenizer induction over a corpus — the vocabulary-training step
between corpus prep and tokenized export (Sennrich et al. 2016; the GPT-2 /
HF-tokenizers training shape).

The scale structure is the standard one: BPE statistics depend only on the
WORD FREQUENCY TABLE, not on the raw corpus — so one distributed scan
reduces 100 TB of text to a word table BOUNDED INSIDE THE AGGREGATION
(``min_count`` filter + ``top_v`` TakeOrderedAndProject: web-scale corpora
have 10⁸–10⁹ distinct whitespace tokens, so the cap, not hope, is what
makes the driver collect safe), and the merge loop runs on that table
driver-side, cost independent of corpus size (exactly how HF tokenizers
train: pre-tokenize → count → merge loop on counts — and like HF the loop
is INCREMENTAL: per merge only pair-containing words update, off a
lazy-deletion heap). Applying a trained tokenizer back to the corpus is
embarrassingly parallel: the merge ranks broadcast (they are the model,
≤ num_merges rows) and each Arrow batch encodes independently — BPE's
greedy merge loop is not expressible in Catalyst, so this is a legitimate
Pandas-UDF hot path (the same justification as the blocked matmul).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: End-of-word marker. A corpus token CAN contain this literal string
#: (markup fragments survive whitespace tokenization), and a marker that
#: collides with corpus symbols would pool boundary-position and
#: literal-character pair statistics into one count — so every entry point
#: EXCLUDES marker-bearing words from training/encoding instead of
#: silently conflating them (they are vanishingly rare and a tokenizer
#: trained without them is still correct for them at inference: they
#: simply stay at character granularity).
EOW = "</w>"


def word_freq_table(
    docs: DataFrame,
    text_col: str,
    min_count: int = 1,
    top_v: int | None = None,
) -> DataFrame:
    """(word, freq) over lowercased whitespace tokens — ONE corpus scan +
    one hash aggregate; the frame BPE trains on. Words containing the
    literal ``EOW`` marker are excluded (see the marker note above).

    ``min_count``/``top_v`` bound the table BEFORE it ever reaches the
    driver — the cap that makes driver-side training safe at web scale,
    where distinct whitespace tokens run 10⁸–10⁹ (URLs, numbers, typos)
    and an uncapped collect OOMs the driver. ``min_count`` filters the
    aggregate (a long tail of hapax tokens contributes ~nothing to pair
    statistics; HF tokenizers expose the same dial); ``top_v`` keeps the
    V highest-frequency words via a TakeOrderedAndProject (freq desc,
    word asc — deterministic), never a global sort."""
    from market_data_mining_project_spark.operators.text import lower_tokens

    wf = (
        docs.select(F.explode(lower_tokens(F.col(text_col))).alias("word"))
        .filter(~F.col("word").contains(EOW))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    return cap_word_table(wf, min_count=min_count, top_v=top_v)


def cap_word_table(
    wf: DataFrame, min_count: int = 1, top_v: int | None = None
) -> DataFrame:
    """THE word-table cap rule — one definition so the determinism-bearing
    (freq desc, word asc) ordering can't drift between the operator and
    callers capping an already-materialized table."""
    if min_count > 1:
        wf = wf.filter(F.col("freq") >= min_count)
    if top_v is not None:
        wf = wf.orderBy(F.col("freq").desc(), F.col("word").asc()).limit(top_v)
    return wf


def _merge_word(sym: list[str], a: str, b: str) -> list[str]:
    """Left-to-right non-overlapping replacement of adjacent (a, b) with
    their concatenation — THE segmentation-update rule, shared by the naive
    and incremental trainers so their counts can never diverge."""
    merged = a + b
    new: list[str] = []
    i = 0
    while i < len(sym):
        if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
            new.append(merged)
            i += 2
        else:
            new.append(sym[i])
            i += 1
    return new


def train_bpe_naive(
    word_freqs: list[tuple[str, int]], num_merges: int, min_pair_count: int = 2
) -> list[tuple[str, str]]:
    """Textbook BPE merge learning: recount EVERY pair over EVERY word per
    round — O(num_merges × table size). The exact ground truth
    :func:`train_bpe` is pytest-pinned against; too slow for a real 32K
    merge budget, which is why the incremental trainer exists."""
    words: dict[tuple[str, ...], int] = {}
    for w, c in word_freqs:
        if EOW in w:  # defensive twin of word_freq_table's exclusion
            continue
        words[tuple(w) + (EOW,)] = words.get(tuple(w) + (EOW,), 0) + int(c)
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, c in words.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        (a, b), _ = best
        merges.append((a, b))
        out: dict[tuple[str, ...], int] = {}
        for sym, c in words.items():
            key = tuple(_merge_word(list(sym), a, b))
            out[key] = out.get(key, 0) + c
        words = out
    return merges


def train_bpe(
    word_freqs: list[tuple[str, int]], num_merges: int, min_pair_count: int = 2
) -> list[tuple[str, str]]:
    """Classic BPE merge learning over a word-frequency table — INCREMENTAL
    (the HF-tokenizers trainer shape): pair counts are maintained as words
    re-segment, so each merge touches only the words that CONTAIN the
    merged pair instead of rescanning the whole table. The best pair comes
    off a lazy-deletion max-heap keyed (count desc, pair asc) — identical
    selection order to :func:`train_bpe_naive` (pytest-pinned), at
    O(updates × log heap) instead of O(num_merges × table size); a real
    32K-merge budget over a million-word table is minutes, not days.

    Deterministic: integer pair counts are exactly the naive recount (the
    per-word delta is subtract-old-adjacencies / add-new-adjacencies under
    the shared :func:`_merge_word` rule), ties break lexicographically.
    Stops early when no pair reaches ``min_pair_count``. Words are symbol
    tuples ending in ``</w>`` so merges never cross word boundaries.

    Driver-side by design (see module docstring): the input is the bounded
    (``min_count``/``top_v``-capped) aggregate, not the corpus.
    """
    import heapq

    agg: dict[tuple[str, ...], int] = {}
    for w, c in word_freqs:
        if EOW in w:  # defensive twin of word_freq_table's exclusion
            continue
        key = tuple(w) + (EOW,)
        agg[key] = agg.get(key, 0) + int(c)
    syms: list[list[str]] = [list(k) for k in agg]
    freqs: list[int] = list(agg.values())

    pair_counts: dict[tuple[str, str], int] = {}
    # word ids whose segmentation has EVER contained the pair — cleaned
    # lazily (a stale id is skipped by the contains-check at merge time),
    # so decrements never need to know whether other occurrences remain
    pair_words: dict[tuple[str, str], set[int]] = {}
    for wid, sym in enumerate(syms):
        c = freqs[wid]
        for p in zip(sym, sym[1:]):
            pair_counts[p] = pair_counts.get(p, 0) + c
            pair_words.setdefault(p, set()).add(wid)

    # lazy-deletion heap: every count CHANGE pushes a fresh entry; a popped
    # entry is acted on only if it matches the pair's current count, so the
    # first valid pop is the true (count desc, pair asc) maximum
    heap: list[tuple[int, tuple[str, str]]] = [
        (-c, p) for p, c in pair_counts.items()
    ]
    heapq.heapify(heap)

    merges: list[tuple[str, str]] = []
    while len(merges) < num_merges and heap:
        negc, best = heapq.heappop(heap)
        cur = pair_counts.get(best, 0)
        if cur != -negc or cur <= 0:
            continue  # stale entry — the pair's count has moved since push
        if cur < min_pair_count:
            break
        a, b = best
        merges.append(best)
        touched: dict[tuple[str, str], int] = {}
        for wid in pair_words.pop(best, ()):  # only words containing the pair
            sym = syms[wid]
            has = any(
                sym[i] == a and sym[i + 1] == b for i in range(len(sym) - 1)
            )
            if not has:  # stale membership from an earlier re-segmentation
                continue
            new = _merge_word(sym, a, b)
            c = freqs[wid]
            for p in zip(sym, sym[1:]):
                pair_counts[p] -= c
                touched[p] = pair_counts[p]
            for p in zip(new, new[1:]):
                pair_counts[p] = pair_counts.get(p, 0) + c
                touched[p] = pair_counts[p]
                pair_words.setdefault(p, set()).add(wid)
            syms[wid] = new
        pair_counts.pop(best, None)  # every adjacency was just consumed
        touched.pop(best, None)
        for p, c in touched.items():
            if c > 0:
                heapq.heappush(heap, (-c, p))
            else:
                pair_counts.pop(p, None)
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy BPE encoding of one word under trained merge ranks (lowest
    rank merges first — the standard inference rule)."""
    sym = list(word) + [EOW]
    while len(sym) > 1:
        best_i, best_rank = -1, None
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_i, best_rank = i, r
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def train_bpe_from_corpus(
    docs: DataFrame,
    text_col: str,
    num_merges: int,
    min_pair_count: int = 2,
    min_count: int = 1,
    top_v: int | None = 1_000_000,
) -> list[tuple[str, str]]:
    """End-to-end training: distributed word count (capped inside the
    aggregation — the driver only ever sees ≤ ``top_v`` rows, whatever the
    corpus size), driver-side incremental merge loop."""
    rows = word_freq_table(docs, text_col, min_count=min_count, top_v=top_v).collect()
    return train_bpe([(r.word, r.freq) for r in rows], num_merges, min_pair_count)


def bpe_segment_words(
    words: DataFrame, merges: list[tuple[str, str]], word_col: str = "word"
) -> DataFrame:
    """Segment each distinct word under the trained merges (Arrow-batched;
    the merge table broadcasts as a closure constant — it IS the model).
    Returns the input plus ``pieces array<string>`` and ``n_pieces``.
    Corpus-wide token counts then come from joining this bounded frame back
    to the word-frequency table — the corpus is never re-encoded row by
    row."""
    import pandas as pd
    from pyspark.sql.pandas.functions import pandas_udf

    ranks = {pair: i for i, pair in enumerate(merges)}

    def _enc(col):
        return pd.Series([encode_word(w, ranks) for w in col])

    _enc.__annotations__ = {"col": pd.Series, "return": pd.Series}
    enc = pandas_udf(_enc, "array<string>")
    out = words.withColumn("pieces", enc(F.col(word_col)))
    return out.withColumn("n_pieces", F.size("pieces"))


def doc_bpe_token_counts(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    merges: list[tuple[str, str]],
    word_freqs: DataFrame | None = None,
) -> DataFrame:
    """Per-document REAL BPE piece counts WITHOUT re-encoding the corpus:
    the bounded DISTINCT-word table is encoded once (Arrow,
    :func:`bpe_segment_words`), then joined back to the corpus token
    stream and hash-aggregated per document — the export-time twin of
    :func:`bpe_corpus_stats`' never-re-encode-row-by-row shape. No join
    hint: AQE broadcasts the word table while it fits (fixtures, capped
    deployments) and falls back to a shuffle join on ``word`` when a
    web-scale distinct-word table outgrows the threshold.

    Words absent from ``word_freqs`` (the ``EOW``-marker exclusion, or an
    out-of-cap tail when the caller capped the table) count at character
    granularity (len + 1 for the end marker) — the documented convention
    for marker words, and the deliberate trade a capped deployment makes.
    Docs with zero tokens get count 0 (left join back to the id set).
    Returns (id, bpe_pieces).
    """
    from market_data_mining_project_spark.operators.text import lower_tokens

    wf = word_freqs if word_freqs is not None else word_freq_table(docs, text_col)
    seg = bpe_segment_words(wf, merges).select("word", "n_pieces")
    toks = docs.select(
        F.col(id_col), F.explode(lower_tokens(F.col(text_col))).alias("word")
    )
    joined = toks.join(seg, "word", "left")
    n = F.coalesce(F.col("n_pieces"), F.length("word") + F.lit(1))
    counts = joined.groupBy(id_col).agg(F.sum(n).cast("long").alias("bpe_pieces"))
    return (
        docs.select(id_col)
        .join(counts, id_col, "left")
        .fillna({"bpe_pieces": 0})
    )


def bpe_corpus_stats(
    docs: DataFrame,
    text_col: str,
    merges: list[tuple[str, str]],
    word_freqs: DataFrame | None = None,
) -> DataFrame:
    """One-row corpus tokenization audit under a trained BPE: total words,
    total BPE tokens, tokens-per-word, distinct piece vocabulary actually
    used. The encode runs over the DISTINCT-WORD table (bounded), weighted
    back by frequency — never over the raw corpus. Pass ``word_freqs``
    (an already-materialized :func:`word_freq_table` frame) to avoid
    re-scanning the corpus — the frame is referenced twice below, so
    callers that just trained on it should hand over the checkpointed
    copy."""
    wf = word_freqs if word_freqs is not None else word_freq_table(docs, text_col)
    exploded = bpe_segment_words(wf, merges).select(
        "freq", F.explode("pieces").alias("piece")
    )
    # each word's freq appears once per piece → sum(freq) IS the corpus BPE
    # token total; the distinct-piece count stays a hash aggregate (never a
    # single-reducer collect_list)
    tok_stats = exploded.agg(
        F.sum("freq").alias("total_bpe_tokens"),
        F.countDistinct("piece").alias("pieces_in_use"),
    )
    word_stats = wf.agg(F.sum("freq").alias("total_words"))
    return tok_stats.crossJoin(F.broadcast(word_stats)).select(
        "total_words",
        "total_bpe_tokens",
        F.round(F.col("total_bpe_tokens") / F.col("total_words"), 4).alias(
            "tokens_per_word"
        ),
        "pieces_in_use",
    )
