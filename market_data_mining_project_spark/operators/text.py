"""Text-analysis operators for large-scale training-data pipelines.

Not in the reference (it is retail-analytics only) — added as first-class
engine capabilities per the build brief: language ID, quality scoring, token
counting, document fingerprinting. All are pure Catalyst column expressions
(no Python UDFs), so they run JVM-side inside whole-stage codegen and scale
linearly with no shuffle at all — the ideal 100 TB shape: one scan, one map.
The one exception is the CCNet-style char-ngram LM (:func:`char_ngram_lm` /
:func:`lm_nll_scores`), which is inherently corpus-statistical: one bounded
hash aggregate to estimate the (≤ charset^n)-row model, one broadcast join
to score — still no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..session import truncate_lineage

#: Tiny per-language stopword lists for the n-gram/stopword-ratio heuristic.
#: Deliberately small + deterministic; real deployments would broadcast a
#: bigger lexicon — the plan shape (scan → map) is identical.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "se", "no"],
    "fr": ["le", "la", "de", "et", "un", "est", "que", "en", "du", "les"],
    "de": ["der", "die", "das", "und", "ist", "in", "den", "von", "zu", "mit"],
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization (split on runs of whitespace, drop empties)."""
    return F.filter(F.split(F.trim(text), "\\s+"), lambda t: t != "")


def lower_tokens(text: Column) -> Column:
    """Lowercased whitespace tokens — THE shared tokenizer for the
    case-insensitive consumers (BM25 retrieval, BPE induction), so a
    tokenizer change here propagates to every one of them."""
    return tokens(F.lower(text))


def token_count(text: Column) -> Column:
    # NULL text counts 0 tokens: F.size(NULL) is -1 under Spark's default
    # legacy.sizeOfNull, and a -1 leaking into budget sums silently
    # inflates the remaining token budget by one per NULL doc
    return F.when(text.isNull(), F.lit(0)).otherwise(F.size(tokens(text)))


def char_count(text: Column) -> Column:
    return F.length(text)


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are not letters/digits/whitespace —
    UNICODE-aware (``\\p{L}\\p{N}``): the ASCII-only class penalized every
    accented character as punctuation, systematically downranking the
    es/fr/de documents this module's language ID explicitly supports, and
    counted tabs/newlines as punctuation."""
    stripped = F.regexp_replace(text, r"[\p{L}\p{N}\s]", "")
    return F.when(F.length(text) > 0, F.length(stripped) / F.length(text)).otherwise(0.0)


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    """Fraction of tokens that are stopwords of ``lang`` —
    case-insensitive (:func:`lower_tokens`): sentence-initial 'The' is the
    same stopword as 'the', so Title-Case prose must not undercount."""
    words = lower_tokens(text)
    hits = F.size(F.filter(words, lambda t: t.isin(STOPWORDS[lang])))
    return F.when(F.size(words) > 0, hits / F.size(words)).otherwise(0.0)


# PII patterns, ordered so earlier rewrites can't destroy later matches
# (emails before phones: an email's digits must not be phone-matched after
# the '@' is gone; URLs before emails would eat 'user@host' paths, so URLs
# go first).
_PII_PATTERNS = (
    ("<URL>", r"(?:https?://|www\.)[^\s<>\"']+"),
    ("<EMAIL>", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("<IP>", r"\b(?:\d{1,3}\.){3}\d{1,3}\b"),
    # ≥9 digits with only ()-. and SPACE separators: ISO dates, year
    # ranges and 8-digit integers (8 digits) no longer redact, and \s is
    # out of the class so digit runs can't merge across newlines into one
    # bogus match. 7-digit local numbers are missed by design —
    # "deliberately conservative" means prose survives.
    ("<PHONE>", r"(?<![\w.])\+?\(?\d(?:[()\-. ]*\d){8,}(?![\w.])"),
)


def redact_pii(text: Column) -> Column:
    """Replace URLs / emails / IPv4s / phone-shaped numbers with typed
    placeholder tokens — the standard scrub step before corpus text reaches
    training. Pure Catalyst ``regexp_replace`` chain: one scan, one map,
    whole-stage codegen, no UDF. Deliberately conservative patterns (a
    redactor that eats prose is worse than one that misses an exotic
    format); real deployments extend ``_PII_PATTERNS``."""
    out = text
    for token, pattern in _PII_PATTERNS:
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_counts(text: Column) -> Column:
    """Struct of per-category PII match counts (audit/reporting side of
    :func:`redact_pii`): how much the scrub would remove, without removing
    it. Each category is counted on the *progressively redacted* text
    (patterns 0..i-1 applied before counting pattern i) so the audit counts
    exactly what :func:`redact_pii`'s sequential chain redacts — counting on
    the raw text would double-count overlaps (every IPv4 also matches the
    phone pattern, but the chain redacts it as <IP> first, never <PHONE>).
    ``regexp_count`` / ``regexp_replace`` are Catalyst-native; the whole
    struct stays one codegen'd map."""
    cols = []
    staged = text
    for token, pattern in _PII_PATTERNS:
        cols.append(F.regexp_count(staged, F.lit(pattern)).alias(token.strip("<>").lower()))
        staged = F.regexp_replace(staged, pattern, token)
    return F.struct(*cols)


def word_bigrams(text: Column) -> Column:
    """All word bigrams of a document (non-distinct — frequencies matter).
    Docs with < 2 tokens yield an empty array.

    Built with ``zip_with`` over the token array and its own 1-shifted
    slice — one concat per element, no per-position sub-array allocation
    (a transform(sequence, i -> array_join(slice(...))) formulation
    allocates an array per gram inside interpreted HOF evaluation and
    measured ~4× slower on the sf0.1 corpus). zip_with pads the shorter
    side with null; concat_ws skips nulls, so the tail element has no
    space and the contains-filter drops it."""
    toks = tokens(text)
    shifted = F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0)))
    grams = F.zip_with(toks, shifted, lambda a, b: F.concat_ws(" ", a, b))
    return F.filter(grams, lambda g: g.contains(" "))


def top_bigram_fraction(text: Column) -> Column:
    """Gopher-style repetition signal: fraction of all word-bigram
    occurrences taken by the single most frequent bigram (Rae et al. 2021
    §A1.1 'duplicate n-grams' family — boilerplate and template spam score
    high, natural prose low).

    Computed as the longest equal-run in the SORTED bigram array via one
    ``aggregate`` pass — O(L log L) per doc, and the gram array is built
    and evaluated exactly ONCE (the element count rides in the aggregate
    state, so no second/third reference to the array exists — every extra
    reference re-evaluates the whole upstream chain, since Catalyst does
    not common-subexpression-eliminate across HOF arguments). The
    distinct×filter nested-lambda formulation this replaced re-evaluated
    the chain per distinct gram: measured 175× slower on the 5K-doc sf0.1
    corpus. Keep this one linear and single-reference."""
    grams = F.array_sort(word_bigrams(text))
    run_of = lambda acc, g: F.when(g == acc.prev, acc.run + 1).otherwise(F.lit(1))
    return F.aggregate(
        grams,
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
            F.lit(0).alias("n"),
        ),
        lambda acc, g: F.struct(
            g.alias("prev"),
            run_of(acc, g).alias("run"),
            F.greatest(acc.best, run_of(acc, g)).alias("best"),
            (acc.n + 1).alias("n"),
        ),
        lambda acc: F.when(
            acc.n > 0, F.round(acc.best.cast("double") / acc.n, 6)
        ).otherwise(F.lit(0.0)),
    )


def dup_token_ratio(text: Column) -> Column:
    """Fraction of token occurrences that are repeats of an earlier token —
    1 − distinct/total (the complement of the diversity term in
    :func:`quality_score`, exposed as its own audit column)."""
    toks = tokens(text)
    return F.when(
        F.size(toks) > 0,
        F.round(1.0 - F.size(F.array_distinct(toks)) / F.size(toks), 6),
    ).otherwise(0.0)


def quality_score(text: Column) -> Column:
    """Composite quality heuristic in [0, 1]: rewards reasonable length,
    low punctuation noise, and vocabulary diversity (distinct/total tokens).
    """
    n_tok = token_count(text)
    diversity = F.when(n_tok > 0, F.size(F.array_distinct(tokens(text))) / n_tok).otherwise(0.0)
    length_ok = F.when((n_tok >= 5) & (n_tok <= 10000), F.lit(1.0)).otherwise(F.lit(0.5))
    return F.round(length_ok * (1.0 - punct_ratio(text)) * (0.5 + diversity / 2), 6)


def token_budget_select_naive(
    df: DataFrame,
    group_col: str,
    score_col: str,
    tokens_col: str,
    id_col: str,
    budget: int,
) -> DataFrame:
    """Per-group token-budget selection, naive form: order each group by
    (score desc, id asc), running token cumsum, keep every doc whose
    PRE-inclusion total is under ``budget`` (so the budget may be exceeded
    by at most one document, never undershot while docs remain).

    SMALL-DATA BASELINE ONLY: the window sorts each whole group on one
    reducer — a per-language group at 100 TB is terabytes, so this shape
    does not scale. It exists as the exact ground truth for
    :func:`token_budget_select` (the same relationship exact all-pairs
    cosine has to the blocked/LSH paths)."""
    w = (
        Window.partitionBy(group_col)
        .orderBy(F.col(score_col).desc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pre = F.coalesce(F.sum(tokens_col).over(w), F.lit(0))
    return df.withColumn("__pre", pre).filter(F.col("__pre") < budget).drop("__pre")


def token_budget_select(
    df: DataFrame,
    group_col: str,
    score_col: str,
    tokens_col: str,
    id_col: str,
    budget: int,
    num_buckets: int = 1000,
    score_range: tuple[float, float] = (0.0, 1.0),
) -> DataFrame:
    """Scale-path token-budget selection: fill each group's token budget
    from the highest-scored documents down, WITHOUT sorting whole groups.

    The naive cumsum-window sorts every group on a single reducer; this
    two-phase plan stays bounded at any size:

    1. bucket each doc by score into ``num_buckets`` fixed-width bins; ONE
       map-side-combined aggregate yields the (group, bucket) token totals —
       a bounded |groups|×|buckets| matrix collected to the driver;
    2. per group, walk buckets from high score down until the budget
       crosses: buckets strictly above the boundary are kept whole (a pure
       filter — no sort, no shuffle); only the BOUNDARY bucket (≈1/num_buckets
       of the group) pays the exact (score desc, id asc) cumsum window, with
       the remaining budget from step 1.

    Document-for-document identical to the naive form whenever scores are
    deterministic (ties broken by id inside the boundary bucket; bucket
    boundaries only coarsen WHERE the window runs, not its result).
    ``score_range`` must bound the score column (quality scores live in
    [0, 1]); values at the top edge clamp into the last bucket.
    """
    lo, hi = score_range
    width = (hi - lo) / num_buckets
    bucket = F.least(
        F.lit(num_buckets - 1),
        F.greatest(F.lit(0), F.floor((F.col(score_col) - lo) / width)),
    ).cast("int")
    # materialize once: the totals collect, the keep-whole semi-join and
    # the boundary window all consume this frame, and the upstream profile
    # (repetition signals etc.) is too expensive to evaluate three times
    bucketed = df.withColumn("__bk", bucket).transform(truncate_lineage)
    totals = (
        bucketed.groupBy(group_col, "__bk")
        .agg(F.sum(tokens_col).alias("__tok"))
        .collect()  # bounded: |groups| × num_buckets rows
    )
    per_group: dict = {}
    for r in totals:
        # a cell whose docs all have NULL token counts sums to NULL —
        # treat as zero contribution rather than TypeError in the walk
        per_group.setdefault(r[group_col], {})[r["__bk"]] = r["__tok"] or 0
    keep_whole: list = []  # (group, min_bucket_exclusive)
    boundary: list = []  # (group, bucket, remaining_budget)
    for g, buckets in per_group.items():
        remaining = budget
        for bk in sorted(buckets, reverse=True):
            if remaining <= 0:
                break
            if buckets[bk] <= remaining:
                keep_whole.append((g, bk))
                remaining -= buckets[bk]
            else:
                boundary.append((g, bk, remaining))
                break
    spark = df.sparkSession
    # the driver frames carry the group column's REAL type (hardcoding
    # STRING breaks integer/date group keys), and the joins are
    # null-SAFE so a NULL group is budget-selected like any other
    gtype = df.schema[group_col].dataType.simpleString()
    whole_df = spark.createDataFrame(
        keep_whole or [(None, -1)], f"__g {gtype}, __wbk INT"
    )
    whole_cond = F.col(group_col).eqNullSafe(F.col("__g")) & (
        F.col("__bk") == F.col("__wbk")
    )
    kept_whole = bucketed.join(F.broadcast(whole_df), whole_cond, "left_semi")
    if boundary:
        bnd_df = spark.createDataFrame(
            boundary, f"__g {gtype}, __bbk INT, __rem BIGINT"
        )
        bnd_cond = F.col(group_col).eqNullSafe(F.col("__g")) & (
            F.col("__bk") == F.col("__bbk")
        )
        bnd_rows = bucketed.join(F.broadcast(bnd_df), bnd_cond).drop("__g", "__bbk")
        w = (
            Window.partitionBy(group_col)
            .orderBy(F.col(score_col).desc(), F.col(id_col).asc())
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        pre = F.coalesce(F.sum(tokens_col).over(w), F.lit(0))
        kept_boundary = (
            bnd_rows.withColumn("__pre", pre)
            .filter(F.col("__pre") < F.col("__rem"))
            .drop("__pre", "__rem")
        )
        kept = kept_whole.unionByName(kept_boundary)
    else:
        kept = kept_whole
    return kept.drop("__bk")


def _isin_pred(values: list[str]):
    # NB: returns an arity-1 lambda — F.filter dispatches on lambda arity
    # (two params would mean (element, index)), so defaults-based closures
    # must not add parameters.
    return lambda t: t.isin(values)


def detect_language(df: DataFrame, text_col: str = "text", out: str = "detected_lang") -> DataFrame:
    """Stopword-voting language ID: argmax over per-language hit counts,
    'und' (undetermined) when no stopwords hit. Hits are CASE-INSENSITIVE
    (:func:`lower_tokens` — Title-Case and ALL-CAPS prose must still
    vote; the SQL oracles lower their token lists identically). Hit-count
    ties break toward the lexicographically LARGEST language code
    (``array_max`` compares the (hits, lang) struct fieldwise, falling
    through to ``lang``) — the array order is irrelevant to
    ``array_max``, so the precedence lives entirely in that struct
    comparison and MUST stay in sync with the SQL oracles'
    fr ≥ es ≥ en ≥ de cascade."""
    words = lower_tokens(F.col(text_col))
    scored = F.array(
        *[
            F.struct(
                F.size(F.filter(words, _isin_pred(sw))).alias("hits"),
                F.lit(lg).alias("lang"),
            )
            for lg, sw in sorted(STOPWORDS.items())
        ]
    )
    best = F.array_max(scored)
    return df.withColumn(
        out, F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))
    )


#: BPE-ish pre-tokenization pattern (letter runs / digit runs / symbol runs),
#: kept RE2-compatible (no lookarounds) so the DuckDB oracle can run the
#: identical regex. Approximates a GPT-2-style pre-tokenizer's token count.
BPE_ISH_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]+"


def bpe_ish_token_count(text: Column) -> Column:
    """Token count under BPE-style pre-tokenization — the training-data
    budget number (whitespace counts undercount punctuation-heavy text).
    NULL text counts 0 (same sizeOfNull guard as :func:`token_count`)."""
    return F.when(text.isNull(), F.lit(0)).otherwise(
        F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), 0))
    )


def fingerprint(text: Column, n: int = 8) -> Column:
    """Document fingerprint: md5 over the sorted distinct token set's first
    ``n``-token prefix — a cheap rolling-hash-style content signature that is
    whitespace/duplication insensitive. Identical in DuckDB for oracling."""
    normalized = F.array_join(F.slice(F.array_sort(F.array_distinct(tokens(text))), 1, n), " ")
    return F.md5(normalized)


def _let_bound(col: Column, build) -> Column:
    """Let-bind ``col`` as a HOF lambda variable (the dedup._let_tokens
    idiom): references inside per-element lambdas become slot lookups
    instead of per-element re-evaluations of the upstream chain — Catalyst
    performs no CSE across a lambda boundary."""
    return F.get(F.transform(F.array(col), build), 0)


def char_ngrams(text: Column, n: int = 3) -> Column:
    """Positional character n-grams of the lowercased text (duplicates
    preserved — frequencies matter for LM estimation). Docs shorter than
    ``n`` chars yield an empty array (the trailing short substrings are
    length-filtered; the index sequence bottoms out at one element, never
    a descending sequence)."""

    def build(t):
        idx = F.sequence(F.lit(1), F.greatest(F.length(t) - (n - 1), F.lit(1)))
        grams = F.transform(idx, lambda i: t.substr(i, F.lit(n)))
        return F.filter(grams, lambda g: F.length(g) == n)

    return _let_bound(F.lower(text), build)


def char_ngram_lm(ref_docs: DataFrame, text_col: str, n: int = 3) -> tuple[DataFrame, int, int]:
    """Character n-gram language model estimated from a reference corpus —
    the CCNet/LLaMA-style quality filter's LM half (Wenzek et al. 2020
    train a LM on a trusted corpus and keep crawl docs whose perplexity is
    low). Returns ``(counts, total, vocab)``: the (gram, c) count frame and
    the scalar totals for add-one smoothing, so a gram's log-probability is
    ``ln((c + 1) / (total + vocab))`` — the SAME formula scores unseen
    grams with c = 0, which keeps scoring a single uniform expression.

    The count frame is one explode + hash aggregate; its size is bounded by
    the charset (≤ |alphabet|^n, ~20K for lowercase ASCII trigrams), so it
    broadcasts at any corpus scale — the model *estimation* scans the
    reference corpus once, the model itself is tiny."""
    grams = ref_docs.select(F.explode(char_ngrams(F.col(text_col), n)).alias("gram"))
    # materialize the bounded count table once: the totals collect below AND
    # the scoring join both consume it, and without this the reference-corpus
    # gram aggregation lineage would execute twice
    counts = (
        grams.groupBy("gram").agg(F.count(F.lit(1)).alias("c")).transform(truncate_lineage)
    )
    row = counts.agg(F.sum("c").alias("total"), F.count(F.lit(1)).alias("v")).collect()[0]
    return counts, int(row["total"] or 0), int(row["v"] or 0)


def lm_nll_scores(
    docs: DataFrame,
    lm_counts: DataFrame,
    total: int,
    vocab: int,
    text_col: str,
    id_col: str,
    n: int = 3,
) -> DataFrame:
    """Per-document mean negative log-likelihood under a
    :func:`char_ngram_lm` — low = reference-like text, high = out-of-domain
    / noise (the CCNet perplexity bucket signal). Shape: one explode, one
    broadcast join against the bounded gram table, one hash aggregate.
    Docs with no gram (shorter than ``n``) get ``lm_nll = 0.0`` and
    ``n_lm_grams = 0``. Returns (id, n_lm_grams, lm_nll)."""
    if total + vocab == 0:
        # empty reference corpus: no model — every doc scores 0 with its
        # gram count (callers see the degenerate LM rather than a div/0)
        return docs.select(
            F.col(id_col),
            F.size(char_ngrams(F.col(text_col), n)).cast("long").alias("n_lm_grams"),
            F.lit(0.0).alias("lm_nll"),
        )
    denom = float(total + vocab)
    g = docs.select(
        F.col(id_col), F.explode_outer(char_ngrams(F.col(text_col), n)).alias("gram")
    )
    joined = g.join(F.broadcast(lm_counts), "gram", "left")
    logp = F.log((F.coalesce(F.col("c"), F.lit(0)) + 1.0) / denom)
    return joined.groupBy(id_col).agg(
        F.count("gram").cast("long").alias("n_lm_grams"),
        F.round(
            F.coalesce(F.avg(F.when(F.col("gram").isNotNull(), -logp)), F.lit(0.0)), 4
        ).alias("lm_nll"),
    )


def lm_nll_py(ref_texts: list[str], texts: list[str], n: int = 3) -> list[float]:
    """Pure-Python reference implementation for pytest ground truth."""
    import math

    def grams(t: str):
        t = t.lower()
        return [t[i : i + n] for i in range(len(t) - n + 1)]

    counts: dict[str, int] = {}
    for t in ref_texts:
        for g in grams(t):
            counts[g] = counts.get(g, 0) + 1
    total, vocab = sum(counts.values()), len(counts)
    out = []
    for t in texts:
        gs = grams(t)
        if not gs:
            out.append(0.0)
            continue
        nll = sum(-math.log((counts.get(g, 0) + 1.0) / (total + vocab)) for g in gs)
        out.append(round(nll / len(gs), 4))
    return out


def text_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass per-document profile: tokens, chars, punct ratio, stopword
    ratio (en), quality score, Gopher-style repetition signals, fingerprint."""
    t = F.col(text_col)
    return df.select(
        "*",
        token_count(t).alias("n_tokens"),
        char_count(t).alias("n_chars_measured"),
        F.round(punct_ratio(t), 6).alias("punct_ratio"),
        F.round(stopword_ratio(t, "en"), 6).alias("stopword_ratio_en"),
        quality_score(t).alias("quality"),
        top_bigram_fraction(t).alias("top_bigram_fraction"),
        dup_token_ratio(t).alias("dup_token_ratio"),
        fingerprint(t).alias("fingerprint"),
    )


def document_chunks(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = 120,
    overlap: int = 30,
) -> DataFrame:
    """Split each document into fixed-width overlapping character chunks —
    the RAG/context-window splitter every training-data pipeline runs
    before embedding or packing. Pure Catalyst column math (no UDF, no
    shuffle: the explode is partition-preserving and chunk counts derive
    from ``length()`` alone):

    - stride = chunk_size − overlap; chunk *i* covers 1-based positions
      ``[1 + i·stride, i·stride + chunk_size]``; the last chunk may be
      short but (for non-empty texts) always starts inside the text and
      reaches its end, so chunks cover every character and adjacent
      chunks share exactly ``overlap`` characters (pytest conservation
      gates). An EMPTY text yields one zero-length chunk — a row per
      document survives, identically in both engines.
    - ``n_chunks = 1 + ceil((len − chunk_size)/stride)`` for texts longer
      than one chunk, computed with integer DIV (float ceil could differ
      cross-engine at exact multiples).
    - NULL texts are excluded (no content to chunk — documented, same
      contract as the other NULL-input operators).

    Output: (id, chunk_idx, chunk_start, chunk_len, chunk_md5) — the md5
    stands in for chunk text so oracles hash content without shipping it.
    """
    if not 0 <= overlap < chunk_size:
        raise ValueError(f"need 0 <= overlap < chunk_size, got {overlap}/{chunk_size}")
    stride = chunk_size - overlap
    t = F.col(text_col)
    # last chunk index = ceil((len − size)/stride) via integer DIV (no
    # float in the path) on a locally-aliased length column — the caller's
    # column name is never interpolated into SQL text, so quoted/nested
    # names keep working; 0 when the text fits in one chunk
    last_idx = F.when(F.col("__len") <= chunk_size, F.lit(0).cast("long")).otherwise(
        F.expr(f"CAST((__len - {chunk_size} + {stride - 1}) DIV {stride} AS LONG)")
    )
    exploded = (
        docs.filter(t.isNotNull())
        .withColumn("__len", F.length(t))
        .withColumn(
            "chunk_idx", F.explode(F.sequence(F.lit(0).cast("long"), last_idx))
        )
        .withColumn("chunk_start", (F.col("chunk_idx") * stride + 1).cast("long"))
    )
    chunk = F.substring(t, F.col("chunk_start").cast("int"), chunk_size)
    return exploded.select(
        F.col(id_col),
        "chunk_idx",
        "chunk_start",
        F.length(chunk).cast("long").alias("chunk_len"),
        F.md5(chunk).alias("chunk_md5"),
    )
