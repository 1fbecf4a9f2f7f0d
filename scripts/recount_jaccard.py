"""Independent sampled-pair recount for the exact-jaccard dedup at scale.

``dedup_reports``' DuckDB twin is infeasible above sf1 on this host (the
deliberately-uncapped exact self-join needs ~120 GB of temp against 79 GB
of disk), so the salted path's sf5 values were trusted, not checked. This
script closes that gap WITHOUT the quadratic twin — O(sample), no
self-join anywhere:

1. **Organic admission side**: run the operator
   (:func:`operators.dedup.ngram_jaccard_pairs`, the exact uncapped
   configuration ``dedup_reports`` uses) over the fixture corpus, sample
   ``N_PAIRS`` emitted pairs deterministically (the 100 with jaccard
   closest to the 0.5 threshold plus a hash-spread 100), pull just those
   documents' texts, and recount ``(n_inter, sz_a, sz_b, jaccard)`` with
   an INDEPENDENT pure-Python shingler (regex tokenize → set of word
   3-grams with the slice tail-clamp — reimplemented from the documented
   semantics, not imported from the operator).
2. **Planted near-threshold probes (both sides)**: for ``N_PROBES``
   sampled documents, plant two prefix probes each — the longest token
   prefix whose distinct-gram count keeps exact jaccard vs the source
   BELOW 0.5, and the shortest prefix reaching AT-OR-ABOVE 0.5 (adjacent
   prefixes, so both sit within one gram of the threshold — the sharpest
   probe the metric admits). A prefix's shingle set is a subset of the
   source's, so its exact jaccard is |S_k|/|S|, known in closed form
   before the engine runs. Above-probes MUST be emitted with exactly the
   predicted counts; below-probes MUST NOT pair with their source.

Admission uses the operator's documented round-then-filter contract
(ROUND_HALF_UP to 6dp, then >= threshold), replicated here with
``decimal`` so a probe landing on a rounding boundary is judged the same
way on both sides.

Run (the sf5 tier):

    python scripts/build_sf1.py  # SPARK_GRAFT_SCALE_COPIES=50 SPARK_GRAFT_SCALE_OUT=/tmp/mdmp_sf5
    SPARK_GRAFT_SF_DIR=/tmp/mdmp_sf5 python scripts/recount_jaccard.py

Prints one JSON line: sample sizes, mismatch counts (must all be 0), and
the max absolute jaccard delta over the recounted organic sample (must be
0.0 — both sides round to 6dp).
"""

from __future__ import annotations

import json
import os
import re
import sys
from decimal import ROUND_HALF_UP, Decimal

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_PAIRS = 200
N_PROBES = 200
THRESHOLD = 0.5
SHINGLE_N = 3


def py_shingles(text: str, n: int = SHINGLE_N) -> set[str]:
    """Independent reimplementation of the operator's shingle semantics:
    whitespace tokens, word n-grams at positions 0..max(m-n, 0) (the
    final partial gram of a short doc included via the tail clamp),
    distinct, empty-string grams dropped."""
    toks = [t for t in re.split(r"\s+", text or "") if t]
    if not toks:
        return set()
    return {" ".join(toks[i : i + n]) for i in range(max(len(toks) - n, 0) + 1)}


def round6(x: float) -> float:
    """The engine's ROUND(j, 6) — HALF_UP, like Spark/DuckDB, unlike
    Python's builtin banker's rounding."""
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP))


def admitted(n_inter: int, sz_a: int, sz_b: int) -> bool:
    return round6(n_inter / (sz_a + sz_b - n_inter)) >= THRESHOLD


def build_probes(doc_id: int, text: str, probe_base: int, idx: int):
    """Return (below_probe_row, above_probe_row, expectations) or None.

    Scans token prefixes of ``text``: k_above = the shortest prefix whose
    distinct-gram count s_k satisfies round6(s_k/s) >= 0.5, k_below = the
    prefix one token shorter (strictly below after rounding). Skips docs
    where either side doesn't exist (tiny docs, or duplicate grams making
    the ratio jump over the window)."""
    toks = [t for t in re.split(r"\s+", text or "") if t]
    m = len(toks)
    if m < 12:
        return None
    full = py_shingles(text)
    s = len(full)
    if s < 12:
        return None
    seen: set[str] = set()
    k_above = None
    for k in range(SHINGLE_N, m + 1):
        # grams of the k-token prefix: positions 0..max(k-n,0); adding
        # token k-1 adds at most one new position's gram (plus the clamp
        # gram when k < n, excluded by starting at k = n)
        i = k - SHINGLE_N
        seen.add(" ".join(toks[i : i + SHINGLE_N]))
        if k == m:
            break  # the full doc is not a probe
        if round6(len(seen) / s) >= THRESHOLD:
            k_above = k
            break
    if k_above is None or k_above <= SHINGLE_N:
        return None
    below_text = " ".join(toks[: k_above - 1])
    above_text = " ".join(toks[:k_above])
    below_set = py_shingles(below_text)
    above_set = py_shingles(above_text)
    # the prefix's own shingle set must be the subset we counted — if the
    # doc's text violates that (it can't, but guard the invariant the
    # whole construction rests on), skip rather than mis-assert
    if not (below_set <= full and above_set <= full):
        return None
    if admitted(len(below_set), len(below_set), s) or not admitted(
        len(above_set), len(above_set), s
    ):
        return None  # rounding boundary corner: probe isn't cleanly one-sided
    below_id = probe_base + 2 * idx
    above_id = probe_base + 2 * idx + 1
    row = lambda pid, t: (pid, t, "en", "probe", len(t))  # noqa: E731
    return (
        row(below_id, below_text),
        row(above_id, above_text),
        {
            "source": doc_id,
            "below_id": below_id,
            "above_id": above_id,
            "above_n_inter": len(above_set),
            "above_sz_probe": len(above_set),
            "sz_source": s,
            "above_jaccard": round6(len(above_set) / s),
        },
    )


def main() -> None:
    from pyspark.sql import functions as F

    from market_data_mining_project_spark.operators import dedup as D
    from market_data_mining_project_spark.session import get_spark
    from market_data_mining_project_spark.sources.tables import load_table

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/mdmp_sf5")
    spark = get_spark("jaccard-recount", **{"spark.ui.enabled": "false"})
    docs = load_table(spark, sf_dir, "documents")

    # --- plant probes -----------------------------------------------------
    probe_base = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    sources = (
        docs.filter(F.length("text") > 200)
        .orderBy(F.pmod(F.xxhash64("doc_id"), F.lit(1_000_003)), "doc_id")
        .limit(N_PROBES * 2)  # headroom: some docs yield no clean probe
        .select("doc_id", "text")
        .collect()
    )
    probe_rows, expectations = [], []
    for r in sources:
        built = build_probes(r.doc_id, r.text, probe_base, len(expectations))
        if built is None:
            continue
        below, above, exp = built
        probe_rows.extend([below, above])
        expectations.append(exp)
        if len(expectations) >= N_PROBES:
            break
    assert len(expectations) >= N_PROBES // 2, (
        f"only {len(expectations)} usable probe sources — fixture texts too short"
    )
    probes_df = spark.createDataFrame(
        probe_rows, "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
    )
    corpus = docs.select("doc_id", "text", "lang", "source", "n_chars").unionByName(
        probes_df
    )

    # --- one engine run over corpus + probes (organic pairs unaffected) ---
    pairs = D.ngram_jaccard_pairs(
        corpus, "text", "doc_id", shingle_n=SHINGLE_N, threshold=THRESHOLD
    )
    pairs.cache()

    probe_ids = {e["below_id"] for e in expectations} | {
        e["above_id"] for e in expectations
    }
    probe_pairs = {
        (r.doc_a, r.doc_b): r
        for r in pairs.filter(
            F.col("doc_b") >= probe_base  # probes hold the max ids
        ).collect()
        if r.doc_b in probe_ids
    }

    probe_fail = []
    for e in expectations:
        above = probe_pairs.get((e["source"], e["above_id"]))
        if above is None:
            probe_fail.append(f"above-probe for {e['source']} NOT emitted")
            continue
        if (
            above.n_inter != e["above_n_inter"]
            or above.sz_a != e["sz_source"]
            or above.sz_b != e["above_sz_probe"]
            or abs(above.jaccard - e["above_jaccard"]) > 1e-12
        ):
            probe_fail.append(
                f"above-probe for {e['source']}: engine "
                f"({above.n_inter},{above.sz_a},{above.sz_b},{above.jaccard}) != "
                f"predicted ({e['above_n_inter']},{e['sz_source']},"
                f"{e['above_sz_probe']},{e['above_jaccard']})"
            )
        if (e["source"], e["below_id"]) in probe_pairs:
            probe_fail.append(f"below-probe for {e['source']} WAS emitted")

    # --- organic sample: near-threshold 100 + hash-spread 100 -------------
    organic = pairs.filter(F.col("doc_b") < probe_base)
    near = organic.orderBy("jaccard", "doc_a", "doc_b").limit(N_PAIRS // 2).collect()
    spread = (
        organic.orderBy(F.pmod(F.xxhash64("doc_a", "doc_b"), F.lit(1_000_003)), "doc_a")
        .limit(N_PAIRS // 2)
        .collect()
    )
    sample = {(r.doc_a, r.doc_b): r for r in near + spread}
    need_ids = sorted({i for ab in sample for i in ab})
    texts = dict(
        docs.filter(F.col("doc_id").isin(need_ids)).select("doc_id", "text").collect()
    )
    organic_fail, max_delta = [], 0.0
    for (a, b), r in sample.items():
        sa, sb = py_shingles(texts[a]), py_shingles(texts[b])
        n_inter = len(sa & sb)
        j = round6(n_inter / (len(sa) + len(sb) - n_inter))
        max_delta = max(max_delta, abs(j - r.jaccard))
        if (
            n_inter != r.n_inter
            or len(sa) != r.sz_a
            or len(sb) != r.sz_b
            or abs(j - r.jaccard) > 1e-12
            or j < THRESHOLD
        ):
            organic_fail.append(
                f"pair ({a},{b}): engine ({r.n_inter},{r.sz_a},{r.sz_b},{r.jaccard})"
                f" != recount ({n_inter},{len(sa)},{len(sb)},{j})"
            )

    for msg in (probe_fail + organic_fail)[:20]:
        print(f"[recount] MISMATCH: {msg}", flush=True)
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "organic_pairs_checked": len(sample),
                "organic_mismatches": len(organic_fail),
                "max_abs_jaccard_delta": max_delta,
                "probe_sources": len(expectations),
                "probe_mismatches": len(probe_fail),
                "ok": not (probe_fail or organic_fail),
            }
        )
    )
    sys.exit(1 if (probe_fail or organic_fail) else 0)


if __name__ == "__main__":
    main()
