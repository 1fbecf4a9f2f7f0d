"""Sequence packing — assembling documents into fixed-length training
sequences (the step between token counting / budget selection and the
tokenized training-set export; every LLM pre-training pipeline packs to
amortize padding, e.g. the T5/GPT "packing" described in Raffel et al.
2020 §3.1.2 and the fill-ratio trade-offs of Krell et al. 2021).

Packing is a bin-packing problem; the distributed shape used here is the
standard one at corpus scale:

- documents LONGER than the sequence length are split into full chunks
  (each exactly one perfectly-filled sequence — no packing decision to
  make) plus a remainder piece that joins the packing pool. Pure column
  math + one ``explode``.
- the pool (every piece < seq_len) is hash-bucketed; each bucket is packed
  independently with first-fit-decreasing (FFD) inside one Arrow batch
  (``applyInPandas``). FFD is sequential by nature — the parallelism axis
  is the bucket, not the document, and bucket-local packing costs only a
  bounded fill-ratio loss vs global packing (each bucket leaves at most
  one under-filled open bin per fill level; with thousands of docs per
  bucket the waste is noise — Krell et al.'s near-optimality argument).
  Buckets are keyed by a DETERMINISTIC hash of the id (never
  ``spark_partition_id``), so the packing — and the test suite's recount —
  is stable across runs and cluster layouts.

At 100 TB: one scan, one explode, one shuffle on the bucket key, one Arrow
pass per bucket. No driver-side state; the FFD working set is one bucket's
(id, tokens) pairs, bounded by choosing ``buckets`` ~ corpus_docs / 1e6.
The default bucket count is a fixed constant — deriving it from the
cluster's parallelism would make bucket membership (and therefore the
packing) depend on the machine that ran the job, breaking the
reproducible-export contract above.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class _FirstFit:
    """Leftmost-open-bin-that-fits in O(log bins): a max-segment-tree over
    per-bin remaining capacity, grown by doubling. The descent always
    prefers the LEFT child, so placements are bit-identical to the naive
    linear first-fit scan — at any scale. The linear scan this replaces
    was O(pieces x open bins) pure Python per bucket: at the module's own
    ~1e6-pieces-per-bucket operating point that is ~1e11 iterations, i.e.
    the job never finishes; this is ~2e7."""

    def __init__(self, seq_len: int):
        self.seq_len = seq_len
        self.size = 1
        self.tree = [0, 0]  # root at 1, leaves at [size, 2*size)
        self.n_bins = 0

    def _grow(self) -> None:
        old = self.size
        self.size = old * 2
        tree = [0] * (2 * self.size)
        tree[self.size : self.size + old] = self.tree[old : 2 * old]
        for i in range(self.size - 1, 0, -1):
            tree[i] = max(tree[2 * i], tree[2 * i + 1])
        self.tree = tree

    def _set(self, leaf: int, val: int) -> None:
        i = self.size + leaf
        self.tree[i] = val
        i //= 2
        while i:
            self.tree[i] = max(self.tree[2 * i], self.tree[2 * i + 1])
            i //= 2

    def place(self, t: int) -> int:
        """Bin index piece ``t`` (>0) lands in, opening a new bin if no
        open bin fits. Unopened leaves hold capacity 0, so t > 0 can never
        descend into one."""
        if self.tree[1] >= t:
            i = 1
            while i < self.size:
                i *= 2
                if self.tree[i] < t:
                    i += 1
            leaf = i - self.size
            self._set(leaf, self.tree[i] - t)
            return leaf
        if self.n_bins == self.size:
            self._grow()
        leaf = self.n_bins
        self.n_bins += 1
        self._set(leaf, self.seq_len - t)
        return leaf


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    seq_len: int = 1024,
    buckets: int | None = None,
) -> DataFrame:
    """Assign every document (piece) to a training sequence.

    Returns one row per (document piece): ``(id_col, piece, seq_id,
    piece_tokens)`` where ``piece`` numbers a long document's chunks
    (0..k; piece k is the remainder that packs with other docs) and
    ``seq_id`` is a deterministic string key. Token conservation holds:
    per document, ``sum(piece_tokens) == tokens_col``; per sequence,
    ``sum(piece_tokens) <= seq_len`` with full-chunk sequences exactly
    ``seq_len``.
    """
    n_buckets = buckets or 64  # fixed: NOT cluster-derived (see module doc)
    base = df.select(
        F.col(id_col).alias("__id"), F.col(tokens_col).cast("long").alias("__tok")
    ).filter(F.col("__tok") > 0)

    n_full = (F.col("__tok") / seq_len).cast("long")
    remainder = F.col("__tok") % seq_len
    sized = base.select("__id", "__tok", n_full.alias("__nf"), remainder.alias("__rem"))

    # full chunks: each is its own perfectly-filled sequence
    full = (
        sized.filter(F.col("__nf") > 0)
        .select(
            "__id",
            F.explode(F.sequence(F.lit(0), (F.col("__nf") - 1).cast("int"))).alias("piece"),
        )
        .select(
            F.col("__id"),
            F.col("piece").cast("int").alias("piece"),
            F.concat_ws("#", F.lit("full"), F.col("__id"), F.col("piece")).alias("seq_id"),
            F.lit(seq_len).cast("long").alias("piece_tokens"),
        )
    )

    # the packing pool: remainders of long docs + every short doc
    pool = (
        sized.filter(F.col("__rem") > 0)
        .select(
            "__id",
            F.col("__nf").cast("int").alias("piece"),
            F.col("__rem").alias("piece_tokens"),
            F.pmod(F.xxhash64(F.col("__id").cast("string")), F.lit(n_buckets))
            .cast("int")
            .alias("__bucket"),
        )
    )

    id_type = base.schema["__id"].dataType.simpleString()
    out_schema = f"__id {id_type}, piece int, seq_id string, piece_tokens long"

    def ffd(pdf):
        import pandas as pd

        pdf = pdf.sort_values(
            ["piece_tokens", "__id", "piece"], ascending=[False, True, True]
        )
        bucket = int(pdf["__bucket"].iloc[0])
        ff = _FirstFit(seq_len)
        assign = [ff.place(int(t)) for t in pdf["piece_tokens"]]
        return pd.DataFrame(
            {
                "__id": pdf["__id"].values,
                "piece": pdf["piece"].values,
                "seq_id": [f"b{bucket}#{a}" for a in assign],
                "piece_tokens": pdf["piece_tokens"].values,
            }
        )

    packed = pool.groupBy("__bucket").applyInPandas(ffd, out_schema)
    return (
        full.unionByName(packed).withColumnRenamed("__id", id_col)
    )


def packing_stats(assignments: DataFrame, seq_len: int) -> DataFrame:
    """Per-sequence packing audit: piece count, fill, fill ratio."""
    return (
        assignments.groupBy("seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_pieces"),
            F.sum("piece_tokens").alias("fill_tokens"),
        )
        .withColumn("fill_ratio", F.round(F.col("fill_tokens") / seq_len, 6))
    )
