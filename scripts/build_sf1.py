"""Synthesize the full ~sf1 (10x sf0.1) dataset for the whole-catalog sweep.

One directory with ALL TEN tables, composing the three per-family recipes
``scale_probe.py`` already ships (same semantics, same rationale):

- ``documents``/``embeddings`` — 10 NEAR-duplicate copies per row (short
  per-copy text tag / one-dimension embedding offset): dedup keeps real
  work at every stage instead of trivially collapsing the corpus.
- ``events`` — 10x EXTENDED history (copy k shifts +31k days, re-ids):
  per-window event density constant, so a linear operator slopes ~10x in
  output, never superlinearly in comparisons.
- ``orders``/``lineitem`` — copy k re-keys orderkeys and shifts dates
  +7k days: per-customer purchase sequences EXTEND rather than duplicate
  in place.
- dimension tables (``part customer nation region supplier``) — symlinked
  unchanged: per-key fact density grows 10x, which is exactly the hot-key
  stress the skew-safe plans claim to survive.

Run:  python scripts/build_sf1.py   (writes /tmp/mdmp_sf1)
Then: SPARK_GRAFT_SF_DIR=/tmp/mdmp_sf1 SPARK_GRAFT_CPUS=32 python bench.py
      SPARK_GRAFT_SF_DIR=/tmp/mdmp_sf1 python -m tests.oracle_harness

Scaled tiers (r9): SPARK_GRAFT_SCALE_COPIES=50 SPARK_GRAFT_SCALE_OUT=/tmp/mdmp_sf5
builds an ≈sf5 fixture — 5× the sf1 corpus at CONSTANT near-dup density
(10-doc clusters; see CLUSTER below), the weak-scaling shape for the
heavy-family slope measurements.
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = os.environ.get("SPARK_GRAFT_SCALE_BASE", "/root/testdata/sf0.1")
OUT = os.environ.get("SPARK_GRAFT_SCALE_OUT", "/tmp/mdmp_sf1")
COPIES = int(os.environ.get("SPARK_GRAFT_SCALE_COPIES", "10"))
#: near-dup CLUSTER size: copies within one group of 10 are mutual
#: near-dups (the " rev k" tag differs by ~2 tokens); copies in DIFFERENT
#: groups get every token prefixed with a group marker, so their shingle
#: sets are disjoint. With COPIES=10 there is a single group and the
#: fixture is byte-compatible with the original sf1 recipe; with
#: COPIES=50 (≈sf5) the corpus grows 5× at CONSTANT per-doc near-dup
#: density — weak scaling, the honest 100 TB shape. Without the grouping,
#: pair counts grow quadratically in COPIES and the jaccard stage's spill
#: measures fixture hostility, not operator scaling.
CLUSTER = 10


def main() -> None:
    from pyspark.sql import functions as F

    from market_data_mining_project_spark.session import get_spark

    if os.path.isdir(OUT):
        shutil.rmtree(OUT)
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark("mdmp-build-sf1", **{"spark.ui.enabled": "false"})
    copies = spark.range(COPIES).withColumnRenamed("id", "copy")

    # documents: near-dup replication (scale_probe.build_fixture recipe)
    docs = spark.read.parquet(os.path.join(BASE, "documents.parquet"))
    n_docs = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    grp = (F.col("copy") / CLUSTER).cast("int")
    # group > 0: prefix every token with the group marker — shingle sets
    # across groups are disjoint, so near-dup clusters stay CLUSTER-sized.
    # The '·' separator keeps prefixes unambiguous at ANY tier: without it,
    # 'g1'+'1tok' == 'g11'+'tok' re-creates cross-group shared shingles at
    # COPIES > 100 and silently breaks the constant-density guarantee
    grouped_text = F.when(grp == 0, F.col("text")).otherwise(
        F.array_join(
            F.transform(
                F.split(F.col("text"), r"\s+"),
                lambda t: F.concat(F.lit("g"), grp.cast("string"), F.lit("·"), t),
            ),
            " ",
        )
    )
    (
        docs.crossJoin(F.broadcast(copies))
        .select(
            (F.col("doc_id") + F.col("copy") * n_docs).alias("doc_id"),
            F.when(F.col("copy") == 0, F.col("text"))
            .otherwise(F.concat(grouped_text, F.lit(" rev "), F.col("copy")))
            .alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(os.path.join(OUT, "documents.parquet"))
    )
    print("documents done", flush=True)

    # embeddings: one-dimension deterministic offset per copy
    emb = spark.read.parquet(os.path.join(BASE, "embeddings.parquet"))
    n_vec = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    (
        emb.crossJoin(F.broadcast(copies))
        .select(
            (F.col("vec_id") + F.col("copy") * n_vec).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, i: F.when(
                    i == 0, (x + F.col("copy") * F.lit(0.003)).cast("float")
                ).otherwise(x),
            ).alias("embedding"),
            "label",
        )
        .repartition(8)
        .write.mode("overwrite")
        .parquet(os.path.join(OUT, "embeddings.parquet"))
    )
    print("embeddings done", flush=True)

    # events: extended history
    ev = spark.read.parquet(os.path.join(BASE, "events.parquet"))
    n_ev = ev.agg(F.max("event_id")).collect()[0][0] + 1
    (
        ev.crossJoin(F.broadcast(copies))
        .select(
            (F.col("event_id") + F.col("copy") * n_ev).alias("event_id"),
            F.expr("timestampadd(DAY, CAST(copy * 31 AS INT), ts)").alias("ts"),
            "user_id",
            "event_type",
            "value",
            "props",
        )
        .repartition(16)
        .write.mode("overwrite")
        .parquet(os.path.join(OUT, "events.parquet"))
    )
    print("events done", flush=True)

    # orders + lineitem: re-key + date shift (sequences extend)
    orders = spark.read.parquet(os.path.join(BASE, "orders.parquet"))
    li = spark.read.parquet(os.path.join(BASE, "lineitem.parquet"))
    n_ord = orders.agg(F.max("o_orderkey")).collect()[0][0] + 1
    (
        orders.crossJoin(F.broadcast(copies))
        .select(
            (F.col("o_orderkey") + F.col("copy") * n_ord).alias("o_orderkey"),
            *[c for c in orders.columns if c not in ("o_orderkey", "o_orderdate")],
            # timestampadd, NOT date_add: the base fixture ships o_orderdate
            # as TIMESTAMP and date_add would silently degrade the scaled
            # tiers to DATE — cross-tier runs must see one schema
            F.expr("timestampadd(DAY, CAST(copy * 7 AS INT), o_orderdate)").alias(
                "o_orderdate"
            ),
        )
        .repartition(16)
        .write.mode("overwrite")
        .parquet(os.path.join(OUT, "orders.parquet"))
    )
    (
        li.crossJoin(F.broadcast(copies))
        .select(
            (F.col("l_orderkey") + F.col("copy") * n_ord).alias("l_orderkey"),
            *[c for c in li.columns if c not in ("l_orderkey", "l_shipdate")],
            # same +7*copy shift as o_orderdate: copies must preserve the
            # orderdate<=shipdate invariant or order-to-ship temporal logic
            # is exercised on unrealistic data (r8 ADVICE finding)
            F.expr("timestampadd(DAY, CAST(copy * 7 AS INT), l_shipdate)").alias(
                "l_shipdate"
            ),
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(os.path.join(OUT, "lineitem.parquet"))
    )
    print("orders+lineitem done", flush=True)

    for dim in ("part", "customer", "nation", "region", "supplier"):
        os.symlink(os.path.join(BASE, f"{dim}.parquet"), os.path.join(OUT, f"{dim}.parquet"))
    for t in (
        "documents", "embeddings", "events", "orders", "lineitem",
        "part", "customer", "nation", "region", "supplier",
    ):
        n = spark.read.parquet(os.path.join(OUT, f"{t}.parquet")).count()
        print(f"{t}: {n} rows", flush=True)


if __name__ == "__main__":
    main()
