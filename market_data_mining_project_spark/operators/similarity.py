"""Similarity search over embedding columns (array<float>).

Two paths, both pure DataFrame ops:

- :func:`cosine_topk` — brute-force exact top-k: query set × corpus join with
  a JVM-side dot product (``F.aggregate``/``zip_with`` — no Python UDF). For
  Q queries over N vectors this is O(Q·N·d) FLOPs spread across executors;
  the per-query top-k is a groupBy window, not a global sort. The baseline.
- :func:`lsh_topk` — the scale path: random-hyperplane (sign) LSH buckets
  vectors; queries only compare within matching buckets across T tables.
  Recall tunable by (bits, tables): more bits → smaller buckets but lower
  per-table recall. For weak-similarity corpora (top-k cos ≲ 0.4) use few
  bits + many tables (e.g. 4/16); for near-dup search 8/4 suffices.
  Candidate verification is exact cosine.

Norms are precomputed once per side. All arithmetic is double (cast from
float once) for deterministic, engine-portable results.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product — deterministic order, JVM codegen."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
) -> DataFrame:
    """Exact brute-force cosine top-k for each query vector.

    ``queries`` is broadcast (typically small); the corpus is scanned once.
    Returns (query_id, neighbor_id, cos) with deterministic tie-breaking on
    neighbor id.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def _hyperplanes(dim: int, bits: int, seed: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (LCG — no numpy dependency in
    the plan; tiny driver-side constant folded into the expressions)."""
    state = seed & 0x7FFFFFFF
    planes: list[list[float]] = []
    for _ in range(bits):
        row = []
        for _ in range(dim):
            state = (1103515245 * state + 12345) % (1 << 31)
            row.append((state / float(1 << 31)) * 2.0 - 1.0)
        planes.append(row)
    return planes


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-LSH bucket id: bit b = 1 iff vec · plane_b > 0."""
    out = F.lit(0).cast("long")
    for b, plane in enumerate(planes):
        d = dot(vec, F.array(*[F.lit(w) for w in plane]))
        out = out + F.when(d > 0, F.lit(2**b).cast("long")).otherwise(F.lit(0).cast("long"))
    return out


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    dim: int = 64,
    bits: int = 8,
    tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k: compare only within matching sign-LSH
    buckets across ``tables`` independent hash tables, verify with exact
    cosine. At 100 TB the bucket join replaces the full cross product with
    ~N/2^bits candidates per query per table."""
    c = corpus.select(F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv"))
    q = queries.select(F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv"))
    cand = None
    for t in range(tables):
        planes = _hyperplanes(dim, bits, seed + 1000 * t)
        ct = c.withColumn("bucket", lsh_bucket(F.col("cv"), planes)).withColumn(
            "tbl", F.lit(t)
        )
        qt = q.withColumn("bucket", lsh_bucket(F.col("qv"), planes)).withColumn(
            "tbl", F.lit(t)
        )
        pairs = ct.join(F.broadcast(qt), ["tbl", "bucket"]).select(
            "query_id", "neighbor_id", "qv", "cv"
        )
        cand = pairs if cand is None else cand.unionByName(pairs)
    scored = (
        cand.dropDuplicates(["query_id", "neighbor_id"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return scored.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= k).drop("__rn")
