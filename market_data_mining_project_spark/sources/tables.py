"""Table loading for the driver's TPC-H-ish test data and generic parquet.

At 100 TB the fact tables (lineitem / transactions / events / documents)
should be read as partitioned parquet with predicate pushdown; dimension
tables (region, nation, part, customer, supplier) are broadcast-sized. This
module keeps loading declarative — ``spark.read.parquet`` only — so Catalyst
retains pushdown, pruning and partition elimination.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TEST_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any realistic scale factor.
BROADCAST_DIMS = frozenset({"region", "nation", "customer", "supplier", "part"})


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


# events.parquet has shipped with two physical encodings of `ts` over time:
#   * TIMESTAMP(NANOS) / raw int64 nanos — Spark's footer conversion rejects
#     TIMESTAMP(NANOS) outright, so those files must be read with a forced
#     `ts: long` schema and re-derived as a micros timestamp (integer `div`).
#   * TIMESTAMP(MICROS) — a plain read yields correct values; forcing LongType
#     there would misinterpret micros as nanos (events collapse into Jan 1970).
# The loader inspects the parquet footer once per path (cached) and picks the
# matching schema, so either vintage of the testdata reads correctly.
def _events_schema(ts_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


# (probe file, mtime_ns, size) → is-nanos: keyed on the footer file's
# signature, not the path alone — an in-process rewrite of events.parquet
# to the OTHER ts encoding must re-probe instead of serving the stale
# answer and silently collapsing every timestamp toward 1970 (the same
# mid-process-rewrite contract persistence's data_version_cached keeps)
_TS_PROBE_MEMO: dict[tuple[str, int, int], bool] = {}


def events_ts_is_nanos(path: str) -> bool:
    """True when the parquet footer declares `ts` with PHYSICAL int64 in a
    nanosecond (or raw int64) encoding — the vintages that need the
    forced-long + div-1000 workaround because Spark cannot read
    INT64/TIMESTAMP(NANOS) natively. False for the directly-readable
    encodings, INCLUDING physical INT96: pyarrow also reports INT96 as
    timestamp[ns], but Spark reads INT96 natively and a forced-long schema
    on it fails the scan — so the physical type must break the tie.
    Footer-only — no data read; memoized per footer-file signature."""
    import glob as _glob

    import pyarrow as pa
    import pyarrow.parquet as pq

    probe = path
    if os.path.isdir(path):  # partitioned dataset: any one footer is representative
        # recursive: partition-subdirectory layouts (day=.../part-*.parquet)
        # have no top-level .parquet entries
        files = sorted(
            _glob.glob(os.path.join(_glob.escape(path), "**", "*.parquet"), recursive=True)
        )
        if not files:
            raise FileNotFoundError(f"no .parquet footer file found under {path}")
        probe = files[0]
    st = os.stat(probe)
    key = (probe, st.st_mtime_ns, st.st_size)
    hit = _TS_PROBE_MEMO.get(key)
    if hit is not None:
        return hit
    pf = pq.ParquetFile(probe)
    ts_type = pf.schema_arrow.field("ts").type
    if pa.types.is_int64(ts_type):
        nanos = True
    elif pa.types.is_timestamp(ts_type) and ts_type.unit == "ns":
        idx = pf.schema_arrow.get_field_index("ts")
        nanos = pf.schema.column(idx).physical_type == "INT64"
    else:
        nanos = False
    _TS_PROBE_MEMO[key] = nanos
    return nanos


def events_read_schema(path: str) -> tuple[T.StructType, bool]:
    """(forced read schema, needs nanos→micros conversion) for this path."""
    nanos = events_ts_is_nanos(path)
    return _events_schema(T.LongType() if nanos else T.TimestampType()), nanos


def nanos_to_micros_ts(col: str = "ts"):
    """Integer `div` — a float `/1000` loses precision (2024 nanos ≈ 1.7e18,
    beyond double's 2^53 exact-integer range → ±1µs drift)."""
    return F.timestamp_micros(F.expr(f"{col} div 1000"))


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = table_path(sf_dir, "events")
    schema, nanos = events_read_schema(path)
    raw = spark.read.schema(schema).parquet(path)
    return raw.withColumn("ts", nanos_to_micros_ts("ts")) if nanos else raw


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy parquet scan of one table — projection/filters push down later."""
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(table_path(sf_dir, name))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TEST_TABLES}


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TEST_TABLES) -> None:
    """Register temp views so queries can also be expressed in Spark SQL."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


#: Logical-plan nodes that preserve the scan's row count — a frame whose
#: optimized plan is built ONLY of these over a relation leaf has exactly
#: as many rows as its parquet footers claim.
_ROW_PRESERVING_NODES = ("Relation", "Project", "Repartition", "Sort")


def scan_row_count(df: DataFrame) -> int | None:
    """Row count from parquet footer metadata — NO Spark job, no lineage
    execution. Returns None unless the frame is a row-count-preserving
    wrap of a local parquet scan (a Filter/Join/Aggregate anywhere in the
    optimized plan, or remote/unreadable files, disqualify it).

    The cheap signal for adaptive gates that only need corpus SIZE (the
    ingest batch-cache gate, SemDeDup's cells-per-vector k): running a
    full ``df.count()`` there silently executes the whole upstream plan
    just to pick a strategy. Footer reads cost ~1 ms/file on local disk.
    """
    files = df.inputFiles()
    if not files:
        return None
    try:
        plan = df._jdf.queryExecution().optimizedPlan().toString()
    except Exception:
        return None
    for line in plan.splitlines():
        node = line.lstrip(" +-:").split(" ", 1)[0]
        if node and not any(node.startswith(ok) for ok in _ROW_PRESERVING_NODES):
            return None
    try:
        import pyarrow.parquet as pq

        total = 0
        for f in files:
            local = f[len("file:"):] if f.startswith("file:") else f
            if "://" in local:
                return None  # remote store: footer read could stall the driver
            total += pq.ParquetFile(local).metadata.num_rows
        return total
    except Exception:
        return None
