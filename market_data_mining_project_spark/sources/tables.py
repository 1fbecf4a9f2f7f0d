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


# events.parquet stores ts as TIMESTAMP(NANOS), which Spark's parquet footer
# conversion rejects outright. Reading with an explicit schema (ts: long =
# nanos since epoch) bypasses footer inference without needing the session
# config `spark.sql.legacy.parquet.nanosAsLong` (we can't assume the driver's
# session sets it); `ts` is then re-derived as a micros timestamp column.
_EVENTS_RAW = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def nanos_to_micros_ts(col: str = "ts"):
    """Integer `div` — a float `/1000` loses precision (2024 nanos ≈ 1.7e18,
    beyond double's 2^53 exact-integer range → ±1µs drift)."""
    return F.timestamp_micros(F.expr(f"{col} div 1000"))


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = spark.read.schema(_EVENTS_RAW).parquet(table_path(sf_dir, "events"))
    return raw.withColumn("ts", nanos_to_micros_ts("ts"))


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
