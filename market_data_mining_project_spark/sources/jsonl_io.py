"""JSON-lines import/export — the training-corpus interchange format.

The reference ingests CSV only (SURVEY.md §2.1); a large-scale text/data
pipeline additionally speaks JSONL (one document object per line — the
de-facto corpus interchange format). Same validation contract as
``csv_io``: PERMISSIVE parse with a quarantine column, optional FK
existence check, land-as-parquet sink — schema-validated distributed reads,
never schema inference in a production path.

At 100 TB the same caveat as CSV applies: JSONL has no pushdown and no
column pruning, so the import path converts to parquet immediately; export
exists for interchange with downstream tooling (tokenizers, labelers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from market_data_mining_project_spark.sources.csv_io import (
    _CORRUPT,
    ValidatedLoad,
    split_validated,
)


def read_jsonl_validated(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    fk: tuple[str, DataFrame] | None = None,
) -> ValidatedLoad:
    """Schema-validated JSONL load with quarantine.

    Malformed lines and type-mismatched objects are captured whole in
    ``rejected``; ``fk`` optionally splits out orphans via broadcast
    anti-join (same contract as ``csv_io.read_csv_validated``).
    """
    schema_with_corrupt = T.StructType(
        list(schema.fields) + [T.StructField(_CORRUPT, T.StringType())]
    )
    raw = spark.read.json(
        path,
        schema=schema_with_corrupt,
        mode="PERMISSIVE",
        columnNameOfCorruptRecord=_CORRUPT,
    )
    return split_validated(raw, fk)


def export_jsonl(
    df: DataFrame, path: str, columns: list[str] | None = None, limit: int | None = None
) -> None:
    """JSONL export; ``limit`` caps-and-coalesces like the CSV exporter,
    ``None`` keeps the write distributed (one file per partition)."""
    out = df.select(*columns) if columns else df
    if limit is not None:
        out = out.limit(limit).coalesce(1)
    out.write.mode("overwrite").json(path)
