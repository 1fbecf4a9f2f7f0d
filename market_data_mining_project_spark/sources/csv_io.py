"""CSV import/export (SURVEY.md §2.1 S1, S4–S6).

The reference imports the Dunnhumby CSV in 10K-row chunks with per-row
validation/coercion and FK checks (``Website/market/dunnhumby/management/
commands/import_transactions.py:37-205``) and exports fixed column sets
capped at 1000 rows (``views.py:3060-3115``). Spark-first:

- chunking/batching disappears — the distributed read IS batched;
- per-row try/except coercion becomes PERMISSIVE mode + a corrupt-record
  column: bad rows land in a quarantine DataFrame instead of killing the
  load (the reference counts and skips them, import_transactions.py:150-165);
- the FK existence check becomes a broadcast semi/anti join;
- the atomic bulk insert becomes a single ``write`` (all-or-nothing per job).

At 100 TB: CSV is a poor long-term format (no pushdown, no stats) — the
import path lands data as parquet immediately, which is what every other
operator reads.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CORRUPT = "_corrupt_record"


@dataclass
class ValidatedLoad:
    valid: DataFrame
    rejected: DataFrame
    fk_orphans: DataFrame | None = None
    # the cached raw frame backing all three branches (see split_validated)
    _raw: DataFrame | None = None

    def release(self) -> None:
        """Unpersist the cached raw frame once every branch is consumed —
        without this each validated load stays pinned in executor storage
        for the process lifetime. After release, re-reading ``rejected``
        (which selects ONLY the corrupt column) raises Spark's
        corrupt-record-column analysis error instead of silently recomputing
        wrong — consume first, release last."""
        if self._raw is not None:
            self._raw.unpersist()


def split_validated(raw: DataFrame, fk: tuple[str, DataFrame] | None = None) -> ValidatedLoad:
    """Quarantine + FK split shared by every validated reader (CSV here,
    JSONL in ``jsonl_io``) — ONE definition, so a change to the corrupt-row
    or orphan semantics cannot silently diverge between formats.

    Caching is required for the corrupt-record split: the ``_corrupt_record``
    column is only populated while the same scan materializes both branches.
    """
    raw = raw.cache()
    valid = raw.filter(F.col(_CORRUPT).isNull()).drop(_CORRUPT)
    rejected = raw.filter(F.col(_CORRUPT).isNotNull()).select(_CORRUPT)
    orphans = None
    if fk is not None:
        col, dim = fk
        dim_keys = dim.select(col).distinct()
        orphans = valid.join(F.broadcast(dim_keys), col, "left_anti")
        valid = valid.join(F.broadcast(dim_keys), col, "left_semi")
    return ValidatedLoad(valid=valid, rejected=rejected, fk_orphans=orphans, _raw=raw)


def read_csv_validated(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    fk: tuple[str, DataFrame] | None = None,
) -> ValidatedLoad:
    """Schema-validated CSV load with quarantine (S1).

    Rows that fail type coercion are captured whole in ``rejected`` (the
    reference logs-and-skips, import_transactions.py:150-165). ``fk`` is an
    optional (column, dim_table) existence check — orphans are split out via
    anti-join, matching the reference's household FK validation
    (import_transactions.py:128-137).
    """
    schema_with_corrupt = T.StructType(
        list(schema.fields) + [T.StructField(_CORRUPT, T.StringType())]
    )
    raw = spark.read.csv(
        path,
        schema=schema_with_corrupt,
        header=header,
        mode="PERMISSIVE",
        columnNameOfCorruptRecord=_CORRUPT,
    )
    return split_validated(raw, fk)


def export_csv(df: DataFrame, path: str, columns: list[str] | None = None, limit: int | None = 1000) -> None:
    """Capped CSV export (S4; reference views.py:3060-3115 exports the first
    1000 rows of a fixed column set). ``limit=None`` exports everything —
    then the write stays distributed (one file per partition)."""
    out = df.select(*columns) if columns else df
    if limit is not None:
        out = out.limit(limit).coalesce(1)
    out.write.mode("overwrite").option("header", True).csv(path)


def import_to_parquet(
    load: ValidatedLoad, table_path: str, mode: str = "overwrite"
) -> dict[str, int]:
    """Land a validated load as parquet (S5 bulk-insert sink analogue);
    returns row counts the way the import command reports them
    (import_transactions.py:188-205)."""
    load.valid.write.mode(mode).parquet(table_path)
    counts = {
        "imported": load.valid.count(),
        "rejected": load.rejected.count(),
        "fk_orphans": load.fk_orphans.count() if load.fk_orphans is not None else 0,
    }
    # landing is the terminal step of the import flow: every branch has been
    # consumed (write + the three counts), so the cached raw frame can go
    load.release()
    return counts
