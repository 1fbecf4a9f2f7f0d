"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (category revenue rollup — the
Spark analogue of the reference's department table,
``Website/market/dunnhumby/views.py:906-918``) on sf0.001.

``queries()`` / ``oracle_sql()`` expose the full operator catalog from
``market_data_mining_project_spark.plans`` — one entry per implemented
operator from SURVEY.md §2, each with DuckDB-runnable oracle SQL whose
column aliases match the Spark output exactly.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from market_data_mining_project_spark.plans import merged

_QUERIES, _ORACLE = merged()

_FLAGSHIP_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _QUERIES["category_rollup"](spark, _FLAGSHIP_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query key (omitted ⇒ rows-only check)."""
    return dict(_ORACLE)
