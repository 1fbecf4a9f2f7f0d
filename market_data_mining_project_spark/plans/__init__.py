"""Named query catalog — binds schema-generic operators to the test tables.

Each module exposes ``QUERIES: dict[str, fn(spark, sf_dir) -> DataFrame]``
and ``ORACLE: dict[str, str]`` (DuckDB-runnable ANSI SQL with identical
column aliases). The merged catalog backs ``__spark_entry__.py``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def merged() -> tuple[dict[str, QueryFn], dict[str, str]]:
    from market_data_mining_project_spark.plans import (
        analytics_domain,
        dunnhumby_domain,
        events_temporal,
        llm_pipeline,
        pipeline_io,
        sql_api,
        tpch_relational,
    )

    queries: dict[str, QueryFn] = {}
    oracle: dict[str, str] = {}
    for mod in (
        tpch_relational,
        dunnhumby_domain,
        llm_pipeline,
        analytics_domain,
        pipeline_io,
        sql_api,
        events_temporal,
    ):
        queries.update(mod.QUERIES)
        oracle.update(mod.ORACLE)
    # Oracled queries first, rows-only entries last: correctness harnesses
    # that sweep a bounded prefix of the catalog must see every query that
    # can be hash-verified before any that can only be row-counted.
    ordered: dict[str, QueryFn] = {n: queries[n] for n in queries if n in oracle}
    ordered.update({n: queries[n] for n in queries if n not in oracle})
    return ordered, oracle
