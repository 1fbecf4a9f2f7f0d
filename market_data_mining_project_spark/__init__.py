"""market_data_mining_project_spark — a PySpark-native analytics engine.

A brand-new, idiomatic PySpark (DataFrame / Spark SQL / Catalyst / MLlib)
engine providing the query and data-processing capabilities of the reference
repo ``Sinamozaffarirad/market-data-mining-project`` (a Django + SQL Server
market-basket analytics app over the Dunnhumby "Complete Journey" dataset),
re-designed Spark-first for 100 TB scale:

- declarative DataFrame plans everywhere (Catalyst does pushdown/pruning),
- broadcast joins for dimension tables, shuffle-minimizing aggregations,
- MLlib (FPGrowth / ALS / GBT) replacing sklearn pipelines,
- Arrow-batched pandas UDFs only where built-ins cannot express semantics.

Layout
------
- ``sources``   — table schemas, parquet/CSV readers with validation, sinks.
- ``operators`` — relational + domain operators (rules, RFM, churn, recs,
  differential stats, dedup, similarity, text analysis, multimodal).
- ``functions`` — reusable column-expression builders and numeric stats.
- ``plans``     — named query catalog binding operators to the test schema.
- ``streaming`` — Structured Streaming variants (windowed aggs, watermark).
"""

from market_data_mining_project_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
