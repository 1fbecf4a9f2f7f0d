"""Sources & sinks: schemas, validated readers, writers."""

from market_data_mining_project_spark.sources.tables import TEST_TABLES, load_tables, register_views

__all__ = ["TEST_TABLES", "load_tables", "register_views"]
