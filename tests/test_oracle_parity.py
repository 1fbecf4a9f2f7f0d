"""Full-catalog DuckDB-oracle parity at sf0.001 — the local replica of the
driver's t2 correctness gate (row count + columns + order-insensitive values)."""

from __future__ import annotations

import pytest

from tests.oracle_harness import run_all

pytestmark = pytest.mark.oracle


def test_all_queries_match_oracle(spark, sf_dir):
    results = run_all(spark, sf_dir)
    failures = {name: errs for name, errs in results.items() if errs}
    assert not failures, f"oracle mismatches: {failures}"
    assert len(results) >= 26


def test_entry_smoke(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert df.columns  # stable schema


def test_queries_oracle_keys_align():
    import __spark_entry__ as entry_mod

    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    # every oracle key must have a query; queries without oracle are the
    # documented weaker rows-only checks
    assert set(o) <= set(q)


def test_oracled_queries_lead_catalog():
    """Correctness harnesses sweep a bounded (50-entry) prefix of the
    catalog: every hash-verifiable query must sit inside that prefix, with
    rows-only entries trailing."""
    import __spark_entry__ as entry_mod

    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    names = list(q)
    assert len(o) <= 50, f"{len(o)} oracled queries exceed the 50-entry window"
    assert all(n in o for n in names[: len(o)])
    assert all(n not in o for n in names[len(o):])
