"""Per-round benchmark: times every catalog query at $SPARK_GRAFT_SF_DIR.

Each query is materialized with a noop write (full execution, no driver
collect) after one warm-up of the flagship query to exclude JVM/session
startup from per-query numbers. Prints ONE JSON line:
``{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}``

``SPARK_GRAFT_BENCH_REPEATS=N`` (default 1) re-times each query N times and
reports the per-query MINIMUM — the standard ambient-load filter (round-3's
+18% "regression" was machine noise; min-of-N makes that diagnosable without
ad-hoc reruns). Queries that materialize shared derived tables on first use
still pay that cost exactly once, in their first repeat, so min-of-N also
reports their steady-state cost.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    from market_data_mining_project_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark("mdmp-bench", **{"spark.ui.enabled": "false"})
    queries = entry_mod.queries()

    # Warm-up: JVM codegen + parquet footer caches, not counted.
    _materialize(queries["category_rollup"](spark, sf_dir))

    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "1")))
    timings: dict[str, float] = {}
    for name, fn in sorted(queries.items()):
        best = None
        for _ in range(repeats):
            t0 = time.perf_counter()
            _materialize(fn(spark, sf_dir))
            elapsed = time.perf_counter() - t0
            best = elapsed if best is None else min(best, elapsed)
            # drop caches a query pinned for its own iterative stages so
            # later queries aren't measured under another query's footprint
            spark.catalog.clearCache()
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "catalog_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
