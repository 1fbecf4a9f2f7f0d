"""Per-round benchmark: times every catalog query at $SPARK_GRAFT_SF_DIR.

Each query is materialized with a noop write (full execution, no driver
collect) after one warm-up of the flagship query to exclude JVM/session
startup from per-query numbers.

TWO passes with the cache state explicit, so round-over-round comparisons
are like-for-like (the r4→r5 bench mixed a cold profile with an
all-caches-warm one):

- **cold**: SPARK_GRAFT_MODEL_DIR is redirected to a fresh temp dir, so no
  persisted model / derived-table / centroid / recommendation cache exists
  — every query pays its full first-session cost. Reported as ``queries``
  / ``value`` (the primary, round-comparable numbers).
- **warm**: the same catalog re-run in the SAME process — persisted
  artifacts plus in-process memos (session-scoped derived-table paths,
  fingerprint memos), i.e. the steady-state serving shape of a long-lived
  session, which is strictly warmer than a fresh second session would be
  (reference ml_models.py:197-210 is the cross-session analogue). Reported
  as ``queries_warm`` / ``value_warm``.

Prints ONE JSON line:
``{"metric": ..., "value": cold_total, "unit": "sec", "queries": {...},
   "value_warm": warm_total, "queries_warm": {...}, "cache_state":
   "cold+warm", "sf": ...}``

``SPARK_GRAFT_BENCH_REPEATS=N`` (default 1) re-times each WARM-pass query
N times and reports the per-query MINIMUM — the standard ambient-load
filter (round-3's +18% "regression" was machine noise). The COLD pass
always runs each query exactly once: repeats there would hit the caches
repeat 1 just published, silently turning the headline cold numbers warm.
"""

from __future__ import annotations

import json
import os
import re
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _time_catalog(spark, queries, sf_dir: str, repeats: int) -> dict[str, float]:
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
    return timings


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    # fresh persistence root: the cold pass must not see artifacts from a
    # previous bench/session, and the warm pass must see exactly what the
    # cold pass published. Removed on exit — the artifacts are only useful
    # within this process's warm pass.
    import atexit
    import shutil

    cache_root = tempfile.mkdtemp(prefix="mdmp_bench_cache_")
    os.environ["SPARK_GRAFT_MODEL_DIR"] = cache_root
    atexit.register(shutil.rmtree, cache_root, True)

    from market_data_mining_project_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark("mdmp-bench", **{"spark.ui.enabled": "false"})
    queries = entry_mod.queries()

    # Warm-up: JVM codegen + shuffle machinery spin-up, not counted. Runs
    # OUTSIDE the catalog (a synthetic aggregate over spark.range) so no
    # timed query gets its scan/derived state pre-warmed — warming with
    # category_rollup understated that entry's (and the headline's) cold
    # cost.
    from pyspark.sql import functions as _F

    _materialize(
        spark.range(1_000_000).groupBy((_F.col("id") % 100).alias("g")).count()
    )

    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "1")))
    # cold is ALWAYS single-shot: a second repeat would serve the caches the
    # first repeat published, and min-of-N would report that as "cold"
    cold = _time_catalog(spark, queries, sf_dir, repeats=1)
    warm = _time_catalog(spark, queries, sf_dir, repeats)

    print(
        json.dumps(
            {
                "metric": "catalog_total_runtime",
                "value": round(sum(cold.values()), 3),
                "unit": "sec",
                "queries": cold,
                "value_warm": round(sum(warm.values()), 3),
                "queries_warm": warm,
                "cache_state": "cold+warm",
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
