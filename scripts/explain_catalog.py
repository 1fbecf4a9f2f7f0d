"""Capture .explain("formatted") plans (and optional noop timings) per entry.

The optimization-round evidence tool (guide §1.1/§7.2): writes
``plans/r13/<entry>_<tag>.txt`` for each requested catalog entry so plan
claims ("2 Exchange → 1", "SortMergeJoin → BroadcastHashJoin") are
checkable without running Spark. With ``--time`` each entry is also
materialized through the noop sink (guide §1.4) after one warm-up, with
per-entry wall seconds and completed-stage counts printed.

Usage:
    python scripts/explain_catalog.py --tag before [--time] [entry ...]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import argparse
import io
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _explain_text(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("entries", nargs="*", help="catalog entry names (default: all)")
    ap.add_argument("--tag", default="before", help="file suffix: <entry>_<tag>.txt")
    ap.add_argument("--time", action="store_true", help="also time a noop materialization")
    ap.add_argument("--out", default=None, help="output dir (default plans/r13/)")
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = args.out or os.path.join(repo, "plans", "r13")
    os.makedirs(out_dir, exist_ok=True)

    import __spark_entry__ as entry_mod

    from market_data_mining_project_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("mdmp-explain", **{"spark.ui.enabled": "false"})
    queries = entry_mod.queries()
    names = args.entries or sorted(queries)
    unknown = [n for n in names if n not in queries]
    if unknown:
        raise SystemExit(f"unknown entries: {unknown}; known: {sorted(queries)}")

    if args.time:
        # warm-up outside the catalog (bench.py's contract)
        from pyspark.sql import functions as F

        spark.range(1_000_000).groupBy((F.col("id") % 100).alias("g")).count().write.format(
            "noop"
        ).mode("overwrite").save()

    sc = spark.sparkContext
    for name in names:
        df = queries[name](spark, sf_dir)
        path = os.path.join(out_dir, f"{name}_{args.tag}.txt")
        with open(path, "w") as fh:
            fh.write(_explain_text(df))
        line = f"{name}: plan -> {os.path.relpath(path, repo)}"
        if args.time:
            sc.setJobDescription(name)
            tracker = sc.statusTracker()
            before_stages = len(tracker.getJobIdsForGroup(None) or [])
            t0 = time.perf_counter()
            # fresh plan object: the explain above may have forced partial analysis only
            queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            elapsed = time.perf_counter() - t0
            sc.setJobDescription(None)
            spark.catalog.clearCache()
            line += f"  {elapsed:.2f}s"
            _ = before_stages
        print(line)


if __name__ == "__main__":
    main()
