"""Targeted per-entry timing with per-stage breakdown (optimization loop tool).

Times the named catalog entries through the noop sink (guide §1.4) in one
session — ``--repeats N`` reports min-of-N — and, with ``--stages``, prints
each entry's completed stages (duration, task count, shuffle bytes, name)
from the status REST API so the expensive stage is identifiable without the
UI. Job descriptions are set per entry (guide §1.5).

Usage:
    python scripts/time_entries.py --repeats 3 --stages cf_recommendations_capped ...

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
Unlike bench.py this tool never redirects SPARK_GRAFT_MODEL_DIR: entries
that load persisted models measure their warm serving shape. Pass
``--fresh-models`` to point SPARK_GRAFT_MODEL_DIR at a temp dir (cold shape).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _rest(base: str, path: str):
    with urllib.request.urlopen(f"{base}{path}", timeout=10) as r:
        return json.loads(r.read())


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("entries", nargs="+")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--stages", action="store_true", help="print per-stage breakdown")
    ap.add_argument("--top", type=int, default=12, help="stages shown per entry")
    ap.add_argument("--fresh-models", action="store_true")
    args = ap.parse_args()

    if args.fresh_models:
        os.environ["SPARK_GRAFT_MODEL_DIR"] = tempfile.mkdtemp(prefix="mdmp_time_cold_")

    import __spark_entry__ as entry_mod

    from market_data_mining_project_spark.session import get_spark
    from pyspark.sql import functions as F

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("mdmp-time", **{"spark.ui.enabled": "true"})
    queries = entry_mod.queries()
    unknown = [n for n in args.entries if n not in queries]
    if unknown:
        raise SystemExit(f"unknown entries: {unknown}")

    # warm-up outside the catalog (bench.py contract)
    spark.range(1_000_000).groupBy((F.col("id") % 100).alias("g")).count().write.format(
        "noop"
    ).mode("overwrite").save()

    sc = spark.sparkContext
    base = None
    try:
        ui = sc._jsc.sc().uiWebUrl()
        if ui.isDefined():
            base = f"{ui.get()}/api/v1/applications/{sc.applicationId}"
    except Exception:
        base = None

    def completed_stage_keys() -> set:
        if base is None:
            return set()
        return {(s["stageId"], s["attemptId"]) for s in _rest(base, "/stages?status=complete")}

    for name in args.entries:
        times = []
        last_new: list = []
        for rep in range(args.repeats):
            seen = completed_stage_keys()
            sc.setJobDescription(f"{name} rep{rep}")
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
            sc.setJobDescription(None)
            spark.catalog.clearCache()
            if base is not None:
                # bounded drain (bench.py rationale)
                end = time.time() + 2.0
                while time.time() < end and _rest(base, "/stages?status=active"):
                    time.sleep(0.05)
                last_new = [
                    s
                    for s in _rest(base, "/stages?status=complete")
                    if (s["stageId"], s["attemptId"]) not in seen
                ]
        print(f"{name}: min {min(times):.2f}s  runs {['%.2f' % t for t in times]}  "
              f"stages/run {len(last_new)}")
        if args.stages and last_new:
            rows = sorted(
                last_new,
                key=lambda s: -(s.get("executorRunTime", 0)),
            )[: args.top]
            for s in rows:
                dur = s.get("executorRunTime", 0) / 1000.0
                sub = (
                    (s.get("completionTime") is not None)
                    and f"{s.get('numCompleteTasks', s.get('numTasks', 0))}t"
                    or "?"
                )
                nm = s.get("name", "")[:90]
                shr = s.get("shuffleReadBytes", 0) / 1e6
                shw = s.get("shuffleWriteBytes", 0) / 1e6
                py = ""
                print(
                    f"    stage {s['stageId']:>5} exec {dur:6.2f}s {sub:>5} "
                    f"shufR {shr:7.1f}M shufW {shw:7.1f}M  {nm}{py}"
                )


if __name__ == "__main__":
    main()
