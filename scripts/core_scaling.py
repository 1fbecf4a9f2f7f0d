"""Core-count scaling probe over the data-bound catalog subset (r14).

The driver's whole-catalog scaling signal is uninformative at sf0.1: the
catalog's measured cost there is ~scale-independent overhead (ML fits,
streaming micro-batch machinery, per-stage scheduling — r13 measured a full
sf0.001 bench ≈ the sf0.1 cost), so 8-core and 32-core runs read the same
and `suspect_cpus_ignored` fires. This probe measures what that signal
cannot: the DATA-BOUND entries at a data-dominated scale (the ~sf1 fixture
from ``scripts/build_sf1.py``), one fresh process per core count so the
master really is ``local[$SPARK_GRAFT_CPUS]``.

Run (idle host):

    python scripts/build_sf1.py                       # once; writes /tmp/mdmp_sf1
    python scripts/core_scaling.py                    # probes 32 vs 8 cores

Prints one JSON line:
    {"sf_dir": ..., "entries": [...], "cpus": {"32": {entry: sec}, "8": {...}},
     "ratio_8_over_32": {entry: r, ...}, "median_ratio": r}

A data-parallel entry should show ratio ≈ core ratio (up to its serial
fraction); ~1.0 means fixed-cost-bound. Knobs: SPARK_GRAFT_SCALING_CPUS
(comma list, default "32,8"), SPARK_GRAFT_SCALING_REPEATS (default 2),
SPARK_GRAFT_SF_DIR (default /tmp/mdmp_sf1).
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: The data-bound subset: full-fact scans/joins/aggregations whose bytes
#: grow with the fixture — no ML fits, no streaming replays, no bounded
#: samples (those are the fixed costs the probe exists to exclude).
ENTRIES = [
    "category_rollup",
    "product_rollup_having",
    "basket_rollup_top25",
    "monthly_sales",
    "department_mix",
    "sql_reports",
    "churn_features",
    "horizon_features",
    "text_profile",
    "tokenized_export",
    "span_dedup",
    "sketch_rollup",
]

_CHILD = """
import json, os, sys, time
sys.path.insert(0, {repo!r})
import __spark_entry__ as em
from pyspark.sql import functions as F
from market_data_mining_project_spark.session import get_spark
spark = get_spark("mdmp-core-scaling", **{{"spark.ui.enabled": "false"}})
sf_dir = os.environ["SPARK_GRAFT_SF_DIR"]
spark.range(1_000_000).groupBy((F.col("id") % 100).alias("g")).count().write.format(
    "noop").mode("overwrite").save()
q = em.queries()
out = {{}}
for name in {entries!r}:
    best = None
    for _ in range({repeats}):
        t0 = time.perf_counter()
        q[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        el = time.perf_counter() - t0
        best = el if best is None else min(best, el)
        spark.catalog.clearCache()
    out[name] = round(best, 3)
print("CORE_SCALING " + json.dumps(out))
"""


def run_at(cpus: str, sf_dir: str, repeats: int) -> dict[str, float]:
    env = dict(os.environ, SPARK_GRAFT_CPUS=cpus, SPARK_GRAFT_SF_DIR=sf_dir)
    env.pop("SPARK_MASTER", None)  # the probe IS about local[$CPUS]
    code = _CHILD.format(repo=REPO, entries=ENTRIES, repeats=repeats)
    proc = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, text=True,
        timeout=7200,
    )
    if proc.returncode != 0:
        raise RuntimeError(f"cpus={cpus} child failed: {proc.stderr[-2000:]}")
    for line in reversed(proc.stdout.strip().splitlines()):
        if line.startswith("CORE_SCALING "):
            return json.loads(line[len("CORE_SCALING "):])
    raise RuntimeError(f"cpus={cpus} child emitted no result: {proc.stdout[-500:]}")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/mdmp_sf1")
    cpus_list = os.environ.get("SPARK_GRAFT_SCALING_CPUS", "32,8").split(",")
    repeats = int(os.environ.get("SPARK_GRAFT_SCALING_REPEATS", "2"))
    results = {c: run_at(c.strip(), sf_dir, repeats) for c in cpus_list}
    hi, lo = cpus_list[0].strip(), cpus_list[-1].strip()
    ratio = {
        e: round(results[lo][e] / results[hi][e], 2)
        for e in ENTRIES
        if results[hi].get(e)
    }
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "entries": ENTRIES,
                "repeats": repeats,
                "cpus": results,
                f"ratio_{lo}_over_{hi}": ratio,
                "median_ratio": round(statistics.median(ratio.values()), 2),
            }
        )
    )


if __name__ == "__main__":
    main()
