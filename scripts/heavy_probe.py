"""Heavy-family slope probe across fixture tiers (r9, VERDICT item 5).

Times the six most expensive catalog entries — the ones whose sf1 behavior
adjudicates the 100 TB claims (`corpus_audit`, `dedup_reports`,
`incremental_ingest`, `cf_recommendations_capped`, `fpgrowth_rules`,
`semantic_dedup`) — at one fixture directory, with the same per-entry
spill/peak-memory telemetry bench.py records (it delegates to
``bench._time_catalog`` — one timing loop in the repo, by design). Two
tiers make a slope; three make a trend: run at sf0.1, the synthesized sf1
(`scripts/build_sf1.py`) and the weak-scaled ~sf5
(`SPARK_GRAFT_SCALE_COPIES=50 SPARK_GRAFT_SCALE_OUT=/tmp/mdmp_sf5`).

Cold semantics match bench.py's cold pass: a fresh temp model-cache root,
single-shot timings.

Run:  SPARK_GRAFT_SF_DIR=/tmp/mdmp_sf1 python scripts/heavy_probe.py
Prints one JSON line: {"sf_dir": ..., "queries": {...}, "telemetry": {...}}
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEAVIES = (
    "corpus_audit",
    "dedup_reports",
    "incremental_ingest",
    "cf_recommendations_capped",
    "fpgrowth_rules",
    "semantic_dedup",
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # comma-separated subset (e.g. exclude dedup_reports where the
    # deliberately-uncapped exact jaccard's linear spill exceeds the test
    # host's free disk — ~25 GB/sf1-unit; the capped scale path rides
    # corpus_audit)
    heavies = tuple(
        h for h in os.environ.get("SPARK_GRAFT_HEAVIES", ",".join(HEAVIES)).split(",") if h
    )
    # cold like bench.py: no persisted artifacts from a previous session
    import atexit
    import shutil

    cache_root = tempfile.mkdtemp(prefix="mdmp_heavy_cache_")
    os.environ["SPARK_GRAFT_MODEL_DIR"] = cache_root
    atexit.register(shutil.rmtree, cache_root, True)

    import bench

    from market_data_mining_project_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark("mdmp-heavy-probe", **{"spark.ui.enabled": "true"})
    bench._warmup(spark)
    queries = {k: v for k, v in entry_mod.queries().items() if k in heavies}
    missing = set(heavies) - set(queries)
    if missing:
        raise SystemExit(f"heavy entries missing from the catalog: {sorted(missing)}")
    telemetry: dict = {}
    timings = bench._time_catalog(spark, queries, sf_dir, repeats=1, telemetry=telemetry)
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "total_sec": round(sum(timings.values()), 3),
                "queries": timings,
                "telemetry": telemetry,
            }
        )
    )


if __name__ == "__main__":
    main()
