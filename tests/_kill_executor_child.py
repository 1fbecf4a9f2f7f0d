"""Child process for the executor-loss recovery test (see test_lineage.py).

Runs an iterative truncate_lineage loop under a MULTI-EXECUTOR master
(``SPARK_MASTER=local-cluster[2,4,2048]`` — two separate executor JVMs,
set by the parent) with ``SPARK_GRAFT_CHECKPOINT_DIR`` pointing at a
shared-disk dir, SIGKILLs one of its own executor JVMs mid-loop, and
verifies the job completes with the exact expected result.

This is the recovery contract the reliable-checkpoint knob exists for: a
``localCheckpoint`` block on the killed executor would be unrecoverable
(lineage is truncated, so nothing can recompute it) and the job would
abort; reliable checkpoint blocks live in the fault-tolerant store and the
surviving/relaunched executors re-read them. Needs its own process because
a pytest session already holds a local[*] SparkContext and one JVM can't
host a second master.
"""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import time

# repo-root bootstrap (script dir is tests/, the package lives one up)
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from pyspark.sql import functions as F

from market_data_mining_project_spark.session import get_spark, truncate_lineage

N_ROWS = 20_000
N_ITERS = 6
KILL_AFTER_ITER = 2


def _own_executor_pids(driver_port: str) -> list[int]:
    """PIDs of THIS app's executor JVMs — matched on the driver port in
    the CoarseGrainedExecutorBackend command line, so a concurrent Spark
    app on the same host (other test sessions, sweeps) is never touched."""
    out = subprocess.check_output(["ps", "-eo", "pid,args"]).decode()
    pids = []
    for line in out.splitlines():
        if "CoarseGrainedExecutorBackend" in line and f":{driver_port}" in line:
            pids.append(int(line.split(None, 1)[0]))
    return pids


def main() -> None:
    assert os.environ.get("SPARK_MASTER", "").startswith("local-cluster"), (
        "parent must set SPARK_MASTER=local-cluster[...]"
    )
    assert os.environ.get("SPARK_GRAFT_CHECKPOINT_DIR"), (
        "parent must set SPARK_GRAFT_CHECKPOINT_DIR"
    )
    spark = get_spark(
        "executor-kill-test",
        **{
            # UI ON: the post-kill churn-line assertion below reads the
            # app status REST API, which rides the UI server
            "spark.ui.enabled": "true",
            "spark.sql.shuffle.partitions": "8",
            # give the scheduler room to reschedule the killed executor's
            # in-flight tasks (default 4 is enough; explicit for clarity)
            "spark.task.maxFailures": "8",
        },
    )
    driver_port = spark.sparkContext.getConf().get("spark.driver.port")

    df = spark.range(0, N_ROWS, 1, 8).withColumn("v", F.col("id"))
    killed = False
    for i in range(N_ITERS):
        df = truncate_lineage(df.withColumn("v", F.col("v") + 1))
        if i == KILL_AFTER_ITER:
            # both executors have by now written + read checkpoint blocks;
            # kill one JVM outright (SIGKILL — no shutdown hooks, the
            # crash shape, not a graceful decommission). POLL for both
            # executor JVMs first: on a loaded host (the full pytest suite
            # plus concurrent sweeps) the second executor can still be
            # registering when this iteration arrives, and an immediate
            # assert flakes (r11, in-suite run).
            deadline = time.monotonic() + 60
            while time.monotonic() < deadline:
                pids = _own_executor_pids(driver_port)
                if len(pids) >= 2:
                    break
                time.sleep(0.5)
            assert len(pids) >= 2, f"expected 2 executor JVMs, ps found {pids}"
            os.kill(pids[0], signal.SIGKILL)
            deadline = time.monotonic() + 30
            while time.monotonic() < deadline:
                if pids[0] not in _own_executor_pids(driver_port):
                    break
                time.sleep(0.5)
            else:
                raise AssertionError(f"executor pid {pids[0]} survived SIGKILL")
            killed = True
    total = df.agg(F.sum("v")).collect()[0][0]
    expected = N_ROWS * (N_ROWS - 1) // 2 + N_ITERS * N_ROWS
    assert killed, "kill branch never ran"
    assert total == expected, f"wrong result after executor loss: {total} != {expected}"
    # the reliable store must actually have been used
    ckpt = os.environ["SPARK_GRAFT_CHECKPOINT_DIR"]
    files = [f for _, _, fs in os.walk(ckpt) for f in fs]
    assert files, "reliable checkpoint dir is empty"
    # the harness's executor-churn observability line must COUNT the loss:
    # queried while the app is alive, so the SIGKILLed executor shows as
    # removed (never confusable with the standalone teardown race)
    from tests.oracle_harness import executor_churn_line

    churn = executor_churn_line(spark)
    print(churn)
    assert churn and "removed=" in churn and "removed=0" not in churn, (
        f"churn line failed to count the killed executor: {churn!r}"
    )
    print(f"KILLTEST_OK total={total} ckpt_files={len(files)}")
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
