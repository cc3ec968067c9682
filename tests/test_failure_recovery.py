"""Task-failure recovery — the Spark-native analogue of the reference's
batch rerouting.

The reference leader reroutes a batch to the next live worker in the
stage ring when an RPC times out (reference rainstorm/rainstorm.go:
340-352 stage-1, 433-447 stage-2). In Spark that whole mechanism is
the scheduler's: a failed task is retried on another executor up to
``spark.task.maxFailures`` times, and lineage recomputes exactly the
lost partition. This test injects a first-attempt failure inside a
running stage and proves the job completes with the right answer.

Runs in a subprocess because task retries need a ``local[N, F]``
master (F = max task attempts); the shared test session uses plain
``local[4]`` where any task failure kills the job.
"""

from __future__ import annotations

import subprocess
import sys
import textwrap

SCRIPT = textwrap.dedent(
    """
    import pandas as pd
    from pyspark import TaskContext
    from pyspark.sql import SparkSession

    # local[4, 3]: 4 threads, 3 attempts per task (reference ring has
    # 3 replicas to reroute across — same redundancy budget)
    spark = (
        SparkSession.builder.master("local[4, 3]")
        .config("spark.sql.shuffle.partitions", "4")
        .appName("failure-recovery")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    df = spark.range(0, 1000, 1, 8)

    def flaky(batches):
        ctx = TaskContext.get()
        # first attempt of partition 2 dies mid-stage; the retry runs clean
        if ctx.partitionId() == 2 and ctx.attemptNumber() == 0:
            raise RuntimeError("injected worker failure")
        for pdf in batches:
            yield pdf

    out = df.mapInPandas(flaky, "id long").agg({"id": "sum"}).collect()
    total = out[0][0]
    assert total == 499500, total
    print("RECOVERED_OK", total)
    """
)


def test_task_retry_recovers_injected_failure():
    res = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert "RECOVERED_OK 499500" in res.stdout, (res.stdout, res.stderr[-2000:])
    # the injected failure really happened (attempt 0 raised)
    assert "injected worker failure" in res.stderr
