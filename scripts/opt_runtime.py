"""Runtime diagnosis for the round-9 optimization: for each query,
run once (noop sink) under a dedicated job group and report
- #jobs / #stages / #tasks the invocation scheduled (driver loops,
  eager checkpoints and gate counts show up here — explain() cannot
  see them), and
- the executed (post-AQE) plan's node histogram (Exchange vs
  ReusedExchange vs BroadcastExchange, scans), which answers whether
  AQE stage reuse deduplicates repeated subtrees at runtime.

Usage: python scripts/opt_runtime.py q1 q2 ...
"""

from __future__ import annotations

import json
import os
import sys
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def node_histogram(df) -> Counter:
    acc: Counter = Counter()
    seen_stages: set[int] = set()

    def walk(node) -> None:
        name = node.nodeName()
        if name.startswith("AdaptiveSparkPlan"):
            walk(node.executedPlan())
            return
        if "QueryStage" in name:
            sid = node.id()
            if sid in seen_stages:
                acc["ReusedStage"] += 1
                return
            seen_stages.add(sid)
            walk(node.plan())
            return
        acc[name.split()[0]] += 1
        if name.startswith("ReusedExchange"):
            return
        ch = node.children()
        for i in range(ch.length()):
            walk(ch.apply(i))

    walk(df._jdf.queryExecution().executedPlan())
    return acc


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from distributed_file_system_with_stream_processing_spark.session import get_spark
    from distributed_file_system_with_stream_processing_spark.plans.registry import QUERIES

    spark = get_spark(app_name="opt_runtime", master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    QUERIES["q6_forecast_revenue"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    for name in sys.argv[1:]:
        sc.setJobGroup(f"diag:{name}", name)
        df = QUERIES[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        tracker = sc.statusTracker()
        job_ids = tracker.getJobIdsForGroup(f"diag:{name}")
        # Execute THIS DataFrame's own QueryExecution so the walked
        # plan is the post-AQE final one (a noop write clones the
        # execution; its plan is not reachable from Python). Runs
        # AFTER the job/stage/task census of the noop-sink run.
        for _ in df.toLocalIterator():
            pass
        n_stages = 0
        n_tasks = 0
        for j in job_ids:
            ji = tracker.getJobInfo(j)
            if ji is None:
                continue
            for s in ji.stageIds:
                si = tracker.getStageInfo(s)
                if si is not None:
                    n_stages += 1
                    n_tasks += si.numTasks
        hist = node_histogram(df)
        interesting = {
            k: v
            for k, v in hist.items()
            if k.rstrip("*(0123456789)").split("(")[0]
            in (
                "Exchange", "ReusedExchange", "BroadcastExchange", "Scan",
                "SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
                "BroadcastNestedLoopJoin", "CartesianProduct", "Window", "Sort",
                "ArrowEvalPython", "BatchEvalPython", "MapInPandas", "PythonMapInArrow",
                "ObjectHashAggregate", "SortAggregate", "ReusedStage",
            )
        }
        print(json.dumps({
            "query": name,
            "jobs": len(job_ids),
            "stages": n_stages,
            "tasks": n_tasks,
            "result_plan": dict(sorted(interesting.items())),
        }), flush=True)
        sc.setJobGroup("idle", "idle")
    spark.stop()


if __name__ == "__main__":
    main()
