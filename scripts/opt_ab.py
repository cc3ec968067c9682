"""Interleaved A/B config test: alternate config blocks several times
within one session so box-noise windows hit both configs equally;
report per-query min wall seconds under each config.

Usage: python scripts/opt_ab.py [--alts 3] [--runs 2] q1 q2 ...
Configs are edited in CONFIGS below.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CONFIGS = {
    "A:baseline": {
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "true",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64m",
    },
    "B:coalesce": {
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64m",
    },
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--alts", type=int, default=3)
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from distributed_file_system_with_stream_processing_spark.session import get_spark
    from distributed_file_system_with_stream_processing_spark.plans.registry import QUERIES

    spark = get_spark(app_name="opt_ab", master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["q6_forecast_revenue"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    best: dict[tuple[str, str], float] = {}
    for alt in range(args.alts):
        for cfg_name, cfg in CONFIGS.items():
            for k, v in cfg.items():
                spark.conf.set(k, v)
            for q in args.queries:
                for _ in range(args.runs):
                    t0 = time.perf_counter()
                    QUERIES[q](spark, sf_dir).write.format("noop").mode("overwrite").save()
                    dt = time.perf_counter() - t0
                    key = (cfg_name, q)
                    best[key] = min(best.get(key, 1e9), dt)
        print(f"after alternation {alt + 1}:", flush=True)
        for cfg_name in CONFIGS:
            row = {q: round(best[(cfg_name, q)], 2) for q in args.queries if (cfg_name, q) in best}
            print(" ", cfg_name, json.dumps(row), "sum", round(sum(row.values()), 2), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
