"""Price the connected_components gate boundary (r9 verdict item 3).

The CC operator routes edge sets below ``_util.GATE_MAX_ROWS`` to a
driver union-find (Arrow collect + pure-Python labeling) and larger
sets to the distributed star-contraction loop. This probe measures
BOTH paths on the SAME synthetic edge sets at 0.5M / 1M / 2M edges so
the gate constant is justified by a measured crossover instead of the
broadcast-bound analogy it inherited in r9.

Edge shape: half long chains (forces several star-contraction rounds —
the distributed path's worst case), half pseudo-random hash edges
(multi-root union-find churn — the driver path's worst case), all
derived deterministically from spark.range (no rand()).

Usage: python scripts/cc_gate_probe.py   # writes CC_GATE_PROBE.json
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SIZES = [500_000, 1_000_000, 2_000_000]


def synth_edges(spark, n_edges: int):
    from pyspark.sql import functions as F

    half = n_edges // 2
    n_nodes = n_edges  # ~1 edge per node: sparse, CC-typical
    chain = spark.range(half).select(
        F.col("id").alias("doc_id_a"), (F.col("id") + 1).alias("doc_id_b")
    )
    rnd = spark.range(half).select(
        (F.abs(F.xxhash64(F.col("id"))) % n_nodes).alias("doc_id_a"),
        (F.abs(F.xxhash64(F.col("id") + 7)) % n_nodes).alias("doc_id_b"),
    )
    return chain.unionByName(rnd).filter(F.col("doc_id_a") != F.col("doc_id_b"))


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from distributed_file_system_with_stream_processing_spark.operators import _util
    from distributed_file_system_with_stream_processing_spark.operators import dedup as D
    from distributed_file_system_with_stream_processing_spark.session import get_spark

    spark = get_spark(
        app_name="cc_gate_probe", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")

    results = []
    for n in SIZES:
        edges = synth_edges(spark, n).localCheckpoint(eager=True)
        row = {"n_edges_requested": n, "n_edges_distinct": None}
        for path, gate in (("driver_union_find", n + 10), ("distributed_loop", 0)):
            _util.GATE_MAX_ROWS, saved = gate, _util.GATE_MAX_ROWS
            try:
                best = None
                for _ in range(2):
                    t0 = time.perf_counter()
                    out = D.connected_components(edges)
                    out.write.format("noop").mode("overwrite").save()
                    dt = time.perf_counter() - t0
                    best = dt if best is None else min(best, dt)
                row[path] = round(best, 3)
            finally:
                _util.GATE_MAX_ROWS = saved
        row["n_edges_distinct"] = edges.distinct().count()
        results.append(row)
        print(json.dumps(row), flush=True)

    out = {
        "method": "min-of-2 noop-sink seconds per path, same synthetic edges "
        "(half chain / half hash-random), local[" + cpus + "]",
        "gate_max_rows": _util.GATE_MAX_ROWS,
        "results": results,
    }
    with open(Path(__file__).resolve().parent.parent / "CC_GATE_PROBE.json", "w") as f:
        json.dump(out, f, indent=2)
    spark.stop()


if __name__ == "__main__":
    main()
