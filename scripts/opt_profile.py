"""Round-9 optimization profiler: isolate declared queries with the
noop sink, record min-of-3 wall seconds, and dump
``.explain("formatted")`` for each into plans/r09/<query>_<tag>.txt.

Usage:
    python scripts/opt_profile.py --tag before q1 q2 ...
    python scripts/opt_profile.py --tag before --top N   # N slowest from BENCH_LOCAL.json
    python scripts/opt_profile.py --times-only q1 q2 ...  # no plan files

Methodology mirrors bench.py (same session settings, same noop sink,
min-of-3) so numbers are comparable with the committed bench records.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--top", type=int, default=0)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--times-only", action="store_true")
    ap.add_argument("--outdir", default="r10")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from distributed_file_system_with_stream_processing_spark.session import get_spark
    from distributed_file_system_with_stream_processing_spark.plans.registry import QUERIES

    names = list(args.queries)
    if args.top:
        with open(os.path.join(REPO, "BENCH_LOCAL.json")) as f:
            rec = json.load(f)
        ranked = sorted(rec["queries"].items(), key=lambda kv: -kv[1])
        names += [k for k, _ in ranked[: args.top] if k not in names]
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    spark = get_spark(app_name="opt_profile", master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    plans_dir = os.path.join(REPO, "plans", args.outdir)
    os.makedirs(plans_dir, exist_ok=True)

    # Warm JVM/footers the way bench.py does.
    QUERIES["q6_forecast_revenue"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    out: dict[str, float] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"opt_profile:{name}")
        best = None
        for _ in range(args.runs):
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
        if not args.times_only:
            buf = io.StringIO()
            with redirect_stdout(buf):
                QUERIES[name](spark, sf_dir).explain("formatted")
            with open(os.path.join(plans_dir, f"{name}_{args.tag}.txt"), "w") as f:
                f.write(buf.getvalue())
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"tag": args.tag, "sf_dir": sf_dir, "times": out, "total": round(sum(out.values()), 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
