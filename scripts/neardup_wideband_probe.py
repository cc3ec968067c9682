"""r8 probe (r7 verdict #5): price the WIDE-band `embedding_neardup`
variant (rows_per_band 8 → 16, i.e. 16-bit band keys) against the
registered capped default at sf0.1 and sf1.

The capped default's sf1 wall (20.5 s in the r7 rehearsal) is
dominated by candidate-pair VERIFY volume (~4.9 M pairs × the 64-term
codegen dot). Wider band keys quarter the random-collision rate per
band (2⁻¹⁶ vs 2⁻⁸ per pair per band) while true duplicates still
collide in every band — the lever the r7 docstring prescribed for
replica-dense scale. Recall on planted floods is pinned in
tests/test_ann.py::test_wideband_neardup_recall_pinned.

Emits one JSON line per (variant, sf) with wall (min of 2 warm runs)
and the emitted pair count, then a verdict line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

SF01 = os.environ.get("SF01_DIR", "/root/testdata/sf0.1")
SF1 = os.environ.get(
    "SF1_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".sf1"),
)


def run(fn, runs: int = 2) -> float:
    fn().write.format("noop").mode("overwrite").save()  # discarded warm pass
    times = []
    for _ in range(runs):
        t0 = time.time()
        fn().write.format("noop").mode("overwrite").save()
        times.append(time.time() - t0)
    return min(times)


def main() -> None:
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SF1_DRIVER_MEM", "48g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from distributed_file_system_with_stream_processing_spark.operators import similarity as S
    from distributed_file_system_with_stream_processing_spark.sources.tables import load_table

    variants = {
        "default_8x8_cap50": dict(bands=8, rows_per_band=8, bucket_cap=50),
        "wide_8x16_cap50": dict(bands=8, rows_per_band=16, bucket_cap=50),
    }
    out = []
    for sf_name, sf_dir in (("sf0.1", SF01), ("sf1", SF1)):
        emb = load_table(spark, sf_dir, "embeddings")
        for name, kw in variants.items():
            fn = lambda: S.banded_neardup_pairs(  # noqa: E731
                emb, threshold=0.35, dim=64, **kw
            )
            wall = run(fn)
            pairs = fn().count()
            rec = {"variant": name, "sf": sf_name, "wall_s": round(wall, 2), "pairs": pairs}
            print(json.dumps(rec), flush=True)
            out.append(rec)
    with open("NEARDUP_WIDEBAND_PROBE.json", "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
