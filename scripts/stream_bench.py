"""Measured streaming throughput — STREAM_BENCH.json.

The reference's RainStorm moves tuples through exec'd user binaries in
5-LINE batches over RPC (reference rainstorm/rainstorm.go:396-410 op1
exec per batch, :491-505 op2, :532-535 JSON line protocol), so its
single-node ceiling is process-spawn bound: ~5 rows per fork. This
script measures the Spark engine's end-to-end micro-batch throughput
on the SAME pipelines at sf0.1 — file-source triggers, checkpointed,
through to a materialized sink — and records rows/sec, the number the
"matches-or-beats reference throughput" claim rests on.

Pipelines (chunked input forces ≥ CHUNKS micro-batches, so the number
includes per-trigger planning/state overhead, not one fused batch):
  - rainstorm_filter_count : the reference demo pipeline (filter op1 →
    running count op2) via RainStormJob.start_stream
  - stateful_running_count : StatefulCountOp update log on event_type
  - windowed_count         : watermarked 1h tumbling counts
  - dedup_gate             : DedupGateOp keep-first verdicts over the
    documents corpus (fingerprint state)
  - minhash_sketch         : MinHashSketchOp per-source signature
    maintenance (shingle explode + md5 + 16 affine mins per trigger —
    the most compute-dense op in the set)
  - priority_sample        : PrioritySampleOp weighted panel
    maintenance (hash + integer priority + k-largest fold per trigger)

Usage: python scripts/stream_bench.py [--record]
Writes STREAM_BENCH.json only under --record; prints the JSON line
either way (the bench.py --record discipline).
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path



sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from distributed_file_system_with_stream_processing_spark.session import get_spark  # noqa: E402
from distributed_file_system_with_stream_processing_spark.sources.tables import load_table  # noqa: E402
from distributed_file_system_with_stream_processing_spark.streaming import ops as O  # noqa: E402
from distributed_file_system_with_stream_processing_spark.streaming.rainstorm import RainStormJob  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
CHUNKS = 10


def _chunked_source(df, tmp: Path, name: str) -> tuple[str, int]:
    """Write df as CHUNKS parquet files so maxFilesPerTrigger=1 yields
    CHUNKS micro-batches."""
    src = tmp / name
    n = df.count()
    df.repartition(CHUNKS).write.mode("overwrite").parquet(str(src))
    return str(src), n


def _drain_once(spark, stream_df, tmp: Path, tag: str) -> float:
    q = (
        stream_df.writeStream.format("memory")
        .queryName(f"sb_{tag}")
        .outputMode("update")
        .option("checkpointLocation", str(tmp / f"ckpt_{tag}"))
        .start()
    )
    t0 = time.time()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return time.time() - t0


def _drain(spark, make_stream_df, tmp: Path, tag: str) -> float:
    """min-of-2 with a fresh checkpoint per attempt — single-run local
    walls swing 2-5x (the bench.py discipline)."""
    return min(
        _drain_once(spark, make_stream_df(), tmp, f"{tag}_a{i}")
        for i in range(2)
    )


def main() -> None:
    record = "--record" in sys.argv
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    # state-store sizing: a micro-batch of ~10k rows does not need 32
    # shuffle/state partitions — 8 keeps per-trigger overhead honest
    # (the knob a real deployment sizes to its trigger volume; set
    # BEFORE queries start, the state-store count pins at query start)
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    tmp = Path(tempfile.mkdtemp(prefix="stream_bench_"))
    results: dict[str, dict] = {}
    try:
        events = load_table(spark, SF_DIR, "events")
        docs = load_table(spark, SF_DIR, "documents")
        ev_schema = events.schema
        doc_schema = docs.schema

        ev_src, ev_n = _chunked_source(events, tmp, "events")
        doc_src, doc_n = _chunked_source(docs, tmp, "docs")

        def reader(src, schema):
            return (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
            )

        # 1. the reference demo pipeline: filter op1 -> running count op2
        job = RainStormJob(
            O.filter_equals("event_type", "click"),
            O.StatefulCountOp("op2", ["event_type"]),
        )
        walls = []
        for i in range(2):
            q = job.start_stream(
                spark,
                ev_src,
                ev_schema,
                str(tmp / f"ckpt_rs_a{i}"),
                query_name=f"sb_rs_a{i}",
                max_files_per_trigger=1,
            )
            t0 = time.time()
            try:
                q.processAllAvailable()
            finally:
                q.stop()
            walls.append(time.time() - t0)
        results["rainstorm_filter_count"] = {
            "rows": ev_n,
            "wall_s": round(min(walls), 2),
        }

        # 2. stateful running count, all rows
        wall = _drain(
            spark,
            lambda: O.StatefulCountOp("rc", ["event_type"])(
                reader(ev_src, ev_schema)
            ),
            tmp,
            "rc",
        )
        results["stateful_running_count"] = {"rows": ev_n, "wall_s": round(wall, 2)}

        # 3. watermarked tumbling window counts
        wc = O.WindowedCountOp("wc", "ts", window="1 hour", watermark="2 hours")
        wall = _drain(spark, lambda: wc(reader(ev_src, ev_schema)), tmp, "wc")
        results["windowed_count"] = {"rows": ev_n, "wall_s": round(wall, 2)}

        # 4. exact-dedup gate over the documents corpus
        wall = _drain(
            spark,
            lambda: O.DedupGateOp("dg").stream_apply(reader(doc_src, doc_schema)),
            tmp,
            "dg",
        )
        results["dedup_gate"] = {"rows": doc_n, "wall_s": round(wall, 2)}

        # 4b. per-source minhash signature maintenance (compute-dense)
        wall = _drain(
            spark,
            lambda: O.MinHashSketchOp("mh").stream_apply(
                reader(doc_src, doc_schema)
            ),
            tmp,
            "mh",
        )
        results["minhash_sketch"] = {"rows": doc_n, "wall_s": round(wall, 2)}

        # 4c. weighted priority-sample panel maintenance (r9 s3 op)
        wall = _drain(
            spark,
            lambda: O.PrioritySampleOp("ps").stream_apply(
                reader(doc_src, doc_schema)
            ),
            tmp,
            "ps",
        )
        results["priority_sample"] = {"rows": doc_n, "wall_s": round(wall, 2)}

        # 5. amortization check: the SAME 100k rows in 2 triggers of
        # 50k — per-trigger overhead is constant, so rows/sec must
        # rise steeply (the claim that the 10-trigger numbers are
        # floors, measured rather than asserted)
        big = tmp / "events_big"
        events.repartition(2).write.mode("overwrite").parquet(str(big))
        big_reader = (
            spark.readStream.schema(ev_schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(big))
        )
        wall = _drain(
            spark,
            lambda: O.StatefulCountOp("rc2", ["event_type"])(big_reader),
            tmp,
            "rc2",
        )
        results["stateful_running_count_50k_trigger"] = {
            "rows": ev_n,
            "wall_s": round(wall, 2),
        }

        for v in results.values():
            v["rows_per_sec"] = int(v["rows"] / v["wall_s"]) if v["wall_s"] else 0

        out = {
            "metric": "structured-streaming end-to-end throughput",
            "sf": 0.1,
            "micro_batches": CHUNKS,
            "shuffle_partitions": 8,
            "pipelines": results,
            "reference_note": (
                "reference RainStorm execs a user binary per 5-line batch "
                "over RPC (rainstorm.go:396-410,491-505) — process-spawn "
                "bound at ~5 rows/fork; these numbers are the Spark "
                "micro-batch path on the same logical pipelines"
            ),
        }
        line = json.dumps(out)
        print(line)
        if record:
            Path("STREAM_BENCH.json").write_text(line + "\n")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
