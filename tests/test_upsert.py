"""KeyedUpsertSink: streaming MERGE-INTO on bucketed parquet —
latest-per-key state, partial (touched-buckets-only) rewrites,
idempotent replay, and the live foreachBatch path."""

from __future__ import annotations

import os

from distributed_file_system_with_stream_processing_spark.sinks.upsert import (
    KeyedUpsertSink,
    stream_upsert,
)

SCHEMA = "k long, v string, ver long"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _state(sink, spark):
    return {
        (r["k"]): (r["v"], r["ver"]) for r in sink.snapshot(spark).collect()
    }


def test_upsert_latest_per_key(spark, tmp_path):
    sink = KeyedUpsertSink(str(tmp_path / "s"), key="k", order_col="ver", n_buckets=4)
    sink.apply_batch(_df(spark, [(1, "a", 1), (2, "b", 1), (1, "a2", 2)]), 0)
    assert _state(sink, spark) == {1: ("a2", 2), 2: ("b", 1)}

    # second batch: update k=1 (newer ver), stale update for k=2 (older
    # ver loses), brand-new k=3
    sink.apply_batch(_df(spark, [(1, "a3", 5), (2, "stale", 0), (3, "c", 1)]), 1)
    assert _state(sink, spark) == {1: ("a3", 5), 2: ("b", 1), 3: ("c", 1)}


def test_upsert_rewrites_only_touched_buckets(spark, tmp_path):
    sink = KeyedUpsertSink(str(tmp_path / "s"), key="k", order_col="ver", n_buckets=8)
    sink.apply_batch(_df(spark, [(i, "x", 1) for i in range(40)]), 0)

    before = {}
    for d in os.listdir(sink.state_dir):
        p = os.path.join(sink.state_dir, d)
        before[d] = {f: os.stat(os.path.join(p, f)).st_mtime_ns for f in os.listdir(p)}

    # one key → one bucket touched
    sink.apply_batch(_df(spark, [(7, "y", 2)]), 1)

    changed = []
    for d in os.listdir(sink.state_dir):
        p = os.path.join(sink.state_dir, d)
        now = {f: os.stat(os.path.join(p, f)).st_mtime_ns for f in os.listdir(p)}
        if now != before[d]:
            changed.append(d)
    assert len(changed) == 1, changed
    assert _state(sink, spark)[7] == ("y", 2)


def test_upsert_replay_idempotent(spark, tmp_path):
    sink = KeyedUpsertSink(str(tmp_path / "s"), key="k", order_col="ver", n_buckets=4)
    b0 = [(1, "a", 1), (2, "b", 2)]
    b1 = [(1, "a2", 3), (3, "c", 1)]
    sink.apply_batch(_df(spark, b0), 0)
    sink.apply_batch(_df(spark, b1), 1)
    once = _state(sink, spark)
    # foreachBatch replays the last batch after a crash-restart
    sink.apply_batch(_df(spark, b1), 1)
    assert _state(sink, spark) == once


def test_stream_upsert_end_to_end(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    sink = KeyedUpsertSink(str(tmp_path / "s"), key="k", order_col="ver", n_buckets=4)
    ckpt = str(tmp_path / "ckpt")

    _df(spark, [(1, "a", 1), (2, "b", 1)]).coalesce(1).write.mode("append").parquet(src)
    q = stream_upsert(spark, src, SCHEMA, ckpt, sink)
    q.awaitTermination(120)
    assert _state(sink, spark) == {1: ("a", 1), 2: ("b", 1)}

    # more source files, restart from checkpoint: only new files processed
    _df(spark, [(1, "a9", 9), (3, "c", 1)]).coalesce(1).write.mode("append").parquet(src)
    q = stream_upsert(spark, src, SCHEMA, ckpt, sink)
    q.awaitTermination(120)
    assert _state(sink, spark) == {1: ("a9", 9), 2: ("b", 1), 3: ("c", 1)}


def test_upsert_recovers_interrupted_swap(spark, tmp_path):
    """Crash in the worst swap window (bucket retired, replacement not
    yet renamed in): the next call must roll the swap back — no key may
    ever vanish from the snapshot."""
    import shutil

    sink = KeyedUpsertSink(str(tmp_path / "s"), key="k", order_col="ver", n_buckets=4)
    sink.apply_batch(_df(spark, [(i, "x", 1) for i in range(12)]), 0)
    before = _state(sink, spark)

    # simulate: crash left one bucket renamed aside and nothing in its place
    victim = sorted(os.listdir(sink.state_dir))[0]
    os.rename(
        os.path.join(sink.state_dir, victim),
        os.path.join(sink.state_dir, f".old-{victim}"),
    )
    assert _state(sink, spark) == before  # rolled back, nothing lost

    # simulate: crash after the new dir landed but before retiring cleanup
    shutil.copytree(
        os.path.join(sink.state_dir, victim),
        os.path.join(sink.state_dir, f".old-{victim}"),
    )
    assert _state(sink, spark) == before  # stale retired dir dropped
    assert not any(d.startswith(".old-") for d in os.listdir(sink.state_dir))
