"""PipeOp: the reference's compiled-binary user-op contract
(rainstorm.go:357-450 stage-2 exec, :491-575 stage-3 exec + leader
merge) run through real subprocesses, checked against the declarative
twins in streaming/ops.py. Transform uses /bin/grep (a genuinely
compiled filter binary); Aggregate uses a tiny Python script emitting
the reference's JSON record envelope.
"""

from __future__ import annotations

import os
import stat
import sys

from pyspark.sql import functions as F

from distributed_file_system_with_stream_processing_spark.streaming.pipe import (
    PipeOp,
    run_pipe,
)

_LINES = [
    "1,click,hello world",
    "2,view,hello spark",
    "3,click,bye world",
    "4,purchase,hello again",
    "5,view,nothing here",
    "6,click,hello hello",
]


def _lines_df(spark, lines=_LINES):
    return spark.createDataFrame([(ln,) for ln in lines], "value string")


def _agg_script(tmp_path) -> str:
    """A stand-in for the reference's op2 binary: count the second
    CSV field per input batch, print the enveloped JSON record
    (rainstorm.go:532-541)."""
    p = tmp_path / "op2_count_categories.py"
    p.write_text(
        "#!" + sys.executable + "\n"
        "import sys, json, collections\n"
        "c = collections.Counter(\n"
        "    ln.split(',')[1] for ln in sys.stdin.read().splitlines() if ln\n"
        ")\n"
        "print(json.dumps({'Type': 'Aggregate', 'Data': json.dumps(dict(c))}))\n"
    )
    os.chmod(p, os.stat(p).st_mode | stat.S_IXUSR)
    return str(p)


def test_pipe_transform_grep_matches_declarative_filter(spark):
    """grep through a subprocess == F.contains through Catalyst —
    the rs_filter_project parity the reference's op1_t1 exercises."""
    df = _lines_df(spark)
    op = PipeOp("grep_hello", ("/bin/grep", "hello"), mode="transform")
    got = sorted(r["value"] for r in run_pipe(df, op).collect())
    want = sorted(
        r["value"]
        for r in df.filter(F.col("value").contains("hello")).collect()
    )
    assert got == want
    assert len(got) == 4


def test_pipe_transform_no_matches_is_empty_not_error(spark):
    """grep exits 1 on no matches — the Unix filter contract must map
    to an empty batch, not a task failure."""
    df = _lines_df(spark)
    op = PipeOp("grep_none", ("/bin/grep", "zzz_absent"), mode="transform")
    assert run_pipe(df, op).count() == 0


def test_pipe_aggregate_matches_declarative_count_by(spark, tmp_path):
    """Per-batch JSON partials merged by key == groupBy().count():
    the leader's running AggregateCounts map (rainstorm.go:551-559)
    is associative, so Arrow batch boundaries can't change it."""
    script = _agg_script(tmp_path)
    # Repartition so multiple subprocess batches must merge.
    df = _lines_df(spark).repartition(4)
    op = PipeOp("count_cat", (sys.executable, script), mode="aggregate")
    got = {(r["key"], r["cnt"]) for r in run_pipe(df, op).collect()}
    assert got == {("click", 3), ("view", 2), ("purchase", 1)}


def test_pipe_transform_streaming_matches_batch(spark, tmp_path):
    """The same PipeOp runs unchanged on a file stream: availableNow
    boundary output == the batch run (stateless mapInPandas)."""
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    _lines_df(spark).coalesce(1).write.mode("append").text(src)

    op = PipeOp("grep_hello", ("/bin/grep", "hello"), mode="transform")
    stream = spark.readStream.schema("value string").text(src)
    q = (
        run_pipe(stream, op)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r["value"] for r in spark.read.parquet(sink).collect())
    want = sorted(
        r["value"] for r in run_pipe(_lines_df(spark), op).collect()
    )
    assert got == want and len(got) == 4


def test_pipe_aggregate_streaming_running_counts(spark, tmp_path):
    """Aggregate PipeOp on a stream: per-micro-batch JSON partials
    merged by a streaming groupBy in complete mode — the leader's
    running AggregateCounts map (rainstorm.go:551-559) re-expressed;
    at the availableNow boundary the totals equal the batch run."""
    script = _agg_script(tmp_path)
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    _lines_df(spark).coalesce(2).write.mode("append").text(src)

    op = PipeOp("count_cat", (sys.executable, script), mode="aggregate")
    stream = spark.readStream.schema("value string").text(src)
    q = (
        run_pipe(stream, op)
        .writeStream.format("memory")
        .queryName("pipe_agg_counts")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["key"], r["cnt"])
        for r in spark.sql("SELECT * FROM pipe_agg_counts").collect()
    }
    assert got == {("click", 3), ("view", 2), ("purchase", 1)}


def test_cli_rainstorm_runs_binaries_end_to_end(spark, tmp_path, capsys):
    """The reference's flagship invocation (user/user.go:482:
    RainStorm op1 op2 src dest) through the CLI: grep as op1, the JSON
    category counter as op2, source and destination both TableStore
    tables — dest holds the merged running counts, console prints them
    (the leader's output contract)."""
    from distributed_file_system_with_stream_processing_spark.__main__ import main
    from distributed_file_system_with_stream_processing_spark.dfs import TableStore

    root = str(tmp_path / "store")
    store = TableStore(spark, root)
    store.create("src", _lines_df(spark))
    grep = "/bin/grep"
    op2 = _agg_script(tmp_path)
    # op1 = grep needs its pattern; wrap in a tiny shim script
    shim = tmp_path / "op1_grep_hello.sh"
    shim.write_text(f"#!/bin/sh\nexec {grep} hello\n")
    import os as _os
    import stat as _stat

    _os.chmod(shim, _os.stat(shim).st_mode | _stat.S_IXUSR)
    rc = main(
        [
            "--root",
            root,
            "rainstorm",
            str(shim),
            op2,
            "src",
            "dest",
        ]
    )
    assert rc == 0
    got = {
        (r["key"], r["cnt"]) for r in store.get("dest").collect()
    }
    # grep hello keeps 4 lines: click x2, view x1, purchase x1
    assert got == {("click", 2), ("view", 1), ("purchase", 1)}
    out = capsys.readouterr().out
    assert "click" in out and "dest" in out
