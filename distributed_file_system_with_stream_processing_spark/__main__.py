"""Command-line surface mirroring the reference's interactive client
(reference user/user.go command loop: create/get/append/merge/ls/
store/getfromreplica/multiappend/list_mem_ids).

    python -m distributed_file_system_with_stream_processing_spark create  <table> <parquet_path>
    python -m distributed_file_system_with_stream_processing_spark append  <table> <parquet_path>
    python -m distributed_file_system_with_stream_processing_spark multiappend <table> <path> [<path> ...]
    python -m distributed_file_system_with_stream_processing_spark get     <table> [--limit N]
    python -m distributed_file_system_with_stream_processing_spark getfromreplica <table> [--batch SEQ]
    python -m distributed_file_system_with_stream_processing_spark merge   <table>
    python -m distributed_file_system_with_stream_processing_spark ls      <table>
    python -m distributed_file_system_with_stream_processing_spark store
    python -m distributed_file_system_with_stream_processing_spark list_mem_ids
    python -m distributed_file_system_with_stream_processing_spark rainstorm \
        <op1_exe> <op2_exe> <src_table> <dest_table> [--op2-mode aggregate] \
        [--line-col value]

Store root comes from --root or $SPARK_DFS_ROOT (default ./dfs_store).

``rainstorm`` is the reference's flagship invocation
(user/user.go:482 → rainstorm.go:104 RainstormCmd(op1, op2, src,
dest, num_tasks)): two user EXECUTABLES run over a stored file, the
per-batch outputs merge at the leader, and results append to the dest
file. Here op1 runs as a Transform :class:`streaming.pipe.PipeOp`
(stdin lines → stdout lines), op2 as Transform or Aggregate (JSON
``{category: count}`` partials merged by key), the source is a
TableStore table with a string line column, the result appends into
the dest table, and rows print to the console like the leader's
output. ``num_tasks`` has no analogue — Spark owns task parallelism.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="distributed_file_system_with_stream_processing_spark")
    ap.add_argument("--root", default=os.environ.get("SPARK_DFS_ROOT", "./dfs_store"))
    sub = ap.add_subparsers(dest="cmd", required=True)
    for cmd in ("create", "append"):
        p = sub.add_parser(cmd)
        p.add_argument("table")
        p.add_argument("path")
    p = sub.add_parser("multiappend")
    p.add_argument("table")
    p.add_argument("paths", nargs="+")
    p = sub.add_parser("get")
    p.add_argument("table")
    p.add_argument("--limit", type=int, default=20)
    p = sub.add_parser("getfromreplica")
    p.add_argument("table")
    p.add_argument("--batch", default=None)
    for cmd in ("merge", "ls"):
        sub.add_parser(cmd).add_argument("table")
    sub.add_parser("store")
    sub.add_parser("list_mem_ids")
    p = sub.add_parser("rainstorm")
    p.add_argument("op1_exe")
    p.add_argument("op2_exe")
    p.add_argument("src_table")
    p.add_argument("dest_table")
    p.add_argument("--op2-mode", choices=("transform", "aggregate"), default="aggregate")
    p.add_argument("--line-col", default=None)
    args = ap.parse_args(argv)

    from distributed_file_system_with_stream_processing_spark.dfs import TableStore, list_members
    from distributed_file_system_with_stream_processing_spark.session import get_spark

    spark = get_spark(app_name="dfs-cli")
    spark.sparkContext.setLogLevel("ERROR")
    store = TableStore(spark, args.root)

    if args.cmd == "create":
        store.create(args.table, spark.read.parquet(args.path))
        print(f"created {args.table}")
    elif args.cmd == "append":
        seq = store.append(args.table, spark.read.parquet(args.path))
        print(f"appended {args.table} batch {seq}")
    elif args.cmd == "multiappend":
        seqs = store.multiappend(
            args.table, [spark.read.parquet(p) for p in args.paths]
        )
        print(json.dumps({"table": args.table, "batches": seqs}))
    elif args.cmd == "get":
        for row in store.get(args.table).limit(args.limit).collect():
            print(json.dumps(row.asDict(), default=str))
    elif args.cmd == "getfromreplica":
        for row in store.get_from_replica(args.table, args.batch).collect():
            print(json.dumps(row.asDict(), default=str))
    elif args.cmd == "merge":
        print(f"merged {store.merge(args.table)} batches")
    elif args.cmd == "ls":
        print(json.dumps(store.ls(args.table)))
    elif args.cmd == "store":
        print(json.dumps(store.store()))
    elif args.cmd == "list_mem_ids":
        print(json.dumps(list_members(spark)))
    elif args.cmd == "rainstorm":
        from distributed_file_system_with_stream_processing_spark.streaming.pipe import (
            PipeOp,
            run_pipe,
        )

        src = store.get(args.src_table)
        line_col = args.line_col
        if line_col is None:
            strings = [
                f.name for f in src.schema.fields if f.dataType.typeName() == "string"
            ]
            if len(strings) != 1:
                raise SystemExit(
                    f"src table has {len(strings)} string columns; pass --line-col"
                )
            line_col = strings[0]
        stage2 = run_pipe(src, PipeOp("op1", (args.op1_exe,), "transform"), line_col)
        result = run_pipe(stage2, PipeOp("op2", (args.op2_exe,), args.op2_mode))
        if store.exists(args.dest_table):
            seq = store.append(args.dest_table, result)
            print(f"appended {args.dest_table} batch {seq}")
        else:
            store.create(args.dest_table, result)
            print(f"created {args.dest_table}")
        for row in store.get(args.dest_table).collect():
            print(json.dumps(row.asDict(), default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main())
