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

Store root comes from --root or $SPARK_DFS_ROOT (default ./dfs_store).
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
    return 0


if __name__ == "__main__":
    sys.exit(main())
