"""Multi-format table IO + small-file compaction.

The reference stores tables as opaque replicated files; format is the
client's concern (user.go create/get move whole files). Spark-side the
format IS the table contract, so the engine exposes the columnar
formats Spark ships in-box:

- parquet (default everywhere else in this repo)
- ORC     (second columnar format, same pushdown/pruning machinery)
- JSON / CSV (interchange; schema must be supplied on read — text
  formats carry no types, so round-trips go through an explicit DDL)

Avro requires the external spark-avro package; ``write_table`` raises
a clear error when the classpath lacks it rather than failing deep in
the JVM.

``compact_files`` is the small-files fixer: streaming sinks and
per-batch appends produce many tiny files, and at 100 TB the file
count (not byte count) becomes the scan-planning bottleneck — parquet
footer reads, driver-side listing, one task per splittable unit.
Compaction rewrites a directory to ~target-sized files with an atomic
two-rename swap (same crash-safe protocol as dfs.TableStore.merge /
sinks.upsert.KeyedUpsertSink — never a delete-then-rename gap).
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

_BUILTIN = ("parquet", "orc", "json", "csv")


def write_table(df: DataFrame, path: str, fmt: str = "parquet") -> None:
    """Write df at path in the given format (overwrite)."""
    if fmt == "avro":
        raise ValueError(
            "avro needs the external spark-avro package on the classpath; "
            "add org.apache.spark:spark-avro to spark.jars.packages"
        )
    if fmt not in _BUILTIN:
        raise ValueError(f"unsupported format {fmt!r}; built-in: {_BUILTIN}")
    w = df.write.mode("overwrite").format(fmt)
    if fmt == "csv":
        w = w.option("header", "true")
    w.save(path)


def read_table(
    spark: SparkSession, path: str, fmt: str = "parquet", schema: str | None = None
) -> DataFrame:
    """Read a table written by write_table. For json/csv pass the DDL
    ``schema`` — text formats carry no types, and schema inference is
    both a full extra pass over the data at scale and non-deterministic
    under sampling, so the engine requires it explicitly."""
    if fmt not in _BUILTIN:
        raise ValueError(f"unsupported format {fmt!r}; built-in: {_BUILTIN}")
    r = spark.read.format(fmt)
    if fmt in ("json", "csv"):
        if schema is None:
            raise ValueError(f"{fmt} read requires an explicit schema DDL")
        r = r.schema(schema)
    if fmt == "csv":
        r = r.option("header", "true")
    return r.load(path)


def _data_files(path: str, suffix: str) -> list[str]:
    return [
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(suffix) and not f.startswith(("_", "."))
    ]


def compact_files(
    spark: SparkSession,
    path: str,
    target_bytes_per_file: int = 128 * 1024 * 1024,
    fmt: str = "parquet",
) -> dict:
    """Rewrite a table directory into ~target-sized files.

    Target file count = ceil(total_bytes / target); the rewrite is a
    single round-robin repartition (no shuffle key — compaction must
    not destroy more than it fixes; layout-preserving compaction of
    range/Z-ordered tables re-sorts instead, see write_range_clustered).
    Swap is atomic via two renames with roll-forward cleanup: rename
    path -> path.old, rename tmp -> path, remove path.old. A crash
    between the renames leaves path.old intact for recovery; readers
    never observe a half-written directory.

    At 100 TB run this per PARTITION directory (hive layout), not on
    the table root — each partition compaction is then an independent,
    retryable job. Returns {files_before, files_after, bytes}."""
    suffix = f".{fmt}" if fmt != "csv" else ".csv"
    # roll BACK a swap that died between the two renames (path gone,
    # .old holds the intact pre-compaction table) — same recovery
    # stance as dfs.TableStore._recover: the base is never the victim
    old0 = path + ".old"
    if not os.path.exists(path) and os.path.exists(old0):
        os.rename(old0, path)
    before = _data_files(path, suffix)
    # A hive-partitioned table root holds partition SUBDIRECTORIES and
    # no data files; rewriting it through spark.read.load would
    # silently FLATTEN the partition layout (the reader discovers
    # partitions, the writer drops the directory structure). Refuse:
    # compaction runs per partition directory, as the docstring says.
    subdirs = [
        f
        for f in os.listdir(path)
        if os.path.isdir(os.path.join(path, f)) and not f.startswith(("_", "."))
    ]
    if not before and subdirs:
        raise ValueError(
            f"compact_files: {path!r} looks like a partitioned table root "
            f"(subdirs {subdirs[:3]}, no *{suffix} data files); compact each "
            "partition directory instead — rewriting the root would flatten "
            "the partition layout"
        )
    total = sum(os.path.getsize(f) for f in before)
    n_files = max(1, math.ceil(total / target_bytes_per_file))
    df = spark.read.format(fmt).load(path)
    tmp, old = path + ".compacting", path + ".old"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)  # dead prior attempt; base untouched, safe
    df.repartition(n_files).write.format(fmt).mode("overwrite").save(tmp)
    if os.path.exists(old):
        shutil.rmtree(old)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    after = _data_files(path, suffix)
    return {"files_before": len(before), "files_after": len(after), "bytes": total}
