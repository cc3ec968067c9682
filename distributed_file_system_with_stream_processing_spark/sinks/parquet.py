"""Layout-aware parquet sinks — partition pruning and co-located joins.

The reference's placement story is its consistent-hash ring: a file's
location is a pure function of ``hash(filename)``
(reference synchronizer/synchronizer.go:55-72), so readers know where
data lives without asking. The Spark-native analogue is data LAYOUT:

- ``write_partitioned`` — hive-style directory partitioning; a filter
  on the partition column prunes entire directories at planning time
  (``PartitionFilters`` in the scan), the 100 TB equivalent of "only
  talk to the 3 replicas that own the file".
- ``write_bucketed``   — hash-bucketed table layout; two tables
  bucketed the same way join WITHOUT a shuffle (no ``Exchange`` in the
  plan). For a fact table joined on the same key every day, this
  amortizes the shuffle once at write time — the single biggest cost
  lever for repeated 100 TB joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    """Hive-style partitioned parquet. Choose LOW-cardinality columns
    (date, category); high-cardinality partitioning creates a
    small-files explosion at scale."""
    df.write.partitionBy(*partition_cols).mode("overwrite").parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_col: str,
    n_buckets: int = 32,
) -> None:
    """Bucketed external table: rows hash-distributed into
    ``n_buckets`` files by ``bucket_col``, bucket metadata in the
    catalog. Joins/aggregations on ``bucket_col`` between tables with
    identical bucketing need no Exchange. Size ``n_buckets`` so one
    bucket ≈ one task's worth of data at the target scale."""
    (
        df.write.bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .option("path", path)
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(table)
    )


def write_range_clustered(df: DataFrame, path: str, col: str, n_files: int) -> None:
    """Range-cluster ``df`` on ``col`` into ``n_files`` sorted files —
    the data-skipping layout for range-filtered scans.

    ``repartitionByRange`` gives each output file a disjoint value
    range of ``col`` and ``sortWithinPartitions`` orders rows inside,
    so every parquet row group carries tight min/max stats. A reader
    filtering ``col BETWEEN a AND b`` then skips all but the few
    files/row-groups whose stats overlap — at 100 TB this is the
    difference between scanning everything and scanning one day's
    slice (same lever as time-series chunk exclusion in OLAP stores;
    the third layout tool beside partitioning and bucketing above).
    """
    (
        df.repartitionByRange(n_files, col)
        .sortWithinPartitions(col)
        .write.mode("overwrite")
        .parquet(path)
    )
