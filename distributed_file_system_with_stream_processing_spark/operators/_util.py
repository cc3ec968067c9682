"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    """Repartition raw rows to the session's parallelism BEFORE a
    compute-dense stage. A small-on-disk parquet (one file) scans as a
    single partition, which would pin heavy per-row/per-pair compute to
    one core; shuffling the raw rows first costs almost nothing and
    unlocks every core. At 100 TB the scan is already wide and AQE
    coalesces excess partitions — it never hurts, and it rescues the
    small-input/heavy-compute corner."""
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)
