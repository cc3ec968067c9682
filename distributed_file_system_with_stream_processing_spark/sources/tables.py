"""Parquet table loaders for the driver-provided test schema.

The reference ingests raw line files from HyDFS (reference
rainstorm/rainstorm.go:146-167 reads a whole source file and splits on
newlines). Spark-first equivalent: columnar parquet scans with
pushdown/pruning; the line-file model survives as
``spark.read.text`` inside the streaming layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table. Plain ``spark.read.parquet`` so Catalyst keeps
    predicate pushdown and column pruning on every downstream plan."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # events.ts has shipped as parquet TIMESTAMP(NANOS) in some
        # testdata generations (which Spark's vectorized reader rejects
        # unless read as raw nanos) and TIMESTAMP(MICROS) in others.
        # Handle both: with nanosAsLong=true a NANOS column surfaces as
        # LongType (rebuild a microsecond timestamp from it) while a
        # MICROS column still reads as a timestamp (pass through,
        # normalized to session-tz TIMESTAMP). Runtime confs so it
        # works under any caller-provided SparkSession; session tz
        # pinned to UTC so rendered timestamps match the (naive-UTC)
        # stored values regardless of the host JVM's zone.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if isinstance(df.schema["ts"].dataType, LongType):
            return df.withColumn(
                "ts", F.timestamp_micros((F.col("ts") / F.lit(1000)).cast("long"))
            )
        # TIMESTAMP_NTZ -> TIMESTAMP is value-preserving under the UTC
        # session tz pinned above
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for ``spark.sql`` plans."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
