"""Line-file sources — the reference's native input format.

HyDFS files are line-oriented text/CSV (the RainStorm leader splits a
source file into line ranges, reference rainstorm/rainstorm.go:104-144,
and keys every tuple ``filename:linenumber``). These loaders give the
same addressing on Spark:

- ``read_lines``   — (line_id, value) with exact global line numbers.
  Uses ``zipWithIndex`` (one extra partition-count pass) because a
  global line number is inherently sequential metadata a columnar scan
  does not carry; this is the one justified RDD drop-down in the repo.
- ``read_csv``     — schema-on-read CSV. Pass an explicit schema at
  scale (inference is a full extra pass over 100 TB).
- ``stream_lines`` — unbounded text stream of a directory, for feeding
  RainStorm jobs files-as-they-arrive like the reference's appends.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LINE_SCHEMA = "line_id long, value string"


def read_lines(spark: SparkSession, path: str) -> DataFrame:
    """Bounded text file(s) → (line_id, value), line_id = exact 0-based
    global line number (the reference's tuple key, rainstorm.go:315)."""
    rdd = spark.sparkContext.textFile(path).zipWithIndex().map(lambda t: (t[1], t[0]))
    return spark.createDataFrame(rdd, LINE_SCHEMA)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    header: bool = True,
) -> DataFrame:
    """CSV load (the reference's test corpus is CSV, user/tests.go
    Traffic_Signs_*.csv). Explicit schema skips the inference pass."""
    reader = spark.read.option("header", header)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def stream_lines(spark: SparkSession, source_dir: str) -> DataFrame:
    """Unbounded: new text files in ``source_dir`` become rows with
    their source file path — file-arrival streaming, the Spark shape of
    'appends show up in the HyDFS file'."""
    return (
        spark.readStream.text(source_dir)
        .withColumn("src_file", F.col("_metadata.file_path"))
    )


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str,
    bad_records_col: str = "_corrupt_record",
) -> DataFrame:
    """JSON-lines load with a REQUIRED explicit schema.

    Schema inference over JSON is a full extra pass (and at 100 TB an
    extra 100 TB scan), so this loader refuses to run without one.
    Malformed lines land in ``bad_records_col`` (PERMISSIVE mode)
    instead of killing a week-long job — filter/route them explicitly.
    """
    if not schema:
        raise ValueError("read_jsonl requires an explicit schema at scale")
    full = f"{schema}, {bad_records_col} string"
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", bad_records_col)
        .json(path)
    )


def stream_jsonl(
    spark: SparkSession,
    source_dir: str,
    schema: str,
) -> DataFrame:
    """Unbounded JSON-lines stream of a directory (files-as-they-arrive,
    same arrival model as the reference's appends). Explicit schema
    only — readStream cannot infer without an extra listing pass."""
    return spark.readStream.schema(schema).json(source_dir)
