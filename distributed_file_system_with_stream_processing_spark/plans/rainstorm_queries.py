"""RainStorm-equivalent query surface (batch twins of the stream ops).

The reference's user-op contract (reference rainstorm/rainstorm.go:532-575)
has exactly two op families:

- ``Transform``: op output rows pass through to the sink (op1_t1/op2_t1:
  filter lines matching a pattern, project columns).
- ``Aggregate``: op output is category→count merged into running totals
  at the leader (op1_t2/op2_t2).

Each query below is the declarative batch expression of one of those
shapes on the ``events``/``documents`` tables; the streaming layer runs
the same logical ops through Structured Streaming. At 100 TB these are
scan→filter→project (no shuffle) or scan→partial-agg→final-agg (one
shuffle on the category key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from distributed_file_system_with_stream_processing_spark.sources.tables import load_table

# Pattern mirroring op1_t1's "filter lines containing X" over the raw
# props payload (a JSON-ish string column, scanned as text like the
# reference scans CSV lines).
FILTER_PATTERN = '"k": 1'


def rs_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transform op: filter rows whose raw payload contains a pattern,
    project id/type columns (reference op1_t1 semantics: grep a line,
    emit selected fields). Pure scan+filter+project — zero shuffles."""
    e = load_table(spark, sf_dir, "events")
    return e.filter(F.col("props").contains(FILTER_PATTERN)).select(
        "event_id", "event_type", "props"
    )


RS_FILTER_PROJECT_SQL = f"""
SELECT event_id, event_type, props
FROM events
WHERE contains(props, '{FILTER_PATTERN}')
"""


def rs_filtered_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate op: filter by a column predicate, count per category —
    the final state of the reference leader's running
    ``AggregateCounts[category] += count`` (rainstorm.go:551-559)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.filter(F.col("value") >= 50.0)
        .groupBy(F.col("event_type").alias("category"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


RS_FILTERED_COUNT_SQL = """
SELECT event_type AS category, count(*) AS cnt
FROM events
WHERE value >= 50.0
GROUP BY event_type
"""


def rs_pipeline_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full two-op pipeline in one plan: op1 filter+project feeding an
    op2 category count — the composed RainStorm job as Catalyst sees it
    (filter collapses into the scan; one shuffle for the agg)."""
    e = load_table(spark, sf_dir, "events")
    stage1 = e.filter(F.col("props").contains(FILTER_PATTERN)).select("event_id", "event_type")
    return stage1.groupBy(F.col("event_type").alias("category")).agg(
        F.count(F.lit(1)).alias("cnt")
    )


RS_PIPELINE_SQL = f"""
SELECT event_type AS category, count(*) AS cnt
FROM events
WHERE contains(props, '{FILTER_PATTERN}')
GROUP BY event_type
"""


def rs_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical streaming wordcount over documents.text (split →
    explode → count). Explode happens map-side; single shuffle on word."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select(F.explode(F.split(F.col("text"), r"\s+")).alias("word"))
    return words.filter(F.col("word") != "").groupBy("word").agg(
        F.count(F.lit(1)).alias("cnt")
    )


RS_WORDCOUNT_SQL = r"""
SELECT word, count(*) AS cnt
FROM (SELECT unnest(string_split_regex(text, '\s+')) AS word FROM documents)
WHERE word <> ''
GROUP BY word
"""


def rs_running_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time running count per category — the exact sequence of
    intermediate aggregate states the reference leader prints after each
    batch (rainstorm.go:556-564), expressed as a cumulative window.
    Shuffles once on event_type; state is bounded per category."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return e.select(
        "event_id",
        "event_type",
        F.count(F.lit(1)).over(w).alias("running_count"),
    )


RS_RUNNING_AGG_SQL = """
SELECT event_id, event_type,
       count(*) OVER (PARTITION BY event_type ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING) AS running_count
FROM events
"""


QUERIES = {
    "rs_filter_project": rs_filter_project,
    "rs_filtered_count": rs_filtered_count,
    "rs_pipeline_batch": rs_pipeline_batch,
    "rs_wordcount": rs_wordcount,
    "rs_running_agg": rs_running_agg,
}

ORACLES = {
    "rs_filter_project": RS_FILTER_PROJECT_SQL,
    "rs_filtered_count": RS_FILTERED_COUNT_SQL,
    "rs_pipeline_batch": RS_PIPELINE_SQL,
    "rs_wordcount": RS_WORDCOUNT_SQL,
    "rs_running_agg": RS_RUNNING_AGG_SQL,
}
