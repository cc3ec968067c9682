"""Batch-mode RainStorm op tests vs hand-computed expectations —
the reference's test_mp4 t1/t2 semantics (reference user/tests.go:
152-191) run as one Catalyst plan instead of per-5-line exec batches.
"""

from __future__ import annotations

import pytest

from distributed_file_system_with_stream_processing_spark.sources.tables import load_table
from distributed_file_system_with_stream_processing_spark.streaming import ops
from distributed_file_system_with_stream_processing_spark.streaming.rainstorm import RainStormJob

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def events(spark):
    df = load_table(spark, SF_SMOKE, "events").cache()
    df.count()
    yield df
    df.unpersist()


def test_t1_filter_project(events):
    """Test-1 shape: pattern filter + projection (Transform → Transform)."""
    job = RainStormJob(
        ops.filter_contains("event_type", "cli", ["event_id", "event_type", "user_id"]),
        ops.identity(),
    )
    out = job.run_batch(events)
    assert out.columns == ["event_id", "event_type", "user_id"]
    rows = out.collect()
    expected = events.filter("event_type LIKE '%cli%'").count()
    assert len(rows) == expected > 0
    assert all("cli" in r["event_type"] for r in rows)


def test_t2_filter_count_by_category(events):
    """Test-2 shape: equality filter → count per category (Aggregate);
    the final running-counts state must equal the batch groupBy."""
    job = RainStormJob(ops.filter_equals("event_type", "click"), ops.count_by("user_id"))
    got = {r["user_id"]: r["cnt"] for r in job.run_batch(events).collect()}
    exp = {
        r["user_id"]: r["cnt"]
        for r in events.filter("event_type = 'click'")
        .groupBy("user_id")
        .count()
        .withColumnRenamed("count", "cnt")
        .collect()
    }
    assert got == exp and len(got) > 0


def test_python_transform_arrow_path(events):
    """The custom-executable escape hatch: arbitrary pandas logic via
    mapInPandas, verified against the equivalent column expression."""

    def double_value(pdf):
        out = pdf[["event_id"]].copy()
        out["value2"] = pdf["value"] * 2.0
        return out

    job = RainStormJob(
        ops.python_transform("double", double_value, "event_id long, value2 double"),
        ops.identity(),
    )
    got = {r["event_id"]: r["value2"] for r in job.run_batch(events.limit(100)).collect()}
    exp = {r["event_id"]: r["value"] * 2.0 for r in events.limit(100).collect()}
    assert got == exp


def test_op_composition_is_one_plan(events):
    """op1→op2 must fuse: the filter reaches the scan even though it
    was declared as a separate stage (what the reference's staged exec
    model can never do)."""
    job = RainStormJob(ops.filter_equals("event_type", "click"), ops.count_by("user_id"))
    plan = (
        job.run_batch(load_table(events.sparkSession, SF_SMOKE, "events"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan and "event_type" in plan.split("PushedFilters")[1][:200]
