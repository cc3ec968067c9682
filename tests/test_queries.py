"""Every registered query must match its DuckDB oracle at sf0.001.

This is a local pre-flight of the driver's t2 correctness gate.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from tests.oracle_compare import compare


def _pairs():
    from distributed_file_system_with_stream_processing_spark.plans.registry import (
        ORACLES,
        QUERIES,
    )

    return [(name, fn, ORACLES.get(name)) for name, fn in QUERIES.items()]


@pytest.mark.parametrize("name,fn,sql", _pairs(), ids=[p[0] for p in _pairs()])
def test_query_matches_oracle(spark, duck, name, fn, sql):
    df = fn(spark, SF_SMOKE)
    assert df.columns, f"{name}: empty schema"
    if sql is None:
        # rows-only check for non-SQL-expressible ops
        assert df.count() >= 0
        return
    ok, msg = compare(df, duck, sql, SF_SMOKE)
    assert ok, f"{name}: {msg}"


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns


def test_approx_distinct_accuracy(spark):
    """HLL estimate must stay within 5% of exact distinct counts."""
    from distributed_file_system_with_stream_processing_spark.plans.registry import QUERIES
    from distributed_file_system_with_stream_processing_spark.sources.tables import load_table

    approx = {
        r["event_type"]: r["approx_users"]
        for r in QUERIES["events_approx_distinct"](spark, SF_SMOKE).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in load_table(spark, SF_SMOKE, "events")
        .groupBy("event_type")
        .agg(__import__("pyspark.sql.functions", fromlist=["F"]).countDistinct("user_id").alias("n"))
        .collect()
    }
    for k, ex in exact.items():
        assert abs(approx[k] - ex) / ex < 0.05, (k, approx[k], ex)


def test_approx_percentiles_accuracy(spark):
    """GK-sketch percentiles must stay within 3% relative error of the
    exact percentiles. The slack is value discreteness, not sketch
    noise: percentile_approx returns a real data point while exact
    percentile() interpolates between neighbors, and at sf0.001 a
    group has only ~600 rows so neighboring order values sit ~1%
    apart. The bound catches wiring mistakes (wrong column, wrong
    quantile), which show up as tens of percent."""
    from pyspark.sql import functions as F

    from distributed_file_system_with_stream_processing_spark.plans.registry import QUERIES
    from distributed_file_system_with_stream_processing_spark.sources.tables import load_table

    approx = {
        r["o_orderpriority"]: (r["p50"], r["p90"], r["p99"])
        for r in QUERIES["order_percentiles_approx"](spark, SF_SMOKE).collect()
    }
    exact = {
        r["o_orderpriority"]: (r["p50"], r["p90"], r["p99"])
        for r in load_table(spark, SF_SMOKE, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
            F.expr("percentile(o_totalprice, 0.9)").alias("p90"),
            F.expr("percentile(o_totalprice, 0.99)").alias("p99"),
        )
        .collect()
    }
    for k, ex in exact.items():
        for a, e in zip(approx[k], ex):
            assert abs(a - e) / e < 0.03, (k, approx[k], ex)


def test_registry_front_loads_unchecked_queries():
    """The driver verifies queries in enumeration order and has capped
    at 50/round historically: the _FRONT list must (a) lead the
    enumeration exactly, (b) contain every query that still lacks a
    driver CORRECTNESS row (all round-3 additions), and (c) not exceed
    the 50-entry cap, or the entries past it silently lose their shot
    at a driver row."""
    from distributed_file_system_with_stream_processing_spark.plans import registry as R

    names = list(R.QUERIES)
    assert names[: len(R._FRONT)] == R._FRONT
    assert len(R._FRONT) <= 50, len(R._FRONT)
    # round 9 policy (refined from r6): _FRONT = {no driver row yet}
    # ∪ {VALUE-changed since last green row}; changed-but-output-
    # identical queries may cede their slot when the front is full,
    # each with a proof obligation recorded in the registry comment.
    must_front = {
        # new this round (r9): no driver row yet
        "embedding_neardup_wide",
        # flagship re-fronts (banded NaN pre-filter)
        "embedding_neardup",
        "semantic_dedup",
        # representative wave-3 conversions (plan AND oracle changed)
        "docs_gopher_rules",
        "dedup_minhash_lsh",
        "corpus_zipf_fit",
        "q8_market_share",
        "nation_revenue_hhi",
        "docs_char_class_profile",
        "embedding_dim_variance",
    }
    assert must_front <= set(R._FRONT), must_front - set(R._FRONT)
