"""Semantic-invariant tests for the round-6 query batches
(llm_ops10/llm_ops11): planted fixtures, conservation laws,
degenerate-never-NULL, and the binned-Gini error bound."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def test_stopword_profile_conserves_docs(spark):
    from distributed_file_system_with_stream_processing_spark.plans.llm_ops10 import docs_stopword_profile
    from distributed_file_system_with_stream_processing_spark.sources.tables import load_table

    out = docs_stopword_profile(spark, SF).collect()
    assert sum(r["n_docs"] for r in out) == load_table(spark, SF, "documents").count()
    assert all(0 <= r["decile"] <= 9 for r in out)


def test_hapax_share_bounds_and_vocab_conservation(spark):
    from distributed_file_system_with_stream_processing_spark.plans.llm_ops10 import docs_hapax_by_source

    out = docs_hapax_by_source(spark, SF).collect()
    assert out
    for r in out:
        assert 0 <= r["hapax"] <= r["vocab"]
        assert 0.0 <= r["hapax_share"] <= 1.0


def test_compression_proxy_bounds(spark):
    from distributed_file_system_with_stream_processing_spark.plans.llm_ops10 import docs_compression_proxy

    for r in docs_compression_proxy(spark, SF).collect():
        assert 1 <= r["distinct_grams"] <= r["total_grams"]
        assert 0.0 < r["distinct_ratio"] <= 1.0


def test_prefix_dup_rate_planted(spark):
    """Two docs sharing a 32-char prefix (different tails) must count
    as dup_docs=2; a unique doc must not."""
    from distributed_file_system_with_stream_processing_spark.plans import llm_ops10 as M

    rows = [
        (1, "shared prefix shared prefix shared AAAA tail one", "en", "s1", 0),
        (2, "shared prefix shared prefix shared AAAA tail two", "en", "s1", 0),
        (3, "completely different text here", "en", "s1", 0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    groups = (
        df.select(
            "source",
            F.substring(
                F.lower(F.trim(F.regexp_replace("text", r"\s+", " "))), 1, M._PFX_LEN
            ).alias("pfx"),
        )
        .groupBy("source", "pfx")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    dup = groups.groupBy("source").agg(
        F.sum(F.when(F.col("n") > 1, F.col("n")).otherwise(0)).alias("dup_docs")
    ).collect()
    assert dup[0]["dup_docs"] == 2


def test_sentence_profile_bands(spark):
    from distributed_file_system_with_stream_processing_spark.plans.llm_ops10 import (
        docs_sentence_length_profile,
    )

    out = docs_sentence_length_profile(spark, SF).collect()
    assert out
    assert all(0 <= r["band"] <= 8 for r in out)


def test_retention_matrix_invariants(spark):
    """Offset-0 cell of every cohort counts the whole cohort (every
    user is active in their first week); offsets are non-negative;
    total distinct users equals the sum of offset-0 cells."""
    from distributed_file_system_with_stream_processing_spark.plans.llm_ops10 import events_retention_matrix
    from distributed_file_system_with_stream_processing_spark.sources.tables import load_table

    out = events_retention_matrix(spark, SF01).collect()
    assert all(r["week_offset"] >= 0 for r in out)
    zero = {r["cohort_week"]: r["n_users"] for r in out if r["week_offset"] == 0}
    n_users = (
        load_table(spark, SF01, "events").select("user_id").distinct().count()
    )
    assert sum(zero.values()) == n_users
    # no offset cell can exceed its cohort's size
    for r in out:
        assert r["n_users"] <= zero[r["cohort_week"]]


def test_funnel_dropoff_ordering(spark):
    from distributed_file_system_with_stream_processing_spark.plans.llm_ops10 import events_funnel_dropoff_time

    out = {r["stage"]: r for r in events_funnel_dropoff_time(spark, SF01).collect()}
    for r in out.values():
        assert 0 <= r["p50_s"] <= r["p90_s"]


def test_burstiness_conserves_eligible_users(spark):
    from distributed_file_system_with_stream_processing_spark.plans.llm_ops10 import events_burstiness
    from distributed_file_system_with_stream_processing_spark.sources.tables import load_table

    out = events_burstiness(spark, SF01).collect()
    eligible = (
        load_table(spark, SF01, "events")
        .groupBy("user_id")
        .count()
        .filter(F.col("count") >= 3)
        .count()
    )
    assert sum(r["n_users"] for r in out) == eligible


def test_hour_entropy_bounds(spark):
    import math

    from distributed_file_system_with_stream_processing_spark.plans.llm_ops10 import (
        events_hour_entropy_by_type,
    )

    for r in events_hour_entropy_by_type(spark, SF01).collect():
        assert 0.0 <= r["hour_entropy"] <= math.log(24) + 1e-9
        assert 1 <= r["n_hours"] <= 24


def test_lag1_autocorr_in_range(spark):
    from distributed_file_system_with_stream_processing_spark.plans.llm_ops10 import events_lag1_autocorr

    r = events_lag1_autocorr(spark, SF01).collect()[0]
    assert -1.0 <= r["lag1_r"] <= 1.0
    assert r["n_pairs"] >= 1


def test_benford_shares_sum_to_one(spark):
    from distributed_file_system_with_stream_processing_spark.plans.llm_ops10 import events_value_benford

    out = events_value_benford(spark, SF01).collect()
    assert {r["digit"] for r in out} <= set(range(1, 10))
    assert sum(r["share"] for r in out) == pytest.approx(1.0, abs=1e-4)
    assert sum(r["n_events"] for r in out) > 0


def test_gini_binned_tracks_exact(spark):
    """The $100-bin trapezoid Lorenz estimate must sit within the
    documented error envelope of the exact rank-formula Gini — the
    within-bin spread bounds the gap; on this data the two agree to
    a few hundredths."""
    from distributed_file_system_with_stream_processing_spark.plans.llm_ops9 import customer_revenue_gini
    from distributed_file_system_with_stream_processing_spark.plans.llm_ops11 import (
        customer_revenue_gini_binned,
    )

    exact = customer_revenue_gini(spark, SF01).collect()[0]
    binned = customer_revenue_gini_binned(spark, SF01).collect()[0]
    assert binned["n_customers"] == exact["n_customers"]
    assert binned["total_revenue"] == exact["total_revenue"]
    assert abs(binned["gini_binned"] - exact["gini"]) < 0.05
    # binning can only LOWER the measured concentration (within-bin
    # equality assumption) — the estimate must not exceed the exact
    assert binned["gini_binned"] <= exact["gini"] + 1e-9


def test_part_concentration_deciles_valid(spark):
    from distributed_file_system_with_stream_processing_spark.plans.llm_ops11 import (
        supplier_part_concentration,
    )
    from distributed_file_system_with_stream_processing_spark.sources.tables import load_table

    out = supplier_part_concentration(spark, SF).collect()
    n_parts = (
        load_table(spark, SF, "lineitem").select("l_partkey").distinct().count()
    )
    assert sum(r["n_parts"] for r in out) == n_parts
    assert all(0 <= r["hhi_decile"] <= 9 for r in out)


def test_weekday_shares_sum_to_one(spark):
    from distributed_file_system_with_stream_processing_spark.plans.llm_ops11 import (
        orders_weekday_seasonality,
    )

    out = orders_weekday_seasonality(spark, SF01).collect()
    assert {r["weekday"] for r in out} <= set(range(7))
    assert sum(r["share"] for r in out) == pytest.approx(1.0, abs=1e-4)


def test_trade_balance_conserves_totals(spark):
    """Σ export_revenue equals total discounted lineitem revenue and
    Σ import_spend equals total order value (cents-exact)."""
    from distributed_file_system_with_stream_processing_spark.plans.llm_ops11 import nation_trade_balance
    from distributed_file_system_with_stream_processing_spark.sources.tables import load_table

    out = nation_trade_balance(spark, SF).collect()
    li = load_table(spark, SF, "lineitem")
    o = load_table(spark, SF, "orders")
    exp_total = li.agg(
        F.sum(F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long"))
    ).collect()[0][0]
    imp_total = o.agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
    ).collect()[0][0]
    assert round(sum(r["export_revenue"] for r in out), 2) == round(exp_total / 100.0, 2)
    assert round(sum(r["import_spend"] for r in out), 2) == round(imp_total / 100.0, 2)
