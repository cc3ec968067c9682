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


def test_cooccurrence_lift_symmetric_support(spark):
    """Pair support can't exceed either type's unit count, and lift
    is positive for every observed pair."""
    from distributed_file_system_with_stream_processing_spark.plans.llm_ops13 import (
        events_type_cooccurrence_lift,
    )

    out = events_type_cooccurrence_lift(spark, SF01).collect()
    assert out
    for r in out:
        assert r["type_a"] < r["type_b"]
        assert r["n_units_both"] >= 1
        assert r["lift"] > 0


def test_peak_to_mean_conserves_users(spark):
    from distributed_file_system_with_stream_processing_spark.plans.llm_ops13 import (
        events_peak_to_mean_by_user,
    )
    from distributed_file_system_with_stream_processing_spark.sources.tables import load_table

    out = events_peak_to_mean_by_user(spark, SF01).collect()
    n_users = load_table(spark, SF01, "events").select("user_id").distinct().count()
    assert sum(r["n_users"] for r in out) == n_users
    # peak/mean >= 1 always, so bucket 0 (ratio < 0.5) and 1 are empty
    assert all(r["ratio_bucket"] >= 2 for r in out)


def test_quiet_hours_conserves_days(spark):
    from distributed_file_system_with_stream_processing_spark.plans.llm_ops13 import events_quiet_hours
    from distributed_file_system_with_stream_processing_spark.sources.tables import load_table
    from pyspark.sql import functions as F2

    out = events_quiet_hours(spark, SF01).collect()
    n_days = (
        load_table(spark, SF01, "events")
        .select((F2.col("ts").cast("long") / 86400).cast("long").alias("d"))
        .distinct()
        .count()
    )
    assert sum(r["n_days"] for r in out) == n_days
    assert all(0 <= r["quiet_hours"] <= 24 for r in out)


def test_order_trend_planted_slopes(spark):
    """A customer with strictly rising order values classifies as
    growing, strictly falling as declining, constant as flat — on a
    planted orders table."""
    import datetime as dt

    from distributed_file_system_with_stream_processing_spark.plans import llm_ops13 as M

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # customer 1: +$10/order; customer 2: -$10/order; customer 3: flat
    for i in range(4):
        rows.append((100 + i, 1, "O", 100.0 + 10.0 * i, t0 + dt.timedelta(days=i), "1-URGENT"))
        rows.append((200 + i, 2, "O", 200.0 - 10.0 * i, t0 + dt.timedelta(days=i), "1-URGENT"))
        rows.append((300 + i, 3, "O", 50.0, t0 + dt.timedelta(days=i), "1-URGENT"))
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(f"{td}/orders.parquet")
        for t in ["region", "nation", "customer", "supplier", "part",
                  "lineitem", "events", "documents", "embeddings"]:
            spark.read.parquet(f"{SF}/{t}.parquet").limit(0).write.parquet(
                f"{td}/{t}.parquet"
            )
        out = {
            r["trend"]: r["n_customers"]
            for r in M.customer_order_value_trend(spark, td).collect()
        }
    assert out == {"growing": 1, "declining": 1, "flat": 1}


def test_word_length_profile_conserves_docs(spark):
    from distributed_file_system_with_stream_processing_spark.plans.llm_ops13 import (
        docs_word_length_profile,
    )
    from distributed_file_system_with_stream_processing_spark.sources.tables import load_table

    out = docs_word_length_profile(spark, SF).collect()
    assert sum(r["n_docs"] for r in out) == load_table(spark, SF, "documents").count()
    assert all(0 <= r["mean_len_bin"] <= 15 for r in out)


def test_first_word_share_bounds(spark):
    from distributed_file_system_with_stream_processing_spark.plans.llm_ops13 import (
        docs_first_word_concentration,
    )

    for r in docs_first_word_concentration(spark, SF).collect():
        assert 1 <= r["n_docs_opening"] <= r["n_docs"]
        assert 0.0 < r["share"] <= 1.0


def test_value_percentiles_ordered(spark):
    from distributed_file_system_with_stream_processing_spark.plans.llm_ops14 import (
        events_value_percentiles_by_type,
    )

    for r in events_value_percentiles_by_type(spark, SF01).collect():
        assert r["p50"] <= r["p90"] <= r["p99"]
        assert r["n_events"] >= 1


def test_first_last_matrix_conserves_users(spark):
    from distributed_file_system_with_stream_processing_spark.plans.llm_ops14 import (
        events_first_last_type_matrix,
    )
    from distributed_file_system_with_stream_processing_spark.sources.tables import load_table

    out = events_first_last_type_matrix(spark, SF01).collect()
    n_users = load_table(spark, SF01, "events").select("user_id").distinct().count()
    assert sum(r["n_users"] for r in out) == n_users


def test_repeat_rate_bounds(spark):
    from distributed_file_system_with_stream_processing_spark.plans.llm_ops14 import (
        customer_repeat_rate_by_nation,
    )

    out = customer_repeat_rate_by_nation(spark, SF).collect()
    assert out
    for r in out:
        assert 0 <= r["n_repeat"] <= r["n_customers"]
        assert 0.0 <= r["repeat_rate"] <= 1.0


def test_qty_price_corr_in_range(spark):
    from distributed_file_system_with_stream_processing_spark.plans.llm_ops14 import (
        lineitem_quantity_price_corr,
    )

    out = lineitem_quantity_price_corr(spark, SF01).collect()
    assert out
    for r in out:
        assert -1.0 <= r["qty_price_r"] <= 1.0


def test_vocab_overlap_symmetric_bounds(spark):
    """Jaccard in (0, 1]; intersection cannot exceed either side's
    vocabulary (checked via the recomputed per-source sizes)."""
    from pyspark.sql import functions as F2

    from distributed_file_system_with_stream_processing_spark.plans.llm_ops14 import (
        docs_vocab_overlap_matrix,
    )
    from distributed_file_system_with_stream_processing_spark.functions import text as T2
    from distributed_file_system_with_stream_processing_spark.sources.tables import load_table

    out = docs_vocab_overlap_matrix(spark, SF).collect()
    assert out
    sizes = {
        r["source"]: r["v"]
        for r in load_table(spark, SF, "documents")
        .select("source", F2.explode(T2.words(F2.col("text"))).alias("w"))
        .select("source", F2.lower("w").alias("t"))
        .distinct()
        .groupBy("source")
        .agg(F2.count(F2.lit(1)).alias("v"))
        .collect()
    }
    for r in out:
        assert r["source_a"] < r["source_b"]
        assert 1 <= r["n_shared_terms"] <= min(sizes[r["source_a"]], sizes[r["source_b"]])
        assert 0.0 < r["vocab_jaccard"] <= 1.0


def test_status_year_shares_sum_to_one(spark):
    from collections import defaultdict

    from distributed_file_system_with_stream_processing_spark.plans.llm_ops14 import (
        orders_status_year_mix,
    )

    per_year = defaultdict(float)
    for r in orders_status_year_mix(spark, SF01).collect():
        per_year[r["year"]] += r["share"]
    for y, s in per_year.items():
        assert abs(s - 1.0) < 1e-4, (y, s)


def test_error_adjacency_rate_bounds(spark):
    from distributed_file_system_with_stream_processing_spark.plans.llm_ops15 import events_error_adjacency

    out = events_error_adjacency(spark, SF01).collect()
    assert out
    for r in out:
        assert 0 <= r["n_error_follow"] <= r["n_events"]
        assert 0.0 <= r["error_follow_rate"] <= 1.0


def test_acctbal_spend_corr_covers_all_customers(spark):
    from distributed_file_system_with_stream_processing_spark.plans.llm_ops15 import (
        customer_acctbal_vs_spend_corr,
    )
    from distributed_file_system_with_stream_processing_spark.sources.tables import load_table

    out = customer_acctbal_vs_spend_corr(spark, SF01).collect()
    assert sum(r["n_customers"] for r in out) == load_table(
        spark, SF01, "customer"
    ).count()
    assert all(-1.0 <= r["acctbal_spend_r"] <= 1.0 for r in out)


def test_size_price_slope_planted(spark):
    """A part type whose price is exactly 2 dollars per size unit
    must report slope 2.0."""
    import tempfile

    from distributed_file_system_with_stream_processing_spark.plans import llm_ops15 as M

    rows = [(i, f"part{i}", "Brand#1", "LINEAR", i, 10.0 + 2.0 * i) for i in range(1, 6)]
    df = spark.createDataFrame(
        rows,
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    )
    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(f"{td}/part.parquet")
        for t in ["region", "nation", "customer", "supplier", "orders",
                  "lineitem", "events", "documents", "embeddings"]:
            spark.read.parquet(f"{SF}/{t}.parquet").limit(0).write.parquet(
                f"{td}/{t}.parquet"
            )
        out = {r["p_type"]: r for r in M.part_size_price_slope(spark, td).collect()}
    assert out["LINEAR"]["price_per_size_unit"] == 2.0


def test_session_depth_conserves_sessions(spark):
    """Σ n_sessions equals the sessionize backbone's session count."""
    from pyspark.sql import Window as W2
    from pyspark.sql import functions as F2

    from distributed_file_system_with_stream_processing_spark.plans.llm_ops15 import (
        events_session_depth_histogram,
    )
    from distributed_file_system_with_stream_processing_spark.sources.tables import load_table

    out = events_session_depth_histogram(spark, SF01).collect()
    e = load_table(spark, SF01, "events")
    sec = F2.col("ts").cast("long")
    w = W2.partitionBy("user_id").orderBy(sec, "event_id")
    n_sessions = (
        e.select(
            "user_id",
            F2.when(
                (sec - F2.lag(sec).over(w)).isNull()
                | ((sec - F2.lag(sec).over(w)) > 1800),
                1,
            ).otherwise(0).alias("new"),
        )
        .agg(F2.sum("new"))
        .collect()[0][0]
    )
    assert sum(r["n_sessions"] for r in out) == n_sessions


def test_dup_prefix_topk_ordered(spark):
    from distributed_file_system_with_stream_processing_spark.plans.llm_ops15 import (
        docs_duplicate_prefix_topk,
    )

    out = sorted(
        docs_duplicate_prefix_topk(spark, SF01).collect(), key=lambda r: r["rank"]
    )
    counts = [r["n_docs"] for r in out]
    assert counts == sorted(counts, reverse=True)
    assert all(r["n_docs"] >= 2 and r["n_sources"] >= 1 for r in out)


def test_value_cv_by_priority_bounds(spark):
    from distributed_file_system_with_stream_processing_spark.plans.llm_ops15 import (
        orders_value_cv_by_priority,
    )

    out = orders_value_cv_by_priority(spark, SF01).collect()
    assert len(out) == 5
    for r in out:
        assert r["avg_value"] > 0
        assert r["value_cv"] >= 0.0
