"""Semantic properties of the round-5 pipeline-QA / product-analytics
ops (llm_ops8) — oracle parity in test_queries proves arithmetic
equivalence; these pin the *meaning*: the recall curves really measure
recall, the sweeps are monotone, the audits respect their bounds, and
the histograms conserve totals."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_file_system_with_stream_processing_spark.plans import llm_ops8 as M
from distributed_file_system_with_stream_processing_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def test_lsh_recall_curve_bounds(spark):
    rows = M.lsh_recall_curve(spark, SF_SMOKE).collect()
    assert rows, "fixture should contain co-shingled pairs"
    for r in rows:
        assert 0 <= r["bin"] <= 9
        assert 0 <= r["n_caught"] <= r["n_pairs"]
        assert 0.0 <= r["recall"] <= 1.0
    # the top bin is exact/near-exact duplicates — banding must catch
    # essentially all of them (theory: P(collide | j≈1) ≈ 1)
    top = max(rows, key=lambda r: r["bin"])
    assert top["bin"] >= 8, "fixture should contain near-identical pairs"
    assert top["recall"] >= 0.9, top


def test_minhash_threshold_sweep_monotone(spark):
    rows = sorted(
        M.minhash_threshold_sweep(spark, SF_SMOKE).collect(),
        key=lambda r: r["min_agree"],
    )
    assert [r["min_agree"] for r in rows] == list(range(6, 13))
    for a, b in zip(rows, rows[1:]):
        # raising the threshold can only drop fewer docs / keep fewer pairs
        assert b["n_dropped"] <= a["n_dropped"]
        assert b["n_pairs"] <= a["n_pairs"]
    assert rows[0]["n_pairs"] > 0, "fixture should contain candidates at 0.5"


def test_ann_recall_audit_consistency(spark):
    rows = M.ann_recall_audit(spark, SF_SMOKE).collect()
    assert len(rows) == 10  # the standard probe set
    for r in rows:
        assert r["n_exact"] == 5
        assert 0 <= r["n_hits"] <= 5
        assert abs(r["recall"] - r["n_hits"] / 5) < 1e-9
    mean = sum(r["recall"] for r in rows) / len(rows)
    # same floor test_ann pins for the underlying IVF path
    assert mean >= 0.3, mean


def test_dedup_survivor_quality_bounds(spark):
    r = M.docs_dedup_survivor_quality(spark, SF_SMOKE).collect()[0]
    assert r["n_groups"] > 0, "fixture should contain near-dup clusters"
    assert 0.0 <= r["kept_best_share"] <= 1.0
    assert r["avg_quality_regret"] >= 0.0


def test_survivor_fold_planted(spark):
    """Exact expected values on planted clusters:
    - cluster 10: kept (doc 1) IS the best (q 900000 > 800000)
    - cluster 20: kept (doc 3) is WORSE by 0.25 (500000 vs 750000)
    → share 0.5, regret (0 + 0.25)/2 = 0.125."""
    rows = [
        (10, 1, 900_000),
        (10, 2, 800_000),
        (20, 3, 500_000),
        (20, 4, 750_000),
    ]
    d = spark.createDataFrame(rows, "cluster_id long, doc_id long, q_mu long")
    r = M.survivor_fold(d).collect()[0]
    assert r["n_groups"] == 2
    assert r["kept_best_share"] == 0.5
    assert r["avg_quality_regret"] == 0.125


def test_survivor_fold_empty_is_vacuous(spark):
    """No clusters → (0, 1.0, 0.0), never NULL (the driver's
    value-hash compare cannot order NULLs against numbers)."""
    d = spark.createDataFrame([], "cluster_id long, doc_id long, q_mu long")
    r = M.survivor_fold(d).collect()[0]
    assert r["n_groups"] == 0
    assert r["kept_best_share"] == 1.0
    assert r["avg_quality_regret"] == 0.0


def test_source_token_entropy_bounds(spark):
    import math

    for r in M.source_token_entropy(spark, SF_SMOKE).collect():
        # 0 ≤ H ≤ ln(V); +1e-3 slack for the per-term nano quantization
        assert -1e-3 <= r["entropy"] <= math.log(r["n_types"]) + 1e-3, r
        assert r["n_types"] <= r["n_tokens"]


def test_events_dau_mau_bounds(spark):
    rows = M.events_dau_mau(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        # daily actives can't exceed monthly actives
        assert r["avg_dau"] <= r["mau"] + 1e-9
        assert 0.0 < r["stickiness"] <= 1.0


def test_customer_cohort_ltv_conserves_orders(spark):
    out = M.customer_cohort_ltv(spark, SF_SMOKE)
    total = out.agg(F.sum("n_orders")).collect()[0][0]
    n_orders = load_table(spark, SF_SMOKE, "orders").count()
    assert total == n_orders
    # age 0 exists for every cohort (the first order itself)
    ages = {
        r["cohort_month"]: r["min_age"]
        for r in out.groupBy("cohort_month")
        .agg(F.min("age_months").alias("min_age"))
        .collect()
    }
    assert all(a == 0 for a in ages.values()), ages


def test_customer_order_frequency_conserves_customers(spark):
    out = M.customer_order_frequency(spark, SF_SMOKE)
    rows = out.collect()
    total_customers = sum(r["n_customers"] for r in rows)
    distinct = (
        load_table(spark, SF_SMOKE, "orders").select("o_custkey").distinct().count()
    )
    assert total_customers == distinct
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-4


def test_embedding_hubness_conserves_vectors_and_edges(spark):
    from distributed_file_system_with_stream_processing_spark.plans import llm_ops7 as L7

    rows = M.embedding_hubness(spark, SF_SMOKE).collect()
    n_vec = load_table(spark, SF_SMOKE, "embeddings").count()
    assert sum(r["n_vectors"] for r in rows) == n_vec
    n_edges = L7.embedding_knn_graph(spark, SF_SMOKE).count()
    assert sum(r["in_degree"] * r["n_vectors"] for r in rows) == n_edges


def test_session_path_topk_shape(spark):
    rows = M.session_path_topk(spark, SF_SMOKE).collect()
    assert rows
    types = {
        r["event_type"]
        for r in load_table(spark, SF_SMOKE, "events")
        .select("event_type")
        .distinct()
        .collect()
    }
    for r in rows:
        steps = r["path"].split(" > ")
        assert len(steps) == 3 and all(s in types for s in steps), r
        assert r["n"] >= 1
    ns = [r["n"] for r in rows]
    assert ns == sorted(ns, reverse=True)


def test_quality_dup_lift_independence_identity(spark):
    """Σ over cells of n·lift-weight identity: per row, expected =
    row_tot·col_tot/total, and Σ expected == Σ observed == total."""
    rows = M.docs_quality_dup_lift(spark, SF_SMOKE).collect()
    total = sum(r["n_docs"] for r in rows)
    n_docs = load_table(spark, SF_SMOKE, "documents").count()
    assert total == n_docs
    for r in rows:
        assert r["lift"] > 0.0


def test_priority_mix_shares_sum_to_one(spark):
    rows = M.orders_priority_mix_shift(spark, SF_SMOKE).collect()
    by_month: dict[int, float] = {}
    for r in rows:
        by_month[r["month"]] = by_month.get(r["month"], 0.0) + r["share"]
    assert by_month
    for m, s in by_month.items():
        assert abs(s - 1.0) < 1e-4, (m, s)


def test_query_likelihood_semantics(spark):
    """QL ranking sanity (llm_ops9): ranks are 1..k dense per query,
    scores non-increasing with rank, and every ranked doc shares ≥1
    term with its query (matched-terms-only decomposition)."""
    from distributed_file_system_with_stream_processing_spark.plans import llm_ops9 as M9

    rows = M9.query_likelihood_topk(spark, SF_SMOKE).collect()
    assert rows
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        scores = [r["ql_score"] for r in rs]
        assert scores == sorted(scores, reverse=True), (q, scores)


def test_token_percentiles_ordered_and_real(spark):
    """p50 ≤ p90 ≤ p99, and each percentile is an actual corpus value
    (percentile_disc, not interpolation)."""
    from distributed_file_system_with_stream_processing_spark.functions import text as T
    from distributed_file_system_with_stream_processing_spark.plans import llm_ops9 as M9

    rows = M9.docs_token_percentiles_by_lang(spark, SF_SMOKE).collect()
    assert rows
    actual = {
        (r["lang"], r["n_tok"])
        for r in load_table(spark, SF_SMOKE, "documents")
        .select("lang", F.size(T.words(F.col("text"))).cast("long").alias("n_tok"))
        .collect()
    }
    for r in rows:
        assert r["p50_tokens"] <= r["p90_tokens"] <= r["p99_tokens"], r
        for q in (50, 90, 99):
            assert (r["lang"], r[f"p{q}_tokens"]) in actual, (r, q)


def test_template_shingles_coverage_bounds(spark):
    from distributed_file_system_with_stream_processing_spark.plans import llm_ops9 as M9

    rows = M9.docs_template_shingles(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 1 <= r["shingle_df"] <= r["n_docs"]
        assert 0.0 < r["coverage"] <= 1.0
        assert len(r["top_shingle"].split(" ")) == 3


def test_ab_readouts_are_aa_sane(spark):
    """The hash split is an A/A by construction: outputs are single
    NULL-free rows, rates in [0,1], arms together cover all users,
    and the Welch df lies between min(n)-1 and n0+n1-2."""
    from distributed_file_system_with_stream_processing_spark.plans import llm_ops9 as M9

    conv = M9.events_ab_conversion(spark, SF_SMOKE).collect()
    assert len(conv) == 1
    r = conv[0]
    assert all(v is not None for v in r)
    users = (
        load_table(spark, SF_SMOKE, "events").select("user_id").distinct().count()
    )
    assert r["n_control"] + r["n_treatment"] == users
    assert 0.0 <= r["rate_control"] <= 1.0 and 0.0 <= r["rate_treatment"] <= 1.0
    assert r["conv_control"] <= r["n_control"]
    assert r["conv_treatment"] <= r["n_treatment"]

    tt = M9.events_ab_value_ttest(spark, SF_SMOKE).collect()[0]
    assert all(v is not None for v in tt)
    assert tt["n_control"] + tt["n_treatment"] == users
    if tt["welch_df"] > 0:
        lo = min(tt["n_control"], tt["n_treatment"]) - 1
        hi = tt["n_control"] + tt["n_treatment"] - 2
        assert lo - 1e-6 <= tt["welch_df"] <= hi + 1e-6, tt


def test_probe_recall_curve_monotone(spark):
    """Candidate recall is non-decreasing in the probe budget, probe 4
    reaches at least the registered nprobe=3 recall, and counts are
    conserved (n_true = |Q|·k)."""
    from distributed_file_system_with_stream_processing_spark.plans import llm_ops9 as M9

    rows = sorted(
        M9.ann_probe_recall_curve(spark, SF_SMOKE).collect(),
        key=lambda r: r["probe"],
    )
    assert [r["probe"] for r in rows] == [1, 2, 3, 4]
    assert all(r["n_true"] == 50 for r in rows)
    recalls = [r["candidate_recall"] for r in rows]
    assert recalls == sorted(recalls)
    assert all(0.0 <= x <= 1.0 for x in recalls)
    assert recalls[0] > 0.0, "probe 1 must reach some true neighbors"


def test_ivf_cell_balance_conserves(spark):
    from distributed_file_system_with_stream_processing_spark.plans import llm_ops9 as M9

    rows = M9.ivf_cell_balance(spark, SF_SMOKE).collect()
    base = (
        load_table(spark, SF_SMOKE, "embeddings")
        .filter(F.col("vec_id") >= 10)
        .count()
    )
    assert sum(r["n_vectors"] for r in rows) == base
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-4
    for r in rows:
        # balance = share * k: consistent to rounding
        assert abs(r["balance"] - r["share"] * M9._ICB_CELLS) < 1e-4


def test_shingle_df_histogram_mass_identities(spark):
    from distributed_file_system_with_stream_processing_spark.plans import llm_ops9 as M9

    rows = M9.shingle_df_histogram(spark, SF_SMOKE).collect()
    assert rows
    assert abs(sum(r["mass_share"] for r in rows) - 1.0) < 1e-4
    for r in rows:
        # buckets below the cap (df ≤ 50 ⇒ bucket ≤ 5) drop nothing
        if r["df_bucket"] <= 4:
            assert r["capped_mass_share"] == 0.0, r
        assert 0.0 <= r["capped_mass_share"] <= r["mass_share"] + 1e-9
        assert r["postings"] >= r["n_shingles"]  # df ≥ 1 each


def test_ppl_percentiles_ordered(spark):
    from distributed_file_system_with_stream_processing_spark.plans import llm_ops9 as M9

    rows = M9.docs_ppl_percentiles_by_source(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        # log-loss is positive (probabilities < 1) and p50 ≤ p90
        assert 0.0 < r["p50_logloss"] <= r["p90_logloss"], r


def test_source_neardup_matrix_conserves_pairs(spark):
    from distributed_file_system_with_stream_processing_spark.operators import dedup as D
    from distributed_file_system_with_stream_processing_spark.plans import llm_ops9 as M9

    rows = M9.source_neardup_matrix(spark, SF_SMOKE).collect()
    assert rows
    total = sum(r["n_pairs"] for r in rows)
    n_pairs = D.minhash_lsh_pairs(load_table(spark, SF_SMOKE, "documents")).count()
    assert total == n_pairs
    for r in rows:
        assert r["source_a"] <= r["source_b"]  # canonical cell ordering


def test_survival_curve_monotone(spark):
    from distributed_file_system_with_stream_processing_spark.plans import llm_ops9 as M9

    rows = sorted(
        M9.events_survival_curve(spark, SF_SMOKE).collect(), key=lambda r: r["day"]
    )
    assert [r["day"] for r in rows] == [1, 3, 7, 14]
    surv = [r["survival"] for r in rows]
    assert surv == sorted(surv, reverse=True)  # survival only decays
    users = load_table(spark, SF_SMOKE, "events").select("user_id").distinct().count()
    assert all(r["n_users"] == users for r in rows)
    assert all(0.0 <= x <= 1.0 for x in surv)


def test_gini_bounds_and_pareto_consistency(spark):
    """0 ≤ G < 1, and G agrees in spirit with the Pareto read: if the
    top decile holds more than 10% of value, G > 0."""
    from distributed_file_system_with_stream_processing_spark.plans import llm_ops9 as M9

    r = M9.customer_revenue_gini(spark, SF_SMOKE).collect()[0]
    assert 0.0 <= r["gini"] < 1.0
    assert r["n_customers"] > 0 and r["total_revenue"] > 0


def test_single_source_histogram_conserves_parts(spark):
    from distributed_file_system_with_stream_processing_spark.plans import llm_ops9 as M9

    rows = M9.supplier_single_source_parts(spark, SF_SMOKE).collect()
    total = sum(r["n_parts"] for r in rows)
    parts = (
        load_table(spark, SF_SMOKE, "lineitem").select("l_partkey").distinct().count()
    )
    assert total == parts
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-4
