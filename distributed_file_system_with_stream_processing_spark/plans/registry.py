"""Single registry of every (query, oracle) pair the engine exposes.

``__spark_entry__.py`` re-exports these; the driver runs each query at
sf0.01 against its DuckDB oracle (row-count + schema + value hash).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from distributed_file_system_with_stream_processing_spark.plans import (
    analytics,
    analytics_ext,
    analytics_more,
    analytics_tpch2,
    llm_ops,
    llm_ops2,
    llm_ops3,
    llm_ops4,
    llm_ops5,
    llm_ops6,
    llm_ops7,
    llm_ops8,
    llm_ops9,
    rainstorm_queries,
)

QueryFn = Callable[[SparkSession, str], DataFrame]

_MODULES = (
    analytics,
    analytics_ext,
    analytics_tpch2,
    analytics_more,
    rainstorm_queries,
    llm_ops,
    llm_ops2,
    llm_ops3,
    llm_ops4,
    llm_ops5,
    llm_ops6,
    llm_ops7,
    llm_ops8,
    llm_ops9,
)

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}
for _m in _MODULES:
    for _name, _fn in _m.QUERIES.items():
        if _name in QUERIES:
            raise ValueError(f"duplicate query name {_name!r}")
        QUERIES[_name] = _fn
    ORACLES.update(_m.ORACLES)

# The driver verifies queries in enumeration order and may cap the run
# (round 1 covered exactly the first 50 of 70). Front-load the entries
# that still need a driver CORRECTNESS row — round 5 (policy per the r4
# verdict: any query whose plan or oracle changed since its last green
# driver row sorts first):
#   1. the four queries with gate_broadcast plan edits in r4 AFTER
#      their last green r3 row (r4 verdict coverage caveat),
#   2. queries whose plan/oracle changes this round (rfm integer-cents
#      quantization, OPQ alternation promotion, neardup oracle
#      canonicalization),
#   3. new round-5 queries as they land.
# Everything previously green cedes its slot; the cap should spend
# zero rows re-confirming what already has a green driver row.
_FRONT = [
    # 1. plan edits (gate_broadcast) postdate their r3 green rows
    "minhash_jaccard_estimate",
    "minhash_containment",
    "cross_source_leakage",
    "embedding_kmeans_assign",
    # 2. changed this round
    "customer_rfm_segments",  # integer-cents monetary quantization
    "ann_opq_topk",  # registered query now runs 1 OPQ alternation
    "neardup_communities",  # oracle edge CTE canonicalized (least/greatest)
    "neardup_degree_stats",
    "neardup_triangle_stats",
    "neardup_khop_reach",
    "neardup_pagerank",
    # 3. new round-5 queries (appended as they land)
    "docs_interp_perplexity_bucketed",
    "events_peak_rate",
    "simhash_threshold_sweep",
    "embedding_label_drift",
    "orders_monthly_growth",
    "corpus_vocab_growth",
    "events_time_to_convert",
    "docs_duplicate_text_topk",
    "embedding_cosine_histogram",
    "embedding_knn_graph",
    "lsh_recall_curve",
    "customer_cohort_ltv",
    "events_dau_mau",
    "orders_priority_mix_shift",
    "embedding_hubness",
    "events_user_gaps",
    "docs_quality_dup_lift",
    "embedding_db_index",
    "session_path_topk",
    "minhash_threshold_sweep",
    "quality_ppl_correlation",
    "part_return_rates",
    "docs_char_class_profile",
    "ann_recall_audit",
    "docs_dedup_survivor_quality",
    "source_token_entropy",
    "customer_order_frequency",
    "query_likelihood_topk",
    "docs_token_percentiles_by_lang",
    "docs_template_shingles",
    "events_ab_conversion",
    "events_ab_value_ttest",
    "ann_probe_recall_curve",
    "ivf_cell_balance",
    "shingle_df_histogram",
    "docs_ppl_percentiles_by_source",
    "source_neardup_matrix",
    "events_survival_curve",
    "customer_revenue_gini",
    "supplier_single_source_parts",
]

_missing = [n for n in _FRONT if n not in QUERIES]
if _missing:
    raise ValueError(f"registry front-order names unknown: {_missing}")
QUERIES = {n: QUERIES[n] for n in (*_FRONT, *(k for k in QUERIES if k not in _FRONT))}


def get_queries() -> dict[str, QueryFn]:
    return dict(QUERIES)


def get_oracles() -> dict[str, str]:
    return dict(ORACLES)
