"""Session-persisted dedup backbones for the QA dashboard queries.

The four dedup-QA consumers (``dedup_agreement_matrix``,
``dedup_cluster_sizes``, ``docs_dedup_survivor_quality``,
``docs_effective_tokens``) all roll up the SAME detector outputs:
MinHash-LSH pairs (+ their connected components), SimHash pairs,
exact-substring pairs, and the exact-hash flagged set. Through round 6
each query re-derived its backbones inline, so the agreement matrix
recomputed four detectors per run (34.7 s at sf1 — r6 verdict #3).

This module computes each backbone ONCE per (SparkSession, sf_dir) and
hands out the ``persist()``-ed DataFrame: the first consumer pays the
detector cost, later consumers (and later stages of the same query)
read the materialized pair/CC table. The cached tables are dup-scale
(pair endpoints / component members), orders of magnitude smaller than
the corpus, so pinning them is safe at any SF — this is the
"semdedup_prepare_index" stance: persist the index, join the index.

Semantics are IDENTICAL to the inline derivations (same operators,
same parameters — the module only adds an InMemoryRelation), so the
consumers' oracles are unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_file_system_with_stream_processing_spark.functions import text as T
from distributed_file_system_with_stream_processing_spark.operators import dedup as D
from distributed_file_system_with_stream_processing_spark.sources.tables import load_table

# (applicationId, abs sf_dir, backbone name) -> persisted DataFrame.
# applicationId is unique per SparkContext, so a restarted context can
# never see another context's (invalid) persisted plans.
_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def _cached(spark: SparkSession, sf_dir: str, kind: str, build) -> DataFrame:
    key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir), kind)
    df = _CACHE.get(key)
    if df is None:
        df = build().persist()
        _CACHE[key] = df
    return df


def clear() -> None:
    """Unpersist and forget every cached backbone (test isolation)."""
    for df in _CACHE.values():
        try:
            df.unpersist()
        except Exception:  # context already stopped — nothing to free
            pass
    _CACHE.clear()


def minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate pairs at the registered default
    parameterization (n=3, num_hashes=12, bands=6) — the same pair set
    ``dedup_minhash_lsh`` / ``dedup_clusters`` derive inline."""
    return _cached(
        spark,
        sf_dir,
        "minhash_pairs",
        lambda: D.minhash_lsh_pairs(load_table(spark, sf_dir, "documents")),
    )


def minhash_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components (node, cluster_id) over ``minhash_pairs``
    — the ``dedup_clusters`` closure, built FROM the persisted pair
    table so the banding never re-runs for CC consumers."""
    return _cached(
        spark,
        sf_dir,
        "minhash_cc",
        lambda: D.connected_components(minhash_pairs(spark, sf_dir)),
    )


def simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash pairs at the registered default (n=3, hamming ≤3)."""
    return _cached(
        spark,
        sf_dir,
        "simhash_pairs",
        lambda: D.simhash_pairs(
            load_table(spark, sf_dir, "documents"), n=3, max_hamming=3
        ),
    )


def substring_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring pairs — the registered ``dedup_exact_substring``
    plan (stride-1 window-hash equi-join, df≤50 stop-window cap)."""
    from distributed_file_system_with_stream_processing_spark.plans.llm_ops4 import (
        dedup_exact_substring,
    )

    return _cached(
        spark,
        sf_dir,
        "substring_pairs",
        lambda: dedup_exact_substring(spark, sf_dir),
    )


def exact_flagged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_ids in exact-duplicate groups (normalized-text md5, group
    size >1) — the member expansion of the ``dedup_exact`` census."""

    def build() -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        eh = docs.select("doc_id", F.md5(T.norm_text(F.col("text"))).alias("h"))
        dup_h = (
            eh.groupBy("h").agg(F.count(F.lit(1)).alias("n")).filter(F.col("n") > 1)
        )
        return eh.join(dup_h.select("h"), "h").select("doc_id")

    return _cached(spark, sf_dir, "exact_flagged", build)
