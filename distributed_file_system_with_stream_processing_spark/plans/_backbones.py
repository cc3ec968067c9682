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
    _MODELS.clear()


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


# ---------------------------------------------------------------------------
# Trained k-means model backbones (r8 verdict #2): through r7 eight
# queries re-ran Lloyd training inline on every invocation —
# semantic_dedup_kmeans, semdedup_cell_stats, embedding_knn_graph,
# embedding_hubness, ann_ivf_trained, ivf_cell_balance,
# ann_recall_audit, ann_probe_recall_curve — and training dominated
# the expensive bench tail (2.0–6.4 s each at sf0.1, ~6 of the 10
# costliest entries). Training is DETERMINISTIC (lowest-id seeds,
# exact integer component sums, driver-side division — the unrolled
# CTE the oracles replicate), so memoizing the centroid literals per
# (session, sf_dir, params) changes no output bit. Centroids are
# metadata (k·dim plain floats), cached as Python lists; the derived
# corpus-scale TABLES (the semdedup verdict table, the kNN edge list,
# the IVF top-k) persist through _cached like the dedup backbones.

_MODELS: dict[tuple[str, str, str], object] = {}


def _model(spark: SparkSession, sf_dir: str, kind: str, build):
    key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir), kind)
    if key not in _MODELS:
        _MODELS[key] = build()
    return _MODELS[key]


def embeddings_n(spark: SparkSession, sf_dir: str) -> int:
    """Corpus row count (sizes the dynamic ⌈√n⌉ cell count) — one
    metadata count() job per (session, sf_dir)."""
    return _model(
        spark, sf_dir, "emb_n",
        lambda: load_table(spark, sf_dir, "embeddings").count(),
    )


def kmeans_centroids(
    spark: SparkSession,
    sf_dir: str,
    *,
    k: int,
    iters: int,
    dim: int = 64,
    min_id: int | None = None,
) -> list[list[float]]:
    """Lloyd centroids trained ONCE per (session, sf_dir, k, iters,
    dim, min_id). ``min_id`` replicates the IVF queries' base-only
    training (id ≥ query_ids_below); None trains on the full table
    exactly like the inline ``kmeans_fit(emb, ...)`` call it
    replaces — the builder mirrors each call-site's frame shape so
    the trained literals are bit-identical to the pre-r8 inline run."""
    from distributed_file_system_with_stream_processing_spark.functions import vector as V
    from distributed_file_system_with_stream_processing_spark.operators import clustering as C

    def build() -> list[list[float]]:
        emb = load_table(spark, sf_dir, "embeddings")
        if min_id is None:
            return C.kmeans_fit(emb, k=k, iters=iters, dim=dim)
        e = emb.select(
            F.col("vec_id").alias("id"), V.as_double(F.col("embedding")).alias("v")
        ).filter(F.col("id") >= min_id)
        return C.kmeans_fit(e, id_col="id", vec_col="v", k=k, iters=iters, dim=dim)

    return _model(spark, sf_dir, f"kmeans:{k}:{iters}:{dim}:{min_id}", build)


def ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The registered ``ann_ivf_trained`` result (n_cells=16, iters=2,
    probe 3, top-5 over base id≥10) — persisted once per session;
    ``ann_recall_audit`` grades this exact table, so both queries now
    read one materialization."""
    from distributed_file_system_with_stream_processing_spark.operators import clustering as C
    from distributed_file_system_with_stream_processing_spark.plans.llm_ops2 import (
        _DIM,
        _KM_ITERS,
    )

    def build() -> DataFrame:
        return C.ivf_trained_ann(
            load_table(spark, sf_dir, "embeddings"),
            n_cells=16,
            iters=_KM_ITERS,
            probe_cells=3,
            query_ids_below=10,
            k=5,
            dim=_DIM,
            cents=kmeans_centroids(
                spark, sf_dir, k=16, iters=_KM_ITERS, dim=_DIM, min_id=10
            ),
        )

    return _cached(spark, sf_dir, "ivf_topk", build)


def semdedup_verdicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The registered ``semantic_dedup_kmeans`` verdict table
    (vec_id, cluster, keep) at the default parameterization —
    persisted once per session; ``semdedup_cell_stats`` rolls this
    exact table up."""
    from distributed_file_system_with_stream_processing_spark.operators import clustering as C
    from distributed_file_system_with_stream_processing_spark.plans.llm_ops3 import (
        _SD_ITERS,
        _SD_K,
        _SD_THRESHOLD,
    )

    def build() -> DataFrame:
        return C.semdedup_kmeans(
            load_table(spark, sf_dir, "embeddings"),
            k=_SD_K,
            iters=_SD_ITERS,
            threshold=_SD_THRESHOLD,
            dim=64,
            cents=kmeans_centroids(spark, sf_dir, k=_SD_K, iters=_SD_ITERS),
        )

    return _cached(spark, sf_dir, "semdedup_verdicts", build)


def knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The registered ``embedding_knn_graph`` edge list (within-cell
    cosine top-k over ⌈√n⌉ trained cells) — persisted once per
    session; ``embedding_hubness`` reads the same edges."""
    from distributed_file_system_with_stream_processing_spark.plans import llm_ops7 as L7

    return _cached(spark, sf_dir, "knn_graph", lambda: L7._knn_graph_plan(spark, sf_dir))


def pq_codebooks(
    spark: SparkSession,
    sf_dir: str,
    *,
    m: int = 8,
    codes: int = 16,
    iters: int = 2,
    dim: int = 64,
) -> list[list[list[float]]]:
    """PQ codebooks (Jégou et al. 2011) trained ONCE per (session,
    sf_dir, params) — the r9 extension of the kmeans_centroids stance
    to the last inline-training family (r8 verdict #2): through r8
    ``ann_pq_topk`` re-ran the fused Lloyd codebook passes on every
    invocation (8.2 s at sf1, training-dominated). The trainer is
    deterministic (lowest-id seeds, exact micro-integer component
    sums, driver-side division), so the memoized literals are
    bit-identical to an inline retrain. Trains on the SAME frame
    pq_topk trains on inline: the FULL (id, v) table, queries
    included."""
    from distributed_file_system_with_stream_processing_spark.functions import vector as V
    from distributed_file_system_with_stream_processing_spark.operators import clustering as C
    from distributed_file_system_with_stream_processing_spark.operators._util import spread

    def build() -> list[list[list[float]]]:
        emb = load_table(spark, sf_dir, "embeddings")
        e = emb.select(
            F.col("vec_id").alias("id"), V.as_double(F.col("embedding")).alias("v")
        )
        return C._pq_fit_codebooks(spread(e), m, dim // m, codes, iters)

    return _model(spark, sf_dir, f"pq_books:{m}:{codes}:{iters}:{dim}", build)


def opq_model(
    spark: SparkSession,
    sf_dir: str,
    *,
    m: int = 8,
    codes: int = 16,
    iters: int = 2,
    opt_iters: int = 1,
    dim: int = 64,
) -> tuple[list[list[float]], list[list[list[float]]]]:
    """OPQ (rotation, codebooks) pair (Ge et al. 2014) trained ONCE
    per (session, sf_dir, params) — ``ann_opq_topk``'s alternation was
    the slowest sf1 rehearsal row (52 s, training-dominated; r8
    verdict #2). opq_train is deterministic for a fixed build (PCA
    eigh + Procrustes SVD on exact distributed Gram sums, numpy
    matmul rotate passes), and every consumer is rows-only /
    recall-pinned — nothing hashes these floats against an oracle."""
    from distributed_file_system_with_stream_processing_spark.functions import vector as V
    from distributed_file_system_with_stream_processing_spark.operators import clustering as C
    from distributed_file_system_with_stream_processing_spark.operators._util import spread

    def build() -> tuple[list[list[float]], list[list[list[float]]]]:
        emb = load_table(spark, sf_dir, "embeddings")
        e = emb.select(
            F.col("vec_id").alias("id"), V.as_double(F.col("embedding")).alias("v")
        )
        rot, books, _trace = C.opq_train(
            spread(e), dim, m, codes, iters, opt_iters=opt_iters
        )
        return rot, books

    return _model(
        spark, sf_dir, f"opq:{m}:{codes}:{iters}:{opt_iters}:{dim}", build
    )


def logreg_weights(
    spark: SparkSession,
    sf_dir: str,
    *,
    positive_below: int,
    iters: int,
    lr: float,
    dim: int,
) -> tuple[list[float], float]:
    """Full-batch GD logistic-regression weights trained ONCE per
    (session, sf_dir, params) — the r9 extension of the
    kmeans_centroids stance to the last remaining inline trainer
    (``embedding_logreg_score`` re-ran both driver-synchronized GD
    jobs on every invocation). The trainer is deterministic
    (micro-quantized order-free integer gradient sums, driver-side
    exact update arithmetic — the unrolled CTE the oracle mirrors),
    so the memoized (w, b) literals are bit-identical to an inline
    retrain."""
    from distributed_file_system_with_stream_processing_spark.operators import logreg as L

    def build() -> tuple[list[float], float]:
        return L.logreg_fit(
            load_table(spark, sf_dir, "embeddings"),
            positive_below=positive_below,
            iters=iters,
            lr=lr,
            dim=dim,
        )

    return _model(
        spark, sf_dir, f"logreg:{positive_below}:{iters}:{lr!r}:{dim}", build
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
