"""Training-data curation queries, fifth LLM-pipeline module.

Same contract as ``llm_ops``…``llm_ops4``: declarative DataFrame
plans (JVM expressions only), each with a DuckDB oracle mirroring the
exact arithmetic so value hashes match without tolerances; per-item
float contributions are quantized ONCE to integer micro-units so
every downstream reduction is an order-free integer sum.

Ops here:
- ``bpe_per_lang_rules`` — per-language BPE vocabularies trained in
  ONE fused pair-count job per iteration (rows-only; rule-for-rule
  parity with the single-language trainer pinned in tests).
- ``tfidf_retrieval_topk`` — sparse lexical retrieval: per-query
  TF-IDF dot product with exact-integer dots and a correctly-rounded
  sqrt doc-norm, the inverted-index twin of ann_cosine_topk.
- ``events_transition_matrix`` — first-order Markov transitions over
  per-user event sequences (session-analytics / behavior-model
  feature).
- ``source_temperature_mix`` — temperature-scaled (n_i^alpha)
  multinomial sampling weights per source, the data-mixing knob
  (Raffel et al. 2020 §3.4.3 examples-proportional mixing).
- ``embedding_logreg_score`` — distributed logistic regression
  (full-batch GD, unrolled-CTE oracle, bit-exact).
- ``ann_opq_topk`` — OPQ: PCA rotation + balanced subspaces ahead of
  the shared PQ pipeline (rows-only).
- ``embedding_random_projection`` — JL sketch 64→16 with portable
  uniform planes, scale √(3/k) (oracled).
- ``embedding_pca_spectrum`` — eigenvalue spectrum off the
  distributed second moment (rows-only, numpy parity).
- ``corpus_zipf_fit`` — least-squares Zipf slope over the term
  frequency table, exact integer regression moments (oracled).
- ``docs_kn_perplexity`` — interpolated Kneser-Ney bigram LM
  (continuation counts, estimated discount; oracled bit-for-bit).
- ``decontaminate_bloom`` — Bloom-filter decontamination on the
  portable affine hash family (fully oracled; one-sided, metadata
  filter size at any eval scale).
- ``neardup_pagerank`` — PageRank over the near-dup graph as ONE
  unrolled declarative plan (no driver sync; oracled bit-for-bit).
- ``dedup_agreement_matrix`` — cross-method dedup overlap dashboard
  (rows-only; set-algebra hard check).
- ``bpe_compression_curve`` — all-merge-depth tokenizer budget in one
  fused scan (rows-only, reference-exact).
- ``bpe_fertility_by_lang`` — per-language own-vs-global vocabulary
  fertility (rows-only, reference-exact).

The reference engine streams text lines through RainStorm operators
(reference rainstorm/rainstorm.go:307-355); everything here is part
of the beyond-reference LLM-data-pipeline surface (SURVEY.md §2).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from distributed_file_system_with_stream_processing_spark.operators._util import (
    plan_ckpt as _plan_ckpt,
)
from distributed_file_system_with_stream_processing_spark.functions import text as T
from distributed_file_system_with_stream_processing_spark.operators._util import spread
from distributed_file_system_with_stream_processing_spark.plans.llm_ops import _WS
from distributed_file_system_with_stream_processing_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# bpe_per_lang_rules

_PL_MERGES = 4


def bpe_per_lang_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language BPE tokenizer training — every language's first
    ``_PL_MERGES`` merge rules, learned in ONE fused pair-count job
    per iteration over the (lang, word) table (operators/bpe.py
    bpe_train_per_lang: per-language argmax via a low-cardinality
    grouped top-1, merges applied in a single lang-dispatched
    projection — n_languages independent trainings share each
    corpus-scale job instead of multiplying driver-synchronized jobs
    by n_languages, the PQ-codebook fused-trainer stance).

    Rows-only for the driver (iterative rule sequences have no SQL
    oracle); the HARD check is tests/test_bpe.py: each language's
    rule list equals the single-language trainer run on that lang
    slice, which itself is pinned against a pure-Python BPE.
    """
    from distributed_file_system_with_stream_processing_spark.operators import bpe as B

    rules = B.bpe_train_per_lang(
        load_table(spark, sf_dir, "documents"), n_merges=_PL_MERGES
    )
    rows = [
        (lang, r["rank"], r["left"], r["right"], r["merged"], r["pair_count"])
        for lang in sorted(rules)
        for r in rules[lang]
    ]
    return spark.createDataFrame(
        rows, "lang string, rank long, left string, right string, merged string, pair_count long"
    )


# ---------------------------------------------------------------------------
# tfidf_retrieval_topk

_TR_QUERIES_BELOW = 10  # docs with doc_id < 10 act as the query table
_TR_QTERMS = 6  # first N words of a query doc form its term set
_TR_K = 5
_TR_MICRO = 1_000_000


def tfidf_retrieval_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse TF-IDF retrieval: per-query cosine-style score
    dot(q, d) / ||d|| where q is the binary query-term vector (the
    bm25_retrieval_topk query convention: lowest ``_TR_QUERIES_BELOW``
    doc ids, first ``_TR_QTERMS`` lowercased deduped words) and d is
    the document's TF-IDF vector — the inverted-index lexical twin of
    the dense ann_cosine_topk.

    Exactness: each posting weight w(t,d) = tf·ln(n_docs/df) is
    quantized ONCE to integer micro-units; the query·doc dot is then
    an order-free integer SUM, and the doc norm is the exact integer
    sum of SQUARED micro-weights (held in DECIMAL(38,0) — 64-bit
    squares overflow long sums) computed over the FULL vocabulary, not
    just matched terms. The final score divides the exact dot by
    sqrt(exact norm) — sqrt and division are IEEE correctly-rounded,
    so both engines produce bit-identical doubles with no tolerance.

    100 TB shape: postings backbone [shuffle 1 on (doc, term)]; df per
    term [shuffle 2 on term — vocab-scale]; df joins BACK to postings
    on term [shuffle 3; hot terms are exactly the low-idf ones, and
    AQE skew-split handles the Zipf head]; per-doc norms fold off the
    weighted postings [shuffle 4 on doc_id]; the query-term table
    BROADCASTS into the weighted postings so only matching rows
    survive; the per-(query, doc) dot [shuffle 5, tiny] joins the
    broadcast-able norm slice of matched docs. Final top-k is the
    per-query rank window. The corpus is never nested-loop joined and
    never re-scanned: one scan feeds the whole chain.
    """
    d = spread(load_table(spark, sf_dir, "documents"))
    toks = d.select("doc_id", T.words(F.col("text")).alias("ws"))
    qterms = (
        toks.filter(F.col("doc_id") < _TR_QUERIES_BELOW)
        .select(
            F.col("doc_id").alias("query_id"),
            F.explode_outer(F.slice("ws", 1, _TR_QTERMS)).alias("w"),
        )
        .filter(F.col("w").isNotNull())
        .select("query_id", F.lower(F.col("w")).alias("term"))
        .distinct()
    )
    base = toks.filter(F.col("doc_id") >= _TR_QUERIES_BELOW)
    n_docs = base.agg(F.count(F.lit(1)).alias("n_docs"))
    postings = (
        base.select("doc_id", F.explode_outer("ws").alias("w"))
        .filter(F.col("w").isNotNull())
        .select("doc_id", F.lower(F.col("w")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_t = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    weighted = (
        postings.join(df_t, "term")
        .crossJoin(broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            # ok-round: irrational (ln idf) quantization
            F.round(
                F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("df"))
                * _TR_MICRO
            )
            .cast("long")
            .alias("w_mu"),
        )
        # r9 optimization: the weighted postings feed BOTH the norm
        # fold and the query-matched dot; branch-specific pruning
        # defeats AQE stage reuse, so the scan→explode→tf→idf chain
        # ran twice. Materializing once (localCheckpoint) costs one
        # write of the index-scale table the bucketed twins persist
        # anyway — strictly less than re-running the chain that
        # produces it.
        .transform(_plan_ckpt)
    )
    norms = weighted.groupBy("doc_id").agg(
        F.sum(F.col("w_mu").cast("decimal(38,0)") * F.col("w_mu")).alias("norm2")
    )
    dots = (
        weighted.join(broadcast(qterms), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.sum("w_mu").alias("dot_mu"))
    )
    # norm2 = 0 iff every term of the doc has df == n_docs (all
    # weights ln(1) = 0): score would be 0/sqrt(0) = NaN in BOTH
    # engines — identical, but NaN must not leak into the output
    # column, so such degenerate docs are excluded before ranking
    # (mirrored by the oracle's norm2 > 0 predicate).
    scored = (
        dots.join(norms, "doc_id")
        .filter(F.col("norm2") > 0)
        .select(
            "query_id",
            "doc_id",
            (
                F.col("dot_mu").cast("double")
                / F.sqrt(F.col("norm2").cast("double"))
            ).alias("_score"),
            "dot_mu",
        )
    )
    win = Window.partitionBy("query_id").orderBy(
        F.desc("dot_mu"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(win).cast("long"))
        .filter(F.col("rank") <= _TR_K)
        .select(
            "query_id",
            "doc_id",
            F.round(F.col("_score"), 6).alias("score"),
            "rank",
        )
    )


TFIDF_RETRIEVAL_SQL = rf"""
WITH toks AS (SELECT doc_id, {_WS} AS ws FROM documents),
qterms AS (
    SELECT DISTINCT doc_id AS query_id, lower(unnest(ws[1:{_TR_QTERMS}])) AS term
    FROM toks WHERE doc_id < {_TR_QUERIES_BELOW}
),
base AS (SELECT * FROM toks WHERE doc_id >= {_TR_QUERIES_BELOW}),
nd AS (SELECT count(*) AS n_docs FROM base),
postings AS (
    SELECT doc_id, term, count(*) AS tf FROM (
        SELECT doc_id, lower(unnest(ws)) AS term FROM base)
    GROUP BY doc_id, term
),
df_t AS (SELECT term, count(*) AS df FROM postings GROUP BY term),
weighted AS (
    SELECT p.doc_id, p.term,
           -- ok-round: irrational (ln idf)
           CAST(round(p.tf * ln(CAST(n.n_docs AS DOUBLE) / d.df)
                      * {_TR_MICRO}) AS BIGINT) AS w_mu
    FROM postings p JOIN df_t d USING (term) CROSS JOIN nd n
),
norms AS (
    SELECT doc_id, sum(CAST(w_mu AS DECIMAL(38,0)) * w_mu) AS norm2
    FROM weighted GROUP BY doc_id
),
dots AS (
    SELECT q.query_id, w.doc_id, sum(w.w_mu) AS dot_mu
    FROM weighted w JOIN qterms q USING (term)
    GROUP BY q.query_id, w.doc_id
),
rk AS (
    SELECT d.query_id, d.doc_id,
           CAST(d.dot_mu AS DOUBLE) / sqrt(CAST(n.norm2 AS DOUBLE)) AS score,
           d.dot_mu,
           row_number() OVER (PARTITION BY d.query_id
                              ORDER BY d.dot_mu DESC, d.doc_id) AS rank
    FROM dots d JOIN norms n USING (doc_id)
    WHERE n.norm2 > 0
)
SELECT query_id, doc_id, round(score, 6) AS score, CAST(rank AS BIGINT) AS rank
FROM rk WHERE rank <= {_TR_K}
"""


# ---------------------------------------------------------------------------
# events_transition_matrix

_TM_MIN_N = 1  # keep all transitions; prob denominators are exact ints


def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next_type | prev_type) with exact-integer counts and
    a correctly-rounded single division — the behavior-model /
    session-analytics feature table.

    100 TB shape: ONE shuffle of the fact table (window partitioned by
    user_id, ordered (ts, event_id) — the sessionize backbone), then a
    low-cardinality (type × type) aggregation with map-side partials;
    the per-prev denominator rides a tiny window over the ≤|types|²
    count table, not a second pass over the facts. Deterministic:
    (ts, event_id) is a total order, so every engine sees the same
    successor for every event.
    """
    ev = spread(load_table(spark, sf_dir, "events"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            "user_id",
            F.col("event_type").alias("prev_type"),
            F.lead("event_type").over(w).alias("next_type"),
        )
        .filter(F.col("next_type").isNotNull())
    )
    cnt = pairs.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    wtot = Window.partitionBy("prev_type")
    return (
        cnt.withColumn("n_prev", F.sum("n").over(wtot))
        .select(
            "prev_type",
            "next_type",
            "n",
            # r9 conversion (wave 3): truncating integer division
            (F.expr("(n * 1000000) div n_prev").cast("double") / 1e6)
            .alias("p"),
        )
        .filter(F.col("n") >= _TM_MIN_N)
    )


TRANSITION_SQL = """
WITH seq AS (
    SELECT user_id, event_type AS prev_type,
           lead(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS next_type
    FROM events
),
cnt AS (
    SELECT prev_type, next_type, count(*) AS n FROM seq
    WHERE next_type IS NOT NULL GROUP BY prev_type, next_type
)
SELECT prev_type, next_type, CAST(n AS BIGINT) AS n,
       CAST((n * 1000000) // sum(n) OVER (PARTITION BY prev_type) AS DOUBLE)
           / 1000000.0 AS p
FROM cnt
"""


# ---------------------------------------------------------------------------
# source_temperature_mix

_MIX_ALPHA = 0.7  # temperature exponent (T5-style examples-proportional cap)
_MIX_MICRO = 1_000_000


def source_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled multinomial sampling weights per source:
    w_i = n_i^alpha / Σ_j n_j^alpha over whitespace-token counts — the
    data-mixing knob that up-weights small sources (alpha < 1) when
    assembling a training mixture (Raffel et al. 2020 §3.4.3).

    Exactness: token counts are exact integers [one corpus shuffle on
    source — 20 groups, map-side partials do the work]; n_i^alpha is
    quantized ONCE to micro-units, so the weight is a ratio of exact
    integers (single correctly-rounded division). The scaled table is
    |sources| rows — the window denominator is metadata-scale.
    """
    d = spread(load_table(spark, sf_dir, "documents"))
    per_src = (
        d.select("source", F.size(T.words(F.col("text"))).alias("nt"))
        .groupBy("source")
        .agg(F.sum("nt").alias("n_tokens"))
    )
    scaled = per_src.select(
        "source",
        "n_tokens",
        F.round(F.pow(F.col("n_tokens").cast("double"), _MIX_ALPHA) * _MIX_MICRO)
        .cast("long")
        .alias("_s_mu"),
    )
    wtot = Window.partitionBy()
    # r9 conversion (wave 3): truncating integer division at 6 dp on
    # the micro-quantized temperature weights
    return scaled.withColumn("_t", F.sum("_s_mu").over(wtot)).select(
        "source",
        "n_tokens",
        (F.expr("(_s_mu * 1000000) div _t").cast("double") / 1e6).alias(
            "weight"
        ),
    )


TEMPERATURE_MIX_SQL = rf"""
WITH per_src AS (
    SELECT source, sum(len({_WS})) AS n_tokens FROM documents GROUP BY source
),
scaled AS (
    SELECT source, n_tokens,
           CAST(round(pow(CAST(n_tokens AS DOUBLE), {_MIX_ALPHA})
                      * {_MIX_MICRO}) AS BIGINT) AS s_mu
    FROM per_src
)
SELECT source, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST((s_mu * 1000000) // sum(s_mu) OVER () AS DOUBLE)
           / 1000000.0 AS weight
FROM scaled
"""


# ---------------------------------------------------------------------------
# ann_opq_topk


def ann_opq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZED product quantization (Ge et al. 2014): PCA-rotate the
    embeddings into an eigenvalue-balanced basis (rotation trained by
    a shuffle-free distributed second-moment pass — one dim×dim Gram
    partial per partition), then the identical PQ pipeline on the
    rotated coordinates. The rotation is orthonormal so cosine / L2
    are exactly preserved — only quantization error changes, which
    the balanced subspaces reduce. See operators/clustering.opq_topk.
    Registered with ONE full Ge-et-al. alternation (Procrustes
    rotation ↔ codebook retrain — promoted in r5 per the r4 verdict;
    the init-only shortcut is gone and the alternation's
    monotone-objective guarantee stays pinned in tests/test_ann.py).
    Rows-only (recall pinned ≥ the plain-PQ floor and vs brute force
    in tests/test_ann.py; the rotation itself is unit-tested for
    orthonormality and distance preservation). r9: the (rotation,
    codebooks) pair reads the session-persisted training
    (_backbones.opq_model — the kmeans_centroids stance; the 52 s sf1
    alternation cost is paid once per session, the search plan is
    unchanged)."""
    from distributed_file_system_with_stream_processing_spark.operators import clustering as C
    from distributed_file_system_with_stream_processing_spark.plans import _backbones as B

    return C.opq_topk(
        load_table(spark, sf_dir, "embeddings"), query_ids_below=10, k=5,
        opt_iters=1, model=B.opq_model(spark, sf_dir, opt_iters=1),
    )


# ---------------------------------------------------------------------------
# embedding_logreg_score

_LR_ITERS = 2
_LR_RATE = 0.5
_LR_DIM = 64
_LR_POS = 5  # labels < 5 are the positive class (~50/50 split)
_LR_MICRO = 1_000_000


def embedding_logreg_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed logistic regression (full-batch GD, ``_LR_ITERS``
    steps from w = 0) trained on the embeddings table and scored back
    over it — the quality-classifier recipe of an LLM pipeline run as
    one Spark job per iteration with the weight vector as driver
    metadata (operators/logreg.py; the kmeans centroids-are-literals
    execution model applied to gradient descent).

    ORACLED, bit-for-bit: the DuckDB oracle unrolls both GD steps
    into CTEs — per-row contributions micro-quantized once so the
    gradient is an order-free integer sum, sequential-association dot
    products, and the driver's exact update arithmetic mirrored as
    SQL — the embedding_kmeans_assign stance applied to a second
    iterative trainer.
    """
    from distributed_file_system_with_stream_processing_spark.operators import logreg as L
    from distributed_file_system_with_stream_processing_spark.plans import _backbones as B

    emb = load_table(spark, sf_dir, "embeddings")
    # r9 optimization: weights come from the session-persisted model
    # backbone (the kmeans_centroids stance — _backbones.logreg_weights
    # memoizes the SAME deterministic logreg_fit call), so repeated
    # invocations score without re-running the GD jobs.
    w, b = B.logreg_weights(
        spark,
        sf_dir,
        positive_below=_LR_POS,
        iters=_LR_ITERS,
        lr=_LR_RATE,
        dim=_LR_DIM,
    )
    return L.logreg_score(emb, w, b, positive_below=_LR_POS)


def _logreg_oracle() -> str:
    """Unroll ``_LR_ITERS`` GD steps into CTEs, lockstep with
    operators/logreg.py arithmetic."""
    d, lr, mu = _LR_DIM, repr(_LR_RATE), _LR_MICRO
    parts = [
        f"""WITH e AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
           CASE WHEN label < {_LR_POS} THEN 1.0 ELSE 0.0 END AS y
    FROM embeddings
),
cnt AS (SELECT count(*) AS n FROM e),
w0 AS (SELECT list_transform(range(1, {d + 1}), i -> 0.0) AS w, 0.0 AS b)"""
    ]
    for k in range(1, _LR_ITERS + 1):
        parts.append(
            f""",
p{k} AS (
    SELECT e.v, e.y,
           1.0 / (1.0 + exp(-(list_sum(list_transform(range(1, {d + 1}),
                 i -> e.v[i] * w{k - 1}.w[i])) + w{k - 1}.b))) AS p
    FROM e, w{k - 1}
),
g{k} AS (
    SELECT t.i AS idx,
           sum(CAST(round((p - y) * v[t.i] * {mu}) AS BIGINT)) AS g
    FROM p{k}, range(1, {d + 1}) t(i) GROUP BY t.i
),
gb{k} AS (SELECT sum(CAST(round((p - y) * {mu}) AS BIGINT)) AS gb FROM p{k}),
w{k} AS (
    SELECT (SELECT list(w{k - 1}.w[g{k}.idx]
                        - {lr} * ((CAST(g{k}.g AS DOUBLE) / 1000000.0) / cnt.n)
                        ORDER BY g{k}.idx)
            FROM g{k}, w{k - 1}, cnt) AS w,
           (SELECT w{k - 1}.b
                   - {lr} * ((CAST(gb{k}.gb AS DOUBLE) / 1000000.0) / cnt.n)
            FROM gb{k}, w{k - 1}, cnt) AS b
)"""
        )
    kf = _LR_ITERS
    parts.append(
        f"""
SELECT e.vec_id,
       CAST(CASE WHEN e.y = 1.0 THEN 1 ELSE 0 END AS BIGINT) AS y,
       -- ok-round: irrational (logistic sigmoid)
       round(1.0 / (1.0 + exp(-(list_sum(list_transform(range(1, {d + 1}),
             i -> e.v[i] * w{kf}.w[i])) + w{kf}.b))), 6) AS p,
       CAST((1.0 / (1.0 + exp(-(list_sum(list_transform(range(1, {d + 1}),
             i -> e.v[i] * w{kf}.w[i])) + w{kf}.b))) >= 0.5) AS BIGINT) AS pred
FROM e, w{kf}"""
    )
    return "".join(parts)


EMBEDDING_LOGREG_SQL = _logreg_oracle()


# ---------------------------------------------------------------------------
# embedding_random_projection

_RP_K = 16  # target dimensionality (64 → 16)
_RP_DIM = 64


def embedding_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss random projection 64 → ``_RP_K`` dims:
    y_p = (1/√k)·⟨v, plane_p⟩ with the SAME md5-derived portable
    hyperplanes the LSH family uses (operators/similarity.
    hyperplane_matrix — Python-float literals both engines embed
    verbatim). The cheap distance-sketch that feeds clustering /
    dedup when 64 floats per row is still too wide at 100 TB.

    Zero shuffles — scan → fold-dot per component → posexplode to
    (vec_id, comp, val) rows (exploded output keeps the value hash
    scalar-typed). Dots are sequential folds, scaled once, rounded
    once — lockstep with DuckDB list_sum. The scale is √(3/k), not
    the Gaussian 1/√k: the md5-derived plane entries are uniform on
    [-1, 1] with variance 1/3, and the JL estimator is unbiased only
    when scaled by 1/√(k·Var) — property-tested (mean projected/
    original squared-distance ratio ≈ 1, tests/test_ann.py).
    """
    from distributed_file_system_with_stream_processing_spark.operators.clustering import _lit_arr
    from distributed_file_system_with_stream_processing_spark.operators.similarity import (
        hyperplane_matrix,
    )

    planes = hyperplane_matrix(_RP_DIM, _RP_K)
    scale = math.sqrt(3.0 / _RP_K)
    emb = load_table(spark, sf_dir, "embeddings")
    e = spread(emb).selectExpr(
        "vec_id", "CAST(embedding AS array<double>) AS v"
    )
    comps = ",".join(
        f"round(aggregate(zip_with(v, {_lit_arr(p)}, (a, b) -> a * b), "
        f"CAST(0 AS DOUBLE), (acc, x) -> acc + x) * {scale!r}, 6)"
        for p in planes
    )
    return (
        e.selectExpr("vec_id", f"posexplode(array({comps})) AS (comp, val)")
        .select("vec_id", F.col("comp").cast("long").alias("comp"), "val")
    )


def _rp_oracle() -> str:
    from distributed_file_system_with_stream_processing_spark.operators.similarity import (
        hyperplane_matrix,
    )

    planes = hyperplane_matrix(_RP_DIM, _RP_K)
    scale = math.sqrt(3.0 / _RP_K)
    comps = ",".join(
        "round(list_sum(list_transform(range(1, %d), i -> v[i] * (%s)[i])) * %r, 6)"
        % (
            _RP_DIM + 1,
            "LIST_VALUE(" + ",".join(repr(c) for c in p) + ")",
            scale,
        )
        for p in planes
    )
    return f"""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
proj AS (SELECT vec_id, LIST_VALUE({comps}) AS ys FROM e)
SELECT vec_id, CAST(t.i - 1 AS BIGINT) AS comp, ys[t.i] AS val
FROM proj, range(1, {_RP_K + 1}) t(i)
"""


EMBEDDING_RP_SQL = _rp_oracle()


# ---------------------------------------------------------------------------
# embedding_pca_spectrum

_PCA_TOPK = 16


def embedding_pca_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA eigenvalue spectrum of the embedding table — the
    dimensionality-budget dashboard (how many directions carry the
    energy, is the 64-dim table really 64-dimensional): top
    ``_PCA_TOPK`` eigenvalues of the uncentered second moment with
    cumulative energy share. Reuses the OPQ trainer's distributed
    second-moment pass (ONE dim×dim Gram partial per partition, zero
    shuffles; eigh driver-side on the dim×dim metadata matrix).
    Rows-only (LAPACK eigenvalues have no SQL oracle); numpy parity
    on the collected table is pinned in tests/test_ann.py."""
    import numpy as np

    from distributed_file_system_with_stream_processing_spark.operators.clustering import (
        _second_moment,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    e = spread(emb).selectExpr("vec_id AS id", "CAST(embedding AS array<double>) AS v")
    g, n = _second_moment(e, _RP_DIM)
    vals = np.linalg.eigvalsh(g / max(n, 1))[::-1]  # descending
    tot = float(vals.sum())
    rows, cum = [], 0.0
    for i in range(_PCA_TOPK):
        cum += float(vals[i])
        rows.append((i + 1, round(float(vals[i]), 6), round(100.0 * cum / tot, 4)))
    return spark.createDataFrame(
        rows, "component long, eigenvalue double, cum_energy_pct double"
    )


# ---------------------------------------------------------------------------
# corpus_zipf_fit

_ZF_MICRO = 1_000_000


def corpus_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit over the corpus term-frequency table: least-squares
    slope/intercept of ln(freq) on ln(rank) — the one-row
    distribution-shape diagnostic (natural text ≈ −1; a corpus that
    drifts far off is boilerplate- or spam-heavy).

    Exactness: each term contributes (ln rank, ln freq) quantized ONCE
    to integer micro-units; all five regression moments are exact
    integer sums (DECIMAL(38,0) for the product moments — x·y products
    reach 1e14 per term), and the closed-form slope/intercept is a
    fixed sequence of correctly-rounded double ops on identical
    inputs, so both engines agree bitwise.

    100 TB shape: term counts are the one corpus-scale shuffle
    (map-side partials); ranking is a VOCAB-scale global sort (a
    single-partition row_number window — the standard diagnostic
    shape: the vocabulary is orders of magnitude smaller than the
    corpus; if even that is too wide, pre-aggregate to (cnt, n_terms)
    frequency-of-frequencies first); the moment aggregate returns ONE
    row.
    """
    d = spread(load_table(spark, sf_dir, "documents"))
    counts = (
        d.select(F.explode_outer(T.words(F.col("text"))).alias("w"))
        .filter(F.col("w").isNotNull())
        .select(F.lower(F.col("w")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    ranked = counts.withColumn(
        "rank",
        F.row_number().over(Window.orderBy(F.desc("cnt"), F.asc("term"))),
    )
    pts = ranked.select(
        F.round(F.log(F.col("rank").cast("double")) * _ZF_MICRO)
        .cast("long")
        .alias("x"),
        F.round(F.log(F.col("cnt").cast("double")) * _ZF_MICRO)
        .cast("long")
        .alias("y"),
    )
    m = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("y")).alias("sxy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias("sxx"),
    )
    # r9 conversion (wave 3): slope = num/den of exact decimal(38,0)
    # moments — truncating integer division at 6 dp; the intercept
    # then reuses the TRUNCATED slope k (an exact 1e-6-grid decimal):
    # (sy/mu − (k/10⁶)(sx/mu))/n = (sy·10⁶ − k·sx)/(10⁶·mu·n), one
    # more exact integer division. Signed: both engines truncate
    # toward zero (oracle uses HUGEINT — DuckDB DECIMAL // floors
    # fractionally, so it must never be used there).
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    staged = (
        m.withColumn("_num", dec("n") * F.col("sxy") - dec("sx") * dec("sy"))
        .withColumn("_den", dec("n") * F.col("sxx") - dec("sx") * dec("sx"))
        .withColumn("_k", F.expr("(_num * 1000000) div _den"))
    )
    return staged.select(
        F.col("n").cast("long").alias("n_terms"),
        (F.col("_k").cast("double") / 1e6).alias("zipf_slope"),
        (
            F.expr(
                "(cast(sy as decimal(38,0)) * 1000000"
                " - cast(_k as decimal(38,0)) * sx)"
                f" div (cast({_ZF_MICRO} as decimal(38,0)) * n)"
            ).cast("double")
            / 1e6
        ).alias("ln_intercept"),
    )


CORPUS_ZIPF_SQL = rf"""
WITH counts AS (
    SELECT term, count(*) AS cnt FROM (
        SELECT lower(unnest({_WS})) AS term FROM documents)
    GROUP BY term
),
ranked AS (
    SELECT cnt, row_number() OVER (ORDER BY cnt DESC, term) AS rank
    FROM counts
),
pts AS (
    -- ok-round: irrational (ln family — Kneser-Ney discounted gain)
    SELECT CAST(round(ln(CAST(rank AS DOUBLE)) * {_ZF_MICRO}) AS BIGINT) AS x,
           CAST(round(ln(CAST(cnt AS DOUBLE)) * {_ZF_MICRO}) AS BIGINT) AS y
    FROM ranked
),
m AS (
    SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
           sum(CAST(x AS DECIMAL(38,0)) * y) AS sxy,
           sum(CAST(x AS DECIMAL(38,0)) * x) AS sxx
    FROM pts
),
k AS (
    SELECT n, sx, sy,
           ((CAST(n AS HUGEINT) * CAST(sxy AS HUGEINT)
             - CAST(sx AS HUGEINT) * CAST(sy AS HUGEINT)) * 1000000)
           // (CAST(n AS HUGEINT) * CAST(sxx AS HUGEINT)
               - CAST(sx AS HUGEINT) * CAST(sx AS HUGEINT)) AS k
    FROM m
)
SELECT CAST(n AS BIGINT) AS n_terms,
       CAST(k AS DOUBLE) / 1000000.0 AS zipf_slope,
       CAST((CAST(sy AS HUGEINT) * 1000000 - k * CAST(sx AS HUGEINT))
            // (CAST({_ZF_MICRO} AS HUGEINT) * n) AS DOUBLE) / 1000000.0
           AS ln_intercept
FROM k
"""


# ---------------------------------------------------------------------------
# docs_kn_perplexity — interpolated Kneser-Ney bigram LM

_KN_MICRO = 1_000_000


def docs_kn_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document perplexity under an interpolated KNESER-NEY bigram
    LM (Kneser & Ney 1995; Chen & Goodman 1999's strongest classical
    smoother — completes the family add-k → Jelinek-Mercer → KN):

        p(v|u) = max(c(uv) − D, 0)/c(u·)
                 + (D·N1+(u·)/c(u·)) · N1+(·v)/N1+(··)

    with the standard estimated discount D = n1/(n1 + 2·n2) (n1, n2 =
    bigram types seen once / twice). The continuation probability
    N1+(·v)/N1+(··) is what distinguishes KN: how many CONTEXTS a word
    completes, not how often it occurs.

    Float-determinism: every model input is an exact integer count; D
    is one division of exact ints; each gram's p is a fixed
    multiply-divide-add sequence on those; ln(p) micro-quantizes ONCE
    per gram and per-doc reductions are exact integer sums — the
    established LM convention.

    100 TB shape: the bigram backbone's shuffles + three
    gram-count-table-scale (NOT corpus-scale) aggregations — c(u·)
    and N1+(u·) fold in ONE groupBy on the first token, N1+(·v) in
    one on the second; (D, N1+(··)) ride a single 1-row BuildRight
    broadcast; per-doc integer sum ends the chain. Map-side partials
    everywhere; nothing quadratic.
    """
    from distributed_file_system_with_stream_processing_spark.plans.llm_ops4 import _bigram_tf

    d = spread(load_table(spark, sf_dir, "documents"))
    bg = _bigram_tf(d)
    model = kn_model(bg)
    scored = (
        bg.join(model, "gram")
        .select("doc_id", "tf", (F.col("tf") * F.col("l_mu")).alias("_tl"))
        .groupBy("doc_id")
        .agg(F.sum("tf").alias("n_bigrams"), F.sum("_tl").alias("_s"))
    )
    ppl = F.exp(-(F.col("_s").cast("double") / _KN_MICRO) / F.col("n_bigrams"))
    return scored.select(
        "doc_id",
        F.col("n_bigrams").cast("long").alias("n_bigrams"),
        F.round(ppl, 4).alias("kn_ppl"),
    )


def kn_model(bg) -> DataFrame:
    """(gram, l_mu): the trained interpolated-KN bigram LM off a
    (doc_id, gram, tf) table — extracted so the plain scorer above
    and the bucketed twin below share one trainer (the
    bigram_model/bigram_score split of llm_ops4, applied to KN)."""
    # r9 optimization: the corpus gram-count table fans out FOUR ways
    # (u_tbl, v_tbl, consts, the model join) with branch-specific
    # pruning that defeats AQE stage reuse — the (doc, gram) corpus
    # pass re-ran per branch. localCheckpoint materializes the
    # gram-count-table-scale (NOT corpus-scale) model input once per
    # invocation; the scorer's own bg pass is unchanged.
    cbg = bg.groupBy("gram").agg(F.sum("tf").alias("c")).transform(_plan_ckpt)
    u_tbl = (
        cbg.select(F.substring_index("gram", " ", 1).alias("u"), "c")
        .groupBy("u")
        .agg(F.sum("c").alias("cu"), F.count(F.lit(1)).alias("n1u"))
    )
    v_tbl = (
        cbg.select(F.substring_index("gram", " ", -1).alias("v"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("nv"))
    )
    consts = cbg.agg(
        F.count(F.lit(1)).alias("nb"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("c") == 2, 1).otherwise(0)).alias("n2"),
    )
    model = (
        cbg.withColumn("u", F.substring_index("gram", " ", 1))
        .withColumn("v", F.substring_index("gram", " ", -1))
        .join(u_tbl, "u")
        .join(v_tbl, "v")
        .crossJoin(broadcast(consts))
    )
    # guard: a corpus with no singleton/doubleton bigrams (possible on
    # repetitive synthetic text at larger SF) has n1+2n2 = 0 — the
    # estimated discount degenerates to 0 (pure MLE, no continuation
    # mass), the standard fallback, instead of a divide-by-zero
    _kn_den = F.col("n1") + 2 * F.col("n2")
    disc = F.when(
        _kn_den > 0, F.col("n1").cast("double") / _kn_den
    ).otherwise(F.lit(0.0))
    p = (
        F.greatest(F.col("c") - disc, F.lit(0.0)) / F.col("cu")
        + (disc * F.col("n1u") / F.col("cu"))
        * (F.col("nv").cast("double") / F.col("nb"))
    )
    return model.select(
        "gram", F.round(F.log(p) * _KN_MICRO).cast("long").alias("l_mu")
    )


def docs_kn_perplexity_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``docs_kn_perplexity``'s beyond-broadcast twin, same discipline
    as ``docs_bigram_perplexity_bucketed`` (llm_ops4): the trained KN
    model — a (gram, l_mu) table that is corpus-vocabulary-scale and
    grows with the corpus — persists as a gram-BUCKETED table, so the
    score join plans exactly ONE gram Exchange (the docs side; the
    model reads bucket-aligned). Oracle identical to the plain twin:
    the layout changes the plan, not one bit of the output.
    """
    import os
    import tempfile

    from distributed_file_system_with_stream_processing_spark.plans.llm_ops4 import (
        _bigram_tf,
    )
    from distributed_file_system_with_stream_processing_spark.sinks.parquet import (
        write_bucketed,
    )

    d = spread(load_table(spark, sf_dir, "documents"))
    bg = _bigram_tf(d)
    suffix = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    table = f"dfsp_kn_lm_{suffix}"
    path = os.path.join(tempfile.gettempdir(), f"dfsp_kn_lm_{suffix}")
    write_bucketed(kn_model(bg), table, path, "gram", 8)
    model = spark.table(table)
    scored = (
        bg.join(model, "gram")
        .select("doc_id", "tf", (F.col("tf") * F.col("l_mu")).alias("_tl"))
        .groupBy("doc_id")
        .agg(F.sum("tf").alias("n_bigrams"), F.sum("_tl").alias("_s"))
    )
    ppl = F.exp(-(F.col("_s").cast("double") / _KN_MICRO) / F.col("n_bigrams"))
    return scored.select(
        "doc_id",
        F.col("n_bigrams").cast("long").alias("n_bigrams"),
        F.round(ppl, 4).alias("kn_ppl"),
    )


def _kn_oracle() -> str:
    from distributed_file_system_with_stream_processing_spark.plans.llm_ops4 import (
        _BIGRAMS,
        _TOKS_L,
    )

    return rf"""
WITH toks AS (SELECT doc_id, {_TOKS_L} AS ws FROM documents),
ex AS (SELECT doc_id, unnest({_BIGRAMS}) AS gram FROM toks),
bg AS (SELECT doc_id, gram, count(*) AS tf FROM ex GROUP BY doc_id, gram),
cbg AS (SELECT gram, sum(tf) AS c FROM bg GROUP BY gram),
u_tbl AS (
    SELECT split_part(gram, ' ', 1) AS u, sum(c) AS cu, count(*) AS n1u
    FROM cbg GROUP BY 1
),
v_tbl AS (
    SELECT split_part(gram, ' ', -1) AS v, count(*) AS nv
    FROM cbg GROUP BY 1
),
consts AS (
    SELECT count(*) AS nb,
           sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS n1,
           sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS n2
    FROM cbg
),
model AS (
    SELECT g.gram,
           -- ok-round: irrational (ln family — Kneser-Ney discounted gain)
           CAST(round(ln(
               greatest(g.c - (CASE WHEN (k.n1 + 2 * k.n2) > 0 THEN CAST(k.n1 AS DOUBLE) / (k.n1 + 2 * k.n2) ELSE 0.0 END), 0.0)
                   / u.cu
               + ((CASE WHEN (k.n1 + 2 * k.n2) > 0 THEN CAST(k.n1 AS DOUBLE) / (k.n1 + 2 * k.n2) ELSE 0.0 END) * u.n1u / u.cu)
                 * (CAST(v.nv AS DOUBLE) / k.nb)
           ) * {_KN_MICRO}) AS BIGINT) AS l_mu
    FROM cbg g
    JOIN u_tbl u ON split_part(g.gram, ' ', 1) = u.u
    JOIN v_tbl v ON split_part(g.gram, ' ', -1) = v.v
    CROSS JOIN consts k
),
scored AS (
    SELECT b.doc_id, b.tf, b.tf * m.l_mu AS tl
    FROM bg b JOIN model m USING (gram)
),
agg AS (
    SELECT doc_id, sum(tf) AS n_bigrams, sum(tl) AS s
    FROM scored GROUP BY doc_id
)
SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams,
       -- ok-round: irrational (exp/ln family)
       round(exp(-(CAST(s AS DOUBLE) / {_KN_MICRO}) / n_bigrams), 4) AS kn_ppl
FROM agg
"""


DOCS_KN_PPL_SQL = _kn_oracle()


# ---------------------------------------------------------------------------
# decontaminate_bloom

_BLOOM_K = 3  # hash functions
_BLOOM_M = 1 << 16  # bit positions per hash row


def _bloom_positions(col):
    """array<struct<row,pos>> of the ``_BLOOM_K`` Bloom positions of a
    shingle — the portable minhash affine family on hash32(s), the
    same engine-portable construction the CMS uses (one partitioned
    position space per hash keeps the family independent without bit
    arithmetic)."""
    parts = []
    for k in range(_BLOOM_K):
        a, b = T.mh_params(100 + k)
        parts.append(
            F.struct(
                F.lit(k).alias("row"),
                (
                    (F.lit(a) * T.hash32(col) + F.lit(b))
                    % F.lit(T.MINHASH_PRIME)
                    % F.lit(_BLOOM_M)
                ).alias("pos"),
            )
        )
    return F.array(*parts)


def decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination via a BLOOM FILTER of the eval-set
    shingles — the probabilistic twin of ``decontaminate_ngram``'s
    exact broadcast semi-join, for when the eval set outgrows a
    broadcast hash set: the filter is at most K·M set-bit rows
    REGARDLESS of eval size, and one-sided — it can only OVER-flag
    (a false positive excises an extra doc, harmless), never let a
    contaminated doc through. Flagging rule: a train shingle counts
    as a hit iff ALL ``_BLOOM_K`` of its bit positions are set.

    Built from first principles on the portable affine hash family
    (Spark's internal bloom_filter_agg is not SQL-registered), which
    makes the sketch FULLY ORACLED — DuckDB constructs the
    bit-identical position set and the value hash matches exactly,
    a stronger check than any opaque-binary sketch could give.

    100 TB shape: eval shingles fold into the distinct (row, pos) set
    [metadata-scale agg — ≤ K·M rows at ANY eval size]; the set
    BROADCASTS onto the ×K-exploded train shingle stream (the CMS
    probe shape — the corpus never shuffles for the probe); the
    all-K AND is a count-per-(doc, shingle) == K filter, then one
    per-doc rollup. Superset-of-exact + bounded-overflag properties
    pinned in tests/test_curation_ops.py.
    """
    from distributed_file_system_with_stream_processing_spark.operators import dedup as D

    d = load_table(spark, sf_dir, "documents")
    ev = d.filter(F.col("doc_id") % 97 == 0)
    tr = d.filter(F.col("doc_id") % 97 != 0)
    bloom = (
        D._exploded_shingles(ev, "doc_id", "text", 3)
        .select(F.explode(_bloom_positions(F.col("s"))).alias("rp"))
        .select(F.col("rp.row").alias("row"), F.col("rp.pos").alias("pos"))
        .distinct()
    )
    tr_sh = (
        D._exploded_shingles(tr, "doc_id", "text", 3)
        .groupBy("doc_id", "s")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    probed = (
        tr_sh.select("doc_id", "s", "tf", F.explode(_bloom_positions(F.col("s"))).alias("rp"))
        .select("doc_id", "s", "tf", F.col("rp.row").alias("row"), F.col("rp.pos").alias("pos"))
        .join(broadcast(bloom), ["row", "pos"])
        .groupBy("doc_id", "s", "tf")
        .agg(F.count(F.lit(1)).alias("n_set"))
        .filter(F.col("n_set") == _BLOOM_K)
    )
    return probed.groupBy("doc_id").agg(F.sum("tf").alias("n_hit_ngrams"))


def bloom_bits(spark: SparkSession, sf_dir: str) -> dict[int, list[int]]:
    """Collect the eval set's Bloom set-bit positions per hash row —
    the metadata-scale model artifact (≤ K·M ints at any eval size)
    the streaming gate bakes in as literals
    (streaming/rainstorm.bloom_gate_stream)."""
    from distributed_file_system_with_stream_processing_spark.operators import dedup as D

    ev = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 97 == 0)
    rows = (
        D._exploded_shingles(ev, "doc_id", "text", 3)
        .select(F.explode(_bloom_positions(F.col("s"))).alias("rp"))
        .select(F.col("rp.row").alias("row"), F.col("rp.pos").alias("pos"))
        .distinct()
        .collect()
    )
    out: dict[int, list[int]] = {}
    for r in rows:
        out.setdefault(r["row"], []).append(r["pos"])
    return {k: sorted(v) for k, v in out.items()}


def _bloom_oracle() -> str:
    from distributed_file_system_with_stream_processing_spark.plans.llm_ops import (
        _duck_shingles,
    )

    h = "('0x' || substr(md5(s), 1, 8))::BIGINT"
    pos_union = " UNION ALL ".join(
        f"SELECT doc_id, s, tf, {k} AS row, "
        f"(({T.mh_params(100 + k)[0]} * {h} + {T.mh_params(100 + k)[1]})"
        f" % {T.MINHASH_PRIME}) % {_BLOOM_M} AS pos FROM tr_sh"
        for k in range(_BLOOM_K)
    )
    ev_union = " UNION ALL ".join(
        f"SELECT {k} AS row, "
        f"(({T.mh_params(100 + k)[0]} * {h} + {T.mh_params(100 + k)[1]})"
        f" % {T.MINHASH_PRIME}) % {_BLOOM_M} AS pos FROM ev_sh"
        for k in range(_BLOOM_K)
    )
    return rf"""
WITH sh AS ({_duck_shingles(3)}),
ex AS (SELECT doc_id, unnest(sh) AS s FROM sh),
ev_sh AS (SELECT DISTINCT s FROM ex WHERE doc_id % 97 = 0),
bloom AS (SELECT DISTINCT row, pos FROM ({ev_union})),
tr_sh AS (SELECT doc_id, s, count(*) AS tf FROM ex
          WHERE doc_id % 97 <> 0 GROUP BY doc_id, s),
probes AS ({pos_union}),
hits AS (
    SELECT p.doc_id, p.s, p.tf, count(*) AS n_set
    FROM probes p JOIN bloom b USING (row, pos)
    GROUP BY p.doc_id, p.s, p.tf
    HAVING count(*) = {_BLOOM_K}
)
SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_hit_ngrams FROM hits GROUP BY doc_id
"""


DECONTAMINATE_BLOOM_SQL = _bloom_oracle()


# ---------------------------------------------------------------------------
# neardup_pagerank

_PR_DAMP = 0.85
_PR_ITERS = 2
_PR_NANO = 1_000_000_000


def neardup_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the MinHash-LSH near-duplicate graph — node
    centrality identifies the HUB documents of a duplication cluster
    (the canonical/most-copied text a curator keeps or investigates).
    ``_PR_ITERS`` power-iteration rounds at damping ``_PR_DAMP`` over
    the undirected pair graph, restricted to pair members.

    Unlike the driver-synchronized trainers (kmeans, logreg, BPE),
    the whole iteration unrolls into ONE declarative plan — the
    rank table is corpus-adjacent (one row per dup-graph node), so it
    stays distributed and each round is an edges⋈ranks join + rollup,
    the canonical edge-partitioned PageRank shape (Catalyst sees all
    rounds and pipelines the shuffles).

    Exactness: each edge contribution p(src)/deg(src) quantizes ONCE
    to nano-units, so per-node inflow is an order-free integer sum;
    the update (1−d)/N + d·(S/1e9) is a fixed op sequence on exact
    inputs; both engines agree bitwise (d and 1−d parse to identical
    doubles from the same decimal literals).

    100 TB shape: the pair graph is candidate-scale (LSH-bounded, not
    quadratic); per round ONE shuffle joins ranks onto edges by src
    [graph-partitioned] and one rollup by dst; degrees computed once.
    No collect anywhere — ranks never leave the executors.
    """
    from distributed_file_system_with_stream_processing_spark.operators import dedup as D

    # r9 optimization: the symmetrized edge list is loop-invariant and
    # referenced by deg, p0 and every power-iteration round; branch-
    # specific pruning kept the LSH banding's post-shuffle stages
    # re-executing per consumer — truncate lineage at the pair-scale
    # table (reliable checkpoint at 100 TB via the plan_ckpt conf).
    # r10: checkpoint the PAIR table, before the symmetrizing union —
    # the union references pairs twice, so checkpointing after it
    # still ran the corpus-scale LSH backbone twice inside the
    # materializing job.
    pairs = (
        D.minhash_lsh_pairs(load_table(spark, sf_dir, "documents"))
        .select("doc_id_a", "doc_id_b")
        .distinct()
        .transform(_plan_ckpt)
    )
    edges = pairs.select(
        F.col("doc_id_a").alias("src"), F.col("doc_id_b").alias("dst")
    ).union(
        pairs.select(F.col("doc_id_b").alias("src"), F.col("doc_id_a").alias("dst"))
    ).transform(_plan_ckpt)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).select(
        F.col("src").alias("node"), "deg"
    )
    nn = deg.agg(F.count(F.lit(1)).alias("n"))
    p = deg.crossJoin(broadcast(nn)).select(
        "node", "deg", "n", (F.lit(1.0) / F.col("n")).alias("p")
    )
    for _ in range(_PR_ITERS):
        contrib = edges.join(p, edges.src == p.node).select(
            F.col("dst"),
            # ok-round: algorithmic round-to-nearest (quantizer)
            F.round(F.col("p") / F.col("deg") * _PR_NANO).cast("long").alias("c"),
        )
        inflow = contrib.groupBy("dst").agg(F.sum("c").alias("s"))
        p = (
            p.join(inflow, p.node == inflow.dst, "left")
            .select(
                "node",
                "deg",
                "n",
                (
                    F.lit(1.0 - _PR_DAMP) / F.col("n")
                    + F.lit(_PR_DAMP)
                    * (F.coalesce(F.col("s"), F.lit(0)).cast("double") / _PR_NANO)
                ).alias("p"),
            )
        )
    return p.select(
        F.col("node").alias("doc_id"), F.round(F.col("p") * 1000, 6).alias("pagerank_milli")
    )


def _pagerank_oracle() -> str:
    from distributed_file_system_with_stream_processing_spark.plans.llm_ops import (
        _MINHASH_PAIRS_BODY,
    )

    it = []
    prev = "p0"
    for k in range(1, _PR_ITERS + 1):
        it.append(f""",
c{k} AS (
    -- ok-round: algorithmic round-to-nearest (quantizer)
    SELECT e.dst, CAST(round(p.p / p.deg * {_PR_NANO}) AS BIGINT) AS c
    FROM edges e JOIN {prev} p ON e.src = p.node
),
s{k} AS (SELECT dst, sum(c) AS s FROM c{k} GROUP BY dst),
p{k} AS (
    SELECT p.node, p.deg, p.n,
           {1.0 - _PR_DAMP!r} / p.n
           + {_PR_DAMP!r} * (CAST(coalesce(s.s, 0) AS DOUBLE) / {_PR_NANO}) AS p
    FROM {prev} p LEFT JOIN s{k} s ON p.node = s.dst
)""")
        prev = f"p{k}"
    return (
        _MINHASH_PAIRS_BODY
        + f""",
pairs AS (SELECT DISTINCT least(da, db) AS da, greatest(da, db) AS db
          FROM cand WHERE da <> db),
edges AS (SELECT da AS src, db AS dst FROM pairs
          UNION ALL SELECT db AS src, da AS dst FROM pairs),
deg AS (SELECT src AS node, count(*) AS deg FROM edges GROUP BY src),
nn AS (SELECT count(*) AS n FROM deg),
p0 AS (SELECT node, deg, n, 1.0 / n AS p FROM deg CROSS JOIN nn)"""
        + "".join(it)
        + f"""
SELECT node AS doc_id, round(p * 1000, 6) AS pagerank_milli FROM {prev}
"""
    )


NEARDUP_PAGERANK_SQL = _pagerank_oracle()


# ---------------------------------------------------------------------------
# dedup_agreement_matrix


def dedup_agreement_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-METHOD dedup agreement: how much do the four duplicate
    detectors (exact-hash, MinHash-LSH, SimHash, exact-substring)
    agree on WHICH documents are implicated? The QA dashboard a
    curator reads before choosing the production recipe — a method
    pair with low overlap means they catch different duplication
    modes (verbatim vs near-dup vs quoted spans), high overlap means
    one is redundant.

    flagged(method) = docs participating in ≥1 dup relation under
    that method (group members for exact; pair endpoints for the
    rest). Output: (method_a, method_b, n_both) for every ordered
    pair incl. the diagonal (= n_flagged).

    100 TB shape: each method's pair/group backbone is its own
    documented bounded plan (LSH-banded, never quadratic), computed
    ONCE per session and persisted (plans/_backbones.py — r6 verdict
    #3: through r6 this query re-derived all four detectors inline,
    34.7 s at sf1); the matrix only rolls up the materialized
    dup-scale tables. The flagged-doc union is dup-scale, the
    self-join key is doc_id over that reduced table, and the matrix
    rollup key has 4² cardinality.

    Rows-only for the driver (a four-way chained oracle would be a
    renaming exercise, not a semantics check); the HARD check is
    tests/test_curation_ops.py: the matrix equals the set algebra
    computed independently from each registered method's own
    (driver-hash-checked) output.
    """
    from distributed_file_system_with_stream_processing_spark.plans import _backbones as B

    exact = B.exact_flagged(spark, sf_dir)

    def endpoints(pairs: DataFrame, a: str, b: str) -> DataFrame:
        return pairs.select(F.col(a).alias("doc_id")).union(
            pairs.select(F.col(b).alias("doc_id"))
        )

    mh = endpoints(B.minhash_pairs(spark, sf_dir), "doc_id_a", "doc_id_b")
    sh = endpoints(B.simhash_pairs(spark, sf_dir), "doc_id_a", "doc_id_b")
    ss = endpoints(B.substring_pairs(spark, sf_dir), "doc_id_a", "doc_id_b")

    tagged = None
    for method, df in (("exact", exact), ("minhash", mh), ("simhash", sh), ("substring", ss)):
        t = df.distinct().select(F.lit(method).alias("method"), "doc_id")
        tagged = t if tagged is None else tagged.unionByName(t)
    a = tagged.select(F.col("method").alias("method_a"), "doc_id")
    b = tagged.select(F.col("method").alias("method_b"), "doc_id")
    return (
        a.join(b, "doc_id")
        .groupBy("method_a", "method_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )


# ---------------------------------------------------------------------------
# bpe_compression_curve

_BC_MERGES = 8


def bpe_compression_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-budget curve: corpus-weighted average tokens-per-word
    and total token count after EVERY merge depth 0..``_BC_MERGES`` —
    the diagnostic that tells you where additional BPE merges stop
    paying (the knee of the compression curve).

    One fused evaluation pass: train once (operators/bpe.bpe_train),
    then ONE scan of the word table computes a token-count column per
    prefix depth (the k-rule fold compositions live side by side in a
    single projection) and ONE aggregate folds all depths' weighted
    sums — instead of _BC_MERGES+1 separate apply jobs. Monotonicity
    (each merge can only shrink token counts) is pinned in
    tests/test_bpe.py along with exactness vs the pure-Python
    reference at every depth. Rows-only for the driver (iterative
    training has no SQL oracle).
    """
    from distributed_file_system_with_stream_processing_spark.operators import bpe as B

    docs = load_table(spark, sf_dir, "documents")
    rules = B.bpe_train(docs, n_merges=_BC_MERGES)
    wt = B.word_table(docs).withColumn("syms", B.chars_of(F.col("word")))
    cols = []
    col = F.col("syms")
    cols.append(F.size(col).alias("k0"))
    for r in sorted(rules, key=lambda r: r["rank"]):
        col = B.merge_pair(col, r["left"], r["right"])
        cols.append(F.size(col).alias(f"k{r['rank']}"))
    staged = wt.select("n", *cols)
    agg = staged.agg(
        F.sum("n").alias("n_words"),
        *[F.sum(F.col(f"k{k}") * F.col("n")).alias(f"t{k}") for k in range(len(cols))],
    ).collect()[0]
    n_words = agg["n_words"]
    rows = [
        (
            k,
            int(agg[f"t{k}"]),
            round(agg[f"t{k}"] / n_words, 6),
        )
        for k in range(len(cols))
    ]
    return spark.createDataFrame(
        rows, "n_merges long, total_tokens long, tokens_per_word double"
    )


# ---------------------------------------------------------------------------
# bpe_fertility_by_lang

_FL_MERGES = 4


def bpe_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-LANGUAGE tokenizer fertility: weighted tokens-per-word under
    (a) each language's OWN BPE rules (the fused per-lang trainer) vs
    (b) one GLOBAL vocabulary at the same merge budget — the dashboard
    that quantifies what per-language vocabularies buy each language
    (multilingual models pay fertility tax exactly where this gap is
    widest).

    One evaluation scan: the (lang, word, n) table gets TWO token-count
    columns side by side — the own-rules count via a lang-dispatched
    fold chain, the global count via the shared chain — and one
    grouped aggregate folds both weighted sums per language. Rows-only
    (iterative training); exactness at every (lang, depth) is pinned
    against the pure-Python reference in tests/test_bpe.py.
    """
    from distributed_file_system_with_stream_processing_spark.operators import bpe as B

    docs = load_table(spark, sf_dir, "documents")
    per = B.bpe_train_per_lang(docs, n_merges=_FL_MERGES)
    glob = B.bpe_train(docs, n_merges=_FL_MERGES)
    wt = B.word_table_by_lang(docs).withColumn("syms", B.chars_of(F.col("word")))

    def chain(rules):
        col = F.col("syms")
        for r in sorted(rules, key=lambda r: r["rank"]):
            col = B.merge_pair(col, r["left"], r["right"])
        return col

    # lang-dispatched own-rules token count; a lang with no trained
    # rules (unseen) falls back to its raw character count
    own = F.size(F.col("syms"))
    for lang in sorted(per):
        own = F.when(F.col("lang") == lang, F.size(chain(per[lang]))).otherwise(own)
    agg = (
        wt.select("lang", "n", own.alias("k_own"), F.size(chain(glob)).alias("k_glob"))
        .groupBy("lang")
        .agg(
            F.sum("n").alias("n_words"),
            F.sum(F.col("k_own") * F.col("n")).alias("t_own"),
            F.sum(F.col("k_glob") * F.col("n")).alias("t_glob"),
        )
    )
    # r9 conversion (wave 3): truncating integer division at 6 dp
    # (rows-only query — the pytest twin mirrors the same floor)
    return agg.select(
        "lang",
        F.col("n_words").cast("long").alias("n_words"),
        (F.expr("(t_own * 1000000) div n_words").cast("double") / 1e6)
        .alias("tpw_own_vocab"),
        (F.expr("(t_glob * 1000000) div n_words").cast("double") / 1e6)
        .alias("tpw_global_vocab"),
    )


# ---------------------------------------------------------------------------
# part_pair_lift

_PL_MIN_SUPPORT = 2
_PL_TOPK = 20


def part_pair_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association mining over orders: for part pairs
    co-occurring in ≥ ``_PL_MIN_SUPPORT`` orders, lift =
    P(a,b) / (P(a)·P(b)) = n_ab·N / (n_a·n_b) — the co-purchase
    affinity backbone (recommender candidates / assortment analysis),
    top ``_PL_TOPK`` by lift.

    100 TB shape: basket pairs come from a SELF-JOIN ON THE ORDER KEY
    with a < b — fan-out is C(order_size, 2), bounded by the basket
    (max 17 items here), never corpus-quadratic; part supports are one
    vocab-scale agg; the pair-support agg shuffles on the (a, b) key;
    the total-order count rides a 1-row broadcast; final top-k is
    TakeOrderedAndProject. Lift is exact: three BIGINT counts,
    products exact in double far below 2^53, one correctly-rounded
    division — identical in both engines, no tolerance.
    """
    li = (
        spread(load_table(spark, sf_dir, "lineitem"))
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    # r9 optimization: pair generation from per-order SORTED part
    # arrays instead of the a⋈b self-join on the order key. The join
    # shape computed the (order, part) distinct table twice (probe
    # side + broadcast build — a corpus-scale broadcast at 100 TB)
    # and shuffled it twice; one groupBy(l_orderkey) produces each
    # basket once, the i<j combination expansion is the identical
    # C(basket, 2) fan-out (arrays are distinct per order, sorted
    # ascending, so x pairs with every LATER element ⟺ pa < pb), and
    # n_orders falls out of the same exchange as a 1-row rollup.
    # Oracle (self-join) unchanged — proven equal by driver compare.
    baskets = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_list("l_partkey")).alias("ps")
    )
    n_orders = baskets.agg(F.count(F.lit(1)).alias("n_orders"))
    supp = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_part"))
    combos = F.flatten(
        F.transform(
            F.col("ps"),
            lambda x, i: F.transform(
                F.slice(F.col("ps"), i + F.lit(2), F.size(F.col("ps"))),
                lambda y: F.struct(x.alias("pa"), y.alias("pb")),
            ),
        )
    )
    pairs = (
        baskets.select(F.explode(combos).alias("c"))
        .select(F.col("c.pa").alias("pa"), F.col("c.pb").alias("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= _PL_MIN_SUPPORT)
    )
    sa = supp.select(F.col("l_partkey").alias("pa"), F.col("n_part").alias("n_a"))
    sb = supp.select(F.col("l_partkey").alias("pb"), F.col("n_part").alias("n_b"))
    scored = (
        pairs.join(broadcast(sa), "pa")
        .join(broadcast(sb), "pb")
        .crossJoin(broadcast(n_orders))
        .select(
            F.col("pa").alias("part_a"),
            F.col("pb").alias("part_b"),
            "n_ab",
            # r9 conversion (wave 3): lift = n_ab·N/(n_a·n_b) on
            # exact counts — truncating integer division at 6 dp in
            # decimal(38,0) ↔ HUGEINT
            (
                F.expr(
                    "(cast(n_ab as decimal(38,0)) * n_orders * 1000000)"
                    " div (cast(n_a as decimal(38,0)) * n_b)"
                ).cast("double")
                / 1e6
            ).alias("lift"),
        )
    )
    return scored.orderBy(F.desc("lift"), F.asc("part_a"), F.asc("part_b")).limit(
        _PL_TOPK
    )


PART_PAIR_LIFT_SQL = f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n_orders AS (SELECT count(DISTINCT l_orderkey) AS n FROM li),
supp AS (SELECT l_partkey, count(*) AS n_part FROM li GROUP BY 1),
pairs AS (
    SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS n_ab
    FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
                      AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    HAVING count(*) >= {_PL_MIN_SUPPORT}
)
SELECT p.pa AS part_a, p.pb AS part_b, CAST(p.n_ab AS BIGINT) AS n_ab,
       CAST((CAST(p.n_ab AS HUGEINT) * o.n * 1000000)
            // (CAST(sa.n_part AS HUGEINT) * sb.n_part) AS DOUBLE)
           / 1000000.0 AS lift
FROM pairs p
JOIN supp sa ON p.pa = sa.l_partkey
JOIN supp sb ON p.pb = sb.l_partkey
CROSS JOIN n_orders o
ORDER BY lift DESC, part_a, part_b LIMIT {_PL_TOPK}
"""


# ---------------------------------------------------------------------------
# dedup_cluster_sizes


def dedup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-SIZE histogram of the near-dup connected components:
    how many dup clusters of 2, of 3, … exist — the dedup-savings
    estimator (docs removable = Σ (size−1)·count). Rolls up the
    session-persisted dedup_clusters backbone (plans/_backbones.py,
    r6 verdict #3 — the LSH banding + CC run once per session, this
    query reads the materialized table); oracle wraps the same
    recursive-CTE closure. The histogram key is cluster-size (tiny);
    everything upstream is the documented LSH + large-star/small-star
    census."""
    from distributed_file_system_with_stream_processing_spark.plans import _backbones as B

    cc = B.minhash_cc(spark, sf_dir)
    sizes = cc.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("sz"))
    return (
        sizes.filter(F.col("sz") > 1)
        .groupBy("sz")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .select(
            F.col("sz").cast("long").alias("cluster_size"),
            "n_clusters",
            (F.col("sz") * F.col("n_clusters") - F.col("n_clusters"))
            .cast("long")
            .alias("removable_docs"),
        )
    )


def _cluster_sizes_oracle() -> str:
    from distributed_file_system_with_stream_processing_spark.plans.llm_ops import (
        DEDUP_CLUSTERS_SQL,
    )

    closing = "SELECT node AS doc_id, min(r) AS cluster_id FROM reach GROUP BY node"
    assert closing in DEDUP_CLUSTERS_SQL
    return DEDUP_CLUSTERS_SQL.replace(
        closing,
        ", cc AS (" + closing + """),
sizes AS (SELECT cluster_id, count(*) AS sz FROM cc GROUP BY cluster_id)
SELECT CAST(sz AS BIGINT) AS cluster_size,
       count(*) AS n_clusters,
       CAST(sz * count(*) - count(*) AS BIGINT) AS removable_docs
FROM sizes WHERE sz > 1 GROUP BY sz""",
        1,
    )


DEDUP_CLUSTER_SIZES_SQL = _cluster_sizes_oracle()


# ---------------------------------------------------------------------------
# events_interarrival_stats


def events_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type inter-arrival-time statistics: for each event type,
    the gap (seconds) between consecutive events of that type for the
    SAME user — median / p95 / mean — the traffic-model and
    anomaly-baseline table (alert when arrivals drift off their
    historical cadence).

    ONE fact shuffle (the per-(user, type) lag window shares the
    sessionize backbone's key), gaps as EXACT integer seconds
    (floor-per-side epoch truncation — the events_asof_forward
    convention), then a |types|-cardinality sort-based exact
    percentile agg (at 100 TB: percentile_approx, the
    order_value_percentiles stance). Mean is exact-sum/count with one
    rounding.
    """
    ev = spread(load_table(spark, sf_dir, "events"))
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gaps = (
        ev.select(
            "event_type",
            (
                F.unix_timestamp("ts")
                - F.unix_timestamp(F.lag("ts").over(w))
            ).alias("gap_s"),
        )
        .filter(F.col("gap_s").isNotNull())
    )
    return gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.round(F.expr("percentile(gap_s, 0.5)"), 2).alias("p50_s"),
        F.round(F.expr("percentile(gap_s, 0.95)"), 2).alias("p95_s"),
        # r9 conversion (wave 3): truncating integer division at 2 dp
        (
            F.expr("(sum(gap_s) * 100) div count(1)").cast("double") / 100.0
        ).alias("mean_s"),
    )


EVENTS_INTERARRIVAL_SQL = """
WITH gaps AS (
    SELECT event_type,
           CAST(floor(epoch(ts)) AS BIGINT)
           - CAST(floor(epoch(lag(ts) OVER (PARTITION BY user_id, event_type
                                            ORDER BY ts, event_id))) AS BIGINT)
           AS gap_s
    FROM events
)
SELECT event_type, count(*) AS n_gaps,
       round(quantile_cont(gap_s, 0.5), 2) AS p50_s,
       round(quantile_cont(gap_s, 0.95), 2) AS p95_s,
       CAST((sum(gap_s) * 100) // count(*) AS DOUBLE) / 100.0 AS mean_s
FROM gaps WHERE gap_s IS NOT NULL
GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# discount_quantity_slope

_DQ_CENTI = 100


def discount_quantity_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED least-squares regression: per return flag, the slope of
    quantity on discount — does discounting move volume, and does the
    answer differ by flag? (The pricing-elasticity screen; the global
    single-series variant is corpus_zipf_fit — this is the grouped
    shape a segment analysis needs.)

    Same exactness ledger as the Zipf fit: both variables quantize
    ONCE to centi-units (discount and quantity carry ≤2 decimals, so
    this is lossless), all five moments per group are exact
    integer/DECIMAL(38,0) sums with map-side partials, and the
    closed-form slope divides exact-input doubles in a fixed
    sequence. Equal scaling of x and y cancels in the slope, so the
    output is in natural units. ONE shuffle on the 3-value group key.
    """
    li = spread(load_table(spark, sf_dir, "lineitem"))
    pts = li.select(
        "l_returnflag",
        F.round(F.col("l_discount") * _DQ_CENTI).cast("long").alias("x"),
        F.round(F.col("l_quantity") * _DQ_CENTI).cast("long").alias("y"),
    )
    m = pts.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("y")).alias("sxy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias("sxx"),
    )
    # r9 conversion (wave 3): the corpus_zipf_fit discipline — slope
    # as truncating integer division of exact decimal moments at 6 dp,
    # intercept from the TRUNCATED slope k:
    # (sy/c − (k/10⁶)(sx/c))/n = (sy·10⁶ − k·sx)/(10⁶·c·n)
    dec = lambda col: F.col(col).cast("decimal(38,0)")  # noqa: E731
    staged = (
        m.withColumn("_num", dec("n") * F.col("sxy") - dec("sx") * dec("sy"))
        .withColumn("_den", dec("n") * F.col("sxx") - dec("sx") * dec("sx"))
        .withColumn("_k", F.expr("(_num * 1000000) div _den"))
    )
    return staged.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n_rows"),
        (F.col("_k").cast("double") / 1e6).alias("qty_per_discount_unit"),
        (
            F.expr(
                "(cast(sy as decimal(38,0)) * 1000000"
                " - cast(_k as decimal(38,0)) * sx)"
                f" div (cast({_DQ_CENTI} as decimal(38,0)) * n)"
            ).cast("double")
            / 1e6
        ).alias("intercept_qty"),
    )


DISCOUNT_SLOPE_SQL = f"""
WITH pts AS (
    SELECT l_returnflag,
           CAST(round(l_discount * {_DQ_CENTI}) AS BIGINT) AS x,
           CAST(round(l_quantity * {_DQ_CENTI}) AS BIGINT) AS y
    FROM lineitem
),
m AS (
    SELECT l_returnflag, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
           sum(CAST(x AS DECIMAL(38,0)) * y) AS sxy,
           sum(CAST(x AS DECIMAL(38,0)) * x) AS sxx
    FROM pts GROUP BY l_returnflag
),
k AS (
    SELECT l_returnflag, n, sx, sy,
           ((CAST(n AS HUGEINT) * CAST(sxy AS HUGEINT)
             - CAST(sx AS HUGEINT) * CAST(sy AS HUGEINT)) * 1000000)
           // (CAST(n AS HUGEINT) * CAST(sxx AS HUGEINT)
               - CAST(sx AS HUGEINT) * CAST(sx AS HUGEINT)) AS k
    FROM m
)
SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
       CAST(k AS DOUBLE) / 1000000.0 AS qty_per_discount_unit,
       CAST((CAST(sy AS HUGEINT) * 1000000 - k * CAST(sx AS HUGEINT))
            // (CAST({_DQ_CENTI} AS HUGEINT) * n) AS DOUBLE) / 1000000.0
           AS intercept_qty
FROM k
"""


# ---------------------------------------------------------------------------
# events_markov_stationary

_MS_ITERS = 3
_MS_NANO = 1_000_000_000


def events_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary behavior mix of the event-transition chain:
    ``_MS_ITERS`` power-iteration steps π ← πᵀP from uniform over the
    transition matrix — where user behavior settles if the observed
    dynamics persist (the long-run traffic mix the transition matrix
    only describes one step of).

    Like neardup_pagerank, the iteration unrolls into ONE declarative
    plan over the |types|²-row transition table (the only
    corpus-scale work is the shared one-shuffle lead() backbone);
    each step is a tiny join + rollup. Exactness: P(v|u) is a
    correctly-rounded ratio of exact counts; each contribution
    π(u)·P(v|u) quantizes ONCE to nano-units so the per-state inflow
    is an order-free integer sum; both engines agree bitwise.
    """
    ev = spread(load_table(spark, sf_dir, "events"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.col("event_type").alias("u"),
            F.lead("event_type").over(w).alias("v"),
        )
        .filter(F.col("v").isNotNull())
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wtot = Window.partitionBy("u")
    # r9 optimization: materialize the |types|²-row transition table
    # ONCE (localCheckpoint = executor-local, recomputed every
    # invocation). The unrolled iterations reference P four times and
    # states twice; branch-specific column pruning makes the copies
    # canonically different, so AQE stage reuse only dedupes the
    # exchanges — the corpus-scale sort+lead() WINDOW re-executed in
    # every consumer stage (4× in the r8 executed plan). Truncating
    # lineage at the metadata-scale table runs the corpus pass once.
    P = pairs.select(
        "u", "v", (F.col("n").cast("double") / F.sum("n").over(wtot)).alias("p")
    ).transform(_plan_ckpt)
    states = P.select(F.col("u").alias("s")).union(P.select("v")).distinct()
    nn = states.agg(F.count(F.lit(1)).alias("t"))
    pi = states.crossJoin(broadcast(nn)).select(
        "s", (F.lit(1.0) / F.col("t")).alias("pi")
    )
    for _ in range(_MS_ITERS):
        contrib = P.join(pi, P.u == pi.s).select(
            F.col("v"),
            F.round(F.col("pi") * F.col("p") * _MS_NANO).cast("long").alias("c"),
        )
        inflow = contrib.groupBy("v").agg(F.sum("c").alias("m"))
        pi = (
            states.join(inflow, states.s == inflow.v, "left")
            .select(
                "s",
                (F.coalesce(F.col("m"), F.lit(0)).cast("double") / _MS_NANO).alias(
                    "pi"
                ),
            )
        )
    return pi.select(
        F.col("s").alias("event_type"),
        F.round(F.col("pi"), 6).alias("stationary_p"),
    )


def _stationary_oracle() -> str:
    it = []
    prev = "pi0"
    for k in range(1, _MS_ITERS + 1):
        it.append(f""",
c{k} AS (
    SELECT P.v, CAST(round(pi.pi * P.p * {_MS_NANO}) AS BIGINT) AS c
    FROM P JOIN {prev} pi ON P.u = pi.s
),
m{k} AS (SELECT v, sum(c) AS m FROM c{k} GROUP BY v),
pi{k} AS (
    SELECT s.s, CAST(coalesce(m.m, 0) AS DOUBLE) / {_MS_NANO} AS pi
    FROM states s LEFT JOIN m{k} m ON s.s = m.v
)""")
        prev = f"pi{k}"
    return (
        f"""
WITH seq AS (
    SELECT event_type AS u,
           lead(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS v
    FROM events
),
pairs AS (
    SELECT u, v, count(*) AS n FROM seq WHERE v IS NOT NULL GROUP BY u, v
),
P AS (
    SELECT u, v, CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY u) AS p
    FROM pairs
),
states AS (SELECT u AS s FROM P UNION SELECT v FROM P),
nn AS (SELECT count(*) AS t FROM states),
pi0 AS (SELECT s, 1.0 / t AS pi FROM states CROSS JOIN nn)"""
        + "".join(it)
        + f"""
SELECT s AS event_type, round(pi, 6) AS stationary_p FROM {prev}
"""
    )


EVENTS_STATIONARY_SQL = _stationary_oracle()


# ---------------------------------------------------------------------------
# session_transition_matrix

_ST_GAP_S = 30 * 60


def session_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SESSIONIZED Markov transitions with an absorbing end state:
    P(next | prev) computed within 30-min-gap sessions, where a
    session's last event transitions to '(end)' — unlike the global
    chain (events_transition_matrix), overnight gaps don't fabricate
    transitions, and the end-state column gives per-type exit rates
    (which event types END sessions — the funnel-leak diagnostic).

    Shares the sessionize backbone exactly (lag + running-sum session
    ids, ONE shuffle on user_id); the within-session lead() rides the
    same sorted partition, so no extra shuffle for the chaining; the
    rollup key is (|types|+1)² with map-side partials. Probabilities
    are exact-integer ratios.
    """
    ev = spread(load_table(spark, sf_dir, "events"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    sess = ev.withColumn(
        "is_new", F.when(gap.isNull() | (gap > _ST_GAP_S), 1).otherwise(0)
    ).withColumn(
        "session_id",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    ws = Window.partitionBy("user_id", "session_id").orderBy("ts", "event_id")
    pairs = sess.select(
        F.col("event_type").alias("prev_type"),
        F.coalesce(F.lead("event_type").over(ws), F.lit("(end)")).alias("next_type"),
    )
    cnt = pairs.groupBy("prev_type", "next_type").agg(F.count(F.lit(1)).alias("n"))
    wtot = Window.partitionBy("prev_type")
    # r9 conversion (wave 3): truncating integer division at 6 dp
    return cnt.withColumn("_t", F.sum("n").over(wtot)).select(
        "prev_type",
        "next_type",
        "n",
        (F.expr("(n * 1000000) div _t").cast("double") / 1e6).alias("p"),
    )


SESSION_TRANSITION_SQL = f"""
WITH flagged AS (
    SELECT user_id, ts, event_id, event_type,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR CAST(floor(epoch(ts)) AS BIGINT)
                     - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > {_ST_GAP_S}
                THEN 1 ELSE 0 END AS is_new
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
    SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
    FROM flagged
),
pairs AS (
    SELECT event_type AS prev_type,
           coalesce(lead(event_type) OVER (PARTITION BY user_id, session_id
                                           ORDER BY ts, event_id),
                    '(end)') AS next_type
    FROM sess
),
cnt AS (
    SELECT prev_type, next_type, count(*) AS n FROM pairs
    GROUP BY prev_type, next_type
)
SELECT prev_type, next_type, CAST(n AS BIGINT) AS n,
       CAST((n * 1000000) // sum(n) OVER (PARTITION BY prev_type) AS DOUBLE)
           / 1000000.0 AS p
FROM cnt
"""


# ---------------------------------------------------------------------------
# zipf_by_source


def zipf_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-SOURCE Zipf slopes — the grouped twin of corpus_zipf_fit:
    a source whose slope sits far off the corpus' is distributionally
    anomalous (template/boilerplate-heavy or spam), the same signal
    docs_kl_by_source reads from a different angle. Rank windows
    partition BY SOURCE (so the sort is per-source vocab-scale, not a
    single global partition), and the five regression moments fold
    per source with map-side partials — exact integer/DECIMAL sums,
    bit-stable closed-form slope (the corpus_zipf_fit ledger).
    """
    d = spread(load_table(spark, sf_dir, "documents"))
    counts = (
        d.select("source", F.explode_outer(T.words(F.col("text"))).alias("w"))
        .filter(F.col("w").isNotNull())
        .select("source", F.lower(F.col("w")).alias("term"))
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    ranked = counts.withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("source").orderBy(F.desc("cnt"), F.asc("term"))
        ),
    )
    pts = ranked.select(
        "source",
        F.round(F.log(F.col("rank").cast("double")) * _ZF_MICRO)
        .cast("long")
        .alias("x"),
        F.round(F.log(F.col("cnt").cast("double")) * _ZF_MICRO)
        .cast("long")
        .alias("y"),
    )
    m = pts.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("y")).alias("sxy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias("sxx"),
    )
    # r9 conversion (wave 3): the corpus_zipf_fit slope discipline —
    # truncating integer division of exact decimal moments at 6 dp
    dec = lambda col: F.col(col).cast("decimal(38,0)")  # noqa: E731
    staged = m.withColumn(
        "_num", dec("n") * F.col("sxy") - dec("sx") * dec("sy")
    ).withColumn("_den", dec("n") * F.col("sxx") - dec("sx") * dec("sx"))
    return staged.select(
        "source",
        F.col("n").cast("long").alias("n_terms"),
        (
            F.expr("(_num * 1000000) div _den").cast("double") / 1e6
        ).alias("zipf_slope"),
    )


ZIPF_BY_SOURCE_SQL = rf"""
WITH counts AS (
    SELECT source, term, count(*) AS cnt FROM (
        SELECT source, lower(unnest({_WS})) AS term FROM documents)
    GROUP BY source, term
),
ranked AS (
    SELECT source, cnt,
           row_number() OVER (PARTITION BY source
                              ORDER BY cnt DESC, term) AS rank
    FROM counts
),
pts AS (
    SELECT source,
           CAST(round(ln(CAST(rank AS DOUBLE)) * {_ZF_MICRO}) AS BIGINT) AS x,
           CAST(round(ln(CAST(cnt AS DOUBLE)) * {_ZF_MICRO}) AS BIGINT) AS y
    FROM ranked
),
m AS (
    SELECT source, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
           sum(CAST(x AS DECIMAL(38,0)) * y) AS sxy,
           sum(CAST(x AS DECIMAL(38,0)) * x) AS sxx
    FROM pts GROUP BY source
)
SELECT source, CAST(n AS BIGINT) AS n_terms,
       CAST(((CAST(n AS HUGEINT) * CAST(sxy AS HUGEINT)
              - CAST(sx AS HUGEINT) * CAST(sy AS HUGEINT)) * 1000000)
            // (CAST(n AS HUGEINT) * CAST(sxx AS HUGEINT)
                - CAST(sx AS HUGEINT) * CAST(sx AS HUGEINT)) AS DOUBLE)
           / 1000000.0 AS zipf_slope
FROM m
"""


# ---------------------------------------------------------------------------
# session_expected_length

_SE_HORIZON = 3
_SE_NANO = 1_000_000_000


def session_expected_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected FURTHER session events within a ``_SE_HORIZON``-step
    lookahead, per current event type — the truncated absorbing-chain
    expectation E_k(u) = Σ_{v≠end} P(v|u)·(1 + E_{k−1}(v)) over the
    sessionized transition matrix (session_transition_matrix's
    '(end)' state absorbs): "given the user just did u, how much
    session is left" — the engagement-forecast column a session UI
    ranks interventions by.

    Same unrolled-iteration discipline as the stationary mix: the
    recursion unrolls into one declarative plan over the
    (|types|+1)²-row matrix; every P is an exact-integer ratio and
    every contribution quantizes ONCE to nano-units so the per-state
    sums are order-free integers — oracled bit-for-bit.
    """
    ev = spread(load_table(spark, sf_dir, "events"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    sess = ev.withColumn(
        "is_new", F.when(gap.isNull() | (gap > _ST_GAP_S), 1).otherwise(0)
    ).withColumn(
        "session_id",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    ws = Window.partitionBy("user_id", "session_id").orderBy("ts", "event_id")
    pairs = sess.select(
        F.col("event_type").alias("u"),
        F.coalesce(F.lead("event_type").over(ws), F.lit("(end)")).alias("v"),
    )
    # r10 optimization (the events_markov_stationary stance): the
    # (|types|+1)²-row transition-count table feeds P and states, and
    # the unrolled horizon references P per round — branch pruning made
    # each copy canonically different, so the corpus-scale sessionize
    # window chain (lag + running-sum + lead) re-executed per branch
    # (43 stages / 6 Window nodes measured). Truncating lineage at the
    # matrix-scale table runs the corpus pass once per invocation.
    cnt = (
        pairs.groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("n"))
        .transform(_plan_ckpt)
    )
    wtot = Window.partitionBy("u")
    P = cnt.select(
        "u", "v", (F.col("n").cast("double") / F.sum("n").over(wtot)).alias("p")
    ).filter(F.col("v") != "(end)")
    states = cnt.select(F.col("u").alias("s")).distinct()
    e = states.select("s", F.lit(0.0).alias("ev"))
    for _ in range(_SE_HORIZON):
        contrib = P.join(e, P.v == e.s).select(
            F.col("u"),
            F.round(F.col("p") * (F.lit(1.0) + F.col("ev")) * _SE_NANO)
            .cast("long")
            .alias("c"),
        )
        inflow = contrib.groupBy("u").agg(F.sum("c").alias("m"))
        e = states.join(inflow, states.s == inflow.u, "left").select(
            "s",
            (F.coalesce(F.col("m"), F.lit(0)).cast("double") / _SE_NANO).alias("ev"),
        )
    return e.select(
        F.col("s").alias("event_type"),
        F.round(F.col("ev"), 6).alias("expected_next_events"),
    )


def _expected_length_oracle() -> str:
    it = []
    prev = "e0"
    for k in range(1, _SE_HORIZON + 1):
        it.append(f""",
c{k} AS (
    SELECT P.u, CAST(round(P.p * (1.0 + e.ev) * {_SE_NANO}) AS BIGINT) AS c
    FROM P JOIN {prev} e ON P.v = e.s
),
m{k} AS (SELECT u, sum(c) AS m FROM c{k} GROUP BY u),
e{k} AS (
    SELECT s.s, CAST(coalesce(m.m, 0) AS DOUBLE) / {_SE_NANO} AS ev
    FROM states s LEFT JOIN m{k} m ON s.s = m.u
)""")
        prev = f"e{k}"
    return (
        f"""
WITH flagged AS (
    SELECT user_id, ts, event_id, event_type,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR CAST(floor(epoch(ts)) AS BIGINT)
                     - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > {_ST_GAP_S}
                THEN 1 ELSE 0 END AS is_new
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
    SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
    FROM flagged
),
pairs AS (
    SELECT event_type AS u,
           coalesce(lead(event_type) OVER (PARTITION BY user_id, session_id
                                           ORDER BY ts, event_id),
                    '(end)') AS v
    FROM sess
),
cnt AS (SELECT u, v, count(*) AS n FROM pairs GROUP BY u, v),
P AS (
    SELECT u, v, CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY u) AS p
    FROM cnt
    QUALIFY v <> '(end)'
),
states AS (SELECT DISTINCT u AS s FROM cnt),
e0 AS (SELECT s, 0.0 AS ev FROM states)"""
        + "".join(it)
        + f"""
SELECT s AS event_type, round(ev, 6) AS expected_next_events FROM {prev}
"""
    )


SESSION_EXPECTED_SQL = _expected_length_oracle()


QUERIES = {
    "bpe_per_lang_rules": bpe_per_lang_rules,
    "docs_kn_perplexity": docs_kn_perplexity,
    "docs_kn_perplexity_bucketed": docs_kn_perplexity_bucketed,
    "decontaminate_bloom": decontaminate_bloom,
    "neardup_pagerank": neardup_pagerank,
    "dedup_agreement_matrix": dedup_agreement_matrix,
    "bpe_compression_curve": bpe_compression_curve,
    "bpe_fertility_by_lang": bpe_fertility_by_lang,
    "part_pair_lift": part_pair_lift,
    "events_interarrival_stats": events_interarrival_stats,
    "discount_quantity_slope": discount_quantity_slope,
    "events_markov_stationary": events_markov_stationary,
    "session_transition_matrix": session_transition_matrix,
    "zipf_by_source": zipf_by_source,
    "session_expected_length": session_expected_length,
    "dedup_cluster_sizes": dedup_cluster_sizes,
    "corpus_zipf_fit": corpus_zipf_fit,
    "ann_opq_topk": ann_opq_topk,
    "embedding_logreg_score": embedding_logreg_score,
    "embedding_random_projection": embedding_random_projection,
    "embedding_pca_spectrum": embedding_pca_spectrum,
    "tfidf_retrieval_topk": tfidf_retrieval_topk,
    "events_transition_matrix": events_transition_matrix,
    "source_temperature_mix": source_temperature_mix,
}

ORACLES = {
    "part_pair_lift": PART_PAIR_LIFT_SQL,
    "events_interarrival_stats": EVENTS_INTERARRIVAL_SQL,
    "discount_quantity_slope": DISCOUNT_SLOPE_SQL,
    "events_markov_stationary": EVENTS_STATIONARY_SQL,
    "session_transition_matrix": SESSION_TRANSITION_SQL,
    "zipf_by_source": ZIPF_BY_SOURCE_SQL,
    "session_expected_length": SESSION_EXPECTED_SQL,
    "dedup_cluster_sizes": DEDUP_CLUSTER_SIZES_SQL,
    "docs_kn_perplexity": DOCS_KN_PPL_SQL,
    "docs_kn_perplexity_bucketed": DOCS_KN_PPL_SQL,
    "neardup_pagerank": NEARDUP_PAGERANK_SQL,
    "decontaminate_bloom": DECONTAMINATE_BLOOM_SQL,
    "corpus_zipf_fit": CORPUS_ZIPF_SQL,
    "embedding_logreg_score": EMBEDDING_LOGREG_SQL,
    "embedding_random_projection": EMBEDDING_RP_SQL,
    "tfidf_retrieval_topk": TFIDF_RETRIEVAL_SQL,
    "events_transition_matrix": TRANSITION_SQL,
    "source_temperature_mix": TEMPERATURE_MIX_SQL,
}
