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

The reference engine streams text lines through RainStorm operators
(reference rainstorm/rainstorm.go:307-355); everything here is part
of the beyond-reference LLM-data-pipeline surface (SURVEY.md §2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

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
            F.round(
                F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("df"))
                * _TR_MICRO
            )
            .cast("long")
            .alias("w_mu"),
        )
    )
    norms = weighted.groupBy("doc_id").agg(
        F.sum(F.col("w_mu").cast("decimal(38,0)") * F.col("w_mu")).alias("norm2")
    )
    dots = (
        weighted.join(broadcast(qterms), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.sum("w_mu").alias("dot_mu"))
    )
    scored = dots.join(norms, "doc_id").select(
        "query_id",
        "doc_id",
        (
            F.col("dot_mu").cast("double")
            / F.sqrt(F.col("norm2").cast("double"))
        ).alias("_score"),
        "dot_mu",
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
            F.round(F.col("n").cast("double") / F.col("n_prev"), 6).alias("p"),
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
       round(CAST(n AS DOUBLE)
             / sum(n) OVER (PARTITION BY prev_type), 6) AS p
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
    return scaled.select(
        "source",
        "n_tokens",
        F.round(
            F.col("_s_mu").cast("double") / F.sum("_s_mu").over(wtot), 6
        ).alias("weight"),
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
       round(CAST(s_mu AS DOUBLE) / sum(s_mu) OVER (), 6) AS weight
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
    Rows-only (recall pinned ≥ the plain-PQ floor and vs brute force
    in tests/test_ann.py; the rotation itself is unit-tested for
    orthonormality and distance preservation)."""
    from distributed_file_system_with_stream_processing_spark.operators import clustering as C

    return C.opq_topk(
        load_table(spark, sf_dir, "embeddings"), query_ids_below=10, k=5
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

    emb = load_table(spark, sf_dir, "embeddings")
    w, b = L.logreg_fit(
        emb,
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
       round(1.0 / (1.0 + exp(-(list_sum(list_transform(range(1, {d + 1}),
             i -> e.v[i] * w{kf}.w[i])) + w{kf}.b))), 6) AS p,
       CAST((1.0 / (1.0 + exp(-(list_sum(list_transform(range(1, {d + 1}),
             i -> e.v[i] * w{kf}.w[i])) + w{kf}.b))) >= 0.5) AS BIGINT) AS pred
FROM e, w{kf}"""
    )
    return "".join(parts)


EMBEDDING_LOGREG_SQL = _logreg_oracle()


QUERIES = {
    "bpe_per_lang_rules": bpe_per_lang_rules,
    "ann_opq_topk": ann_opq_topk,
    "embedding_logreg_score": embedding_logreg_score,
    "tfidf_retrieval_topk": tfidf_retrieval_topk,
    "events_transition_matrix": events_transition_matrix,
    "source_temperature_mix": source_temperature_mix,
}

ORACLES = {
    "embedding_logreg_score": EMBEDDING_LOGREG_SQL,
    "tfidf_retrieval_topk": TFIDF_RETRIEVAL_SQL,
    "events_transition_matrix": TRANSITION_SQL,
    "source_temperature_mix": TEMPERATURE_MIX_SQL,
}
