"""Training-data curation queries, third LLM-pipeline module.

Same contract as ``llm_ops``/``llm_ops2``: declarative DataFrame plans
(JVM expressions only), each with a DuckDB oracle mirroring the exact
arithmetic so value hashes match without tolerances. Portability
conventions (hash32, words, micro-unit quantization of per-item float
contributions so per-doc reductions are order-free integer sums) are
documented in those modules.

Ops here:
- ``semantic_dedup_kmeans`` — the FULL SemDeDup recipe: trained
  k-means cells, then pairwise cosine only within a cell.
- ``docs_bm25_score`` — BM25 relevance of every document against a
  fixed query-term set (Robertson/Sparck Jones; the Lucene idf).
- ``dsir_importance_weights`` — DSIR-style (Xie et al. 2023,
  arXiv:2302.03169) hashed-unigram importance weights for targeted
  data selection: log p_target(x)/p_raw(x) under bucketed unigram LMs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from distributed_file_system_with_stream_processing_spark.operators._util import (
    plan_ckpt as _plan_ckpt,
)
from distributed_file_system_with_stream_processing_spark.functions import text as T
from distributed_file_system_with_stream_processing_spark.operators._util import spread
from distributed_file_system_with_stream_processing_spark.plans.llm_ops import _DOT, _WS
from distributed_file_system_with_stream_processing_spark.plans.llm_ops2 import (
    _kmeans_oracle_parts,
)
from distributed_file_system_with_stream_processing_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# semantic_dedup_kmeans

_SD_K = 16
_SD_ITERS = 2
_SD_THRESHOLD = 0.35


def semantic_dedup_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over TRAINED k-means cells — see
    operators/clustering.semdedup_kmeans for the scale analysis
    (per-cell quadratic bound, one corpus shuffle on the cell key).
    The oracle chains the unrolled-Lloyd CTE (bit-stable, shared with
    embedding_kmeans_assign) into the within-cell pair join, so this
    is a full value-hash row despite the iterative training step.

    r8: the verdict table is a session-persisted backbone
    (plans/_backbones.semdedup_verdicts — Lloyd trains once per
    (session, sf_dir); ``semdedup_cell_stats`` rolls up the same
    materialization instead of retraining).
    """
    from distributed_file_system_with_stream_processing_spark.plans import _backbones as B

    return B.semdedup_verdicts(spark, sf_dir)


def _semdedup_kmeans_sql() -> str:
    body = ",\n".join(_kmeans_oracle_parts(_SD_K, _SD_ITERS))
    return (
        body
        + f""",
fn AS (SELECT vec_id, v, c, sqrt({_DOT.format(a='v', b='v')}) AS nrm FROM fin),
dup AS (
    SELECT DISTINCT b.vec_id AS dup_id
    FROM fn a JOIN fn b ON a.c = b.c AND a.vec_id < b.vec_id
    WHERE {_DOT.format(a='a.v', b='b.v')} / (a.nrm * b.nrm)
          >= CAST({_SD_THRESHOLD} AS DOUBLE)
)
SELECT f.vec_id, CAST(f.c AS BIGINT) AS cluster, d.dup_id IS NULL AS keep
FROM fin f LEFT JOIN dup d ON f.vec_id = d.dup_id
"""
    )


SEMANTIC_DEDUP_KMEANS_SQL = _semdedup_kmeans_sql()


# ---------------------------------------------------------------------------
# docs_bm25_score

_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TERMS = ("stream", "join", "vector", "spark")
_BM25_MICRO = 1_000_000


def _bm25_tf(toks: DataFrame) -> DataFrame:
    """(doc_id, dl, term, tf) for the query terms only."""
    ex = (
        toks.select(
            "doc_id", F.size("ws").alias("dl"), F.explode_outer("ws").alias("w")
        )
        .filter(F.col("w").isNotNull())
        .select("doc_id", "dl", F.lower(F.col("w")).alias("term"))
        .filter(F.col("term").isin(*_BM25_TERMS))
    )
    return ex.groupBy("doc_id", "dl", "term").agg(F.count(F.lit(1)).alias("tf"))


def _bm25_idf_tbl(toks: DataFrame, tf: DataFrame) -> DataFrame:
    """|Q|-row (term, idf, avgdl) model table — the trainable half of
    BM25, shared by the batch query and the stream-scorer trainer so
    the model constants are bit-identical in both paths."""
    stats = toks.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size("ws")).alias("total_len"),
    )
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    return df_t.crossJoin(broadcast(stats)).select(
        "term",
        F.log(
            (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
        ).alias("idf"),
        (F.col("total_len").cast("double") / F.col("n_docs")).alias("avgdl"),
    )


def bm25_train(docs: DataFrame) -> dict:
    """Collect the BM25 model (metadata-scale: |Q| idf doubles + one
    avgdl) for embedding as literals in a stateless stream scorer —
    the train-offline/score-online split. Doubles round-trip repr
    exactly, so the stream scorer's arithmetic is bit-identical to
    the batch query's."""
    toks = docs.select("doc_id", T.words(F.col("text")).alias("ws"))
    rows = _bm25_idf_tbl(toks, _bm25_tf(toks)).collect()
    return {
        "idf": {r["term"]: r["idf"] for r in rows},
        "avgdl": rows[0]["avgdl"] if rows else 0.0,
        "k1": _BM25_K1,
        "b": _BM25_B,
        "micro": _BM25_MICRO,
    }


def docs_bm25_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 relevance of every document against a fixed query-term
    set — the retrieval-side scoring a curation pipeline uses to mine
    topic-targeted subsets from a raw corpus. idf is the Lucene/
    Robertson form ln((N - df + 0.5)/(df + 0.5) + 1) (always
    positive); docs with zero query-term hits are not emitted (their
    score is identically 0 — the downstream consumer is a top-k or
    threshold gate either way).

    Float-determinism: the per-(doc, term) contribution
    idf·tf·(k1+1)/(tf + k1·(1 − b + b·dl/avgdl)) is a fixed sequence
    of IEEE ops on exact-integer-derived doubles, quantized ONCE to
    micro-units; the per-doc reduction is an exact integer sum
    (partial-agg-order-free — the perplexity/q9 discipline).

    100 TB shape: one corpus scan → explode filtered to the |Q| query
    terms (the filter cannot reach the scan, but the (doc, term)
    partial agg sees only matching tokens) → shuffle 1 on (doc_id,
    term); df is a |Q|-row agg off that compact table [shuffle 2,
    map-side partials]; N and total_len ride ONE 1-row aggregate
    broadcast (the allow-listed tfidf/q11 BuildRight shape); the
    |Q|·idf table broadcasts into the hash join; shuffle 3 is the
    per-doc integer sum. The corpus itself moves twice (tokenize →
    (doc,term) agg → doc agg), never more.
    """
    d = spread(load_table(spark, sf_dir, "documents"))
    toks = d.select("doc_id", T.words(F.col("text")).alias("ws"))
    tf = _bm25_tf(toks)
    idf_tbl = _bm25_idf_tbl(toks, tf)
    contrib = (
        F.col("idf")
        * (F.col("tf") * (_BM25_K1 + 1.0))
        / (
            F.col("tf")
            + _BM25_K1
            * (1.0 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
        )
    )
    scored = (
        tf.join(broadcast(idf_tbl), "term")
        .select(
            "doc_id",
            F.round(contrib * _BM25_MICRO).cast("long").alias("_c_mu"),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_hit_terms"),
            F.sum("_c_mu").alias("_s"),
        )
    )
    return scored.select(
        "doc_id",
        "n_hit_terms",
        # round to 6 = the micro-unit resolution itself. Rounding the
        # quantized sum to FEWER digits is the halfway trap: s ending
        # in ...50 puts the true value exactly on a 4-decimal midpoint,
        # where Spark (decimal-string HALF_UP) and DuckDB (binary
        # double) legitimately disagree — seen live at sf0.01.
        # ok-round: exact micro grid (6 dp)
        F.round(F.col("_s").cast("double") / _BM25_MICRO, 6).alias("bm25"),
    )


_BM25_TERMS_SQL = ", ".join(f"'{t}'" for t in _BM25_TERMS)

DOCS_BM25_SQL = rf"""
WITH toks AS (SELECT doc_id, {_WS} AS ws FROM documents),
stats AS (SELECT count(*) AS n_docs, sum(len(ws)) AS total_len FROM toks),
ex AS (
    SELECT doc_id, dl, term FROM (
        SELECT doc_id, len(ws) AS dl, lower(unnest(ws)) AS term FROM toks)
    WHERE term IN ({_BM25_TERMS_SQL})
),
tf AS (SELECT doc_id, dl, term, count(*) AS tf FROM ex GROUP BY doc_id, dl, term),
df_t AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
idf AS (
    SELECT term,
           ln((s.n_docs - df + 0.5) / (df + 0.5) + 1.0) AS idf,
           CAST(s.total_len AS DOUBLE) / s.n_docs AS avgdl
    FROM df_t CROSS JOIN stats s
),
scored AS (
    SELECT tf.doc_id,
           CAST(round(i.idf * (tf.tf * ({_BM25_K1} + 1.0))
                      / (tf.tf + {_BM25_K1} * (1.0 - {_BM25_B}
                         + {_BM25_B} * tf.dl / i.avgdl))
                      * {_BM25_MICRO}) AS BIGINT) AS c_mu
    FROM tf JOIN idf i USING (term)
)
SELECT doc_id, count(*) AS n_hit_terms,
       -- ok-round: exact micro grid (6 dp)
       round(CAST(sum(c_mu) AS DOUBLE) / {_BM25_MICRO}, 6) AS bm25
FROM scored GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# bm25_retrieval_topk

_RET_QUERIES_BELOW = 10  # docs with doc_id < 10 act as the query table
_RET_QTERMS = 6  # first N words of a query doc form its term set
_RET_K = 5


def bm25_retrieval_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage BM25 retrieval over a query TABLE (not a literal term
    set): the lowest ``_RET_QUERIES_BELOW`` doc ids act as queries
    (their first ``_RET_QTERMS`` words, lowercased + deduped, are the
    term set — the ANN family's query-ids-below convention applied to
    text). Top-``_RET_K`` base docs per query by BM25.

    100 TB shape: postings = the (doc, term) tfidf backbone [shuffle
    1]; the query-term table is benchmark-scale and BROADCASTS into
    the postings join, so only matching postings survive; df folds off
    the matched (≤ |qterms|·n_docs) table [shuffle 2, tiny]; corpus
    stats ride the 1-row BuildRight broadcast; per-(query, doc) score
    is an INTEGER sum of micro-quantized contributions [shuffle 3], so
    ranking needs no further quantization; final top-k is the
    per-query window (the ann_cosine_topk shape — rank by the exact
    integer, ties by doc_id).
    """
    d = spread(load_table(spark, sf_dir, "documents"))
    toks = d.select("doc_id", T.words(F.col("text")).alias("ws"))
    qterms = (
        toks.filter(F.col("doc_id") < _RET_QUERIES_BELOW)
        .select(
            F.col("doc_id").alias("query_id"),
            F.explode_outer(F.slice("ws", 1, _RET_QTERMS)).alias("w"),
        )
        .filter(F.col("w").isNotNull())
        .select("query_id", F.lower(F.col("w")).alias("term"))
        .distinct()
    )
    base = toks.filter(F.col("doc_id") >= _RET_QUERIES_BELOW)
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size("ws")).alias("total_len"),
    )
    ex = (
        base.select(
            "doc_id", F.size("ws").alias("dl"), F.explode_outer("ws").alias("w")
        )
        .filter(F.col("w").isNotNull())
        .select("doc_id", "dl", F.lower(F.col("w")).alias("term"))
    )
    # r9: matched feeds BOTH the df fold and the scorer, so it is
    # materialized once (strict subset of the postings table — always
    # cheaper than re-running the corpus pass). r10: the broadcast
    # query-term join moves BELOW the tf aggregation — only matched
    # tokens reach the shuffle, so the corpus-scale (doc, dl, term)
    # Exchange the full postings table paid is gone at any scale. tf
    # per (query, doc, term) is the same exact count (qterms is
    # distinct per (query, term)).
    matched = (
        ex.join(broadcast(qterms), "term")
        .groupBy("query_id", "doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .transform(_plan_ckpt)
    )
    df_t = (
        matched.select("term", "doc_id")
        .distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    idf_tbl = df_t.crossJoin(broadcast(stats)).select(
        "term",
        F.log(
            (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
        ).alias("idf"),
        (F.col("total_len").cast("double") / F.col("n_docs")).alias("avgdl"),
    )
    contrib = (
        F.col("idf")
        * (F.col("tf") * (_BM25_K1 + 1.0))
        / (
            F.col("tf")
            + _BM25_K1
            * (1.0 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
        )
    )
    scored = (
        matched.join(broadcast(idf_tbl), "term")
        .select(
            "query_id",
            "doc_id",
            F.round(contrib * _BM25_MICRO).cast("long").alias("_c_mu"),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("_c_mu").alias("_s"))
    )
    win = Window.partitionBy("query_id").orderBy(F.desc("_s"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(win).cast("long"))
        .filter(F.col("rank") <= _RET_K)
        .select(
            "query_id",
            "doc_id",
            # ok-round: exact micro grid (6 dp)
            F.round(F.col("_s").cast("double") / _BM25_MICRO, 6).alias("bm25"),
            "rank",
        )
    )


BM25_RETRIEVAL_SQL = rf"""
WITH toks AS (SELECT doc_id, {_WS} AS ws FROM documents),
qterms AS (
    SELECT DISTINCT doc_id AS query_id, lower(unnest(ws[1:{_RET_QTERMS}])) AS term
    FROM toks WHERE doc_id < {_RET_QUERIES_BELOW}
),
base AS (SELECT * FROM toks WHERE doc_id >= {_RET_QUERIES_BELOW}),
stats AS (SELECT count(*) AS n_docs, sum(len(ws)) AS total_len FROM base),
postings AS (
    SELECT doc_id, dl, term, count(*) AS tf FROM (
        SELECT doc_id, len(ws) AS dl, lower(unnest(ws)) AS term FROM base)
    GROUP BY doc_id, dl, term
),
matched AS (SELECT q.query_id, p.* FROM postings p JOIN qterms q USING (term)),
df_t AS (
    SELECT term, count(*) AS df FROM (SELECT DISTINCT term, doc_id FROM matched)
    GROUP BY term
),
idf AS (
    SELECT term,
           ln((s.n_docs - df + 0.5) / (df + 0.5) + 1.0) AS idf,
           CAST(s.total_len AS DOUBLE) / s.n_docs AS avgdl
    FROM df_t CROSS JOIN stats s
),
scored AS (
    SELECT query_id, doc_id, sum(c_mu) AS s FROM (
        SELECT m.query_id, m.doc_id,
               CAST(round(i.idf * (m.tf * ({_BM25_K1} + 1.0))
                          / (m.tf + {_BM25_K1} * (1.0 - {_BM25_B}
                             + {_BM25_B} * m.dl / i.avgdl))
                          * {_BM25_MICRO}) AS BIGINT) AS c_mu
        FROM matched m JOIN idf i USING (term))
    GROUP BY query_id, doc_id
),
rk AS (
    SELECT query_id, doc_id, s,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY s DESC, doc_id) AS rank
    FROM scored
)
SELECT query_id, doc_id,  -- ok-round: exact micro grid (6 dp)
       round(CAST(s AS DOUBLE) / {_BM25_MICRO}, 6) AS bm25,
       CAST(rank AS BIGINT) AS rank
FROM rk WHERE rank <= {_RET_K}
"""


# ---------------------------------------------------------------------------
# rrf_fusion_topk

_RRF_C = 60  # the standard reciprocal-rank-fusion constant


def rrf_fusion_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: Reciprocal Rank Fusion (Cormack et al. 2009)
    of the lexical (bm25_retrieval_topk) and dense (ann_cosine_topk)
    rankings for the shared query ids 0..9 — the standard two-tower
    fusion rrf(d) = Σ_systems 1/(C + rank_d).

    Each system's contribution quantizes to integer micro-units
    (1e6/(C+rank) — with rank ≤ 5 these are exact-input single
    divisions, never a .5 rounding boundary), so the fused score is
    an integer sum and the fused rank needs no re-quantization.
    Shape: both backbones' plans + a FULL OUTER join of two
    (≤ k·|Q|)-row toplists — metadata-scale fusion on top of the
    established retrieval shapes; flags record which system(s)
    surfaced each item.
    """
    from distributed_file_system_with_stream_processing_spark.plans import llm_ops as L

    bm = bm25_retrieval_topk(spark, sf_dir).select(
        "query_id", F.col("doc_id").alias("item_id"), F.col("rank").alias("_br")
    )
    ann = L.ann_cosine_topk(spark, sf_dir).select(
        "query_id", F.col("neighbor_id").alias("item_id"), F.col("rank").alias("_ar")
    )
    # 10^6/(60+rank): a .5 landing needs a divisor of 2*10^6 in
    # [61, 60+k] with an ODD quotient; none exists (2*10^6 = 2^7*5^6) —
    # ok-round: boundary-free rational for the fixed c=60
    c_mu = lambda col: F.coalesce(
        F.round(1000000.0 / (_RRF_C + F.col(col))).cast("long"), F.lit(0).cast("long")
    )
    fused = (
        bm.join(ann, ["query_id", "item_id"], "full_outer")
        .select(
            "query_id",
            "item_id",
            (c_mu("_br") + c_mu("_ar")).alias("_s_mu"),
            F.col("_br").isNotNull().alias("in_bm25"),
            F.col("_ar").isNotNull().alias("in_ann"),
        )
    )
    win = Window.partitionBy("query_id").orderBy(F.desc("_s_mu"), F.asc("item_id"))
    return (
        fused.withColumn("rank", F.row_number().over(win).cast("long"))
        .select(
            "query_id",
            "item_id",
            # ok-round: exact micro grid (6 dp)
            F.round(F.col("_s_mu").cast("double") / 1000000.0, 6).alias("rrf"),
            "in_bm25",
            "in_ann",
            "rank",
        )
    )


def _rrf_sql() -> str:
    """Chain BOTH backbone oracles' CTE bodies (no name collisions by
    construction) and fuse — the registered oracles stay the single
    source of truth for each system's ranking arithmetic."""
    from distributed_file_system_with_stream_processing_spark.plans.llm_ops import ANN_TOPK_SQL

    b_body, b_tail = BM25_RETRIEVAL_SQL.rsplit("SELECT query_id, doc_id,", 1)
    a = ANN_TOPK_SQL.strip()
    assert a.startswith("WITH ")
    a_body, a_tail = a[len("WITH "):].rsplit("SELECT query_id, neighbor_id,", 1)
    return (
        b_body.rstrip().rstrip(",")
        + ",\nbmr AS (SELECT query_id, doc_id, "
        + b_tail.strip()
        + "),\n"
        + a_body.rstrip().rstrip(",")
        + ",\nannr AS (SELECT query_id, neighbor_id, "
        + a_tail.strip()
        + "),\n"
        + f"""fused AS (
    SELECT coalesce(bm.query_id, an.query_id) AS query_id,
           coalesce(bm.doc_id, an.neighbor_id) AS item_id,
           -- ok-round: boundary-free rational for fixed c=60 (see twin)
           coalesce(CAST(round(1000000.0 / ({_RRF_C} + bm.rank)) AS BIGINT), 0)
           -- ok-round: boundary-free rational for fixed c=60 (see twin)
         + coalesce(CAST(round(1000000.0 / ({_RRF_C} + an.rank)) AS BIGINT), 0) AS s_mu,
           bm.rank IS NOT NULL AS in_bm25,
           an.rank IS NOT NULL AS in_ann
    FROM bmr bm FULL OUTER JOIN annr an
         ON bm.query_id = an.query_id AND bm.doc_id = an.neighbor_id
),
fr AS (
    SELECT query_id, item_id, s_mu, in_bm25, in_ann,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY s_mu DESC, item_id) AS rank
    FROM fused
)
-- ok-round: exact micro grid (6 dp)
SELECT query_id, item_id, round(CAST(s_mu AS DOUBLE) / 1000000.0, 6) AS rrf,
       in_bm25, in_ann, CAST(rank AS BIGINT) AS rank
FROM fr
"""
    )


# ---------------------------------------------------------------------------
# dsir_importance_weights

_DSIR_BUCKETS = 256
_DSIR_TARGET_LANG = "en"
_DSIR_MICRO = 1_000_000


def _dsir_tfb(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, bucket, tf) — the single-pass hashed-unigram
    backbone both the LM training fold and the per-doc scoring read."""
    ex = (
        docs.select(
            "doc_id", "lang", F.explode_outer(T.words(F.col("text"))).alias("w")
        )
        .filter(F.col("w").isNotNull())
        .select(
            "doc_id",
            "lang",
            (T.hash32(F.lower(F.col("w"))) % _DSIR_BUCKETS).alias("bucket"),
        )
    )
    return ex.groupBy("doc_id", "lang", "bucket").agg(F.count(F.lit(1)).alias("tf"))


def _dsir_lr_tbl(tfb: DataFrame) -> DataFrame:
    """256-row (bucket, lr_mu) model table: micro-quantized
    ln p_target(b) − ln p_raw(b) under add-one smoothing."""
    bc = tfb.groupBy("bucket").agg(
        F.sum("tf").alias("raw_n"),
        F.sum(
            F.when(F.col("lang") == _DSIR_TARGET_LANG, F.col("tf")).otherwise(0)
        ).alias("tgt_n"),
    )
    tot = bc.agg(F.sum("raw_n").alias("r_tot"), F.sum("tgt_n").alias("t_tot"))
    return bc.crossJoin(broadcast(tot)).select(
        "bucket",
        # ok-round: irrational (ln-mixture importance weight)
        F.round(
            (
                F.log(
                    (F.col("tgt_n") + 1).cast("double")
                    / (F.col("t_tot") + _DSIR_BUCKETS)
                )
                - F.log(
                    (F.col("raw_n") + 1).cast("double")
                    / (F.col("r_tot") + _DSIR_BUCKETS)
                )
            )
            * _DSIR_MICRO
        )
        .cast("long")
        .alias("lr_mu"),
        "r_tot",
        "t_tot",
    )


def dsir_train(docs: DataFrame) -> dict[int, int]:
    """Collect the full 256-entry {bucket: lr_mu} model for literal
    embedding in a stateless stream scorer. Buckets absent from the
    training corpus get the smoothed count-0 default (computed in
    Python — those buckets by construction never appear when scoring
    the training distribution, only genuinely novel stream tokens)."""
    import math

    rows = _dsir_lr_tbl(_dsir_tfb(docs)).collect()
    out = {r["bucket"]: r["lr_mu"] for r in rows}
    if rows:
        r_tot, t_tot = rows[0]["r_tot"], rows[0]["t_tot"]
        default = round(
            (
                math.log(1.0 / (t_tot + _DSIR_BUCKETS))
                - math.log(1.0 / (r_tot + _DSIR_BUCKETS))
            )
            * _DSIR_MICRO
        )
    else:
        default = 0
    for b in range(_DSIR_BUCKETS):
        out.setdefault(b, default)
    return out


def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every raw
    document by log p_target(x) − p_raw(x) under hashed-unigram bag
    models, the signal importance-resampling uses to tilt a huge raw
    corpus toward a target domain (here: the lang='en' slice).

    Features are hash32(term) mod 256 buckets — the bucket-count
    tables are FIXED-SIZE metadata (256 rows) at any corpus size, the
    whole point of hashed DSIR. Both LMs use add-one smoothing. Each
    bucket's log-ratio ln p_t(b) − ln p_r(b) quantizes ONCE to
    micro-units; a doc's log-weight is the exact integer sum
    Σ tf_b · lr_mu[b] (order-free at any parallelism).

    100 TB shape: ONE tokenize pass → (doc, bucket) partial agg
    [shuffle 1, the backbone]; bucket totals fold off that compact
    table [shuffle 2, 256 keys, map-side partials]; grand totals are
    a 1-row BuildRight broadcast (allow-listed shape) onto 256 rows;
    the 256-row log-ratio table broadcasts into the hash join;
    shuffle 3 is the per-doc integer sum. The raw corpus never moves
    at full width — only (doc_id, bucket, tf) triples after shuffle 1.
    """
    d = spread(load_table(spark, sf_dir, "documents"))
    # r9 optimization: the hashed-unigram backbone feeds the LM
    # training fold AND the per-doc scoring join; branch pruning
    # defeats AQE stage reuse, so the tokenize+hash corpus pass ran
    # twice. tfb is the POST-aggregation (doc, lang, bucket, tf) table
    # (≤256 rows per doc — far narrower than the token explode that
    # builds it), so localCheckpoint once per invocation is strictly
    # cheaper than the second pass it replaces.
    tfb = _dsir_tfb(d).transform(_plan_ckpt)
    lr = _dsir_lr_tbl(tfb)
    out = (
        tfb.join(broadcast(lr), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.sum(F.col("tf") * F.col("lr_mu")).alias("_s"),
        )
    )
    return out.select(
        "doc_id",
        "n_tokens",
        # ok-round: exact micro grid (6 dp)
        F.round(F.col("_s").cast("double") / _DSIR_MICRO, 6).alias("log_weight"),
    )


_DSIR_BODY = rf"""
WITH ex AS (
    SELECT doc_id, lang,
           ('0x' || substr(md5(lower(unnest({_WS}))), 1, 8))::BIGINT
               % {_DSIR_BUCKETS} AS bucket
    FROM documents
),
tfb AS (SELECT doc_id, lang, bucket, count(*) AS tf
        FROM ex GROUP BY doc_id, lang, bucket),
bc AS (
    SELECT bucket, sum(tf) AS raw_n,
           sum(CASE WHEN lang = '{_DSIR_TARGET_LANG}' THEN tf ELSE 0 END) AS tgt_n
    FROM tfb GROUP BY bucket
),
tot AS (SELECT sum(raw_n) AS r_tot, sum(tgt_n) AS t_tot FROM bc),
lr AS (
    SELECT bucket,
           -- ok-round: irrational (ln-mixture importance weight)
           CAST(round((ln(CAST(tgt_n + 1 AS DOUBLE) / (t.t_tot + {_DSIR_BUCKETS}))
                       - ln(CAST(raw_n + 1 AS DOUBLE) / (t.r_tot + {_DSIR_BUCKETS})))
                      * {_DSIR_MICRO}) AS BIGINT) AS lr_mu
    FROM bc CROSS JOIN tot t
),
agg AS (
    SELECT doc_id, sum(tf) AS n_tokens, sum(tf * lr_mu) AS s
    FROM tfb JOIN lr USING (bucket) GROUP BY doc_id
),
w AS (
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           -- ok-round: exact micro grid (6 dp)
           round(CAST(s AS DOUBLE) / {_DSIR_MICRO}, 6) AS log_weight
    FROM agg
)"""

DSIR_WEIGHTS_SQL = _DSIR_BODY + "\nSELECT doc_id, n_tokens, log_weight FROM w\n"


# ---------------------------------------------------------------------------
# dsir_resample_topk

_RS_N = 200
_RS_TEMP = 1.0


def dsir_resample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The RESAMPLING step that completes DSIR: importance sampling
    without replacement via the Gumbel-top-k trick (Kool et al. 2019)
    — rank docs by log_weight/T + Gumbel noise and keep the top n.
    The "noise" is deterministic (hash32 of the doc id → uniform in
    (0,1) → −ln(−ln u)), so the sample is reproducible and the
    DuckDB oracle draws the identical Gumbels.

    The perturbed key quantizes to micro-units BEFORE ranking, so a
    1-ulp ln() divergence between engines cannot reorder neighbors
    (the established rank-on-integers discipline).

    100 TB shape: the weight pipeline's shuffles, then a global
    top-n — Spark plans orderBy+limit as TakeOrderedAndProject
    (per-partition heap of n, driver merge of n·partitions): NO
    global sort, no single-task window over the corpus. Only the
    n=200 selected rows see the final rank window (metadata-scale).
    """
    w = dsir_importance_weights(spark, sf_dir)
    u = (T.hash32(F.col("doc_id").cast("string")) + 0.5) / F.lit(4294967296.0)
    g = -F.log(-F.log(u))
    # ok-round: irrational (gumbel + ln-weight composite)
    key_mu = F.round((F.col("log_weight") / _RS_TEMP + g) * 1000000.0).cast("long")
    sel = (
        w.select("doc_id", "log_weight", key_mu.alias("key_mu"))
        .orderBy(F.desc("key_mu"), F.asc("doc_id"))
        .limit(_RS_N)
    )
    win = Window.orderBy(F.desc("key_mu"), F.asc("doc_id"))
    return (
        sel.withColumn("rank", F.row_number().over(win).cast("long"))
        .select("doc_id", "log_weight", "rank")
    )


DSIR_RESAMPLE_SQL = (
    _DSIR_BODY
    + f""",
gk AS (
    SELECT doc_id, log_weight,
           -- ok-round: irrational (gumbel + ln-weight composite)
           CAST(round((log_weight / {_RS_TEMP}
                 + (-ln(-ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT + 0.5)
                            / 4294967296.0))))
                * 1000000.0) AS BIGINT) AS key_mu
    FROM w
),
sel AS (SELECT * FROM gk ORDER BY key_mu DESC, doc_id LIMIT {_RS_N})
SELECT doc_id, log_weight,
       CAST(row_number() OVER (ORDER BY key_mu DESC, doc_id) AS BIGINT) AS rank
FROM sel
"""
)


_RSS_QUOTA = 10


def dsir_resample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified DSIR resampling: a PER-SOURCE Gumbel-top-k quota —
    the data-mixing variant (each source contributes its best
    ``_RSS_QUOTA`` docs by perturbed importance key), preventing one
    dominant source from monopolizing the global sample.

    Same deterministic Gumbel + micro-quantize-before-rank discipline
    as ``dsir_resample_topk``. Shape: the weight pipeline, a PK join
    back to documents for the source column (co-partitioned
    fact-fact join on doc_id), then ONE per-source top-k window —
    the grouped-top-k standard; at extreme source skew the two-phase
    (per-partition heap, then per-source merge) rewrite applies, but
    a window over a 20-source key with quota 10 is already
    reducer-bounded: each group retains ``quota`` rows."""
    w = dsir_importance_weights(spark, sf_dir)
    src = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    u = (T.hash32(F.col("doc_id").cast("string")) + 0.5) / F.lit(4294967296.0)
    g = -F.log(-F.log(u))
    # ok-round: irrational (gumbel + ln-weight composite)
    key_mu = F.round((F.col("log_weight") / _RS_TEMP + g) * 1000000.0).cast("long")
    win = Window.partitionBy("source").orderBy(F.desc("key_mu"), F.asc("doc_id"))
    return (
        w.join(src, "doc_id")
        .select("source", "doc_id", "log_weight", key_mu.alias("key_mu"))
        .withColumn("rank", F.row_number().over(win).cast("long"))
        .filter(F.col("rank") <= _RSS_QUOTA)
        .select("source", "doc_id", "log_weight", "rank")
    )


DSIR_RESAMPLE_STRAT_SQL = (
    _DSIR_BODY
    + f""",
gk AS (
    SELECT d.source, w.doc_id, w.log_weight,
           -- ok-round: irrational (gumbel + ln-weight composite)
           CAST(round((w.log_weight / {_RS_TEMP}
                 + (-ln(-ln((('0x' || substr(md5(CAST(w.doc_id AS VARCHAR)), 1, 8))::BIGINT + 0.5)
                            / 4294967296.0))))
                * 1000000.0) AS BIGINT) AS key_mu
    FROM w JOIN documents d ON w.doc_id = d.doc_id
),
rk AS (
    SELECT source, doc_id, log_weight,
           row_number() OVER (PARTITION BY source
                              ORDER BY key_mu DESC, doc_id) AS rank
    FROM gk
)
SELECT source, doc_id, log_weight, CAST(rank AS BIGINT) AS rank
FROM rk WHERE rank <= {_RSS_QUOTA}
"""
)


# ---------------------------------------------------------------------------
# semdedup_cell_stats


def semdedup_cell_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup QA dashboard: per-cell size, duplicate count, and
    dup rate — the signal for tuning k (cells too big → quadratic
    blowup; dup rate collapsing to 0 → threshold too tight). Pure
    rollup of semantic_dedup_kmeans' output: one metadata-cardinality
    shuffle (k cells) past the recipe's own plan; rate is an exact
    integer ratio rounded once."""
    out = semantic_dedup_kmeans(spark, sf_dir)
    return (
        out.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum(F.when(F.col("keep"), 0).otherwise(1)).alias("n_dups"),
        )
        .select(
            "cluster",
            "n_members",
            "n_dups",
            # r8 conversion: exact truncating integer-division rate
            (
                F.expr("(n_dups * 1000000) div n_members").cast("double") / 1e6
            ).alias("dup_rate"),
        )
    )


def _semdedup_cell_stats_sql() -> str:
    """Fold the recipe's final SELECT into a CTE and roll up per cell
    (the _semantic_dedup_sql rsplit idiom)."""
    head, tail = SEMANTIC_DEDUP_KMEANS_SQL.rsplit("SELECT f.vec_id", 1)
    return (
        head.rstrip()
        + ",\nsd AS (SELECT f.vec_id"
        + tail.rstrip()
        + ")\n"
        "SELECT cluster, count(*) AS n_members,\n"
        "       CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_dups,\n"
        "       CAST((sum(CASE WHEN keep THEN 0 ELSE 1 END) * 1000000)\n"
        "            // count(*) AS DOUBLE) / 1000000.0 AS dup_rate\n"
        "FROM sd GROUP BY cluster"
    )


QUERIES = {
    "semantic_dedup_kmeans": semantic_dedup_kmeans,
    "docs_bm25_score": docs_bm25_score,
    "bm25_retrieval_topk": bm25_retrieval_topk,
    "rrf_fusion_topk": rrf_fusion_topk,
    "dsir_importance_weights": dsir_importance_weights,
    "dsir_resample_topk": dsir_resample_topk,
    "dsir_resample_stratified": dsir_resample_stratified,
    "semdedup_cell_stats": semdedup_cell_stats,
}

ORACLES = {
    "semantic_dedup_kmeans": SEMANTIC_DEDUP_KMEANS_SQL,
    "docs_bm25_score": DOCS_BM25_SQL,
    "bm25_retrieval_topk": BM25_RETRIEVAL_SQL,
    "rrf_fusion_topk": _rrf_sql(),
    "dsir_importance_weights": DSIR_WEIGHTS_SQL,
    "dsir_resample_topk": DSIR_RESAMPLE_SQL,
    "dsir_resample_stratified": DSIR_RESAMPLE_STRAT_SQL,
    "semdedup_cell_stats": _semdedup_cell_stats_sql(),
}
