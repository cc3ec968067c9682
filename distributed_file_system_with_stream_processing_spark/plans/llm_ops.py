"""LLM-training-data pipeline queries: dedup, similarity, text analysis.

These go beyond the reference's own surface (SURVEY.md §2) — the ops a
100 TB training-data pipeline needs. Each Spark plan has a DuckDB
oracle that mirrors the arithmetic EXPRESSION TREE exactly (same
association order, explicit DOUBLE casts, portable md5-based hashing),
so value hashes match bit-for-bit without tolerances.

Portability conventions used by every oracle below:
- hash32(s)      = conv(substr(md5(s),1,8),16,10)  ↔  ('0x'||substr(md5(s),1,8))::BIGINT
- words(t)       = filter(split(t,'\\s+'), w->w<>'') ↔ list_filter(string_split_regex(...))
- n-gram slice   = slice(ws,i,n)                    ↔  ws[i:i+n-1]
- fractional math: explicit CAST(... AS DOUBLE), never bare decimal
  literals (DuckDB would route them through DECIMAL arithmetic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_file_system_with_stream_processing_spark.functions import text as T
from distributed_file_system_with_stream_processing_spark.operators import dedup as D
from distributed_file_system_with_stream_processing_spark.operators._util import spread
from distributed_file_system_with_stream_processing_spark.operators import similarity as S
from distributed_file_system_with_stream_processing_spark.sources.tables import load_table

# Shared DuckDB fragments -------------------------------------------------

_WS = r"list_filter(string_split_regex(text, '\s+'), w -> w <> '')"


def _duck_shingles(n: int) -> str:
    return f"""
    SELECT doc_id, list_distinct(
        CASE WHEN len(ws) >= {n}
             THEN list_transform(range(1, len(ws) - {n} + 2),
                                 i -> array_to_string(ws[i:i+{n - 1}], ' '))
             ELSE [] END) AS sh
    FROM (SELECT doc_id, {_WS} AS ws FROM documents)
    """


# Text analysis -----------------------------------------------------------


def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        T.token_count(F.col("text")).alias("n_tokens"),
        T.bpe_token_estimate(F.col("text")).alias("n_tokens_bpe_est"),
    )


TOKEN_COUNT_SQL = rf"""
SELECT doc_id,
       CAST(len({_WS}) AS BIGINT) AS n_tokens,
       CAST(ceil(CAST(length(text) AS DOUBLE) / 4.0) AS BIGINT) AS n_tokens_bpe_est
FROM documents
"""


def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    ws = T.words(F.col("text"))
    base = d.select(
        "doc_id",
        F.col("text"),
        ws.alias("ws"),
    )
    stop = T.stopword_ratio(F.col("ws"))
    punct = T.punct_ratio(F.col("text"))
    n_tok = F.size("ws").cast("long")
    return base.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.round(T.avg_token_len(F.col("ws")), 4).alias("avg_token_len"),
        F.round(stop, 4).alias("stopword_ratio"),
        F.round(punct, 4).alias("punct_ratio"),
        F.round(T.quality_score(n_tok, stop, punct), 4).alias("quality"),
    )


TEXT_QUALITY_SQL = rf"""
WITH w AS (SELECT doc_id, text, {_WS} AS ws FROM documents),
r AS (
    SELECT doc_id,
           CAST(len(ws) AS BIGINT) AS n_tokens,
           CASE WHEN len(ws) > 0
                THEN CAST(list_sum(list_transform(ws, x -> length(x))) AS DOUBLE) / len(ws)
                ELSE CAST(0.0 AS DOUBLE) END AS atl,
           CASE WHEN len(ws) > 0
                THEN CAST(len(list_filter(ws, x -> list_contains(['the','a','and','of','to','in','is'], lower(x)))) AS DOUBLE) / len(ws)
                ELSE CAST(0.0 AS DOUBLE) END AS stop_r,
           CASE WHEN length(text) > 0
                THEN CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE) / length(text)
                ELSE CAST(0.0 AS DOUBLE) END AS punct_r
    FROM w
)
SELECT doc_id, n_tokens,
       round(atl, 4)    AS avg_token_len,
       round(stop_r, 4) AS stopword_ratio,
       round(punct_r, 4) AS punct_ratio,
       round(least(CAST(1.0 AS DOUBLE), greatest(CAST(0.0 AS DOUBLE),
             CAST(0.25 AS DOUBLE) + CAST(0.002 AS DOUBLE) * n_tokens
             + CAST(1.2 AS DOUBLE) * stop_r - CAST(3.0 AS DOUBLE) * punct_r)), 4) AS quality
FROM r
"""


def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    ws = T.words(F.col("text"))
    return d.select("doc_id", "lang", T.lang_predict(ws).alias("lang_pred"))


LANG_ID_SQL = rf"""
WITH w AS (SELECT doc_id, lang, {_WS} AS ws FROM documents),
s AS (
    SELECT doc_id, lang,
           len(list_filter(ws, x -> list_contains(['the','a','is','and','of'], lower(x))))      AS en,
           len(list_filter(ws, x -> list_contains(['el','la','los','las','una'], lower(x))))    AS es,
           len(list_filter(ws, x -> list_contains(['der','die','das','und','nicht'], lower(x)))) AS de,
           len(list_filter(ws, x -> list_contains(['le','les','des','une','est'], lower(x))))   AS fr
    FROM w
)
SELECT doc_id, lang,
       CASE WHEN en > 0 AND en >= es AND en >= de AND en >= fr THEN 'en'
            WHEN es > 0 AND es >= de AND es >= fr THEN 'es'
            WHEN de > 0 AND de >= fr THEN 'de'
            WHEN fr > 0 THEN 'fr'
            ELSE 'und' END AS lang_pred
FROM s
"""


def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QA for the language-ID heuristic: the (labeled, predicted)
    confusion matrix with per-cell share of the labeled language's
    rows. The acceptance gate every classifier stage ships with; pure
    groupBy + one window over the tiny matrix."""
    from pyspark.sql import Window

    d = spread(load_table(spark, sf_dir, "documents"))
    ws = T.words(F.col("text"))
    pred = d.select("doc_id", "lang", T.lang_predict(ws).alias("lang_pred"))
    cell = pred.groupBy("lang", "lang_pred").agg(F.count(F.lit(1)).alias("n"))
    tot = F.sum("n").over(Window.partitionBy("lang"))
    # r9 conversion (wave 3): truncating integer division at 6 dp
    return cell.withColumn("_t", tot).select(
        "lang",
        "lang_pred",
        "n",
        (F.expr("(n * 1000000) div _t").cast("double") / 1e6).alias("share"),
    )


LANG_ID_CONFUSION_SQL = rf"""
WITH w AS (SELECT doc_id, lang, {_WS} AS ws FROM documents),
s AS (
    SELECT doc_id, lang,
           len(list_filter(ws, x -> list_contains(['the','a','is','and','of'], lower(x))))      AS en,
           len(list_filter(ws, x -> list_contains(['el','la','los','las','una'], lower(x))))    AS es,
           len(list_filter(ws, x -> list_contains(['der','die','das','und','nicht'], lower(x)))) AS de,
           len(list_filter(ws, x -> list_contains(['le','les','des','une','est'], lower(x))))   AS fr
    FROM w
),
p AS (
    SELECT lang,
           CASE WHEN en > 0 AND en >= es AND en >= de AND en >= fr THEN 'en'
                WHEN es > 0 AND es >= de AND es >= fr THEN 'es'
                WHEN de > 0 AND de >= fr THEN 'de'
                WHEN fr > 0 THEN 'fr'
                ELSE 'und' END AS lang_pred
    FROM s
),
cell AS (SELECT lang, lang_pred, count(*) AS n FROM p GROUP BY lang, lang_pred)
SELECT lang, lang_pred, n,
       CAST((n * 1000000) // sum(n) OVER (PARTITION BY lang) AS DOUBLE)
           / 1000000.0 AS share
FROM cell
"""


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread + staged ws column: see operators/dedup._with_shingles —
    # keeps the md5-per-shingle work off the single scan partition and
    # tokenizes each text once instead of once per n-gram
    d = spread(load_table(spark, sf_dir, "documents"))
    staged = d.select(
        "doc_id",
        T.norm_text(F.col("text")).alias("norm"),
        T.words(F.col("text")).alias("ws"),
    )
    sh4 = F.array_distinct(T.word_ngrams(F.col("ws"), 4))
    return staged.select(
        "doc_id",
        F.md5("norm").alias("fp_md5"),
        F.coalesce(
            F.array_min(F.transform(sh4, F.md5)), F.md5(F.lit(""))
        ).alias("fp_shingle_min"),
    )


DOC_FINGERPRINT_SQL = rf"""
WITH w AS (
    SELECT doc_id,
           lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS norm,
           {_WS} AS ws
    FROM documents
),
g AS (
    SELECT doc_id, norm,
           list_distinct(CASE WHEN len(ws) >= 4
                THEN list_transform(range(1, len(ws) - 2), i -> array_to_string(ws[i:i+3], ' '))
                ELSE [] END) AS g4
    FROM w
)
SELECT doc_id, md5(norm) AS fp_md5,
       coalesce(list_aggregate(list_transform(g4, s -> md5(s)), 'min'), md5('')) AS fp_shingle_min
FROM g
"""


def docs_systematic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~5% corpus sample: keep rows whose md5-hash bucket
    of doc_id is < 5 of 100. Unlike rand()-sampling this is stable
    across runs/engines/partitionings — the property a reproducible
    training-data pipeline needs. Narrow map, no shuffle."""
    d = load_table(spark, sf_dir, "documents")
    bucket = T.hash32(F.col("doc_id").cast("string")) % 100
    return d.filter(bucket < 5).select("doc_id", "source", "lang", "n_chars")


DOCS_SYSTEMATIC_SAMPLE_SQL = """
SELECT doc_id, source, lang, n_chars
FROM documents
WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 5
"""


def docs_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sample: up to 3 docs per (lang) stratum, chosen by a
    deterministic hash order (random-like but reproducible). One
    shuffle on the stratum key."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    h = T.hash32(F.col("doc_id").cast("string"))
    w = Window.partitionBy("lang").orderBy(h.asc(), F.col("doc_id").asc())
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("lang", "doc_id", F.col("rn").cast("long").alias("pick"))
    )


DOCS_STRATIFIED_SAMPLE_SQL = """
SELECT lang, doc_id, CAST(rn AS BIGINT) AS pick
FROM (
    SELECT lang, doc_id,
           row_number() OVER (
               PARTITION BY lang
               ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT ASC,
                        doc_id ASC) AS rn
    FROM documents
)
WHERE rn <= 3
"""


def multimodal_image_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal decode path as a DRIVER-CHECKED query: documents
    → binary media table → Arrow-batched mapInPandas decode → typed
    features. The stub codec derives luma from md5(payload), which the
    oracle reproduces in SQL (md5 hex pairs → bytes → mean), so even
    the pandas-UDF stage is value-hash-verified, not just row-counted."""
    from distributed_file_system_with_stream_processing_spark.operators import multimodal as M

    media = M.media_from_documents(load_table(spark, sf_dir, "documents"))
    feats = M.decode_images(media)
    return feats.select(
        "media_id", "width", "height", F.round("mean_luma", 4).alias("mean_luma")
    )


MULTIMODAL_IMAGE_STATS_SQL = """
SELECT doc_id AS media_id,
       CAST(length(text) % 640 + 16 AS INT) AS width,
       CAST(length(text) % 480 + 16 AS INT) AS height,
       -- ok-round: power-of-two denominator (/16) — exact at 6 dp
       round(list_sum(list_transform(range(0, 16),
             i -> ('0x' || substr(md5(text), CAST(i*2+1 AS INT), 2))::BIGINT)) / 16.0,
             4) AS mean_luma
FROM documents
WHERE doc_id % 3 = 0
"""


# Deduplication -----------------------------------------------------------


def dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window dedup: keep one canonical row per (source, lang) — the
    'one doc per key' pattern (canonical page per URL, newest snapshot
    per path). row_number over a deterministic order, rank-1 survivor;
    one shuffle on the dedup key."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source", "lang").orderBy(F.asc("doc_id"))
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("source", "lang", F.col("doc_id").alias("kept_doc_id"), "n_chars")
    )


DEDUP_KEEP_FIRST_SQL = """
SELECT source, lang, doc_id AS kept_doc_id, n_chars
FROM (SELECT *, row_number() OVER (PARTITION BY source, lang
                                   ORDER BY doc_id ASC) AS rn
      FROM documents)
WHERE rn = 1
"""


def docs_training_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship LLM-data-prep pipeline as ONE declarative plan:
    exact-dedup (keep first) -> quality gate (length, punctuation
    ratio, token floor) -> per-(source, lang) mix statistics.

    This is the composition a training-data pipeline actually runs —
    expressed as a single DataFrame so Catalyst fuses it: the dedup
    window and the final agg are the only two shuffles; tokenization
    runs once per surviving row inside the same stage as the quality
    filters (no materialization between "steps"). At 100 TB: the dedup
    shuffle keys on the text hash (uniform), the agg on
    (source, lang) — tiny; everything between is map-side.
    """
    from pyspark.sql import Window

    d = spread(load_table(spark, sf_dir, "documents"))
    surv = (
        d.withColumn("_h", F.md5(T.norm_text(F.col("text"))))
        .withColumn(
            "_rn",
            F.row_number().over(Window.partitionBy("_h").orderBy("doc_id")),
        )
        .filter(F.col("_rn") == 1)
    )
    staged = surv.withColumn("_n_tok", F.size(T.words(F.col("text"))).cast("long"))
    gated = staged.filter(
        (F.col("n_chars") >= 200)
        & (T.punct_ratio(F.col("text")) < 0.2)
        & (F.col("_n_tok") >= 30)
    )
    return gated.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_n_tok").alias("total_tokens"),
        F.round(F.avg("n_chars"), 2).alias("avg_chars"),
    )


DOCS_TRAINING_MIX_SQL = rf"""
WITH surv AS (
    SELECT *, row_number() OVER (
        PARTITION BY md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))
        ORDER BY doc_id) AS rn
    FROM documents
), staged AS (
    SELECT source, lang, n_chars,
           CAST(len({_WS}) AS BIGINT) AS n_tok,
           CASE WHEN length(text) > 0
                THEN CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE)
                     / length(text)
                ELSE 0.0 END AS pr
    FROM surv WHERE rn = 1
)
SELECT source, lang, count(*) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS total_tokens,
       round(avg(n_chars), 2) AS avg_chars
FROM staged
WHERE n_chars >= 200 AND pr < 0.2 AND n_tok >= 30
GROUP BY source, lang
"""


def docs_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted Bernoulli sample: include a doc iff
    ``u32(md5(doc_id)) < n_chars * SCALE`` — inclusion probability
    proportional to its weight (here length, standing in for a quality
    score when up/down-sampling a training mix).

    Fully INTEGER comparison: unlike Efraimidis-Spirakis keys
    (``u^(1/w)``), no transcendental math whose last-ulp could differ
    between engines — the same rows are selected on Spark, DuckDB, or
    anything else that can md5. Embarrassingly parallel (no shuffle at
    all before the tiny per-source rollup), reproducible across runs,
    partitionings, and cluster sizes — the properties a 100 TB
    sampling step must have for auditable training-data lineage.
    """
    d = load_table(spark, sf_dir, "documents")
    u32 = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
        "long"
    )
    scale = 4_000_000  # n_chars ~ 1e3 -> p ~ n_chars * 4e6 / 2^32 ~ 0.1%-scale per char
    return (
        d.filter(u32 < F.col("n_chars") * scale)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("n_chars").alias("sampled_chars"),
            F.min("doc_id").alias("first_doc_id"),
        )
    )


DOCS_WEIGHTED_SAMPLE_SQL = """
SELECT source, count(*) AS n_sampled,
       CAST(sum(n_chars) AS BIGINT) AS sampled_chars,
       CAST(min(doc_id) AS BIGINT) AS first_doc_id
FROM documents
WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
      < n_chars * 4000000
GROUP BY source
"""


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.exact_dedup(load_table(spark, sf_dir, "documents"))


DEDUP_EXACT_SQL = r"""
SELECT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS text_hash,
       CAST(min(doc_id) AS BIGINT) AS canonical_doc_id,
       count(*) AS n_copies
FROM documents
GROUP BY 1
"""


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRIMARY n-gram Jaccard path: doc-frequency cap (df ≤ 50)
    engaged by default — one stop-shingle in 1M docs would otherwise
    produce C(1M,2) join rows; the cap bounds per-shingle fan-out at
    C(50,2) (see operators/dedup.py ngram_jaccard_pairs). Oracle
    applies the identical cap, so the result is exact w.r.t. the
    capped shingle set. The uncapped twin stays registered as
    dedup_ngram_jaccard_exact for small corpora."""
    return D.ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"), n=3, top_k=50, max_doc_freq=50
    )


def dedup_ngram_jaccard_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncapped exact Jaccard — quadratic per-shingle fan-out; small
    corpora only (the docstring bound argument in operators/dedup.py
    explains why this cannot headline at 100 TB)."""
    return D.ngram_jaccard_pairs(load_table(spark, sf_dir, "documents"), n=3, top_k=50)


DEDUP_JACCARD_EXACT_SQL = f"""
WITH sh AS ({_duck_shingles(3)}),
shf AS (SELECT doc_id, sh FROM sh WHERE len(sh) > 0),
ex AS (SELECT doc_id, unnest(sh) AS shingle FROM shf),
shared AS (
    SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS ns
    FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2
),
sizes AS (SELECT doc_id, len(sh) AS n FROM shf)
SELECT da AS doc_id_a, db AS doc_id_b,
       CAST((ns * 1000000) // (na.n + nb.n - ns) AS DOUBLE) / 1000000.0
           AS jaccard
FROM shared
JOIN sizes na ON da = na.doc_id
JOIN sizes nb ON db = nb.doc_id
ORDER BY CAST(ns AS DOUBLE) / (na.n + nb.n - ns) DESC, da ASC, db ASC
LIMIT 50
"""


DEDUP_JACCARD_SQL = f"""
WITH sh AS ({_duck_shingles(3)}),
shf AS (SELECT doc_id, sh FROM sh WHERE len(sh) > 0),
ex AS (SELECT doc_id, unnest(sh) AS shingle FROM shf),
dfreq AS (SELECT shingle, count(*) AS df FROM ex GROUP BY 1),
exc AS (SELECT ex.doc_id, ex.shingle FROM ex JOIN dfreq USING (shingle) WHERE df <= 50),
shared AS (
    SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS ns
    FROM exc a JOIN exc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2
),
sizes AS (SELECT doc_id, len(sh) AS n FROM shf)
SELECT da AS doc_id_a, db AS doc_id_b,
       CAST((ns * 1000000) // (na.n + nb.n - ns) AS DOUBLE) / 1000000.0
           AS jaccard
FROM shared
JOIN sizes na ON da = na.doc_id
JOIN sizes nb ON db = nb.doc_id
ORDER BY CAST(ns AS DOUBLE) / (na.n + nb.n - ns) DESC, da ASC, db ASC
LIMIT 50
"""


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.minhash_lsh_pairs(
        load_table(spark, sf_dir, "documents"), n=3, num_hashes=12, bands=6
    )


_MH_PARAMS_SQL = "[" + ", ".join(
    f"[{a}::BIGINT, {b}::BIGINT]" for a, b in (T.mh_params(k) for k in range(12))
) + "]"

DEDUP_MINHASH_SQL = f"""
WITH sh AS ({_duck_shingles(3)}),
shf AS (SELECT doc_id, sh FROM sh WHERE len(sh) > 0),
hs AS (
    SELECT doc_id,
           list_transform(sh, s -> ('0x' || substr(md5(s), 1, 8))::BIGINT) AS hs
    FROM shf
),
sig AS (
    SELECT doc_id,
           list_transform({_MH_PARAMS_SQL}, p ->
               list_aggregate(list_transform(hs, h -> (p[1] * h + p[2]) % {T.MINHASH_PRIME}), 'min')) AS sig
    FROM hs
),
bands AS (SELECT doc_id, sig, unnest(range(0, 6)) AS band FROM sig),
keys AS (
    SELECT doc_id, sig, band,
           md5(array_to_string(list_transform(sig[band*2+1:band*2+2],
                                              x -> CAST(x AS VARCHAR)), '|')) AS key
    FROM bands
),
cand AS (
    SELECT DISTINCT a.doc_id AS da, b.doc_id AS db, a.sig AS sa, b.sig AS sb
    FROM keys a JOIN keys b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
)
SELECT da AS doc_id_a, db AS doc_id_b,
       CAST((list_sum(list_transform(range(1, 13),
             i -> CASE WHEN sa[i] = sb[i] THEN 1 ELSE 0 END)) * 1000000)
            // 12 AS DOUBLE) / 1000000.0 AS est_jaccard
FROM cand
"""


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS: connected components over the MinHash-LSH
    candidate pairs (iterative min-label propagation — the step that
    turns pairwise dedup into 'keep one canonical doc per group').
    Oracle: DuckDB recursive-CTE transitive closure over the same
    pairs."""
    pairs = D.minhash_lsh_pairs(load_table(spark, sf_dir, "documents"))
    cc = D.connected_components(pairs)
    return cc.select(F.col("node").alias("doc_id"), "cluster_id")


_MINHASH_PAIRS_BODY = DEDUP_MINHASH_SQL.split("SELECT da AS doc_id_a")[0]

DEDUP_CLUSTERS_SQL = (
    _MINHASH_PAIRS_BODY.replace("WITH sh AS", "WITH RECURSIVE sh AS", 1)
    + """,
edges AS (SELECT da AS a, db AS b FROM cand
          UNION SELECT db AS a, da AS b FROM cand),
reach(node, r) AS (
    SELECT a, a FROM edges
    UNION
    SELECT reach.node, e.b FROM reach JOIN edges e ON reach.r = e.a
)
SELECT node AS doc_id, min(r) AS cluster_id FROM reach GROUP BY node
"""
)


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.simhash_pairs(load_table(spark, sf_dir, "documents"), n=3, max_hamming=3)


DEDUP_SIMHASH_SQL = f"""
WITH sh AS ({_duck_shingles(3)}),
shf AS (SELECT doc_id, sh FROM sh WHERE len(sh) > 0),
hs AS (SELECT doc_id, list_transform(sh, s -> ('0x' || substr(md5(s), 1, 8))::BIGINT) AS hs FROM shf),
sim AS (
    SELECT doc_id,
           list_sum(list_transform(range(0, 32), j ->
               CASE WHEN list_sum(list_transform(hs, h ->
                        CASE WHEN (h // (1::BIGINT << j)) % 2 = 1 THEN 1 ELSE -1 END)) >= 0
                    THEN (1::BIGINT << j) ELSE 0::BIGINT END)) AS simhash
    FROM hs
)
SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM sim a JOIN sim b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""


# Similarity search -------------------------------------------------------


def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.cosine_topk(load_table(spark, sf_dir, "embeddings"), query_ids_below=10, k=5)


_DOT = "list_sum(list_transform(range(1, 65), i -> {a}[i] * {b}[i]))"

ANN_TOPK_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
b AS (SELECT vec_id AS neighbor_id, v AS bv FROM e WHERE vec_id >= 10),
s AS (
    SELECT query_id, neighbor_id,
           {_DOT.format(a='qv', b='bv')} /
           (sqrt({_DOT.format(a='qv', b='qv')}) * sqrt({_DOT.format(a='bv', b='bv')})) AS sim
    FROM b, q
),
r AS (
    SELECT query_id, neighbor_id, sim,
           row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
    FROM s
)
SELECT query_id, neighbor_id, round(sim, 6) AS sim, CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= 5
"""


def embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-path near-dup: sign-LSH banding → band equi-join under the
    band-bucket cap (``bucket_cap=50``) → exact cosine verify. Pairs
    generate only when the lower-id member ranks ≤50 in its
    (band, key) bucket, bounding per-bucket fan-out to cap·|bucket|
    (linear in bucket size) while every member keeps its link to the
    bucket's representatives — so CC-based dedup downstream still
    collapses every flood. The cap is the DEFAULT since r7: the
    uncapped banding measured 7.4–20.6× wall at the mirror-heavy 10×
    rehearsal (pair count quadratic in replica density) and is demoted
    to ``embedding_neardup_uncapped`` (the ``_exact`` precedent).
    Oracle mirrors the rank CTE exactly; capped ⊆ uncapped and the
    surviving pair set is pinned on planted floods in
    tests/test_ann.py. Brute force stays registered as
    embedding_neardup_exact."""
    return S.banded_neardup_pairs(
        load_table(spark, sf_dir, "embeddings"),
        threshold=0.35, bands=8, rows_per_band=8, dim=64, bucket_cap=50,
    )


def embedding_neardup_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WIDE-band near-dup: the capped banding with 16-bit band keys
    (rows_per_band=16, 128 planes) — the documented replica-dense-
    scale default (r8 verdict #3 / NEARDUP_WIDEBAND_PROBE.json:
    9.2 s vs 95.4 s cold-default at sf1, 92k of 137k pairs kept,
    TRUE-duplicate recall 1.0 pinned in tests/test_ann.py —
    identical vectors share every band at any width, so floods stay
    connected; the narrower buckets shed only the low-cosine random
    collisions that dominate the default's 195× mirror-pair verify
    volume). A petabyte corpus floods 8-bit buckets by pigeonhole
    (only 256 keys per band); 16-bit keys give 65,536 — the knob the
    banded_neardup_pairs docstring reserves for exactly this scale.
    Oracle mirrors the 128-plane banding (portable plane literals)."""
    return S.banded_neardup_pairs(
        load_table(spark, sf_dir, "embeddings"),
        threshold=0.35, bands=8, rows_per_band=16, dim=64, bucket_cap=50,
    )


def embedding_neardup_uncapped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The banding WITHOUT the bucket cap: band-collide ∩ cosine≥t,
    every colliding pair materialized. Complete pair lists for
    small/moderate duplication density; at replica-dense corpora the
    pair count grows quadratically with flood size (20.6× wall at the
    mirror-heavy 10× rehearsal), which is why the capped plan owns the
    primary ``embedding_neardup`` name since r7. Deterministic for the
    fixed md5-derived plane family — the oracle replicates the
    IDENTICAL banding (portable plane literals)."""
    return S.banded_neardup_pairs(
        load_table(spark, sf_dir, "embeddings"),
        threshold=0.35, bands=8, rows_per_band=8, dim=64,
    )



def embedding_neardup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force O(n²) twin — the correctness baseline the banded
    operator's recall is pinned against (tests/test_ann.py). Not the
    100 TB path; registered for oracle parity on small SFs."""
    return S.cosine_neardup_pairs(load_table(spark, sf_dir, "embeddings"), threshold=0.35)


EMBEDDING_NEARDUP_EXACT_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
s AS (
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           {_DOT.format(a='a.v', b='b.v')} /
           (sqrt({_DOT.format(a='a.v', b='a.v')}) * sqrt({_DOT.format(a='b.v', b='b.v')})) AS sim
    FROM e a JOIN e b ON a.vec_id < b.vec_id
)
SELECT id_a, id_b, round(sim, 6) AS sim
FROM s WHERE sim >= CAST(0.35 AS DOUBLE)
"""


def _planes_values_sql(dim: int, planes: int) -> str:
    """The Spark-side hyperplane family as a DuckDB VALUES block —
    identical Python-float literals, so both engines sign-test against
    bit-identical planes."""
    mat = S.hyperplane_matrix(dim, planes)
    return ",\n".join(
        f"({p}, [{', '.join(repr(c) for c in comps)}]::DOUBLE[])"
        for p, comps in enumerate(mat)
    )


# band_key bit r of band b comes from plane b·rows+r — pid//rows
# groups, 1<<(pid%rows) weights, matching banded_neardup_pairs exactly
def _banded_neardup_body(
    bucket_cap: int | None = None, rows_per_band: int = 8
) -> str:
    """CTE chain ``e → planes → bit → sig → cand → s`` — the oracle
    twin of ``similarity.banded_neardup_pairs``. ``bucket_cap``
    mirrors the operator's (band_id, band_key) bucket cap: a pair is
    generated only if its LOWER-id member ranks ≤ cap in the bucket's
    id order (row_number CTE, the deterministic id order both engines
    share) — per-bucket fan-out ≤ cap·|bucket|, connectivity to the
    representatives preserved. The ``len(embedding) = 64`` predicate
    mirrors the operator's r8 size(v) = dim pre-filter (malformed
    rows never enter the signature stream in either engine); the
    NOT-isnan predicate mirrors the operator's r9 NaN pre-filter
    (NaN >= t is TRUE in both engines, so a NaN cosine would pass
    the verify — and the two engines banded NaN rows differently).
    isnan(NULL) is false/NULL in both, so NULL-element rows survive
    the filter identically and die at the NULL verify dot."""
    if bucket_cap is None:
        cand = """cand AS (
    SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
    FROM sig a JOIN sig b ON a.band_id = b.band_id AND a.band_key = b.band_key
                         AND a.vec_id < b.vec_id
)"""
    else:
        cand = f"""sigc AS (
    SELECT vec_id, band_id, band_key,
           row_number() OVER (PARTITION BY band_id, band_key
                              ORDER BY vec_id) AS rnk
    FROM sig
),
cand AS (
    SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
    FROM sigc a JOIN sig b ON a.band_id = b.band_id AND a.band_key = b.band_key
                          AND a.vec_id < b.vec_id
    WHERE a.rnk <= {bucket_cap}
)"""
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
           WHERE len(embedding) = 64
             AND NOT list_contains(
                     list_transform(embedding, x -> isnan(x)), true)),
planes(pid, pv) AS (VALUES
{_planes_values_sql(64, 8 * rows_per_band)}
),
bit AS (
    SELECT e.vec_id, p.pid,
           CASE WHEN {_DOT.format(a='p.pv', b='e.v')} >= 0
                THEN CAST(1 << (p.pid % {rows_per_band}) AS BIGINT) ELSE 0 END AS contrib
    FROM e CROSS JOIN planes p
),
sig AS (
    SELECT vec_id, pid // {rows_per_band} AS band_id, SUM(contrib) AS band_key
    FROM bit GROUP BY vec_id, pid // {rows_per_band}
),
{cand},
s AS (
    SELECT c.id_a, c.id_b,
           {_DOT.format(a='ea.v', b='eb.v')} /
           (sqrt({_DOT.format(a='ea.v', b='ea.v')}) * sqrt({_DOT.format(a='eb.v', b='eb.v')})) AS sim
    FROM cand c JOIN e ea ON ea.vec_id = c.id_a JOIN e eb ON eb.vec_id = c.id_b
)"""


EMBEDDING_NEARDUP_SQL = (
    _banded_neardup_body(bucket_cap=50)
    + """
SELECT id_a, id_b, round(sim, 6) AS sim
FROM s WHERE sim >= CAST(0.35 AS DOUBLE)
"""
)

EMBEDDING_NEARDUP_UNCAPPED_SQL = (
    _banded_neardup_body()
    + """
SELECT id_a, id_b, round(sim, 6) AS sim
FROM s WHERE sim >= CAST(0.35 AS DOUBLE)
"""
)

EMBEDDING_NEARDUP_WIDE_SQL = (
    _banded_neardup_body(bucket_cap=50, rows_per_band=16)
    + """
SELECT id_a, id_b, round(sim, 6) AS sim
FROM s WHERE sim >= CAST(0.35 AS DOUBLE)
"""
)


# ann_lsh_bucketed: same portable-plane trick upgrades it from
# rows-only to a full value-hash oracle (single 8-bit bucket, 8 planes)
ANN_LSH_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
planes(pid, pv) AS (VALUES
{_planes_values_sql(64, 8)}
),
bit AS (
    SELECT e.vec_id, p.pid,
           CASE WHEN {_DOT.format(a='p.pv', b='e.v')} >= 0
                THEN CAST(1 << p.pid AS BIGINT) ELSE 0 END AS contrib
    FROM e CROSS JOIN planes p
),
sig AS (SELECT vec_id, SUM(contrib) AS bucket FROM bit GROUP BY vec_id),
q AS (
    SELECT e.vec_id AS query_id, e.v AS qv, s.bucket AS qb
    FROM e JOIN sig s USING (vec_id) WHERE e.vec_id < 10
),
b AS (
    SELECT e.vec_id AS neighbor_id, e.v AS bv, s.bucket AS bb
    FROM e JOIN sig s USING (vec_id) WHERE e.vec_id >= 10
),
s AS (
    SELECT query_id, neighbor_id,
           {_DOT.format(a='qv', b='bv')} /
           (sqrt({_DOT.format(a='qv', b='qv')}) * sqrt({_DOT.format(a='bv', b='bv')})) AS sim
    FROM b JOIN q ON bb = qb
),
r AS (
    SELECT query_id, neighbor_id, sim,
           row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
    FROM s
)
SELECT query_id, neighbor_id, round(sim, 6) AS sim, CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= 5
"""


def text_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub stage: emails → <EMAIL>, URLs → <URL>, phone-shaped
    numbers → <PHONE>. The corpus has no PII, so the query plants a
    deterministic contact line per doc (same expression in the oracle)
    and scrubs it — exercising the real regex chain on real matches.
    Pure codegen'd regexp_replace; at 100 TB this is a narrow map."""
    d = load_table(spark, sf_dir, "documents")
    key = F.col("doc_id").cast("string")
    synth = F.concat(
        F.lit("reach "), F.col("source"), key, F.lit("@mail.example.com or https://"),
        F.col("source"), F.lit(".example.com/d/"), key,
        F.lit(" call 415-555-0137 re: "), F.col("text"),
    )
    return d.select(
        "doc_id",
        T.redact_pii(synth).alias("redacted"),
        T.url_count(synth).alias("n_urls"),
        T.first_url(synth).alias("first_url"),
    )


TEXT_REDACT_SQL = r"""
WITH synth AS (
    SELECT doc_id,
           concat('reach ', source, CAST(doc_id AS VARCHAR),
                  '@mail.example.com or https://', source, '.example.com/d/',
                  CAST(doc_id AS VARCHAR), ' call 415-555-0137 re: ', text) AS s
    FROM documents
)
SELECT doc_id,
       regexp_replace(regexp_replace(regexp_replace(s,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
           'https?://[^\s]+', '<URL>', 'g'),
           '\d{3}[-.]\d{3}[-.]\d{4}', '<PHONE>', 'g')             AS redacted,
       CAST(len(regexp_extract_all(s, 'https?://[^\s]+')) AS BIGINT) AS n_urls,
       coalesce(regexp_extract(s, 'https?://[^\s]+'), '')           AS first_url
FROM synth
"""


def ann_ivf_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-path ANN #2 (IVF-flat cells, multi-probe). No SQL oracle
    (argmin cell assignment isn't portably expressible without the
    whole pipeline); driver records rows-only, tests pin recall vs
    brute force."""
    return S.ivf_ann(load_table(spark, sf_dir, "embeddings"), query_ids_below=10, k=5)


def ann_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-path ANN #3 (int8 scalar quantization coarse pass + exact
    re-rank on k*4 candidates). No SQL oracle (rounding-noise ranking
    isn't bit-portable); driver records rows-only, tests pin recall —
    near-1.0 since only int8 rounding separates it from brute force."""
    return S.quantized_topk(load_table(spark, sf_dir, "embeddings"), query_ids_below=10, k=5)


def ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-path ANN (LSH buckets). Full value-hash oracle: the
    md5-derived hyperplanes are driver-side Python literals, so the
    identical plane matrix is embedded in the DuckDB SQL (ANN_LSH_SQL)
    and both engines bucket bit-identically. Recall vs brute force
    additionally pinned in tests/test_ann.py."""
    return S.lsh_ann(load_table(spark, sf_dir, "embeddings"), query_ids_below=10, k=5)


# Training-data hygiene ops (round 2) -------------------------------------


def decontaminate_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing ≥1 distinct
    3-gram with the eval set (docs with doc_id % 97 == 0 stand in for a
    held-out benchmark; real pipelines use 8-13 grams — the synthetic
    corpus' short vocab makes 3 the meaningful width). The standard
    pre-training hygiene pass.

    100 TB shape: eval-side distinct shingles are benchmark-scale (MBs)
    → broadcast to the train-shingle stream; no shuffle of the corpus.
    Output = contaminated doc ids with their hit count (downstream
    anti-joins this against the corpus)."""
    from pyspark.sql.functions import broadcast

    d = load_table(spark, sf_dir, "documents")
    ev = d.filter(F.col("doc_id") % 97 == 0)
    tr = d.filter(F.col("doc_id") % 97 != 0)
    ev_sh = D._exploded_shingles(ev, "doc_id", "text", 3).select("s").distinct()
    tr_sh = D._exploded_shingles(tr, "doc_id", "text", 3)
    return (
        tr_sh.join(broadcast(ev_sh), "s")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hit_ngrams"))
    )


DECONTAMINATE_SQL = f"""
WITH sh AS ({_duck_shingles(3)}),
ex AS (SELECT doc_id, unnest(sh) AS s FROM sh),
ev AS (SELECT DISTINCT s FROM ex WHERE doc_id % 97 = 0),
tr AS (SELECT doc_id, s FROM ex WHERE doc_id % 97 <> 0)
SELECT tr.doc_id, count(*) AS n_hit_ngrams
FROM tr JOIN ev USING (s)
GROUP BY tr.doc_id
"""


def doc_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition ratio: 1 − distinct/total 3-grams —
    the spam/boilerplate signal quality filters threshold on. Pure
    column math (no explode, no shuffle): a narrow map at any scale."""
    d = load_table(spark, sf_dir, "documents")
    ws = T.words(F.col("text"))
    s = spread(d).select(
        "doc_id",
        F.greatest(F.size(ws) - F.lit(2), F.lit(0)).cast("long").alias("n_total"),
        F.size(F.array_distinct(T.word_ngrams(ws, 3))).cast("long").alias("n_distinct"),
    )
    return s.select(
        "doc_id",
        "n_total",
        "n_distinct",
        # r9 conversion (wave 3): 1 − d/t = (t − d)/t — truncating
        # integer division at 6 dp
        F.when(
            F.col("n_total") > 0,
            F.expr("((n_total - n_distinct) * 1000000) div n_total")
            .cast("double") / 1e6,
        )
        .otherwise(F.lit(0.0))
        .alias("rep_ratio"),
    )


DOC_REPETITION_SQL = f"""
WITH t AS (SELECT doc_id, {_WS} AS ws FROM documents),
c AS (
    SELECT doc_id,
           CAST(greatest(len(ws) - 2, 0) AS BIGINT) AS n_total,
           CAST(CASE WHEN len(ws) >= 3
                     THEN len(list_distinct(list_transform(range(1, len(ws) - 1),
                              i -> array_to_string(ws[i:i+2], ' '))))
                     ELSE 0 END AS BIGINT) AS n_distinct
    FROM t
)
SELECT doc_id, n_total, n_distinct,
       CASE WHEN n_total > 0
            THEN CAST(((n_total - n_distinct) * 1000000) // n_total
                      AS DOUBLE) / 1000000.0
            ELSE 0.0 END AS rep_ratio
FROM c
"""


def paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document (fragment-level) dedup: fragment each doc, hash the
    fragment, group — repeated fragments surface as (frag_hash,
    canonical doc, copies, distinct docs). The finer-grained twin of
    dedup_exact: boilerplate repeats at fragment level while full docs
    differ. In real corpora the fragmenter splits on newlines or
    sentence boundaries; the synthetic corpus is delimiter-free, so
    fragments are fixed 4-token windows (the same chunk-level dedup
    contract, deterministic either way). One shuffle on a uniform hash
    key — scales like dedup_exact."""
    W = 4
    d = load_table(spark, sf_dir, "documents")
    ws = T.words(F.col("text"))
    chunks = F.transform(
        F.sequence(F.lit(0), F.ceil(F.size(ws) / F.lit(float(W))).cast("int") - 1),
        lambda i: F.array_join(F.slice(ws, i * W + 1, W), " "),
    )
    frags = (
        spread(d)
        .select("doc_id", F.explode_outer(chunks).alias("frag"))
        .filter(F.col("frag").isNotNull() & (F.col("frag") != ""))
        .select("doc_id", F.md5(F.col("frag")).alias("frag_hash"))
    )
    return (
        frags.groupBy("frag_hash")
        .agg(
            F.min("doc_id").cast("long").alias("canonical_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .filter(F.col("n_copies") > 1)
    )


PARAGRAPH_DEDUP_SQL = f"""
WITH ws AS (SELECT doc_id, {_WS} AS ws FROM documents),
fr AS (
    SELECT doc_id,
           unnest(list_transform(range(0, CAST(ceil(len(ws) / 4.0) AS INT)),
                                 i -> array_to_string(ws[i*4+1 : i*4+4], ' '))) AS frag
    FROM ws
),
h AS (
    SELECT doc_id, md5(frag) AS frag_hash
    FROM fr WHERE frag IS NOT NULL AND frag <> ''
)
SELECT frag_hash,
       CAST(min(doc_id) AS BIGINT) AS canonical_doc_id,
       count(*) AS n_copies,
       count(DISTINCT doc_id) AS n_docs
FROM h
GROUP BY frag_hash
HAVING count(*) > 1
"""


def docs_seq_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for training: concatenate docs per source in
    doc_id order and chunk into 512-token sequences — each doc gets
    (seq_id, seq_offset) from the exclusive running token sum. The
    GPT-style concat-then-chunk packing model, expressed as ONE window
    cumsum (one shuffle on source, sort within).

    100 TB note: the window runs per source partition; production
    packing keys on (source, shard/day) so window width stays bounded
    — the shape here is the per-partition plan."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    t = spread(d).select(
        "doc_id", "source", F.size(T.words(F.col("text"))).cast("long").alias("n_tokens")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("long"))
    return t.select(
        "doc_id",
        "source",
        "n_tokens",
        F.floor(cum / F.lit(512)).cast("long").alias("seq_id"),
        (cum % F.lit(512)).cast("long").alias("seq_offset"),
    )


DOCS_SEQ_PACKING_SQL = f"""
WITH t AS (
    SELECT doc_id, source, CAST(len({_WS}) AS BIGINT) AS n_tokens
    FROM documents
),
c AS (
    SELECT doc_id, source, n_tokens,
           COALESCE(SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
    FROM t
)
SELECT doc_id, source, n_tokens,
       CAST(cum // 512 AS BIGINT) AS seq_id,
       CAST(cum % 512 AS BIGINT) AS seq_offset
FROM c
"""


def docs_clean_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END training-data pipeline as ONE fused plan: exact-dedup
    (keep first) → quality gate → benchmark-decontamination anti-join →
    sequence packing. The full hygiene path a corpus actually runs
    before tokenization, declared as a single DataFrame so Catalyst
    fuses all map-side steps.

    Shuffle census at any scale: CORPUS-cardinality shuffles are the
    dedup window on md5(text) [uniform] and the packing window on
    source — two. The remaining exchanges in the audit (PLANS.md) are
    benchmark-scale: eval-shingle distinct + contaminated-id distinct
    (both bounded by the eval set's fan-out) and spread repartitions.
    The decontamination join broadcasts the eval shingle set; gate
    predicates are integer/regex tests (no float-boundary flake).
    Output: each surviving doc's (seq_id, seq_offset) training slot."""
    from pyspark.sql import Window
    from pyspark.sql.functions import broadcast

    d = spread(load_table(spark, sf_dir, "documents"))
    surv = (
        d.withColumn("_h", F.md5(T.norm_text(F.col("text"))))
        .withColumn(
            "_rn", F.row_number().over(Window.partitionBy("_h").orderBy("doc_id"))
        )
        .filter(F.col("_rn") == 1)
        .withColumn("_n_tok", F.size(T.words(F.col("text"))).cast("long"))
    )
    gated = surv.filter(
        (F.col("doc_id") % 97 != 0)  # eval docs never train
        & (F.col("n_chars") >= 200)
        & (T.punct_ratio(F.col("text")) < 0.2)
        & (F.col("_n_tok") >= 30)
    )
    ev_sh = (
        D._exploded_shingles(d.filter(F.col("doc_id") % 97 == 0), "doc_id", "text", 3)
        .select("s")
        .distinct()
    )
    tr_sh = D._exploded_shingles(d.filter(F.col("doc_id") % 97 != 0), "doc_id", "text", 3)
    contaminated = tr_sh.join(broadcast(ev_sh), "s").select("doc_id").distinct()
    clean = gated.join(contaminated, "doc_id", "left_anti")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = F.coalesce(F.sum("_n_tok").over(w), F.lit(0).cast("long"))
    return clean.select(
        "doc_id",
        "source",
        F.col("_n_tok").alias("n_tokens"),
        F.floor(cum / F.lit(512)).cast("long").alias("seq_id"),
        (cum % F.lit(512)).cast("long").alias("seq_offset"),
    )


DOCS_CLEAN_PACK_SQL = rf"""
WITH ranked AS (
    SELECT doc_id, source, text, n_chars,
           row_number() OVER (
               PARTITION BY md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))
               ORDER BY doc_id) AS rn
    FROM documents
),
surv AS (
    SELECT doc_id, source, text, n_chars,
           CAST(len({_WS}) AS BIGINT) AS n_tok
    FROM ranked WHERE rn = 1
),
gated AS (
    SELECT doc_id, source, n_tok FROM surv
    WHERE doc_id % 97 <> 0
      AND n_chars >= 200
      AND (CASE WHEN length(text) > 0
                THEN CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE) / length(text)
                ELSE CAST(0.0 AS DOUBLE) END) < 0.2
      AND n_tok >= 30
),
sh AS ({_duck_shingles(3)}),
ex AS (SELECT doc_id, unnest(sh) AS s FROM sh),
ev AS (SELECT DISTINCT s FROM ex WHERE doc_id % 97 = 0),
contam AS (SELECT DISTINCT ex.doc_id FROM ex JOIN ev USING (s) WHERE ex.doc_id % 97 <> 0),
clean AS (SELECT * FROM gated WHERE doc_id NOT IN (SELECT doc_id FROM contam)),
c AS (
    SELECT doc_id, source, n_tok,
           COALESCE(SUM(n_tok) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
    FROM clean
)
SELECT doc_id, source, n_tok AS n_tokens,
       CAST(cum // 512 AS BIGINT) AS seq_id,
       CAST(cum % 512 AS BIGINT) AS seq_offset
FROM c
"""


def embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid of the embedding space — the aggregation step
    of IVF cell training / k-means, and the class-prototype computation
    for embedding QA. One row per (label, dim).

    Float sums are partial-agg-order-dependent (same trap as q9's
    revenue), so components are quantized to exact MICRO units first:
    q = round(x·1e6) as long — engine-identical per row — and the long
    sum is order-free. The mean divides back at the end, bit-stable at
    any parallelism. Shape: posexplode (narrow) → one shuffle on
    (label, dim) with partial aggs; 64·|labels| output rows."""
    e = load_table(spark, sf_dir, "embeddings")
    ex = (
        spread(e)
        .select(
            "label",
            F.posexplode_outer(
                F.transform(F.col("embedding"), lambda x: x.cast("double"))
            ).alias("dim", "x"),
        )
        .filter(F.col("x").isNotNull())
    )
    return (
        ex.withColumn("q", F.round(F.col("x") * 1000000).cast("long"))
        .groupBy("label", "dim")
        .agg(F.count(F.lit(1)).alias("n_vectors"), F.sum("q").alias("_s"))
        .select(
            "label",
            F.col("dim").cast("long").alias("dim"),
            "n_vectors",
            # r9 conversion (wave 3): Σq/(10⁶·n) at 6 dp is the exact
            # rational (Σq div n)/10⁶ — signed truncating integer
            # division (both engines truncate toward zero)
            (F.expr("_s div n_vectors").cast("double") / 1e6).alias(
                "centroid"
            ),
        )
    )


EMBEDDING_LABEL_CENTROIDS_SQL = """
WITH ex AS (
    -- parallel unnest runs in lockstep (this DuckDB lacks WITH ORDINALITY)
    SELECT label,
           unnest(range(0, len(embedding))) AS ord,
           unnest(embedding::DOUBLE[])      AS x
    FROM embeddings
)
SELECT label, CAST(ord AS BIGINT) AS dim, count(*) AS n_vectors,
       CAST(sum(CAST(round(x * 1000000) AS BIGINT)) // count(*) AS DOUBLE)
           / 1000000.0 AS centroid
FROM ex
GROUP BY label, ord
"""


QUERIES = {
    "token_count": token_count,
    "text_quality_score": text_quality_score,
    "lang_id_heuristic": lang_id_heuristic,
    "doc_fingerprint": doc_fingerprint,
    "docs_training_mix": docs_training_mix,
    "docs_weighted_sample": docs_weighted_sample,
    "dedup_exact": dedup_exact,
    "dedup_keep_first": dedup_keep_first,
    "decontaminate_ngram": decontaminate_ngram,
    "doc_repetition_score": doc_repetition_score,
    "paragraph_dedup": paragraph_dedup,
    "docs_seq_packing": docs_seq_packing,
    "docs_clean_pack": docs_clean_pack,
    "embedding_label_centroids": embedding_label_centroids,
    "lang_id_confusion": lang_id_confusion,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_ngram_jaccard_exact": dedup_ngram_jaccard_exact,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "dedup_clusters": dedup_clusters,
    "dedup_simhash": dedup_simhash,
    "text_redact_pii": text_redact_pii,
    "docs_systematic_sample": docs_systematic_sample,
    "docs_stratified_sample": docs_stratified_sample,
    "multimodal_image_stats": multimodal_image_stats,
    "ann_cosine_topk": ann_cosine_topk,
    "embedding_neardup": embedding_neardup,
    "embedding_neardup_uncapped": embedding_neardup_uncapped,
    "embedding_neardup_wide": embedding_neardup_wide,
    "embedding_neardup_exact": embedding_neardup_exact,
    "ann_lsh_bucketed": ann_lsh_bucketed,
    "ann_ivf_bucketed": ann_ivf_bucketed,
    "ann_quantized_topk": ann_quantized_topk,
}

ORACLES = {
    "token_count": TOKEN_COUNT_SQL,
    "text_quality_score": TEXT_QUALITY_SQL,
    "lang_id_heuristic": LANG_ID_SQL,
    "doc_fingerprint": DOC_FINGERPRINT_SQL,
    "docs_training_mix": DOCS_TRAINING_MIX_SQL,
    "docs_weighted_sample": DOCS_WEIGHTED_SAMPLE_SQL,
    "dedup_exact": DEDUP_EXACT_SQL,
    "dedup_keep_first": DEDUP_KEEP_FIRST_SQL,
    "decontaminate_ngram": DECONTAMINATE_SQL,
    "doc_repetition_score": DOC_REPETITION_SQL,
    "paragraph_dedup": PARAGRAPH_DEDUP_SQL,
    "docs_seq_packing": DOCS_SEQ_PACKING_SQL,
    "docs_clean_pack": DOCS_CLEAN_PACK_SQL,
    "embedding_label_centroids": EMBEDDING_LABEL_CENTROIDS_SQL,
    "lang_id_confusion": LANG_ID_CONFUSION_SQL,
    "dedup_ngram_jaccard": DEDUP_JACCARD_SQL,
    "dedup_ngram_jaccard_exact": DEDUP_JACCARD_EXACT_SQL,
    "dedup_minhash_lsh": DEDUP_MINHASH_SQL,
    "dedup_clusters": DEDUP_CLUSTERS_SQL,
    "dedup_simhash": DEDUP_SIMHASH_SQL,
    "text_redact_pii": TEXT_REDACT_SQL,
    "docs_systematic_sample": DOCS_SYSTEMATIC_SAMPLE_SQL,
    "docs_stratified_sample": DOCS_STRATIFIED_SAMPLE_SQL,
    "multimodal_image_stats": MULTIMODAL_IMAGE_STATS_SQL,
    "ann_cosine_topk": ANN_TOPK_SQL,
    "embedding_neardup": EMBEDDING_NEARDUP_SQL,
    "embedding_neardup_uncapped": EMBEDDING_NEARDUP_UNCAPPED_SQL,
    "embedding_neardup_wide": EMBEDDING_NEARDUP_WIDE_SQL,
    "embedding_neardup_exact": EMBEDDING_NEARDUP_EXACT_SQL,
    "ann_lsh_bucketed": ANN_LSH_SQL,
}
