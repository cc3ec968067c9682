"""Round-7 batch I: corpus-statistics screens over the documents table
(Heaps-law growth, OOV budgeting, term burstiness, readability,
split-balance and cluster-purity QA).

Same contract as the other ``llm_ops*`` modules: declarative DataFrame
plans (JVM expressions only) with DuckDB oracles mirroring the exact
arithmetic, so value hashes match without tolerances. Fractional
reductions micro/nano-quantize each term ONCE and fold as BIGINT (the
established order-free-sum discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from distributed_file_system_with_stream_processing_spark.functions import text as T
from distributed_file_system_with_stream_processing_spark.operators._util import spread
from distributed_file_system_with_stream_processing_spark.plans.llm_ops import _WS
from distributed_file_system_with_stream_processing_spark.sources.tables import load_table

_NANO = 1_000_000_000
_MICRO = 1_000_000

# ---------------------------------------------------------------------------
# docs_heaps_curve / docs_heaps_exponent

_HEAPS_DECILES = 10


def _heaps_checkpoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(decile, cp_doc_id, cum_tokens, cum_vocab) at ID-RANGE decile
    checkpoints cpᵢ = min_id + ⌊(max_id−min_id+1)·i/10⌋ − 1 (cp₁₀ =
    max_id): cum_tokens = Σ tokens over doc_id ≤ cp, cum_vocab =
    |{tokens first seen at doc_id ≤ cp}|. Checkpoints are arithmetic
    on one (min, max) fold — NOT an order statistic — so nothing ever
    globally sorts (an ntile over the doc axis would single-partition
    billions of rows at 100 TB); first-occurrence is min(doc_id) per
    token (one shuffle) and both cumulative counts are ≤-joins against
    the 10-row broadcast (never corpus×corpus)."""
    d = spread(load_table(spark, sf_dir, "documents"))
    toks = d.select(
        "doc_id",
        F.explode_outer(T.words(F.col("text"))).alias("w"),
    ).filter(F.col("w").isNotNull())
    per_doc = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_tok"))
    bounds = d.agg(
        F.min("doc_id").alias("mn"), F.max("doc_id").alias("mx")
    )
    cps = bounds.select(
        F.explode(F.sequence(F.lit(1), F.lit(_HEAPS_DECILES))).alias("dec"),
        "mn",
        "mx",
    ).select(
        "dec",
        (
            F.col("mn")
            + F.floor(
                (F.col("mx") - F.col("mn") + 1) * F.col("dec") / _HEAPS_DECILES
            )
            - 1
        ).alias("cp"),
    )
    fo = toks.groupBy("w").agg(F.min("doc_id").alias("fo"))
    cum_tok = (
        per_doc.join(broadcast(cps), per_doc.doc_id <= cps.cp)
        .groupBy("dec", "cp")
        .agg(F.sum("n_tok").alias("cum_tokens"))
    )
    cum_voc = (
        fo.join(broadcast(cps), fo.fo <= cps.cp)
        .groupBy("dec")
        .agg(F.count(F.lit(1)).alias("cum_vocab"))
    )
    return cum_tok.join(cum_voc, "dec").select(
        F.col("dec").cast("long").alias("decile"),
        F.col("cp").cast("long").alias("cp_doc_id"),
        F.col("cum_tokens").cast("long").alias("cum_tokens"),
        F.col("cum_vocab").cast("long").alias("cum_vocab"),
    )


def docs_heaps_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-growth (Heaps-law) curve at doc_id-decile
    checkpoints — the corpus-sizing diagnostic: how fast does NEW
    vocabulary accrue as the corpus grows, the input to tokenizer
    vocab budgeting and dedup-saturation calls. Exact integer counts
    only."""
    return _heaps_checkpoints(spark, sf_dir)


_HEAPS_CTE = rf"""
WITH toks AS (
    SELECT doc_id, unnest({_WS}) AS w FROM documents
),
per_doc AS (
    SELECT doc_id, count(*) AS n_tok FROM toks GROUP BY doc_id
),
bounds AS (SELECT min(doc_id) AS mn, max(doc_id) AS mx FROM documents),
cps AS (
    SELECT dec,
           mn + CAST(floor((mx - mn + 1) * dec / {_HEAPS_DECILES}.0) AS BIGINT)
              - 1 AS cp
    FROM bounds CROSS JOIN (
        SELECT unnest(range(1, {_HEAPS_DECILES} + 1)) AS dec
    )
),
fo AS (SELECT w, min(doc_id) AS fo FROM toks GROUP BY w),
cum_tok AS (
    SELECT c.dec, c.cp, sum(p.n_tok) AS cum_tokens
    FROM per_doc p JOIN cps c ON p.doc_id <= c.cp
    GROUP BY c.dec, c.cp
),
cum_voc AS (
    SELECT c.dec, count(*) AS cum_vocab
    FROM fo f JOIN cps c ON f.fo <= c.cp
    GROUP BY c.dec
),
curve AS (
    SELECT CAST(t.dec AS BIGINT) AS decile,
           CAST(t.cp AS BIGINT) AS cp_doc_id,
           CAST(t.cum_tokens AS BIGINT) AS cum_tokens,
           CAST(v.cum_vocab AS BIGINT) AS cum_vocab
    FROM cum_tok t JOIN cum_voc v USING (dec)
)
"""

DOCS_HEAPS_CURVE_SQL = _HEAPS_CTE + "SELECT * FROM curve"


def docs_heaps_exponent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law fit V = K·N^β: OLS on (ln N, ln V) over the decile
    checkpoints — the one-row summary next to the raw curve (β well
    below 1 says vocabulary saturates; β near 1 says the corpus keeps
    minting types, e.g. ids/noise). Each ln pair micro-quantizes once
    (micro, not nano: the OLS cross-products must stay inside BIGINT);
    the 10-point OLS folds integer sums, so the fit is bit-stable."""
    c = _heaps_checkpoints(spark, sf_dir)
    lx = F.round(F.log(F.col("cum_tokens").cast("double")) * _MICRO).cast("long")
    ly = F.round(F.log(F.col("cum_vocab").cast("double")) * _MICRO).cast("long")
    q = c.filter((F.col("cum_tokens") > 0) & (F.col("cum_vocab") > 0)).select(
        lx.alias("lx"), ly.alias("ly")
    )
    s = q.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("lx").alias("sx"),
        F.sum("ly").alias("sy"),
        F.sum(F.col("lx") * F.col("ly")).alias("sxy"),
        F.sum(F.col("lx") * F.col("lx")).alias("sxx"),
    )
    n = F.col("n").cast("double")
    beta = (n * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")) / (
        n * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    )
    intercept = (F.col("sy").cast("double") / _MICRO - beta * F.col("sx") / _MICRO) / n
    # reported beta is an exact rational of the integer OLS sums,
    # truncating-divided (toward zero) in DECIMAL(38,0); k = exp(...) stays round()
    # (irrational family). The full-precision double beta still feeds
    # the intercept, matching the oracle's inline formula.
    beta6 = (
        F.expr(
            "((cast(n as decimal(38,0)) * sxy - cast(sx as decimal(38,0)) * sy)"
            " * 1000000) div (cast(n as decimal(38,0)) * sxx"
            " - cast(sx as decimal(38,0)) * sx)"
        ).cast("double")
        / 1e6
    )
    return s.select(
        F.col("n").cast("long").alias("n_points"),
        beta6.alias("beta"),
        F.round(F.exp(intercept), 6).alias("k"),
    )


DOCS_HEAPS_EXPONENT_SQL = (
    _HEAPS_CTE
    + f""",
pts AS (
    SELECT CAST(round(ln(CAST(cum_tokens AS DOUBLE)) * {_MICRO}) AS BIGINT) AS lx,
           CAST(round(ln(CAST(cum_vocab AS DOUBLE)) * {_MICRO}) AS BIGINT) AS ly
    FROM curve WHERE cum_tokens > 0 AND cum_vocab > 0
),
s AS (
    SELECT count(*) AS n, sum(lx) AS sx, sum(ly) AS sy,
           sum(lx * ly) AS sxy, sum(lx * lx) AS sxx
    FROM pts
)
SELECT CAST(n AS BIGINT) AS n_points,
       CAST(((CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy) * 1000000)
            // (CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx) AS DOUBLE)
           / 1000000.0 AS beta,
       -- ok-round: irrational (exp/ln family, no grid boundary)
       round(exp((CAST(sy AS DOUBLE) / {_MICRO}
                  - ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                     / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx))
                    * sx / {_MICRO}) / n), 6) AS k
FROM s
"""
)


# ---------------------------------------------------------------------------
# docs_oov_rate_curve

_OOV_CUTOFFS = (100, 300, 1000)


def docs_oov_rate_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary occurrence rate at fixed vocab budgets: with
    the top-N tokens by collection frequency as the vocabulary, what
    share of TOKEN OCCURRENCES fall outside it — the number a
    fixed-vocab tokenizer or embedding table is budgeted against.
    Rank ties break by token text, so the vocab set is deterministic.

    100 TB shape: one (token) partial-agg shuffle builds the cf table;
    ranking orders THAT table (vocab-scale, not corpus-scale); the
    3-row cutoff axis joins against rank ranges. No second corpus
    pass."""
    d = spread(load_table(spark, sf_dir, "documents"))
    cf = (
        d.select(F.explode_outer(T.words(F.col("text"))).alias("w"))
        .filter(F.col("w").isNotNull())
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cf"))
    )
    rk = cf.select(
        "cf",
        F.row_number()
        .over(Window.orderBy(F.col("cf").desc(), F.col("w").asc()))
        .alias("rank"),
    )
    cuts = spark.createDataFrame(
        [(c,) for c in _OOV_CUTOFFS], "cutoff long"
    )
    agg = rk.crossJoin(broadcast(cuts)).groupBy("cutoff").agg(
        F.sum("cf").alias("total_occurrences"),
        F.sum(F.when(F.col("rank") > F.col("cutoff"), F.col("cf")).otherwise(0)).alias(
            "oov_occurrences"
        ),
    )
    return agg.select(
        "cutoff",
        F.col("total_occurrences").cast("long").alias("total_occurrences"),
        F.col("oov_occurrences").cast("long").alias("oov_occurrences"),
        # exact truncating integer-division rate (r7 conversion; see
        # llm_ops21.orders_basket_size_profile — r8 fixed the ORACLE,
        # which had kept round(): masked at test SFs only because the
        # synthetic oov count is 0 there)
        (
            F.expr("(oov_occurrences * 1000000) div total_occurrences").cast(
                "double"
            )
            / 1e6
        ).alias("oov_rate"),
    )


DOCS_OOV_RATE_SQL = rf"""
WITH cf AS (
    SELECT w, count(*) AS cf FROM (
        SELECT unnest({_WS}) AS w FROM documents
    ) GROUP BY w
),
rk AS (
    SELECT cf, row_number() OVER (ORDER BY cf DESC, w ASC) AS rank FROM cf
),
cuts(cutoff) AS (VALUES {", ".join(f"({c})" for c in _OOV_CUTOFFS)})
SELECT CAST(cutoff AS BIGINT) AS cutoff,
       CAST(sum(cf) AS BIGINT) AS total_occurrences,
       CAST(sum(CASE WHEN rank > cutoff THEN cf ELSE 0 END) AS BIGINT)
           AS oov_occurrences,
       CAST((sum(CASE WHEN rank > cutoff THEN cf ELSE 0 END) * 1000000)
            // sum(cf) AS DOUBLE) / 1000000.0 AS oov_rate
FROM rk CROSS JOIN cuts
GROUP BY cutoff
"""


# ---------------------------------------------------------------------------
# docs_term_burstiness_topk

_BURST_MIN_DF = 5
_BURST_TOPK = 20


def docs_term_burstiness_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Church-Gale term burstiness: cf/df — how many times a term
    repeats within the documents it appears in at all. High-burstiness
    terms are topical/template markers (they cluster), burstiness ≈ 1
    terms sprinkle uniformly; the screen feeds stopword and boilerplate
    lists. min-df gate keeps rare-term noise out; top-k by
    (burstiness desc, cf desc, token) is fully tie-broken.

    100 TB shape: one (token) partial-agg shuffle computing cf and df
    together (count vs count-distinct-doc via a pre-distinct), then a
    top-k over the vocab-scale table."""
    d = spread(load_table(spark, sf_dir, "documents"))
    toks = d.select(
        "doc_id", F.explode_outer(T.words(F.col("text"))).alias("w")
    ).filter(F.col("w").isNotNull())
    per_doc = toks.groupBy("w", "doc_id").agg(F.count(F.lit(1)).alias("c"))
    stats = per_doc.groupBy("w").agg(
        F.sum("c").alias("cf"), F.count(F.lit(1)).alias("df")
    )
    q = stats.filter(F.col("df") >= _BURST_MIN_DF).select(
        F.col("w").alias("token"),
        F.col("cf").cast("long").alias("cf"),
        F.col("df").cast("long").alias("df"),
        (F.expr("(cf * 1000000) div df").cast("double") / 1e6).alias(
            "burstiness"
        ),
    )
    return q.orderBy(
        F.col("burstiness").desc(), F.col("cf").desc(), F.col("token").asc()
    ).limit(_BURST_TOPK)


DOCS_TERM_BURSTINESS_SQL = rf"""
WITH per_doc AS (
    SELECT w, doc_id, count(*) AS c FROM (
        SELECT doc_id, unnest({_WS}) AS w FROM documents
    ) GROUP BY w, doc_id
),
stats AS (
    SELECT w AS token, sum(c) AS cf, count(*) AS df
    FROM per_doc GROUP BY w
)
SELECT token, CAST(cf AS BIGINT) AS cf, CAST(df AS BIGINT) AS df,
       CAST((cf * 1000000) // df AS DOUBLE) / 1000000.0 AS burstiness
FROM stats WHERE df >= {_BURST_MIN_DF}
ORDER BY burstiness DESC, cf DESC, token ASC LIMIT {_BURST_TOPK}
"""


# ---------------------------------------------------------------------------
# docs_readability_proxy

_VOWEL_RE = "[aeiouy]+"


def docs_readability_proxy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch-style readability PROXY per source: vowel-group runs
    approximate syllables (the standard poor-man's syllabifier), each
    doc is treated as one sentence (the corpus has no reliable
    sentence segmentation), giving
    score = 206.835 − 1.015·(words/doc) − 84.6·(syllables/word).
    A ranking signal between sources, not an absolute grade — and a
    quality-family feature cheap enough to compute inline at 100 TB
    (scan → regexp count → per-source integer sums, zero joins).

    Exactness: syllable counts are exact integers
    (regexp_extract_all), the three ratios divide integer sums once.
    """
    d = spread(load_table(spark, sf_dir, "documents"))
    ws = T.words(F.col("text"))
    syl = F.aggregate(
        F.transform(
            ws, lambda w: F.size(F.regexp_extract_all(F.lower(w), F.lit(_VOWEL_RE), 0))
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    per = d.select(
        "source",
        F.size(ws).cast("long").alias("n_words"),
        syl.alias("n_syll"),
    ).groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_words").alias("tw"),
        F.sum("n_syll").alias("ts"),
    )
    awpd = F.col("tw").cast("double") / F.col("n_docs")
    aspw = F.when(F.col("tw") > 0, F.col("ts").cast("double") / F.col("tw")).otherwise(
        F.lit(0.0)
    )
    # reported ratios are exact truncating integer-division quotients (r7);
    # the flesch composite keeps the full-precision doubles (its float
    # coefficients make it irrational-family, like sqrt/log sites)
    awpd4 = F.expr("(tw * 10000) div n_docs").cast("double") / 1e4
    aspw4 = F.when(
        F.col("tw") > 0, F.expr("(ts * 10000) div tw").cast("double") / 1e4
    ).otherwise(F.lit(0.0))
    return per.select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        awpd4.alias("avg_words_per_doc"),
        aspw4.alias("avg_syllables_per_word"),
        F.round(F.lit(206.835) - F.lit(1.015) * awpd - F.lit(84.6) * aspw, 4).alias(
            "flesch_proxy"
        ),
    )


DOCS_READABILITY_SQL = rf"""
WITH per AS (
    SELECT source,
           CAST(len(ws) AS BIGINT) AS n_words,
           CAST(list_sum(list_transform(ws,
                w -> len(regexp_extract_all(lower(w), '{_VOWEL_RE}'))))
                AS BIGINT) AS n_syll
    FROM (SELECT source, {_WS} AS ws FROM documents)
),
agg AS (
    SELECT source, count(*) AS n_docs, sum(n_words) AS tw,
           coalesce(sum(n_syll), 0) AS ts
    FROM per GROUP BY source
)
SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
       CAST((tw * 10000) // n_docs AS DOUBLE) / 10000.0 AS avg_words_per_doc,
       CASE WHEN tw > 0 THEN CAST((ts * 10000) // tw AS DOUBLE) / 10000.0
            ELSE CAST(0.0 AS DOUBLE) END AS avg_syllables_per_word,
       -- ok-round: irrational (float-coefficient flesch composite)
       round(206.835 - 1.015 * (CAST(tw AS DOUBLE) / n_docs)
             - 84.6 * (CASE WHEN tw > 0 THEN CAST(ts AS DOUBLE) / tw
                            ELSE CAST(0.0 AS DOUBLE) END), 4) AS flesch_proxy
FROM agg
"""


# ---------------------------------------------------------------------------
# docs_source_concentration_by_lang

def docs_source_concentration_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per language: exact Gini of the doc-count distribution across
    sources — does a language's data come from a broad source mix or
    one dominant crawl (the diversity check run before per-language
    temperature mixing). Exact rank-sum Gini over the tiny
    (lang, source) census: G = 2·Σ i·cᵢ / (n·Σc) − (n+1)/n with counts
    ascending, ties broken by source name. Integer sums only; one
    shuffle to the census, window over ≤|sources| rows per lang."""
    d = load_table(spark, sf_dir, "documents")
    cell = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("lang").orderBy(F.col("c").asc(), F.col("source").asc())
    ranked = cell.select("lang", "c", F.row_number().over(w).alias("i"))
    agg = ranked.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_sources"),
        F.sum("c").alias("tot"),
        F.sum(F.col("i") * F.col("c")).alias("ic"),
    )
    # G = (2·ic − (n+1)·tot)/(n·tot): ONE exact rational, truncating-divided (toward zero)
    # at 6 dp in DECIMAL(38,0) (r7 conversion — headroom past BIGINT at
    # corpus scale)
    gini = (
        F.expr(
            "((2 * cast(ic as decimal(38,0)) - (n_sources + 1) * tot)"
            " * 1000000) div (cast(n_sources as decimal(38,0)) * tot)"
        ).cast("double")
        / 1e6
    )
    return agg.select(
        "lang",
        F.col("n_sources").cast("long").alias("n_sources"),
        F.col("tot").cast("long").alias("n_docs"),
        gini.alias("gini"),
    )


DOCS_SOURCE_CONCENTRATION_SQL = """
WITH cell AS (
    SELECT lang, source, count(*) AS c FROM documents GROUP BY lang, source
),
ranked AS (
    SELECT lang, c,
           row_number() OVER (PARTITION BY lang ORDER BY c ASC, source ASC) AS i
    FROM cell
),
agg AS (
    SELECT lang, count(*) AS n_sources, sum(c) AS tot, sum(i * c) AS ic
    FROM ranked GROUP BY lang
)
SELECT lang, CAST(n_sources AS BIGINT) AS n_sources,
       CAST(tot AS BIGINT) AS n_docs,
       CAST(((2 * CAST(ic AS HUGEINT) - (n_sources + 1) * tot) * 1000000)
            // (CAST(n_sources AS HUGEINT) * tot) AS DOUBLE) / 1000000.0
           AS gini
FROM agg
"""


QUERIES = {
    "docs_heaps_curve": docs_heaps_curve,
    "docs_heaps_exponent": docs_heaps_exponent,
    "docs_oov_rate_curve": docs_oov_rate_curve,
    "docs_term_burstiness_topk": docs_term_burstiness_topk,
    "docs_readability_proxy": docs_readability_proxy,
    "docs_source_concentration_by_lang": docs_source_concentration_by_lang,
}

ORACLES = {
    "docs_heaps_curve": DOCS_HEAPS_CURVE_SQL,
    "docs_heaps_exponent": DOCS_HEAPS_EXPONENT_SQL,
    "docs_oov_rate_curve": DOCS_OOV_RATE_SQL,
    "docs_term_burstiness_topk": DOCS_TERM_BURSTINESS_SQL,
    "docs_readability_proxy": DOCS_READABILITY_SQL,
    "docs_source_concentration_by_lang": DOCS_SOURCE_CONCENTRATION_SQL,
}


# ---------------------------------------------------------------------------
# docs_length_band_quality

_LBQ_BAND = 100  # chars per band


def docs_length_band_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-vs-length profile: docs bucketed into fixed 100-char
    bands (arithmetic banding, NOT an order statistic — a length-decile
    ntile would global-sort the corpus), per band the doc count, mean
    token count and mean quality score. The screen that shows where a
    min/max-length filter should cut. Quality micro-quantizes per doc
    once; the band rollup is an integer fold."""
    d = spread(load_table(spark, sf_dir, "documents"))
    ws = T.words(F.col("text"))
    q_mu = F.round(
        T.quality_score(
            F.size(ws).cast("long"),
            T.stopword_ratio(ws),
            T.punct_ratio(F.col("text")),
        )
        * _MICRO
    ).cast("long")
    rows = d.select(
        F.floor(F.col("n_chars") / _LBQ_BAND).cast("long").alias("band"),
        F.size(ws).cast("long").alias("n_tok"),
        q_mu.alias("q_mu"),
    )
    agg = rows.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("tt"),
        F.sum("q_mu").alias("tq"),
    )
    return agg.select(
        "band",
        (F.col("band") * _LBQ_BAND).cast("long").alias("chars_lo"),
        F.col("n_docs").cast("long").alias("n_docs"),
        (F.expr("(tt * 10000) div n_docs").cast("double") / 1e4).alias(
            "avg_tokens"
        ),
        (F.expr("tq div n_docs").cast("double") / _MICRO).alias(
            "avg_quality"
        ),
    )


_QUALITY_MU_CTE = rf"""
q AS (
    SELECT doc_id,
           CAST(len(ws) AS BIGINT) AS n_tok,
           -- the llm_ops text_quality_score twin, identical fold —
           -- ok-round: float-coefficient quality composite
           CAST(round(least(CAST(1.0 AS DOUBLE), greatest(CAST(0.0 AS DOUBLE),
                CAST(0.25 AS DOUBLE) + CAST(0.002 AS DOUBLE) * len(ws)
                + CAST(1.2 AS DOUBLE) *
                  (CASE WHEN len(ws) > 0
                        THEN CAST(len(list_filter(ws, x -> list_contains(
                             ['the','a','and','of','to','in','is'], lower(x))))
                             AS DOUBLE) / len(ws)
                        ELSE CAST(0.0 AS DOUBLE) END)
                - CAST(3.0 AS DOUBLE) *
                  (CASE WHEN length(text) > 0
                        THEN CAST(length(text) - length(regexp_replace(text,
                             '[.,!?;:]', '', 'g')) AS DOUBLE) / length(text)
                        ELSE CAST(0.0 AS DOUBLE) END)))
                * {_MICRO}) AS BIGINT) AS q_mu
    FROM (SELECT doc_id, text, {_WS} AS ws FROM documents)
)
"""

DOCS_LENGTH_BAND_QUALITY_SQL = rf"""
WITH {_QUALITY_MU_CTE},
rows_ AS (
    SELECT CAST(floor(d.n_chars / {_LBQ_BAND}.0) AS BIGINT) AS band,
           q.n_tok, q.q_mu
    FROM documents d JOIN q USING (doc_id)
),
agg AS (
    SELECT band, count(*) AS n_docs, sum(n_tok) AS tt, sum(q_mu) AS tq
    FROM rows_ GROUP BY band
)
SELECT band, CAST(band * {_LBQ_BAND} AS BIGINT) AS chars_lo,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST((tt * 10000) // n_docs AS DOUBLE) / 10000.0 AS avg_tokens,
       CAST(tq // n_docs AS DOUBLE) / {_MICRO}.0 AS avg_quality
FROM agg
"""


# ---------------------------------------------------------------------------
# docs_split_balance_audit

_SBA_TRAIN = 900  # the registered docs_train_val_split thresholds


def docs_split_balance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QA for the registered hash split (docs_train_val_split): per
    language, the train share vs the corpus-wide train share and the
    absolute deviation — the stratification audit that catches a
    skewed split BEFORE a model trains on it (a key-hash split is
    unstratified by construction; this measures how well the law of
    large numbers did). Integer counts, two divisions at the end; the
    corpus-wide share rides a 1-row broadcast."""
    d = load_table(spark, sf_dir, "documents")
    mille = T.hash32(F.concat(F.lit("split|"), F.col("doc_id"))) % 1000
    rows = d.select("lang", (mille < _SBA_TRAIN).cast("long").alias("is_train"))
    per = rows.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("is_train").alias("n_train")
    )
    tot = rows.agg(
        F.count(F.lit(1)).alias("tn"), F.sum("is_train").alias("tt")
    )
    # exact truncating integer-division shares; the deviation
    # cross-multiplies in DECIMAL(38,0) so |a/b − c/d| floors the same
    # exact rational in both engines (r7 conversion)
    share6 = F.expr("(n_train * 1000000) div n_docs").cast("double") / 1e6
    gshare6 = F.expr("(tt * 1000000) div tn").cast("double") / 1e6
    dev6 = (
        F.expr(
            "(abs(cast(n_train as decimal(38,0)) * tn - cast(tt as"
            " decimal(38,0)) * n_docs) * 1000000)"
            " div (cast(n_docs as decimal(38,0)) * tn)"
        ).cast("double")
        / 1e6
    )
    return per.crossJoin(broadcast(tot)).select(
        "lang",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_train").cast("long").alias("n_train"),
        share6.alias("train_share"),
        gshare6.alias("global_share"),
        dev6.alias("abs_dev"),
    )


DOCS_SPLIT_BALANCE_SQL = f"""
WITH m AS (
    SELECT lang,
           CASE WHEN ('0x' || substr(md5('split|' || doc_id), 1, 8))::BIGINT
                     % 1000 < {_SBA_TRAIN} THEN 1 ELSE 0 END AS is_train
    FROM documents
),
per AS (SELECT lang, count(*) AS n_docs, sum(is_train) AS n_train
        FROM m GROUP BY lang),
tot AS (SELECT count(*) AS tn, sum(is_train) AS tt FROM m)
SELECT lang, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_train AS BIGINT) AS n_train,
       CAST((n_train * 1000000) // n_docs AS DOUBLE) / 1000000.0
           AS train_share,
       CAST((tt * 1000000) // tn AS DOUBLE) / 1000000.0 AS global_share,
       CAST((abs(CAST(n_train AS HUGEINT) * tn - CAST(tt AS HUGEINT) * n_docs)
             * 1000000) // (CAST(n_docs AS HUGEINT) * tn) AS DOUBLE)
           / 1000000.0 AS abs_dev
FROM per CROSS JOIN tot
"""


# ---------------------------------------------------------------------------
# docs_cluster_source_purity


def docs_cluster_source_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Are near-dup clusters INTRA-source (mirrored crawls of one
    site) or CROSS-source (the same text syndicated everywhere)? Per
    near-dup cluster (the session-persisted minhash CC backbone,
    plans/_backbones.py): purity = max per-source member count /
    cluster size; reported as the corpus fold (cluster count, mean
    purity, share fully pure). Cross-source duplication changes the
    dedup policy (keep per source? keep one globally?) — this is the
    query that decides it. Purity micro-quantizes once per cluster;
    folds are integer sums over the CLUSTER-scale table."""
    from distributed_file_system_with_stream_processing_spark.plans import _backbones as B

    d = load_table(spark, sf_dir, "documents")
    cc = B.minhash_cc(spark, sf_dir)
    mem = cc.join(d.select("doc_id", "source"), cc.node == d.doc_id).select(
        "cluster_id", "source"
    )
    per_cs = mem.groupBy("cluster_id", "source").agg(F.count(F.lit(1)).alias("cnt"))
    per = per_cs.groupBy("cluster_id").agg(
        F.sum("cnt").alias("sz"), F.max("cnt").alias("max_cnt")
    )
    # r8 conversion: the per-cluster purity quantization is itself a
    # rational quotient — truncating integer division, not a rounded
    # double (round(m·10⁶/sz) has a real .5 boundary when sz | 2m·10⁶)
    purity_mu = F.expr(f"(max_cnt * {_MICRO}) div sz")
    fold = per.select(
        purity_mu.alias("p_mu"),
        (F.col("max_cnt") == F.col("sz")).cast("long").alias("pure"),
    ).agg(
        F.count(F.lit(1)).alias("n_clusters"),
        F.sum("p_mu").alias("sp"),
        F.sum("pure").alias("n_pure"),
    )
    return fold.select(
        F.col("n_clusters").cast("long").alias("n_clusters"),
        (F.expr("sp div n_clusters").cast("double") / _MICRO).alias(
            "avg_purity"
        ),
        F.col("n_pure").cast("long").alias("n_pure"),
        (F.expr("(n_pure * 1000000) div n_clusters").cast("double") / 1e6).alias(
            "share_pure"
        ),
    )


def _cluster_purity_oracle() -> str:
    from distributed_file_system_with_stream_processing_spark.plans.llm_ops import (
        DEDUP_CLUSTERS_SQL,
    )

    closing = "SELECT node AS doc_id, min(r) AS cluster_id FROM reach GROUP BY node"
    assert closing in DEDUP_CLUSTERS_SQL
    return DEDUP_CLUSTERS_SQL.replace(
        closing,
        ", cc AS ("
        + closing
        + f"""),
mem AS (
    SELECT c.cluster_id, d.source
    FROM cc c JOIN documents d USING (doc_id)
),
per_cs AS (
    SELECT cluster_id, source, count(*) AS cnt FROM mem GROUP BY cluster_id, source
),
per AS (
    SELECT cluster_id, sum(cnt) AS sz, max(cnt) AS max_cnt
    FROM per_cs GROUP BY cluster_id
),
fold AS (
    SELECT count(*) AS n_clusters,
           sum((max_cnt * {_MICRO}) // sz) AS sp,
           sum(CASE WHEN max_cnt = sz THEN 1 ELSE 0 END) AS n_pure
    FROM per
)
SELECT CAST(n_clusters AS BIGINT) AS n_clusters,
       CAST(sp // n_clusters AS DOUBLE) / {_MICRO}.0 AS avg_purity,
       CAST(n_pure AS BIGINT) AS n_pure,
       CAST((n_pure * 1000000) // n_clusters AS DOUBLE) / 1000000.0
           AS share_pure
FROM fold""",
        1,
    )


DOCS_CLUSTER_SOURCE_PURITY_SQL = _cluster_purity_oracle()


# ---------------------------------------------------------------------------
# docs_hapax_quality_lift


def docs_hapax_quality_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Do documents carrying corpus-hapax tokens (terms that occur
    exactly once corpus-wide) score differently on quality? Hapaxes
    are where genuinely novel text AND noise (typos, ids) both live —
    the lift tells which dominates this corpus. One (token) shuffle
    finds hapaxes, a distinct semi-join flags carrier docs, quality
    micro-quantizes per doc once, and the final row divides twice.
    n_other==0 degenerates to lift=-1.0 (sentinel, never NULL)."""
    d = spread(load_table(spark, sf_dir, "documents"))
    toks = d.select(
        "doc_id", F.explode_outer(T.words(F.col("text"))).alias("w")
    ).filter(F.col("w").isNotNull())
    hapax = toks.groupBy("w").agg(F.count(F.lit(1)).alias("cf")).filter(
        F.col("cf") == 1
    )
    carriers = toks.join(hapax.select("w"), "w").select("doc_id").distinct()
    ws = T.words(F.col("text"))
    q_mu = F.round(
        T.quality_score(
            F.size(ws).cast("long"),
            T.stopword_ratio(ws),
            T.punct_ratio(F.col("text")),
        )
        * _MICRO
    ).cast("long")
    flagged = d.select("doc_id", q_mu.alias("q_mu")).join(
        carriers.withColumn("has_hapax", F.lit(1)), "doc_id", "left"
    )
    agg = flagged.agg(
        F.sum(F.when(F.col("has_hapax") == 1, 1).otherwise(0)).alias("n_hapax"),
        F.sum(F.when(F.col("has_hapax") == 1, F.col("q_mu")).otherwise(0)).alias("qh"),
        F.sum(F.when(F.col("has_hapax").isNull(), 1).otherwise(0)).alias("n_other"),
        F.sum(F.when(F.col("has_hapax").isNull(), F.col("q_mu")).otherwise(0)).alias(
            "qo"
        ),
    )
    # exact truncating integer-division means; the lift cross-multiplies in
    # DECIMAL(38,0) (r7 conversion — see llm_ops21)
    q_h = F.expr("qh div n_hapax").cast("double") / _MICRO
    q_o = F.expr("qo div n_other").cast("double") / _MICRO
    lift6 = (
        F.expr(
            "(cast(qh as decimal(38,0)) * n_other * 1000000)"
            " div (cast(qo as decimal(38,0)) * n_hapax)"
        ).cast("double")
        / 1e6
    )
    return agg.select(
        F.col("n_hapax").cast("long").alias("n_hapax_docs"),
        F.col("n_other").cast("long").alias("n_other_docs"),
        F.when(F.col("n_hapax") > 0, q_h).otherwise(F.lit(0.0)).alias(
            "q_hapax"
        ),
        F.when(F.col("n_other") > 0, q_o).otherwise(F.lit(0.0)).alias(
            "q_other"
        ),
        F.when(
            (F.col("n_hapax") > 0) & (F.col("n_other") > 0) & (F.col("qo") > 0),
            lift6,
        )
        .otherwise(F.lit(-1.0))
        .alias("lift"),
    )


DOCS_HAPAX_QUALITY_LIFT_SQL = rf"""
WITH {_QUALITY_MU_CTE},
toks AS (SELECT doc_id, unnest({_WS}) AS w FROM documents),
hapax AS (SELECT w FROM toks GROUP BY w HAVING count(*) = 1),
carriers AS (SELECT DISTINCT doc_id FROM toks JOIN hapax USING (w)),
flagged AS (
    SELECT q.q_mu, CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END AS has_hapax
    FROM q LEFT JOIN carriers c USING (doc_id)
),
agg AS (
    SELECT sum(has_hapax) AS n_hapax,
           sum(CASE WHEN has_hapax = 1 THEN q_mu ELSE 0 END) AS qh,
           sum(1 - has_hapax) AS n_other,
           sum(CASE WHEN has_hapax = 0 THEN q_mu ELSE 0 END) AS qo
    FROM flagged
)
SELECT CAST(n_hapax AS BIGINT) AS n_hapax_docs,
       CAST(n_other AS BIGINT) AS n_other_docs,
       CASE WHEN n_hapax > 0
            THEN CAST(qh // n_hapax AS DOUBLE) / {_MICRO}.0
            ELSE CAST(0.0 AS DOUBLE) END AS q_hapax,
       CASE WHEN n_other > 0
            THEN CAST(qo // n_other AS DOUBLE) / {_MICRO}.0
            ELSE CAST(0.0 AS DOUBLE) END AS q_other,
       CASE WHEN n_hapax > 0 AND n_other > 0 AND qo > 0
            THEN CAST((CAST(qh AS HUGEINT) * n_other * 1000000)
                      // (CAST(qo AS HUGEINT) * n_hapax) AS DOUBLE) / 1000000.0
            ELSE CAST(-1.0 AS DOUBLE) END AS lift
FROM agg
"""


# ---------------------------------------------------------------------------
# docs_char_bigram_entropy_by_lang


def docs_char_bigram_entropy_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-BIGRAM entropy per language (lowercased text,
    whitespace included) — the sub-token complement of the char
    unigram entropy (doc_char_entropy) and token-level entropies: a
    language whose char-bigram entropy collapses is template/boiler
    text regardless of its token stats. Each −p·ln p term
    nano-quantizes from exact integer counts; per-lang fold is a
    BIGINT sum. One (lang, bigram) shuffle + a lang-keyed rollup."""
    d = spread(load_table(spark, sf_dir, "documents"))
    t = F.lower(F.col("text"))
    bgs = F.transform(
        F.sequence(F.lit(1), F.length(t) - 1),
        lambda i: F.substr(t, i, F.lit(2)),
    )
    bg = d.filter(F.length(t) >= 2).select(
        "lang", F.explode_outer(bgs).alias("bg")
    ).filter(F.col("bg").isNotNull())
    cnt = bg.groupBy("lang", "bg").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.groupBy("lang").agg(F.sum("c").alias("n"))
    p = F.col("c").cast("double") / F.col("n")
    contrib = F.round(-(p * F.log(p)) * _NANO).cast("long")
    ent = cnt.join(broadcast(tot), "lang").select("lang", contrib.alias("e")).groupBy(
        "lang"
    ).agg(F.sum("e").alias("s"))
    return tot.join(ent, "lang").select(
        "lang",
        F.col("n").cast("long").alias("n_bigrams"),
        # s is an integer nano sum: floor to micro exactly (r7)
        (F.expr("s div 1000").cast("double") / 1e6).alias("entropy"),
    )


DOCS_CHAR_BIGRAM_ENTROPY_SQL = f"""
WITH bg AS (
    SELECT lang, unnest(list_transform(range(1, length(t)), i -> t[i:i+1])) AS bg
    FROM (SELECT lang, lower(text) AS t FROM documents)
    WHERE length(t) >= 2
),
cnt AS (SELECT lang, bg, count(*) AS c FROM bg GROUP BY lang, bg),
tot AS (SELECT lang, sum(c) AS n FROM cnt GROUP BY lang),
ent AS (
    SELECT cnt.lang,
           -- ok-round: irrational (p·ln p entropy term)
           sum(CAST(round(-(CAST(c AS DOUBLE) / n * ln(CAST(c AS DOUBLE) / n))
                          * {_NANO}) AS BIGINT)) AS s
    FROM cnt JOIN tot USING (lang) GROUP BY cnt.lang
)
SELECT t.lang, CAST(t.n AS BIGINT) AS n_bigrams,
       CAST(e.s // 1000 AS DOUBLE) / 1000000.0 AS entropy
FROM tot t JOIN ent e USING (lang)
"""


# ---------------------------------------------------------------------------
# docs_simhash_bit_balance


def docs_simhash_bit_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-bit balance of the 32-bit SimHash signature family: share
    of signed docs with bit j set, and its skew |share − 0.5| — the
    hash-health audit for the simhash dedup path (a biased bit halves
    that bit's discriminating power; systematic bias means the
    shingle hash is correlated with the corpus). Signature arithmetic
    is identical to operators/dedup.simhash_pairs (docs with zero
    shingles are unsigned and excluded, as there). One shuffle to the
    signature table, then a 32-row fold."""
    from distributed_file_system_with_stream_processing_spark.operators.dedup import (
        _exploded_shingles,
    )

    d = spread(load_table(spark, sf_dir, "documents"))
    ex = _exploded_shingles(d, "doc_id", "text", 3).withColumn(
        "h", T.hash32(F.col("s"))
    )
    balances = ex.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), j) % 2 == 1, 1).otherwise(-1)
            ).alias(f"b{j}")
            for j in range(32)
        ]
    )
    bits = balances.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("bit"),
                        (F.col(f"b{j}") >= 0).cast("long").alias("set_"),
                    )
                    for j in range(32)
                ]
            )
        ).alias("x")
    ).select(F.col("x.bit").alias("bit"), F.col("x.set_").alias("set_"))
    agg = bits.groupBy("bit").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("set_").alias("n_set")
    )
    # r8 conversion: share is an exact truncating integer-division
    # quotient, and with share on the 1e-6 grid the skew is exact
    # integer |share_mu − 500000| — no round() anywhere
    share_mu = F.expr("(n_set * 1000000) div n_docs")
    return agg.select(
        F.col("bit").cast("long").alias("bit"),
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_set").cast("long").alias("n_set"),
        (share_mu.cast("double") / 1e6).alias("share_set"),
        (F.abs(share_mu - F.lit(500000)).cast("double") / 1e6).alias("skew"),
    )


def _simhash_bit_balance_oracle() -> str:
    from distributed_file_system_with_stream_processing_spark.plans.llm_ops import (
        DEDUP_SIMHASH_SQL,
    )

    closing = "SELECT a.doc_id AS doc_id_a"
    assert closing in DEDUP_SIMHASH_SQL
    body = DEDUP_SIMHASH_SQL.split(closing)[0]
    return (
        body
        + """
, bits AS (
    SELECT j.bit, CASE WHEN (simhash // (1::BIGINT << j.bit)) % 2 = 1
                       THEN 1 ELSE 0 END AS set_
    FROM sim CROSS JOIN (SELECT unnest(range(0, 32)) AS bit) j
)
SELECT CAST(bit AS BIGINT) AS bit,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(set_) AS BIGINT) AS n_set,
       CAST((sum(set_) * 1000000) // count(*) AS DOUBLE) / 1000000.0
           AS share_set,
       CAST(abs((sum(set_) * 1000000) // count(*) - 500000) AS DOUBLE)
           / 1000000.0 AS skew
FROM bits GROUP BY bit
"""
    )


DOCS_SIMHASH_BIT_BALANCE_SQL = _simhash_bit_balance_oracle()


QUERIES.update(
    {
        "docs_length_band_quality": docs_length_band_quality,
        "docs_split_balance_audit": docs_split_balance_audit,
        "docs_cluster_source_purity": docs_cluster_source_purity,
        "docs_hapax_quality_lift": docs_hapax_quality_lift,
        "docs_char_bigram_entropy_by_lang": docs_char_bigram_entropy_by_lang,
        "docs_simhash_bit_balance": docs_simhash_bit_balance,
    }
)

ORACLES.update(
    {
        "docs_length_band_quality": DOCS_LENGTH_BAND_QUALITY_SQL,
        "docs_split_balance_audit": DOCS_SPLIT_BALANCE_SQL,
        "docs_cluster_source_purity": DOCS_CLUSTER_SOURCE_PURITY_SQL,
        "docs_hapax_quality_lift": DOCS_HAPAX_QUALITY_LIFT_SQL,
        "docs_char_bigram_entropy_by_lang": DOCS_CHAR_BIGRAM_ENTROPY_SQL,
        "docs_simhash_bit_balance": DOCS_SIMHASH_BIT_BALANCE_SQL,
    }
)
