"""Round-5 tail II: query-likelihood retrieval, exact sizing
percentiles, and boilerplate detection.

Same contract as ``llm_ops``…``llm_ops8``: declarative DataFrame plans
(JVM expressions only) with DuckDB oracles mirroring the exact
arithmetic, so value hashes match without tolerances.

Ops here (all oracled):
- ``query_likelihood_topk`` — Dirichlet-smoothed query-likelihood
  retrieval (Ponte & Croft 1998; Zhai & Lafferty 2001 smoothing):
  the third classical lexical ranking function, completing the
  retrieval family (BM25, TF-IDF, dense cosine, RRF/interp fusion).
- ``docs_token_percentiles_by_lang`` — EXACT discrete p50/p90/p99 of
  per-doc token counts by language: the sizing table sequence-packing
  and context-window budgeting read (percentile_approx twins exist;
  this is the exact-integer variant).
- ``docs_template_shingles`` — per-source highest-doc-frequency
  3-shingle and its doc coverage: the boilerplate/template detector
  (a source whose top shingle covers most docs is navigation chrome,
  not prose).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from distributed_file_system_with_stream_processing_spark.operators._util import (
    plan_ckpt as _plan_ckpt,
)
from distributed_file_system_with_stream_processing_spark.functions import text as T
from distributed_file_system_with_stream_processing_spark.operators import dedup as D
from distributed_file_system_with_stream_processing_spark.operators._util import spread
from distributed_file_system_with_stream_processing_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# query_likelihood_topk

_QL_QUERIES_BELOW = 10  # the retrieval family's query-table convention
_QL_QTERMS = 6
_QL_K = 5
_QL_MU = 100.0  # Dirichlet pseudo-count (Zhai-Lafferty; small corpus)
_QL_MICRO = 1_000_000


def query_likelihood_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dirichlet-smoothed query-likelihood retrieval: rank base docs
    by log P(q|d) with P(t|d) = (tf + μ·P(t|C)) / (dl + μ) — the
    language-modeling ranking function (Ponte & Croft 1998; Dirichlet
    prior per Zhai & Lafferty 2001), completing the lexical retrieval
    family next to BM25 and TF-IDF. Standard matched-terms-only
    decomposition: log P(q|d) = Σ_{t∈q∩d} log(1 + tf/(μ·P(t|C)))
    + |q|·log(μ/(dl+μ)), so only matched postings are scored and the
    per-doc length norm is one closed-form term — docs sharing no
    term with the query are not ranked (the BM25 convention). The
    per-query constant Σ_{t∈q} log P(t|C) is dropped (the standard
    rank-equivalent form — it also sidesteps −∞ for query terms the
    base corpus never contains), so ``ql_score`` orders docs exactly
    as log P(q|d) does per query but is not itself a log-probability.

    Exactness: both summands micro-quantize from exact integer inputs
    (tf, cf, total corpus length, dl are integers; each log evaluates
    in one fixed double sequence and rounds ONCE), so the per-(query,
    doc) score is an exact integer sum — ranking ties break on
    doc_id; the reported score divides back once at 6 dp.

    100 TB shape: the bm25_retrieval_topk census exactly — postings
    backbone [shuffle 1], collection-frequency fold on the term key
    [shuffle 2], query-term table broadcasts into the postings join,
    corpus total rides the 1-row BuildRight broadcast, integer score
    agg [shuffle 3], per-query top-k window.
    """
    d = spread(load_table(spark, sf_dir, "documents"))
    toks = d.select("doc_id", T.words(F.col("text")).alias("ws"))
    qterms = (
        toks.filter(F.col("doc_id") < _QL_QUERIES_BELOW)
        .select(
            F.col("doc_id").alias("query_id"),
            F.explode_outer(F.slice("ws", 1, _QL_QTERMS)).alias("w"),
        )
        .filter(F.col("w").isNotNull())
        .select("query_id", F.lower(F.col("w")).alias("term"))
        .distinct()
    )
    nq = qterms.groupBy("query_id").agg(F.count(F.lit(1)).alias("nq"))
    base = toks.filter(F.col("doc_id") >= _QL_QUERIES_BELOW)
    ex = (
        base.select(
            "doc_id", F.size("ws").alias("dl"), F.explode_outer("ws").alias("w")
        )
        .filter(F.col("w").isNotNull())
        .select("doc_id", "dl", F.lower(F.col("w")).alias("term"))
    )
    # r9: cf is vocab-scale and feeds both the matched join and the
    # corpus-length fold — checkpoint it once; clen = Σ_t cf(t) folds
    # off cf (the same exact integer by associativity). r10: cf counts
    # TOKENS directly (count(*) ≡ Σ tf), and the matched side joins
    # the broadcast query-term table BEFORE aggregating — only matched
    # postings reach the tf shuffle, so the corpus-scale (doc, dl,
    # term) Exchange the old postings table paid is gone at any scale
    # (tf per (query, doc, term) is the same exact count: qterms is
    # distinct per (query, term)).
    cf = (
        ex.groupBy("term")
        .agg(F.count(F.lit(1)).alias("cf"))
        .transform(_plan_ckpt)
    )
    total = cf.agg(F.sum("cf").alias("clen"))
    # matched-term gain: log(1 + tf·clen / (μ·cf)) — tf/(μ·P(t|C))
    # with P(t|C) = cf/clen, evaluated in this exact sequence
    matched = (
        ex.join(broadcast(qterms), "term")
        .groupBy("query_id", "doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .join(broadcast(cf), "term")
        .crossJoin(broadcast(total))
    )
    # ok-round: irrational (ln) quantization
    gain_mu = F.round(
        F.log(
            1.0
            + (F.col("tf") * F.col("clen"))
            / (F.lit(_QL_MU) * F.col("cf"))
        )
        * _QL_MICRO
    ).cast("long")
    scored = (
        matched.select("query_id", "doc_id", "dl", gain_mu.alias("_g"))
        .groupBy("query_id", "doc_id", "dl")
        .agg(F.sum("_g").alias("_gs"))
    )
    # per-doc length norm: |q| · round(log(μ/(dl+μ))·1e6)
    # ok-round: irrational (ln) quantization
    norm_mu = F.round(
        F.log(F.lit(_QL_MU) / (F.col("dl") + F.lit(_QL_MU))) * _QL_MICRO
    ).cast("long")
    final = scored.join(broadcast(nq), "query_id").select(
        "query_id",
        "doc_id",
        (F.col("_gs") + F.col("nq") * norm_mu).alias("_s"),
    )
    win = Window.partitionBy("query_id").orderBy(F.desc("_s"), F.asc("doc_id"))
    return (
        final.withColumn("rank", F.row_number().over(win).cast("long"))
        .filter(F.col("rank") <= _QL_K)
        .select(
            "query_id",
            "doc_id",
            # ok-round: exact micro grid (6 dp)
            F.round(F.col("_s").cast("double") / _QL_MICRO, 6).alias("ql_score"),
            "rank",
        )
    )


def _ql_sql() -> str:
    from distributed_file_system_with_stream_processing_spark.plans.llm_ops import _WS

    return rf"""
WITH toks AS (SELECT doc_id, {_WS} AS ws FROM documents),
qterms AS (
    SELECT DISTINCT doc_id AS query_id, lower(w) AS term
    FROM (SELECT doc_id, unnest(ws[1:{_QL_QTERMS}]) AS w
          FROM toks WHERE doc_id < {_QL_QUERIES_BELOW})
),
nq AS (SELECT query_id, count(*) AS nq FROM qterms GROUP BY query_id),
base AS (SELECT doc_id, ws FROM toks WHERE doc_id >= {_QL_QUERIES_BELOW}),
postings AS (
    SELECT doc_id, dl, term, count(*) AS tf
    FROM (SELECT doc_id, len(ws) AS dl, lower(unnest(ws)) AS term FROM base)
    GROUP BY doc_id, dl, term
),
cf AS (SELECT term, sum(tf) AS cf FROM postings GROUP BY term),
total AS (SELECT sum(tf) AS clen FROM postings),
scored AS (
    SELECT p.query_id, p.doc_id, p.dl, sum(p.g) AS gs
    FROM (
        SELECT q.query_id, po.doc_id, po.dl,
               -- ok-round: irrational (ln) quantization
               CAST(round(ln(1.0 + (po.tf * t.clen)
                                   / ({_QL_MU} * c.cf)) * {_QL_MICRO}) AS BIGINT) AS g
        FROM postings po
        JOIN qterms q USING (term)
        JOIN cf c USING (term)
        CROSS JOIN total t
    ) p
    GROUP BY p.query_id, p.doc_id, p.dl
),
final AS (
    SELECT s.query_id, s.doc_id,
           s.gs + n.nq * CAST(round(ln({_QL_MU} / (s.dl + {_QL_MU}))
                                    * {_QL_MICRO}) AS BIGINT) AS sc
    FROM scored s JOIN nq n USING (query_id)
),
rk AS (
    SELECT query_id, doc_id, sc,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY sc DESC, doc_id ASC) AS rank
    FROM final
)
SELECT query_id, doc_id,
       -- ok-round: exact micro grid (6 dp)
       round(CAST(sc AS DOUBLE) / {_QL_MICRO}, 6) AS ql_score,
       CAST(rank AS BIGINT) AS rank
FROM rk WHERE rank <= {_QL_K}
"""


# ---------------------------------------------------------------------------
# docs_token_percentiles_by_lang

_PCT_QS = (50, 90, 99)


def docs_token_percentiles_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT discrete token-count percentiles (p50/p90/p99) per
    language — the sizing table sequence packing and context-window
    budgeting read. ``order_percentiles_approx`` ships the GK-sketch
    path (the 100 TB default); this is its exact-integer twin at the
    percentile_disc definition: the value at row ⌈q·n⌉ of the sorted
    list — every output an actual corpus value, exact in both
    engines (no interpolation, no floats until never).

    Determinism: ranked by (n_tok, doc_id) — the value at a fixed
    rank is invariant to tie order, the doc_id key just pins the sort
    for engine parity.

    100 TB shape: one lang-keyed shuffle; the rank window and the
    conditional min-at-rank fold reuse its partitioning (window key ==
    groupBy key); output |langs| rows. The honest caveat lives in
    ``order_percentiles_approx``: a single skewed lang partition sorts
    on one reducer — that is WHY the sketch twin is the scale
    default and this one is the exact auditor.
    """
    d = load_table(spark, sf_dir, "documents")
    per = d.select(
        "lang", "doc_id", F.size(T.words(F.col("text"))).cast("long").alias("n_tok")
    )
    w = Window.partitionBy("lang").orderBy("n_tok", "doc_id")
    ranked = per.select(
        "lang",
        "n_tok",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("lang")).alias("n"),
    )
    aggs = [F.count(F.lit(1)).alias("n_docs")]
    for q in _PCT_QS:
        at = F.ceil(F.col("n") * q / 100.0).cast("long")
        aggs.append(
            F.min(F.when(F.col("rn") == at, F.col("n_tok"))).alias(f"p{q}_tokens")
        )
    return ranked.groupBy("lang").agg(*aggs)


DOCS_TOKEN_PCT_SQL = rf"""
WITH per AS (
    SELECT lang, doc_id,
           CAST(len(list_filter(string_split_regex(text, '\s+'), w -> w <> '')) AS BIGINT) AS n_tok
    FROM documents
),
ranked AS (
    SELECT lang, n_tok,
           row_number() OVER (PARTITION BY lang ORDER BY n_tok, doc_id) AS rn,
           count(*) OVER (PARTITION BY lang) AS n
    FROM per
)
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       {", ".join(
           f"min(CASE WHEN rn = CAST(ceil(n * {q} / 100.0) AS BIGINT) THEN n_tok END) AS p{q}_tokens"
           for q in _PCT_QS
       )}
FROM ranked GROUP BY lang
"""


# ---------------------------------------------------------------------------
# docs_template_shingles


def docs_template_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate detector: per source, the 3-shingle appearing in
    the MOST documents and the share of the source's docs containing
    it — a source whose top shingle covers most docs is emitting
    template chrome (headers, navigation, legal footers), the
    pattern repetition scoring (per-doc) can't see because it is
    cross-doc. The drill-down behind ``docs_neardup_rate_by_source``:
    not whether a source self-copies, but WHAT string it stamps
    everywhere.

    Exactness: shingle doc-frequencies are exact integers (shingle
    sets are per-doc distinct); the top-1 window orders by (df desc,
    shingle asc) — fully deterministic; coverage divides once at 6 dp.

    100 TB shape: one (source, shingle) partial-agg shuffle (high
    cardinality, well spread — the dedup backbone's key shape), a
    per-source top-1 window over the shingle-df aggregate (source
    cardinality partitions), and a broadcast join of per-source doc
    counts.
    """
    d = spread(load_table(spark, sf_dir, "documents"))
    sh = d.select("source", "doc_id", T.shingles(F.col("text"), 3).alias("sh"))
    ex = (
        sh.select("source", F.explode_outer("sh").alias("s"))
        .filter(F.col("s").isNotNull())
    )
    dfreq = ex.groupBy("source", "s").agg(F.count(F.lit(1)).alias("df"))
    nd = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    w = Window.partitionBy("source").orderBy(F.desc("df"), F.asc("s"))
    top = (
        dfreq.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("source", F.col("s").alias("top_shingle"), F.col("df").alias("shingle_df"))
    )
    return top.join(broadcast(nd), "source").select(
        "source",
        "top_shingle",
        "shingle_df",
        "n_docs",
        # r8 conversion: exact truncating integer-division rate
        (
            F.expr("(shingle_df * 1000000) div n_docs").cast("double") / 1e6
        ).alias("coverage"),
    )


def _template_sql() -> str:
    from distributed_file_system_with_stream_processing_spark.plans.llm_ops import _WS

    return rf"""
WITH sh AS (
    SELECT source, doc_id,
           list_distinct(CASE WHEN len(ws) >= 3
                THEN list_transform(range(1, len(ws) - 1),
                                    i -> array_to_string(ws[i:i+2], ' '))
                ELSE [] END) AS sh
    FROM (SELECT source, doc_id, {_WS} AS ws FROM documents)
),
ex AS (SELECT source, unnest(sh) AS s FROM sh),
dfreq AS (SELECT source, s, count(*) AS df FROM ex GROUP BY source, s),
nd AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
rk AS (
    SELECT source, s, df,
           row_number() OVER (PARTITION BY source ORDER BY df DESC, s ASC) AS rn
    FROM dfreq
)
SELECT r.source, r.s AS top_shingle, CAST(r.df AS BIGINT) AS shingle_df,
       CAST(n.n_docs AS BIGINT) AS n_docs,
       CAST((r.df * 1000000) // n.n_docs AS DOUBLE) / 1000000.0 AS coverage
FROM rk r JOIN nd n USING (source) WHERE r.rn = 1
"""




# ---------------------------------------------------------------------------
# events_ab_conversion / events_ab_value_ttest

_AB_MICRO = 1_000_000


def events_ab_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion experiment readout: users split into control /
    treatment by the portable key hash (the docs_train_val_split
    discipline - hash 'ab|user_id', stable under re-runs and
    independent of behavior), user-level purchase conversion per arm,
    and the pooled two-proportion z-score - the primitive every
    experimentation platform computes before anyone trusts a lift
    number. On a hash split the true lift is 0 by construction, so
    the z-score doubles as an A/A sanity check of the pipeline.

    Exactness: arm assignment and user-level conversion are exact
    integer folds; the 2x2 (arm, converted) table pivots into ONE row
    by conditional aggregation (no join); rates and the z statistic
    evaluate in one fixed double sequence over exact integers, each
    rounded once at 6 dp.

    100 TB shape: one user_id partial-agg shuffle (user-level fold),
    then a 1-row conditional aggregate - no second corpus pass, no
    broadcast, no window.
    """
    e = load_table(spark, sf_dir, "events")
    arm = T.hash32(F.concat(F.lit("ab|"), F.col("user_id"))) % 2
    users = (
        e.select("user_id", arm.alias("arm"),
                 (F.col("event_type") == "purchase").cast("int").alias("p"))
        .groupBy("user_id", "arm")
        .agg(F.max("p").alias("conv"))
    )
    t = users.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n0"),
        F.sum(F.when(F.col("arm") == 0, F.col("conv")).otherwise(0)).alias("c0"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("arm") == 1, F.col("conv")).otherwise(0)).alias("c1"),
    )
    p0 = F.col("c0").cast("double") / F.col("n0")
    p1 = F.col("c1").cast("double") / F.col("n1")
    pp = (F.col("c0") + F.col("c1")).cast("double") / (F.col("n0") + F.col("n1"))
    se = F.sqrt(pp * (1.0 - pp) * (1.0 / F.col("n0") + 1.0 / F.col("n1")))
    # se = 0 iff pooled conversion is 0 or 1 (the small-fixture A/A
    # degenerate case): the lift is 0 there too, so z reports 0.0 -
    # never NULL/inf (the driver hash cannot order NULLs)
    # ok-round: irrational (sqrt standard error)
    z = F.when(se > 0, F.round((p1 - p0) / se, 6)).otherwise(F.lit(0.0))
    return t.select(
        F.col("n0").cast("long").alias("n_control"),
        F.col("c0").cast("long").alias("conv_control"),
        F.col("n1").cast("long").alias("n_treatment"),
        F.col("c1").cast("long").alias("conv_treatment"),
        # r8 conversion: exact truncating integer-division rates;
        # z keeps round() (sqrt in the denominator — irrational)
        (F.expr("(c0 * 1000000) div n0").cast("double") / 1e6).alias(
            "rate_control"
        ),
        (F.expr("(c1 * 1000000) div n1").cast("double") / 1e6).alias(
            "rate_treatment"
        ),
        z.alias("z_score"),
    )


EVENTS_AB_CONVERSION_SQL = """
WITH u AS (
    SELECT user_id,
           ('0x' || substr(md5('ab|' || user_id), 1, 8))::BIGINT % 2 AS arm,
           max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
    FROM events GROUP BY 1, 2
),
t AS (
    SELECT sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS n0,
           sum(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS c0,
           sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n1,
           sum(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS c1
    FROM u
)
SELECT CAST(n0 AS BIGINT) AS n_control, CAST(c0 AS BIGINT) AS conv_control,
       CAST(n1 AS BIGINT) AS n_treatment, CAST(c1 AS BIGINT) AS conv_treatment,
       CAST((c0 * 1000000) // n0 AS DOUBLE) / 1000000.0 AS rate_control,
       CAST((c1 * 1000000) // n1 AS DOUBLE) / 1000000.0 AS rate_treatment,
       CASE WHEN (c0 + c1) > 0 AND (c0 + c1) < (n0 + n1)
            -- ok-round: irrational (sqrt standard error)
            THEN round((CAST(c1 AS DOUBLE) / n1 - CAST(c0 AS DOUBLE) / n0)
                 / sqrt((CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                        * (1.0 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                        * (1.0 / n0 + 1.0 / n1)), 6)
            ELSE 0.0 END AS z_score
FROM t
"""


def events_ab_value_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch two-sample t readout on per-user event value - the
    continuous-metric companion of ``events_ab_conversion`` (same
    portable hash split): per-user value totals micro-quantize per
    EVENT (exact integer user folds), each arm collects (n, sum,
    sum-of-squares) with the squares in DECIMAL(38,0) <-> HUGEINT,
    and the t statistic + Welch-Satterthwaite df evaluate in one
    fixed double sequence over those exact integers. A/A by
    construction (hash split), so |t| large means the pipeline - not
    the product - is broken.

    100 TB shape: one user_id partial-agg shuffle, then a 1-row
    conditional aggregate; the squares stay integer till the final
    1-row expression.
    """
    e = load_table(spark, sf_dir, "events")
    arm = T.hash32(F.concat(F.lit("ab|"), F.col("user_id"))) % 2
    users = (
        e.select(
            "user_id",
            arm.alias("arm"),
            F.round(F.col("value") * _AB_MICRO).cast("long").alias("v_mu"),
        )
        .groupBy("user_id", "arm")
        .agg(F.sum("v_mu").alias("x"))
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    t = users.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n0"),
        F.sum(F.when(F.col("arm") == 0, F.col("x")).otherwise(0)).alias("s0"),
        F.sum(F.when(F.col("arm") == 0, dec("x") * dec("x"))).alias("q0"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("arm") == 1, F.col("x")).otherwise(0)).alias("s1"),
        F.sum(F.when(F.col("arm") == 1, dec("x") * dec("x"))).alias("q1"),
    )
    m = lambda s, n: F.col(s).cast("double") / _AB_MICRO / F.col(n)  # noqa: E731

    def var(q, s, n):
        # sample variance in value units: (q - s^2/n) / (n-1) / 1e12
        return (
            (F.col(q).cast("double") - F.col(s).cast("double") * F.col(s) / F.col(n))
            / (F.col(n) - 1)
            / (float(_AB_MICRO) * _AB_MICRO)
        )

    v0, v1 = var("q0", "s0", "n0"), var("q1", "s1", "n1")
    se2 = v0 / F.col("n0") + v1 / F.col("n1")
    # degenerate guards (constant-valued or <2-user arm): report 0.0,
    # never NULL/inf - the small-fixture A/A case. Nested whens so the
    # (n-1) divisions inside se2 are never evaluated for 1-user arms.
    arms_ok = (F.col("n0") > 1) & (F.col("n1") > 1)
    tstat = F.when(
        arms_ok,
        F.when(
            # ok-round: irrational (sqrt standard error)
            se2 > 0, F.round((m("s1", "n1") - m("s0", "n0")) / F.sqrt(se2), 6)
        ).otherwise(F.lit(0.0)),
    ).otherwise(F.lit(0.0))
    dfw = F.when(
        arms_ok,
        F.when(
            se2 > 0,
            # welch df: rational of HUGEINT-overflowing squares —
            # ok-round: documented triage KEEP (identical double fold)
            F.round(
                (se2 * se2)
                / (
                    (v0 / F.col("n0")) * (v0 / F.col("n0")) / (F.col("n0") - 1)
                    + (v1 / F.col("n1")) * (v1 / F.col("n1")) / (F.col("n1") - 1)
                ),
                6,
            ),
        ).otherwise(F.lit(0.0)),
    ).otherwise(F.lit(0.0))
    return t.select(
        F.col("n0").cast("long").alias("n_control"),
        F.col("n1").cast("long").alias("n_treatment"),
        # r8 conversion: exact truncating integer-division means
        # (s is the micro-sum, so s div n IS the 6 dp mean)
        (F.expr("s0 div n0").cast("double") / 1e6).alias("mean_control"),
        (F.expr("s1 div n1").cast("double") / 1e6).alias("mean_treatment"),
        tstat.alias("t_stat"),
        dfw.alias("welch_df"),
    )


EVENTS_AB_TTEST_SQL = f"""
WITH u AS (
    SELECT user_id,
           ('0x' || substr(md5('ab|' || user_id), 1, 8))::BIGINT % 2 AS arm,
           sum(CAST(round(value * {_AB_MICRO}) AS BIGINT)) AS x
    FROM events GROUP BY 1, 2
),
t AS (
    SELECT sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS n0,
           sum(CASE WHEN arm = 0 THEN x ELSE 0 END) AS s0,
           sum(CASE WHEN arm = 0 THEN CAST(x AS HUGEINT) * x END) AS q0,
           sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n1,
           sum(CASE WHEN arm = 1 THEN x ELSE 0 END) AS s1,
           sum(CASE WHEN arm = 1 THEN CAST(x AS HUGEINT) * x END) AS q1
    FROM u
),
v AS (
    SELECT n0, n1, s0, s1,
           CASE WHEN n0 > 1 THEN (CAST(q0 AS DOUBLE) - CAST(s0 AS DOUBLE) * s0 / n0)
                                 / (n0 - 1) / {float(_AB_MICRO) * _AB_MICRO} END AS v0,
           CASE WHEN n1 > 1 THEN (CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1)
                                 / (n1 - 1) / {float(_AB_MICRO) * _AB_MICRO} END AS v1
    FROM t
)
SELECT CAST(n0 AS BIGINT) AS n_control, CAST(n1 AS BIGINT) AS n_treatment,
       CAST(s0 // n0 AS DOUBLE) / {_AB_MICRO} AS mean_control,
       CAST(s1 // n1 AS DOUBLE) / {_AB_MICRO} AS mean_treatment,
       CASE WHEN n0 > 1 AND n1 > 1 AND (v0 / n0 + v1 / n1) > 0
            -- ok-round: irrational (sqrt standard error)
            THEN round((CAST(s1 AS DOUBLE) / {_AB_MICRO} / n1
                        - CAST(s0 AS DOUBLE) / {_AB_MICRO} / n0)
                       / sqrt(v0 / n0 + v1 / n1), 6)
            ELSE 0.0 END AS t_stat,
       CASE WHEN n0 > 1 AND n1 > 1 AND (v0 / n0 + v1 / n1) > 0
            -- ok-round: documented triage KEEP (see the Spark twin)
            THEN round((v0 / n0 + v1 / n1) * (v0 / n0 + v1 / n1)
                       / ((v0 / n0) * (v0 / n0) / (n0 - 1)
                          + (v1 / n1) * (v1 / n1) / (n1 - 1)), 6)
            ELSE 0.0 END AS welch_df
FROM v
"""




# ---------------------------------------------------------------------------
# ann_probe_recall_curve

_PRC_CELLS = 16
_PRC_MAXPROBE = 4
_PRC_K = 5


def ann_probe_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF probe-budget tuning curve: candidate recall of the trained
    cells as a function of the probe count (1..4) - for each exact
    top-5 neighbor, the rank of ITS cell in the query's
    distance-ordered cell list says the minimum nprobe that reaches
    it, and one cumulative rollup prices every probe budget from one
    pass (the lsh_recall_curve economics applied to the ANN index).
    This is THE number an IVF operator tunes first: registered
    ann_ivf_trained fixes nprobe=3; this query shows what 1, 2, and 4
    would have bought.

    Exactness: cell training/assignment is the proven bit-stable
    k-means pipeline (same seeds, same integer sums); cell ranking
    orders by (dist, cell) on lockstep doubles; the exact top-5 is
    the deterministic brute ranking; counts are exact integers and
    recall divides once at 6 dp.

    100 TB shape: Lloyd metadata passes + the queries-broadcast brute
    pass (the audit's ground truth - base never shuffles) + a
    |Q|*k-row reachability join against the |Q|*maxprobe cell-rank
    table; the 1-row truth total rides the allow-listed BuildRight
    broadcast; output is 4 rows.
    """
    from distributed_file_system_with_stream_processing_spark.operators import (
        clustering as C,
        similarity as S,
    )
    from distributed_file_system_with_stream_processing_spark.operators._util import spread
    from distributed_file_system_with_stream_processing_spark.plans.llm_ops2 import (
        _KM_ITERS,
    )
    from distributed_file_system_with_stream_processing_spark.functions import vector as V

    from distributed_file_system_with_stream_processing_spark.plans import _backbones as B

    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(F.col("vec_id").alias("id"), V.as_double(F.col("embedding")).alias("v"))
    base = e.filter(F.col("id") >= 10)
    # r8: the shared session-trained IVF centroids (same k/iters/base
    # as ann_ivf_trained) — Lloyd no longer retrains per run
    cents = B.kmeans_centroids(
        spark, sf_dir, k=_PRC_CELLS, iters=_KM_ITERS, min_id=10
    )
    base_cells = spread(base).selectExpr(
        "id AS neighbor_id", f"{C._argmin_expr('v', cents)} AS cell"
    )
    structs = ",".join(
        f"named_struct('d', {C._dist_sq('v', c)}, 'c', {j})"
        for j, c in enumerate(cents)
    )
    qr = e.filter(F.col("id") < 10).selectExpr(
        "id AS query_id",
        f"posexplode(transform(slice(array_sort(array({structs})), 1, {_PRC_MAXPROBE}),"
        " s -> s.c)) AS (pos, cell)",
    ).select("query_id", (F.col("pos") + 1).alias("proberank"), "cell")
    exact = S.cosine_topk(emb, query_ids_below=10, k=_PRC_K).select(
        "query_id", "neighbor_id"
    )
    reach = (
        exact.join(base_cells, "neighbor_id")
        .join(broadcast(qr), ["query_id", "cell"], "left")
        .select("proberank")
    )
    found = (
        reach.filter(F.col("proberank").isNotNull())
        .select(
            F.explode(
                F.sequence(F.col("proberank"), F.lit(_PRC_MAXPROBE))
            ).alias("probe")
        )
        .groupBy("probe")
        .agg(F.count(F.lit(1)).alias("n_found"))
    )
    n_true = exact.agg(F.count(F.lit(1)).alias("n_true"))
    grid = spark.range(1, _PRC_MAXPROBE + 1).select(F.col("id").cast("int").alias("probe"))
    return (
        grid.join(found, "probe", "left")
        .crossJoin(broadcast(n_true))
        .select(
            F.col("probe").cast("long").alias("probe"),
            F.coalesce("n_found", F.lit(0)).cast("long").alias("n_found"),
            F.col("n_true").cast("long").alias("n_true"),
            # r8 conversion: exact truncating integer-division rate
            (
                F.expr("(coalesce(n_found, 0) * 1000000) div n_true")
                .cast("double") / 1e6
            ).alias("candidate_recall"),
        )
    )


def _probe_recall_sql() -> str:
    from distributed_file_system_with_stream_processing_spark.plans.llm_ops import _DOT
    from distributed_file_system_with_stream_processing_spark.plans.llm_ops2 import (
        _KM_ITERS,
        _km_dist,
        _kmeans_oracle_parts,
    )

    parts = _kmeans_oracle_parts(_PRC_CELLS, _KM_ITERS, e_where=" WHERE vec_id >= 10")
    return (
        ",\n".join(parts)
        + f""",
qr AS (
    SELECT query_id, cell, rn AS proberank FROM (
        SELECT q.vec_id AS query_id, s.c AS cell,
               row_number() OVER (PARTITION BY q.vec_id
                                  ORDER BY {_km_dist('q.v', 's.v')}, s.c) AS rn
        FROM (SELECT vec_id, embedding::DOUBLE[] AS v
              FROM embeddings WHERE vec_id < 10) q
        CROSS JOIN c{_KM_ITERS} s)
    WHERE rn <= {_PRC_MAXPROBE}),
q2 AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
       FROM embeddings WHERE vec_id < 10),
ex_sim AS (
    SELECT q2.query_id, f.vec_id AS neighbor_id, f.c AS cell,
           {_DOT.format(a='qv', b='f.v')} /
           (sqrt({_DOT.format(a='qv', b='qv')}) * sqrt({_DOT.format(a='f.v', b='f.v')})) AS s
    FROM q2 CROSS JOIN fin f),
ex_rk AS (
    SELECT query_id, neighbor_id, cell,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY s DESC, neighbor_id ASC) AS rank
    FROM ex_sim),
ex AS (SELECT query_id, neighbor_id, cell FROM ex_rk WHERE rank <= {_PRC_K}),
reach AS (
    SELECT q.proberank
    FROM ex LEFT JOIN qr q ON ex.query_id = q.query_id AND ex.cell = q.cell
),
found AS (
    SELECT t.p AS probe, count(*) AS n_found
    FROM reach r JOIN (SELECT unnest(range(1, {_PRC_MAXPROBE + 1})) AS p) t
      ON r.proberank IS NOT NULL AND t.p >= r.proberank
    GROUP BY t.p
),
nt AS (SELECT count(*) AS n_true FROM ex)
SELECT CAST(g.p AS BIGINT) AS probe,
       CAST(coalesce(f.n_found, 0) AS BIGINT) AS n_found,
       CAST(nt.n_true AS BIGINT) AS n_true,
       CAST((coalesce(f.n_found, 0) * 1000000) // nt.n_true AS DOUBLE)
           / 1000000.0 AS candidate_recall
FROM (SELECT unnest(range(1, {_PRC_MAXPROBE + 1})) AS p) g
LEFT JOIN found f ON g.p = f.probe
CROSS JOIN nt
"""
    )




# ---------------------------------------------------------------------------
# ivf_cell_balance

_ICB_CELLS = 16


def ivf_cell_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cell-population table of the trained IVF index (same cells as
    ``ann_ivf_trained``): per-cell vector count, share, and the ratio
    to the ideal uniform share — the index-health diagnostic an ANN
    operator watches because cell imbalance IS query-latency variance
    (a probe that lands in a 10x-overfull cell does 10x the re-rank
    work) and the empirical input to the probe-budget choice
    ``ann_probe_recall_curve`` prices.

    Exactness: training/assignment are the proven bit-stable k-means
    pipeline; counts exact integers; share and balance divide once at
    6 dp (balance = count·k/n — >1 overfull, <1 underfull).

    100 TB shape: Lloyd metadata passes + ONE cell-keyed partial agg
    over the pure-map assignment (centroids are literals — the
    assignment stage shuffles nothing); output is k rows.
    """
    from distributed_file_system_with_stream_processing_spark.functions import vector as V
    from distributed_file_system_with_stream_processing_spark.operators import clustering as C
    from distributed_file_system_with_stream_processing_spark.operators._util import spread
    from distributed_file_system_with_stream_processing_spark.plans.llm_ops2 import (
        _KM_ITERS,
    )

    from distributed_file_system_with_stream_processing_spark.plans import _backbones as B

    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(F.col("vec_id").alias("id"), V.as_double(F.col("embedding")).alias("v"))
    base = e.filter(F.col("id") >= 10)
    # r8: the shared session-trained IVF centroids (see
    # ann_probe_recall_curve) — same k/iters/base as ann_ivf_trained
    cents = B.kmeans_centroids(
        spark, sf_dir, k=_ICB_CELLS, iters=_KM_ITERS, min_id=10
    )
    cells = spread(base).selectExpr(f"{C._argmin_expr('v', cents)} AS cell")
    agg = cells.groupBy("cell").agg(F.count(F.lit(1)).alias("n_vectors"))
    total = F.sum("n_vectors").over(Window.partitionBy())
    # r8 conversion: share and balance are exact truncating
    # integer-division quotients of the cell counts
    return agg.withColumn("t", total).select(
        F.col("cell").cast("long").alias("cell"),
        "n_vectors",
        (F.expr("(n_vectors * 1000000) div t").cast("double") / 1e6).alias(
            "share"
        ),
        (
            F.expr(f"(n_vectors * {_ICB_CELLS} * 1000000) div t").cast("double")
            / 1e6
        ).alias("balance"),
    )


def _cell_balance_sql() -> str:
    from distributed_file_system_with_stream_processing_spark.plans.llm_ops2 import (
        _KM_ITERS,
        _kmeans_oracle_parts,
    )

    parts = _kmeans_oracle_parts(_ICB_CELLS, _KM_ITERS, e_where=" WHERE vec_id >= 10")
    return (
        ",\n".join(parts)
        + f""",
agg AS (SELECT c AS cell, count(*) AS n_vectors FROM fin GROUP BY c)
SELECT CAST(cell AS BIGINT) AS cell, CAST(n_vectors AS BIGINT) AS n_vectors,
       CAST((n_vectors * 1000000) // sum(n_vectors) OVER () AS DOUBLE)
           / 1000000.0 AS share,
       CAST((n_vectors * {_ICB_CELLS} * 1000000) // sum(n_vectors) OVER ()
            AS DOUBLE) / 1000000.0 AS balance
FROM agg
"""
    )


# ---------------------------------------------------------------------------
# shingle_df_histogram

_SDH_CAP = 50  # the registered dedup_ngram_jaccard doc-frequency cap


def shingle_df_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-frequency distribution of 3-shingles in log2 buckets, with
    each bucket's share of POSTINGS mass and the cumulative share the
    registered df≤50 stop-shingle cap (``_SDH_CAP``) would drop — the measured
    justification for the dedup family's quadratic-blowup guard (a
    shingle in f docs contributes C(f,2) join pairs; this table shows
    how much signal mass the cap trades for that bound).

    Exactness: doc frequencies are exact integers (shingle sets are
    per-doc distinct); bucket = floor(log2(df)) computed as integer
    bit-length arithmetic is unavailable, so log2 on the exact double
    int is floor'd identically in both engines; postings mass sums
    exact integers; shares divide once at 6 dp.

    100 TB shape: one (shingle) partial-agg shuffle (high cardinality,
    well spread) + a ≤32-row bucket rollup with windows on the tiny
    aggregate.
    """
    from distributed_file_system_with_stream_processing_spark.operators.dedup import (
        _exploded_shingles,
    )

    d = load_table(spark, sf_dir, "documents")
    ex = _exploded_shingles(d, "doc_id", "text", 3)
    dfreq = ex.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    bucket = F.floor(F.log2(F.col("df").cast("double"))).cast("long")
    agg = dfreq.groupBy(bucket.alias("df_bucket")).agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum("df").alias("postings"),
        F.sum(F.when(F.col("df") > _SDH_CAP, F.col("df")).otherwise(0)).alias(
            "postings_over_cap"
        ),
    )
    w = Window.partitionBy()
    # r8 conversion: shares are exact truncating integer-division
    # quotients of the postings mass
    return agg.withColumn("t", F.sum("postings").over(w)).select(
        "df_bucket",
        "n_shingles",
        F.col("postings").cast("long").alias("postings"),
        (F.expr("(postings * 1000000) div t").cast("double") / 1e6).alias(
            "mass_share"
        ),
        (
            F.expr("(postings_over_cap * 1000000) div t").cast("double") / 1e6
        ).alias("capped_mass_share"),
    )


def _shingle_df_sql() -> str:
    from distributed_file_system_with_stream_processing_spark.plans.llm_ops import (
        _duck_shingles,
    )

    return f"""
WITH sh AS ({_duck_shingles(3)}),
shf AS (SELECT doc_id, sh FROM sh WHERE len(sh) > 0),
ex AS (SELECT doc_id, unnest(sh) AS s FROM shf),
dfreq AS (SELECT s, count(*) AS df FROM ex GROUP BY s),
agg AS (
    SELECT CAST(floor(log2(CAST(df AS DOUBLE))) AS BIGINT) AS df_bucket,
           count(*) AS n_shingles,
           sum(df) AS postings,
           sum(CASE WHEN df > {_SDH_CAP} THEN df ELSE 0 END) AS postings_over_cap
    FROM dfreq GROUP BY 1
)
SELECT df_bucket, CAST(n_shingles AS BIGINT) AS n_shingles,
       CAST(postings AS BIGINT) AS postings,
       CAST((postings * 1000000) // sum(postings) OVER () AS DOUBLE)
           / 1000000.0 AS mass_share,
       CAST((postings_over_cap * 1000000) // sum(postings) OVER () AS DOUBLE)
           / 1000000.0 AS capped_mass_share
FROM agg
"""




# ---------------------------------------------------------------------------
# docs_ppl_percentiles_by_source

_PPS_QS = (50, 90)
_PPS_MICRO = 1_000_000


def docs_ppl_percentiles_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source EXACT percentiles (p50/p90) of per-doc unigram-LM
    log-loss — the threshold-setting table a CCNet-style perplexity
    filter reads: the cutoff is chosen per source/domain (Wenzek et
    al. split head/middle/tail AT per-bucket percentiles), so the
    operational artifact is exactly this, not the global score list
    ``docs_unigram_perplexity`` emits.

    Exactness: per-doc log-loss micro-quantizes through the
    established exact pipeline (per-term log-prob rounded once,
    integer doc fold, one rounded division per doc); percentiles are
    percentile_disc at row ⌈q·n⌉ over the integer score — every
    output an actual corpus value; the display columns divide the
    integers once at 6 dp.

    100 TB shape: the perplexity backbone's three shuffles + one
    source-keyed rank window over the (doc, score) table (the
    percentile_disc shape, exact-auditor caveat documented on
    docs_token_percentiles_by_lang); corpus total on the allow-listed
    1-row broadcast.
    """
    from distributed_file_system_with_stream_processing_spark.functions import text as T
    from distributed_file_system_with_stream_processing_spark.operators._util import spread

    d = spread(load_table(spark, sf_dir, "documents"))
    toks = d.select("doc_id", "source", T.words(F.col("text")).alias("ws"))
    ex = (
        toks.select("doc_id", F.explode_outer("ws").alias("w"))
        .filter(F.col("w").isNotNull())
        .select("doc_id", F.lower(F.col("w")).alias("term"))
    )
    # r10 optimization (the docs_unigram_perplexity rewrite): score
    # per TOKEN against the size-gated-broadcast term-count table —
    # Σ tf·l_mu ≡ Σ_token l_mu and Σ tf ≡ count(*), exact integers
    # either way — removing the corpus-scale (doc, term) Exchange and
    # the per-branch recompute of the tf aggregate.
    from pyspark.sql.functions import broadcast

    from distributed_file_system_with_stream_processing_spark.operators._util import (
        gate_broadcast,
    )

    ct = ex.groupBy("term").agg(F.count(F.lit(1)).alias("ctot"))
    ct, _ = gate_broadcast(ct)
    n_tot = ct.agg(F.sum("ctot").alias("n_corpus"))
    # ok-round: irrational (ln) quantization
    l_mu = F.round(
        F.log(F.col("ctot").cast("double") / F.col("n_corpus")) * _PPS_MICRO
    ).cast("long")
    scored = (
        ex.join(ct, "term")
        .crossJoin(broadcast(n_tot))
        .select("doc_id", l_mu.alias("_l"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_tokens"), F.sum("_l").alias("_s"))
        .select(
            "doc_id",
            # r8 conversion: exact truncating integer division (the
            # rounded rational mean had a real .5 boundary)
            F.expr("-(_s div n_tokens)").cast("long").alias("ll_mu"),
        )
    )
    per = scored.join(
        toks.select("doc_id", "source"), "doc_id"
    )
    w = Window.partitionBy("source").orderBy("ll_mu", "doc_id")
    ranked = per.select(
        "source",
        "ll_mu",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("source")).alias("n"),
    )
    aggs = [F.count(F.lit(1)).alias("n_docs")]
    for q in _PPS_QS:
        at = F.ceil(F.col("n") * q / 100.0).cast("long")
        aggs.append(
            # ok-round: exact micro grid (6 dp)
            F.round(
                F.min(F.when(F.col("rn") == at, F.col("ll_mu"))).cast("double")
                / _PPS_MICRO,
                6,
            ).alias(f"p{q}_logloss")
        )
    return ranked.groupBy("source").agg(*aggs)


def _ppl_pct_sql() -> str:
    from distributed_file_system_with_stream_processing_spark.plans.llm_ops import _WS

    pct = ", ".join(
        # ok-round: exact micro grid (6 dp) — and ceil(n·q/100) is an
        # exact small-rational ceiling, identical in both engines
        f"round(CAST(min(CASE WHEN rn = CAST(ceil(n * {q} / 100.0) AS BIGINT)"
        f" THEN ll_mu END) AS DOUBLE) / {_PPS_MICRO}, 6) AS p{q}_logloss"
        for q in _PPS_QS
    )
    return rf"""
WITH toks AS (SELECT doc_id, source, {_WS} AS ws FROM documents),
ex AS (SELECT doc_id, lower(unnest(ws)) AS term FROM toks),
tf AS (SELECT doc_id, term, count(*) AS tf FROM ex GROUP BY doc_id, term),
ct AS (SELECT term, sum(tf) AS ctot FROM tf GROUP BY term),
nc AS (SELECT sum(ctot) AS n_corpus FROM ct),
scored AS (
    SELECT tf.doc_id,
           -- inner round: ok-round: irrational (ln) quantization
           -(sum(tf.tf * CAST(round(ln(CAST(ct.ctot AS DOUBLE) / nc.n_corpus)
                                    * {_PPS_MICRO}) AS BIGINT))
             // sum(tf.tf)) AS ll_mu
    FROM tf JOIN ct USING (term) CROSS JOIN nc
    GROUP BY tf.doc_id
),
per AS (
    SELECT t.source, s.ll_mu, s.doc_id
    FROM scored s JOIN toks t USING (doc_id)
),
ranked AS (
    SELECT source, ll_mu,
           row_number() OVER (PARTITION BY source ORDER BY ll_mu, doc_id) AS rn,
           count(*) OVER (PARTITION BY source) AS n
    FROM per
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs, {pct}
FROM ranked GROUP BY source
"""


# ---------------------------------------------------------------------------
# source_neardup_matrix


def source_neardup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source NEAR-dup matrix: MinHash-LSH candidate pairs
    rolled up by (source_a, source_b) — who mirrors whom at the
    near-dup level, the fuzzy complement of ``cross_source_leakage``
    (which catches only byte-identical text across sources). The
    off-diagonal cells are the contamination/syndication map a mixing
    owner reads before weighting sources independently.

    Semantics: source pair is ordered lexicographically (least,
    greatest) so a pair is one cell regardless of doc-id order; counts
    are exact integers over the deterministic candidate set.

    100 TB shape: the banded minhash self-join (never all-pairs) +
    two broadcast-able doc→source attachments on the PAIR-scale table
    + a |sources|²-cap rollup.
    """
    docs = load_table(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_pairs(docs).select("doc_id_a", "doc_id_b")
    src = docs.select("doc_id", "source")
    a = src.select(F.col("doc_id").alias("doc_id_a"), F.col("source").alias("sa"))
    b = src.select(F.col("doc_id").alias("doc_id_b"), F.col("source").alias("sb"))
    return (
        pairs.join(a, "doc_id_a")
        .join(b, "doc_id_b")
        .groupBy(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


def _source_neardup_sql() -> str:
    from distributed_file_system_with_stream_processing_spark.plans.llm_ops import (
        _MINHASH_PAIRS_BODY,
    )

    return (
        _MINHASH_PAIRS_BODY
        + """,
src AS (SELECT doc_id, source FROM documents)
SELECT least(x.source, y.source) AS source_a,
       greatest(x.source, y.source) AS source_b,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM cand
JOIN src x ON cand.da = x.doc_id
JOIN src y ON cand.db = y.doc_id
GROUP BY 1, 2
"""
    )




# ---------------------------------------------------------------------------
# events_survival_curve

_SURV_DAYS = (1, 3, 7, 14)


def events_survival_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User survival curve: the share of users whose activity span
    (last event day − first event day) reaches at least d days, for
    d ∈ {1, 3, 7, 14} — the retention headline the cohort matrix
    summarizes per cohort and this collapses corpus-wide (S(d) is the
    number product reviews quote: "day-7 retention").

    Exactness: days are integer epoch-day floors; spans exact integer
    differences; each user contributes to every threshold ≤ its span
    via the filtered-literal-array explode (the cumulative-curve
    trick on a non-contiguous grid); shares divide exact integers
    once at 6 dp. The user total rides the allow-listed 1-row
    BuildRight broadcast.

    100 TB shape: one user_id partial-agg shuffle (first/last fold),
    then a ≤4-row rollup — no window, no second corpus pass.
    """
    e = load_table(spark, sf_dir, "events")
    day = F.floor(F.col("ts").cast("long") / 86400).cast("long")
    spans = e.groupBy("user_id").agg(
        (F.max(day) - F.min(day)).alias("span_days")
    )
    tot = spans.agg(F.count(F.lit(1)).alias("n_users"))
    thresholds = F.array(*[F.lit(d) for d in _SURV_DAYS])
    curve = (
        spans.select(
            F.explode(
                F.filter(thresholds, lambda t: t <= F.col("span_days"))
            ).alias("day")
        )
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n_surviving"))
    )
    grid = spark.createDataFrame(
        [(d,) for d in _SURV_DAYS], "day int"
    )
    return (
        grid.join(curve, "day", "left")
        .crossJoin(broadcast(tot))
        .select(
            F.col("day").cast("long").alias("day"),
            F.coalesce("n_surviving", F.lit(0)).cast("long").alias("n_surviving"),
            F.col("n_users").cast("long").alias("n_users"),
            # r8 conversion: exact truncating integer-division rate
            (
                F.expr("(coalesce(n_surviving, 0) * 1000000) div n_users")
                .cast("double") / 1e6
            ).alias("survival"),
        )
    )


EVENTS_SURVIVAL_SQL = f"""
WITH spans AS (
    SELECT user_id,
           max(epoch_us(ts) // 1000000 // 86400)
           - min(epoch_us(ts) // 1000000 // 86400) AS span_days
    FROM events GROUP BY user_id
),
tot AS (SELECT count(*) AS n_users FROM spans),
curve AS (
    SELECT t.d AS day, count(*) AS n_surviving
    FROM spans s JOIN (SELECT unnest({list(_SURV_DAYS)}) AS d) t
      ON t.d <= s.span_days
    GROUP BY t.d
)
SELECT CAST(g.d AS BIGINT) AS day,
       CAST(coalesce(c.n_surviving, 0) AS BIGINT) AS n_surviving,
       CAST(tot.n_users AS BIGINT) AS n_users,
       CAST((coalesce(c.n_surviving, 0) * 1000000) // tot.n_users AS DOUBLE)
           / 1000000.0 AS survival
FROM (SELECT unnest({list(_SURV_DAYS)}) AS d) g
LEFT JOIN curve c ON g.d = c.day
CROSS JOIN tot
"""


# ---------------------------------------------------------------------------
# customer_revenue_gini


def customer_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue — the single
    concentration number next to the Pareto top-k% shares and the
    HHI: G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n over revenue sorted
    ascending (the exact rank formula, no binning).

    Exactness: revenue is exact integer cents per customer; ranks
    come from a deterministic (cents, custkey) order; Σ rank·cents
    folds in DECIMAL(38,0) ↔ HUGEINT; the final expression evaluates
    once on exact integers and rounds at 6 dp.

    100 TB shape: one custkey partial-agg shuffle, then a GLOBAL rank
    over the per-customer table — the single-partition sort is this
    query's honest cost (the percentile_disc caveat): it is the exact
    AUDITOR; ``events_pareto_users``/``nation_revenue_hhi`` are the
    scale-path concentration reads.
    """
    o = load_table(spark, sf_dir, "orders")
    per = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents")
    )
    w = Window.orderBy("cents", "o_custkey")
    ranked = per.select(
        "cents", F.row_number().over(w).cast("long").alias("rk")
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    agg = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("s"),
        F.sum(dec("rk") * dec("cents")).alias("rs"),
    )
    n = F.col("n").cast("double")
    # r8 conversion: gini = (2·rs − (n+1)·s)/(n·s) is ONE exact
    # rational of the integer fold — truncating integer division at
    # 6 dp in DECIMAL(38,0) (the llm_ops17 source-Gini idiom)
    gini_mu = F.expr(
        "((2 * rs - (cast(n as decimal(38,0)) + 1) * s) * 1000000)"
        " div (cast(n as decimal(38,0)) * s)"
    )
    return agg.select(
        F.col("n").cast("long").alias("n_customers"),
        # ok-round: exact cents grid (2 dp)
        F.round(F.col("s") / 100.0, 2).alias("total_revenue"),
        (gini_mu.cast("double") / 1e6).alias("gini"),
    )


CUSTOMER_GINI_SQL = """
WITH per AS (
    SELECT o_custkey,
           sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
    FROM orders GROUP BY o_custkey
),
ranked AS (
    SELECT cents,
           row_number() OVER (ORDER BY cents, o_custkey) AS rk
    FROM per
),
agg AS (
    SELECT count(*) AS n, sum(cents) AS s,
           sum(CAST(rk AS HUGEINT) * cents) AS rs
    FROM ranked
)
SELECT CAST(n AS BIGINT) AS n_customers,
       -- ok-round: exact cents grid (2 dp)
       round(s / 100.0, 2) AS total_revenue,
       CAST(((2 * rs - (CAST(n AS HUGEINT) + 1) * s) * 1000000)
            // (CAST(n AS HUGEINT) * s) AS DOUBLE) / 1000000.0 AS gini
FROM agg
"""


# ---------------------------------------------------------------------------
# supplier_single_source_parts


def supplier_single_source_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supply-chain risk histogram: how many parts have been shipped
    by exactly k distinct suppliers (k = 1 is the single-source risk
    list every procurement review starts from), with each bucket's
    share of the part population.

    Exactness: distinct-supplier counts and the histogram are exact
    integers; shares divide once at 6 dp (window over the tiny
    histogram).

    100 TB shape: one (partkey, suppkey) distinct shuffle, a partkey
    rollup on the deduplicated (strictly smaller) set, then a
    ≤|suppliers|-row histogram.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    per = (
        li.distinct()
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    hist = per.groupBy("n_suppliers").agg(F.count(F.lit(1)).alias("n_parts"))
    # r8 conversion: exact truncating integer-division share
    return hist.withColumn(
        "t", F.sum("n_parts").over(Window.partitionBy())
    ).select(
        F.col("n_suppliers").cast("long").alias("n_suppliers"),
        "n_parts",
        (F.expr("(n_parts * 1000000) div t").cast("double") / 1e6).alias(
            "share"
        ),
    )


SUPPLIER_SINGLE_SOURCE_SQL = """
WITH per AS (
    SELECT l_partkey, count(DISTINCT l_suppkey) AS n_suppliers
    FROM lineitem GROUP BY l_partkey
),
h AS (SELECT n_suppliers, count(*) AS n_parts FROM per GROUP BY n_suppliers)
SELECT CAST(n_suppliers AS BIGINT) AS n_suppliers,
       CAST(n_parts AS BIGINT) AS n_parts,
       CAST((n_parts * 1000000) // sum(n_parts) OVER () AS DOUBLE)
           / 1000000.0 AS share
FROM h
"""


QUERIES = {
    "query_likelihood_topk": query_likelihood_topk,
    "docs_token_percentiles_by_lang": docs_token_percentiles_by_lang,
    "docs_template_shingles": docs_template_shingles,
    "events_ab_conversion": events_ab_conversion,
    "events_ab_value_ttest": events_ab_value_ttest,
    "ann_probe_recall_curve": ann_probe_recall_curve,
    "ivf_cell_balance": ivf_cell_balance,
    "shingle_df_histogram": shingle_df_histogram,
    "docs_ppl_percentiles_by_source": docs_ppl_percentiles_by_source,
    "source_neardup_matrix": source_neardup_matrix,
    "events_survival_curve": events_survival_curve,
    "customer_revenue_gini": customer_revenue_gini,
    "supplier_single_source_parts": supplier_single_source_parts,
}

ORACLES = {
    "query_likelihood_topk": _ql_sql(),
    "docs_token_percentiles_by_lang": DOCS_TOKEN_PCT_SQL,
    "docs_template_shingles": _template_sql(),
    "events_ab_conversion": EVENTS_AB_CONVERSION_SQL,
    "events_ab_value_ttest": EVENTS_AB_TTEST_SQL,
    "ann_probe_recall_curve": _probe_recall_sql(),
    "ivf_cell_balance": _cell_balance_sql(),
    "shingle_df_histogram": _shingle_df_sql(),
    "docs_ppl_percentiles_by_source": _ppl_pct_sql(),
    "source_neardup_matrix": _source_neardup_sql(),
    "events_survival_curve": EVENTS_SURVIVAL_SQL,
    "customer_revenue_gini": CUSTOMER_GINI_SQL,
    "supplier_single_source_parts": SUPPLIER_SINGLE_SOURCE_SQL,
}
