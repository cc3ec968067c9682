"""Round-8 batch I: the attribution family's BATCH queries (their
streaming twins ``LastTouchOp`` / ``LinearAttributionOp`` landed in r7
with batch plans exercised only by parity tests) and the per-source
Heaps-law exponent screen.

Same contract as the other ``llm_ops*`` modules: declarative DataFrame
plans (JVM expressions only) with DuckDB oracles mirroring the exact
arithmetic. Shares/means are exact truncating integer-division
quotients (Spark ``div`` ≡ DuckDB ``//``, toward zero) — the r7/r8
conversion idiom; ``k = exp(·)`` stays a ``round()`` (irrational
family, no grid boundary to land on).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from distributed_file_system_with_stream_processing_spark.operators._util import spread
from distributed_file_system_with_stream_processing_spark.functions import text as T
from distributed_file_system_with_stream_processing_spark.plans.llm_ops import _WS
from distributed_file_system_with_stream_processing_spark.sources.tables import load_table

_MICRO = 1_000_000

# the events epoch idiom shared with llm_ops18 (events.ts is MICROS
# or NANOS depending on testdata generation; load_table normalizes,
# so cast to long is epoch seconds in both engines)
_EPOCH = "CAST(epoch(ts) AS BIGINT)"
_ATT_WINDOW_S = 24 * 3600


# ---------------------------------------------------------------------------
# events_last_touch_attribution


def events_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAST-touch attribution: each purchase credited to the LATEST
    event type the user emitted in the 24 h before it (ties: higher
    event_id; nothing prior → 'direct') — the complement of
    ``events_first_touch_attribution`` and the batch face of r7's
    streaming ``LastTouchOp`` (this IS the op's batch plan, so the
    op-vs-query parity is by construction, plus the share epilogue).

    100 TB shape: identical to first-touch — a user-co-partitioned
    purchases × prior-events range join (candidates bounded by 24 h of
    one user's activity), one window to pick the touch, a type-keyed
    rollup, share via a 1-row broadcast."""
    from distributed_file_system_with_stream_processing_spark.streaming.ops import (
        LastTouchOp,
    )

    e = load_table(spark, sf_dir, "events")
    agg = LastTouchOp(name="q_last_touch", window_s=_ATT_WINDOW_S)(e)
    tot = agg.agg(F.sum("delta").alias("t"))
    return agg.crossJoin(broadcast(tot)).select(
        "attributed_type",
        F.col("delta").cast("long").alias("n_purchases"),
        # exact truncating integer-division share (div ≡ //)
        (F.expr("(delta * 1000000) div t").cast("double") / 1e6).alias("share"),
    )


EVENTS_LAST_TOUCH_SQL = f"""
WITH ev AS (
    SELECT user_id, event_type, {_EPOCH} AS sec, event_id FROM events
),
purch AS (
    SELECT user_id, sec AS p_sec, event_id AS p_id
    FROM ev WHERE event_type = 'purchase'
),
j AS (
    SELECT p.user_id, p.p_id, t.event_type AS t_type,
           row_number() OVER (PARTITION BY p.user_id, p.p_id
                              ORDER BY t.sec DESC, t.event_id DESC) AS rn
    FROM purch p LEFT JOIN ev t
      ON t.user_id = p.user_id
     AND t.sec >= p.p_sec - {_ATT_WINDOW_S}
     AND (t.sec < p.p_sec OR (t.sec = p.p_sec AND t.event_id < p.p_id))
),
att AS (
    SELECT coalesce(t_type, 'direct') AS attributed_type
    FROM j WHERE rn = 1
),
agg AS (SELECT attributed_type, count(*) AS n FROM att GROUP BY attributed_type)
SELECT attributed_type, CAST(n AS BIGINT) AS n_purchases,
       CAST((n * 1000000) // (SELECT sum(n) FROM agg) AS DOUBLE) / 1000000.0
           AS share
FROM agg
"""


# ---------------------------------------------------------------------------
# events_linear_attribution


def events_linear_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINEAR (equal-split) attribution: each purchase splits exactly
    10⁶ micro-credits across every event in its 24 h window — floor
    share per candidate, remainder to the EARLIEST, so per-purchase
    credit conserves EXACTLY in integer arithmetic (Σ credit_micro =
    10⁶ · #purchases, the invariant the streaming twin's property
    tests pin over 400 hypothesis cases). This IS r7's
    ``LinearAttributionOp`` batch plan plus the share epilogue.

    100 TB shape: the first-touch range join + two windows over the
    SAME (user_id, p_id) partitioning (count + row_number — one
    shuffle), a type-keyed rollup, share via a 1-row broadcast."""
    from distributed_file_system_with_stream_processing_spark.streaming.ops import (
        LinearAttributionOp,
    )

    e = load_table(spark, sf_dir, "events")
    agg = LinearAttributionOp(name="q_linear_att", window_s=_ATT_WINDOW_S)(e)
    tot = agg.agg(F.sum("delta_micro").alias("t"))
    return agg.crossJoin(broadcast(tot)).select(
        "attributed_type",
        F.col("delta_micro").cast("long").alias("credit_micro"),
        # exact truncating integer-division share of total credit
        (F.expr("(delta_micro * 1000000) div t").cast("double") / 1e6).alias(
            "share"
        ),
    )


EVENTS_LINEAR_ATT_SQL = f"""
WITH ev AS (
    SELECT user_id, event_type, {_EPOCH} AS sec, event_id FROM events
),
purch AS (
    SELECT user_id, sec AS p_sec, event_id AS p_id
    FROM ev WHERE event_type = 'purchase'
),
j AS (
    SELECT p.user_id, p.p_id, t.event_type AS t_type,
           t.sec AS t_sec, t.event_id AS t_id
    FROM purch p LEFT JOIN ev t
      ON t.user_id = p.user_id
     AND t.sec >= p.p_sec - {_ATT_WINDOW_S}
     AND (t.sec < p.p_sec OR (t.sec = p.p_sec AND t.event_id < p.p_id))
),
win AS (
    SELECT t_type,
           count(t_type) OVER (PARTITION BY user_id, p_id) AS n,
           row_number() OVER (PARTITION BY user_id, p_id
                              ORDER BY t_sec ASC, t_id ASC) AS rn
    FROM j
),
cred AS (
    SELECT coalesce(t_type, 'direct') AS attributed_type,
           CASE WHEN t_type IS NULL THEN {_MICRO}
                WHEN rn = 1 THEN ({_MICRO} // n) + ({_MICRO} - ({_MICRO} // n) * n)
                ELSE {_MICRO} // n END AS credit
    FROM win
),
agg AS (SELECT attributed_type, sum(credit) AS c FROM cred GROUP BY attributed_type)
SELECT attributed_type, CAST(c AS BIGINT) AS credit_micro,
       CAST((c * 1000000) // (SELECT sum(c) FROM agg) AS DOUBLE) / 1000000.0
           AS share
FROM agg
"""


# ---------------------------------------------------------------------------
# docs_heaps_exponent_by_source

_HBS_DECILES = 10


def docs_heaps_exponent_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-SOURCE Heaps-law exponent β (V = K·N^β fit per source) —
    the data-mixing companion of the corpus-level
    ``docs_heaps_exponent``: a source whose β stays near 1 keeps
    minting new types (ids, noise, OCR junk) while a saturating
    source's β falls well below 1; read next to the OOV and
    burstiness screens when weighting sources.

    Same arithmetic-checkpoint design as the global query (id-range
    deciles per source — never an order statistic, nothing globally
    sorts): per-source (min, max) fold → 10 checkpoint rows per
    source (broadcast), first-occurrence = min(doc_id) per (source,
    token), cumulative counts via ≤-joins against the checkpoint
    broadcast, then a per-source 10-point OLS on micro-quantized
    (ln N, ln V). β is an exact rational of the integer OLS sums,
    truncating-divided in DECIMAL(38,0)/HUGEINT; k = exp(·) stays a
    round() (irrational family). Degenerate sources (zero OLS
    variance) drop via the den > 0 guard in BOTH engines."""
    d = spread(load_table(spark, sf_dir, "documents"))
    toks = d.select(
        "source",
        "doc_id",
        F.explode_outer(T.words(F.col("text"))).alias("w"),
    ).filter(F.col("w").isNotNull())
    per_doc = toks.groupBy("source", "doc_id").agg(
        F.count(F.lit(1)).alias("n_tok")
    )
    bounds = d.groupBy("source").agg(
        F.min("doc_id").alias("mn"), F.max("doc_id").alias("mx")
    )
    cps = bounds.select(
        "source",
        F.explode(F.sequence(F.lit(1), F.lit(_HBS_DECILES))).alias("dec"),
        "mn",
        "mx",
    ).select(
        "source",
        "dec",
        (
            F.col("mn")
            + F.floor((F.col("mx") - F.col("mn") + 1) * F.col("dec") / _HBS_DECILES)
            - 1
        ).alias("cp"),
    )
    fo = toks.groupBy("source", "w").agg(F.min("doc_id").alias("fo"))
    cum_tok = (
        per_doc.join(
            broadcast(cps),
            (per_doc.source == cps.source) & (per_doc.doc_id <= cps.cp),
        )
        .drop(cps.source)
        .groupBy("source", "dec")
        .agg(F.sum("n_tok").alias("cum_tokens"))
    )
    cum_voc = (
        fo.join(broadcast(cps), (fo.source == cps.source) & (fo.fo <= cps.cp))
        .drop(cps.source)
        .groupBy("source", "dec")
        .agg(F.count(F.lit(1)).alias("cum_vocab"))
    )
    curve = cum_tok.join(cum_voc, ["source", "dec"])
    lx = F.round(F.log(F.col("cum_tokens").cast("double")) * _MICRO).cast("long")
    ly = F.round(F.log(F.col("cum_vocab").cast("double")) * _MICRO).cast("long")
    pts = curve.filter(
        (F.col("cum_tokens") > 0) & (F.col("cum_vocab") > 0)
    ).select("source", lx.alias("lx"), ly.alias("ly"))
    s = pts.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("lx").alias("sx"),
        F.sum("ly").alias("sy"),
        F.sum(F.col("lx") * F.col("ly")).alias("sxy"),
        F.sum(F.col("lx") * F.col("lx")).alias("sxx"),
    )
    nd = F.col("n").cast("double")
    beta_dbl = (nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")) / (
        nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    )
    intercept = (
        F.col("sy").cast("double") / _MICRO - beta_dbl * F.col("sx") / _MICRO
    ) / nd
    beta6 = (
        F.expr(
            "((cast(n as decimal(38,0)) * sxy - cast(sx as decimal(38,0)) * sy)"
            " * 1000000) div (cast(n as decimal(38,0)) * sxx"
            " - cast(sx as decimal(38,0)) * sx)"
        ).cast("double")
        / 1e6
    )
    den = F.expr(
        "cast(n as decimal(38,0)) * sxx - cast(sx as decimal(38,0)) * sx"
    )
    return s.filter(den > 0).select(
        "source",
        F.col("n").cast("long").alias("n_points"),
        beta6.alias("beta"),
        F.round(F.exp(intercept), 6).alias("k"),
    )


DOCS_HEAPS_BY_SOURCE_SQL = rf"""
WITH toks AS (
    SELECT source, doc_id, unnest({_WS}) AS w FROM documents
),
per_doc AS (
    SELECT source, doc_id, count(*) AS n_tok FROM toks GROUP BY source, doc_id
),
bounds AS (
    SELECT source, min(doc_id) AS mn, max(doc_id) AS mx
    FROM documents GROUP BY source
),
cps AS (
    SELECT source, dec,
           mn + CAST(floor((mx - mn + 1) * dec / {_HBS_DECILES}.0) AS BIGINT)
              - 1 AS cp
    FROM bounds CROSS JOIN (
        SELECT unnest(range(1, {_HBS_DECILES} + 1)) AS dec
    )
),
fo AS (SELECT source, w, min(doc_id) AS fo FROM toks GROUP BY source, w),
cum_tok AS (
    SELECT c.source, c.dec, sum(p.n_tok) AS cum_tokens
    FROM per_doc p JOIN cps c ON p.source = c.source AND p.doc_id <= c.cp
    GROUP BY c.source, c.dec
),
cum_voc AS (
    SELECT c.source, c.dec, count(*) AS cum_vocab
    FROM fo f JOIN cps c ON f.source = c.source AND f.fo <= c.cp
    GROUP BY c.source, c.dec
),
curve AS (
    SELECT t.source, t.dec, t.cum_tokens, v.cum_vocab
    FROM cum_tok t JOIN cum_voc v ON t.source = v.source AND t.dec = v.dec
),
pts AS (
    SELECT source,
           CAST(round(ln(CAST(cum_tokens AS DOUBLE)) * {_MICRO}) AS BIGINT) AS lx,
           CAST(round(ln(CAST(cum_vocab AS DOUBLE)) * {_MICRO}) AS BIGINT) AS ly
    FROM curve WHERE cum_tokens > 0 AND cum_vocab > 0
),
s AS (
    SELECT source, count(*) AS n, sum(lx) AS sx, sum(ly) AS sy,
           sum(lx * ly) AS sxy, sum(lx * lx) AS sxx
    FROM pts GROUP BY source
)
SELECT source, CAST(n AS BIGINT) AS n_points,
       CAST(((CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy) * 1000000)
            // (CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx) AS DOUBLE)
           / 1000000.0 AS beta,
       -- ok-round: irrational (exp/ln family, no grid boundary)
       round(exp((CAST(sy AS DOUBLE) / {_MICRO}
                  - ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                     / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx))
                    * sx / {_MICRO}) / n), 6) AS k
FROM s
WHERE CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx > 0
"""


QUERIES = {
    "events_last_touch_attribution": events_last_touch_attribution,
    "events_linear_attribution": events_linear_attribution,
    "docs_heaps_exponent_by_source": docs_heaps_exponent_by_source,
}

ORACLES = {
    "events_last_touch_attribution": EVENTS_LAST_TOUCH_SQL,
    "events_linear_attribution": EVENTS_LINEAR_ATT_SQL,
    "docs_heaps_exponent_by_source": DOCS_HEAPS_BY_SOURCE_SQL,
}
