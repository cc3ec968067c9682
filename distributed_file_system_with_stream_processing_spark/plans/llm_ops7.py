"""Round-5 query module: rate/burst windows, dedup threshold pricing,
embedding drift, and growth series.

Same contract as ``llm_ops``…``llm_ops6``: declarative DataFrame plans
(JVM expressions only) with DuckDB oracles mirroring the exact
arithmetic, so value hashes match without tolerances.

Ops here (all oracled):
- ``events_peak_rate`` — per-user peak 1-hour event rate via a RANGE
  (time-interval) window frame: the burst detector a rate-limiter or
  abuse screen runs; first RANGE-frame window in the surface (every
  prior window op is rows-based or tumbling).
- ``simhash_threshold_sweep`` — docs dropped by keep-first simhash
  dedup AS A FUNCTION of the hamming threshold (0..3): prices each
  threshold choice before committing a dedup run.
- ``embedding_label_drift`` — pairwise cosine between per-label
  embedding centroids: the class-separation drift audit that catches
  label collapse (two classes' centroids converging) before a
  classifier trusts the space.
- ``orders_monthly_growth`` — month-over-month revenue growth on the
  integer-cents monthly series (lag window over an aggregated series).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from distributed_file_system_with_stream_processing_spark.operators import dedup as D
from distributed_file_system_with_stream_processing_spark.operators._util import (
    plan_ckpt as _plan_ckpt,
)
from distributed_file_system_with_stream_processing_spark.operators._util import spread
from distributed_file_system_with_stream_processing_spark.plans.llm_ops import (
    DEDUP_SIMHASH_SQL,
)
from distributed_file_system_with_stream_processing_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# events_peak_rate

_PEAK_WINDOW_S = 3600


def events_peak_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user PEAK 1-hour event rate: the max number of events in
    any trailing 3600-second window ending at one of the user's own
    events — the burst statistic a rate limiter, abuse screen, or
    crawler-detection pass computes, and the exact answer the common
    tumbling-window approximation (which splits bursts across bucket
    boundaries) under-counts.

    Plan: ONE shuffle on user_id; the RANGE frame (epoch-second
    ordering, ``rangeBetween(-3599, 0)``) counts peers inside the
    trailing hour per event, then the per-user max reuses the window's
    hash partitioning (no second Exchange — the groupBy key equals the
    window partition key).

    Exactness: epoch seconds via integer floor division of the stored
    microseconds (Spark ``cast(ts AS long)`` ↔ DuckDB
    ``epoch_us(ts) // 1000000`` — both floor), integer counts; RANGE
    peers make within-second order irrelevant.

    100 TB shape: per-user event lists sort within their partition
    (the window sort); no corpus-scale state beyond the one shuffle —
    the same census as events_sessionize. Skewed hot users are a
    bounded window state (an hour of one user's events), not a
    cross-partition hotspot.
    """
    e = load_table(spark, sf_dir, "events")
    sec = F.col("ts").cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy(sec)
        .rangeBetween(-(_PEAK_WINDOW_S - 1), 0)
    )
    counted = e.select(
        "user_id", F.count(F.lit(1)).over(w).alias("c1h")
    )
    return counted.groupBy("user_id").agg(
        F.max("c1h").cast("long").alias("peak_1h"),
        F.count(F.lit(1)).alias("n_events"),
    )


EVENTS_PEAK_RATE_SQL = f"""
WITH w AS (
    SELECT user_id,
           count(*) OVER (
               PARTITION BY user_id
               ORDER BY epoch_us(ts) // 1000000
               RANGE BETWEEN {_PEAK_WINDOW_S - 1} PRECEDING AND CURRENT ROW
           ) AS c1h
    FROM events
)
SELECT user_id, CAST(max(c1h) AS BIGINT) AS peak_1h,
       CAST(count(*) AS BIGINT) AS n_events
FROM w GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# simhash_threshold_sweep

_SWEEP_MAX_HAMMING = 3


def simhash_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-rate pricing curve: for each hamming threshold h in
    0..``_SWEEP_MAX_HAMMING``, how many docs keep-first simhash dedup
    would DROP (docs with a lower-id pair at hamming ≤ h) and how many
    candidate pairs are in play — the decision table a dedup owner
    reads to pick a threshold BEFORE running the full pipeline, built
    from one pass of the proven ``simhash_pairs`` backbone.

    Cumulative counts WITHOUT re-running per threshold: each dropped
    doc contributes a row for every threshold ≥ its MINIMUM pair
    hamming (``explode(sequence(min_h, 3))``), so one groupBy yields
    the whole curve; same trick for pairs. Exact integers end to end.

    100 TB shape: the banded simhash self-join (pigeonhole chunks, no
    all-pairs) + two pair-scale aggregations + a 4-row output. The
    curve costs one dedup run, not four.
    """
    pairs = D.simhash_pairs(
        load_table(spark, sf_dir, "documents"), n=3, max_hamming=_SWEEP_MAX_HAMMING
    )
    # r10: eager checkpoint instead of the lazy persist — dropped and
    # pair_curve materialize in ONE final job, and a cache populated
    # mid-job does not stop the second branch from re-running the
    # corpus-scale banded self-join. The truncation runs it once (and
    # honors the reliable-checkpoint switch).
    pairs = _plan_ckpt(pairs)
    thresholds = F.explode(
        F.sequence(F.col("mh"), F.lit(_SWEEP_MAX_HAMMING))
    ).alias("threshold")
    dropped = (
        pairs.select(F.col("doc_id_b").alias("drop_id"), "hamming")
        .groupBy("drop_id")
        .agg(F.min("hamming").alias("mh"))
        .select(thresholds)
        .groupBy("threshold")
        .agg(F.count(F.lit(1)).alias("n_dropped"))
    )
    pair_curve = (
        pairs.select(F.explode(F.sequence(F.col("hamming"), F.lit(_SWEEP_MAX_HAMMING))).alias("threshold"))
        .groupBy("threshold")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
    grid = spark.range(_SWEEP_MAX_HAMMING + 1).select(
        F.col("id").cast("int").alias("threshold")
    )
    return (
        grid.join(dropped, "threshold", "left")
        .join(pair_curve, "threshold", "left")
        .select(
            F.col("threshold").cast("long").alias("threshold"),
            F.coalesce("n_dropped", F.lit(0)).cast("long").alias("n_dropped"),
            F.coalesce("n_pairs", F.lit(0)).cast("long").alias("n_pairs"),
        )
    )


_SIMHASH_PAIRS_BODY = DEDUP_SIMHASH_SQL.split("SELECT a.doc_id AS doc_id_a")[0]

SIMHASH_THRESHOLD_SWEEP_SQL = (
    _SIMHASH_PAIRS_BODY
    + f""",
p AS (
    SELECT a.doc_id AS da, b.doc_id AS db,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
    FROM sim a JOIN sim b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {_SWEEP_MAX_HAMMING}
),
mins AS (SELECT db AS drop_id, min(hamming) AS mh FROM p GROUP BY db),
dropped AS (
    SELECT t.threshold, count(*) AS n_dropped
    FROM mins m JOIN (SELECT unnest(range(0, {_SWEEP_MAX_HAMMING + 1})) AS threshold) t
      ON t.threshold >= m.mh
    GROUP BY t.threshold
),
pc AS (
    SELECT t.threshold, count(*) AS n_pairs
    FROM p JOIN (SELECT unnest(range(0, {_SWEEP_MAX_HAMMING + 1})) AS threshold) t
      ON t.threshold >= p.hamming
    GROUP BY t.threshold
)
SELECT CAST(g.threshold AS BIGINT) AS threshold,
       CAST(coalesce(d.n_dropped, 0) AS BIGINT) AS n_dropped,
       CAST(coalesce(pc.n_pairs, 0) AS BIGINT) AS n_pairs
FROM (SELECT unnest(range(0, {_SWEEP_MAX_HAMMING + 1})) AS threshold) g
LEFT JOIN dropped d ON g.threshold = d.threshold
LEFT JOIN pc ON g.threshold = pc.threshold
"""
)


# ---------------------------------------------------------------------------
# embedding_label_drift

_DRIFT_DIM = 64
_DRIFT_MICRO = 1_000_000


def embedding_label_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise cosine between per-label embedding centroids — the
    class-separation audit completing the embedding-QA family
    (margin stats give the aggregate intra/inter number; this names
    WHICH label pairs are collapsing). A pair drifting toward cosine
    1.0 means the encoder no longer separates those classes.

    Exactness (the kmeans convention): per-label component sums are
    exact micro-unit integers; each centroid component divides back
    as ``(s / 1e6) / n`` (the oracle-identical two-division
    sequence); the dot/norm reductions run sequentially left-to-right
    over the 64 dims in both engines (zip_with/aggregate ↔
    list_sum(list_transform) — the established lockstep), and ONLY
    the final cosine rounds (6 dp).

    100 TB shape: one label-keyed partial-agg shuffle (|labels|·dim
    integers of state), then a |labels|²-row self-join on the
    METADATA-scale centroid table — the corpus is touched once.
    """
    e = load_table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    sums = (
        spread(e)
        .select(F.col("label").cast("long").alias("label"), v.alias("v"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            *[
                F.sum(
                    F.round(F.element_at("v", i + 1) * _DRIFT_MICRO).cast("long")
                ).alias(f"s{i}")
                for i in range(_DRIFT_DIM)
            ],
        )
    )
    cent = sums.select(
        "label",
        F.array(
            *[
                (F.col(f"s{i}") / F.lit(float(_DRIFT_MICRO))) / F.col("n")
                for i in range(_DRIFT_DIM)
            ]
        ).alias("c"),
    )
    # r10 optimization: the |labels|²-pair self-join references `cent`
    # twice, and per-branch pruning defeats AQE stage reuse — the
    # corpus-scale 64-sum aggregation ran once per join side.
    # Checkpointing the METADATA-scale centroid table (|labels| rows)
    # runs the corpus pass once per invocation.
    cent = _plan_ckpt(cent)
    x, y = cent.alias("x"), cent.alias("y")
    dot = F.aggregate(
        F.zip_with(F.col("x.c"), F.col("y.c"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )
    nx = F.sqrt(
        F.aggregate(
            F.transform(F.col("x.c"), lambda a: a * a),
            F.lit(0.0),
            lambda acc, t: acc + t,
        )
    )
    ny = F.sqrt(
        F.aggregate(
            F.transform(F.col("y.c"), lambda a: a * a),
            F.lit(0.0),
            lambda acc, t: acc + t,
        )
    )
    return (
        x.join(y, F.col("x.label") < F.col("y.label"))
        .select(
            F.col("x.label").alias("label_a"),
            F.col("y.label").alias("label_b"),
            # ok-round: irrational (sqrt norms)
            F.round(dot / (nx * ny), 6).alias("cosine"),
        )
    )


def _drift_sql() -> str:
    # v[i] must be DOUBLE before the micro multiply — multiplying the
    # raw FLOAT column keeps float32 precision in DuckDB while Spark
    # multiplies the casted double, and the rounded micro integers can
    # differ by 1 (observed: 3/45 pairs off in the 6th dp)
    sums = ", ".join(
        f"CAST(sum(round(v[{i + 1}] * {_DRIFT_MICRO})) AS BIGINT) AS s{i}"
        for i in range(_DRIFT_DIM)
    )
    comps = ", ".join(
        f"(s{i} / {float(_DRIFT_MICRO)}) / n" for i in range(_DRIFT_DIM)
    )
    return f"""
WITH e AS (SELECT label, embedding::DOUBLE[] AS v FROM embeddings),
sums AS (
    SELECT CAST(label AS BIGINT) AS label, count(*) AS n, {sums}
    FROM e GROUP BY label
),
cent AS (SELECT label, [{comps}] AS c FROM sums)
SELECT x.label AS label_a, y.label AS label_b,
       round(
           list_sum(list_transform(range(1, {_DRIFT_DIM + 1}),
                                   i -> x.c[i] * y.c[i]))
           / (sqrt(list_sum(list_transform(x.c, a -> a * a)))
              * sqrt(list_sum(list_transform(y.c, a -> a * a)))),
       6) AS cosine
FROM cent x JOIN cent y ON x.label < y.label
"""


# ---------------------------------------------------------------------------
# orders_monthly_growth


def orders_monthly_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth: the monthly integer-cents
    revenue series with each month's growth ratio vs the previous
    month — the canonical lag-over-aggregated-series shape (every
    prior lag use is row-level sessionization). First month reports
    growth 0.0 (no predecessor) so the output is NULL-free.

    Exactness: revenue sums exact integer cents
    (round(o_totalprice·100) as BIGINT, the q1/rfm discipline); the
    growth ratio is exact truncating integer division
    ``((cur - prev)·10⁶) div prev`` at 6 dp; month keys are integers
    ``year·100 + month`` extracted under an explicitly pinned UTC
    session (midnight-UTC timestamps must not shift across a month
    boundary when the driver session carries another zone).

    100 TB shape: one partial-agg shuffle on month (≤ a few hundred
    groups), then the lag window runs on the METADATA-scale series —
    the single-partition window is |months| rows, not data-scale.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        (F.year("o_orderdate") * 100 + F.month("o_orderdate"))
        .cast("long")
        .alias("month")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    w = Window.orderBy("month")
    prev = F.lag("cents").over(w)
    # r9 conversion (wave 3): growth = (cur − prev)/prev on exact cent
    # sums — truncating integer division at 6 dp in decimal(38,0) ↔
    # HUGEINT (the cent-sum × 10⁶ product outgrows BIGINT at corpus
    # scale; signed deltas truncate toward zero in both engines)
    staged = monthly.withColumn("_prev", prev)
    growth = F.when(F.col("_prev").isNull(), F.lit(0.0)).otherwise(
        F.expr(
            "(cast(cents - _prev as decimal(38,0)) * 1000000) div _prev"
        ).cast("double")
        / 1e6
    )
    return staged.select(
        "month",
        # ok-round: exact cents grid (2 dp)
        F.round(F.col("cents") / 100.0, 2).alias("revenue"),
        "n_orders",
        growth.alias("mom_growth"),
    )


ORDERS_MONTHLY_GROWTH_SQL = """
WITH m AS (
    SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT) AS month,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY 1
)
SELECT month,
       round(cents / 100.0, 2) AS revenue, n_orders,  -- ok-round: exact cents grid
       CASE WHEN lag(cents) OVER (ORDER BY month) IS NULL THEN 0.0
            ELSE CAST((CAST(cents - lag(cents) OVER (ORDER BY month) AS HUGEINT)
                       * 1000000)
                      // lag(cents) OVER (ORDER BY month) AS DOUBLE)
                 / 1000000.0 END AS mom_growth
FROM m
"""


# ---------------------------------------------------------------------------
# corpus_vocab_growth

_VG_K = 8


def corpus_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-growth (Heaps-law) curve: cumulative docs, tokens
    and DISTINCT vocabulary at ``_VG_K`` doc-id checkpoints — the
    companion diagnostic to ``corpus_zipf_fit`` (Zipf says how mass
    concentrates; Heaps says how fast NEW types keep arriving, the
    curve a tokenizer-vocab-budget or dedup owner reads to see
    whether a corpus is still yielding novelty or has gone to
    mirrors).

    Scale-correct checkpointing: checkpoints are VALUE-based doc-id
    cutpoints (min + span·k/K, exact integer arithmetic) — NOT
    count-based ranks, which would need a global row_number sort
    (single-partition window, the 100 TB anti-shape). Each doc/term
    contributes to its suffix of checkpoints via
    ``explode(sequence(k_first, K))`` (the cumulative-curve trick from
    simhash_threshold_sweep), so the whole curve is two grouped
    aggregations: one doc-scale (docs/tokens per k), one vocab-scale
    (first-occurrence doc per term → new types per k). The (min, max)
    pair rides a 1-row BuildRight broadcast.

    Exactness: every output column is an exact integer; k_first =
    floor((id - min)·K / span) + 1 in both engines (integer ops).
    """
    d = spread(load_table(spark, sf_dir, "documents"))
    from distributed_file_system_with_stream_processing_spark.functions import text as T
    from pyspark.sql.functions import broadcast

    toks = d.select("doc_id", T.words(F.col("text")).alias("ws"))
    per_doc = toks.select("doc_id", F.size("ws").cast("long").alias("n_tok"))
    stats = per_doc.agg(
        F.min("doc_id").alias("mn"), F.max("doc_id").alias("mx")
    )
    span = F.col("mx") - F.col("mn") + 1
    k_first = (
        (F.col("doc_id") - F.col("mn")) * _VG_K / span
    ).cast("long") + 1
    doc_curve = (
        per_doc.crossJoin(broadcast(stats))
        .select(
            "n_tok",
            F.explode(F.sequence(k_first, F.lit(_VG_K))).alias("checkpoint"),
        )
        .groupBy("checkpoint")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
        )
    )
    first = (
        toks.select("doc_id", F.explode_outer("ws").alias("w"))
        .filter(F.col("w").isNotNull())
        .select("doc_id", F.lower("w").alias("term"))
        .groupBy("term")
        .agg(F.min("doc_id").alias("doc_id"))
    )
    vocab_curve = (
        first.crossJoin(broadcast(stats))
        .select(F.explode(F.sequence(k_first, F.lit(_VG_K))).alias("checkpoint"))
        .groupBy("checkpoint")
        .agg(F.count(F.lit(1)).alias("vocab"))
    )
    return (
        doc_curve.join(vocab_curve, "checkpoint", "left")
        .select(
            F.col("checkpoint").cast("long").alias("checkpoint"),
            "n_docs",
            "n_tokens",
            F.coalesce("vocab", F.lit(0)).cast("long").alias("vocab"),
        )
    )


CORPUS_VOCAB_GROWTH_SQL = rf"""
WITH toks AS (
    SELECT doc_id, list_filter(string_split_regex(text, '\s+'), w -> w <> '') AS ws
    FROM documents
),
per_doc AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tok FROM toks),
stats AS (SELECT min(doc_id) AS mn, max(doc_id) AS mx FROM per_doc),
dk AS (
    SELECT p.n_tok, u.k AS checkpoint
    FROM per_doc p CROSS JOIN stats s
    JOIN (SELECT unnest(range(1, {_VG_K + 1})) AS k) u
      ON u.k >= CAST(floor((p.doc_id - s.mn) * {_VG_K} / (s.mx - s.mn + 1)) AS BIGINT) + 1
),
doc_curve AS (
    SELECT checkpoint, count(*) AS n_docs, sum(n_tok) AS n_tokens
    FROM dk GROUP BY checkpoint
),
first AS (
    SELECT lower(w) AS term, min(doc_id) AS doc_id
    FROM (SELECT doc_id, unnest(ws) AS w FROM toks)
    GROUP BY lower(w)
),
vk AS (
    SELECT u.k AS checkpoint, count(*) AS vocab
    FROM first f CROSS JOIN stats s
    JOIN (SELECT unnest(range(1, {_VG_K + 1})) AS k) u
      ON u.k >= CAST(floor((f.doc_id - s.mn) * {_VG_K} / (s.mx - s.mn + 1)) AS BIGINT) + 1
    GROUP BY u.k
)
SELECT CAST(d.checkpoint AS BIGINT) AS checkpoint,
       CAST(d.n_docs AS BIGINT) AS n_docs,
       CAST(d.n_tokens AS BIGINT) AS n_tokens,
       CAST(coalesce(v.vocab, 0) AS BIGINT) AS vocab
FROM doc_curve d LEFT JOIN vk v ON d.checkpoint = v.checkpoint
"""


# ---------------------------------------------------------------------------
# events_time_to_convert

_TTC_BUCKET_S = 3600


def events_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-latency histogram: for every user whose first
    'purchase' follows their first 'view', the view→purchase delay
    bucketed by hour — the funnel-velocity readout
    ``events_user_funnel`` (pure conditional counts) cannot answer:
    not WHETHER users convert but HOW LONG conversion takes, the
    number an activation experiment actually moves.

    Semantics: first_view = min event time with type 'view';
    conversion = min purchase time ≥ first_view (purchases BEFORE the
    first view don't count — re-purchase after discovery does).
    Bucket = floor(delay_seconds / 3600) on exact integer epoch
    seconds.

    100 TB shape: one user-keyed partial agg (first view), one
    user-keyed conditional min over the purchase slice joined back on
    user_id (both sides user-partitioned — AQE plans a single
    co-partitioned join), then a ≤hundreds-row bucket rollup. No
    windows, no corpus-scale state.
    """
    e = load_table(spark, sf_dir, "events")
    sec = F.col("ts").cast("long")
    fv = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min(sec).alias("first_view"))
    )
    purch = e.filter(F.col("event_type") == "purchase").select(
        "user_id", sec.alias("pts")
    )
    conv = (
        purch.join(fv, "user_id")
        .filter(F.col("pts") >= F.col("first_view"))
        .groupBy("user_id")
        .agg(
            F.min(F.col("pts") - F.col("first_view")).alias("delay_s")
        )
    )
    return (
        conv.groupBy(
            (F.col("delay_s") / _TTC_BUCKET_S).cast("long").alias("delay_hours")
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


EVENTS_TIME_TO_CONVERT_SQL = f"""
WITH fv AS (
    SELECT user_id, min(epoch_us(ts) // 1000000) AS first_view
    FROM events WHERE event_type = 'view' GROUP BY user_id
),
conv AS (
    SELECT e.user_id,
           min(epoch_us(e.ts) // 1000000 - f.first_view) AS delay_s
    FROM events e JOIN fv f USING (user_id)
    WHERE e.event_type = 'purchase'
      AND epoch_us(e.ts) // 1000000 >= f.first_view
    GROUP BY e.user_id
)
SELECT CAST(floor(delay_s / {_TTC_BUCKET_S}) AS BIGINT) AS delay_hours,
       CAST(count(*) AS BIGINT) AS n_users
FROM conv GROUP BY 1
"""


# ---------------------------------------------------------------------------
# docs_duplicate_text_topk

_DUP_TOPK = 20


def docs_duplicate_text_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``_DUP_TOPK`` most-copied exact texts: (text_md5, n_copies,
    min_doc_id) for every text occurring more than once, largest
    groups first — the "what exactly is being mirrored" drill-down a
    dedup owner opens after ``dedup_exact`` reports the rate; the md5
    key (not the text) keeps the output row width metadata-scale even
    when the duplicated payloads are megabytes.

    Exactness: md5 is engine-identical on identical bytes; counts and
    min ids exact integers; ordering (n_copies desc, text_md5 asc)
    fully deterministic.

    100 TB shape: one hash-keyed partial-agg shuffle (the dedup_exact
    census) + a top-k sort on the duplicate groups only (dup-group
    scale, not corpus scale).
    """
    d = spread(load_table(spark, sf_dir, "documents"))
    groups = (
        d.select(F.md5(F.col("text")).alias("text_md5"), "doc_id")
        .groupBy("text_md5")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("min_doc_id"),
        )
        .filter(F.col("n_copies") > 1)
    )
    return groups.orderBy(
        F.desc("n_copies"), F.asc("text_md5")
    ).limit(_DUP_TOPK)


DOCS_DUPLICATE_TEXT_SQL = f"""
WITH g AS (
    SELECT md5(text) AS text_md5, count(*) AS n_copies, min(doc_id) AS min_doc_id
    FROM documents GROUP BY md5(text)
)
SELECT text_md5, CAST(n_copies AS BIGINT) AS n_copies,
       CAST(min_doc_id AS BIGINT) AS min_doc_id
FROM g WHERE n_copies > 1
ORDER BY n_copies DESC, text_md5 LIMIT {_DUP_TOPK}
"""


# ---------------------------------------------------------------------------
# embedding_cosine_histogram

_CH_BINS = 16


def embedding_cosine_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of query↔base cosine similarities over the standard
    probe set (vec_id < 10 vs the rest): the embedding-space SHAPE
    diagnostic — an anisotropic ("collapsed-cone") space piles mass
    in the top bins and ruins both ANN pruning and cosine thresholds
    before any individual query looks wrong. ``_CH_BINS`` equal bins
    over [-1, 1]; bin = least(floor((cos+1)·bins/2), bins-1).

    Exactness: the cosine is the established bit-lockstep sequential
    dot/norm (ann_cosine_topk's); floor on IDENTICAL double bits
    gives identical bins, so the output is integer-only — no rounding
    tolerance anywhere.

    100 TB shape: the queries-broadcast brute pass (BuildRight BNLJ,
    base never shuffles) + a bins-sized rollup. The histogram costs
    one scan of the base per probe set.
    """
    from distributed_file_system_with_stream_processing_spark.functions import (
        vector as V,
    )
    from pyspark.sql.functions import broadcast

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    b = e.filter(F.col("vec_id") >= 10).select(
        F.col("vec_id").alias("base_id"), F.col("v").alias("bv")
    )
    dot = F.aggregate(
        F.zip_with(F.col("qv"), F.col("bv"), lambda a, c: a * c),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )
    cos = dot / (F.sqrt(V.sq_norm(F.col("qv"))) * F.sqrt(V.sq_norm(F.col("bv"))))
    bin_ = F.least(
        F.floor((cos + 1.0) * _CH_BINS / 2).cast("long"),
        F.lit(_CH_BINS - 1),
    )
    return (
        b.crossJoin(broadcast(q))
        .select(bin_.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


def _cosine_hist_sql() -> str:
    from distributed_file_system_with_stream_processing_spark.plans.llm_ops import (
        _DOT,
    )

    dot = _DOT.format(a="qv", b="bv")
    nrm = "sqrt(list_sum(list_transform({x}, a -> a * a)))"
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
b AS (SELECT vec_id AS base_id, v AS bv FROM e WHERE vec_id >= 10),
s AS (
    SELECT least(CAST(floor(({dot} / ({nrm.format(x='qv')} * {nrm.format(x='bv')}) + 1.0)
                 * {_CH_BINS} / 2) AS BIGINT), {_CH_BINS - 1}) AS bin
    FROM b CROSS JOIN q
)
SELECT bin, CAST(count(*) AS BIGINT) AS n_pairs FROM s GROUP BY bin
"""


# ---------------------------------------------------------------------------
# embedding_knn_graph

_KNN_G_K = 3
# Dynamic cell count: cells = ⌈√n⌉ (both engines; see _knn_cells /
# _KNN_CELLS_SQL). Fixing the cell count was the one measured scale
# bug in the suite — Σ|cell|² pair work goes quadratic in the corpus
# (7.4×/11.2× wall at the 10× rehearsal with 16 pinned cells); with
# √n cells the per-cell population is √n, pair work is n^1.5/…
# bounded, and at real scale the operator takes cells as an explicit
# corpus-sized parameter (SemDeDup's 50k cells on LAION).
_KNN_CELLS_SQL = "SELECT CAST(ceil(sqrt(count(*))) AS BIGINT) FROM e"


def _knn_cells(n: int) -> int:
    """⌈√n⌉ via integer isqrt — matches the oracle's ceil(sqrt(n))
    exactly for every realistic n (IEEE sqrt is correctly rounded and
    √(m²−1) sits ~1/(2m) below m, far beyond half-ULP, so the FP ceil
    never disagrees with the integer one)."""
    k = math.isqrt(max(n, 1))
    return k + (1 if k * k < n else 0)


def embedding_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITHIN-CELL k-nearest-neighbor GRAPH over trained k-means
    cells: every vector gets its top-``_KNN_G_K`` cosine neighbors
    from its own cell — the candidate structure SemDeDup-style
    semantic curation and graph-clustering passes are built on (the
    per-cell restriction is the standard scale bound: Σ|cell|² work
    instead of n², the semdedup_kmeans economics with a kNN output
    instead of a keep/drop verdict).

    Fully oracled end to end: the DuckDB twin chains the shared
    unrolled-Lloyd CTE (llm_ops2._kmeans_oracle_parts, trained on ALL
    vectors) into the own-cell self-join + exact cosine top-k, so the
    driver hash covers training, assignment, and ranking. Cell
    assignment is the streaming serving twin's code path
    (operators/clustering.ivf_index_prepare).

    100 TB shape: Lloyd metadata shuffles + ONE corpus shuffle on
    ``cell`` for the self-join + the per-query top-k window. The cell
    count GROWS with the corpus — cells = ⌈√n⌉ in both engines (one
    metadata count() job to size it), so per-cell population is ~√n
    and the self-join fan-out is bounded; at real scale the operator
    takes cells as an explicit corpus-sized parameter (SemDeDup's 50k
    cells on LAION keep cells O(1)-sized, making pair work linear).

    r8: the edge list is a session-persisted backbone
    (plans/_backbones.knn_graph — centroids train once per (session,
    sf_dir), ``embedding_hubness`` reads the same materialized edges;
    the _backbones.py stance applied to the Lloyd trainer)."""
    from distributed_file_system_with_stream_processing_spark.plans import _backbones as B

    return B.knn_graph(spark, sf_dir)


def _knn_graph_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The un-persisted kNN-graph plan — built by the backbone cache;
    identical operators/parameters to the pre-r8 inline derivation
    (kmeans_centroids memoizes the same kmeans_fit call)."""
    from distributed_file_system_with_stream_processing_spark.functions import (
        vector as V,
    )
    from distributed_file_system_with_stream_processing_spark.operators import (
        clustering as C,
    )
    from distributed_file_system_with_stream_processing_spark.plans import _backbones as B
    from distributed_file_system_with_stream_processing_spark.plans.llm_ops2 import (
        _KM_ITERS,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cells = _knn_cells(B.embeddings_n(spark, sf_dir))
    cents = B.kmeans_centroids(spark, sf_dir, k=cells, iters=_KM_ITERS)
    assigned = C.ivf_index_prepare(emb, cents)
    a = assigned.select(
        F.col("id").alias("query_id"), F.col("v").alias("qv"), "cell"
    )
    b = assigned.select(
        F.col("id").alias("neighbor_id"), F.col("v").alias("bv"), "cell"
    )
    sim = V.cosine(F.col("qv"), F.col("bv"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("_sim"), F.asc("neighbor_id")
    )
    return (
        a.join(b, "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", sim.alias("_sim"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= _KNN_G_K)
        .select("query_id", "neighbor_id", F.round("_sim", 6).alias("sim"), "rank")
    )


def _knn_graph_cte() -> str:
    """The full within-cell kNN CTE chain ending in ``rk(query_id,
    neighbor_id, s, rank)`` — shared with llm_ops8's hubness oracle
    (same trained cells, same ranking, different epilogue)."""
    from distributed_file_system_with_stream_processing_spark.plans.llm_ops import (
        _DOT,
    )
    from distributed_file_system_with_stream_processing_spark.plans.llm_ops2 import (
        _KM_ITERS,
        _kmeans_oracle_parts,
    )

    dot = _DOT
    return (
        ",\n".join(_kmeans_oracle_parts(_KNN_CELLS_SQL, _KM_ITERS))
        + f""",
sim AS (
    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
           {dot.format(a='a.v', b='b.v')} /
           (sqrt({dot.format(a='a.v', b='a.v')}) * sqrt({dot.format(a='b.v', b='b.v')})) AS s
    FROM fin a JOIN fin b ON a.c = b.c AND a.vec_id <> b.vec_id),
rk AS (
    SELECT query_id, neighbor_id, s,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY s DESC, neighbor_id ASC) AS rank
    FROM sim)"""
    )


def _knn_graph_sql() -> str:
    return (
        _knn_graph_cte()
        + f"""
SELECT query_id, neighbor_id, round(s, 6) AS sim, CAST(rank AS BIGINT) AS rank
FROM rk WHERE rank <= {_KNN_G_K}
"""
    )


QUERIES = {
    "events_peak_rate": events_peak_rate,
    "simhash_threshold_sweep": simhash_threshold_sweep,
    "embedding_label_drift": embedding_label_drift,
    "orders_monthly_growth": orders_monthly_growth,
    "corpus_vocab_growth": corpus_vocab_growth,
    "events_time_to_convert": events_time_to_convert,
    "docs_duplicate_text_topk": docs_duplicate_text_topk,
    "embedding_cosine_histogram": embedding_cosine_histogram,
    "embedding_knn_graph": embedding_knn_graph,
}

ORACLES = {
    "events_peak_rate": EVENTS_PEAK_RATE_SQL,
    "simhash_threshold_sweep": SIMHASH_THRESHOLD_SWEEP_SQL,
    "embedding_label_drift": _drift_sql(),
    "orders_monthly_growth": ORDERS_MONTHLY_GROWTH_SQL,
    "corpus_vocab_growth": CORPUS_VOCAB_GROWTH_SQL,
    "events_time_to_convert": EVENTS_TIME_TO_CONVERT_SQL,
    "docs_duplicate_text_topk": DOCS_DUPLICATE_TEXT_SQL,
    "embedding_cosine_histogram": _cosine_hist_sql(),
    "embedding_knn_graph": _knn_graph_sql(),
}
