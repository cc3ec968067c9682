"""Round-5 tail query module: pipeline-QA audits (LSH recall, hubness,
cluster quality, quality×dup dependence) and product-analytics series
(cohort LTV, DAU/MAU stickiness, priority mix shift, inactivity gaps).

Same contract as ``llm_ops``…``llm_ops7``: declarative DataFrame plans
(JVM expressions only) with DuckDB oracles mirroring the exact
arithmetic, so value hashes match without tolerances.

Ops here (all oracled):
- ``lsh_recall_curve`` — recall of the MinHash-LSH candidate set vs
  the capped-exact-Jaccard ground truth, per true-Jaccard bin: the
  S-curve audit that prices a (num_hashes, bands) choice BEFORE a
  dedup run trusts it.
- ``customer_cohort_ltv`` — first-order-month cohort × order-age
  revenue matrix (the classic cohort-LTV triangle).
- ``events_dau_mau`` — monthly DAU/MAU stickiness.
- ``orders_priority_mix_shift`` — per-month priority mix with
  month-over-month share drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from distributed_file_system_with_stream_processing_spark.operators import dedup as D
from distributed_file_system_with_stream_processing_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# lsh_recall_curve

_LSH_BINS = 10


def lsh_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall of MinHash-LSH (12 hashes × 6 bands — the registered
    ``dedup_minhash_lsh`` configuration) against the capped-exact
    n-gram-Jaccard ground truth, per true-Jaccard bin — the empirical
    S-curve. Theory says a pair with Jaccard j collides on some band
    with probability 1−(1−j²)⁶; this measures it on the actual corpus,
    which is how a dedup owner prices a banding choice (recall at the
    dedup threshold, wasted candidates below it) BEFORE trusting a
    full run. Completes the dedup family's QA story: every backbone is
    oracled individually; this audits one against another.

    Semantics: truth = every co-shingled pair under the standard
    df≤50 stop-shingle cap (the primary ``dedup_ngram_jaccard``
    semantics — the audit grades LSH against what the exact path
    would actually compute at scale); bin = least(floor(j·10), 9);
    a pair is caught iff the banded signature self-join emits it.

    Exactness: j is the same double division of exact integers in
    both engines (bit-lockstep), so floor-binning is exact; counts
    and the recall ratio are integer-derived, rounded once at 6 dp.

    100 TB shape: both sides are the proven bucketed joins (shingle
    equi-join with the C(50,2) fan-out bound; (band, key) equi-join),
    the audit join is pair-scale on (doc_id_a, doc_id_b), and the
    output is 10 rows. No new corpus-scale shape anywhere.
    """
    docs = load_table(spark, sf_dir, "documents")
    truth = D.ngram_jaccard_all_pairs(docs, n=3, max_doc_freq=50)
    cand = D.minhash_lsh_pairs(docs, n=3, num_hashes=12, bands=6).select(
        "doc_id_a", "doc_id_b", F.lit(1).alias("caught")
    )
    binned = truth.join(cand, ["doc_id_a", "doc_id_b"], "left").select(
        F.least(
            F.floor(F.col("_j") * _LSH_BINS).cast("long"),
            F.lit(_LSH_BINS - 1).cast("long"),
        ).alias("bin"),
        F.coalesce("caught", F.lit(0)).alias("caught"),
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("caught").cast("long").alias("n_caught"),
        F.round(
            F.sum("caught").cast("double") / F.count(F.lit(1)), 6
        ).alias("recall"),
    )


def _lsh_recall_sql() -> str:
    from distributed_file_system_with_stream_processing_spark.functions import text as T
    from distributed_file_system_with_stream_processing_spark.plans.llm_ops import (
        _MH_PARAMS_SQL,
        _duck_shingles,
    )

    return f"""
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
sizes AS (SELECT doc_id, len(sh) AS n FROM shf),
truth AS (
    SELECT da, db, CAST(ns AS DOUBLE) / (na.n + nb.n - ns) AS j
    FROM shared
    JOIN sizes na ON da = na.doc_id
    JOIN sizes nb ON db = nb.doc_id
),
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
    SELECT doc_id, band,
           md5(array_to_string(list_transform(sig[band*2+1:band*2+2],
                                              x -> CAST(x AS VARCHAR)), '|')) AS key
    FROM bands
),
cand AS (
    SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
    FROM keys a JOIN keys b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
),
binned AS (
    SELECT least(CAST(floor(t.j * {_LSH_BINS}) AS BIGINT), {_LSH_BINS - 1}) AS bin,
           CASE WHEN c.da IS NOT NULL THEN 1 ELSE 0 END AS caught
    FROM truth t LEFT JOIN cand c ON t.da = c.da AND t.db = c.db
)
SELECT bin, CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(caught) AS BIGINT) AS n_caught,
       round(CAST(sum(caught) AS DOUBLE) / count(*), 6) AS recall
FROM binned GROUP BY bin
"""


# ---------------------------------------------------------------------------
# customer_cohort_ltv


def customer_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort-LTV triangle: customers grouped by FIRST-order month,
    revenue per months-since-first-order — the classic retention-value
    matrix (read down a column for "how do newer cohorts compare at
    the same age", across a row for "how does a cohort decay"), the
    orders-side complement of ``events_cohort_retention``'s activity
    counts.

    Exactness: cohort key = min(year·100+month) per customer and age
    = month-index difference — both exact integer folds (yyyymm and
    year·12+month are each monotone in (year, month), so the min of
    one identifies the min of the other); revenue sums exact integer
    cents (the q1/rfm discipline); distinct-customer counts exact.

    100 TB shape: one custkey partial-agg shuffle (first order), one
    custkey-co-partitioned join back (AQE plans a single exchange
    pair), then a (cohort, age) rollup at months² metadata scale.
    """
    o = load_table(spark, sf_dir, "orders")
    ym = (F.year("o_orderdate") * 100 + F.month("o_orderdate")).cast("long")
    midx = (F.year("o_orderdate") * 12 + F.month("o_orderdate")).cast("long")
    fo = (
        o.select("o_custkey", ym.alias("ym"), midx.alias("midx"))
        .groupBy("o_custkey")
        .agg(F.min("ym").alias("cohort_month"), F.min("midx").alias("first_midx"))
    )
    return (
        o.select(
            "o_custkey",
            midx.alias("midx"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .join(fo, "o_custkey")
        .groupBy(
            "cohort_month",
            (F.col("midx") - F.col("first_midx")).alias("age_months"),
        )
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("cents") / 100.0, 2).alias("revenue"),
        )
    )


CUSTOMER_COHORT_LTV_SQL = """
WITH o2 AS (
    SELECT o_custkey,
           CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT) AS ym,
           CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS midx,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders
),
fo AS (
    SELECT o_custkey, min(ym) AS cohort_month, min(midx) AS first_midx
    FROM o2 GROUP BY o_custkey
)
SELECT f.cohort_month,
       o.midx - f.first_midx AS age_months,
       CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS n_customers,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(o.cents) / 100.0, 2) AS revenue
FROM o2 o JOIN fo f USING (o_custkey)
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# events_dau_mau


def events_dau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly DAU/MAU stickiness: average daily active users over
    the month's ACTIVE days, monthly active users, and their ratio —
    the product-engagement headline number (stickiness 1.0 = every
    monthly user shows up every active day; ~0.05 = drive-by).

    Exactness: active sets are exact distinct counts (one distinct
    pass on (month, day, user), reused for both numerator layers);
    avg_dau = sum_dau / n_active_days and stickiness = avg_dau / mau
    evaluate in one fixed double sequence from exact integers, each
    rounded once at 6 dp. UTC is pinned by load_table so day/month
    keys agree across engines.

    100 TB shape: one corpus-scale distinct shuffle on (month, day,
    user_id); the per-day counts, the month rollup, and the MAU
    distinct all run on the already-deduplicated (month, day, user)
    set (strictly smaller), and the final join is month-keyed
    metadata scale.
    """
    e = load_table(spark, sf_dir, "events")
    mdu = e.select(
        (F.year("ts") * 100 + F.month("ts")).cast("long").alias("month"),
        F.to_date("ts").alias("day"),
        "user_id",
    ).distinct()
    daily = mdu.groupBy("month", "day").agg(F.count(F.lit(1)).alias("dau"))
    monthly = daily.groupBy("month").agg(
        F.sum("dau").alias("sum_dau"),
        F.count(F.lit(1)).alias("n_active_days"),
    )
    mau = (
        mdu.select("month", "user_id")
        .distinct()
        .groupBy("month")
        .agg(F.count(F.lit(1)).alias("mau"))
    )
    avg_dau = F.col("sum_dau").cast("double") / F.col("n_active_days")
    return monthly.join(mau, "month").select(
        "month",
        "n_active_days",
        F.round(avg_dau, 6).alias("avg_dau"),
        "mau",
        F.round(avg_dau / F.col("mau"), 6).alias("stickiness"),
    )


EVENTS_DAU_MAU_SQL = """
WITH mdu AS (
    SELECT DISTINCT CAST(year(ts) * 100 + month(ts) AS BIGINT) AS month,
           CAST(ts AS DATE) AS day, user_id
    FROM events
),
daily AS (SELECT month, day, count(*) AS dau FROM mdu GROUP BY month, day),
monthly AS (
    SELECT month, sum(dau) AS sum_dau, count(*) AS n_active_days
    FROM daily GROUP BY month
),
mau AS (
    SELECT month, count(*) AS mau
    FROM (SELECT DISTINCT month, user_id FROM mdu) GROUP BY month
)
SELECT m.month, CAST(m.n_active_days AS BIGINT) AS n_active_days,
       round(CAST(m.sum_dau AS DOUBLE) / m.n_active_days, 6) AS avg_dau,
       CAST(a.mau AS BIGINT) AS mau,
       round(CAST(m.sum_dau AS DOUBLE) / m.n_active_days / a.mau, 6) AS stickiness
FROM monthly m JOIN mau a USING (month)
"""


# ---------------------------------------------------------------------------
# orders_priority_mix_shift


def orders_priority_mix_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority mix per month with month-over-month share drift
    — the composition-shift monitor (a priority whose share trends up
    is a process change upstream; the HHI/seasonality queries say how
    concentrated/when, this says WHAT is replacing what). First month
    of each priority reports drift 0.0 so the output is NULL-free.

    Exactness: counts exact integers; share = n / month_total divides
    once (window over the metadata-scale month×priority aggregate);
    the drift subtracts the UNROUNDED shares (lag over the same tiny
    table) and rounds once — both engines run the identical double
    sequence.

    100 TB shape: one partial-agg shuffle on (month, priority) — ≤
    months·5 groups; both windows run on the aggregate, never the
    fact table.
    """
    o = load_table(spark, sf_dir, "orders")
    agg = o.groupBy(
        (F.year("o_orderdate") * 100 + F.month("o_orderdate"))
        .cast("long")
        .alias("month"),
        "o_orderpriority",
    ).agg(F.count(F.lit(1)).alias("n_orders"))
    share = F.col("n_orders").cast("double") / F.sum("n_orders").over(
        Window.partitionBy("month")
    )
    with_share = agg.select("month", "o_orderpriority", "n_orders", share.alias("_s"))
    drift = F.col("_s") - F.lag("_s").over(
        Window.partitionBy("o_orderpriority").orderBy("month")
    )
    return with_share.select(
        "month",
        "o_orderpriority",
        "n_orders",
        F.round("_s", 6).alias("share"),
        F.round(F.coalesce(drift, F.lit(0.0)), 6).alias("share_drift"),
    )


ORDERS_PRIORITY_MIX_SQL = """
WITH agg AS (
    SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT) AS month,
           o_orderpriority, count(*) AS n_orders
    FROM orders GROUP BY 1, 2
),
s AS (
    SELECT month, o_orderpriority, n_orders,
           CAST(n_orders AS DOUBLE) / sum(n_orders) OVER (PARTITION BY month) AS _s
    FROM agg
)
SELECT month, o_orderpriority, CAST(n_orders AS BIGINT) AS n_orders,
       round(_s, 6) AS share,
       round(coalesce(_s - lag(_s) OVER (PARTITION BY o_orderpriority ORDER BY month),
                      0.0), 6) AS share_drift
FROM s
"""


# ---------------------------------------------------------------------------
# embedding_hubness


def embedding_hubness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-degree histogram of the within-cell kNN graph — the hubness
    screen: in a healthy embedding space in-degrees concentrate near
    k; a heavy tail (one vector appearing in thousands of top-k
    lists) is the classic high-dimensional ANN pathology that makes
    hub vectors swallow retrieval results and SemDeDup keep-lists.
    Zero-degree vectors (nobody's neighbor — isolates and singleton
    cells) are reported in the 0 bin, which is why the histogram
    right-joins the full vector set rather than just the edge list.

    Reuses ``embedding_knn_graph``'s exact plan (same trained cells,
    same ranking) and its oracle CTE chain, so this audit is oracled
    end to end through training + assignment + ranking + aggregation.

    100 TB shape: the kNN graph's cost (one corpus shuffle on cell)
    plus an edge-scale (n·k rows) partial agg on neighbor_id and a
    left join of the id column only; output is |distinct in-degree|
    rows.
    """
    from distributed_file_system_with_stream_processing_spark.plans import llm_ops7 as L7

    g = L7.embedding_knn_graph(spark, sf_dir)
    indeg = g.groupBy(F.col("neighbor_id").alias("vec_id")).agg(
        F.count(F.lit(1)).alias("d")
    )
    allv = load_table(spark, sf_dir, "embeddings").select("vec_id")
    deg = allv.join(indeg, "vec_id", "left").select(
        F.coalesce("d", F.lit(0)).cast("long").alias("in_degree")
    )
    return deg.groupBy("in_degree").agg(F.count(F.lit(1)).alias("n_vectors"))


def _hubness_sql() -> str:
    from distributed_file_system_with_stream_processing_spark.plans.llm_ops7 import (
        _KNN_G_K,
        _knn_graph_cte,
    )

    return (
        _knn_graph_cte()
        + f""",
g AS (SELECT neighbor_id FROM rk WHERE rank <= {_KNN_G_K}),
indeg AS (SELECT neighbor_id, count(*) AS d FROM g GROUP BY neighbor_id),
deg AS (
    SELECT CAST(coalesce(i.d, 0) AS BIGINT) AS in_degree
    FROM embeddings a LEFT JOIN indeg i ON a.vec_id = i.neighbor_id
)
SELECT in_degree, CAST(count(*) AS BIGINT) AS n_vectors
FROM deg GROUP BY in_degree
"""
    )


# ---------------------------------------------------------------------------
# events_user_gaps

_GAP_BUCKET_S = 3600


def events_user_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest-inactivity-gap histogram: each user's MAXIMUM gap
    between consecutive events, bucketed by hour — the churn-risk
    profile (sessionization says where sessions split; this says how
    close each user has already come to disappearing). Single-event
    users have no gap and are excluded by construction.

    Exactness: gaps are integer epoch-second differences; ordering
    within a user by the integer second is enough — equal-second
    permutations change which neighbor pairs lag() sees but not the
    gap MULTISET (adjacent equal values produce the same differences
    in any order), so max_gap is deterministic. Bucket = integer
    floor division.

    100 TB shape: ONE shuffle on user_id; the lag window and the
    per-user max reuse its partitioning (groupBy key == window
    partition key, no second Exchange); the histogram rollup is
    metadata-scale.
    """
    e = load_table(spark, sf_dir, "events")
    sec = F.col("ts").cast("long")
    w = Window.partitionBy("user_id").orderBy(sec)
    gaps = e.select(
        "user_id", (sec - F.lag(sec).over(w)).alias("gap_s")
    ).filter(F.col("gap_s").isNotNull())
    return (
        gaps.groupBy("user_id")
        .agg(F.max("gap_s").alias("max_gap_s"))
        .groupBy(
            (F.col("max_gap_s") / _GAP_BUCKET_S).cast("long").alias("gap_hours")
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


EVENTS_USER_GAPS_SQL = f"""
WITH g AS (
    SELECT user_id,
           epoch_us(ts) // 1000000
           - lag(epoch_us(ts) // 1000000) OVER (
                 PARTITION BY user_id ORDER BY epoch_us(ts) // 1000000
             ) AS gap_s
    FROM events
),
mx AS (
    SELECT user_id, max(gap_s) AS max_gap_s
    FROM g WHERE gap_s IS NOT NULL GROUP BY user_id
)
SELECT CAST(floor(max_gap_s / {_GAP_BUCKET_S}) AS BIGINT) AS gap_hours,
       CAST(count(*) AS BIGINT) AS n_users
FROM mx GROUP BY 1
"""


# ---------------------------------------------------------------------------
# docs_quality_dup_lift

_QDL_GATE = 0.5


def docs_quality_dup_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-gate × exact-duplicate contingency with per-cell lift
    (observed / expected-under-independence) — the "are mirrors
    low-quality" dependence audit that decides whether a quality
    filter and a dedup pass are redundant or complementary: lift > 1
    on the (fail, dup) cell means the quality gate is already
    catching part of the duplicated mass.

    Semantics: quality is the registered heuristic
    (``functions.text.quality_score``, same arithmetic order as
    ``text_quality_score``'s oracle), gated at ≥ 0.5 (``_QDL_GATE``);
    duplicate = normalized text shared with ≥1 other doc
    (``dedup_exact``'s md5 groups).

    Exactness: cell counts exact integers; the gate compares the
    bit-lockstep double sequence; lift = n·total / (row_tot·col_tot)
    evaluates in one fixed double sequence over exact integers and
    rounds once at 6 dp. Marginals come from windows over the ≤4-row
    cell table.

    100 TB shape: one md5-keyed shuffle shared by the copy census and
    the join back (co-partitioned, AQE plans one exchange pair); the
    contingency rollup and its windows are metadata-scale.
    """
    from distributed_file_system_with_stream_processing_spark.functions import text as T
    from distributed_file_system_with_stream_processing_spark.operators._util import spread

    d = spread(load_table(spark, sf_dir, "documents"))
    ws = T.words(F.col("text"))
    per_doc = d.select(
        F.md5(T.norm_text(F.col("text"))).alias("h"),
        (
            T.quality_score(
                F.size(ws).cast("long"),
                T.stopword_ratio(ws),
                T.punct_ratio(F.col("text")),
            )
            >= _QDL_GATE
        )
        .cast("long")
        .alias("quality_pass"),
    )
    copies = per_doc.groupBy("h").agg(F.count(F.lit(1)).alias("n_copies"))
    cells = (
        per_doc.join(copies, "h")
        .groupBy(
            "quality_pass",
            (F.col("n_copies") > 1).cast("long").alias("is_dup"),
        )
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    row_t = F.sum("n_docs").over(Window.partitionBy("quality_pass"))
    col_t = F.sum("n_docs").over(Window.partitionBy("is_dup"))
    tot = F.sum("n_docs").over(Window.partitionBy())
    lift = (
        F.col("n_docs").cast("double") * tot / (row_t.cast("double") * col_t)
    )
    return cells.select(
        "quality_pass", "is_dup", "n_docs", F.round(lift, 6).alias("lift")
    )


DOCS_QUALITY_DUP_LIFT_SQL = rf"""
WITH w AS (
    SELECT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS h,
           CASE WHEN least(CAST(1.0 AS DOUBLE), greatest(CAST(0.0 AS DOUBLE),
                     CAST(0.25 AS DOUBLE)
                     + CAST(0.002 AS DOUBLE) * CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS BIGINT)
                     + CAST(1.2 AS DOUBLE) * (CASE WHEN len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) > 0
                          THEN CAST(len(list_filter(list_filter(string_split_regex(text, '\s+'), x -> x <> ''), x -> list_contains(['the','a','and','of','to','in','is'], lower(x)))) AS DOUBLE)
                               / len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))
                          ELSE CAST(0.0 AS DOUBLE) END)
                     - CAST(3.0 AS DOUBLE) * (CASE WHEN length(text) > 0
                          THEN CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE) / length(text)
                          ELSE CAST(0.0 AS DOUBLE) END)))
                >= {_QDL_GATE} THEN 1 ELSE 0 END AS quality_pass
    FROM documents
),
copies AS (SELECT h, count(*) AS n_copies FROM w GROUP BY h),
cells AS (
    SELECT CAST(w.quality_pass AS BIGINT) AS quality_pass,
           CAST(CASE WHEN c.n_copies > 1 THEN 1 ELSE 0 END AS BIGINT) AS is_dup,
           count(*) AS n_docs
    FROM w JOIN copies c USING (h)
    GROUP BY 1, 2
)
SELECT quality_pass, is_dup, CAST(n_docs AS BIGINT) AS n_docs,
       round(CAST(n_docs AS DOUBLE) * sum(n_docs) OVER ()
             / (CAST(sum(n_docs) OVER (PARTITION BY quality_pass) AS DOUBLE)
                * sum(n_docs) OVER (PARTITION BY is_dup)), 6) AS lift
FROM cells
"""


# ---------------------------------------------------------------------------
# embedding_db_index

_DB_DIM = 64
_DB_MICRO = 1_000_000


def embedding_db_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label Davies-Bouldin component: RMS within-label scatter,
    the worst (scatter_i + scatter_j) / centroid-distance ratio over
    all other labels, and WHICH label attains it — the cluster-quality
    score that closes the embedding-QA family (margin stats give one
    corpus number, label drift gives raw centroid cosines; DB names
    the single worst-separated neighbor per label, which is the list
    a taxonomy owner actually triages).

    O(n) via the sum identity: mean ||x − c||² = E||x||² − ||c||²,
    so ONE corpus pass collects per-label component sums (micro-unit
    longs) and squared-norm sums (micro² in DECIMAL(38,0) ↔ DuckDB
    HUGEINT — both exact integers, identical when lowered to double);
    scatter, distances, and ratios then evaluate on the metadata-scale
    centroid table in the established lockstep folds (F.aggregate ↔
    list_sum(list_transform)), each output rounding once at 6 dp.

    100 TB shape: one label-keyed partial-agg shuffle (|labels|·dim
    integers of state), then a |labels|²-row centroid self-join — the
    corpus is touched once. The self-join is a BuildRight broadcast
    nested-loop on the METADATA table (the embedding_label_drift
    shape, plan-allowlisted).
    """
    from distributed_file_system_with_stream_processing_spark.functions import vector as V
    from distributed_file_system_with_stream_processing_spark.operators._util import spread

    e = spread(load_table(spark, sf_dir, "embeddings"))
    mu = F.transform(
        V.as_double(F.col("embedding")),
        lambda x: F.round(x * _DB_MICRO).cast("long"),
    )
    row_sq = F.aggregate(
        F.col("mu"),
        F.lit(0).cast("decimal(38,0)"),
        lambda acc, c: acc + (c * c).cast("decimal(38,0)"),
    )
    sums = (
        e.select(F.col("label").cast("long").alias("label"), mu.alias("mu"))
        .select("label", "mu", row_sq.alias("rsq"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("rsq").alias("sq"),
            *[
                F.sum(F.element_at("mu", i + 1)).alias(f"s{i}")
                for i in range(_DB_DIM)
            ],
        )
    )
    cent = sums.select(
        "label",
        "n",
        F.array(
            *[
                (F.col(f"s{i}") / F.lit(float(_DB_MICRO))) / F.col("n")
                for i in range(_DB_DIM)
            ]
        ).alias("c"),
        F.sqrt(
            F.greatest(
                F.lit(0.0),
                F.col("sq").cast("double")
                / F.lit(float(_DB_MICRO) * _DB_MICRO)
                / F.col("n")
                - F.aggregate(
                    F.array(
                        *[
                            (F.col(f"s{i}") / F.lit(float(_DB_MICRO))) / F.col("n")
                            for i in range(_DB_DIM)
                        ]
                    ),
                    F.lit(0.0),
                    lambda acc, t: acc + t * t,
                ),
            )
        ).alias("scatter"),
    )
    x, y = cent.alias("x"), cent.alias("y")
    dist = F.sqrt(
        F.aggregate(
            F.zip_with(F.col("x.c"), F.col("y.c"), lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, t: acc + t,
        )
    )
    ratio = (F.col("x.scatter") + F.col("y.scatter")) / dist
    w = Window.partitionBy("label").orderBy(F.desc("_r"), F.asc("nearest_label"))
    return (
        x.join(y, F.col("x.label") != F.col("y.label"))
        .select(
            F.col("x.label").alias("label"),
            F.col("x.scatter").alias("_sc"),
            F.col("y.label").alias("nearest_label"),
            ratio.alias("_r"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "label",
            F.round("_sc", 6).alias("scatter"),
            F.round("_r", 6).alias("db_index"),
            "nearest_label",
        )
    )


def _db_index_sql() -> str:
    sums = ", ".join(
        f"sum(mu[{i + 1}]) AS s{i}" for i in range(_DB_DIM)
    )
    comps = ", ".join(
        f"(s{i} / {float(_DB_MICRO)}) / n" for i in range(_DB_DIM)
    )
    return f"""
WITH e AS (
    SELECT CAST(label AS BIGINT) AS label,
           list_transform(embedding::DOUBLE[],
                          x -> CAST(round(x * {_DB_MICRO}) AS BIGINT)) AS mu
    FROM embeddings
),
sums AS (
    SELECT label, count(*) AS n,
           sum(list_sum(list_transform(mu, c -> c * c))) AS sq,
           {sums}
    FROM e GROUP BY label
),
cent AS (
    SELECT label, n, [{comps}] AS c,
           sqrt(greatest(0.0,
               CAST(sq AS DOUBLE) / {float(_DB_MICRO) * _DB_MICRO} / n
               - list_sum(list_transform([{comps}], t -> t * t)))) AS scatter
    FROM sums
),
pairs AS (
    SELECT x.label AS label, x.scatter AS _sc, y.label AS nearest_label,
           (x.scatter + y.scatter)
           / sqrt(list_sum(list_transform(range(1, {_DB_DIM + 1}),
                                          i -> (x.c[i] - y.c[i]) * (x.c[i] - y.c[i])))) AS _r
    FROM cent x JOIN cent y ON x.label <> y.label
),
rk AS (
    SELECT label, _sc, nearest_label, _r,
           row_number() OVER (PARTITION BY label
                              ORDER BY _r DESC, nearest_label ASC) AS rn
    FROM pairs
)
SELECT label, round(_sc, 6) AS scatter, round(_r, 6) AS db_index, nearest_label
FROM rk WHERE rn = 1
"""


QUERIES = {
    "lsh_recall_curve": lsh_recall_curve,
    "customer_cohort_ltv": customer_cohort_ltv,
    "events_dau_mau": events_dau_mau,
    "orders_priority_mix_shift": orders_priority_mix_shift,
    "embedding_hubness": embedding_hubness,
    "events_user_gaps": events_user_gaps,
    "docs_quality_dup_lift": docs_quality_dup_lift,
    "embedding_db_index": embedding_db_index,
}

ORACLES = {
    "lsh_recall_curve": _lsh_recall_sql(),
    "customer_cohort_ltv": CUSTOMER_COHORT_LTV_SQL,
    "events_dau_mau": EVENTS_DAU_MAU_SQL,
    "orders_priority_mix_shift": ORDERS_PRIORITY_MIX_SQL,
    "embedding_hubness": _hubness_sql(),
    "events_user_gaps": EVENTS_USER_GAPS_SQL,
    "docs_quality_dup_lift": DOCS_QUALITY_DUP_LIFT_SQL,
    "embedding_db_index": _db_index_sql(),
}
