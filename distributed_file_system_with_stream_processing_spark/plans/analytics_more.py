"""Range join, group-top-k, and approximate-quantile families.

``events_range_join`` is the showcase: a time-range join with NO
equi-key. Expressed naively (join on ``ts BETWEEN start AND end``)
Spark has no hash key and must plan a nested-loop over every
(event, range) pair — O(n·m) and forbidden by the plan guard. The
scale-correct form buckets time: each range explodes into the hour
buckets it covers, events join on their own hour bucket (equi key →
broadcast/shuffle HASH join), and the exact containment predicate is
re-checked post-join. Bucket fan-out is bounded by
range_span/bucket_width (=3 here), so the join input grows linearly,
not quadratically. This is the standard interval-join decomposition
(Flink's interval join and DuckDB/Trino range-join optimizations use
the same binning idea).

Reference parity: the reference engine has no join operator at all
(rainstorm.go's op1/op2 are per-batch filter/transform/count), so
these extend the engine surface; cited shapes come from its test
queries' spirit (user/tests.go:152-191 — filter+project, filter+count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from distributed_file_system_with_stream_processing_spark.sources.tables import load_table


def events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per campaign window (2h after each flagged purchase), how many
    clicks landed inside the window — bucketed range join as described
    in the module docstring. The small range side is broadcast; the
    events side never shuffles."""
    e = load_table(spark, sf_dir, "events")

    ranges = (
        e.filter((F.col("event_type") == "purchase") & (F.col("user_id") % 97 == 0))
        .select(
            F.col("event_id").alias("range_id"),
            F.col("ts").alias("start_ts"),
            (F.col("ts") + F.expr("interval 2 hours")).alias("end_ts"),
        )
        # explode the range into its covered hour buckets (fan-out ≤ 3)
        .withColumn(
            "bucket",
            F.explode_outer(
                F.sequence(
                    F.date_trunc("HOUR", F.col("start_ts")),
                    F.col("end_ts"),
                    F.expr("interval 1 hour"),
                )
            ),
        )
        .filter(F.col("bucket").isNotNull())
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        F.date_trunc("HOUR", F.col("ts")).alias("bucket"), F.col("ts").alias("click_ts")
    )
    return (
        clicks.join(broadcast(ranges), "bucket")  # equi hash join, no loop
        .filter((F.col("click_ts") >= F.col("start_ts")) & (F.col("click_ts") < F.col("end_ts")))
        .groupBy("range_id")
        .agg(F.count(F.lit(1)).alias("n_clicks"))
    )


EVENTS_RANGE_JOIN_SQL = """
WITH ranges AS (
    SELECT event_id AS range_id, ts AS start_ts,
           ts + INTERVAL 2 HOUR AS end_ts
    FROM events
    WHERE event_type = 'purchase' AND user_id % 97 = 0
)
SELECT range_id, count(*) AS n_clicks
FROM ranges r
JOIN events e
  ON e.event_type = 'click' AND e.ts >= r.start_ts AND e.ts < r.end_ts
GROUP BY range_id
"""


def top_tokens_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-top-k over a derived relation: the 5 most frequent
    whitespace tokens per language. Tokenize → hash-agg counts →
    per-group window rank on the (tiny) post-agg relation. The window
    never sees raw tokens, only (lang, token, cnt) aggregates."""
    from distributed_file_system_with_stream_processing_spark.operators._util import spread

    d = spread(load_table(spark, sf_dir, "documents").select("lang", "text"))
    counts = (
        d.select(
            "lang",
            F.explode_outer(F.split(F.lower(F.col("text")), r"\s+")).alias("token"),
        )
        .filter(F.col("token").isNotNull() & (F.col("token") != ""))
        .groupBy("lang", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("cnt"), F.asc("token"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("lang", "token", "cnt", F.col("rn").cast("long").alias("rank"))
    )


TOP_TOKENS_SQL = """
WITH tok AS (
    SELECT lang,
           unnest(regexp_split_to_array(lower(text), '\\s+')) AS token
    FROM documents
),
c AS (
    SELECT lang, token, count(*) AS cnt
    FROM tok WHERE token IS NOT NULL AND token <> ''
    GROUP BY lang, token
),
r AS (
    SELECT lang, token, cnt,
           row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, token) AS rank
    FROM c
)
SELECT lang, token, cnt, rank FROM r WHERE rank <= 5
"""


def order_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate order-value quantiles per priority —
    ``percentile_approx`` (Greenwald-Khanna sketch) is the 100 TB
    path: mergeable per-partition sketches, one narrow shuffle of
    sketch state instead of a global sort. Rows-only (sketch results
    are engine-specific); accuracy pinned against the exact
    percentiles in tests/test_queries.py."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.percentile_approx("o_totalprice", 0.5, 10000), 2).alias("p50"),
        F.round(F.percentile_approx("o_totalprice", 0.9, 10000), 2).alias("p90"),
        F.round(F.percentile_approx("o_totalprice", 0.99, 10000), 2).alias("p99"),
    )


def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Built-in ``session_window`` sessionization — the streaming-native
    twin of ``events_sessionize`` (plans/analytics.py). One hash-agg
    shuffle on (user_id, merged window), no sort-based window function
    pass at all; in Structured Streaming the identical expression runs
    incrementally with watermark-bounded state.

    Semantics note vs the lag/cumsum variant: session_window's window
    is half-open [ts, ts + gap), so a successor event exactly ``gap``
    seconds later starts a NEW session (the lag version's ``> gap``
    keeps it). The oracle mirrors that with ``>= 1800``.
    """
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format(F.col("sw.start"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.col("sw.end"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
        )
    )


EVENTS_SESSION_WINDOW_SQL = """
WITH flagged AS (
    SELECT user_id, ts, event_id,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR date_part('epoch', ts) - date_part('epoch', lag(ts) OVER w) >= 1800
                THEN 1 ELSE 0 END AS is_new
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessions AS (
    SELECT user_id, ts,
           sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_id
    FROM flagged
)
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
       count(*) AS n_events
FROM sessions
GROUP BY user_id, session_id
"""


def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly cohort retention: for each first-activity month, how
    many of its users are active k months later. Two hash aggregates
    (distinct user-months; first month per user) and one join keyed on
    user_id — the fact table is touched once. The months_since math is
    pure date arithmetic (integer-exact, engine-portable)."""
    e = load_table(spark, sf_dir, "events")
    activity = (
        e.select("user_id", F.date_trunc("MONTH", F.col("ts")).alias("m")).distinct()
    )
    first = activity.groupBy("user_id").agg(F.min("m").alias("cohort"))
    return (
        activity.join(first, "user_id")
        .groupBy(
            F.date_format("cohort", "yyyy-MM").alias("cohort_month"),
            (
                (F.year("m") - F.year("cohort")) * 12
                + (F.month("m") - F.month("cohort"))
            ).cast("long").alias("months_since"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


EVENTS_COHORT_SQL = """
WITH activity AS (
    SELECT DISTINCT user_id, date_trunc('month', ts) AS m FROM events
),
first AS (
    SELECT user_id, min(m) AS cohort FROM activity GROUP BY user_id
)
SELECT strftime(cohort, '%Y-%m') AS cohort_month,
       CAST((year(m) - year(cohort)) * 12 + (month(m) - month(cohort)) AS BIGINT)
           AS months_since,
       count(*) AS n_users
FROM activity JOIN first USING (user_id)
GROUP BY 1, 2
"""


def lineitem_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate family: dispersion + dependence measures
    per return flag. All are single-pass decomposable aggregates
    (partial moments merge associatively), so the plan is the same
    two-HashAggregate shape as a sum — no extra passes at 100 TB.
    Rounding: absolute quantities to 2dp, the scale-free correlation
    to 6dp (float-sum association error is far below both)."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_extendedprice"), 2).alias("price_sd"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("qty_price_cov"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        F.round(F.avg("l_discount"), 6).alias("avg_discount"),
    )


LINEITEM_PRICE_STATS_SQL = """
SELECT l_returnflag,
       round(stddev_samp(l_extendedprice), 2)          AS price_sd,
       round(covar_samp(l_quantity, l_extendedprice), 2) AS qty_price_cov,
       round(corr(l_quantity, l_extendedprice), 6)     AS qty_price_corr,
       round(avg(l_discount), 6)                       AS avg_discount
FROM lineitem
GROUP BY l_returnflag
"""


def orders_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-bound histogram via width_bucket — integer bucket ids, so
    the groupBy key is exact on any engine. One hash-agg pass; the
    bucket expression is codegen'd arithmetic, never a UDF."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.width_bucket(F.col("o_totalprice"), F.lit(0.0), F.lit(600000.0), F.lit(24))
            .cast("long")
            .alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )


# DuckDB has no width_bucket; this is its exact contract spelled out
# (0 below min, nbins+1 at/above max, else 1 + floor((v-min)/width))
ORDERS_VALUE_HISTOGRAM_SQL = """
SELECT CAST(CASE WHEN o_totalprice < 0.0 THEN 0
            WHEN o_totalprice >= 600000.0 THEN 25
            ELSE 1 + floor(o_totalprice / 25000.0) END AS BIGINT) AS bucket,
       count(*) AS n_orders,
       round(min(o_totalprice), 2) AS lo,
       round(max(o_totalprice), 2) AS hi
FROM orders
GROUP BY 1
"""


def customer_value_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-rank window family (cume_dist): each customer's
    cumulative-distribution position of account balance within their
    market segment, for the decile of top customers. cume_dist is
    rank-count arithmetic (exact rational division — engine-portable,
    unlike transcendental scores). One shuffle on the segment key."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal")
    return (
        c.select(
            "c_custkey",
            "c_mktsegment",
            F.round("c_acctbal", 2).alias("acctbal"),
            F.round(F.cume_dist().over(w), 6).alias("bal_cume"),
        )
        .filter(F.col("bal_cume") >= 0.99)
    )


CUSTOMER_CUME_DIST_SQL = """
SELECT c_custkey, c_mktsegment, round(c_acctbal, 2) AS acctbal, bal_cume
FROM (
    SELECT c_custkey, c_mktsegment, c_acctbal,
           round(cume_dist() OVER (PARTITION BY c_mktsegment
                                   ORDER BY c_acctbal), 6) AS bal_cume
    FROM customer
)
WHERE bal_cume >= 0.99
"""


def events_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join with tolerance: each click matched to the
    user's NEXT purchase at-or-after it, but only within 1 hour — the
    attribution-window operator (did the click convert, and how
    fast). Complements events_asof_join (backward, unbounded) with
    the direction and the bounded-gap semantics real attribution
    uses.

    Same union+window trick, mirrored: tag both streams, sort by
    (ts, tag) within user (click before purchase at equal ts, so a
    same-instant purchase matches), carry the FIRST purchase BACKWARD
    via first(ignorenulls) over [currentRow, unboundedFollowing] —
    ONE shuffle on user_id, no (click × later-purchase) range
    explosion. The tolerance is applied after the match: a purchase
    further than 1 h out reports the sentinel, exactly like a missing
    one. wait_s is an exact integer second diff — float-free.
    Oracle: DuckDB native forward ASOF (p.ts >= c.ts) + the same
    tolerance CASE."""
    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.min("event_id").alias("purchase_event_id"))
    )
    tagged = clicks.select(
        "user_id",
        "ts",
        F.lit(0).alias("tag"),
        "event_id",
        F.lit(None).cast("long").alias("purchase_event_id"),
    ).unionByName(
        purchases.select(
            "user_id",
            "ts",
            F.lit(1).alias("tag"),
            F.lit(None).cast("long").alias("event_id"),
            "purchase_event_id",
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    p_ts = F.when(F.col("tag") == 1, F.col("ts"))
    p_id = F.when(F.col("tag") == 1, F.col("purchase_event_id"))
    within = F.col("next_p_ts").isNotNull() & (
        F.col("next_p_ts") <= F.col("ts") + F.expr("INTERVAL 1 HOUR")
    )
    return (
        tagged.withColumn("next_p_ts", F.first(p_ts, ignorenulls=True).over(w))
        .withColumn("next_p_id", F.first(p_id, ignorenulls=True).over(w))
        .filter(F.col("tag") == 0)
        .select(
            "event_id",
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
            F.when(
                within, F.date_format("next_p_ts", "yyyy-MM-dd HH:mm:ss")
            ).otherwise("(none)").alias("purchase_ts"),
            F.when(within, F.col("next_p_id")).otherwise(-1).alias("purchase_event_id"),
            F.when(
                within,
                F.unix_timestamp("next_p_ts") - F.unix_timestamp("ts"),
            ).otherwise(-1).cast("long").alias("wait_s"),
        )
    )


EVENTS_ASOF_FORWARD_SQL = """
WITH c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
p AS (SELECT user_id, ts, min(event_id) AS purchase_event_id
      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
SELECT c.event_id, c.user_id,
       strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS ts,
       CASE WHEN p.ts IS NOT NULL AND p.ts <= c.ts + INTERVAL 1 HOUR
            THEN strftime(p.ts, '%Y-%m-%d %H:%M:%S') ELSE '(none)' END AS purchase_ts,
       CASE WHEN p.ts IS NOT NULL AND p.ts <= c.ts + INTERVAL 1 HOUR
            THEN p.purchase_event_id ELSE -1 END AS purchase_event_id,
       CASE WHEN p.ts IS NOT NULL AND p.ts <= c.ts + INTERVAL 1 HOUR
            THEN CAST(floor(epoch(p.ts)) AS BIGINT)
                 - CAST(floor(epoch(c.ts)) AS BIGINT) ELSE -1 END AS wait_s
FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND p.ts >= c.ts
"""


# ---------------------------------------------------------------------------
# customer_rfm_segments — the classic CRM scoring shape (ntile windows)


def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation (Hughes 1994, the standard CRM recipe): per
    customer, Recency (days since last order, anchored to the global
    max order date so the result is a pure function of the data),
    Frequency (order count) and Monetary (total spend), each scored
    1-4 by quartile — ntile(4) windows, the one ranking shape the
    registry didn't cover yet. Score 4 = best quartile on every axis.

    Determinism: ntile's bucket boundaries depend only on the ORDER,
    and every ordering carries a c_custkey tie-break; monetary sums
    quantize each 2-decimal o_totalprice to exact integer CENTS
    (round(p·100)::long — the nation_revenue_hhi discipline) so the
    per-customer total is an order-free integer fold in BOTH engines
    and the m_score ordering can never flip on FP summation order
    (the r4 advisor flagged the raw-double sum as a flaky-hash risk).
    Output joins the integer scores with the raw measures (cents/100
    for the display column only).

    100 TB shape: one shuffle on o_custkey for the per-customer fold;
    the three ntile windows run over the CUSTOMER-scale aggregate
    (the corpus_zipf_fit global-window stance — fine on a table
    bounded by customers, and at 1000 executors this is the stage
    you'd range-repartition if customers outgrew one task); the
    global max date rides a 1-row broadcast.
    """
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("_last"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("_cents"),
    )
    anchor = o.agg(F.max("o_orderdate").alias("_anchor"))
    base = per_cust.crossJoin(broadcast(anchor)).select(
        F.col("o_custkey").alias("custkey"),
        F.datediff(F.col("_anchor"), F.col("_last")).cast("long").alias("recency_days"),
        "frequency",
        "_cents",
    )
    w_r = Window.orderBy(F.asc("recency_days"), F.asc("custkey"))
    w_f = Window.orderBy(F.desc("frequency"), F.asc("custkey"))
    w_m = Window.orderBy(F.desc("_cents"), F.asc("custkey"))
    return base.select(
        "custkey",
        "recency_days",
        "frequency",
        # ok-round: exact cents grid (2 dp)
        F.round(F.col("_cents") / 100, 2).alias("monetary"),
        (5 - F.ntile(4).over(w_r)).cast("long").alias("r_score"),
        (5 - F.ntile(4).over(w_f)).cast("long").alias("f_score"),
        (5 - F.ntile(4).over(w_m)).cast("long").alias("m_score"),
    )


CUSTOMER_RFM_SQL = """
WITH pc AS (
    SELECT o_custkey AS custkey,
           max(o_orderdate) AS last_order,
           count(*) AS frequency,
           sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
    FROM orders GROUP BY o_custkey
),
anchor AS (SELECT max(o_orderdate) AS a FROM orders),
base AS (
    SELECT custkey,
           CAST(date_diff('day', last_order, an.a) AS BIGINT) AS recency_days,
           frequency, cents
    FROM pc CROSS JOIN anchor an
)
SELECT custkey, recency_days, CAST(frequency AS BIGINT) AS frequency,
       -- ok-round: exact cents grid (2 dp)
       round(cents / 100.0, 2) AS monetary,
       CAST(5 - ntile(4) OVER (ORDER BY recency_days ASC, custkey ASC) AS BIGINT) AS r_score,
       CAST(5 - ntile(4) OVER (ORDER BY frequency DESC, custkey ASC) AS BIGINT) AS f_score,
       CAST(5 - ntile(4) OVER (ORDER BY cents DESC, custkey ASC) AS BIGINT) AS m_score
FROM base
"""


# ---------------------------------------------------------------------------
# nation_revenue_hhi — market-concentration rollup


def nation_revenue_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman concentration index of supplier revenue
    within each nation: HHI = Σ_s share_s² with share_s the supplier's
    fraction of its nation's lineitem revenue — the market-structure
    diagnostic (10000·HHI > 2500 ⇒ concentrated). Exactness: revenue
    micro-quantizes per line item (round(extprice·(1−disc)·1e2) — the
    q9 integer-cents trick), per-supplier and per-nation sums are
    exact integer folds, and HHI = Σ s_i² / S² evaluates as
    (Σ exact s_i²) / (S·S) in one fixed double division.

    100 TB shape: lineitem → (suppkey) partial-agg shuffle [corpus
    scale, map-side combine]; supplier→nation is a broadcast dim
    join; the nation rollup is a 25-key shuffle. Nothing quadratic —
    the share-squared sum folds on the supplier aggregate, never on
    raw lines.
    """
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    per_supp = (
        li.select(F.col("l_suppkey").alias("s_suppkey"), cents.alias("_c"))
        .groupBy("s_suppkey")
        .agg(F.sum("_c").alias("rev_c"))
        .join(broadcast(sup), "s_suppkey")
        .join(broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    agg = per_supp.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.sum("rev_c").alias("_tot"),
        F.sum(
            F.col("rev_c").cast("decimal(19,0)") * F.col("rev_c").cast("decimal(19,0)")
        ).alias("_sq"),
    )
    return agg.select(
        F.col("n_name").alias("nation"),
        "n_suppliers",
        # ok-round: exact cents grid (2 dp)
        F.round(F.col("_tot").cast("double") / 100, 2).alias("revenue"),
        # r9 conversion (wave 3): HHI = Σs²/S² at 6 dp — truncating
        # integer division in decimal(38,0) ↔ HUGEINT (Σs²·10⁶ ≈ 1e33
        # at 100 TB, inside 38 digits)
        (
            F.expr(
                "(cast(_sq as decimal(38,0)) * 1000000)"
                " div (cast(_tot as decimal(38,0)) * _tot)"
            ).cast("double")
            / 1e6
        ).alias("hhi"),
    )


NATION_HHI_SQL = """
WITH ps AS (
    SELECT l_suppkey AS s_suppkey,
           sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS rev_c
    FROM lineitem GROUP BY l_suppkey
),
j AS (
    SELECT n.n_name AS nation, p.rev_c
    FROM ps p
    JOIN supplier s ON p.s_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
),
agg AS (
    SELECT nation, count(*) AS n_suppliers,
           sum(rev_c) AS tot,
           sum(CAST(rev_c AS HUGEINT) * rev_c) AS sq
    FROM j GROUP BY nation
)
SELECT nation, CAST(n_suppliers AS BIGINT) AS n_suppliers,
       -- ok-round: exact cents grid (2 dp)
       round(CAST(tot AS DOUBLE) / 100, 2) AS revenue,
       CAST((sq * 1000000) // (CAST(tot AS HUGEINT) * tot) AS DOUBLE)
           / 1000000.0 AS hhi
FROM agg
"""


# ---------------------------------------------------------------------------
# events_hourly_profile — seasonality fingerprint


def events_hourly_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonality per event type: (event_type, hour, n,
    share-of-type) — the traffic fingerprint capacity planning and
    anomaly baselines read first. Deterministic across engines because
    ``load_table`` pins the session timezone to UTC for events, so
    Spark's hour() and DuckDB's date_part('hour') see the same wall
    clock; counts are exact integers and the share divides once.

    100 TB shape: one partial-agg shuffle on the 24×|types| key —
    map-side combine collapses each partition to ≤ 24·|types| rows;
    the per-type total comes from a window over the tiny aggregate,
    not a second pass over the data.
    """
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy(
        "event_type", F.hour("ts").cast("long").alias("hour")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type")
    # r9 conversion (wave 3): truncating integer division at 6 dp
    return agg.withColumn("_t", F.sum("n").over(w)).select(
        "event_type",
        "hour",
        "n",
        (F.expr("(n * 1000000) div _t").cast("double") / 1e6).alias("share"),
    )


EVENTS_HOURLY_SQL = """
WITH agg AS (
    SELECT event_type, CAST(date_part('hour', ts) AS BIGINT) AS hour,
           count(*) AS n
    FROM events GROUP BY event_type, date_part('hour', ts)
)
SELECT event_type, hour, CAST(n AS BIGINT) AS n,
       CAST((n * 1000000) // sum(n) OVER (PARTITION BY event_type) AS DOUBLE)
           / 1000000.0 AS share
FROM agg
"""


# ---------------------------------------------------------------------------
# events_pareto_users — value-concentration curve


_PARETO_PCTS = (1, 5, 10)


def events_pareto_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto concentration of event value: what share of the total
    event value the top 1% / 5% / 10% of users (by their value sum)
    account for — the "is this corpus a few whales" diagnostic, the
    user-axis complement of ngram_coverage_curve's token-mass curve.

    Exactness: per-user value sums micro-quantize per EVENT (round(
    value·1e6), exact integer user fold), users rank with a user_id
    tie-break, the top-p% boundary is floor(p·n/100) — an integer —
    and the cumulative sum folds exact integers; only the final share
    divides.

    100 TB shape: one corpus shuffle on user_id [map-side partials];
    the rank + cumsum windows run over the USER-scale aggregate, cut
    to the top decile before the cumsum.
    """
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.round(F.col("value") * 1_000_000).cast("long")).alias("v_mu")
    )
    totals = per_user.agg(
        F.count(F.lit(1)).alias("n_users"), F.sum("v_mu").alias("t_mu")
    )
    rk = Window.orderBy(F.desc("v_mu"), F.asc("user_id"))
    ranked = per_user.withColumn("rank", F.row_number().over(rk))
    cum = Window.orderBy("rank").rowsBetween(Window.unboundedPreceding, 0)
    curve = (
        ranked.crossJoin(broadcast(totals))
        .filter(F.col("rank") <= F.floor(F.col("n_users") * max(_PARETO_PCTS) / 100))
        .withColumn("cum_mu", F.sum("v_mu").over(cum))
    )
    out = None
    for p in _PARETO_PCTS:
        piece = curve.filter(
            F.col("rank") == F.floor(F.col("n_users") * p / 100)
        ).select(
            F.lit(p).cast("long").alias("top_pct"),
            F.col("rank").cast("long").alias("n_top_users"),
            # r9 conversion (wave 3): truncating integer division at
            # 6 dp in decimal(38,0) ↔ HUGEINT (micro-sum headroom)
            (
                F.expr("(cast(cum_mu as decimal(38,0)) * 1000000) div t_mu")
                .cast("double") / 1e6
            ).alias("value_share"),
        )
        out = piece if out is None else out.unionByName(piece)
    return out


EVENTS_PARETO_SQL = f"""
WITH pu AS (
    SELECT user_id,
           sum(CAST(round(value * 1000000) AS BIGINT)) AS v_mu
    FROM events GROUP BY user_id
),
tt AS (SELECT count(*) AS n_users, sum(v_mu) AS t_mu FROM pu),
ranked AS (
    SELECT v_mu, row_number() OVER (ORDER BY v_mu DESC, user_id ASC) AS rank
    FROM pu
),
curve AS (
    SELECT rank,
           sum(v_mu) OVER (ORDER BY rank
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_mu
    FROM ranked CROSS JOIN tt
    WHERE rank <= floor(n_users * {max(_PARETO_PCTS)} / 100)
)
SELECT p.p AS top_pct, CAST(c.rank AS BIGINT) AS n_top_users,
       CAST((CAST(c.cum_mu AS HUGEINT) * 1000000) // t.t_mu AS DOUBLE)
           / 1000000.0 AS value_share
FROM (SELECT unnest(ARRAY{list(_PARETO_PCTS)}::BIGINT[]) AS p) p
JOIN tt t ON TRUE
JOIN curve c ON c.rank = floor(t.n_users * p.p / 100)
"""


# ---------------------------------------------------------------------------
# events_type_overlap — audience Jaccard between event types


def events_type_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap between event types: for every unordered type
    pair, |users doing both| / |users doing either| (Jaccard) — the
    funnel-design diagnostic ("do purchasers come from clickers?").
    Never a user-level pair join: distinct (user, type) memberships
    fold once, the pair join runs on the per-user TYPE SETS (bounded
    by |types|² per user, |types| ~ a handful), and per-type totals
    come from the membership aggregate.

    Exactness: all three counts are exact integers; the Jaccard
    divides once. Pair key ordered (ta < tb) so each pair appears
    once.

    100 TB shape: one corpus shuffle to distinct (user, type)
    memberships [map-side partial]; the within-user pair explode is
    |types|²-bounded per user and feeds a |types|²-key partial agg;
    per-type totals ride a broadcast join onto the tiny pair table.
    """
    ev = load_table(spark, sf_dir, "events")
    mem = ev.select("user_id", "event_type").distinct()
    a = mem.select("user_id", F.col("event_type").alias("ta"))
    b = mem.select("user_id", F.col("event_type").alias("tb"))
    both = (
        a.join(b, "user_id")
        .filter(F.col("ta") < F.col("tb"))
        .groupBy("ta", "tb")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    totals = mem.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    out = (
        both.join(
            broadcast(totals.select(F.col("event_type").alias("ta"), F.col("n").alias("na"))),
            "ta",
        )
        .join(
            broadcast(totals.select(F.col("event_type").alias("tb"), F.col("n").alias("nb"))),
            "tb",
        )
    )
    either = F.col("na") + F.col("nb") - F.col("n_both")
    # r9 conversion (wave 3): truncating integer division at 6 dp
    return out.select(
        "ta",
        "tb",
        "n_both",
        either.alias("n_either"),
        (
            F.expr("(n_both * 1000000) div (na + nb - n_both)").cast("double")
            / 1e6
        ).alias("jaccard"),
    )


EVENTS_TYPE_OVERLAP_SQL = """
WITH mem AS (SELECT DISTINCT user_id, event_type FROM events),
both_t AS (
    SELECT a.event_type AS ta, b.event_type AS tb, count(*) AS n_both
    FROM mem a JOIN mem b ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY a.event_type, b.event_type
),
tt AS (SELECT event_type, count(*) AS n FROM mem GROUP BY event_type)
SELECT b.ta, b.tb, CAST(b.n_both AS BIGINT) AS n_both,
       CAST(x.n + y.n - b.n_both AS BIGINT) AS n_either,
       CAST((b.n_both * 1000000) // (x.n + y.n - b.n_both) AS DOUBLE)
           / 1000000.0
           AS jaccard
FROM both_t b
JOIN tt x ON b.ta = x.event_type
JOIN tt y ON b.tb = y.event_type
"""


# ---------------------------------------------------------------------------
# supplier_fulfillment_lag — order→ship latency profile


def supplier_fulfillment_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fulfillment-latency profile by order priority: mean order→ship
    lag in days, slow-line rate (shipped > 60 days after the order)
    and worst lag — the logistics complement of Q12's priority counts
    (this testdata has no commit/receipt dates, so the measured lag is
    o_orderdate → l_shipdate). Day diffs are exact integers on
    midnight-aligned timestamps (datediff ↔ date_diff('day'), tz-free).

    100 TB shape: the canonical fact-fact orderkey join (lineitem
    pruned to two columns at the scan) + one partial-agg shuffle on
    the 5-key priority column.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    lag = F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).cast("long")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select("o_orderpriority", lag.alias("lag_days"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum("lag_days").alias("_s"),
            F.sum(F.when(F.col("lag_days") > 60, 1).otherwise(0))
            .cast("long")
            .alias("n_slow"),
            F.max("lag_days").alias("max_lag_days"),
        )
        .select(
            "o_orderpriority",
            "n_lines",
            # r9 conversion (wave 3): truncating integer division —
            # mean at 4 dp, rate at 6 dp
            (F.expr("(_s * 10000) div n_lines").cast("double") / 1e4).alias(
                "mean_lag_days"
            ),
            "n_slow",
            (
                F.expr("(n_slow * 1000000) div n_lines").cast("double") / 1e6
            ).alias("slow_rate"),
            "max_lag_days",
        )
    )


SUPPLIER_FULFILLMENT_SQL = """
WITH lag AS (
    SELECT o.o_orderpriority,
           CAST(date_diff('day', o.o_orderdate, l.l_shipdate) AS BIGINT) AS lag_days
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_lines,
       CAST((sum(lag_days) * 10000) // count(*) AS DOUBLE) / 10000.0
           AS mean_lag_days,
       CAST(sum(CASE WHEN lag_days > 60 THEN 1 ELSE 0 END) AS BIGINT) AS n_slow,
       CAST((sum(CASE WHEN lag_days > 60 THEN 1 ELSE 0 END) * 1000000)
            // count(*) AS DOUBLE) / 1000000.0 AS slow_rate,
       CAST(max(lag_days) AS BIGINT) AS max_lag_days
FROM lag GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# orders_backlog_series — running open-order balance


def orders_backlog_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly open-order backlog: per month, orders placed, orders
    completed (their LAST line shipped that month), and the running
    balance placed−completed — the event-sourcing ledger shape
    (cumulative net flow over bucketed time) the registry didn't have.

    Exactness: month keys are strings off midnight timestamps
    (tz-free), all counts are integers, and the running balance is an
    integer cumsum over the ~85-row month series.

    100 TB shape: per-order completion = max(l_shipdate) folds on ONE
    l_orderkey shuffle (the fact table's natural key); placed/
    completed monthly counts are partial aggs into a month-cardinality
    key; the cumsum window runs over the tiny month series. A FULL
    OUTER month join keeps months where only one flow occurred.
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    placed = o.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month")
    ).agg(F.count(F.lit(1)).alias("n_placed"))
    done = (
        li.groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("_done"))
        .groupBy(F.date_format("_done", "yyyy-MM").alias("month"))
        .agg(F.count(F.lit(1)).alias("n_completed"))
    )
    merged = (
        placed.join(done, "month", "full_outer")
        .select(
            "month",
            F.coalesce("n_placed", F.lit(0)).alias("n_placed"),
            F.coalesce("n_completed", F.lit(0)).alias("n_completed"),
        )
    )
    w = Window.orderBy("month").rowsBetween(Window.unboundedPreceding, 0)
    return merged.select(
        "month",
        "n_placed",
        "n_completed",
        F.sum(F.col("n_placed") - F.col("n_completed")).over(w).alias("backlog"),
    )


ORDERS_BACKLOG_SQL = """
WITH placed AS (
    SELECT strftime(o_orderdate, '%Y-%m') AS month, count(*) AS n_placed
    FROM orders GROUP BY strftime(o_orderdate, '%Y-%m')
),
done AS (
    SELECT strftime(d, '%Y-%m') AS month, count(*) AS n_completed
    FROM (SELECT l_orderkey, max(l_shipdate) AS d FROM lineitem GROUP BY l_orderkey)
    GROUP BY strftime(d, '%Y-%m')
),
merged AS (
    SELECT coalesce(p.month, c.month) AS month,
           coalesce(p.n_placed, 0) AS n_placed,
           coalesce(c.n_completed, 0) AS n_completed
    FROM placed p FULL OUTER JOIN done c ON p.month = c.month
)
SELECT month, CAST(n_placed AS BIGINT) AS n_placed,
       CAST(n_completed AS BIGINT) AS n_completed,
       CAST(sum(n_placed - n_completed)
            OVER (ORDER BY month ROWS UNBOUNDED PRECEDING) AS BIGINT) AS backlog
FROM merged
"""


QUERIES = {
    "events_range_join": events_range_join,
    "customer_rfm_segments": customer_rfm_segments,
    "nation_revenue_hhi": nation_revenue_hhi,
    "events_hourly_profile": events_hourly_profile,
    "events_pareto_users": events_pareto_users,
    "events_type_overlap": events_type_overlap,
    "supplier_fulfillment_lag": supplier_fulfillment_lag,
    "orders_backlog_series": orders_backlog_series,
    "events_asof_forward": events_asof_forward,
    "events_session_window": events_session_window,
    "events_cohort_retention": events_cohort_retention,
    "lineitem_price_stats": lineitem_price_stats,
    "orders_value_histogram": orders_value_histogram,
    "customer_value_cume_dist": customer_value_cume_dist,
    "top_tokens_per_lang": top_tokens_per_lang,
    "order_percentiles_approx": order_percentiles_approx,
}

ORACLES = {
    "events_range_join": EVENTS_RANGE_JOIN_SQL,
    "customer_rfm_segments": CUSTOMER_RFM_SQL,
    "nation_revenue_hhi": NATION_HHI_SQL,
    "events_hourly_profile": EVENTS_HOURLY_SQL,
    "events_pareto_users": EVENTS_PARETO_SQL,
    "events_type_overlap": EVENTS_TYPE_OVERLAP_SQL,
    "supplier_fulfillment_lag": SUPPLIER_FULFILLMENT_SQL,
    "orders_backlog_series": ORDERS_BACKLOG_SQL,
    "events_asof_forward": EVENTS_ASOF_FORWARD_SQL,
    "events_session_window": EVENTS_SESSION_WINDOW_SQL,
    "events_cohort_retention": EVENTS_COHORT_SQL,
    "lineitem_price_stats": LINEITEM_PRICE_STATS_SQL,
    "orders_value_histogram": ORDERS_VALUE_HISTOGRAM_SQL,
    "customer_value_cume_dist": CUSTOMER_CUME_DIST_SQL,
    "top_tokens_per_lang": TOP_TOKENS_SQL,
}
