"""Round-6 batch IV: behavioral co-occurrence and trend screens over
events/orders, plus two template-shape text profiles.

Same contract as the other ``llm_ops*`` modules: declarative
DataFrame plans (JVM expressions only) with DuckDB oracles mirroring
the exact arithmetic, so value hashes match without tolerances.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from distributed_file_system_with_stream_processing_spark.functions import text as T
from distributed_file_system_with_stream_processing_spark.operators._util import spread
from distributed_file_system_with_stream_processing_spark.plans.llm_ops import _WS
from distributed_file_system_with_stream_processing_spark.sources.tables import load_table

_MICRO = 1_000_000

# ---------------------------------------------------------------------------
# events_type_cooccurrence_lift


def events_type_cooccurrence_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise event-type lift over (user, day) sessions-of-record:
    lift(a,b) = P(a∧b) / (P(a)·P(b)) with the (user, day) unit — the
    basket-analysis read (``part_pair_lift``) applied to behavior:
    lift ≫ 1 means the two actions travel together within a day,
    lift < 1 means they repel (e.g. error days suppress purchases).

    Exactness: unit = tz-free integer day (epoch_sec // 86400); all
    four counts (units, n_a, n_b, n_ab) are exact integers from
    distinct-rollups; lift = (n_ab·n_units) / (n_a·n_b) multiplies
    exact DECIMALs and divides once at 6 dp.

    100 TB shape: one (user, day, type) distinct shuffle; the pair
    self-join is keyed on (user, day) with per-unit fan-out ≤
    C(|types|,2) (types is a small closed set); per-type totals are a
    |types|-row broadcast join and the unit total the allow-listed
    1-row BuildRight broadcast.
    """
    e = load_table(spark, sf_dir, "events")
    sec = F.col("ts").cast("long")
    udt = e.select(
        "user_id",
        (sec / 86400).cast("long").alias("day"),
        "event_type",
    ).distinct()
    tot = udt.select("user_id", "day").distinct().agg(
        F.count(F.lit(1)).alias("n_units")
    )
    per_type = udt.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_t"))
    a = udt.select("user_id", "day", F.col("event_type").alias("type_a"))
    b = udt.select("user_id", "day", F.col("event_type").alias("type_b"))
    pairs = (
        a.join(b, ["user_id", "day"])
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    joined = (
        pairs.join(
            broadcast(per_type.select(F.col("event_type").alias("type_a"), F.col("n_t").alias("n_a"))),
            "type_a",
        )
        .join(
            broadcast(per_type.select(F.col("event_type").alias("type_b"), F.col("n_t").alias("n_b"))),
            "type_b",
        )
        .crossJoin(broadcast(tot))
    )
    # r8 conversion: lift = n_ab·N/(n_a·n_b) is an exact rational —
    # truncating integer division at 6 dp in DECIMAL(38,0)
    lift_mu = F.expr(
        "(cast(n_ab as decimal(38,0)) * n_units * 1000000)"
        " div (cast(n_a as decimal(38,0)) * n_b)"
    )
    return joined.select(
        "type_a",
        "type_b",
        F.col("n_ab").cast("long").alias("n_units_both"),
        (lift_mu.cast("double") / 1e6).alias("lift"),
    )


EVENTS_TYPE_COOCCURRENCE_SQL = """
WITH udt AS (
    SELECT DISTINCT user_id, epoch_us(ts) // 1000000 // 86400 AS day, event_type
    FROM events
),
tot AS (SELECT count(*) AS n_units FROM (SELECT DISTINCT user_id, day FROM udt)),
per_type AS (SELECT event_type, count(*) AS n_t FROM udt GROUP BY event_type),
pairs AS (
    SELECT a.event_type AS type_a, b.event_type AS type_b, count(*) AS n_ab
    FROM udt a JOIN udt b
      ON a.user_id = b.user_id AND a.day = b.day AND a.event_type < b.event_type
    GROUP BY 1, 2
)
SELECT type_a, type_b,
       CAST(n_ab AS BIGINT) AS n_units_both,
       CAST((CAST(n_ab AS HUGEINT) * n_units * 1000000)
            // (CAST(na.n_t AS HUGEINT) * nb.n_t) AS DOUBLE)
           / 1000000.0 AS lift
FROM pairs
JOIN per_type na ON na.event_type = type_a
JOIN per_type nb ON nb.event_type = type_b
CROSS JOIN tot
"""


# ---------------------------------------------------------------------------
# events_peak_to_mean_by_user


def events_peak_to_mean_by_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of per-user peak-to-mean hourly load (busiest active
    hour ÷ mean over ACTIVE hours, 0.5-wide buckets capped at 9) —
    the per-user flavor of ``events_peak_rate``: a ratio near 1 is a
    steady drip (bot-like), high ratios are bursty humans.

    Exactness: per-user (peak, n_events, n_hours) are exact integers
    from an (user, hour) rollup; ratio = peak·n_hours / n_events
    multiplies exact DECIMALs and divides once; the bucket floor sees
    the same double in both engines.

    100 TB shape: one (user, hour) partial-agg shuffle, a user rollup
    reusing the leading key, a 10-row histogram.
    """
    e = load_table(spark, sf_dir, "events")
    sec = F.col("ts").cast("long")
    uh = (
        e.select("user_id", (sec / 3600).cast("long").alias("h"))
        .groupBy("user_id", "h")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    per = uh.groupBy("user_id").agg(
        F.max("c").alias("peak"),
        F.sum("c").alias("n_events"),
        F.count(F.lit(1)).alias("n_hours"),
    )
    ratio = (dec("peak") * dec("n_hours")).cast("double") / F.col(
        "n_events"
    ).cast("double")
    bucket = F.least(F.floor(ratio * 2), F.lit(9))
    return (
        per.select(bucket.cast("long").alias("ratio_bucket"))
        .groupBy("ratio_bucket")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


EVENTS_PEAK_TO_MEAN_SQL = """
WITH uh AS (
    SELECT user_id, epoch_us(ts) // 1000000 // 3600 AS h, count(*) AS c
    FROM events GROUP BY 1, 2
),
per AS (
    SELECT user_id, max(c) AS peak, sum(c) AS n_events, count(*) AS n_hours
    FROM uh GROUP BY user_id
)
SELECT CAST(least(CAST(floor(CAST(CAST(peak AS HUGEINT) * n_hours AS DOUBLE)
                              / CAST(n_events AS DOUBLE) * 2) AS BIGINT), 9)
            AS BIGINT) AS ratio_bucket,
       CAST(count(*) AS BIGINT) AS n_users
FROM per GROUP BY 1
"""


# ---------------------------------------------------------------------------
# events_quiet_hours


def events_quiet_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of quiet hours per day (hours-of-day with ZERO
    events, 24 − active hours) — the coverage/uptime screen: a
    healthy high-volume stream has 0 quiet hours; quiet-hour spikes
    are outages or collection gaps, the load-side complement of
    ``events_hourly_profile``.

    Exactness: integer-only — tz-free integer day and hour-of-day,
    distinct (day, hour) rollup, 24 − count, histogram.

    100 TB shape: one (day, hour) distinct shuffle (≤ 24 rows per
    day survive), a day rollup, a ≤25-row histogram.
    """
    e = load_table(spark, sf_dir, "events")
    sec = F.col("ts").cast("long")
    dh = e.select(
        (sec / 86400).cast("long").alias("day"),
        (sec % 86400 / 3600).cast("long").alias("hour"),
    ).distinct()
    per = dh.groupBy("day").agg(
        (F.lit(24) - F.count(F.lit(1))).alias("quiet_hours")
    )
    return (
        per.groupBy(F.col("quiet_hours").cast("long").alias("quiet_hours"))
        .agg(F.count(F.lit(1)).alias("n_days"))
    )


EVENTS_QUIET_HOURS_SQL = """
WITH dh AS (
    SELECT DISTINCT epoch_us(ts) // 1000000 // 86400 AS day,
                    (epoch_us(ts) // 1000000 % 86400) // 3600 AS hour
    FROM events
),
per AS (SELECT day, 24 - count(*) AS quiet_hours FROM dh GROUP BY day)
SELECT CAST(quiet_hours AS BIGINT) AS quiet_hours,
       CAST(count(*) AS BIGINT) AS n_days
FROM per GROUP BY quiet_hours
"""


# ---------------------------------------------------------------------------
# customer_order_value_trend

_TREND_CENTS_PER_ORDER = 100  # ±$1/order classifies growing/declining


def customer_order_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classify each repeat customer's order-value TREND (exact OLS
    slope of integer cents against order sequence 1..n) into
    growing / flat / declining at ±$1-per-order — the
    expansion-vs-churn-risk triage behind ``customer_cohort_ltv``:
    the cohort view shows levels, this shows per-customer direction.
    Customers with < 3 orders carry no slope and are excluded.

    Exactness: y = exact cents, x = row_number in the deterministic
    (o_orderdate, o_orderkey) order; the OLS slope numerator/
    denominator fold in DECIMAL(38,0) ↔ HUGEINT; each customer's
    slope evaluates once as a double and micro-quantizes, so the
    class rollup and the average slope are exact integer sums
    (never an order-dependent double accumulation across customers).

    100 TB shape: ONE shuffle on custkey shared by the sequence
    window and the per-customer fold; output is 3 rows.
    """
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = o.select(
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("y"),
        F.row_number().over(w).cast("long").alias("x"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    per = seq.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(dec("x") * dec("y")).alias("sxy"),
        F.sum(dec("x") * dec("x")).alias("sxx"),
    ).filter(F.col("n") >= 3)
    n = dec("n")
    num = (n * F.col("sxy") - dec("sx") * dec("sy")).cast("double")
    den = (n * F.col("sxx") - dec("sx") * dec("sx")).cast("double")
    # r8 conversion: the OLS slope is an exact rational of the
    # integer sums — truncating integer division at 6 dp (signed)
    slope_micro = F.expr(
        "((cast(n as decimal(38,0)) * sxy - cast(sx as decimal(38,0)) * sy)"
        " * 1000000) div (cast(n as decimal(38,0)) * sxx"
        " - cast(sx as decimal(38,0)) * sx)"
    )
    classed = per.select(
        slope_micro.alias("sm"),
        F.when(slope_micro > _TREND_CENTS_PER_ORDER * _MICRO, "growing")
        .when(slope_micro < -_TREND_CENTS_PER_ORDER * _MICRO, "declining")
        .otherwise("flat")
        .alias("trend"),
    )
    return classed.groupBy("trend").agg(
        F.count(F.lit(1)).alias("n_customers"),
        # r8 conversion: S/(10⁶·100·n) at 4 dp = S div (10⁴·n) / 10⁴
        (
            F.expr("sum(sm) div (10000 * count(1))").cast("double") / 1e4
        ).alias("avg_slope_dollars"),
    )


CUSTOMER_ORDER_TREND_SQL = f"""
WITH seq AS (
    SELECT o_custkey,
           CAST(round(o_totalprice * 100) AS BIGINT) AS y,
           row_number() OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate, o_orderkey) AS x
    FROM orders
),
per AS (
    SELECT o_custkey, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
           sum(CAST(x AS HUGEINT) * y) AS sxy,
           sum(CAST(x AS HUGEINT) * x) AS sxx
    FROM seq GROUP BY o_custkey
    HAVING count(*) >= 3
),
cl AS (
    SELECT ((CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy) * 1000000)
           // (CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx) AS sm
    FROM per
)
SELECT CASE WHEN sm > {_TREND_CENTS_PER_ORDER * _MICRO} THEN 'growing'
            WHEN sm < -{_TREND_CENTS_PER_ORDER * _MICRO} THEN 'declining'
            ELSE 'flat' END AS trend,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(sm) // (10000 * count(*)) AS DOUBLE) / 10000.0
           AS avg_slope_dollars
FROM cl GROUP BY 1
"""


# ---------------------------------------------------------------------------
# docs_word_length_profile


def docs_word_length_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language histogram of mean token length (integer floor of
    the per-doc mean, capped at 15) — the Gopher word-length gate's
    distribution view (their rule drops docs whose mean is outside
    [3, 10]); shifted masses flag tokenizer-hostile content.

    Exactness: the binned mean is exact integer floor division
    least(total_chars // n_tokens, 15) on two integer counts —
    integer-only output, 0-token docs pin to bin 0.

    100 TB shape: one narrow map (two aggregates over the token
    array) + a (lang, bin) rollup; no explode, no joins.
    """
    d = spread(load_table(spark, sf_dir, "documents"))
    ws = T.words(F.col("text"))
    n_tok = F.size(ws).cast("long")
    total = F.aggregate(
        ws, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    bin_ = F.when(
        n_tok > 0, F.least(F.floor(total / n_tok), F.lit(15))
    ).otherwise(F.lit(0))
    return (
        d.select("lang", bin_.cast("long").alias("mean_len_bin"))
        .groupBy("lang", "mean_len_bin")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


DOCS_WORD_LENGTH_SQL = rf"""
WITH t AS (SELECT lang, {_WS} AS ws FROM documents),
c AS (
    SELECT lang, len(ws) AS n_tok,
           coalesce(list_sum(list_transform(ws, w -> length(w))), 0) AS total
    FROM t
)
SELECT lang,
       CAST(CASE WHEN n_tok > 0 THEN least(total // n_tok, 15) ELSE 0 END
            AS BIGINT) AS mean_len_bin,
       CAST(count(*) AS BIGINT) AS n_docs
FROM c GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# docs_first_word_concentration


def docs_first_word_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source concentration of document OPENINGS: the most common
    first token, how many docs open with it, and its share — the
    cheapest template detector there is (crawled chrome and generated
    text reuse openings; prose doesn't), the 1-token complement of
    ``docs_template_shingles``.

    Exactness: counts are exact integers over the lower-cased first
    token; the deterministic winner is (count DESC, token ASC); the
    share divides once at 6 dp. Docs with no tokens are excluded in
    both engines.

    100 TB shape: one (source, first-token) partial-agg shuffle, a
    per-source top-1 window over the token-distinct (small) table,
    and a source-total join.
    """
    d = spread(load_table(spark, sf_dir, "documents"))
    first = F.lower(F.element_at(T.words(F.col("text")), 1))
    per = (
        d.select("source", first.alias("w"))
        .filter(F.col("w").isNotNull())
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = per.groupBy("source").agg(F.sum("c").alias("n_docs"))
    w = Window.partitionBy("source").orderBy(F.desc("c"), F.asc("w"))
    top = per.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") == 1)
    return top.join(tot, "source").select(
        "source",
        F.col("w").alias("top_first_word"),
        F.col("c").cast("long").alias("n_docs_opening"),
        F.col("n_docs").cast("long").alias("n_docs"),
        # r8 conversion: exact truncating integer-division rate
        (F.expr("(c * 1000000) div n_docs").cast("double") / 1e6).alias("share"),
    )


DOCS_FIRST_WORD_SQL = rf"""
WITH t AS (SELECT source, {_WS} AS ws FROM documents),
f AS (SELECT source, lower(ws[1]) AS w FROM t WHERE len(ws) > 0),
per AS (SELECT source, w, count(*) AS c FROM f GROUP BY source, w),
tot AS (SELECT source, sum(c) AS n_docs FROM per GROUP BY source),
top AS (
    SELECT source, w, c,
           row_number() OVER (PARTITION BY source ORDER BY c DESC, w ASC) AS rk
    FROM per
)
SELECT t.source, top.w AS top_first_word,
       CAST(top.c AS BIGINT) AS n_docs_opening,
       CAST(t.n_docs AS BIGINT) AS n_docs,
       CAST((top.c * 1000000) // t.n_docs AS DOUBLE) / 1000000.0 AS share
FROM top JOIN tot t USING (source)
WHERE top.rk = 1
"""


QUERIES = {
    "events_type_cooccurrence_lift": events_type_cooccurrence_lift,
    "events_peak_to_mean_by_user": events_peak_to_mean_by_user,
    "events_quiet_hours": events_quiet_hours,
    "customer_order_value_trend": customer_order_value_trend,
    "docs_word_length_profile": docs_word_length_profile,
    "docs_first_word_concentration": docs_first_word_concentration,
}

ORACLES = {
    "events_type_cooccurrence_lift": EVENTS_TYPE_COOCCURRENCE_SQL,
    "events_peak_to_mean_by_user": EVENTS_PEAK_TO_MEAN_SQL,
    "events_quiet_hours": EVENTS_QUIET_HOURS_SQL,
    "customer_order_value_trend": CUSTOMER_ORDER_TREND_SQL,
    "docs_word_length_profile": DOCS_WORD_LENGTH_SQL,
    "docs_first_word_concentration": DOCS_FIRST_WORD_SQL,
}
