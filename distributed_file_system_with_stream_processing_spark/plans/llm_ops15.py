"""Round-6 batch VI: error adjacency, balance-vs-spend dependence,
grouped price-size regression, session depth, prefix drill-down, and
per-priority value dispersion.

Same contract as the other ``llm_ops*`` modules: declarative
DataFrame plans (JVM expressions only) with DuckDB oracles mirroring
the exact arithmetic, so value hashes match without tolerances.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from distributed_file_system_with_stream_processing_spark.operators._util import spread
from distributed_file_system_with_stream_processing_spark.sources.tables import load_table

_MICRO = 1_000_000

# ---------------------------------------------------------------------------
# events_error_adjacency

_EA_LOOKAHEAD = 3


def events_error_adjacency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each event type, how often an ERROR follows within the
    user's next ``_EA_LOOKAHEAD`` events — the error-funnel
    diagnostic (which action precedes failures) that the transition
    matrix's single-step view underestimates when errors lag by two
    or three steps.

    Exactness: adjacency comes from integer (epoch_sec, event_id)
    ordered leads — fully deterministic; counts exact; the rate
    divides once at 6 dp. Error events themselves are scored too
    (errors clustering after errors is the retry-storm signature).

    100 TB shape: ONE shuffle on user_id (the three lead windows
    share it) + a |types|-row rollup.
    """
    e = load_table(spark, sf_dir, "events")
    sec = F.col("ts").cast("long")
    w = Window.partitionBy("user_id").orderBy(F.asc("_s"), F.asc("event_id"))
    base = e.select("user_id", "event_id", "event_type", sec.alias("_s"))
    nxt = base.select(
        "event_type",
        *[
            (F.lead("event_type", i).over(w) == "error").cast("int").alias(f"e{i}")
            for i in range(1, _EA_LOOKAHEAD + 1)
        ],
    )
    hit = F.greatest(
        *[F.coalesce(F.col(f"e{i}"), F.lit(0)) for i in range(1, _EA_LOOKAHEAD + 1)]
    )
    agg = nxt.select("event_type", hit.alias("hit")).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("hit").alias("n_error_follow"),
    )
    return agg.select(
        "event_type",
        F.col("n_events").cast("long").alias("n_events"),
        F.col("n_error_follow").cast("long").alias("n_error_follow"),
        # r9 conversion (wave 3): exact truncating integer division at
        # 6 dp — both engines round the same exact rational
        (
            F.expr("(n_error_follow * 1000000) div n_events").cast("double")
            / 1e6
        ).alias("error_follow_rate"),
    )


EVENTS_ERROR_ADJACENCY_SQL = f"""
WITH base AS (
    SELECT user_id, event_id, event_type,
           epoch_us(ts) // 1000000 AS s
    FROM events
),
nxt AS (
    SELECT event_type,
           greatest({", ".join(
               "coalesce(CASE WHEN lead(event_type, %d) OVER "
               "(PARTITION BY user_id ORDER BY s ASC, event_id ASC) = 'error' "
               "THEN 1 ELSE 0 END, 0)" % i
               for i in range(1, _EA_LOOKAHEAD + 1)
           )}) AS hit
    FROM base
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(hit) AS BIGINT) AS n_error_follow,
       CAST((sum(hit) * 1000000) // count(*) AS DOUBLE) / 1000000.0
           AS error_follow_rate
FROM nxt GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# customer_acctbal_vs_spend_corr


def customer_acctbal_vs_spend_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Pearson correlation between a customer's account balance
    and their total order spend, per market segment — does the credit
    book predict revenue: near-zero r says acctbal is stale or
    synthetic, strong r says it's a usable LTV prior.

    Exactness: both variables are exact integer cents (spend is a
    per-customer integer fold; customers with no orders count at
    spend 0 via the left join + coalesce — the population is ALL
    customers); the five Pearson sums fold in DECIMAL(38,0) ↔
    HUGEINT; r evaluates once per segment, zero-variance pinned 0.0.

    100 TB shape: one custkey partial agg over orders, a
    co-partitioned left join from the customer table, a
    |segments|-row moment rollup.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("x"),
    )
    spend = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("y")
    )
    j = c.join(spend, F.col("c_custkey") == F.col("o_custkey"), "left").select(
        "c_mktsegment", "x", F.coalesce("y", F.lit(0)).alias("y")
    )
    dec = lambda col: F.col(col).cast("decimal(38,0)")  # noqa: E731
    per = j.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(dec("x") * dec("y")).alias("sxy"),
        F.sum(dec("x") * dec("x")).alias("sxx"),
        F.sum(dec("y") * dec("y")).alias("syy"),
    )
    n = dec("n")
    num = (n * F.col("sxy") - dec("sx") * dec("sy")).cast("double")
    vx = n * F.col("sxx") - dec("sx") * dec("sx")
    vy = n * F.col("syy") - dec("sy") * dec("sy")
    den = F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double"))
    return per.select(
        "c_mktsegment",
        F.col("n").cast("long").alias("n_customers"),
        # ok-round: irrational (sqrt in the denominator)
        F.when((vx > 0) & (vy > 0), F.round(num / den, 6))
        .otherwise(F.lit(0.0))
        .alias("acctbal_spend_r"),
    )


CUSTOMER_ACCTBAL_SPEND_SQL = """
WITH spend AS (
    SELECT o_custkey,
           sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS y
    FROM orders GROUP BY o_custkey
),
j AS (
    SELECT c_mktsegment,
           CAST(round(c_acctbal * 100) AS BIGINT) AS x,
           coalesce(y, 0) AS y
    FROM customer LEFT JOIN spend ON c_custkey = o_custkey
),
per AS (
    SELECT c_mktsegment, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
           sum(CAST(x AS HUGEINT) * y) AS sxy,
           sum(CAST(x AS HUGEINT) * x) AS sxx,
           sum(CAST(y AS HUGEINT) * y) AS syy
    FROM j GROUP BY c_mktsegment
)
SELECT c_mktsegment,
       CAST(n AS BIGINT) AS n_customers,
       CASE WHEN CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx > 0
             AND CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy > 0
       -- ok-round: irrational (sqrt in the denominator)
            THEN round(CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                       / (sqrt(CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE))
                          * sqrt(CAST(CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE))),
                  6)
            ELSE CAST(0.0 AS DOUBLE) END AS acctbal_spend_r
FROM per
"""


# ---------------------------------------------------------------------------
# part_size_price_slope


def part_size_price_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact OLS slope of retail price against part size, per part
    type — the does-size-price-in screen (the discount_quantity_slope
    grouped-regression shape on catalog dimensions instead of
    transactions). Types with a single distinct size carry no slope
    and report 0.0 (never NULL).

    Exactness: x = integer size, y = integer cents; slope numerator /
    denominator fold in DECIMAL(38,0) ↔ HUGEINT and the division
    happens once per type at 4 dp (dollars per size unit).

    100 TB shape: one p_type partial-agg rollup over the part table;
    |types| rows out.
    """
    p = load_table(spark, sf_dir, "part")
    x = F.col("p_size").cast("long")
    y = F.round(F.col("p_retailprice") * 100).cast("long")
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    per = p.select("p_type", x.alias("x"), y.alias("y")).groupBy("p_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(dec("x") * dec("y")).alias("sxy"),
        F.sum(dec("x") * dec("x")).alias("sxx"),
    )
    n = dec("n")
    num = n * F.col("sxy") - dec("sx") * dec("sy")
    den = (n * F.col("sxx") - dec("sx") * dec("sx"))
    # r9 conversion (wave 3): slope = num/(100·den) at 4 dp is the
    # exact rational (num·100) div den / 10⁴ — truncating integer
    # division in decimal(38,0) ↔ HUGEINT (signed: both engines
    # truncate toward zero on integer/decimal `div`; the oracle must
    # use HUGEINT for //, since DuckDB's DECIMAL // floors
    # fractionally)
    staged = per.withColumn("_num", num).withColumn("_den", den)
    slope = F.when(
        F.col("_den") > 0,
        F.expr("(_num * 100) div _den").cast("double") / 1e4,
    ).otherwise(F.lit(0.0))
    return staged.select(
        "p_type",
        F.col("n").cast("long").alias("n_parts"),
        slope.alias("price_per_size_unit"),
    )


PART_SIZE_PRICE_SLOPE_SQL = """
WITH per AS (
    SELECT p_type, count(*) AS n,
           sum(CAST(p_size AS BIGINT)) AS sx,
           sum(CAST(round(p_retailprice * 100) AS BIGINT)) AS sy,
           sum(CAST(CAST(p_size AS BIGINT) AS HUGEINT)
               * CAST(round(p_retailprice * 100) AS BIGINT)) AS sxy,
           sum(CAST(CAST(p_size AS BIGINT) AS HUGEINT) * p_size) AS sxx
    FROM part GROUP BY p_type
)
SELECT p_type,
       CAST(n AS BIGINT) AS n_parts,
       CASE WHEN CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx > 0
            THEN CAST(((CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy) * 100)
                      // (CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx)
                      AS DOUBLE) / 10000.0
            ELSE CAST(0.0 AS DOUBLE) END AS price_per_size_unit
FROM per
"""


# ---------------------------------------------------------------------------
# events_session_depth_histogram

_SD_GAP_S = 1800


def events_session_depth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of session DEPTH (events per 30-min-gap session) —
    the engagement-shape readout on the shared sessionize backbone:
    a depth-1 spike is bounce traffic, a heavy tail is power usage
    (``events_session_window`` reports durations; this reports
    event counts, capped at bucket 20+).

    Exactness: the session split is the established integer-second
    lag > 1800 rule on deterministic (sec, event_id) order; depths
    are exact integers; bucket = least(depth, 20).

    100 TB shape: ONE shuffle on user_id (lag window + running
    session-id sum + the (user, session) rollup share it), then a
    ≤20-row histogram.
    """
    e = load_table(spark, sf_dir, "events")
    sec = F.col("ts").cast("long")
    w = Window.partitionBy("user_id").orderBy(F.asc("_s"), F.asc("event_id"))
    flagged = e.select("user_id", "event_id", sec.alias("_s")).withColumn(
        "_new",
        F.when(
            (F.col("_s") - F.lag("_s").over(w)).isNull()
            | ((F.col("_s") - F.lag("_s").over(w)) > _SD_GAP_S),
            1,
        ).otherwise(0),
    )
    sess = flagged.withColumn(
        "_sid", F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    depth = sess.groupBy("user_id", "_sid").agg(F.count(F.lit(1)).alias("d"))
    return (
        depth.select(F.least(F.col("d"), F.lit(20)).cast("long").alias("depth"))
        .groupBy("depth")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
    )


EVENTS_SESSION_DEPTH_SQL = f"""
WITH base AS (
    SELECT user_id, event_id, epoch_us(ts) // 1000000 AS s FROM events
),
flagged AS (
    SELECT user_id,
           CASE WHEN s - lag(s) OVER (PARTITION BY user_id ORDER BY s, event_id)
                     IS NULL
                  OR s - lag(s) OVER (PARTITION BY user_id ORDER BY s, event_id)
                     > {_SD_GAP_S}
                THEN 1 ELSE 0 END AS new_s,
           s, event_id
    FROM base
),
sess AS (
    SELECT user_id,
           sum(new_s) OVER (PARTITION BY user_id ORDER BY s, event_id
                            ROWS UNBOUNDED PRECEDING) AS sid
    FROM flagged
),
depth AS (SELECT user_id, sid, count(*) AS d FROM sess GROUP BY user_id, sid)
SELECT CAST(least(d, 20) AS BIGINT) AS depth,
       CAST(count(*) AS BIGINT) AS n_sessions
FROM depth GROUP BY 1
"""


# ---------------------------------------------------------------------------
# docs_duplicate_prefix_topk

_DPF_LEN = 32
_DPF_TOPK = 10


def docs_duplicate_prefix_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``_DPF_TOPK`` most-shared 32-char normalized prefixes with
    their doc counts and source spread — the drill-down behind
    ``docs_prefix_dup_rate``'s per-source shares (WHICH boilerplate
    opening dominates, and does it cross sources).

    Exactness: counts exact; deterministic winners by (count DESC,
    prefix ASC); the top-k window runs over the (already aggregated)
    prefix-group table.

    100 TB shape: one (prefix) partial-agg shuffle (32-char keys),
    a top-k window over the groups-with-n≥2 (strictly smaller)
    table; 10 rows out.
    """
    d = spread(load_table(spark, sf_dir, "documents"))
    pfx = F.substring(
        F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " "))), 1, _DPF_LEN
    )
    groups = (
        d.select(pfx.alias("pfx"), "source")
        .groupBy("pfx")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("source").alias("n_sources"),
        )
        .filter(F.col("n_docs") >= 2)
    )
    w = Window.orderBy(F.desc("n_docs"), F.asc("pfx"))
    return (
        groups.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= _DPF_TOPK)
        .select(
            "rank",
            "pfx",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_sources").cast("long").alias("n_sources"),
        )
    )


DOCS_DUP_PREFIX_TOPK_SQL = rf"""
WITH g AS (
    SELECT substr(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), 1, {_DPF_LEN})
               AS pfx,
           count(*) AS n_docs,
           count(DISTINCT source) AS n_sources
    FROM documents
    GROUP BY 1
    HAVING count(*) >= 2
),
rk AS (
    SELECT pfx, n_docs, n_sources,
           row_number() OVER (ORDER BY n_docs DESC, pfx ASC) AS rank
    FROM g
)
SELECT CAST(rank AS BIGINT) AS rank, pfx,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_sources AS BIGINT) AS n_sources
FROM rk WHERE rank <= {_DPF_TOPK}
"""


# ---------------------------------------------------------------------------
# orders_value_cv_by_priority


def orders_value_cv_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-value dispersion per priority class: count, mean and
    coefficient of variation — do urgent orders skew small-and-many
    or large-and-few (the dispersion companion of q4's counts).

    Exactness: integer cents; (n, Σc, Σc²) fold exactly; CV =
    √(n·Σc²/(Σc)² − 1) evaluates once per class, zero-variance
    pinned to 0.0.

    100 TB shape: one priority-keyed partial agg; 5 rows out.
    """
    o = load_table(spark, sf_dir, "orders")
    c = F.round(F.col("o_totalprice") * 100).cast("long")
    dec = lambda col: F.col(col).cast("decimal(38,0)")  # noqa: E731
    per = o.select("o_orderpriority", c.alias("c")).groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("sc"),
        F.sum(dec("c") * dec("c")).alias("scc"),
    )
    cv2 = (dec("n") * F.col("scc")).cast("double") / (
        dec("sc") * dec("sc")
    ).cast("double") - 1.0
    return per.select(
        "o_orderpriority",
        F.col("n").cast("long").alias("n_orders"),
        # r9 conversion (wave 3): mean cents = sc/(100n) at 2 dp is
        # the exact rational (sc div n)/100 — truncating integer
        # division on the cent sums
        (F.expr("sc div n").cast("double") / 100.0).alias("avg_value"),
        F.when(F.col("sc") > 0, F.round(F.sqrt(F.greatest(cv2, F.lit(0.0))), 6))
        .otherwise(F.lit(0.0))
        .alias("value_cv"),
    )


ORDERS_VALUE_CV_SQL = """
WITH per AS (
    SELECT o_orderpriority, count(*) AS n,
           sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS sc,
           sum(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS HUGEINT)
               * CAST(round(o_totalprice * 100) AS BIGINT)) AS scc
    FROM orders GROUP BY o_orderpriority
)
SELECT o_orderpriority,
       CAST(n AS BIGINT) AS n_orders,
       CAST(sc // n AS DOUBLE) / 100.0 AS avg_value,
       CASE WHEN sc > 0
            THEN -- ok-round: irrational (sqrt family)
       round(sqrt(greatest(
                     CAST(CAST(n AS HUGEINT) * scc AS DOUBLE)
                     / CAST(CAST(sc AS HUGEINT) * sc AS DOUBLE) - 1.0, 0.0)), 6)
            ELSE CAST(0.0 AS DOUBLE) END AS value_cv
FROM per
"""


QUERIES = {
    "events_error_adjacency": events_error_adjacency,
    "customer_acctbal_vs_spend_corr": customer_acctbal_vs_spend_corr,
    "part_size_price_slope": part_size_price_slope,
    "events_session_depth_histogram": events_session_depth_histogram,
    "docs_duplicate_prefix_topk": docs_duplicate_prefix_topk,
    "orders_value_cv_by_priority": orders_value_cv_by_priority,
}

ORACLES = {
    "events_error_adjacency": EVENTS_ERROR_ADJACENCY_SQL,
    "customer_acctbal_vs_spend_corr": CUSTOMER_ACCTBAL_SPEND_SQL,
    "part_size_price_slope": PART_SIZE_PRICE_SLOPE_SQL,
    "events_session_depth_histogram": EVENTS_SESSION_DEPTH_SQL,
    "docs_duplicate_prefix_topk": DOCS_DUP_PREFIX_TOPK_SQL,
    "orders_value_cv_by_priority": ORDERS_VALUE_CV_SQL,
}
