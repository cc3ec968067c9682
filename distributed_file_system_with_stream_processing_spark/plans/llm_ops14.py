"""Round-6 batch V: exact value-distribution tables, journey
endpoints, repeat-rate geography, price-quantity dependence, and the
source-pair vocabulary overlap matrix.

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

# ---------------------------------------------------------------------------
# events_value_percentiles_by_type


def events_value_percentiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p50/p90/p99 of event value per event type — the
    percentile_disc family's event-side member (sizing alert
    thresholds per type needs the exact tail, not a sketch; the GK
    twin stays ``order_percentiles_approx``).

    Exactness: integer cents; percentile_disc = value at rank
    ceil(p·n) in (cents, event_id) order (rank ties on equal cents
    return the same VALUE whatever the permutation).

    100 TB shape: one shuffle on event_type shared by the rank window
    and the rollup; the per-type sort is the exact-auditor cost
    (percentile_disc stance); |types| rows out.
    """
    e = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    base = e.select("event_type", cents.alias("c"), "event_id")
    w = Window.partitionBy("event_type").orderBy("c", "event_id")
    ranked = base.select(
        "event_type",
        "c",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("n"),
    )
    pick = lambda p: F.max(  # noqa: E731
        F.when(F.col("rn") == F.ceil(F.col("n") * p), F.col("c"))
    )
    return ranked.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n_events"),
        # ok-round: exact cents grid (2 dp)
        F.round(pick(0.5) / 100.0, 2).alias("p50"),
        # ok-round: exact cents grid (2 dp)
        F.round(pick(0.9) / 100.0, 2).alias("p90"),
        # ok-round: exact cents grid (2 dp)
        F.round(pick(0.99) / 100.0, 2).alias("p99"),
    )


EVENTS_VALUE_PCT_SQL = """
WITH base AS (
    SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       -- ok-round: exact cents grid (2 dp)
       round(percentile_disc(0.5) WITHIN GROUP (ORDER BY c) / 100.0, 2) AS p50,
       -- ok-round: exact cents grid (2 dp)
       round(percentile_disc(0.9) WITHIN GROUP (ORDER BY c) / 100.0, 2) AS p90,
       -- ok-round: exact cents grid (2 dp)
       round(percentile_disc(0.99) WITHIN GROUP (ORDER BY c) / 100.0, 2) AS p99
FROM base GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# events_first_last_type_matrix


def events_first_last_type_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Journey-endpoint matrix: each user's FIRST event type crossed
    with their LAST (deterministic (ts, event_id) order), counted —
    where journeys start vs where they end; the endpoints complement
    of the transition matrix (which sees every step, but no anchors).

    Exactness: first/last resolve by integer (epoch_sec, event_id)
    rank — fully deterministic; counts exact.

    100 TB shape: ONE shuffle on user_id (both rank windows and the
    fold share it), then a ≤|types|²-row rollup.
    """
    e = load_table(spark, sf_dir, "events")
    sec = F.col("ts").cast("long")
    wa = Window.partitionBy("user_id").orderBy(F.asc("_s"), F.asc("event_id"))
    wd = Window.partitionBy("user_id").orderBy(F.desc("_s"), F.desc("event_id"))
    ranked = e.select("user_id", "event_id", "event_type", sec.alias("_s")).select(
        "user_id",
        "event_type",
        F.row_number().over(wa).alias("ra"),
        F.row_number().over(wd).alias("rd"),
    )
    per = ranked.groupBy("user_id").agg(
        F.max(F.when(F.col("ra") == 1, F.col("event_type"))).alias("first_type"),
        F.max(F.when(F.col("rd") == 1, F.col("event_type"))).alias("last_type"),
    )
    return per.groupBy("first_type", "last_type").agg(
        F.count(F.lit(1)).alias("n_users")
    )


EVENTS_FIRST_LAST_SQL = """
WITH ranked AS (
    SELECT user_id, event_type,
           row_number() OVER (PARTITION BY user_id
               ORDER BY epoch_us(ts) // 1000000 ASC, event_id ASC) AS ra,
           row_number() OVER (PARTITION BY user_id
               ORDER BY epoch_us(ts) // 1000000 DESC, event_id DESC) AS rd
    FROM events
),
per AS (
    SELECT user_id,
           max(CASE WHEN ra = 1 THEN event_type END) AS first_type,
           max(CASE WHEN rd = 1 THEN event_type END) AS last_type
    FROM ranked GROUP BY user_id
)
SELECT first_type, last_type, CAST(count(*) AS BIGINT) AS n_users
FROM per GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# customer_repeat_rate_by_nation


def customer_repeat_rate_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation repeat-customer rate: customers with ≥2 orders as a
    share of customers with ≥1 — the retention-by-geography screen
    (q7's trade-volume lens applied to loyalty). Nations whose
    customers never order are absent in both engines.

    Exactness: order counts and both customer counts are exact
    integers; one 6-dp division.

    100 TB shape: one custkey partial agg over orders, a broadcast
    customer-dim join for the nationkey, a broadcast nation join for
    the name, a |nations| rollup.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    per = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_orders"))
    agg = (
        per.join(broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.when(F.col("n_orders") >= 2, 1).otherwise(0)).alias("n_repeat"),
        )
    )
    return agg.select(
        "n_name",
        F.col("n_customers").cast("long").alias("n_customers"),
        F.col("n_repeat").cast("long").alias("n_repeat"),
        # r8 conversion: exact truncating integer-division rate
        (
            F.expr("(n_repeat * 1000000) div n_customers").cast("double") / 1e6
        ).alias("repeat_rate"),
    )


CUSTOMER_REPEAT_RATE_SQL = """
WITH per AS (
    SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey
)
SELECT n_name,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_repeat,
       CAST((sum(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) * 1000000)
            // count(*) AS DOUBLE) / 1000000.0 AS repeat_rate
FROM per
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


# ---------------------------------------------------------------------------
# lineitem_quantity_price_corr


def lineitem_quantity_price_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Pearson correlation between line quantity and extended
    price, per return flag — the pricing-consistency audit (extended
    price should track quantity; a flag segment where it doesn't has
    mispriced or anomalous lines), and the per-group sibling of
    ``discount_quantity_slope``'s elasticity fit.

    Exactness: x = integer quantity units, y = integer cents; the
    five Pearson sums fold in DECIMAL(38,0) ↔ HUGEINT; r evaluates
    once per group, zero-variance pinned to 0.0.

    100 TB shape: one narrow map + a 3-group partial agg — no joins,
    no windows; the cheapest possible exact-correlation shape.
    """
    li = load_table(spark, sf_dir, "lineitem")
    x = F.round(F.col("l_quantity")).cast("long")
    y = F.round(F.col("l_extendedprice") * 100).cast("long")
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    per = li.select("l_returnflag", x.alias("x"), y.alias("y")).groupBy(
        "l_returnflag"
    ).agg(
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
        "l_returnflag",
        F.col("n").cast("long").alias("n_lines"),
        # ok-round: irrational (sqrt in the denominator)
        F.when((vx > 0) & (vy > 0), F.round(num / den, 6))
        .otherwise(F.lit(0.0))
        .alias("qty_price_r"),
    )


LINEITEM_QTY_PRICE_CORR_SQL = """
WITH per AS (
    SELECT l_returnflag, count(*) AS n,
           sum(CAST(round(l_quantity) AS BIGINT)) AS sx,
           sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS sy,
           sum(CAST(CAST(round(l_quantity) AS BIGINT) AS HUGEINT)
               * CAST(round(l_extendedprice * 100) AS BIGINT)) AS sxy,
           sum(CAST(CAST(round(l_quantity) AS BIGINT) AS HUGEINT)
               * CAST(round(l_quantity) AS BIGINT)) AS sxx,
           sum(CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS HUGEINT)
               * CAST(round(l_extendedprice * 100) AS BIGINT)) AS syy
    FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag,
       CAST(n AS BIGINT) AS n_lines,
       CASE WHEN CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx > 0
             AND CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy > 0
            THEN -- ok-round: irrational (sqrt in the denominator)
       round(CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                       / (sqrt(CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE))
                          * sqrt(CAST(CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE))),
                  6)
            ELSE CAST(0.0 AS DOUBLE) END AS qty_price_r
FROM per
"""


# ---------------------------------------------------------------------------
# docs_vocab_overlap_matrix


def docs_vocab_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-pair VOCABULARY Jaccard matrix — who writes with whose
    words: the lexical-overlap complement of ``source_neardup_matrix``
    (document-level mirroring) and ``docs_kl_by_source``
    (distributional drift); high vocab overlap with low near-dup rate
    means same domain, different documents — exactly the pairs
    cross-source dedup must scan hardest.

    Exactness: vocabulary sets are distinct (source, term) rows;
    intersections come from the term-keyed self-join of the DISTINCT
    table (a < b), unions by inclusion-exclusion on exact integers;
    Jaccard divides once at 6 dp.

    100 TB shape: one (source, term) distinct shuffle; the self-join
    is term-keyed with per-term fan-out ≤ C(|sources|,2) (sources is
    a small closed set); per-source vocab sizes are a
    |sources|-row broadcast join onto the pair rollup.
    """
    d = spread(load_table(spark, sf_dir, "documents"))
    st = (
        d.select("source", F.explode_outer(T.words(F.col("text"))).alias("w"))
        .filter(F.col("w").isNotNull())
        .select("source", F.lower(F.col("w")).alias("term"))
        .distinct()
    )
    sizes = st.groupBy("source").agg(F.count(F.lit(1)).alias("v"))
    a = st.select(F.col("source").alias("source_a"), "term")
    b = st.select(F.col("source").alias("source_b"), "term")
    inter = (
        a.join(b, "term")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    joined = inter.join(
        broadcast(sizes.select(F.col("source").alias("source_a"), F.col("v").alias("va"))),
        "source_a",
    ).join(
        broadcast(sizes.select(F.col("source").alias("source_b"), F.col("v").alias("vb"))),
        "source_b",
    )
    # r9 conversion (wave 3): Jaccard of exact integer set sizes —
    # truncating integer division at 6 dp (the lint missed the Spark
    # side because the quotient was a named variable; the SQL side
    # flagged it)
    return joined.select(
        "source_a",
        "source_b",
        F.col("n_inter").cast("long").alias("n_shared_terms"),
        (
            F.expr("(n_inter * 1000000) div (va + vb - n_inter)")
            .cast("double") / 1e6
        ).alias("vocab_jaccard"),
    )


DOCS_VOCAB_OVERLAP_SQL = rf"""
WITH st AS (
    SELECT DISTINCT source, lower(w) AS term
    FROM (SELECT source, unnest({_WS}) AS w FROM documents)
),
sizes AS (SELECT source, count(*) AS v FROM st GROUP BY source),
inter AS (
    SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_inter
    FROM st a JOIN st b ON a.term = b.term AND a.source < b.source
    GROUP BY 1, 2
)
SELECT source_a, source_b,
       CAST(n_inter AS BIGINT) AS n_shared_terms,
       CAST((n_inter * 1000000) // (sa.v + sb.v - n_inter) AS DOUBLE)
           / 1000000.0 AS vocab_jaccard
FROM inter
JOIN sizes sa ON sa.source = source_a
JOIN sizes sb ON sb.source = source_b
"""


# ---------------------------------------------------------------------------
# orders_status_year_mix


def orders_status_year_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-status mix per order year (counts + within-year share) —
    the fulfillment-health trend: a rising 'F' share means the
    backlog is draining, a rising 'O' share means intake outpaces
    fulfillment (the yearly rollup of ``orders_backlog_series``).

    Exactness: the year extracts under a pinned UTC session (the
    orders_monthly_growth stance); counts exact; shares divide once
    at 6 dp via a window over the metadata-scale (year, status) grid.

    100 TB shape: one (year, status) partial-agg rollup + window math
    over ≤ years·|statuses| rows.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    o = load_table(spark, sf_dir, "orders")
    grid = o.groupBy(
        F.year("o_orderdate").cast("long").alias("year"),
        F.col("o_orderstatus").alias("status"),
    ).agg(F.count(F.lit(1)).alias("n_orders"))
    tot = F.sum("n_orders").over(Window.partitionBy("year"))
    # r8 conversion: exact truncating integer-division share
    return grid.withColumn("t", tot).select(
        "year",
        "status",
        "n_orders",
        (F.expr("(n_orders * 1000000) div t").cast("double") / 1e6).alias(
            "share"
        ),
    )


ORDERS_STATUS_YEAR_SQL = """
WITH grid AS (
    SELECT CAST(year(o_orderdate) AS BIGINT) AS year,
           o_orderstatus AS status, count(*) AS n_orders
    FROM orders GROUP BY 1, 2
)
SELECT year, status,
       CAST(n_orders AS BIGINT) AS n_orders,
       CAST((n_orders * 1000000) // sum(n_orders) OVER (PARTITION BY year)
            AS DOUBLE) / 1000000.0 AS share
FROM grid
"""


QUERIES = {
    "events_value_percentiles_by_type": events_value_percentiles_by_type,
    "events_first_last_type_matrix": events_first_last_type_matrix,
    "customer_repeat_rate_by_nation": customer_repeat_rate_by_nation,
    "lineitem_quantity_price_corr": lineitem_quantity_price_corr,
    "docs_vocab_overlap_matrix": docs_vocab_overlap_matrix,
    "orders_status_year_mix": orders_status_year_mix,
}

ORACLES = {
    "events_value_percentiles_by_type": EVENTS_VALUE_PCT_SQL,
    "events_first_last_type_matrix": EVENTS_FIRST_LAST_SQL,
    "customer_repeat_rate_by_nation": CUSTOMER_REPEAT_RATE_SQL,
    "lineitem_quantity_price_corr": LINEITEM_QTY_PRICE_CORR_SQL,
    "docs_vocab_overlap_matrix": DOCS_VOCAB_OVERLAP_SQL,
    "orders_status_year_mix": ORDERS_STATUS_YEAR_SQL,
}
