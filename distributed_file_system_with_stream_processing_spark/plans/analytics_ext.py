"""Join-shape extension queries: semi, anti, outer, max-of-agg,
group-having semi, conditional-share, and ranked-window — the operator
families a complete batch engine needs beyond plain inner-join+agg
(plans/analytics.py).

Scale notes (100 TB): semi/anti joins ship only the join key of the
probe side; the build sides here (filtered orders/lineitem keys) stay
shuffle-partitioned, dims broadcast. The max-of-agg and rank queries
keep the window/self-join on the post-aggregation (small) relation,
never on the fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from distributed_file_system_with_stream_processing_spark.sources.tables import load_table


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS semi-join — orders in 1997 that had at
    least one returned line, counted by priority. LeftSemi: lineitem
    contributes existence only, never widens the row."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    returned = l.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        o.filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01"))
            & (F.col("o_orderdate") < F.lit("1998-01-01"))
        )
        .join(returned, o.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
GROUP BY o_orderpriority
"""


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: LEFT OUTER join preserving order-less customers,
    then the distribution of customers per order count (double agg)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


Q13_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
    SELECT c_custkey, count(o_orderkey) AS c_count
    FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
)
GROUP BY c_count
"""


def inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join: customers with NO order since 2000-01-01, counted by
    market segment. LeftAnti — the probe side never materializes
    matches, only absence."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    recent = o.filter(F.col("o_orderdate") >= F.lit("2000-01-01")).select("o_custkey")
    return (
        c.join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_inactive"))
    )


INACTIVE_SQL = """
SELECT c_mktsegment, count(*) AS n_inactive
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c_mktsegment
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: max-of-aggregate — supplier(s) whose 1997
    revenue equals the global max. The max is computed on the tiny
    post-agg relation and broadcast back; the fact table is scanned
    once."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    rev = (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01"))
            & (F.col("l_shipdate") < F.lit("1998-01-01"))
        )
        .groupBy("l_suppkey")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("total_revenue"))
    )
    top = rev.agg(F.max("total_revenue").alias("m"))
    return (
        rev.join(broadcast(top), rev.total_revenue == top.m)
        .join(broadcast(s), rev.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


Q15_SQL = """
WITH revenue AS (
    SELECT l_suppkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
"""


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: group-HAVING semi-join — orders whose total
    line quantity exceeds 300, joined back to customer. The HAVING
    relation is small (post-agg) and broadcast into the semi-join."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    return (
        o.join(broadcast(big), o.o_orderkey == big.l_orderkey)
        .join(broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            F.round("o_totalprice", 2).alias("total_price"),
            "total_qty",
        )
    )


Q18_SQL = """
SELECT c_custkey, c_name, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d')  AS order_date,
       round(o_totalprice, 2)             AS total_price,
       total_qty
FROM orders
JOIN (SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 300) ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
"""


def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregate share — PROMO parts'
    fraction of 1997 revenue. part is broadcast; one pass over the
    fact side."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    # r8 conversion: net revenue quantizes to 1e-4 dollars per row
    # (exact — price and discount each carry ≤2 decimals), so both
    # sums are exact integers and the Q14 percentage is ONE exact
    # rational, truncating-integer-divided at 4 dp. The old form
    # summed raw doubles (order-dependent association) and rounded a
    # double quotient (the .xxxx5 boundary class) on both sides.
    rev4 = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
    ).cast("long")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01"))
            & (F.col("l_shipdate") < F.lit("1998-01-01"))
        )
        .join(broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", rev4).otherwise(0)).alias(
                "pr"
            ),
            F.sum(rev4).alias("tr"),
        )
        .select(
            (
                F.expr("(pr * 100 * 10000) div tr").cast("double") / 1e4
            ).alias("promo_share_pct")
        )
    )


PROMO_SQL = """
WITH t AS (
    SELECT sum(CASE WHEN p_type = 'PROMO'
               THEN CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                         AS BIGINT) ELSE 0 END) AS pr,
           sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                    AS BIGINT)) AS tr
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
)
SELECT CAST((pr * 100 * 10000) // tr AS DOUBLE) / 10000.0 AS promo_share_pct
FROM t
"""


def nation_top_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranked window per group: top-3 suppliers by account balance in
    each nation (deterministic tie-break on key). The window runs on
    the small supplier relation; nation broadcasts."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    w = Window.partitionBy("s_nationkey").orderBy(
        F.desc("s_acctbal"), F.asc("s_suppkey")
    )
    return (
        s.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .join(broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("n_name", "s_suppkey", "s_name", F.round("s_acctbal", 2).alias("acctbal"), "rnk")
    )


NATION_TOP_SUPPLIERS_SQL = """
SELECT n_name, s_suppkey, s_name, round(s_acctbal, 2) AS acctbal, rnk
FROM (
    SELECT *, row_number() OVER (PARTITION BY s_nationkey
                                 ORDER BY s_acctbal DESC, s_suppkey ASC) AS rnk
    FROM supplier
)
JOIN nation ON s_nationkey = n_nationkey
WHERE rnk <= 3
"""


def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's most recent
    click at-or-before it (the time-series operator Spark lacks as a
    builtin). Implemented as the union+last-ignorenulls window trick:
    tag both streams, sort by (ts, tag) within user, carry the last
    click forward — ONE shuffle on user_id, no range-join explosion.
    At 100 TB this beats the naive inequality join (which builds every
    (purchase × earlier-click) pair before aggregating them away).
    Oracle: DuckDB's native ASOF LEFT JOIN."""
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_event_id"))
    )
    tagged = purchases.select(
        "user_id",
        "ts",
        F.lit(1).alias("tag"),
        "event_id",
        F.lit(None).cast("long").alias("click_event_id"),
    ).unionByName(
        clicks.select(
            "user_id",
            "ts",
            F.lit(0).alias("tag"),
            F.lit(None).cast("long").alias("event_id"),
            "click_event_id",
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    click_ts = F.when(F.col("tag") == 0, F.col("ts"))
    click_id = F.when(F.col("tag") == 0, F.col("click_event_id"))
    return (
        tagged.withColumn("last_click_ts", F.last(click_ts, ignorenulls=True).over(w))
        .withColumn("last_click_id", F.last(click_id, ignorenulls=True).over(w))
        .filter(F.col("tag") == 1)
        .select(
            "event_id",
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
            # purchases before any click have no match; sentinel instead
            # of NULL so the driver's order-insensitive sort is total
            F.coalesce(
                F.date_format("last_click_ts", "yyyy-MM-dd HH:mm:ss"), F.lit("(none)")
            ).alias("click_ts"),
            F.coalesce("last_click_id", F.lit(-1)).alias("click_event_id"),
        )
    )


EVENTS_ASOF_SQL = """
WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
c AS (SELECT user_id, ts, max(event_id) AS click_event_id
      FROM events WHERE event_type = 'click' GROUP BY 1, 2)
SELECT p.event_id, p.user_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS ts,
       coalesce(strftime(c.ts, '%Y-%m-%d %H:%M:%S'), '(none)') AS click_ts,
       coalesce(c.click_event_id, -1) AS click_event_id
FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND c.ts <= p.ts
"""


def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured path: extract a typed field from the JSON
    ``props`` column and aggregate it — scan-side JSON parse, JVM
    expression, no UDF."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
            F.sum(F.when(F.col("k") > 50, 1).otherwise(0)).cast("long").alias("n_big"),
        )
    )


EVENTS_JSON_SQL = """
SELECT event_type,
       CAST(sum(k) AS BIGINT) AS sum_k,
       CAST(max(k) AS INT)    AS max_k,
       CAST(count(*) FILTER (WHERE k > 50) AS BIGINT) AS n_big
FROM (SELECT event_type, CAST(props->>'$.k' AS INT) AS k FROM events)
GROUP BY event_type
"""


def events_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-count aggregation (the expensive two-shuffle shape:
    partial distinct on (type, user), then count per type)."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


EVENTS_DISTINCT_SQL = """
SELECT event_type,
       count(DISTINCT user_id) AS n_users,
       count(*)                AS n_events
FROM events
GROUP BY event_type
"""


def lineitem_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets: per (returnflag, linestatus), per
    returnflag subtotal, and grand total in one pass (partial-agg
    friendly; one shuffle)."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("(all)")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("(all)")).alias("linestatus"),
            "sum_qty",
            "n_items",
        )
    )


LINEITEM_ROLLUP_SQL = """
SELECT coalesce(l_returnflag, '(all)') AS returnflag,
       coalesce(l_linestatus, '(all)') AS linestatus,
       round(sum(l_quantity), 2)       AS sum_qty,
       count(*)                        AS n_items
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
"""


def churned_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-operation family: customers in the top-spend cohort (EXCEPT)
    who placed no order in the final year — intersect/except as
    first-class relational ops (Spark plans them as semi/anti joins
    under the hood; declared set-wise here)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    spenders = (
        o.groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("spent"))
        .filter(F.col("spent") > 1_000_000)
        .select(F.col("o_custkey").alias("custkey"))
    )
    recent = (
        o.filter(F.col("o_orderdate") >= F.lit("2001-01-01"))
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
    )
    churned = spenders.exceptAll(recent.intersect(spenders))
    return (
        churned.join(broadcast(c), churned.custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_churned"))
    )


CHURNED_SQL = """
WITH spenders AS (
    SELECT o_custkey AS custkey FROM orders
    GROUP BY o_custkey HAVING sum(o_totalprice) > 1000000
),
recent AS (
    SELECT DISTINCT o_custkey AS custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '2001-01-01'
),
churned AS (
    SELECT custkey FROM spenders
    EXCEPT ALL
    (SELECT custkey FROM recent INTERSECT SELECT custkey FROM spenders)
)
SELECT c_mktsegment, count(*) AS n_churned
FROM churned JOIN customer ON custkey = c_custkey
GROUP BY c_mktsegment
"""


def order_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentile aggregation (sort-based agg family): median and
    p95 order value per priority. Exact percentiles are a full sort per
    group; at 100 TB you'd switch to percentile_approx (t-digest) —
    kept exact here so the DuckDB twin (quantile_cont) matches
    bit-for-bit."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 2).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.95)"), 2).alias("p95"),
        F.count(F.lit(1)).alias("n_orders"),
    )


PERCENTILES_SQL = """
SELECT o_orderpriority,
       round(quantile_cont(o_totalprice, 0.5), 2)  AS p50,
       round(quantile_cont(o_totalprice, 0.95), 2) AS p95,
       count(*)                                    AS n_orders
FROM orders
GROUP BY o_orderpriority
"""


def events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: per-user event-type counts as columns. Explicit value
    list — at 100 TB an unpinned pivot needs an extra distinct pass to
    discover the columns; pinning it keeps this one shuffle."""
    e = load_table(spark, sf_dir, "events")
    kinds = ["click", "view", "purchase", "signup", "error"]
    p = e.groupBy("user_id").pivot("event_type", kinds).count()
    return p.select(
        "user_id",
        *[F.coalesce(F.col(k), F.lit(0)).alias(f"n_{k}") for k in kinds],
    )


EVENTS_PIVOT_SQL = """
SELECT user_id,
       CAST(count(*) FILTER (WHERE event_type = 'click')    AS BIGINT) AS n_click,
       CAST(count(*) FILTER (WHERE event_type = 'view')     AS BIGINT) AS n_view,
       CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n_purchase,
       CAST(count(*) FILTER (WHERE event_type = 'signup')   AS BIGINT) AS n_signup,
       CAST(count(*) FILTER (WHERE event_type = 'error')    AS BIGINT) AS n_error
FROM events
GROUP BY user_id
"""


def events_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-frame aggregate: 4-row trailing moving average of event
    value per user (ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) —
    deterministic frame order via (ts, event_id) tie-break."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.round(F.avg("value").over(w), 4).alias("mavg_value"),
    )


EVENTS_MOVING_AVG_SQL = """
SELECT event_id, user_id,
       round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS mavg_value
FROM events
"""


def events_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct counting — the 100 TB path for
    cardinality (exact distinct = full shuffle of every key; HLL is a
    fixed-size mergeable sketch, map-side combinable). No SQL oracle —
    the estimate is engine-specific; the driver records rows-only and
    tests/test_queries pin the relative error vs exact."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


def segment_priority_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collect-aggregation family: the distinct order priorities seen
    per customer segment, as a deterministically sorted list (rendered
    '|'-joined for the oracle hash). collect_set alone is
    order-nondeterministic — array_sort makes it reproducible."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        o.join(broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.array_join(
                F.array_sort(F.collect_set("o_orderpriority")), "|"
            ).alias("priorities"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


SEGMENT_PRIORITY_SETS_SQL = """
SELECT c_mktsegment,
       array_to_string(list_sort(list_distinct(list(o_orderpriority))), '|') AS priorities,
       count(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def orders_by_year_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's SQL surface: a query written entirely in Spark SQL
    over the registered table views (everything else here uses the
    DataFrame API — same Catalyst plans, two front doors)."""
    from distributed_file_system_with_stream_processing_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT CAST(year(o_orderdate) AS BIGINT)   AS yr,
               round(sum(o_totalprice), 2)         AS revenue,
               count(*)                            AS n_orders
        FROM orders
        GROUP BY year(o_orderdate)
        """
    )


ORDERS_BY_YEAR_SQL = """
SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
       round(sum(o_totalprice), 2)       AS revenue,
       count(*)                          AS n_orders
FROM orders
GROUP BY year(o_orderdate)
"""


def lineitem_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets: all (returnflag × linestatus) subtotal
    combinations in one pass — rollup's full-lattice sibling."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.cube("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("(all)")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("(all)")).alias("linestatus"),
            "sum_price",
            "n_items",
        )
    )


LINEITEM_CUBE_SQL = """
SELECT coalesce(l_returnflag, '(all)') AS returnflag,
       coalesce(l_linestatus, '(all)') AS linestatus,
       round(sum(l_extendedprice), 2)  AS sum_price,
       count(*)                        AS n_items
FROM lineitem
GROUP BY CUBE(l_returnflag, l_linestatus)
"""


QUERIES = {
    "q4_order_priority": q4_order_priority,
    "q13_customer_distribution": q13_customer_distribution,
    "inactive_customers": inactive_customers,
    "q15_top_supplier": q15_top_supplier,
    "q18_large_orders": q18_large_orders,
    "promo_revenue_share": promo_revenue_share,
    "nation_top_suppliers": nation_top_suppliers,
    "events_asof_join": events_asof_join,
    "events_json_extract": events_json_extract,
    "events_distinct_users": events_distinct_users,
    "lineitem_rollup": lineitem_rollup,
    "lineitem_cube": lineitem_cube,
    "churned_big_spenders": churned_big_spenders,
    "order_value_percentiles": order_value_percentiles,
    "events_pivot": events_pivot,
    "events_moving_avg": events_moving_avg,
    "events_approx_distinct": events_approx_distinct,
    "segment_priority_sets": segment_priority_sets,
    "orders_by_year_sql": orders_by_year_sql,
}

ORACLES = {
    "q4_order_priority": Q4_SQL,
    "q13_customer_distribution": Q13_SQL,
    "inactive_customers": INACTIVE_SQL,
    "q15_top_supplier": Q15_SQL,
    "q18_large_orders": Q18_SQL,
    "promo_revenue_share": PROMO_SQL,
    "nation_top_suppliers": NATION_TOP_SUPPLIERS_SQL,
    "events_asof_join": EVENTS_ASOF_SQL,
    "events_json_extract": EVENTS_JSON_SQL,
    "events_distinct_users": EVENTS_DISTINCT_SQL,
    "lineitem_rollup": LINEITEM_ROLLUP_SQL,
    "lineitem_cube": LINEITEM_CUBE_SQL,
    "churned_big_spenders": CHURNED_SQL,
    "order_value_percentiles": PERCENTILES_SQL,
    "events_pivot": EVENTS_PIVOT_SQL,
    "events_moving_avg": EVENTS_MOVING_AVG_SQL,
    "segment_priority_sets": SEGMENT_PRIORITY_SETS_SQL,
    "orders_by_year_sql": ORDERS_BY_YEAR_SQL,
}
