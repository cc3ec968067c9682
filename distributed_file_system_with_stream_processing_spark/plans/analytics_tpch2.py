"""Second wave of TPC-H query shapes: nation-pair volume (Q7), market
share (Q8), returned-item top customers (Q10), correlated avg-quantity
subquery (Q17), disjunctive predicate join (Q19), double
EXISTS/NOT-EXISTS (Q21), scalar-subquery + anti-join (Q22), and
non-hierarchical GROUPING SETS.

These close out the TPC-H operator families on the driver schema.
There is no ``partsupp`` table, so the supplier-part-cost shapes
(Q2/Q9/Q11/Q16/Q20) derive their part-supplier relation from actual
shipments — min observed unit price stands in for supplycost, shipped
quantity/value for stock — preserving each query's join/subquery
structure. With those adaptations (and Q12's l_returnflag standing in
for the absent l_shipmode), all 22 TPC-H query shapes are covered
across plans/analytics*.py.

Scale notes (100 TB): every dim (nation/supplier/customer-agg/part
subsets) is an explicit ``broadcast()``; the only shuffles are the
fact-fact ``orders ⋈ lineitem`` joins and the final small-group
aggregations. Correlated scalar subqueries are decorrelated by hand
into aggregate-then-broadcast-join (Q17, Q22) — the join-back relation
is post-aggregation (one row per part / one row total), metadata-scale.
The Q21 EXISTS/NOT-EXISTS pair becomes left-semi/left-anti joins that
ship only (orderkey, suppkey) pairs, never widening the probe rows.

Reference parity: these extend the op1/op2 filter→project→aggregate
contract of rainstorm.go:357-519 to the full join/subquery surface a
batch engine needs; the reference's own test queries (user/tests.go:
152-191) are covered by plans/rainstorm_queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from distributed_file_system_with_stream_processing_spark.sources.tables import load_table


def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between two nations by year.

    Two *roles* of the same nation dim (supplier nation, customer
    nation) joined independently — both broadcast; the disjunctive
    nation-pair predicate is applied post-join where Catalyst can still
    prune dim rows into the broadcast hash tables.
    """
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")

    supp_nat = s.join(broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey", F.col("n_name").alias("supp_nation")
    )
    cust_nat = c.join(broadcast(n), c.c_nationkey == n.n_nationkey).select(
        "c_custkey", F.col("n_name").alias("cust_nation")
    )
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1998-01-01"))
        )
        .join(o.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(broadcast(supp_nat), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(broadcast(cust_nat), F.col("o_custkey") == F.col("c_custkey"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


Q7_SQL = """
SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
FROM (
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l_shipdate) AS l_year,
           l_extendedprice * (1 - l_discount) AS volume
    FROM supplier, lineitem, orders, customer, nation n1, nation n2
    WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
      AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
      AND c_nationkey = n2.n_nationkey
      AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
)
GROUP BY supp_nation, cust_nation, l_year
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_3's share of PROMO-part revenue delivered
    to ASIA customers, by order year — a conditional-sum ratio over a
    5-way join. All dims broadcast; one fact-fact shuffle."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")

    asia_nations = n.join(
        broadcast(r.filter(F.col("r_name") == "ASIA")),
        n.n_regionkey == r.r_regionkey,
    ).select("n_nationkey")
    asia_cust = c.join(broadcast(asia_nations), c.c_nationkey == F.col("n_nationkey")).select(
        "c_custkey"
    )
    supp_nat = s.join(broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey", F.col("n_name").alias("supp_nation")
    )
    promo_parts = p.filter(F.col("p_type") == "PROMO").select("p_partkey")

    vol = (
        l.join(broadcast(promo_parts), l.l_partkey == F.col("p_partkey"))
        .join(o.select("o_orderkey", "o_custkey", "o_orderdate"), l.l_orderkey == F.col("o_orderkey"))
        .join(broadcast(asia_cust), F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .join(broadcast(supp_nat), l.l_suppkey == F.col("s_suppkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            # r9 conversion (wave 3): volume quantizes to exact 1e-4
            # dollars per row (price/discount carry ≤2 decimals each),
            # so both sums are exact integers and the share is one
            # truncating integer division at 6 dp — the
            # promo_revenue_share discipline (the old form summed raw
            # doubles and rounded a double quotient on both sides)
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
            )
            .cast("long")
            .alias("vol4"),
            "supp_nation",
        )
    )
    return (
        vol.groupBy("o_year")
        .agg(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_3", F.col("vol4")).otherwise(0)
            ).alias("nv"),
            F.sum("vol4").alias("tv"),
        )
        .select(
            "o_year",
            (
                F.expr("(cast(nv as decimal(38,0)) * 1000000) div tv")
                .cast("double") / 1e6
            ).alias("mkt_share"),
        )
    )


Q8_SQL = """
SELECT o_year,
       CAST((CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN vol4 ELSE 0 END)
                  AS HUGEINT) * 1000000) // sum(vol4) AS DOUBLE) / 1000000.0
           AS mkt_share
FROM (
    SELECT year(o_orderdate) AS o_year,
           CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)
               AS vol4,
           n1.n_name AS supp_nation
    FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
    WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
      AND l_orderkey = o_orderkey AND o_custkey = c_custkey
      AND c_nationkey = n2.n_nationkey AND n2.n_regionkey = r_regionkey
      AND r_name = 'ASIA' AND s_nationkey = n1.n_nationkey
      AND p_type = 'PROMO'
)
GROUP BY o_year
"""


def q10_returned_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top 20 customers by revenue lost to returned
    items in 1997Q1. Agg on the fact join first (shuffle on custkey),
    then broadcast-join the customer/nation dims onto the tiny top-k
    relation — never the other way around."""
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")

    rev = (
        o.filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01"))
            & (F.col("o_orderdate") < F.lit("1997-04-01"))
        )
        .select("o_orderkey", "o_custkey")
        .join(
            l.filter(F.col("l_returnflag") == "R").select(
                "l_orderkey", "l_extendedprice", "l_discount"
            ),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("o_custkey")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )
    top = rev.orderBy(F.desc("revenue"), F.asc("o_custkey")).limit(20)
    return (
        top.join(broadcast(c), top.o_custkey == c.c_custkey)
        .join(broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 2).alias("acctbal"),
            F.col("n_name").alias("nation"),
        )
    )


Q10_SQL = """
SELECT c_custkey, c_name, revenue, round(c_acctbal, 2) AS acctbal,
       n_name AS nation
FROM (
    SELECT o_custkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM orders, lineitem
    WHERE o_orderkey = l_orderkey AND l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1997-04-01'
    GROUP BY o_custkey
    ORDER BY revenue DESC, o_custkey
    LIMIT 20
), customer, nation
WHERE c_custkey = o_custkey AND c_nationkey = n_nationkey
"""


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: average yearly revenue lost if small-quantity
    orders (below 20% of the part's average quantity) were not filled,
    for one brand. The correlated scalar subquery is decorrelated into
    a per-part aggregate broadcast back onto the fact rows."""
    p = load_table(spark, sf_dir, "part")
    l = load_table(spark, sf_dir, "lineitem")

    brand_parts = p.filter(F.col("p_brand") == "Brand#1").select("p_partkey")
    brand_lines = l.join(broadcast(brand_parts), l.l_partkey == F.col("p_partkey"), "left_semi")
    part_avg = brand_lines.groupBy("l_partkey").agg(
        (0.2 * F.avg("l_quantity")).alias("qty_thresh")
    )
    return (
        brand_lines.join(
            broadcast(part_avg.withColumnRenamed("l_partkey", "t_partkey")),
            F.col("l_partkey") == F.col("t_partkey"),
        )
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(
            F.coalesce(
                F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")),
                F.lit(0).cast("long"),
            ).alias("_cents")
        )
        # r9 conversion (wave 3): Σ/7 at 2 dp is the exact rational
        # (Σcents div 7)/100 — cents quantize exactly (2-decimal
        # prices), the division truncates identically in both engines
        .select(
            (F.expr("_cents div 7").cast("double") / 100.0).alias(
                "avg_yearly"
            )
        )
    )


Q17_SQL = """
SELECT CAST(coalesce(sum(CAST(round(l_extendedprice * 100) AS BIGINT)), 0)
            // 7 AS DOUBLE) / 100.0 AS avg_yearly
FROM lineitem, part
WHERE p_partkey = l_partkey AND p_brand = 'Brand#1'
  AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
"""


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under three OR'd brackets of
    (brand, size range, quantity range). One broadcast hash join on
    partkey; the disjunction stays a post-join filter that whole-stage
    codegen collapses into a single pass."""
    p = load_table(spark, sf_dir, "part")
    l = load_table(spark, sf_dir, "lineitem")
    j = l.join(broadcast(p.select("p_partkey", "p_brand", "p_size")), l.l_partkey == p.p_partkey)
    bracket = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return j.filter(bracket).agg(
        F.round(
            F.coalesce(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), F.lit(0.0)),
            2,
        ).alias("revenue")
    )


Q19_SQL = """
SELECT round(coalesce(sum(l_extendedprice * (1 - l_discount)), 0.0), 2) AS revenue
FROM lineitem, part
WHERE p_partkey = l_partkey
  AND ((p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
        AND l_quantity BETWEEN 1 AND 20)
    OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
        AND l_quantity BETWEEN 10 AND 30)
    OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
        AND l_quantity BETWEEN 20 AND 40))
"""


def q21_sole_returner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: double correlated EXISTS / NOT EXISTS — the
    suppliers solely responsible for returns in multi-supplier orders.
    EXISTS → left-semi, NOT EXISTS → left-anti; both probe relations
    carry only (orderkey, suppkey), so the shuffles ship 16 bytes/row
    no matter how wide lineitem is."""
    s = load_table(spark, sf_dir, "supplier")
    l = load_table(spark, sf_dir, "lineitem")

    pairs = l.select("l_orderkey", "l_suppkey")
    r_pairs = l.filter(F.col("l_returnflag") == "R").select("l_orderkey", "l_suppkey")

    l2 = pairs.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    )
    l3 = r_pairs.select(
        F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3")
    )
    sole = (
        r_pairs.join(
            l2,
            (F.col("l_orderkey") == F.col("o2")) & (F.col("l_suppkey") != F.col("s2")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("o3")) & (F.col("l_suppkey") != F.col("s3")),
            "left_anti",
        )
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
    return (
        sole.join(broadcast(s), sole.l_suppkey == s.s_suppkey)
        .select("s_name", "numwait")
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(10)
    )


Q21_SQL = """
SELECT s_name, count(*) AS numwait
FROM lineitem l1, supplier
WHERE s_suppkey = l1.l_suppkey AND l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 10
"""


def q22_rich_inactive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers above the global positive-balance
    average with no orders at all, counted per nation. Written through
    the SQL front door because Catalyst's native ScalarSubquery is the
    right physical strategy for the global average — it runs as a
    separate one-row job and is embedded as a literal into the main
    scan's predicate (NO join at all; any DataFrame-API emulation via
    crossJoin/constant-key join plans as a nested loop instead). The
    NOT EXISTS still becomes a left-anti hash join on o_custkey."""
    from distributed_file_system_with_stream_processing_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(Q22_SQL)


Q22_SQL = """
SELECT c_nationkey, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
FROM customer c
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY c_nationkey
"""


def lineitem_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-hierarchical GROUPING SETS — per-returnflag totals AND
    per-linestatus totals in one pass (not expressible as ROLLUP or
    CUBE, which are strict super/sub-lattices). One shuffle produces
    both groupings via Spark's Expand operator."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupingSets(
            [["l_returnflag"], ["l_linestatus"]], "l_returnflag", "l_linestatus"
        )
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


LINEITEM_GROUPING_SETS_SQL = """
SELECT coalesce(l_returnflag, '(all)') AS returnflag,
       coalesce(l_linestatus, '(all)') AS linestatus,
       round(sum(l_quantity), 2)       AS sum_qty,
       count(*)                        AS n_items
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
"""


def q9_nation_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (no partsupp table in the data model, so profit
    is revenue without the supplycost subtraction): per-nation,
    per-year profit on parts matching a name pattern.

    Scale shape: part filter → broadcast semi-side; supplier⋈nation
    broadcast; lineitem⋈orders is the only fact-fact shuffle. The LIKE
    filter prunes the part build side BEFORE the broadcast."""
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    supp_nat = s.join(broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey", F.col("n_name").alias("nation")
    )
    return (
        l.join(broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(o.select("o_orderkey", "o_orderdate"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(broadcast(supp_nat), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        # sum exact integer CENTS, not doubles: a double sum's value
        # depends on partial-agg order, and this query's totals land
        # close enough to a .005 boundary that Spark and DuckDB round
        # the 2nd decimal differently. Per-row cent rounding is
        # engine-identical (same IEEE product), and a long sum is
        # order-free — bit-stable at any parallelism.
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
                .cast("long")
            ).alias("_cents")
        )
        .select(
            "nation",
            "o_year",
            # ok-round: exact cents grid (2 dp)
            F.round(F.col("_cents") / 100.0, 2).alias("sum_profit"),
        )
    )


Q9_SQL = """
SELECT n_name AS nation, year(o_orderdate) AS o_year,
       -- ok-round: exact cents grid (2 dp)
       round(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) / 100.0,
             2) AS sum_profit
FROM lineitem, part, orders, supplier, nation
WHERE p_partkey = l_partkey AND o_orderkey = l_orderkey
  AND s_suppkey = l_suppkey AND s_nationkey = n_nationkey
  AND p_name LIKE '%widget%'
GROUP BY n_name, year(o_orderdate)
"""


def q16_supplier_part_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (partsupp absent — supplier-part pairs derived
    from actual shipments): distinct supplier count per (brand, type,
    size) excluding one brand. countDistinct over a broadcast-joined
    fact: partial distinct aggregation map-side, one shuffle."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") != "Brand#13")
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.join(broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#13'
GROUP BY p_brand, p_type, p_size
"""


def q20_volume_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (partsupp absent — shipped quantity stands in
    for stock): suppliers that moved > 40 units of pattern-matched
    parts in 1996. Aggregate-then-join: the heavy groupBy runs on the
    pre-filtered fact, the supplier dim joins AFTER reduction (join
    input is supplier-cardinality, not lineitem-cardinality)."""
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey")
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    s = load_table(spark, sf_dir, "supplier")
    qty = (
        l.join(broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > 40.0)
    )
    return qty.join(s, F.col("l_suppkey") == F.col("s_suppkey")).select(
        F.col("s_suppkey").cast("long").alias("s_suppkey"), "s_name", "total_qty"
    )


Q20_SQL = """
WITH qty AS (
    SELECT l_suppkey, round(sum(l_quantity), 2) AS total_qty
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_name LIKE '%widget%'
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY l_suppkey
    HAVING round(sum(l_quantity), 2) > 40.0
)
SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name, total_qty
FROM qty JOIN supplier ON s_suppkey = l_suppkey
"""


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (partsupp absent — each supplier's offer price
    for a part is its minimum observed unit sale price): for STANDARD
    parts of size <= 25, the EUROPE supplier(s) offering the lowest
    price, with supplier/nation details.

    The correlated MIN subquery is decorrelated by hand, the module's
    idiom: derive ps = (part, supplier, cost) with ONE fact shuffle
    [groupBy (l_partkey, l_suppkey)], restrict to the broadcast
    region-filtered supplier dim, reduce to min-cost-per-part
    (part-cardinality = metadata scale), and broadcast THAT back as an
    equality join — no window re-shuffle, no second fact pass. Cost
    equality joins on the RAW double: min() selects an existing IEEE
    division result, bit-identical in any engine; rounding happens
    only at display.
    """
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_type") == "STANDARD") & (F.col("p_size") <= 25))
        .select("p_partkey", "p_name")
    )
    supp_eu = (
        s.join(broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    ps = (
        l.join(broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(broadcast(supp_eu), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("_cost"))
    )
    # rename the join-back keys: ps and minc share a lineage, and
    # same-named columns would resolve to the SAME attribute (a
    # trivially-true predicate, i.e. a cartesian join)
    minc = (
        ps.groupBy("p_partkey")
        .agg(F.min("_cost").alias("_min_cost"))
        .select(F.col("p_partkey").alias("_min_pk"), "_min_cost")
    )
    return (
        ps.join(
            broadcast(minc),
            (F.col("p_partkey") == F.col("_min_pk"))
            & (F.col("_cost") == F.col("_min_cost")),
        )
        .select(
            F.col("p_partkey").cast("long").alias("p_partkey"),
            "p_name",
            F.col("s_suppkey").cast("long").alias("s_suppkey"),
            "s_name",
            F.round("s_acctbal", 2).alias("s_acctbal"),
            F.col("n_name").alias("nation"),
            F.round("_cost", 2).alias("min_cost"),
        )
    )


Q2_SQL = """
WITH supp_eu AS (
    SELECT s_suppkey, s_name, s_acctbal, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
                  JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE'
),
ps AS (
    SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name,
           min(l_extendedprice / l_quantity) AS cost
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN supp_eu ON s_suppkey = l_suppkey
    WHERE p_type = 'STANDARD' AND p_size <= 25
    GROUP BY p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name
),
minc AS (SELECT p_partkey, min(cost) AS min_cost FROM ps GROUP BY p_partkey)
SELECT CAST(ps.p_partkey AS BIGINT) AS p_partkey, p_name,
       CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name,
       round(s_acctbal, 2) AS s_acctbal, n_name AS nation,
       round(cost, 2) AS min_cost
FROM ps JOIN minc ON ps.p_partkey = minc.p_partkey AND ps.cost = minc.min_cost
"""


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (partsupp absent — shipped value stands in for
    stock value): parts whose total shipped value from EUROPE
    suppliers exceeds 1/200 of the region-wide total.

    The global-total scalar subquery stays EXACT and order-free via
    integer cents (the q9 trick), and the threshold compare runs in
    pure integer space — ``value_cents * 200 > total_cents`` — so no
    float boundary can flip a row between engines. Scale shape: one
    fact shuffle [groupBy l_partkey] after the broadcast supplier
    semi-join; the grand total re-aggregates the part-level partials
    (metadata scale) and attaches as a 1-row broadcast — the same
    BuildRight BroadcastNestedLoopJoin as tfidf_top_terms's N
    (allow-listed in tests/test_plans.py; with a 1-row build side the
    "loop" is appending a scalar column).
    """
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    supp_eu = (
        s.join(broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey")
    )
    val = (
        l.join(broadcast(supp_eu), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
                "_cents"
            )
        )
    )
    total = val.agg(F.sum("_cents").alias("_total_cents"))
    return (
        val.crossJoin(broadcast(total))
        .filter(F.col("_cents") * 200 > F.col("_total_cents"))
        .select(
            F.col("l_partkey").cast("long").alias("p_partkey"),
            # ok-round: exact cents grid (2 dp)
            F.round(F.col("_cents") / 100.0, 2).alias("value"),
        )
    )


Q11_SQL = """
WITH supp_eu AS (
    SELECT s_suppkey
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
                  JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE'
),
val AS (
    SELECT l_partkey,
           sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cents
    FROM lineitem JOIN supp_eu ON s_suppkey = l_suppkey
    GROUP BY l_partkey
),
tot AS (SELECT sum(cents) AS total_cents FROM val)
SELECT CAST(l_partkey AS BIGINT) AS p_partkey,
       -- ok-round: exact cents grid (2 dp)
       round(cents / 100.0, 2) AS value
FROM val CROSS JOIN tot
WHERE cents * 200 > total_cents
"""


def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (no l_shipmode/receiptdate columns —
    l_returnflag stands in for the shipmode class, the 1996 ship-date
    window for the receipt window): per return flag, how many critical
    (1-URGENT / 2-HIGH) vs non-critical orders shipped lines.

    The canonical conditional-count over a fact-fact join: lineitem
    filtered at the scan, one shuffle join to orders, map-side partial
    counts into a 3-row group. Counts are integers — nothing to drift.
    """
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.select("l_orderkey", "l_returnflag")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


Q12_SQL = """
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
GROUP BY l_returnflag
"""


QUERIES = {
    "q7_nation_volume": q7_nation_volume,
    "q8_market_share": q8_market_share,
    "q10_returned_top_customers": q10_returned_top_customers,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q19_disjunctive_revenue": q19_disjunctive_revenue,
    "q21_sole_returner": q21_sole_returner,
    "q22_rich_inactive": q22_rich_inactive,
    "q9_nation_profit": q9_nation_profit,
    "q16_supplier_part_breadth": q16_supplier_part_breadth,
    "q20_volume_suppliers": q20_volume_suppliers,
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q11_important_parts": q11_important_parts,
    "q12_shipmode_priority": q12_shipmode_priority,
    "lineitem_grouping_sets": lineitem_grouping_sets,
}

ORACLES = {
    "q7_nation_volume": Q7_SQL,
    "q8_market_share": Q8_SQL,
    "q10_returned_top_customers": Q10_SQL,
    "q17_small_quantity_revenue": Q17_SQL,
    "q19_disjunctive_revenue": Q19_SQL,
    "q21_sole_returner": Q21_SQL,
    "q22_rich_inactive": Q22_SQL,
    "q9_nation_profit": Q9_SQL,
    "q16_supplier_part_breadth": Q16_SQL,
    "q20_volume_suppliers": Q20_SQL,
    "q2_min_cost_supplier": Q2_SQL,
    "q11_important_parts": Q11_SQL,
    "q12_shipmode_priority": Q12_SQL,
    "lineitem_grouping_sets": LINEITEM_GROUPING_SETS_SQL,
}
