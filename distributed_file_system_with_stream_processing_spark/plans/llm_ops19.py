"""Round-7 batch III: relational screens over the TPC-H-ish tables
(balance bands, discount bands, price bands, supplier consistency,
segment×nation independence, inter-purchase gaps, returns trend).

Same contract as the other ``llm_ops*`` modules: declarative DataFrame
plans (JVM expressions only) with DuckDB oracles mirroring the exact
arithmetic. Money folds as integer cents; fractional outputs divide
integer sums once. Banded histograms are arithmetic (fixed-width
bins), never order statistics — no global sorts at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from distributed_file_system_with_stream_processing_spark.sources.tables import load_table

_MICRO = 1_000_000

# ---------------------------------------------------------------------------
# customer_balance_band_behavior

_CBB_BAND_CENTS = 100_000  # $1000 bands


def customer_balance_band_behavior(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Do rich-balance customers actually order more? Customers in
    fixed $1000 acctbal bands (arithmetic banding — a decile ntile
    would global-sort every customer) × their order count and spend.
    Customers with no orders stay in the denominator (left join,
    zero-filled) — the inactive mass is the point of the screen.

    100 TB shape: one custkey rollup of orders, a co-keyed left join
    from customers, a ≤|bands|-row fold."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents"),
    )
    cb = F.round(F.col("c_acctbal") * 100).cast("long")
    j = c.select(
        "c_custkey", F.floor(cb / _CBB_BAND_CENTS).cast("long").alias("band")
    ).join(per, c.c_custkey == per.o_custkey, "left")
    agg = j.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(F.coalesce("n_orders", F.lit(0))).alias("t_orders"),
        F.sum(F.coalesce("cents", F.lit(0))).alias("t_cents"),
    )
    return agg.select(
        "band",
        # ok-round: on-grid bin-edge constant product
        F.round(F.col("band") * (_CBB_BAND_CENTS / 100.0), 2).alias("balance_lo"),
        F.col("n_customers").cast("long").alias("n_customers"),
        # exact truncating integer-division means (r7 conversion; see
        # llm_ops21.orders_basket_size_profile)
        (F.expr("(t_orders * 10000) div n_customers").cast("double") / 1e4).alias(
            "avg_orders"
        ),
        (F.expr("t_cents div n_customers").cast("double") / 100.0).alias(
            "avg_spend"
        ),
    )


CUSTOMER_BALANCE_BAND_SQL = f"""
WITH per AS (
    SELECT o_custkey, count(*) AS n_orders,
           sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
    FROM orders GROUP BY o_custkey
),
j AS (
    SELECT CAST(floor(CAST(round(c_acctbal * 100) AS BIGINT)
                      / {_CBB_BAND_CENTS}.0) AS BIGINT) AS band,
           coalesce(p.n_orders, 0) AS n_orders,
           coalesce(p.cents, 0) AS cents
    FROM customer c LEFT JOIN per p ON c.c_custkey = p.o_custkey
)
SELECT band,
       round(CAST(band AS DOUBLE) * {_CBB_BAND_CENTS / 100.0}, 2) AS balance_lo,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST((sum(n_orders) * 10000) // count(*) AS DOUBLE) / 10000.0
           AS avg_orders,
       CAST(sum(cents) // count(*) AS DOUBLE) / 100.0 AS avg_spend
FROM j GROUP BY band
"""


# ---------------------------------------------------------------------------
# lineitem_discount_band_profile


def lineitem_discount_band_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per discount point (round(l_discount·100)): line count, share
    of gross revenue, average quantity, and realized revenue after
    discount — the price-ladder profile behind promo planning (q19's
    disjunctive cousin reads specific bands; this reads the whole
    ladder). Integer cents; the revenue share divides by the grand
    total riding a 1-row broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    net = F.round(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100
    ).cast("long")
    rows = li.select(
        F.round(F.col("l_discount") * 100).cast("long").alias("disc_pct"),
        cents.alias("gross_c"),
        net.alias("net_c"),
        # quantity quantized at the ROW level (centi-units, the cents
        # idiom — r8 advice): casting an aggregated double relied on
        # Spark cast-as-long (truncate) == DuckDB CAST AS BIGINT
        # (round half-even) agreeing, which holds only while the sum
        # is exactly integral and < 2^53
        F.round(F.col("l_quantity") * 100).cast("long").alias("qty_c"),
    )
    agg = rows.groupBy("disc_pct").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum("gross_c").alias("gross"),
        F.sum("net_c").alias("net"),
        F.sum("qty_c").alias("qc"),
    )
    tot = agg.agg(F.sum("gross").alias("tg"))
    return agg.crossJoin(broadcast(tot)).select(
        "disc_pct",
        F.col("n_lines").cast("long").alias("n_lines"),
        # ok-round: exact cents grid (2 dp)
        F.round(F.col("gross") / 100.0, 2).alias("gross_revenue"),
        # ok-round: exact cents grid (2 dp)
        F.round(F.col("net") / 100.0, 2).alias("net_revenue"),
        # mean of row-level centi-quantities: (Σqc·100) div n at 4 dp
        (F.expr("(qc * 100) div n_lines").cast("double") / 1e4)
        .alias("avg_qty"),
        (F.expr("(gross * 1000000) div tg").cast("double") / 1e6).alias(
            "gross_share"
        ),
    )


LINEITEM_DISCOUNT_BAND_SQL = """
WITH rows_ AS (
    SELECT CAST(round(l_discount * 100) AS BIGINT) AS disc_pct,
           CAST(round(l_extendedprice * 100) AS BIGINT) AS gross_c,
           CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)
               AS net_c,
           CAST(round(l_quantity * 100) AS BIGINT) AS qty_c
    FROM lineitem
),
agg AS (
    SELECT disc_pct, count(*) AS n_lines, sum(gross_c) AS gross,
           sum(net_c) AS net, sum(qty_c) AS qc
    FROM rows_ GROUP BY disc_pct
)
SELECT disc_pct, CAST(n_lines AS BIGINT) AS n_lines,
       -- ok-round: exact cents grid (2 dp)
       round(gross / 100.0, 2) AS gross_revenue,
       -- ok-round: exact cents grid (2 dp)
       round(net / 100.0, 2) AS net_revenue,
       CAST((qc * 100) // n_lines AS DOUBLE) / 10000.0
           AS avg_qty,
       CAST((gross * 1000000) // (SELECT sum(gross) FROM agg) AS DOUBLE)
           / 1000000.0 AS gross_share
FROM agg
"""


# ---------------------------------------------------------------------------
# part_price_band_revenue

_PPB_BAND_CENTS = 25_000  # $250 bands


def part_price_band_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog-price bands ($250) × realized lineitem revenue: how
    much selling actually happens in each price tier, with parts that
    never sold still counted in the tier census (left join). One
    partkey rollup of lineitem, a co-keyed left join from part, a
    band fold."""
    p = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    net = F.round(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100
    ).cast("long")
    per = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n_lines"), F.sum(net).alias("net_c")
    )
    pc = F.round(F.col("p_retailprice") * 100).cast("long")
    j = p.select(
        "p_partkey", F.floor(pc / _PPB_BAND_CENTS).cast("long").alias("band")
    ).join(per, p.p_partkey == per.l_partkey, "left")
    agg = j.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum(F.when(F.col("n_lines").isNull(), 1).otherwise(0)).alias("n_unsold"),
        F.sum(F.coalesce("n_lines", F.lit(0))).alias("t_lines"),
        F.sum(F.coalesce("net_c", F.lit(0))).alias("t_net"),
    )
    return agg.select(
        "band",
        # ok-round: on-grid bin-edge constant product
        F.round(F.col("band") * (_PPB_BAND_CENTS / 100.0), 2).alias("price_lo"),
        F.col("n_parts").cast("long").alias("n_parts"),
        F.col("n_unsold").cast("long").alias("n_unsold"),
        F.col("t_lines").cast("long").alias("n_lines"),
        # ok-round: exact cents grid (2 dp)
        F.round(F.col("t_net") / 100.0, 2).alias("net_revenue"),
    )


PART_PRICE_BAND_SQL = f"""
WITH per AS (
    SELECT l_partkey, count(*) AS n_lines,
           sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT))
               AS net_c
    FROM lineitem GROUP BY l_partkey
),
j AS (
    SELECT CAST(floor(CAST(round(p_retailprice * 100) AS BIGINT)
                      / {_PPB_BAND_CENTS}.0) AS BIGINT) AS band,
           per.n_lines, coalesce(per.net_c, 0) AS net_c
    FROM part LEFT JOIN per ON p_partkey = l_partkey
)
SELECT band,
       round(CAST(band AS DOUBLE) * {_PPB_BAND_CENTS / 100.0}, 2) AS price_lo,
       CAST(count(*) AS BIGINT) AS n_parts,
       CAST(count(*) FILTER (WHERE n_lines IS NULL) AS BIGINT) AS n_unsold,
       CAST(sum(coalesce(n_lines, 0)) AS BIGINT) AS n_lines,
       -- ok-round: exact cents grid (2 dp)
       round(sum(net_c) / 100.0, 2) AS net_revenue
FROM j GROUP BY band
"""


# ---------------------------------------------------------------------------
# nation_customer_supplier_balance


def nation_customer_supplier_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per nation: customer vs supplier counts and the ratio — the
    marketplace-balance census (a nation with many customers and no
    suppliers imports everything: q7/q8's why). Nations missing
    either side keep a row (left joins off the nation dimension,
    zero-filled; ratio sentinel -1 when no suppliers)."""
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    nc = c.groupBy("c_nationkey").agg(F.count(F.lit(1)).alias("n_cust"))
    ns = s.groupBy("s_nationkey").agg(F.count(F.lit(1)).alias("n_supp"))
    j = (
        n.select("n_nationkey", "n_name")
        .join(nc, n.n_nationkey == nc.c_nationkey, "left")
        .join(ns, n.n_nationkey == ns.s_nationkey, "left")
    )
    cust = F.coalesce("n_cust", F.lit(0)).cast("long")
    supp = F.coalesce("n_supp", F.lit(0)).cast("long")
    return j.select(
        F.col("n_name").alias("nation"),
        cust.alias("n_customers"),
        supp.alias("n_suppliers"),
        # exact truncating integer-division ratio (r7 conversion)
        F.when(
            supp > 0,
            F.expr(
                "(coalesce(n_cust, 0) * 10000) div coalesce(n_supp, 0)"
            ).cast("double")
            / 1e4,
        )
        .otherwise(F.lit(-1.0))
        .alias("cust_per_supp"),
    )


NATION_CUST_SUPP_SQL = """
WITH nc AS (SELECT c_nationkey, count(*) AS n_cust FROM customer GROUP BY 1),
ns AS (SELECT s_nationkey, count(*) AS n_supp FROM supplier GROUP BY 1)
SELECT n_name AS nation,
       CAST(coalesce(nc.n_cust, 0) AS BIGINT) AS n_customers,
       CAST(coalesce(ns.n_supp, 0) AS BIGINT) AS n_suppliers,
       CASE WHEN coalesce(ns.n_supp, 0) > 0
            THEN CAST((coalesce(nc.n_cust, 0) * 10000) // ns.n_supp AS DOUBLE)
                 / 10000.0
            ELSE CAST(-1.0 AS DOUBLE) END AS cust_per_supp
FROM nation n
LEFT JOIN nc ON n.n_nationkey = nc.c_nationkey
LEFT JOIN ns ON n.n_nationkey = ns.s_nationkey
"""


# ---------------------------------------------------------------------------
# supplier_revenue_consistency

_SRC_MIN_MONTHS = 6
_SRC_TOPK = 20


def supplier_revenue_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The most CONSISTENT suppliers: coefficient of variation of
    monthly shipped revenue (population σ/μ over months with any
    shipment, ≥6 months observed), top-20 lowest CV — the
    reliability screen procurement runs before concentrating volume.
    σ from the n·Σx²−(Σx)² identity over integer-cent month sums
    (Σx² in DECIMAL/HUGEINT: month sums square past BIGINT); one
    sqrt + division at the end; ties (cv, suppkey).

    100 TB shape: one (supp, month) rollup, a supplier rollup of the
    months-scale table, a top-k."""
    li = load_table(spark, sf_dir, "lineitem")
    net = F.round(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100
    ).cast("long")
    monthly = li.groupBy(
        "l_suppkey",
        (F.year("l_shipdate") * 12 + F.month("l_shipdate")).alias("m"),
    ).agg(F.sum(net).alias("c"))
    dec = F.col("c").cast("decimal(38,0)")
    stats = monthly.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("c").alias("sx"),
        F.sum(dec * dec).alias("sxx"),
    )
    kd = F.col("k").cast("double")
    mean = F.col("sx").cast("double") / kd
    var = (kd * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx")) / (kd * kd)
    cv = F.sqrt(var) / mean
    q = stats.filter((F.col("k") >= _SRC_MIN_MONTHS) & (F.col("sx") > 0)).select(
        F.col("l_suppkey").alias("suppkey"),
        F.col("k").cast("long").alias("n_months"),
        # ok-round: exact cents grid (2 dp)
        F.round(F.col("sx") / 100.0, 2).alias("total_revenue"),
        F.round(cv, 6).alias("cv"),
    )
    return q.orderBy(F.col("cv").asc(), F.col("suppkey").asc()).limit(_SRC_TOPK)


SUPPLIER_REVENUE_CONSISTENCY_SQL = f"""
WITH monthly AS (
    SELECT l_suppkey,
           year(l_shipdate) * 12 + month(l_shipdate) AS m,
           sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT))
               AS c
    FROM lineitem GROUP BY 1, 2
),
stats AS (
    SELECT l_suppkey AS suppkey, count(*) AS k, sum(c) AS sx,
           sum(CAST(c AS HUGEINT) * c) AS sxx
    FROM monthly GROUP BY l_suppkey
)
SELECT suppkey, CAST(k AS BIGINT) AS n_months,
       -- ok-round: exact cents grid (2 dp)
       round(sx / 100.0, 2) AS total_revenue,
       -- ok-round: irrational (sqrt family)
       round(sqrt((CAST(k AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * sx) / (CAST(k AS DOUBLE) * k))
             / (CAST(sx AS DOUBLE) / k), 6) AS cv
FROM stats
WHERE k >= {_SRC_MIN_MONTHS} AND sx > 0
ORDER BY cv ASC, suppkey ASC LIMIT {_SRC_TOPK}
"""


# ---------------------------------------------------------------------------
# customer_segment_nation_chi2

_CHI_TOPK = 20


def customer_segment_nation_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Independence screen for market segment × nation: each cell's
    χ² contribution (obs − exp)²/exp with exp = row·col/N — the
    top-20 most over/under-represented (segment, nation) pairs. A
    flat synthetic generator scores near zero everywhere; a real
    geo-segmented book lights up. All marginals are exact integers;
    exp and the contribution compute in double identically on both
    engines; ties (contribution desc, segment, nation)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    cell = (
        c.join(broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_mktsegment", "n_name")
        .agg(F.count(F.lit(1)).alias("obs"))
    )
    wr = Window.partitionBy("c_mktsegment")
    wc = Window.partitionBy("n_name")
    withm = cell.select(
        "c_mktsegment",
        "n_name",
        "obs",
        F.sum("obs").over(wr).alias("row_t"),
        F.sum("obs").over(wc).alias("col_t"),
        F.sum("obs").over(Window.partitionBy()).alias("n"),
    )
    # r8 conversion: expected = row·col/n is a small-integer rational
    # (the genuine .xxxx5 exposure class) — exact truncating integer
    # division at 4 dp in DECIMAL(38,0) headroom
    exp4 = F.expr(
        "(cast(row_t as decimal(38,0)) * col_t * 10000) div n"
    )
    exp = F.col("row_t").cast("double") * F.col("col_t") / F.col("n")
    contrib = (F.col("obs").cast("double") - exp) * (
        F.col("obs").cast("double") - exp
    ) / exp
    out = withm.select(
        F.col("c_mktsegment").alias("segment"),
        F.col("n_name").alias("nation"),
        F.col("obs").cast("long").alias("obs"),
        (exp4.cast("double") / 1e4).alias("expected"),
        # ok-round: documented triage KEEP — chi2_contrib is rational
        # in principle, but the exact integer form
        # (obs·n − row·col)²·10⁶ div (n·row·col) overflows
        # DECIMAL(38)/HUGEINT headroom at target scale; both engines
        # fold the identical double composite, and a boundary hit
        # requires the huge-integer ratio to BE a ≤6-decimal value
        F.round(contrib, 6).alias("chi2_contrib"),
    )
    return out.orderBy(
        F.col("chi2_contrib").desc(), F.col("segment").asc(), F.col("nation").asc()
    ).limit(_CHI_TOPK)


CUSTOMER_SEGMENT_NATION_CHI2_SQL = f"""
WITH cell AS (
    SELECT c_mktsegment AS segment, n_name AS nation, count(*) AS obs
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY 1, 2
),
m AS (
    SELECT segment, nation, obs,
           sum(obs) OVER (PARTITION BY segment) AS row_t,
           sum(obs) OVER (PARTITION BY nation) AS col_t,
           sum(obs) OVER () AS n
    FROM cell
)
SELECT segment, nation, CAST(obs AS BIGINT) AS obs,
       CAST((CAST(row_t AS HUGEINT) * col_t * 10000) // n AS DOUBLE)
           / 10000.0 AS expected,
       -- exact integer form overflows HUGEINT at target scale —
       -- ok-round: documented triage KEEP (see the Spark twin)
       round((CAST(obs AS DOUBLE) - CAST(row_t AS DOUBLE) * col_t / n)
             * (CAST(obs AS DOUBLE) - CAST(row_t AS DOUBLE) * col_t / n)
             / (CAST(row_t AS DOUBLE) * col_t / n), 6) AS chi2_contrib
FROM m
ORDER BY chi2_contrib DESC, segment ASC, nation ASC LIMIT {_CHI_TOPK}
"""


# ---------------------------------------------------------------------------
# orders_interpurchase_gaps


def orders_interpurchase_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Days between a customer's consecutive orders, summarized per
    market segment (exact p50/p90 by the percentile_disc rank idiom
    + mean) — the repurchase-cadence input to CRM cadence and churn
    thresholds. Gaps order by (o_orderdate, o_orderkey) per customer;
    date subtraction is calendar-day exact in both engines.

    100 TB shape: one custkey-keyed lag window (per-customer
    sequences are short), a segment-keyed rank window over the
    gap-scale table, a 5-row fold."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    wu = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = o.select(
        "o_custkey",
        F.datediff(
            F.col("o_orderdate"), F.lag("o_orderdate").over(wu)
        ).alias("gap"),
    ).filter(F.col("gap").isNotNull())
    seg = gaps.join(
        c.select("c_custkey", "c_mktsegment"), gaps.o_custkey == c.c_custkey
    ).select(F.col("c_mktsegment").alias("segment"), F.col("gap").cast("long"))
    w = Window.partitionBy("segment").orderBy("gap")
    ranked = seg.select(
        "segment",
        "gap",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("segment")).alias("n"),
    )
    pick = lambda p: F.max(  # noqa: E731
        F.when(F.col("rn") == F.ceil(F.col("n") * p), F.col("gap"))
    )
    return ranked.groupBy("segment").agg(
        F.max("n").cast("long").alias("n_gaps"),
        # exact truncating integer-division mean (r7 conversion)
        (F.expr("(sum(gap) * 10000) div max(n)").cast("double") / 1e4).alias(
            "mean_days"
        ),
        pick(0.5).cast("long").alias("p50_days"),
        pick(0.9).cast("long").alias("p90_days"),
    )


ORDERS_INTERPURCHASE_SQL = """
WITH gaps AS (
    SELECT o_custkey,
           date_diff('day',
                     lag(o_orderdate) OVER (PARTITION BY o_custkey
                                            ORDER BY o_orderdate, o_orderkey),
                     o_orderdate) AS gap
    FROM orders
),
seg AS (
    SELECT c_mktsegment AS segment, CAST(gap AS BIGINT) AS gap
    FROM gaps JOIN customer ON o_custkey = c_custkey
    WHERE gap IS NOT NULL
)
SELECT segment, CAST(count(*) AS BIGINT) AS n_gaps,
       CAST((sum(gap) * 10000) // count(*) AS DOUBLE) / 10000.0 AS mean_days,
       CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY gap) AS BIGINT)
           AS p50_days,
       CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY gap) AS BIGINT)
           AS p90_days
FROM seg GROUP BY segment
"""


# ---------------------------------------------------------------------------
# lineitem_returned_share_trend


def lineitem_returned_share_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-revenue share per ship year: the quality-of-business
    trend line (q10 finds WHO returned; this tracks HOW MUCH, over
    time). Integer cents; two sums per year, one division."""
    li = load_table(spark, sf_dir, "lineitem")
    net = F.round(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100
    ).cast("long")
    rows = li.select(
        F.year("l_shipdate").cast("long").alias("year"),
        net.alias("c"),
        (F.col("l_returnflag") == "R").cast("long").alias("is_r"),
    )
    agg = rows.groupBy("year").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum("c").alias("tot"),
        F.sum(F.col("c") * F.col("is_r")).alias("ret"),
    )
    return agg.select(
        "year",
        F.col("n_lines").cast("long").alias("n_lines"),
        # ok-round: exact cents grid (2 dp)
        F.round(F.col("tot") / 100.0, 2).alias("revenue"),
        # ok-round: exact cents grid (2 dp)
        F.round(F.col("ret") / 100.0, 2).alias("returned_revenue"),
        # exact truncating integer-division share (r7 conversion)
        (F.expr("(ret * 1000000) div tot").cast("double") / 1e6).alias(
            "returned_share"
        ),
    )


LINEITEM_RETURNED_TREND_SQL = """
WITH rows_ AS (
    SELECT CAST(year(l_shipdate) AS BIGINT) AS year,
           CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT) AS c,
           CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS is_r
    FROM lineitem
)
SELECT year, CAST(count(*) AS BIGINT) AS n_lines,
       -- ok-round: exact cents grid (2 dp)
       round(sum(c) / 100.0, 2) AS revenue,
       -- ok-round: exact cents grid (2 dp)
       round(sum(c * is_r) / 100.0, 2) AS returned_revenue,
       CAST((sum(c * is_r) * 1000000) // sum(c) AS DOUBLE) / 1000000.0
           AS returned_share
FROM rows_ GROUP BY year
"""


QUERIES = {
    "customer_balance_band_behavior": customer_balance_band_behavior,
    "lineitem_discount_band_profile": lineitem_discount_band_profile,
    "part_price_band_revenue": part_price_band_revenue,
    "nation_customer_supplier_balance": nation_customer_supplier_balance,
    "supplier_revenue_consistency": supplier_revenue_consistency,
    "customer_segment_nation_chi2": customer_segment_nation_chi2,
    "orders_interpurchase_gaps": orders_interpurchase_gaps,
    "lineitem_returned_share_trend": lineitem_returned_share_trend,
}

ORACLES = {
    "customer_balance_band_behavior": CUSTOMER_BALANCE_BAND_SQL,
    "lineitem_discount_band_profile": LINEITEM_DISCOUNT_BAND_SQL,
    "part_price_band_revenue": PART_PRICE_BAND_SQL,
    "nation_customer_supplier_balance": NATION_CUST_SUPP_SQL,
    "supplier_revenue_consistency": SUPPLIER_REVENUE_CONSISTENCY_SQL,
    "customer_segment_nation_chi2": CUSTOMER_SEGMENT_NATION_CHI2_SQL,
    "orders_interpurchase_gaps": ORDERS_INTERPURCHASE_SQL,
    "lineitem_returned_share_trend": LINEITEM_RETURNED_TREND_SQL,
}
