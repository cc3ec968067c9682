"""Round-6 batch II: business-analytics tail — grouped-Lorenz Gini
(the scale-path twin of the exact auditor), concentration and
dispersion screens, exact quartile tables, seasonality.

Same contract as the other ``llm_ops*`` modules: declarative
DataFrame plans (JVM expressions only) with DuckDB oracles mirroring
the exact arithmetic, so value hashes match without tolerances.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from distributed_file_system_with_stream_processing_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# customer_revenue_gini_binned

_GB_BIN_CENTS = 10_000  # $100-wide revenue bins


def customer_revenue_gini_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini concentration from a FIXED-WIDTH integer-cents histogram
    (trapezoid Lorenz estimate over $100 bins) — the scale-path twin
    of ``customer_revenue_gini``'s exact global-rank auditor (r5
    verdict item 7: the GK-vs-percentile_disc stance applied to
    concentration). The exact Gini needs a single-partition sort of
    every customer; this needs only a bin-keyed rollup (≤ max_rev/
    $100 rows) and a window over the tiny histogram, so it
    distributes at any corpus size. Error vs the exact auditor is
    bounded by the within-bin spread and pinned in tests.

    Exactness (of the estimate itself — both engines bit-agree): bin
    ids and per-bin (n, Σcents) are exact integers; the trapezoid sum
    Σ Δpop·(L_i + L_{i-1}) folds per-bin products of exact integers
    in DECIMAL(38,0) ↔ HUGEINT scaled by the integer grand totals,
    dividing once at the end; 6 dp.

    100 TB shape: one custkey partial-agg shuffle, a bin rollup, a
    window over ≤10⁴ histogram rows — no global row-level sort.
    """
    o = load_table(spark, sf_dir, "orders")
    per = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents")
    )
    hist = (
        per.groupBy((F.col("cents") / _GB_BIN_CENTS).cast("long").alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s"))
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    cum = hist.select(
        "bin",
        "n",
        "s",
        F.sum("n").over(w).alias("cn"),
        F.sum("s").over(w).alias("cs"),
    )
    # trapezoid: G = 1 - Σ n_i·(cs_i + cs_{i-1}) / (N·S); every product
    # is exact integers, one double division at the end
    term = dec("n") * (F.lit(2) * dec("cs") - dec("s"))
    tot = cum.agg(
        F.max("cn").alias("n_customers"),
        F.max("cs").alias("total_cents"),
        F.sum(term).alias("lorenz"),
        F.count(F.lit(1)).alias("n_bins"),
    )
    # r8 conversion: gini = (N·S − lorenz)/(N·S) is an exact rational
    # — truncating integer division at 6 dp in DECIMAL(38,0)
    gini_mu = F.expr(
        "((cast(n_customers as decimal(38,0)) * total_cents - lorenz)"
        " * 1000000) div (cast(n_customers as decimal(38,0)) * total_cents)"
    )
    return tot.select(
        F.col("n_customers").cast("long").alias("n_customers"),
        F.col("n_bins").cast("long").alias("n_bins"),
        # ok-round: exact cents grid (2 dp)
        F.round(F.col("total_cents") / 100.0, 2).alias("total_revenue"),
        (gini_mu.cast("double") / 1e6).alias("gini_binned"),
    )


CUSTOMER_GINI_BINNED_SQL = f"""
WITH per AS (
    SELECT o_custkey,
           sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
    FROM orders GROUP BY o_custkey
),
hist AS (
    SELECT cents // {_GB_BIN_CENTS} AS bin, count(*) AS n, sum(cents) AS s
    FROM per GROUP BY 1
),
cum AS (
    SELECT bin, n, s,
           sum(n) OVER (ORDER BY bin) AS cn,
           sum(s) OVER (ORDER BY bin) AS cs
    FROM hist
),
tot AS (
    SELECT max(cn) AS n_customers, max(cs) AS total_cents,
           sum(CAST(n AS HUGEINT) * (2 * CAST(cs AS HUGEINT) - s)) AS lorenz,
           count(*) AS n_bins
    FROM cum
)
SELECT CAST(n_customers AS BIGINT) AS n_customers,
       CAST(n_bins AS BIGINT) AS n_bins,
       -- ok-round: exact cents grid (2 dp)
       round(total_cents / 100.0, 2) AS total_revenue,
       CAST(((CAST(n_customers AS HUGEINT) * total_cents - lorenz) * 1000000)
            // (CAST(n_customers AS HUGEINT) * total_cents) AS DOUBLE)
           / 1000000.0
           AS gini_binned
FROM tot
"""


# ---------------------------------------------------------------------------
# supplier_part_concentration


def supplier_part_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile histogram of per-part supplier concentration (HHI over
    each part's shipped-quantity shares) — the portfolio view behind
    ``supplier_single_source_parts``: that query counts sole-source
    parts, this one shows how concentrated the REST are (HHI 1.0 =
    sole source, 1/k = evenly split across k suppliers).

    Exactness: quantities quantize to integer units once; HHI =
    Σq_s² / (Σq_s)² evaluates per part from exact integer sums in one
    fixed double sequence, so the decile floor sees bit-identical
    doubles in both engines; decile = least(floor(hhi·10), 9).

    100 TB shape: one (part, supp) partial-agg shuffle, a part rollup
    that reuses the partitioning (same leading key), a 10-row
    histogram.
    """
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.round(F.col("l_quantity")).cast("long")
    ps = (
        li.select("l_partkey", "l_suppkey", qty.alias("q"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("q").alias("qs"))
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    per = ps.groupBy("l_partkey").agg(
        F.sum("qs").alias("tq"),
        F.sum(dec("qs") * dec("qs")).alias("sq2"),
    )
    hhi = F.col("sq2").cast("double") / (dec("tq") * dec("tq")).cast("double")
    decile = F.least(F.floor(hhi * 10), F.lit(9))
    return (
        per.filter(F.col("tq") > 0)
        .select(decile.cast("long").alias("hhi_decile"))
        .groupBy("hhi_decile")
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )


SUPPLIER_PART_CONC_SQL = """
WITH ps AS (
    SELECT l_partkey, l_suppkey,
           sum(CAST(round(l_quantity) AS BIGINT)) AS qs
    FROM lineitem GROUP BY l_partkey, l_suppkey
),
per AS (
    SELECT l_partkey, sum(qs) AS tq,
           sum(CAST(qs AS HUGEINT) * qs) AS sq2
    FROM ps GROUP BY l_partkey
)
SELECT CAST(least(CAST(floor(CAST(sq2 AS DOUBLE)
                              / CAST(CAST(tq AS HUGEINT) * tq AS DOUBLE) * 10)
                       AS BIGINT), 9) AS BIGINT) AS hhi_decile,
       CAST(count(*) AS BIGINT) AS n_parts
FROM per WHERE tq > 0 GROUP BY 1
"""


# ---------------------------------------------------------------------------
# part_brand_price_dispersion


def part_brand_price_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand retail-price dispersion: count, mean price and the
    coefficient of variation — the pricing-discipline screen (a brand
    whose CV explodes prices inconsistently across its catalog).

    Exactness: integer cents; (n, Σc, Σc²) fold exactly
    (DECIMAL(38,0) ↔ HUGEINT); CV = √(n·Σc²/(Σc)² − 1) evaluates once
    from exact integers, zero-variance (and zero-mean) pinned to 0.0.

    100 TB shape: one brand-keyed partial-agg shuffle over the part
    table; output is |brands| rows.
    """
    p = load_table(spark, sf_dir, "part")
    cents = F.round(F.col("p_retailprice") * 100).cast("long")
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    per = p.select("p_brand", cents.alias("c")).groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("sc"),
        F.sum(dec("c") * dec("c")).alias("scc"),
    )
    cv2 = (dec("n") * F.col("scc")).cast("double") / (
        dec("sc") * dec("sc")
    ).cast("double") - 1.0
    return per.select(
        "p_brand",
        F.col("n").cast("long").alias("n_parts"),
        # r8 conversion: exact truncating integer-division mean cents
        (F.expr("sc div n").cast("double") / 100.0).alias("avg_price"),
        # ok-round: irrational (sqrt family)
        F.when(F.col("sc") > 0, F.round(F.sqrt(F.greatest(cv2, F.lit(0.0))), 6))
        .otherwise(F.lit(0.0))
        .alias("price_cv"),
    )


PART_BRAND_DISPERSION_SQL = """
WITH per AS (
    SELECT p_brand, count(*) AS n,
           sum(CAST(round(p_retailprice * 100) AS BIGINT)) AS sc,
           sum(CAST(CAST(round(p_retailprice * 100) AS BIGINT) AS HUGEINT)
               * CAST(round(p_retailprice * 100) AS BIGINT)) AS scc
    FROM part GROUP BY p_brand
)
SELECT p_brand,
       CAST(n AS BIGINT) AS n_parts,
       CAST(sc // n AS DOUBLE) / 100.0 AS avg_price,
       CASE WHEN sc > 0
            THEN -- ok-round: irrational (sqrt family)
       round(sqrt(greatest(
                     CAST(CAST(n AS HUGEINT) * scc AS DOUBLE)
                     / CAST(CAST(sc AS HUGEINT) * sc AS DOUBLE) - 1.0, 0.0)), 6)
            ELSE CAST(0.0 AS DOUBLE) END AS price_cv
FROM per
"""


# ---------------------------------------------------------------------------
# customer_mktsegment_value_gap


def customer_mktsegment_value_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per market segment: customer count, revenue, revenue per
    customer, and the gap vs the all-segments mean — the
    segment-level LTV readout (which segments over/under-index).

    Exactness: revenue is exact integer cents aggregated per segment;
    the overall mean derives from WINDOW sums over the |segments|-row
    table (no second pass, no 1-row broadcast), and both per-customer
    averages divide once at 2 dp.

    100 TB shape: orders roll up by custkey, join the (broadcastable)
    customer dim for the segment, one segment rollup, then window
    math over ≤|segments| rows.
    """
    from pyspark.sql.functions import broadcast

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    per_cust = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents")
    )
    seg = (
        per_cust.join(broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s"))
    )
    w = Window.partitionBy()
    # r8 conversion: mean cents are exact truncating integer-division
    # quotients; the gap is their exact integer difference
    seg_mu = F.expr("s div n")
    return seg.withColumn("ts", F.sum("s").over(w)).withColumn(
        "tn", F.sum("n").over(w)
    ).select(
        "c_mktsegment",
        F.col("n").cast("long").alias("n_customers"),
        # ok-round: exact cents grid (2 dp)
        F.round(F.col("s") / 100.0, 2).alias("revenue"),
        (seg_mu.cast("double") / 100.0).alias("avg_per_customer"),
        (
            (seg_mu - F.expr("ts div tn")).cast("double") / 100.0
        ).alias("gap_vs_mean"),
    )


CUSTOMER_SEGMENT_GAP_SQL = """
WITH per AS (
    SELECT o_custkey,
           sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
    FROM orders GROUP BY o_custkey
),
seg AS (
    SELECT c_mktsegment, count(*) AS n, sum(cents) AS s
    FROM per JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
)
SELECT c_mktsegment,
       CAST(n AS BIGINT) AS n_customers,
       -- ok-round: exact cents grid (2 dp)
       round(s / 100.0, 2) AS revenue,
       CAST(s // n AS DOUBLE) / 100.0 AS avg_per_customer,
       CAST(s // n - sum(s) OVER () // sum(n) OVER () AS DOUBLE) / 100.0
           AS gap_vs_mean
FROM seg
"""


# ---------------------------------------------------------------------------
# supplier_acctbal_quartiles


def supplier_acctbal_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact account-balance quartiles (percentile_disc p25/p50/p75)
    per supplier nation — the credit-exposure sizing table, the
    percentile_disc family's supplier-side member next to
    docs_token_percentiles_by_lang.

    Exactness: integer cents; percentile_disc = the value at rank
    ceil(p·n) in (cents, suppkey) order — rank ties on equal cents
    return the same VALUE whatever the permutation.

    100 TB shape: one nationkey shuffle shared by the rank window and
    the rollup; the per-nation sort is the exact-auditor cost
    (percentile_disc stance), |nations| bounded output.
    """
    from pyspark.sql.functions import broadcast

    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cents = F.round(F.col("s_acctbal") * 100).cast("long")
    base = s.join(broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")).select(
        "n_name", cents.alias("c"), "s_suppkey"
    )
    w = Window.partitionBy("n_name").orderBy("c", "s_suppkey")
    ranked = base.select(
        "n_name",
        "c",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("n_name")).alias("cnt"),
    )
    pick = lambda p: F.max(  # noqa: E731
        F.when(F.col("rn") == F.ceil(F.col("cnt") * p), F.col("c"))
    )
    return ranked.groupBy("n_name").agg(
        F.max("cnt").cast("long").alias("n_suppliers"),
        # ok-round: exact cents grid (2 dp)
        F.round(pick(0.25) / 100.0, 2).alias("q1"),
        # ok-round: exact cents grid (2 dp)
        F.round(pick(0.5) / 100.0, 2).alias("median"),
        # ok-round: exact cents grid (2 dp)
        F.round(pick(0.75) / 100.0, 2).alias("q3"),
    )


SUPPLIER_ACCTBAL_QUARTILES_SQL = """
WITH base AS (
    SELECT n_name, CAST(round(s_acctbal * 100) AS BIGINT) AS c
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
)
SELECT n_name,
       CAST(count(*) AS BIGINT) AS n_suppliers,
       -- ok-round: exact cents grid (2 dp)
       round(percentile_disc(0.25) WITHIN GROUP (ORDER BY c) / 100.0, 2) AS q1,
       -- ok-round: exact cents grid (2 dp)
       round(percentile_disc(0.5) WITHIN GROUP (ORDER BY c) / 100.0, 2) AS median,
       -- ok-round: exact cents grid (2 dp)
       round(percentile_disc(0.75) WITHIN GROUP (ORDER BY c) / 100.0, 2) AS q3
FROM base GROUP BY n_name
"""


# ---------------------------------------------------------------------------
# orders_weekday_seasonality


def orders_weekday_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order volume by weekday with each day's deviation from the
    uniform 1/7 share — the calendar-seasonality screen (synthetic
    order streams are flat; real retail dips weekends).

    Exactness: weekday is tz-free integer arithmetic —
    (epoch_days + 3) % 7 with 0 = Monday (1970-01-01 was a Thursday,
    day index 3) — never a locale-dependent date function; counts are
    exact integers, shares and deviations divide once at 6 dp. The
    session tz pins to UTC so the NTZ→epoch cast is value-preserving
    under a hostile driver zone (the orders_monthly_growth stance).

    100 TB shape: a narrow map + a 7-row rollup; the total rides a
    window over the 7-row histogram.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    o = load_table(spark, sf_dir, "orders")
    day = (F.col("o_orderdate").cast("timestamp").cast("long") / 86400).cast("long")
    dow = (day + 3) % 7
    hist = (
        o.select(dow.alias("weekday"))
        .groupBy("weekday")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    total = F.sum("n_orders").over(Window.partitionBy())
    # r8 conversion: share = n/t and dev = (7n − t)/(7t) are exact
    # rationals — truncating integer division at 6 dp (signed: div
    # truncates toward zero in both engines)
    return hist.withColumn("t", total).select(
        F.col("weekday").cast("long").alias("weekday"),
        "n_orders",
        (F.expr("(n_orders * 1000000) div t").cast("double") / 1e6).alias(
            "share"
        ),
        (
            F.expr("((7 * n_orders - t) * 1000000) div (7 * t)")
            .cast("double") / 1e6
        ).alias("dev_from_uniform"),
    )


ORDERS_WEEKDAY_SQL = """
WITH h AS (
    SELECT (epoch_us(o_orderdate) // 1000000 // 86400 + 3) % 7 AS weekday,
           count(*) AS n_orders
    FROM orders GROUP BY 1
)
SELECT CAST(weekday AS BIGINT) AS weekday,
       CAST(n_orders AS BIGINT) AS n_orders,
       CAST((n_orders * 1000000) // sum(n_orders) OVER () AS DOUBLE)
           / 1000000.0 AS share,
       CAST(((7 * n_orders - sum(n_orders) OVER ()) * 1000000)
            // (7 * sum(n_orders) OVER ()) AS DOUBLE) / 1000000.0
           AS dev_from_uniform
FROM h
"""


# ---------------------------------------------------------------------------
# nation_trade_balance


def nation_trade_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation trade balance: revenue earned by the nation's
    SUPPLIERS (discounted lineitem revenue) vs spend by the nation's
    CUSTOMERS (order totals), and the net — the q5/q7 family's
    symmetric summary (who ships value vs who buys it).

    Exactness: both sides quantize to integer cents per row and fold
    exactly; the join of the two nation-keyed tables is outer with
    0-coalesce so one-sided nations never NULL; net is an integer
    subtraction lowered to dollars once.

    100 TB shape: lineitem rolls up via a broadcast supplier-dim join
    (nationkey partial agg); orders via a broadcast customer-dim
    join; the final full-outer join is |nations| × |nations| —
    metadata scale.
    """
    from pyspark.sql.functions import broadcast

    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev_cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    exports = (
        li.join(broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.sum(rev_cents).alias("export_cents"))
    )
    spend_cents = F.round(F.col("o_totalprice") * 100).cast("long")
    imports = (
        o.join(broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.sum(spend_cents).alias("import_cents"))
    )
    both = exports.join(imports, "nk", "full_outer").select(
        "nk",
        F.coalesce("export_cents", F.lit(0)).alias("e"),
        F.coalesce("import_cents", F.lit(0)).alias("i"),
    )
    return both.join(broadcast(n), F.col("nk") == F.col("n_nationkey")).select(
        "n_name",
        # ok-round: exact cents grid (2 dp)
        F.round(F.col("e") / 100.0, 2).alias("export_revenue"),
        # ok-round: exact cents grid (2 dp)
        F.round(F.col("i") / 100.0, 2).alias("import_spend"),
        # ok-round: exact cents grid (2 dp)
        F.round((F.col("e") - F.col("i")) / 100.0, 2).alias("net_balance"),
    )


NATION_TRADE_BALANCE_SQL = """
WITH exports AS (
    SELECT s_nationkey AS nk,
           sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
               AS e
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_nationkey
),
imports AS (
    SELECT c_nationkey AS nk,
           sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS i
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_nationkey
),
bal AS (
    SELECT coalesce(exports.nk, imports.nk) AS nk,
           coalesce(e, 0) AS e, coalesce(i, 0) AS i
    FROM exports FULL OUTER JOIN imports USING (nk)
)
SELECT n_name,
       -- ok-round: exact cents grid (2 dp)
       round(e / 100.0, 2) AS export_revenue,
       -- ok-round: exact cents grid (2 dp)
       round(i / 100.0, 2) AS import_spend,
       -- ok-round: exact cents grid (2 dp)
       round((e - i) / 100.0, 2) AS net_balance
FROM bal JOIN nation ON nk = n_nationkey
"""


QUERIES = {
    "customer_revenue_gini_binned": customer_revenue_gini_binned,
    "supplier_part_concentration": supplier_part_concentration,
    "part_brand_price_dispersion": part_brand_price_dispersion,
    "customer_mktsegment_value_gap": customer_mktsegment_value_gap,
    "supplier_acctbal_quartiles": supplier_acctbal_quartiles,
    "orders_weekday_seasonality": orders_weekday_seasonality,
    "nation_trade_balance": nation_trade_balance,
}

ORACLES = {
    "customer_revenue_gini_binned": CUSTOMER_GINI_BINNED_SQL,
    "supplier_part_concentration": SUPPLIER_PART_CONC_SQL,
    "part_brand_price_dispersion": PART_BRAND_DISPERSION_SQL,
    "customer_mktsegment_value_gap": CUSTOMER_SEGMENT_GAP_SQL,
    "supplier_acctbal_quartiles": SUPPLIER_ACCTBAL_QUARTILES_SQL,
    "orders_weekday_seasonality": ORDERS_WEEKDAY_SQL,
    "nation_trade_balance": NATION_TRADE_BALANCE_SQL,
}
