"""Round-7 batch V: basket/price-ladder profiles, share trends,
burst runs, catalog lexicon, and two split/dedup QA screens.

Same contract as the other ``llm_ops*`` modules: declarative DataFrame
plans (JVM expressions only) with DuckDB oracles mirroring the exact
arithmetic (integer cents, micro-quantized ratios, BIGINT folds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from distributed_file_system_with_stream_processing_spark.functions import text as T
from distributed_file_system_with_stream_processing_spark.plans.llm_ops import _WS
from distributed_file_system_with_stream_processing_spark.operators._util import spread
from distributed_file_system_with_stream_processing_spark.sources.tables import load_table

_MICRO = 1_000_000

# ---------------------------------------------------------------------------
# orders_basket_size_profile


def orders_basket_size_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Basket-size census: orders bucketed by their LINE COUNT, with
    each bucket's share and mean header value — the order-shape
    profile capacity planning and pricing read together (do big
    baskets carry the revenue?). Line-less headers land in bucket 0
    via the left join. One l_orderkey rollup + a co-keyed join + a
    ≤|sizes| fold.

    Exactness (r7 conversion): share and mean value are exact
    TRUNCATING integer-division quotients — Spark ``div`` ≡ DuckDB
    ``//``, both truncate TOWARD ZERO (not floor: they differ from a
    flooring engine at (-7, 2)) — ((n·10⁶) div t, tc div n — exact BIGINT
    arithmetic; tc is cents so tc div n is mean cents), never rounded
    double quotients: Spark's BigDecimal HALF_UP and DuckDB's double
    round diverge on exact .xxxx5 quotients, integer division cannot
    (div ≡ // cross-engine incl. signs, tests/test_oracle_types.py)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    per = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n_lines"))
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    j = o.select("o_orderkey", cents.alias("c")).join(
        per, o.o_orderkey == per.l_orderkey, "left"
    )
    agg = j.groupBy(
        F.coalesce("n_lines", F.lit(0)).cast("long").alias("basket_size")
    ).agg(F.count(F.lit(1)).alias("n_orders"), F.sum("c").alias("tc"))
    tot = agg.agg(F.sum("n_orders").alias("t"))
    return agg.crossJoin(broadcast(tot)).select(
        "basket_size",
        F.col("n_orders").cast("long").alias("n_orders"),
        (F.expr("(n_orders * 1000000) div t").cast("double") / 1e6).alias("share"),
        (F.expr("tc div n_orders").cast("double") / 100.0).alias(
            "avg_order_value"
        ),
    )


ORDERS_BASKET_SIZE_SQL = """
WITH per AS (SELECT l_orderkey, count(*) AS n_lines FROM lineitem GROUP BY 1),
j AS (
    SELECT coalesce(p.n_lines, 0) AS basket_size,
           CAST(round(o_totalprice * 100) AS BIGINT) AS c
    FROM orders o LEFT JOIN per p ON o.o_orderkey = p.l_orderkey
),
agg AS (
    SELECT basket_size, count(*) AS n_orders, sum(c) AS tc
    FROM j GROUP BY basket_size
)
SELECT CAST(basket_size AS BIGINT) AS basket_size,
       CAST(n_orders AS BIGINT) AS n_orders,
       CAST((n_orders * 1000000) // (SELECT sum(n_orders) FROM agg) AS DOUBLE)
           / 1000000.0 AS share,
       CAST(tc // n_orders AS DOUBLE) / 100.0 AS avg_order_value
FROM agg
"""


# ---------------------------------------------------------------------------
# nation_revenue_share_trend


def nation_revenue_share_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (order year, customer nation): revenue and the nation's
    share of that year — the geographic mix-shift trend (q5/q7 score
    single years; this is the whole drift matrix). One orders×customer
    co-keyed join, a (year, nation) rollup, year shares via a window
    over the tiny matrix."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    j = (
        o.select("o_custkey", F.year("o_orderdate").alias("year"), cents.alias("c"))
        .join(c.select("c_custkey", "c_nationkey"), o.o_custkey == c.c_custkey)
        .join(broadcast(n.select("n_nationkey", "n_name")),
              F.col("c_nationkey") == F.col("n_nationkey"))
    )
    cell = j.groupBy("year", F.col("n_name").alias("nation")).agg(
        F.sum("c").alias("tc")
    )
    yr = F.sum("tc").over(Window.partitionBy("year"))
    # share is an exact truncating integer-division quotient (see the
    # basket-profile docstring); revenue cents/100.0 at 2 dp is exact
    # already (the true value HAS 2 decimals) and stays a round()
    return cell.withColumn("yt", yr).select(
        F.col("year").cast("long").alias("year"),
        "nation",
        # ok-round: exact cents grid (2 dp)
        F.round(F.col("tc") / 100.0, 2).alias("revenue"),
        (F.expr("(tc * 1000000) div yt").cast("double") / 1e6).alias(
            "share_of_year"
        ),
    )


NATION_REVENUE_SHARE_TREND_SQL = """
WITH cell AS (
    SELECT CAST(year(o_orderdate) AS BIGINT) AS year, n_name AS nation,
           sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS tc
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY 1, 2
)
SELECT year, nation,
       -- ok-round: exact cents grid (2 dp)
       round(tc / 100.0, 2) AS revenue,
       CAST((tc * 1000000) // sum(tc) OVER (PARTITION BY year) AS DOUBLE)
           / 1000000.0 AS share_of_year
FROM cell
"""


# ---------------------------------------------------------------------------
# events_hour_type_value_interaction


def events_hour_type_value_interaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day × type mean value, reported as the DEVIATION from
    the type's own all-day mean — the interaction screen that says
    whether value seasonality is real or just volume seasonality.
    Integer-cents sums; the type mean rides a broadcast.

    Exactness: means are TRUNCATING integer-division integers at 4 dp
    ((s·100) div n — exact BIGINT arithmetic; s is cents, so
    s·100/n = dollars·10⁴), never a rounded double quotient: Spark's
    BigDecimal HALF_UP and DuckDB's double round diverge on exact
    .xxxx5 quotients (hit once at sf0.001), while integer division
    cannot. The deviation is a difference of those integers."""
    e = load_table(spark, sf_dir, "events")
    sec = F.col("ts").cast("long")
    cents = F.round(F.col("value") * 100).cast("long")
    base = e.select(
        "event_type",
        ((sec % 86400) / 3600).cast("long").alias("hour"),
        cents.alias("c"),
    )
    cell = base.groupBy("event_type", "hour").agg(
        F.count(F.lit(1)).alias("n"), F.sum("c").alias("s")
    )
    tmean = base.groupBy("event_type").agg(
        F.expr("(sum(c) * 100) div count(1)").alias("tm4")
    )
    mean4 = F.expr("(s * 100) div n")
    return cell.join(broadcast(tmean), "event_type").select(
        "event_type",
        "hour",
        F.col("n").cast("long").alias("n_events"),
        (mean4.cast("double") / 10000.0).alias("mean_value"),
        ((mean4 - F.col("tm4")).cast("double") / 10000.0).alias(
            "dev_from_type_mean"
        ),
    )


EVENTS_HOUR_TYPE_VALUE_SQL = """
WITH base AS (
    SELECT event_type,
           (epoch_us(ts) // 1000000 % 86400) // 3600 AS hour,
           CAST(round(value * 100) AS BIGINT) AS c
    FROM events
),
cell AS (
    SELECT event_type, hour, count(*) AS n, sum(c) AS s
    FROM base GROUP BY event_type, hour
),
tmean AS (
    SELECT event_type, (sum(c) * 100) // count(*) AS tm4
    FROM base GROUP BY event_type
)
SELECT cell.event_type, CAST(hour AS BIGINT) AS hour,
       CAST(n AS BIGINT) AS n_events,
       CAST((s * 100) // n AS DOUBLE) / 10000.0 AS mean_value,
       CAST((s * 100) // n - tm4 AS DOUBLE) / 10000.0 AS dev_from_type_mean
FROM cell JOIN tmean USING (event_type)
"""


# ---------------------------------------------------------------------------
# events_error_burst_lengths


def events_error_burst_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run-length histogram of CONSECUTIVE error events per user —
    the classic gaps-and-islands: an island is a maximal run of
    'error' in the user's (ts, event_id)-ordered stream, identified
    by the rank-difference trick (rn_all − rn_error is constant
    within a run). Long bursts mean stuck clients/retry storms; the
    histogram sizes the retry-budget discussion. Exact integers
    end-to-end.

    100 TB shape: two user-keyed windows on the same partitioning,
    a (user, island) rollup, a ≤|lengths| fold."""
    e = load_table(spark, sf_dir, "events")
    sec = F.col("ts").cast("long")
    wu = Window.partitionBy("user_id").orderBy("sec", "event_id")
    base = e.select(
        "user_id", "event_type", sec.alias("sec"), "event_id"
    ).withColumn("rn", F.row_number().over(wu))
    err = base.filter(F.col("event_type") == "error")
    we = Window.partitionBy("user_id").orderBy("rn")
    runs = err.withColumn("grp", F.col("rn") - F.row_number().over(we))
    lens = runs.groupBy("user_id", "grp").agg(F.count(F.lit(1)).alias("run_len"))
    return (
        lens.groupBy(F.col("run_len").cast("long").alias("run_len"))
        .agg(F.count(F.lit(1)).alias("n_runs"))
        .select("run_len", F.col("n_runs").cast("long").alias("n_runs"))
    )


EVENTS_ERROR_BURST_SQL = """
WITH base AS (
    SELECT user_id, event_type,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY epoch_us(ts) // 1000000, event_id) AS rn
    FROM events
),
err AS (
    SELECT user_id, rn,
           rn - row_number() OVER (PARTITION BY user_id ORDER BY rn) AS grp
    FROM base WHERE event_type = 'error'
),
lens AS (
    SELECT user_id, grp, count(*) AS run_len FROM err GROUP BY user_id, grp
)
SELECT CAST(run_len AS BIGINT) AS run_len,
       CAST(count(*) AS BIGINT) AS n_runs
FROM lens GROUP BY run_len
"""


# ---------------------------------------------------------------------------
# lineitem_tax_band_profile


def lineitem_tax_band_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tax ladder: per tax point, line count, taxed revenue and
    effective tax take — the fiscal complement of the discount
    ladder (same shape, the charged side). Integer cents; tax take =
    Σ round(price·(1−disc)·tax·100)."""
    li = load_table(spark, sf_dir, "lineitem")
    net = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    net_c = F.round(net * 100).cast("long")
    tax_c = F.round(net * F.col("l_tax") * 100).cast("long")
    rows = li.select(
        F.round(F.col("l_tax") * 100).cast("long").alias("tax_pct"),
        net_c.alias("net_c"),
        tax_c.alias("tax_c"),
    )
    agg = rows.groupBy("tax_pct").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum("net_c").alias("net"),
        F.sum("tax_c").alias("tax"),
    )
    return agg.select(
        "tax_pct",
        F.col("n_lines").cast("long").alias("n_lines"),
        # ok-round: exact cents grid (2 dp)
        F.round(F.col("net") / 100.0, 2).alias("net_revenue"),
        # ok-round: exact cents grid (2 dp)
        F.round(F.col("tax") / 100.0, 2).alias("tax_take"),
        # exact truncating integer-division quotient (see basket profile)
        (F.expr("(tax * 1000000) div net").cast("double") / 1e6).alias(
            "effective_rate"
        ),
    )


LINEITEM_TAX_BAND_SQL = """
WITH rows_ AS (
    SELECT CAST(round(l_tax * 100) AS BIGINT) AS tax_pct,
           CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)
               AS net_c,
           CAST(round(l_extendedprice * (1.0 - l_discount) * l_tax * 100)
                AS BIGINT) AS tax_c
    FROM lineitem
)
SELECT tax_pct, CAST(count(*) AS BIGINT) AS n_lines,
       -- ok-round: exact cents grid (2 dp)
       round(sum(net_c) / 100.0, 2) AS net_revenue,
       -- ok-round: exact cents grid (2 dp)
       round(sum(tax_c) / 100.0, 2) AS tax_take,
       CAST((sum(tax_c) * 1000000) // sum(net_c) AS DOUBLE) / 1000000.0
           AS effective_rate
FROM rows_ GROUP BY tax_pct
"""


# ---------------------------------------------------------------------------
# part_name_token_price


def part_name_token_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog-lexicon pricing: every token of p_name (the
    'adjective noun' vocabulary) × part count, mean catalog price and
    its premium over the global mean — which WORDS carry price. One
    explode + token rollup; the global mean rides a 1-row value.

    Exactness (r7 conversion): mean and premium are integer
    truncating integer-division quotients at 4 dp ((s·100) div n over cents =
    dollars·10⁴), so both engines round the same exact rational (see
    the basket-profile docstring)."""
    p = load_table(spark, sf_dir, "part")
    cents = F.round(F.col("p_retailprice") * 100).cast("long")
    toks = p.select(
        F.explode_outer(F.split(F.col("p_name"), " ")).alias("token"),
        cents.alias("c"),
    ).filter(F.col("token").isNotNull() & (F.col("token") != ""))
    agg = toks.groupBy("token").agg(
        F.count(F.lit(1)).alias("n_parts"), F.sum("c").alias("s")
    )
    tot = toks.agg(F.expr("(sum(c) * 100) div count(1)").alias("gm4"))
    mean4 = F.expr("(s * 100) div n_parts")
    return agg.crossJoin(broadcast(tot)).select(
        "token",
        F.col("n_parts").cast("long").alias("n_parts"),
        (mean4.cast("double") / 10000.0).alias("mean_price"),
        ((mean4 - F.col("gm4")).cast("double") / 10000.0).alias("premium"),
    )


PART_NAME_TOKEN_PRICE_SQL = """
WITH toks AS (
    SELECT unnest(string_split(p_name, ' ')) AS token,
           CAST(round(p_retailprice * 100) AS BIGINT) AS c
    FROM part
),
f AS (SELECT token, c FROM toks WHERE token IS NOT NULL AND token <> ''),
agg AS (SELECT token, count(*) AS n_parts, sum(c) AS s FROM f GROUP BY token),
tot AS (SELECT (sum(c) * 100) // count(*) AS gm4 FROM f)
SELECT token, CAST(n_parts AS BIGINT) AS n_parts,
       CAST((s * 100) // n_parts AS DOUBLE) / 10000.0 AS mean_price,
       CAST((s * 100) // n_parts - gm4 AS DOUBLE) / 10000.0 AS premium
FROM agg CROSS JOIN tot
"""


# ---------------------------------------------------------------------------
# docs_quality_by_split

_QBS_TRAIN = 900
_QBS_VAL = 950


def docs_quality_by_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality distribution per train/val/test split — the companion
    audit to docs_split_balance_audit on the QUALITY axis: a hash
    split should carry the same quality mass into every bucket, and a
    deviation here (unlike language mix) directly biases eval.
    Quality micro-quantizes per doc once; per-split folds are integer
    sums."""
    d = spread(load_table(spark, sf_dir, "documents"))
    mille = T.hash32(F.concat(F.lit("split|"), F.col("doc_id"))) % 1000
    split = (
        F.when(mille < _QBS_TRAIN, F.lit("train"))
        .when(mille < _QBS_VAL, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    ws = T.words(F.col("text"))
    q_mu = F.round(
        T.quality_score(
            F.size(ws).cast("long"),
            T.stopword_ratio(ws),
            T.punct_ratio(F.col("text")),
        )
        * _MICRO
    ).cast("long")
    rows = d.select(split.alias("split"), q_mu.alias("q_mu"))
    agg = rows.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("q_mu").alias("sq"),
        F.min("q_mu").alias("mn"),
        F.max("q_mu").alias("mx"),
    )
    return agg.select(
        "split",
        F.col("n_docs").cast("long").alias("n_docs"),
        # exact truncating integer-division mean (see basket profile)
        (F.expr("sq div n_docs").cast("double") / _MICRO).alias(
            "mean_quality"
        ),
        # ok-round: exact micro grid (6 dp)
        F.round(F.col("mn") / F.lit(float(_MICRO)), 6).alias("min_quality"),
        # ok-round: exact micro grid (6 dp)
        F.round(F.col("mx") / F.lit(float(_MICRO)), 6).alias("max_quality"),
    )


DOCS_QUALITY_BY_SPLIT_SQL = rf"""
WITH q AS (
    SELECT doc_id,
           CASE WHEN ('0x' || substr(md5('split|' || doc_id), 1, 8))::BIGINT
                     % 1000 < {_QBS_TRAIN} THEN 'train'
                WHEN ('0x' || substr(md5('split|' || doc_id), 1, 8))::BIGINT
                     % 1000 < {_QBS_VAL} THEN 'val'
                ELSE 'test' END AS split,
           -- ok-round: float-coefficient quality composite
           CAST(round(least(CAST(1.0 AS DOUBLE), greatest(CAST(0.0 AS DOUBLE),
                CAST(0.25 AS DOUBLE) + CAST(0.002 AS DOUBLE) * len(ws)
                + CAST(1.2 AS DOUBLE) *
                  (CASE WHEN len(ws) > 0
                        THEN CAST(len(list_filter(ws, x -> list_contains(
                             ['the','a','and','of','to','in','is'], lower(x))))
                             AS DOUBLE) / len(ws)
                        ELSE CAST(0.0 AS DOUBLE) END)
                - CAST(3.0 AS DOUBLE) *
                  (CASE WHEN length(text) > 0
                        THEN CAST(length(text) - length(regexp_replace(text,
                             '[.,!?;:]', '', 'g')) AS DOUBLE) / length(text)
                        ELSE CAST(0.0 AS DOUBLE) END)))
                * {_MICRO}) AS BIGINT) AS q_mu
    FROM (SELECT doc_id, text, {_WS} AS ws FROM documents)
)
SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(q_mu) // count(*) AS DOUBLE) / {_MICRO}.0 AS mean_quality,
       -- ok-round: exact micro grid (6 dp)
       round(min(q_mu) / {_MICRO}.0, 6) AS min_quality,
       -- ok-round: exact micro grid (6 dp)
       round(max(q_mu) / {_MICRO}.0, 6) AS max_quality
FROM q GROUP BY split
"""


# ---------------------------------------------------------------------------
# docs_dup_length_bias


def docs_dup_length_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Are EXACT duplicates biased short or long? Docs in
    normalized-text md5 groups of size >1 vs unique docs: counts,
    mean length, and the duplicated/unique length ratio — short-dup
    bias means boilerplate fragments dominate the dup mass (dedup
    saves less than the doc count suggests). Integer sums; means and
    the ratio are exact truncating integer-division quotients (the ratio
    cross-multiplies in DECIMAL(38,0)/HUGEINT so both engines divide
    the same exact integers — see the basket-profile docstring);
    sentinel -1 when either side is empty."""
    d = load_table(spark, sf_dir, "documents")
    eh = d.select("doc_id", "n_chars", F.md5(T.norm_text(F.col("text"))).alias("h"))
    sizes = eh.groupBy("h").agg(F.count(F.lit(1)).alias("g"))
    j = eh.join(sizes, "h").select(
        (F.col("g") > 1).cast("long").alias("is_dup"), "n_chars"
    )
    agg = j.groupBy("is_dup").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("sc")
    )
    piv = agg.agg(
        F.sum(F.when(F.col("is_dup") == 1, F.col("n_docs")).otherwise(0)).alias("nd"),
        F.sum(F.when(F.col("is_dup") == 1, F.col("sc")).otherwise(0)).alias("sd"),
        F.sum(F.when(F.col("is_dup") == 0, F.col("n_docs")).otherwise(0)).alias("nu"),
        F.sum(F.when(F.col("is_dup") == 0, F.col("sc")).otherwise(0)).alias("su"),
    )
    md4 = F.expr("(sd * 10000) div nd").cast("double") / 1e4
    mu4 = F.expr("(su * 10000) div nu").cast("double") / 1e4
    ratio6 = (
        F.expr(
            "(cast(sd as decimal(38,0)) * nu * 1000000)"
            " div (cast(nd as decimal(38,0)) * su)"
        ).cast("double")
        / 1e6
    )
    return piv.select(
        F.col("nd").cast("long").alias("n_dup_docs"),
        F.col("nu").cast("long").alias("n_unique_docs"),
        F.when(F.col("nd") > 0, md4).otherwise(F.lit(-1.0)).alias(
            "mean_chars_dup"
        ),
        F.when(F.col("nu") > 0, mu4).otherwise(F.lit(-1.0)).alias(
            "mean_chars_unique"
        ),
        F.when(
            (F.col("nd") > 0) & (F.col("nu") > 0) & (F.col("su") > 0), ratio6
        )
        .otherwise(F.lit(-1.0))
        .alias("length_ratio"),
    )


DOCS_DUP_LENGTH_BIAS_SQL = """
WITH eh AS (
    SELECT doc_id, n_chars,
           md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS h
    FROM documents
),
sizes AS (SELECT h, count(*) AS g FROM eh GROUP BY h),
j AS (
    SELECT CASE WHEN g > 1 THEN 1 ELSE 0 END AS is_dup, n_chars
    FROM eh JOIN sizes USING (h)
),
piv AS (
    SELECT sum(CASE WHEN is_dup = 1 THEN 1 ELSE 0 END) AS nd,
           sum(CASE WHEN is_dup = 1 THEN n_chars ELSE 0 END) AS sd,
           sum(CASE WHEN is_dup = 0 THEN 1 ELSE 0 END) AS nu,
           sum(CASE WHEN is_dup = 0 THEN n_chars ELSE 0 END) AS su
    FROM j
)
SELECT CAST(nd AS BIGINT) AS n_dup_docs,
       CAST(nu AS BIGINT) AS n_unique_docs,
       CASE WHEN nd > 0 THEN CAST((sd * 10000) // nd AS DOUBLE) / 10000.0
            ELSE CAST(-1.0 AS DOUBLE) END AS mean_chars_dup,
       CASE WHEN nu > 0 THEN CAST((su * 10000) // nu AS DOUBLE) / 10000.0
            ELSE CAST(-1.0 AS DOUBLE) END AS mean_chars_unique,
       CASE WHEN nd > 0 AND nu > 0 AND su > 0
            THEN CAST((CAST(sd AS HUGEINT) * nu * 1000000)
                      // (CAST(nd AS HUGEINT) * su) AS DOUBLE) / 1000000.0
            ELSE CAST(-1.0 AS DOUBLE) END AS length_ratio
FROM piv
"""


QUERIES = {
    "orders_basket_size_profile": orders_basket_size_profile,
    "nation_revenue_share_trend": nation_revenue_share_trend,
    "events_hour_type_value_interaction": events_hour_type_value_interaction,
    "events_error_burst_lengths": events_error_burst_lengths,
    "lineitem_tax_band_profile": lineitem_tax_band_profile,
    "part_name_token_price": part_name_token_price,
    "docs_quality_by_split": docs_quality_by_split,
    "docs_dup_length_bias": docs_dup_length_bias,
}

ORACLES = {
    "orders_basket_size_profile": ORDERS_BASKET_SIZE_SQL,
    "nation_revenue_share_trend": NATION_REVENUE_SHARE_TREND_SQL,
    "events_hour_type_value_interaction": EVENTS_HOUR_TYPE_VALUE_SQL,
    "events_error_burst_lengths": EVENTS_ERROR_BURST_SQL,
    "lineitem_tax_band_profile": LINEITEM_TAX_BAND_SQL,
    "part_name_token_price": PART_NAME_TOKEN_PRICE_SQL,
    "docs_quality_by_split": DOCS_QUALITY_BY_SPLIT_SQL,
    "docs_dup_length_bias": DOCS_DUP_LENGTH_BIAS_SQL,
}
