"""Round-7 batch II: event-stream monitors (CUSUM drift, tail index,
WAU growth, per-type concentration, anomaly days, attribution,
concurrency) over the events table.

Same contract as the other ``llm_ops*`` modules: declarative DataFrame
plans (JVM expressions only) with DuckDB oracles mirroring the exact
arithmetic, so value hashes match without tolerances. Timestamps fold
through tz-free integer epoch seconds (``ts::long`` ↔
``epoch_us(ts)//1000000``); money through integer cents; fractional
reductions micro/nano-quantize once and fold as BIGINT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from distributed_file_system_with_stream_processing_spark.sources.tables import load_table

_NANO = 1_000_000_000
_MICRO = 1_000_000
_DAY_S = 86_400
_WEEK_S = 604_800

_EPOCH = "epoch_us(ts) // 1000000"

# ---------------------------------------------------------------------------
# events_cusum_drift


def events_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM drift monitor per event type: the largest
    cumulative upward excursion of event value against the type's own
    mean — max_i (P_i − min_{j≤i} min(P_j, 0)) with P the running sum
    of deviations — plus WHEN it peaked. The drift detector a
    metrics pipeline runs per series; here as one batch pass.

    Exactness: deviations are scaled by n (dev_i = c_i·n − total, all
    BIGINT) so the prefix sums are exact integers; the reported
    max_cusum divides by n·100 once. Peak position ties break by
    (ts, event_id).

    100 TB shape: one event_type shuffle shared by the mean fold and
    the ordered prefix scan (a per-type sort — the price of an exact
    order statistic over a HANDFUL of types; each type's series sorts
    within its partition, types in parallel)."""
    e = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    base = e.select(
        "event_type", cents.alias("c"), F.col("ts").cast("long").alias("sec"),
        "event_id",
    )
    tot = base.groupBy("event_type").agg(
        F.sum("c").alias("total"), F.count(F.lit(1)).alias("n")
    )
    j = base.join(broadcast(tot), "event_type").select(
        "event_type",
        "sec",
        "event_id",
        "n",
        (F.col("c") * F.col("n") - F.col("total")).alias("dev"),
    )
    w = Window.partitionBy("event_type").orderBy("sec", "event_id")
    cum = j.select(
        "event_type",
        "sec",
        "event_id",
        "n",
        F.sum("dev").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("p"),
    )
    run_min = F.min(F.least(F.col("p"), F.lit(0).cast("long"))).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    s = cum.select(
        "event_type", "sec", "event_id", "n", (F.col("p") - run_min).alias("s")
    )
    pick = Window.partitionBy("event_type").orderBy(
        F.col("s").desc(), F.col("sec").asc(), F.col("event_id").asc()
    )
    top = s.select(
        "event_type", "n", "s", "sec", F.row_number().over(pick).alias("rn")
    ).filter(F.col("rn") == 1)
    return top.select(
        "event_type",
        F.col("n").cast("long").alias("n_events"),
        # exact truncating integer-division mean (r7 conversion; see
        # llm_ops21.orders_basket_size_profile)
        (F.expr("(s * 100) div n").cast("double") / 1e4).alias("max_cusum"),
        F.col("sec").cast("long").alias("peak_epoch_s"),
    )


EVENTS_CUSUM_DRIFT_SQL = f"""
WITH base AS (
    SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c,
           {_EPOCH} AS sec, event_id
    FROM events
),
tot AS (SELECT event_type, sum(c) AS total, count(*) AS n
        FROM base GROUP BY event_type),
cum AS (
    SELECT b.event_type, b.sec, b.event_id, t.n,
           sum(b.c * t.n - t.total) OVER (
               PARTITION BY b.event_type ORDER BY b.sec, b.event_id
               ROWS UNBOUNDED PRECEDING) AS p
    FROM base b JOIN tot t USING (event_type)
),
s AS (
    SELECT event_type, sec, event_id, n,
           p - min(least(p, 0)) OVER (
               PARTITION BY event_type ORDER BY sec, event_id
               ROWS UNBOUNDED PRECEDING) AS s
    FROM cum
),
top AS (
    SELECT event_type, n, s, sec,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY s DESC, sec ASC, event_id ASC) AS rn
    FROM s
)
SELECT event_type, CAST(n AS BIGINT) AS n_events,
       CAST((s * 100) // n AS DOUBLE) / 10000.0 AS max_cusum,
       CAST(sec AS BIGINT) AS peak_epoch_s
FROM top WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# events_hill_tail_index

_HILL_K = 100


def events_hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill tail-index estimator per event type over the top-k values:
    α̂ = (k−1) / Σ_{i<k} ln(x_i / x_k) — the heavy-tail screen that
    decides whether mean-based alerting is even meaningful for a
    series (α ≤ 2: infinite variance). k = min(100, n); a type whose
    k-th value is ≤ 0 cents has no positive tail to fit and is OMITTED
    from the output (both engines filter ck > 0 identically); the α=-1
    sentinel covers the remaining degenerate case (all top-k values
    equal ⇒ Σln = 0). Each ln term nano-quantizes once from exact
    integer cents.

    100 TB shape: per-type top-k via the rank window (one event_type
    shuffle; per-type sort, types parallel), then a k-row fold."""
    e = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    base = e.select("event_type", cents.alias("c"), "event_id")
    w = Window.partitionBy("event_type").orderBy(
        F.col("c").desc(), F.col("event_id").asc()
    )
    ranked = base.select(
        "event_type",
        "c",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("n"),
    )
    k_eff = F.least(F.lit(_HILL_K), F.col("n"))
    topk = ranked.filter(F.col("rk") <= k_eff).select(
        "event_type", "c", "rk", k_eff.alias("k")
    )
    xk = topk.filter(F.col("rk") == F.col("k")).select(
        "event_type", F.col("c").alias("ck")
    )
    terms = topk.filter(F.col("rk") < F.col("k")).join(broadcast(xk), "event_type")
    # ok-round: irrational (ln) quantization
    lt = F.round(
        F.log(F.col("c").cast("double") / F.col("ck")) * _NANO
    ).cast("long")
    agg = terms.filter(F.col("ck") > 0).select(
        "event_type", "k", "ck", lt.alias("lt")
    ).groupBy("event_type", "k", "ck").agg(F.sum("lt").alias("sl"))
    # alpha = (k-1)·NANO/sl is RATIONAL (the log terms are already
    # micro-quantized integers): exact truncating integer-division at 6 dp
    alpha = F.when(
        F.col("sl") > 0,
        F.expr(f"((k - 1) * {_NANO} * 1000000) div sl").cast("double") / 1e6,
    ).otherwise(F.lit(-1.0))
    out = agg.select(
        "event_type",
        F.col("k").cast("long").alias("k_used"),
        # ok-round: exact cents grid (2 dp)
        F.round(F.col("ck") / 100.0, 2).alias("x_k"),
        alpha.alias("hill_alpha"),
    )
    return out


EVENTS_HILL_SQL = f"""
WITH base AS (
    SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c, event_id
    FROM events
),
ranked AS (
    SELECT event_type, c,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY c DESC, event_id ASC) AS rk,
           count(*) OVER (PARTITION BY event_type) AS n
    FROM base
),
topk AS (
    SELECT event_type, c, rk, least({_HILL_K}, n) AS k
    FROM ranked WHERE rk <= least({_HILL_K}, n)
),
xk AS (SELECT event_type, c AS ck, k FROM topk WHERE rk = k),
agg AS (
    SELECT t.event_type, x.k, x.ck,
           -- ok-round: irrational (ln) quantization
           sum(CAST(round(ln(CAST(t.c AS DOUBLE) / x.ck) * {_NANO}) AS BIGINT))
               AS sl
    FROM topk t JOIN xk x USING (event_type)
    WHERE t.rk < t.k AND x.ck > 0
    GROUP BY t.event_type, x.k, x.ck
)
SELECT event_type, CAST(k AS BIGINT) AS k_used,
       -- ok-round: exact cents grid (2 dp)
       round(ck / 100.0, 2) AS x_k,
       CASE WHEN sl > 0
            THEN CAST(((k - 1) * {_NANO} * 1000000) // sl AS DOUBLE) / 1000000.0
            ELSE CAST(-1.0 AS DOUBLE) END AS hill_alpha
FROM agg
"""


# ---------------------------------------------------------------------------
# events_user_type_entropy_hist

_UTE_BIN_NANO = 250_000_000  # 0.25-nat buckets


def events_user_type_entropy_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How specialized are users? Per user, the entropy of their
    event-TYPE distribution (0 = single-type bots/scripts, high =
    broad engagement), histogrammed into 0.25-nat buckets — the
    behavioral-diversity census. Each −p·ln p term nano-quantizes
    from exact integers; bucketing is integer division of the
    quantized sum, so bucket edges are bit-stable.

    100 TB shape: one (user, type) partial-agg shuffle, a user rollup
    reusing the partitioning, a ≤|buckets|-row fold."""
    e = load_table(spark, sf_dir, "events")
    ut = e.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("c"))
    tot = ut.groupBy("user_id").agg(F.sum("c").alias("n"))
    p = F.col("c").cast("double") / F.col("n")
    term = F.round(-(p * F.log(p)) * _NANO).cast("long")
    ent = ut.join(tot, "user_id").select("user_id", term.alias("t")).groupBy(
        "user_id"
    ).agg(F.sum("t").alias("e_nano"))
    bucket = F.floor(F.col("e_nano") / _UTE_BIN_NANO).cast("long")
    return (
        ent.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .select(
            "bucket",
            # ok-round: on-grid bin-edge constant product
            F.round(F.col("bucket") * (_UTE_BIN_NANO / _NANO), 2).alias("entropy_lo"),
            F.col("n_users").cast("long").alias("n_users"),
        )
    )


EVENTS_USER_TYPE_ENTROPY_SQL = f"""
WITH ut AS (
    SELECT user_id, event_type, count(*) AS c FROM events
    GROUP BY user_id, event_type
),
tot AS (SELECT user_id, sum(c) AS n FROM ut GROUP BY user_id),
ent AS (
    SELECT ut.user_id,
           -- ok-round: irrational (p*ln p entropy term)
           sum(CAST(round(-(CAST(c AS DOUBLE) / n * ln(CAST(c AS DOUBLE) / n))
                          * {_NANO}) AS BIGINT)) AS e_nano
    FROM ut JOIN tot USING (user_id) GROUP BY ut.user_id
)
SELECT CAST(e_nano // {_UTE_BIN_NANO} AS BIGINT) AS bucket,
       -- ok-round: on-grid bin-edge constant product
       round(CAST(e_nano // {_UTE_BIN_NANO} AS DOUBLE) * {_UTE_BIN_NANO / _NANO}, 2)
           AS entropy_lo,
       CAST(count(*) AS BIGINT) AS n_users
FROM ent GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# events_wau_growth


def events_wau_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly active users with week-over-week growth — the topline
    the retention matrix rolls up to. Weeks are tz-free integer epoch
    weeks (the retention-matrix convention). The lag window runs over
    the WEEK-scale table (|weeks| rows), never the event log; first
    week reports prev_wau=0, growth=-1.0 sentinel."""
    e = load_table(spark, sf_dir, "events")
    week = (F.col("ts").cast("long") / _WEEK_S).cast("long")
    wau = (
        e.select(week.alias("week"), "user_id")
        .distinct()
        .groupBy("week")
        .agg(F.count(F.lit(1)).alias("wau"))
    )
    prev = F.lag("wau").over(Window.orderBy("week"))
    lagged = wau.withColumn("prev_w", F.coalesce(prev, F.lit(0)).cast("long"))
    return lagged.select(
        F.col("week").cast("long").alias("week"),
        F.col("wau").cast("long").alias("wau"),
        F.col("prev_w").alias("prev_wau"),
        # exact truncating integer-division growth — div truncates toward
        # zero in BOTH engines for shrink weeks (tests/test_oracle_types)
        F.when(
            F.col("prev_w") > 0,
            F.expr("((wau - prev_w) * 1000000) div prev_w").cast("double")
            / 1e6,
        ).otherwise(F.lit(-1.0)).alias("wow_growth"),
    )


EVENTS_WAU_GROWTH_SQL = f"""
WITH wau AS (
    SELECT week, count(*) AS wau FROM (
        SELECT DISTINCT {_EPOCH} // {_WEEK_S} AS week, user_id FROM events
    ) GROUP BY week
),
lagged AS (
    SELECT week, wau, lag(wau) OVER (ORDER BY week) AS prev
    FROM wau
)
SELECT CAST(week AS BIGINT) AS week, CAST(wau AS BIGINT) AS wau,
       CAST(coalesce(prev, 0) AS BIGINT) AS prev_wau,
       CASE WHEN prev IS NOT NULL AND prev > 0
            THEN CAST(((wau - prev) * 1000000) // prev AS DOUBLE) / 1000000.0
            ELSE CAST(-1.0 AS DOUBLE) END AS wow_growth
FROM lagged
"""


# ---------------------------------------------------------------------------
# events_type_user_gini_binned

_TUG_BIN = 5  # events-per-user histogram bin width


def events_type_user_gini_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event type, the Gini concentration of events across USERS
    from a fixed-width per-user-count histogram (the binned-Lorenz
    trapezoid — customer_revenue_gini_binned's stance, so no global
    row sort): is the type's volume broad-based or a handful of heavy
    users? Exact integer bin rollups; the trapezoid folds
    DECIMAL(38,0)↔HUGEINT products; one double division per type."""
    e = load_table(spark, sf_dir, "events")
    per = e.groupBy("event_type", "user_id").agg(F.count(F.lit(1)).alias("c"))
    hist = per.groupBy(
        "event_type", (F.col("c") / _TUG_BIN).cast("long").alias("bin")
    ).agg(F.count(F.lit(1)).alias("n"), F.sum("c").alias("s"))
    w = Window.partitionBy("event_type").orderBy("bin").rowsBetween(
        Window.unboundedPreceding, 0
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    cum = hist.select(
        "event_type",
        "bin",
        "n",
        "s",
        F.sum("n").over(w).alias("cn"),
        F.sum("s").over(w).alias("cs"),
    )
    term = dec("n") * (F.lit(2) * dec("cs") - dec("s"))
    tot = cum.groupBy("event_type").agg(
        F.max("cn").alias("n_users"),
        F.max("cs").alias("n_events"),
        F.sum(term).alias("lorenz"),
    )
    # r8 conversion: gini = (U·E − lorenz)/(U·E) is an exact rational
    # of integers — truncating integer-division at 6 dp in
    # DECIMAL(38,0) (headroom: U·E·10⁶ ≤ 1e27 at any realistic scale)
    gini_mu = F.expr(
        "((cast(n_users as decimal(38,0)) * n_events - lorenz) * 1000000)"
        " div (cast(n_users as decimal(38,0)) * n_events)"
    )
    return tot.select(
        "event_type",
        F.col("n_users").cast("long").alias("n_users"),
        F.col("n_events").cast("long").alias("n_events"),
        (gini_mu.cast("double") / 1e6).alias("gini_binned"),
    )


EVENTS_TYPE_USER_GINI_SQL = f"""
WITH per AS (
    SELECT event_type, user_id, count(*) AS c FROM events
    GROUP BY event_type, user_id
),
hist AS (
    SELECT event_type, c // {_TUG_BIN} AS bin, count(*) AS n, sum(c) AS s
    FROM per GROUP BY 1, 2
),
cum AS (
    SELECT event_type, bin, n, s,
           sum(n) OVER (PARTITION BY event_type ORDER BY bin) AS cn,
           sum(s) OVER (PARTITION BY event_type ORDER BY bin) AS cs
    FROM hist
),
tot AS (
    SELECT event_type, max(cn) AS n_users, max(cs) AS n_events,
           sum(CAST(n AS HUGEINT) * (2 * CAST(cs AS HUGEINT) - s)) AS lorenz
    FROM cum GROUP BY event_type
)
SELECT event_type, CAST(n_users AS BIGINT) AS n_users,
       CAST(n_events AS BIGINT) AS n_events,
       CAST(((CAST(n_users AS HUGEINT) * n_events - lorenz) * 1000000)
            // (CAST(n_users AS HUGEINT) * n_events) AS DOUBLE) / 1000000.0
           AS gini_binned
FROM tot
"""


# ---------------------------------------------------------------------------
# events_dow_hour_heatmap


def events_dow_hour_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The (day-of-week × hour) activity heatmap with each cell's
    share of its day — the seasonality fingerprint behind capacity
    planning and anomaly baselines. Tz-free arithmetic calendar:
    dow = (epoch_day + 4) % 7 (0=Sunday; 1970-01-01 was a Thursday),
    hour = (sec % 86400)/3600 — no session-timezone dependence. One
    event scan into a 168-cell rollup; the day totals ride a window
    over those 168 rows."""
    e = load_table(spark, sf_dir, "events")
    sec = F.col("ts").cast("long")
    cell = e.select(
        ((F.floor(sec / _DAY_S) + 4) % 7).cast("long").alias("dow"),
        ((sec % _DAY_S) / 3600).cast("long").alias("hour"),
    ).groupBy("dow", "hour").agg(F.count(F.lit(1)).alias("n"))
    day_tot = F.sum("n").over(Window.partitionBy("dow"))
    return cell.withColumn("dt", day_tot).select(
        "dow",
        "hour",
        F.col("n").cast("long").alias("n_events"),
        # exact truncating integer-division share (r7 conversion)
        (F.expr("(n * 1000000) div dt").cast("double") / 1e6).alias(
            "share_of_dow"
        ),
    )


EVENTS_DOW_HOUR_SQL = f"""
WITH cell AS (
    SELECT ({_EPOCH} // {_DAY_S} + 4) % 7 AS dow,
           ({_EPOCH} % {_DAY_S}) // 3600 AS hour,
           count(*) AS n
    FROM events GROUP BY 1, 2
)
SELECT CAST(dow AS BIGINT) AS dow, CAST(hour AS BIGINT) AS hour,
       CAST(n AS BIGINT) AS n_events,
       CAST((n * 1000000) // sum(n) OVER (PARTITION BY dow) AS DOUBLE)
           / 1000000.0 AS share_of_dow
FROM cell
"""


QUERIES = {
    "events_cusum_drift": events_cusum_drift,
    "events_hill_tail_index": events_hill_tail_index,
    "events_user_type_entropy_hist": events_user_type_entropy_hist,
    "events_wau_growth": events_wau_growth,
    "events_type_user_gini_binned": events_type_user_gini_binned,
    "events_dow_hour_heatmap": events_dow_hour_heatmap,
}

ORACLES = {
    "events_cusum_drift": EVENTS_CUSUM_DRIFT_SQL,
    "events_hill_tail_index": EVENTS_HILL_SQL,
    "events_user_type_entropy_hist": EVENTS_USER_TYPE_ENTROPY_SQL,
    "events_wau_growth": EVENTS_WAU_GROWTH_SQL,
    "events_type_user_gini_binned": EVENTS_TYPE_USER_GINI_SQL,
    "events_dow_hour_heatmap": EVENTS_DOW_HOUR_SQL,
}


# ---------------------------------------------------------------------------
# events_daily_anomaly_days

_ZDAY_THRESHOLD = 2.0


def events_daily_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Days where a type's daily volume deviates ≥2σ from that type's
    own across-days mean — the anomaly-calendar behind incident
    retrospectives. Mean/variance come from exact integer daily
    counts via the n·Σx²−(Σx)² population identity (one double sqrt
    at the end); a type must span ≥2 distinct days and have σ>0 to
    report. Days are tz-free epoch days; only days the type appeared
    exist (a type silent for a whole day is a zero handled upstream
    by the quiet-hours query, not re-densified here).

    100 TB shape: one (type, day) rollup, a type rollup of THAT
    (days-scale) table, one broadcast join back — no window at all."""
    e = load_table(spark, sf_dir, "events")
    day = (F.col("ts").cast("long") / _DAY_S).cast("long")
    daily = e.groupBy("event_type", day.alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("d"),
        F.sum("n").alias("sx"),
        F.sum(F.col("n") * F.col("n")).alias("sxx"),
    )
    dd = F.col("d").cast("double")
    mean = F.col("sx").cast("double") / dd
    var = (dd * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx"))
    std = F.sqrt(var) / dd
    j = daily.join(broadcast(stats), "event_type").filter(
        (F.col("d") >= 2) & (var > 0)
    )
    z = (F.col("n").cast("double") - mean) / std
    return j.select(
        "event_type",
        F.col("day").cast("long").alias("day"),
        F.col("n").cast("long").alias("n_events"),
        F.round(z, 4).alias("z"),
    ).filter(F.abs(z) >= _ZDAY_THRESHOLD)


EVENTS_DAILY_ANOMALY_SQL = f"""
WITH daily AS (
    SELECT event_type, {_EPOCH} // {_DAY_S} AS day, count(*) AS n
    FROM events GROUP BY 1, 2
),
stats AS (
    SELECT event_type, count(*) AS d, sum(n) AS sx, sum(n * n) AS sxx
    FROM daily GROUP BY event_type
),
z AS (
    SELECT dl.event_type, dl.day, dl.n,
           (CAST(dl.n AS DOUBLE) - CAST(s.sx AS DOUBLE) / s.d)
           / (sqrt(CAST(s.d AS DOUBLE) * s.sxx - CAST(s.sx AS DOUBLE) * s.sx)
              / s.d) AS z
    FROM daily dl JOIN stats s USING (event_type)
    WHERE s.d >= 2
      AND CAST(s.d AS DOUBLE) * s.sxx - CAST(s.sx AS DOUBLE) * s.sx > 0
)
SELECT event_type, CAST(day AS BIGINT) AS day, CAST(n AS BIGINT) AS n_events,
       round(z, 4) AS z
FROM z WHERE abs(z) >= {_ZDAY_THRESHOLD}
"""


# ---------------------------------------------------------------------------
# events_winsorized_stats


def events_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per type: raw mean vs the p05/p95-winsorized mean of event
    value — the robust-metric companion that shows how much of a
    series' mean is tail artifact. Exact discrete percentiles (value
    at rank ceil(p·n) in (cents, event_id) order — the
    percentile_disc stance); clamped cents fold as integers and the
    two means divide once.

    100 TB shape: one event_type shuffle shared by the rank window
    and the rollup (the exact-auditor cost; the sketch path for
    arbitrary-cardinality keys stays order_percentiles_approx)."""
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
    pcts = ranked.groupBy("event_type").agg(
        F.max("n").alias("n"), pick(0.05).alias("p05"), pick(0.95).alias("p95")
    )
    j = base.join(broadcast(pcts.select("event_type", "p05", "p95")), "event_type")
    wc = F.greatest(F.col("p05"), F.least(F.col("p95"), F.col("c")))
    agg = j.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("sraw"),
        F.sum(wc).alias("swin"),
    )
    return agg.join(pcts.select("event_type", "p05", "p95"), "event_type").select(
        "event_type",
        F.col("n").cast("long").alias("n_events"),
        # ok-round: exact cents grid (2 dp)
        F.round(F.col("p05") / 100.0, 2).alias("p05"),
        # ok-round: exact cents grid (2 dp)
        F.round(F.col("p95") / 100.0, 2).alias("p95"),
        # exact truncating integer-division means (r7 conversion)
        (F.expr("(sraw * 100) div n").cast("double") / 1e4).alias(
            "raw_mean"
        ),
        (F.expr("(swin * 100) div n").cast("double") / 1e4).alias(
            "winsorized_mean"
        ),
    )


EVENTS_WINSORIZED_SQL = """
WITH base AS (
    SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c, event_id
    FROM events
),
pcts AS (
    SELECT event_type, count(*) AS n,
           percentile_disc(0.05) WITHIN GROUP (ORDER BY c) AS p05,
           percentile_disc(0.95) WITHIN GROUP (ORDER BY c) AS p95
    FROM base GROUP BY event_type
),
agg AS (
    SELECT b.event_type, count(*) AS n, sum(b.c) AS sraw,
           sum(greatest(p.p05, least(p.p95, b.c))) AS swin
    FROM base b JOIN pcts p USING (event_type)
    GROUP BY b.event_type
)
SELECT a.event_type, CAST(a.n AS BIGINT) AS n_events,
       -- ok-round: exact cents grid (2 dp)
       round(p.p05 / 100.0, 2) AS p05,
       -- ok-round: exact cents grid (2 dp)
       round(p.p95 / 100.0, 2) AS p95,
       CAST((a.sraw * 100) // a.n AS DOUBLE) / 10000.0 AS raw_mean,
       CAST((a.swin * 100) // a.n AS DOUBLE) / 10000.0 AS winsorized_mean
FROM agg a JOIN pcts p USING (event_type)
"""


# ---------------------------------------------------------------------------
# events_props_value_stats


def events_props_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed stats over the semi-structured ``props.k`` field per
    event type: count present, distinct values, min/max/mean — the
    profiling pass run before promoting a JSON field to a real
    column. Scan-side JSON path extraction (JVM expression, no UDF);
    mean divides integer sums once.

    100 TB shape: scan → JSON extract → two-level partial agg (the
    distinct count is the usual two-shuffle expand); no joins."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    base = e.select("event_type", k.alias("k")).filter(F.col("k").isNotNull())
    return base.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_present"),
        F.countDistinct("k").cast("long").alias("n_distinct"),
        F.min("k").cast("long").alias("min_k"),
        F.max("k").cast("long").alias("max_k"),
        (F.expr("(sum(k) * 10000) div count(1)").cast("double") / 1e4).alias(
            "mean_k"
        ),
    )


EVENTS_PROPS_VALUE_SQL = """
WITH base AS (
    SELECT event_type, CAST(props->>'$.k' AS BIGINT) AS k FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_present,
       CAST(count(DISTINCT k) AS BIGINT) AS n_distinct,
       CAST(min(k) AS BIGINT) AS min_k,
       CAST(max(k) AS BIGINT) AS max_k,
       CAST((sum(k) * 10000) // count(*) AS DOUBLE) / 10000.0 AS mean_k
FROM base WHERE k IS NOT NULL
GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# events_first_touch_attribution

_FTA_WINDOW_S = 24 * 3600


def events_first_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch attribution: each purchase is credited to the
    EARLIEST event type the user emitted in the 24 h before it
    (ties: event_id; no prior event → 'direct') — the standard
    marketing-attribution rollup, here as one range join. Share
    divides two exact counts.

    100 TB shape: purchases × prior events join on user_id with a
    time-range predicate — per-user candidate sets are bounded by
    24 h of that user's activity, so the join is user-co-partitioned
    and never cross-user; one window picks the first touch."""
    e = load_table(spark, sf_dir, "events")
    sec = F.col("ts").cast("long")
    ev = e.select(
        "user_id", "event_type", sec.alias("sec"), "event_id"
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("sec").alias("p_sec"),
        F.col("event_id").alias("p_id"),
    )
    prior = ev.select(
        "user_id",
        F.col("event_type").alias("t_type"),
        F.col("sec").alias("t_sec"),
        F.col("event_id").alias("t_id"),
    )
    j = purch.join(
        prior,
        (purch.user_id == prior.user_id)
        & (prior.t_sec >= purch.p_sec - _FTA_WINDOW_S)
        & (
            (prior.t_sec < purch.p_sec)
            | ((prior.t_sec == purch.p_sec) & (prior.t_id < purch.p_id))
        ),
        "left",
    ).drop(prior.user_id)
    w = Window.partitionBy("user_id", "p_id").orderBy(
        F.col("t_sec").asc(), F.col("t_id").asc()
    )
    first = j.select(
        "user_id",
        "p_id",
        "t_type",
        F.row_number().over(w).alias("rn"),
    ).filter(F.col("rn") == 1)
    att = first.select(
        F.coalesce("t_type", F.lit("direct")).alias("attributed_type")
    )
    agg = att.groupBy("attributed_type").agg(F.count(F.lit(1)).alias("n_purchases"))
    tot = agg.agg(F.sum("n_purchases").alias("t"))
    return agg.crossJoin(broadcast(tot)).select(
        "attributed_type",
        F.col("n_purchases").cast("long").alias("n_purchases"),
        (F.expr("(n_purchases * 1000000) div t").cast("double") / 1e6).alias(
            "share"
        ),
    )


EVENTS_FIRST_TOUCH_SQL = f"""
WITH ev AS (
    SELECT user_id, event_type, {_EPOCH} AS sec, event_id FROM events
),
purch AS (
    SELECT user_id, sec AS p_sec, event_id AS p_id
    FROM ev WHERE event_type = 'purchase'
),
j AS (
    SELECT p.user_id, p.p_id, t.event_type AS t_type,
           row_number() OVER (PARTITION BY p.user_id, p.p_id
                              ORDER BY t.sec ASC, t.event_id ASC) AS rn
    FROM purch p LEFT JOIN ev t
      ON t.user_id = p.user_id
     AND t.sec >= p.p_sec - {_FTA_WINDOW_S}
     AND (t.sec < p.p_sec OR (t.sec = p.p_sec AND t.event_id < p.p_id))
),
att AS (
    SELECT coalesce(t_type, 'direct') AS attributed_type
    FROM j WHERE rn = 1
),
agg AS (SELECT attributed_type, count(*) AS n FROM att GROUP BY attributed_type)
SELECT attributed_type, CAST(n AS BIGINT) AS n_purchases,
       CAST((n * 1000000) // (SELECT sum(n) FROM agg) AS DOUBLE) / 1000000.0
           AS share
FROM agg
"""


# ---------------------------------------------------------------------------
# events_concurrent_sessions_peak

_CSP_GAP_S = 1800


def events_concurrent_sessions_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak CONCURRENT sessions per day — the capacity number: build
    30-min-gap sessions per user, clip each session interval to day
    boundaries, then a per-day boundary sweep (+1 at start, −1 past
    end) whose running maximum is the day's peak. Sweep ties order
    (t asc, delta desc, user, session) so a session starting exactly
    when another ends counts as overlapping — deterministic in both
    engines.

    100 TB shape: sessionization is the standard per-user lag window
    (user-keyed shuffle); the sweep partitions BY DAY over
    boundary-scale rows (2 per session-day), so no global sort."""
    e = load_table(spark, sf_dir, "events")
    sec = F.col("ts").cast("long")
    base = e.select("user_id", sec.alias("sec"))
    wu = Window.partitionBy("user_id").orderBy("sec")
    flagged = base.select(
        "user_id",
        "sec",
        F.when(
            F.lag("sec").over(wu).isNull()
            | (F.col("sec") - F.lag("sec").over(wu) > _CSP_GAP_S),
            1,
        )
        .otherwise(0)
        .alias("is_start"),
    )
    sess = flagged.select(
        "user_id",
        "sec",
        F.sum("is_start")
        .over(wu.rowsBetween(Window.unboundedPreceding, 0))
        .alias("sess_id"),
    )
    iv = sess.groupBy("user_id", "sess_id").agg(
        F.min("sec").alias("s"), F.max("sec").alias("e")
    )
    days = iv.select(
        "user_id",
        "sess_id",
        "s",
        "e",
        F.explode(
            F.sequence(
                F.floor(F.col("s") / _DAY_S).cast("long"),
                F.floor(F.col("e") / _DAY_S).cast("long"),
            )
        ).alias("day"),
    )
    clipped = days.select(
        "user_id",
        "sess_id",
        "day",
        F.greatest(F.col("s"), F.col("day") * _DAY_S).alias("cs"),
        F.least(F.col("e"), (F.col("day") + 1) * _DAY_S - 1).alias("ce"),
    )
    bounds = clipped.select(
        "day", F.col("cs").alias("t"), F.lit(1).alias("delta"), "user_id", "sess_id"
    ).unionByName(
        clipped.select(
            "day",
            (F.col("ce") + 1).alias("t"),
            F.lit(-1).alias("delta"),
            "user_id",
            "sess_id",
        )
    )
    ws = Window.partitionBy("day").orderBy(
        F.col("t").asc(), F.col("delta").desc(), F.col("user_id").asc(),
        F.col("sess_id").asc(),
    )
    running = bounds.select(
        "day",
        F.sum("delta").over(ws.rowsBetween(Window.unboundedPreceding, 0)).alias("r"),
    )
    peaks = running.groupBy("day").agg(F.max("r").alias("peak"))
    touch = clipped.groupBy("day").agg(F.count(F.lit(1)).alias("n_sessions"))
    return touch.join(peaks, "day").select(
        F.col("day").cast("long").alias("day"),
        F.col("n_sessions").cast("long").alias("n_sessions"),
        F.col("peak").cast("long").alias("peak_concurrent"),
    )


EVENTS_CONCURRENT_PEAK_SQL = f"""
WITH base AS (SELECT user_id, {_EPOCH} AS sec FROM events),
flagged AS (
    SELECT user_id, sec,
           CASE WHEN lag(sec) OVER (PARTITION BY user_id ORDER BY sec) IS NULL
                  OR sec - lag(sec) OVER (PARTITION BY user_id ORDER BY sec)
                     > {_CSP_GAP_S}
                THEN 1 ELSE 0 END AS is_start
    FROM base
),
sess AS (
    SELECT user_id, sec,
           sum(is_start) OVER (PARTITION BY user_id ORDER BY sec
                               ROWS UNBOUNDED PRECEDING) AS sess_id
    FROM flagged
),
iv AS (
    SELECT user_id, sess_id, min(sec) AS s, max(sec) AS e
    FROM sess GROUP BY user_id, sess_id
),
clipped AS (
    SELECT user_id, sess_id, day,
           greatest(s, day * {_DAY_S}) AS cs,
           least(e, (day + 1) * {_DAY_S} - 1) AS ce
    FROM (
        SELECT user_id, sess_id, s, e,
               unnest(range(s // {_DAY_S}, e // {_DAY_S} + 1)) AS day
        FROM iv
    )
),
bounds AS (
    SELECT day, cs AS t, 1 AS delta, user_id, sess_id FROM clipped
    UNION ALL
    SELECT day, ce + 1 AS t, -1 AS delta, user_id, sess_id FROM clipped
),
running AS (
    SELECT day,
           sum(delta) OVER (PARTITION BY day
                            ORDER BY t ASC, delta DESC, user_id ASC, sess_id ASC
                            ROWS UNBOUNDED PRECEDING) AS r
    FROM bounds
),
peaks AS (SELECT day, max(r) AS peak FROM running GROUP BY day),
touch AS (SELECT day, count(*) AS n_sessions FROM clipped GROUP BY day)
SELECT CAST(t.day AS BIGINT) AS day,
       CAST(t.n_sessions AS BIGINT) AS n_sessions,
       CAST(p.peak AS BIGINT) AS peak_concurrent
FROM touch t JOIN peaks p USING (day)
"""


# ---------------------------------------------------------------------------
# events_retention_halflife


def events_retention_halflife(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential fit to pooled weekly retention: rate(o) =
    Σ_cohorts active(cohort, o) / Σ_cohorts size(cohort), restricted
    to cohorts old enough to observe offset o; OLS of ln rate on
    offset gives the decay slope and half-life −ln2/slope — the one
    number product reviews quote from the retention triangle
    (events_retention_matrix is the raw triangle; this is its fitted
    summary). Each ln rate micro-quantizes once; the ≤|weeks|-point
    OLS folds integer sums. Degenerate fits (single offset, zero/
    positive slope) report half_life=-1.0."""
    e = load_table(spark, sf_dir, "events")
    sec = F.col("ts").cast("long")
    uw = e.select("user_id", (sec / _WEEK_S).cast("long").alias("week")).distinct()
    cohort = uw.groupBy("user_id").agg(F.min("week").alias("cw"))
    tri = (
        uw.join(cohort, "user_id")
        .groupBy("cw", (F.col("week") - F.col("cw")).alias("o"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    max_week = uw.agg(F.max("week").alias("mw"))
    sizes = tri.filter(F.col("o") == 0).select("cw", F.col("n").alias("size"))
    pooled = (
        tri.filter(F.col("o") >= 1)
        .join(sizes, "cw")
        .crossJoin(broadcast(max_week))
        .filter(F.col("cw") + F.col("o") <= F.col("mw"))
        .groupBy("o")
        .agg(F.sum("n").alias("act"), F.sum("size").alias("base"))
    )
    rate = F.col("act").cast("double") / F.col("base")
    pts = pooled.filter(F.col("act") > 0).select(
        F.col("o").cast("long").alias("o"),
        F.round(F.log(rate) * _MICRO).cast("long").alias("ly"),
    )
    s = pts.agg(
        F.count(F.lit(1)).alias("np"),
        F.sum("o").alias("sx"),
        F.sum("ly").alias("sy"),
        F.sum(F.col("o") * F.col("ly")).alias("sxy"),
        F.sum(F.col("o") * F.col("o")).alias("sxx"),
    )
    nd = F.col("np").cast("double")
    denom = nd * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx")
    slope = F.when(
        denom > 0,
        (nd * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy"))
        / denom
        / _MICRO,
    )
    hl = F.when(
        slope.isNotNull() & (slope < 0), -F.log(F.lit(2.0)) / slope
    ).otherwise(F.lit(-1.0))
    return s.select(
        F.col("np").cast("long").alias("n_offsets"),
        F.round(F.coalesce(slope, F.lit(0.0)), 6).alias("decay_slope"),
        F.round(hl, 4).alias("half_life_weeks"),
    )


EVENTS_RETENTION_HALFLIFE_SQL = f"""
WITH uw AS (
    SELECT DISTINCT user_id, {_EPOCH} // {_WEEK_S} AS week FROM events
),
cohort AS (SELECT user_id, min(week) AS cw FROM uw GROUP BY user_id),
tri AS (
    SELECT c.cw, uw.week - c.cw AS o, count(*) AS n
    FROM uw JOIN cohort c USING (user_id)
    GROUP BY 1, 2
),
mw AS (SELECT max(week) AS mw FROM uw),
sizes AS (SELECT cw, n AS size FROM tri WHERE o = 0),
pooled AS (
    SELECT t.o, sum(t.n) AS act, sum(s.size) AS base
    FROM tri t JOIN sizes s USING (cw) CROSS JOIN mw
    WHERE t.o >= 1 AND t.cw + t.o <= mw.mw
    GROUP BY t.o
),
pts AS (
    SELECT o,
           -- ok-round: irrational (ln) quantization
           CAST(round(ln(CAST(act AS DOUBLE) / base) * {_MICRO}) AS BIGINT) AS ly
    FROM pooled WHERE act > 0
),
s AS (
    SELECT count(*) AS np, sum(o) AS sx, sum(ly) AS sy,
           sum(o * ly) AS sxy, sum(o * o) AS sxx
    FROM pts
),
fit AS (
    SELECT np, sx, sy, sxy, sxx,
           CASE WHEN CAST(np AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx > 0
                THEN (CAST(np AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                     / (CAST(np AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                     / {_MICRO}
                END AS slope
    FROM s
)
SELECT CAST(np AS BIGINT) AS n_offsets,
       round(coalesce(slope, 0.0), 6) AS decay_slope,
       -- ok-round: irrational (ln(2)/slope)
       round(CASE WHEN slope IS NOT NULL AND slope < 0
                  THEN -ln(2.0) / slope ELSE CAST(-1.0 AS DOUBLE) END, 4)
           AS half_life_weeks
FROM fit
"""


QUERIES.update(
    {
        "events_daily_anomaly_days": events_daily_anomaly_days,
        "events_winsorized_stats": events_winsorized_stats,
        "events_props_value_stats": events_props_value_stats,
        "events_first_touch_attribution": events_first_touch_attribution,
        "events_concurrent_sessions_peak": events_concurrent_sessions_peak,
        "events_retention_halflife": events_retention_halflife,
    }
)

ORACLES.update(
    {
        "events_daily_anomaly_days": EVENTS_DAILY_ANOMALY_SQL,
        "events_winsorized_stats": EVENTS_WINSORIZED_SQL,
        "events_props_value_stats": EVENTS_PROPS_VALUE_SQL,
        "events_first_touch_attribution": EVENTS_FIRST_TOUCH_SQL,
        "events_concurrent_sessions_peak": EVENTS_CONCURRENT_PEAK_SQL,
        "events_retention_halflife": EVENTS_RETENTION_HALFLIFE_SQL,
    }
)
