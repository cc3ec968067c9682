"""Round-9 staging (FRONTED IN ROUND 10): fully-oracled twins for the
two sketch families that were rows-only by necessity — distinct counts
(HLL internals aren't portable) and approximate percentiles (GK
internals aren't portable). Both staged queries are DETERMINISTIC
sketches, so the ESTIMATE itself is a pure integer function of the
data and carries a full DuckDB value-hash oracle:

- ``events_distinct_kmv``     — k-minimum-values distinct sketch
  (Bar-Yossef et al. 2002) on the portable hash32 family; the oracled
  face of the rows-only ``events_approx_distinct`` (HLL).
- ``order_percentiles_loghist`` — power-of-two log-histogram
  percentiles (DDSketch at γ=2, Masson et al. 2019); the oracled face
  of the rows-only ``order_percentiles_approx`` (GK).

Both plans ARE the batch twins of the r9 streaming ops
(``KmvDistinctOp`` / ``LogHistQuantileOp`` in streaming/ops.py), so
op-vs-query parity holds by construction — the attribution-family
pattern from r8.

NOT yet imported by plans/registry.py: the r9 driver front is at its
50-row cap (wave-3 conversions), so these carry pytest-run DuckDB
oracle checks at sf0.001 + sf0.01 (tests/test_staged_queries.py runs
the EXACT driver compare) and take front slots in round 10.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_file_system_with_stream_processing_spark.sources.tables import load_table
from distributed_file_system_with_stream_processing_spark.streaming.ops import (
    KmvDistinctOp,
    LogHistQuantileOp,
)

_KMV_K = 64
_LH_QS = (50, 95)


def events_distinct_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type via a k-minimum-values sketch —
    the fixed-memory distinct counter whose ESTIMATE is reproducible:
    keep the k smallest distinct hash32(user_id); below k the count is
    exact, past k est = (k−1)·2³² div h_k — all integer, so the oracle
    hashes match bit-for-bit (unlike HLL, where only row counts can be
    checked). The plan IS KmvDistinctOp's batch twin (streaming/ops.py)
    — op-vs-query parity by construction.

    100 TB shape: one distinct-ish shuffle on (key, h) + a rank window
    — but the STREAMING op is the scale path (k longs of state per
    key); this batch face exists to oracle the estimator.
    """
    ev = load_table(spark, sf_dir, "events")
    out = KmvDistinctOp("kmv64", k=_KMV_K)(ev)
    return out.select(
        F.col("key").alias("event_type"),
        "n_seen",
        "sketch_size",
        "est_distinct",
    )


EVENTS_DISTINCT_KMV_SQL = f"""
WITH base AS (
    SELECT event_type AS key,
           ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT AS h
    FROM events
),
counts AS (SELECT key, count(*) AS n_seen FROM base GROUP BY key),
d AS (SELECT DISTINCT key, h FROM base),
rk AS (SELECT key, h,
              row_number() OVER (PARTITION BY key ORDER BY h) AS rn
       FROM d),
mins AS (SELECT key, count(*) AS sketch_size, max(h) AS hk
         FROM rk WHERE rn <= {_KMV_K} GROUP BY key)
SELECT c.key AS event_type, c.n_seen, m.sketch_size,
       CASE WHEN m.sketch_size < {_KMV_K} THEN m.sketch_size
            ELSE (CAST({_KMV_K - 1} AS BIGINT) * 4294967296) // m.hk
       END AS est_distinct
FROM counts c JOIN mins m USING (key)
"""


def order_percentiles_loghist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-value percentiles per priority via the power-of-two
    log-histogram (DDSketch at γ=2): bucket = bit_length(cents), the
    integer rank walk reports the bucket midpoint — a deterministic,
    mergeable percentile with guaranteed one-octave relative error
    whose values a SQL oracle can reproduce exactly (unlike GK). The
    plan IS LogHistQuantileOp's batch twin (streaming/ops.py): the
    histogram shrinks JVM-side (map-side combine into ≤64 buckets per
    key) before the Arrow read-out.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("event_type"),
        F.col("o_totalprice").alias("value"),
    )
    out = LogHistQuantileOp("lh_orders", qs=_LH_QS)(orders)
    return out.select(
        F.col("event_type").alias("o_orderpriority"), "n", "q", "est_cents"
    )


ORDER_PERCENTILES_LOGHIST_SQL = f"""
WITH base AS (
    SELECT o_orderpriority AS k,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders
),
bk AS (SELECT k,
              CASE WHEN cents <= 0 THEN 0
                   ELSE length(printf('%b', cents)) END AS b
       FROM base),
hist AS (SELECT k, b, count(*) AS c FROM bk GROUP BY k, b),
tot AS (SELECT k, sum(c) AS n FROM hist GROUP BY k),
cum AS (SELECT k, b, sum(c) OVER (PARTITION BY k ORDER BY b) AS acc
        FROM hist),
qs AS (SELECT unnest([{", ".join(str(q) for q in _LH_QS)}]) AS q),
ranked AS (
    SELECT t.k, qs.q, t.n, min(cum.b) AS bsel
    FROM tot t
    CROSS JOIN qs
    JOIN cum ON cum.k = t.k
    WHERE cum.acc >= (qs.q * t.n + 99) // 100
    GROUP BY t.k, qs.q, t.n
)
SELECT k AS o_orderpriority, CAST(n AS BIGINT) AS n, CAST(q AS INT) AS q,
       CAST(CASE WHEN bsel <= 0 THEN 0
                 WHEN bsel = 1 THEN 1
                 ELSE (3 * (CAST(1 AS BIGINT) << bsel)) // 4
            END AS BIGINT) AS est_cents
FROM ranked
"""


QUERIES = {
    "events_distinct_kmv": events_distinct_kmv,
    "order_percentiles_loghist": order_percentiles_loghist,
}

ORACLES = {
    "events_distinct_kmv": EVENTS_DISTINCT_KMV_SQL,
    "order_percentiles_loghist": ORDER_PERCENTILES_LOGHIST_SQL,
}
