"""Round-6 batch VII: cross-table reconciliation audit.

Same contract as the other ``llm_ops*`` modules: declarative
DataFrame plans (JVM expressions only) with DuckDB oracles mirroring
the exact arithmetic, so value hashes match without tolerances.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_file_system_with_stream_processing_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# orders_reconciliation_audit

_RECON_TOL_CENTS = 1


def orders_reconciliation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority reconciliation of the order header against its
    line detail — the referential-integrity + invariant audit every
    ingestion pipeline runs before trusting a 100 TB drop: does
    ``o_totalprice`` equal Σ l_extendedprice·(1−disc)·(1+tax), are
    there header-less line groups (orphans) or line-less headers
    (empty orders), and how big is the worst discrepancy.

    On this generator the header price is drawn independently of the
    lines, so the audit reports a 100% mismatch rate — the point is
    the OPERATOR (the readout a real pipeline gates on), and the
    numbers are fully deterministic either way.

    Exactness: per-line value rounds to integer cents ONCE (the same
    double product evaluates identically in both engines), per-order
    sums fold as BIGINT, |Δ| compares against a 1-cent tolerance in
    integer space; the two error columns divide/round once per
    priority class. Orphan line groups (no header) bucket under the
    sentinel priority 'ORPHAN_LINEITEM'; headers with no lines count
    in ``n_empty_orders`` with zero computed value and are excluded
    from the error stats (they are a missing-detail signal, not a
    price error).

    100 TB shape: one l_orderkey partial agg over lineitem, then a
    full-outer join against orders co-partitioned on the SAME key
    (one shuffle each side, no broadcast needed at any scale), then
    a |priorities|+1-row rollup. With both tables bucketed by
    orderkey (sinks/parquet.py) the join is shuffle-free.

    Reference parity: the reference's read path audits replica
    consistency on merge (synchronizer.go:75-139, timestamp-dedup +
    identical ordering); this is the analytic twin — an invariant
    audit across two tables of the same logical entity.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("hdr_c"),
    )
    li = load_table(spark, sf_dir, "lineitem")
    line_c = F.round(
        F.col("l_extendedprice")
        * (F.lit(1.0) - F.col("l_discount"))
        * (F.lit(1.0) + F.col("l_tax"))
        * 100
    ).cast("long")
    per_order = li.select("l_orderkey", line_c.alias("c")).groupBy("l_orderkey").agg(
        F.sum("c").alias("li_c"),
        F.count(F.lit(1)).alias("n_lines"),
    )
    j = o.join(per_order, o["o_orderkey"] == per_order["l_orderkey"], "full_outer")
    has_hdr = F.col("o_orderkey").isNotNull()
    has_li = F.col("l_orderkey").isNotNull()
    err_c = F.abs(F.col("hdr_c") - F.col("li_c"))
    rows = j.select(
        F.coalesce("o_orderpriority", F.lit("ORPHAN_LINEITEM")).alias("priority"),
        has_hdr.cast("int").alias("is_hdr"),
        (has_hdr & ~has_li).cast("int").alias("is_empty"),
        (~has_hdr & has_li).cast("int").alias("is_orphan"),
        F.when(has_hdr & has_li & (err_c > _RECON_TOL_CENTS), 1)
        .otherwise(0)
        .alias("is_mism"),
        F.when(has_hdr & has_li, err_c).alias("err_c"),
    )
    per = rows.groupBy("priority").agg(
        F.sum("is_hdr").alias("n_orders"),
        F.sum("is_empty").alias("n_empty"),
        F.sum("is_orphan").alias("n_orphan"),
        F.sum("is_mism").alias("n_mism"),
        F.count("err_c").alias("n_matched"),
        F.sum("err_c").alias("sum_err_c"),
        F.max("err_c").alias("max_err_c"),
    )
    return per.select(
        "priority",
        F.col("n_orders").cast("long").alias("n_orders"),
        F.col("n_empty").cast("long").alias("n_empty_orders"),
        F.col("n_orphan").cast("long").alias("n_orphan_li_groups"),
        F.col("n_mism").cast("long").alias("n_mismatched"),
        # r8 conversion: mean abs-error cents is an exact truncating
        # integer-division quotient
        F.when(
            F.col("n_matched") > 0,
            F.expr("sum_err_c div n_matched").cast("double") / 100.0,
        )
        .otherwise(F.lit(0.0))
        .alias("avg_abs_err"),
        # ok-round: exact cents grid (2 dp)
        F.round(F.coalesce(F.col("max_err_c"), F.lit(0)) / 100.0, 2).alias(
            "max_abs_err"
        ),
    )


ORDERS_RECONCILIATION_SQL = f"""
WITH per_order AS (
    SELECT l_orderkey,
           sum(CAST(round(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)
                          * 100) AS BIGINT)) AS li_c,
           count(*) AS n_lines
    FROM lineitem GROUP BY l_orderkey
),
hdr AS (
    SELECT o_orderkey, o_orderpriority,
           CAST(round(o_totalprice * 100) AS BIGINT) AS hdr_c
    FROM orders
),
j AS (
    SELECT coalesce(o_orderpriority, 'ORPHAN_LINEITEM') AS priority,
           CASE WHEN o_orderkey IS NOT NULL THEN 1 ELSE 0 END AS is_hdr,
           CASE WHEN o_orderkey IS NOT NULL AND l_orderkey IS NULL
                THEN 1 ELSE 0 END AS is_empty,
           CASE WHEN o_orderkey IS NULL AND l_orderkey IS NOT NULL
                THEN 1 ELSE 0 END AS is_orphan,
           CASE WHEN o_orderkey IS NOT NULL AND l_orderkey IS NOT NULL
                     AND abs(hdr_c - li_c) > {_RECON_TOL_CENTS}
                THEN 1 ELSE 0 END AS is_mism,
           CASE WHEN o_orderkey IS NOT NULL AND l_orderkey IS NOT NULL
                THEN abs(hdr_c - li_c) END AS err_c
    FROM hdr FULL OUTER JOIN per_order ON o_orderkey = l_orderkey
)
SELECT priority,
       CAST(sum(is_hdr) AS BIGINT) AS n_orders,
       CAST(sum(is_empty) AS BIGINT) AS n_empty_orders,
       CAST(sum(is_orphan) AS BIGINT) AS n_orphan_li_groups,
       CAST(sum(is_mism) AS BIGINT) AS n_mismatched,
       CASE WHEN count(err_c) > 0
            THEN CAST(sum(err_c) // count(err_c) AS DOUBLE) / 100.0
            ELSE CAST(0.0 AS DOUBLE) END AS avg_abs_err,
       -- ok-round: exact cents grid (2 dp)
       round(coalesce(max(err_c), 0) / 100.0, 2) AS max_abs_err
FROM j GROUP BY priority
"""


QUERIES = {
    "orders_reconciliation_audit": orders_reconciliation_audit,
}

ORACLES = {
    "orders_reconciliation_audit": ORDERS_RECONCILIATION_SQL,
}
