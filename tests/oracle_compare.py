"""Local pre-flight of the driver's t2 gate: run a Spark plan and its
DuckDB oracle on the same parquet, compare row count, column names, and
an order-insensitive value multiset (floats rounded)."""

from __future__ import annotations

import math

from distributed_file_system_with_stream_processing_spark.sources.tables import TABLES


def register_duck_views(con, sf_dir: str) -> None:
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse float-vs-int representation and ulp noise
        return round(v, 6)
    if isinstance(v, int):
        return v
    return str(v)


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)


def compare(spark_df, con, sql: str, sf_dir: str):
    """Return (ok, message). Mirrors the driver: sort columns by name,
    order-insensitive row multiset."""
    register_duck_views(con, sf_dir)
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    res = con.execute(sql)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        return False, f"column mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count mismatch: spark={len(s_rows)} duck={len(d_rows)}"
    sn = _norm_rows(s_cols, s_rows)
    dn = _norm_rows(d_cols, d_rows)
    if sn != dn:
        diff_s = [r for r in sn if r not in dn][:3]
        diff_d = [r for r in dn if r not in sn][:3]
        return False, f"value mismatch; spark-only={diff_s} duck-only={diff_d}"
    return True, "ok"
