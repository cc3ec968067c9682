"""Single registry of every (query, oracle) pair the engine exposes.

``__spark_entry__.py`` re-exports these; the driver runs each query at
sf0.01 against its DuckDB oracle (row-count + schema + value hash).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from distributed_file_system_with_stream_processing_spark.plans import (
    analytics,
    analytics_ext,
    analytics_more,
    analytics_tpch2,
    llm_ops,
    rainstorm_queries,
)

QueryFn = Callable[[SparkSession, str], DataFrame]

_MODULES = (analytics, analytics_ext, analytics_tpch2, analytics_more, rainstorm_queries, llm_ops)

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}
for _m in _MODULES:
    for _name, _fn in _m.QUERIES.items():
        if _name in QUERIES:
            raise ValueError(f"duplicate query name {_name!r}")
        QUERIES[_name] = _fn
    ORACLES.update(_m.ORACLES)


def get_queries() -> dict[str, QueryFn]:
    return dict(QUERIES)


def get_oracles() -> dict[str, str]:
    return dict(ORACLES)
