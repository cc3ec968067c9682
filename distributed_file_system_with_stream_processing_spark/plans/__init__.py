from distributed_file_system_with_stream_processing_spark.plans.registry import (
    ORACLES,
    QUERIES,
    get_oracles,
    get_queries,
)

__all__ = ["QUERIES", "ORACLES", "get_queries", "get_oracles"]
