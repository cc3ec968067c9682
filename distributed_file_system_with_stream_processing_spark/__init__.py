"""PySpark-native analytics + stream-processing engine.

A from-scratch rebuild of the capabilities of
``adish007/Distributed_File_System_with_Stream_Processing`` (a Go
HyDFS + RainStorm stream processor) on idiomatic PySpark:

- ``dfs``        — parquet-backed TableStore (HyDFS create/get/append/merge)
- ``streaming``  — RainStorm-equivalent op pipeline on Structured Streaming
- ``plans``      — the declarative query surface (analytics, rainstorm ops,
                   dedup, similarity, text analysis)
- ``functions``  — reusable Column-level function library (text, vector)
- ``operators``  — composite distributed operators (dedup, ANN)
- ``sources``    — table loaders / schemas

Everything is DataFrame-first so Catalyst handles pushdown, pruning and
join planning; Python UDFs appear only where semantics genuinely require
them, always Arrow-batched.
"""

from distributed_file_system_with_stream_processing_spark.session import get_spark

__all__ = ["get_spark"]
