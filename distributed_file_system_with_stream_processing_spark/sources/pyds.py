"""Spark 4 Python DataSource over the TableStore append-log.

``spark.read.format("tablestore").option("root", ...).option("table",
...)`` reads a TableStore table (reference HyDFS file: base + deferred
append batches, dfs.py) through the PLUGGABLE source API
(pyspark.sql.datasource) instead of the hand-rolled union in
``TableStore.get``:

- one ``InputPartition`` per data FILE (base and append batches alike),
  so a 100 TB log fans out across executors exactly like the native
  parquet reader — the planner sees N independent splits;
- each partition reads its file with pyarrow and yields Arrow
  RecordBatches (the zero-copy fast path of the Python DataSource API)
  with the batch's ``_append_seq`` stamped on, reproducing the merged
  view's ordering contract (``get(with_seq=True)``).

Role: API surface + a second, independently-implemented reader for the
same on-disk format (the tests cross-check it row-for-row against
``TableStore.get``). The native DataFrame union path remains the
performance path at scale — it gets JVM parquet vectorization and
filter pushdown, which Python DataSources do not (Spark evaluates
filters above the source); docstring-level honesty about that division
is part of the design.

The reference has no pluggable source layer (its reads are RPCs into
localstorage.go); this mirrors HyDFS read semantics onto Spark's
official extension point.
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class _FileSplit(InputPartition):
    def __init__(self, path: str, seq: str):
        self.path = path
        self.seq = seq


def _data_files(d: str) -> list[str]:
    if not os.path.isdir(d):
        return []
    return sorted(
        os.path.join(d, f)
        for f in os.listdir(d)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    )


class TableStoreDataSource(DataSource):
    """format name: ``tablestore``; options: ``root``, ``table``."""

    @classmethod
    def name(cls) -> str:
        return "tablestore"

    def _table_dir(self) -> str:
        root = self.options.get("root")
        table = self.options.get("table")
        if not root or not table:
            raise ValueError("tablestore source needs options root and table")
        return os.path.join(root, table)

    def schema(self):
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_schema
        from pyspark.sql.types import StringType, StructField

        base = _data_files(os.path.join(self._table_dir(), "base"))
        if not base:
            raise ValueError(f"no base files under {self._table_dir()!r}")
        st = from_arrow_schema(pq.read_schema(base[0]))
        return st.add(StructField("_append_seq", StringType(), False))

    def reader(self, schema) -> DataSourceReader:
        return _TableStoreReader(self._table_dir(), [f.name for f in schema.fields])


class _TableStoreReader(DataSourceReader):
    def __init__(self, table_dir: str, columns: list[str]):
        self.table_dir = table_dir
        self.columns = columns

    def partitions(self):
        splits = [
            _FileSplit(p, "") for p in _data_files(os.path.join(self.table_dir, "base"))
        ]
        appends = os.path.join(self.table_dir, "appends")
        if os.path.isdir(appends):
            for seq in sorted(os.listdir(appends)):
                for p in _data_files(os.path.join(appends, seq)):
                    splits.append(_FileSplit(p, seq))
        return splits

    def read(self, partition: _FileSplit):
        import pyarrow as pa
        import pyarrow.parquet as pq

        tbl = pq.read_table(partition.path)
        tbl = tbl.append_column(
            "_append_seq", pa.array([partition.seq] * len(tbl), pa.string())
        )
        # column order must match the declared schema exactly
        tbl = tbl.select(self.columns)
        yield from tbl.to_batches()
