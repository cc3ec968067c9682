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

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)


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

    def streamReader(self, schema):
        return _TableStoreStreamReader(
            self._table_dir(), [f.name for f in schema.fields]
        )


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


class _StreamSplit(InputPartition):
    def __init__(self, path: str, seq: str, lo: str, hi: str):
        self.path = path
        self.seq = seq
        self.lo = lo  # exclusive lower bound on _append_seq
        self.hi = hi  # inclusive upper bound


def _batch_max_seq(appends_dir: str, seq: str) -> str:
    """Newest original stamp in a batch dir — the dir name for plain
    batches; compact_appends() batches carry it in a marker file
    (mirrors dfs.TableStore._batch_max_seq)."""
    m = os.path.join(appends_dir, seq, "_max_seq.txt")
    if os.path.isfile(m):
        with open(m) as fh:
            return fh.read().strip()
    return seq


class _TableStoreStreamReader(DataSourceStreamReader):
    """Streaming CDC over the TableStore append log — the
    ``readStream`` twin of ``TableStore.diff``: each micro-batch is
    exactly the rows appended with ``start < _append_seq <= end``.

    Offsets are ``{"seq": <stamp>}`` — the append-log high-water mark,
    monotone because stamps are lexicographic sequence strings.
    ``partitions(start, end)`` emits one split per NEW data file, so
    the micro-batch fans out across executors like the batch reader
    (this is the partition-based ``DataSourceStreamReader`` API, not
    the driver-side simple reader — rows never funnel through the
    driver). Compacted batches (dir named by the EARLIEST folded
    stamp, per-row ``_append_seq`` column, ``_MAX_SEQ`` marker) are
    included when their max stamp is in-window and their rows are
    re-filtered row-level in ``read`` — the same precision contract as
    ``TableStore.diff``, so a compaction between two triggers neither
    drops nor duplicates rows. The base is NOT part of the stream (a
    CDC consumer bootstraps from the batch reader / ``get_as_of``,
    then tails appends from that point).
    """

    def __init__(self, table_dir: str, columns: list[str]):
        self.table_dir = table_dir
        self.columns = columns

    def initialOffset(self) -> dict:
        return {"seq": ""}

    def _appends_dir(self) -> str:
        return os.path.join(self.table_dir, "appends")

    def latestOffset(self) -> dict:
        d = self._appends_dir()
        if not os.path.isdir(d):
            return {"seq": ""}
        seqs = [s for s in os.listdir(d) if not s.startswith(("_", "."))]
        if not seqs:
            return {"seq": ""}
        return {"seq": max(_batch_max_seq(d, s) for s in seqs)}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["seq"], end["seq"]
        d = self._appends_dir()
        splits: list[_StreamSplit] = []
        if not os.path.isdir(d) or hi <= lo:
            return splits
        for seq in sorted(os.listdir(d)):
            if seq.startswith(("_", ".")):
                continue
            if _batch_max_seq(d, seq) <= lo or seq > hi:
                continue
            for p in _data_files(os.path.join(d, seq)):
                splits.append(_StreamSplit(p, seq, lo, hi))
        return splits

    def read(self, partition: _StreamSplit):
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        tbl = pq.read_table(partition.path)
        if "_append_seq" in tbl.column_names:
            # compacted batch: row-level stamps — re-filter to the
            # window so a fold between triggers stays exactly-once
            col = tbl.column("_append_seq")
            mask = pc.and_(
                pc.greater(col, pa.scalar(partition.lo)),
                pc.less_equal(col, pa.scalar(partition.hi)),
            )
            tbl = tbl.filter(mask)
        else:
            tbl = tbl.append_column(
                "_append_seq", pa.array([partition.seq] * len(tbl), pa.string())
            )
        tbl = tbl.select(self.columns)
        yield from tbl.to_batches()

    def commit(self, end: dict) -> None:
        pass

    def stop(self) -> None:
        pass
