"""Dev loop: run named queries against their DuckDB oracles at a given SF.

Usage: python scripts/dev_check.py <sf_dir> <query> [<query> ...]
Not part of the test suite — tests/test_queries.py is the real gate.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

# Make the usage line work as written: only scripts/ is on sys.path
# when invoked as `python scripts/dev_check.py ...`, so the repo root
# (for `tests` and the package) must be inserted explicitly.
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

from tests.oracle_compare import compare


def main() -> int:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    from distributed_file_system_with_stream_processing_spark.plans.registry import (
        ORACLES,
        QUERIES,
    )
    from distributed_file_system_with_stream_processing_spark.session import get_spark

    spark = get_spark(app_name="dev_check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    fails = 0
    for name in names:
        t0 = time.time()
        df = QUERIES[name](spark, sf_dir)
        sql = ORACLES.get(name)
        if sql is None:
            n = df.count()
            print(f"{name}: rows-only, {n} rows, {time.time() - t0:.2f}s")
            continue
        ok, msg = compare(df, con, sql, sf_dir)
        print(f"{name}: {'OK' if ok else 'FAIL'} ({time.time() - t0:.2f}s) {msg if not ok else ''}")
        fails += 0 if ok else 1
    return fails


if __name__ == "__main__":
    sys.exit(main())
