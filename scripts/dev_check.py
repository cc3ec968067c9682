"""Dev loop: run named queries against their DuckDB oracles at a given SF.

Usage: python scripts/dev_check.py <sf_dir> <query> [<query> ...]
Not part of the test suite — tests/test_queries.py is the real gate.

Standing rehearsal gate (r6 verdict item 5): any NEW query whose
sf0.1 wall here is ≥1 s must get a 10× rehearsal row in the same round
it lands — add it to scripts/sf1_rehearsal.py's QUERIES_UNDER_TEST and
re-run (scripts/make_sf1.py builds the .sf1 data). This script prints
a reminder when a checked query crosses the threshold at an sf0.1 dir.
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
        wall = time.time() - t0
        print(f"{name}: {'OK' if ok else 'FAIL'} ({wall:.2f}s) {msg if not ok else ''}")
        if ok and "sf0.1" in sf_dir and wall >= 1.0:
            from distributed_file_system_with_stream_processing_spark.plans import (  # noqa: PLC0415
                registry,
            )

            rehearsed = _rehearsal_list()
            if name in registry.QUERIES and name not in rehearsed:
                print(
                    f"  REHEARSAL GATE: {name} costs {wall:.1f}s at sf0.1 and is "
                    "not in scripts/sf1_rehearsal.py QUERIES_UNDER_TEST — add it "
                    "and run the 10x rehearsal this round (r6 verdict item 5)"
                )
        fails += 0 if ok else 1
    return fails


def _rehearsal_list() -> set[str]:
    """QUERIES_UNDER_TEST from scripts/sf1_rehearsal.py, parsed without
    importing it (it builds a SparkSession at import)."""
    import ast

    src = (Path(__file__).resolve().parent / "sf1_rehearsal.py").read_text()
    tree = ast.parse(src)
    for node in ast.walk(tree):
        if (
            isinstance(node, ast.Assign)
            and any(
                isinstance(t, ast.Name) and t.id == "QUERIES_UNDER_TEST"
                for t in node.targets
            )
            and isinstance(node.value, (ast.List, ast.Tuple))
        ):
            return {
                c.value
                for c in node.value.elts
                if isinstance(c, ast.Constant) and isinstance(c.value, str)
            }
    return set()


if __name__ == "__main__":
    sys.exit(main())
