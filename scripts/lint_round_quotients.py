"""Inventory of round(quotient, n) final projections — the r8 audit.

The full suite caught a real cross-engine rounding boundary at
sf0.001: ``round(x / y, 4)`` disagrees between Spark (BigDecimal
HALF_UP on the double's shortest decimal repr) and DuckDB (double
rounding) when the quotient lands exactly on a representation
boundary. The fix idiom (events_hour_type_value_interaction,
embedding_label_cohesion) is exact integer floor-division on the
micro-quantized sums BEFORE the final round, so both engines round
the same exact rational.

This script STATICALLY inventories the remaining exposure so the r8
bulk conversion can be driven file-by-file:

- every ``F.round(<expr containing a division>, n)`` call in the
  Python plans (via ast — enclosing function reported);
- every ``round(<... / ...>, n)`` in the oracle SQL strings (regex
  over string constants containing ``round(``).

Sites are POTENTIAL divergences only: all are deterministic on the
driver's fixed sf0.01 data (verified green repeatedly in r7); the
exposure is to future data regeneration. Usage:

    python scripts/lint_round_quotients.py [--per-file]
"""

from __future__ import annotations

import ast
import re
import sys
from pathlib import Path

PLANS = Path(__file__).resolve().parent.parent / (
    "distributed_file_system_with_stream_processing_spark"
) / "plans"


def _has_div(node: ast.AST) -> bool:
    return any(
        isinstance(n, ast.BinOp) and isinstance(n.op, ast.Div)
        for n in ast.walk(node)
    )


def scan_python(path: Path) -> list[tuple[int, str]]:
    """(line, enclosing function) for every F.round(<div expr>, n)."""
    tree = ast.parse(path.read_text())
    # map line -> innermost enclosing function name
    funcs: list[tuple[int, int, str]] = []
    for n in ast.walk(tree):
        if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef)):
            funcs.append((n.lineno, max(getattr(n, "end_lineno", n.lineno), n.lineno), n.name))

    def enclosing(line: int) -> str:
        best = ""
        for lo, hi, name in funcs:
            if lo <= line <= hi:
                best = name  # later (inner) defs overwrite outer
        return best or "<module>"

    hits = []
    for n in ast.walk(tree):
        if (
            isinstance(n, ast.Call)
            and isinstance(n.func, ast.Attribute)
            and n.func.attr == "round"
            and n.args
            and _has_div(n.args[0])
        ):
            hits.append((n.lineno, enclosing(n.lineno)))
    return hits


_SQL_ROUND = re.compile(r"round\s*\(", re.IGNORECASE)


def _sql_round_quotients(sql: str) -> int:
    """Count round( calls whose FIRST argument contains a top-level /
    (paren-depth scan; close enough for an inventory)."""
    count = 0
    for m in _SQL_ROUND.finditer(sql):
        depth, i = 1, m.end()
        saw_div = False
        while i < len(sql) and depth:
            c = sql[i]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            elif c == "/" and depth >= 1:
                saw_div = True
            i += 1
        if saw_div:
            count += 1
    return count


def scan_sql(path: Path) -> int:
    tree = ast.parse(path.read_text())
    total = 0
    for n in ast.walk(tree):
        if isinstance(n, ast.Constant) and isinstance(n.value, str):
            if "round(" in n.value.lower() and "/" in n.value:
                total += _sql_round_quotients(n.value)
    return total


def main() -> int:
    per_file = "--per-file" in sys.argv
    total_py = total_sql = 0
    rows = []
    for path in sorted(PLANS.glob("*.py")):
        hits = scan_python(path)
        sqls = scan_sql(path)
        if hits or sqls:
            rows.append((path.name, len(hits), sqls, sorted({f for _, f in hits})))
            total_py += len(hits)
            total_sql += sqls
    for name, n_py, n_sql, fns in rows:
        print(f"{name:24s} F.round-over-div: {n_py:3d}  sql-round-over-div: {n_sql:3d}")
        if per_file:
            for f in fns:
                print(f"    {f}")
    print(f"TOTAL python sites: {total_py}, sql sites: {total_sql}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
