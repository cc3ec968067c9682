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
exposure is to future data regeneration.

Triage verdicts (r8): a site that KEEPS round() — the irrational
family (sqrt/log/exp/float-coefficient composites: no exact grid
boundary exists for the true value to land on) or exact-decimal
projections (cents/100.0 at 2 dp, micro/10⁶ at 6 dp: the true value
sits ON the grid) — is marked in place with ``ok-round: <reason>``
(a ``#`` comment on/above the F.round call in Python; a ``--``
comment on/above the round( line inside the oracle SQL). Marked
sites are triaged survivors, not exposure; the inventory separates
them so DONE == zero UNMARKED sites. Usage:

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


_MARK = "ok-round:"


def scan_python(path: Path, *, unmarked_only: bool = False) -> list[tuple[int, str]]:
    """(line, enclosing function) for every F.round(<div expr>, n).
    With ``unmarked_only``, sites whose call line (or one of the 3
    lines above — multi-line calls) carries an ``ok-round:`` triage
    marker are suppressed."""
    src_lines = path.read_text().splitlines()
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
            if unmarked_only:
                ctx = "\n".join(src_lines[max(n.lineno - 4, 0) : n.lineno])
                if _MARK in ctx:
                    continue
            hits.append((n.lineno, enclosing(n.lineno)))
    return hits


_SQL_ROUND = re.compile(r"round\s*\(", re.IGNORECASE)


def _sql_round_quotients(sql: str, *, unmarked_only: bool = False) -> int:
    """Count round( calls whose FIRST argument contains a top-level /
    (paren-depth scan; close enough for an inventory). With
    ``unmarked_only``, a site whose opening line (or the line
    directly above) carries an ``ok-round:`` triage comment is
    suppressed — one line only, so adjacent sites cannot be
    suppressed by a neighbor's marker."""
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
            if unmarked_only:
                line_start = sql.rfind("\n", 0, m.start())
                prev_start = sql.rfind("\n", 0, max(line_start, 0))
                line_end = sql.find("\n", m.start())
                ctx = sql[max(prev_start, 0) : line_end if line_end >= 0 else len(sql)]
                if _MARK in ctx:
                    continue
            count += 1
    return count


def scan_sql(path: Path, *, unmarked_only: bool = False) -> int:
    tree = ast.parse(path.read_text())
    total = 0
    for n in ast.walk(tree):
        if isinstance(n, ast.Constant) and isinstance(n.value, str):
            if "round(" in n.value.lower() and "/" in n.value:
                total += _sql_round_quotients(n.value, unmarked_only=unmarked_only)
    return total


def main() -> int:
    per_file = "--per-file" in sys.argv
    total_py = total_sql = 0
    um_py = um_sql = 0
    rows = []
    for path in sorted(PLANS.glob("*.py")):
        hits = scan_python(path)
        sqls = scan_sql(path)
        u_hits = scan_python(path, unmarked_only=True)
        u_sqls = scan_sql(path, unmarked_only=True)
        if hits or sqls:
            rows.append(
                (path.name, len(hits), sqls, len(u_hits), u_sqls,
                 sorted({f for _, f in u_hits}))
            )
            total_py += len(hits)
            total_sql += sqls
            um_py += len(u_hits)
            um_sql += u_sqls
    for name, n_py, n_sql, u_py, u_sql, fns in rows:
        print(
            f"{name:24s} py: {n_py:3d} ({u_py:3d} unmarked)"
            f"  sql: {n_sql:3d} ({u_sql:3d} unmarked)"
        )
        if per_file:
            for f in fns:
                print(f"    {f}")
    print(
        f"TOTAL python sites: {total_py} ({um_py} unmarked), "
        f"sql sites: {total_sql} ({um_sql} unmarked)"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
