"""Companion to lint_round_quotients.py: print the exact source line
of every UNMARKED round-over-quotient site (python + SQL) in the given
plan modules, for the file-by-file r8 triage.

    python scripts/locate_round_quotients.py llm_ops3 llm_ops9 ...
"""

from __future__ import annotations

import ast
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
from lint_round_quotients import _MARK, _SQL_ROUND, PLANS, _has_div  # noqa: E402


def locate(path: Path) -> None:
    src = path.read_text()
    lines = src.splitlines()
    tree = ast.parse(src)
    print(f"===== {path.name}")
    for n in ast.walk(tree):
        if (
            isinstance(n, ast.Call)
            and isinstance(n.func, ast.Attribute)
            and n.func.attr == "round"
            and n.args
            and _has_div(n.args[0])
        ):
            ctx = "\n".join(lines[max(n.lineno - 4, 0) : n.lineno])
            if _MARK in ctx:
                continue
            snippet = " ".join(
                l.strip() for l in lines[n.lineno - 1 : min(n.end_lineno, n.lineno + 2)]
            )
            print(f"PY  {n.lineno}: {snippet[:150]}")
    for n in ast.walk(tree):
        if not (isinstance(n, ast.Constant) and isinstance(n.value, str)):
            continue
        s = n.value
        if "round(" not in s.lower() or "/" not in s:
            continue
        for m in _SQL_ROUND.finditer(s):
            depth, i = 1, m.end()
            saw_div = False
            while i < len(s) and depth:
                c = s[i]
                if c == "(":
                    depth += 1
                elif c == ")":
                    depth -= 1
                elif c == "/":
                    saw_div = True
                i += 1
            if not saw_div:
                continue
            line_start = s.rfind("\n", 0, m.start())
            prev_start = s.rfind("\n", 0, max(line_start, 0))
            line_end = s.find("\n", m.start())
            ctx = s[max(prev_start, 0) : line_end if line_end >= 0 else len(s)]
            if _MARK in ctx:
                continue
            in_str_line = s.count("\n", 0, m.start())
            file_line = n.lineno + in_str_line
            frag = s[m.start() : i][:130].replace("\n", " ")
            print(f"SQL {file_line}: {frag}")


def main() -> int:
    names = [a for a in sys.argv[1:] if not a.startswith("-")]
    for name in names:
        locate(PLANS / f"{name}.py")
    return 0


if __name__ == "__main__":
    sys.exit(main())
