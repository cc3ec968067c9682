"""semantic_dedup sf1 variance protocol (r8 verdict #4): settle the
2-4x session spread on the flagship dedup recipe with ONE pinned,
repeatable measurement instead of re-arguing the box each round.

Protocol (committed to SURVEY §6):

- 3 INTERLEAVED session-rounds; each round measures HEAD, then the
  last-round-commit CONTROL from a git worktree (same box, same
  minute-scale window — interleaving cancels slow environmental drift,
  which the r6-r8 worktree controls showed dominates).
- every (variant, round) runs in a FRESH subprocess + SparkSession
  (local[$SPARK_GRAFT_CPUS], shuffle=32, AQE on — the sf1_rehearsal
  config): COLD = first materialization in the session (JIT +
  plan-build + backbone training included), WARM = min of the 2
  subsequent runs (the plan cost, what the rehearsal grades).
- data: the .sf1 mirror-heavy rehearsal tables (scripts/make_sf1.py).

Emits SEMDEDUP_VARIANCE.json: one row per (variant, round) with cold
and warm walls, plus the verdict fields the judge reads: the
head/control warm ratio per round (code regression signal, ~1.0 =
environmental) and the cross-round spread (box noise).

Usage: python scripts/semdedup_variance.py <control-commit>
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SF1 = str(REPO / ".sf1")
ROUNDS = int(os.environ.get("SEMDEDUP_VARIANCE_ROUNDS", "3"))

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, sys.argv[1])
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.driver.memory", os.environ.get("SF1_DRIVER_MEM", "48g"))
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
from distributed_file_system_with_stream_processing_spark.plans.registry import QUERIES

fn = QUERIES["semantic_dedup"]
sf = sys.argv[2]
walls = []
for _ in range(3):
    t0 = time.time()
    fn(spark, sf).write.format("noop").mode("overwrite").save()
    walls.append(round(time.time() - t0, 2))
print("RESULT " + json.dumps({"cold": walls[0], "warm": round(min(walls[1:]), 2)}))
spark.stop()
"""


def run_session(code_root: str) -> dict:
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(_CHILD)
        child = f.name
    try:
        out = subprocess.run(
            [sys.executable, child, code_root, SF1],
            capture_output=True, text=True, timeout=1800,
        )
        for line in out.stdout.splitlines():
            if line.startswith("RESULT "):
                return json.loads(line[len("RESULT "):])
        raise RuntimeError(f"no RESULT line; stderr tail: {out.stderr[-500:]}")
    finally:
        os.unlink(child)


def main() -> None:
    control_commit = sys.argv[1] if len(sys.argv) > 1 else "HEAD~1"
    ctl_dir = tempfile.mkdtemp(prefix="semdedup_ctl_")
    subprocess.run(
        ["git", "worktree", "add", "--detach", ctl_dir, control_commit],
        cwd=REPO, check=True, capture_output=True,
    )
    rows = []
    try:
        for rnd in range(1, ROUNDS + 1):
            for variant, root in (("head", str(REPO)), ("control", ctl_dir)):
                r = run_session(root)
                r.update(variant=variant, round=rnd)
                rows.append(r)
                print(json.dumps(r), flush=True)
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", ctl_dir],
            cwd=REPO, check=False, capture_output=True,
        )
    by = lambda v, k: [r[k] for r in rows if r["variant"] == v]  # noqa: E731
    summary = {
        "protocol": "3 interleaved fresh-session rounds x (head, control); "
        "cold = 1st materialization, warm = min of 2 more; .sf1 data; "
        f"control = {control_commit}",
        "rows": rows,
        "head_warm": by("head", "warm"),
        "control_warm": by("control", "warm"),
        "warm_ratio_head_over_control": round(
            statistics.median(by("head", "warm"))
            / statistics.median(by("control", "warm")), 3,
        ),
        "cold_spread_head": round(
            max(by("head", "cold")) / min(by("head", "cold")), 2
        ),
    }
    (REPO / "SEMDEDUP_VARIANCE.json").write_text(json.dumps(summary, indent=1) + "\n")
    print(json.dumps({k: v for k, v in summary.items() if k != "rows"}))


if __name__ == "__main__":
    main()
