"""Derive an sf1-scale rehearsal dataset (10x sf0.1) under the repo.

The driver ships sf{0.001,0.01,0.1}; the r4 verdict asks for an sf1
rehearsal of the expensive queries ("confirm gated broadcasts stay
under bound, no new BNLJ/cartesian appears, record the sf0.1->sf1
scaling factor"). This script stacks TEN key-shifted replicas of every
sf0.1 fact table (dimension tables region/nation stay fixed, as TPC-H
scaling does), with every foreign key shifted by the same replica
stride so join semantics are preserved exactly:

  replica r: c_custkey += r*15_000, s_suppkey += r*1_000,
  p_partkey += r*20_000, o_orderkey += r*150_000 (o_custkey follows
  customer), lineitem follows orders/part/supplier,
  event_id += r*100_000 (user_id += r*1_500), doc_id += r*5_000,
  vec_id += r*2_000.

Text/embedding payloads are NOT perturbed: each document gains nine
verbatim mirrors, so the near-dup pair table grows ~100x (every
cross-replica pair of a former near-dup pair, plus the replica cliques
themselves) — deliberately: a mirror-heavy corpus is the realistic
100 TB dedup regime, and the rehearsal's point is whether the
LSH/CC/ANN plans survive that blowup, not whether row counts scale
politely. Interpret dup-family scaling factors against ~100x pair
growth, everything else against ~10x rows.

Output: /root/repo/.sf1/{table}.parquet (~170 MB). Rerun-safe.
"""

from __future__ import annotations

import sys
from pathlib import Path

# Make `python scripts/<name>.py` work from anywhere: only scripts/ is
# on sys.path when invoked that way, so the repo root must be inserted.
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os

import duckdb

SRC = "/root/testdata/sf0.1"
DST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".sf1")
REPLICAS = 10

# table -> {column: stride} (columns not listed are copied verbatim)
SHIFTS: dict[str, dict[str, int]] = {
    "region": {},
    "nation": {},
    "customer": {"c_custkey": 15_000},
    "supplier": {"s_suppkey": 1_000},
    "part": {"p_partkey": 20_000},
    "orders": {"o_orderkey": 150_000, "o_custkey": 15_000},
    "lineitem": {"l_orderkey": 150_000, "l_partkey": 20_000, "l_suppkey": 1_000},
    "events": {"event_id": 100_000, "user_id": 1_500},
    "documents": {"doc_id": 5_000},
    "embeddings": {"vec_id": 2_000},
}


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    for table, shifts in SHIFTS.items():
        src = f"{SRC}/{table}.parquet"
        dst = f"{DST}/{table}.parquet"
        cols = [r[0] for r in con.execute(f"DESCRIBE SELECT * FROM '{src}'").fetchall()]
        if not shifts:  # dimension table: single copy
            con.execute(f"COPY (SELECT * FROM '{src}') TO '{dst}' (FORMAT PARQUET)")
            print(f"{table}: copied")
            continue
        selects = []
        for r in range(REPLICAS):
            proj = ", ".join(
                f"{c} + {r * shifts[c]} AS {c}" if c in shifts else c for c in cols
            )
            selects.append(f"SELECT {proj} FROM '{src}'")
        con.execute(
            f"COPY ({' UNION ALL '.join(selects)}) TO '{dst}' (FORMAT PARQUET)"
        )
        n = con.execute(f"SELECT count(*) FROM '{dst}'").fetchone()[0]
        print(f"{table}: {n} rows")


if __name__ == "__main__":
    main()
