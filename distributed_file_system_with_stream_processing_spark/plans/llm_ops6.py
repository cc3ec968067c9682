"""Training-data curation queries, sixth LLM-pipeline module (round 4).

Same contract as ``llm_ops``…``llm_ops5``: declarative DataFrame
plans (JVM expressions only), each with a DuckDB oracle mirroring the
exact arithmetic so value hashes match without tolerances.

Ops here:
- ``neardup_communities`` — deterministic synchronous label
  propagation (Raghavan et al. 2007) over the MinHash-LSH near-dup
  graph: the community-detection complement of ``dedup_clusters``'s
  connected components (bounded-hop majority membership vs
  any-path reachability). Oracle: the shared MinHash pair CTE chained
  into 3 unrolled LPA rounds (vote counts + row_number argmax).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_file_system_with_stream_processing_spark.operators import dedup as D
from distributed_file_system_with_stream_processing_spark.plans.llm_ops import (
    _MINHASH_PAIRS_BODY,
)
from distributed_file_system_with_stream_processing_spark.sources.tables import load_table

_LPA_ROUNDS = 3


def neardup_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup COMMUNITIES via deterministic synchronous label
    propagation over the MinHash-LSH candidate pairs —
    ``dedup_clusters``'s complement: CC fuses anything connected by
    ANY path (a 10k-doc chain of pairwise near-dups becomes one
    cluster), while ``_LPA_ROUNDS`` LPA rounds bound the membership
    horizon, so only docs whose duplicate signal has majority support
    within 3 hops share a community — the granularity a dedup-rate
    audit wants when boilerplate chains would otherwise glue
    unrelated sources into one mega-cluster.

    Exactness: synchronous rounds + self-loop vote + (count desc,
    label asc) tie-break make the result a pure function of the edge
    set (see operators/dedup.label_propagation); the oracle unrolls
    the identical rounds as CTEs, bit-for-bit.

    100 TB shape: LSH pair generation is the bucketed backbone shared
    with dedup_minhash_lsh; the symmetrized edge list is pair-scale
    and rides the size-gated broadcast; each round is two
    map-side-partial shuffles (vote count, per-node argmax). Rounds
    are a fixed constant — no convergence loop, no driver iteration
    count that scales with data.
    """
    pairs = D.minhash_lsh_pairs(
        load_table(spark, sf_dir, "documents"), n=3, num_hashes=12, bands=6
    )
    lpa = D.label_propagation(pairs, n_rounds=_LPA_ROUNDS)
    return lpa.select(
        F.col("node").alias("doc_id"), F.col("community").alias("community")
    )


def _lpa_rounds_sql(n: int) -> str:
    parts = []
    for t in range(1, n + 1):
        parts.append(
            f"""
v{t} AS (
    SELECT f.a AS node, l.lab AS lab, count(*) AS c
    FROM full_e f JOIN lab{t - 1} l ON f.b = l.node
    GROUP BY f.a, l.lab
),
lab{t} AS (
    SELECT node, lab FROM (
        SELECT node, lab,
               row_number() OVER (PARTITION BY node ORDER BY c DESC, lab ASC) AS rn
        FROM v{t}) WHERE rn = 1
)"""
        )
    return ",".join(parts)


NEARDUP_COMMUNITIES_SQL = (
    _MINHASH_PAIRS_BODY
    + f""",
e AS (SELECT DISTINCT da AS a, db AS b FROM cand WHERE da <> db),
sym AS (SELECT a, b FROM e UNION ALL SELECT b AS a, a AS b FROM e),
nodes AS (SELECT DISTINCT a AS node FROM sym),
full_e AS (SELECT a, b FROM sym UNION ALL SELECT node AS a, node AS b FROM nodes),
lab0 AS (SELECT node, node AS lab FROM nodes),
{_lpa_rounds_sql(_LPA_ROUNDS)}
SELECT node AS doc_id, lab AS community FROM lab{_LPA_ROUNDS}
"""
)


QUERIES = {
    "neardup_communities": neardup_communities,
}

ORACLES = {
    "neardup_communities": NEARDUP_COMMUNITIES_SQL,
}
