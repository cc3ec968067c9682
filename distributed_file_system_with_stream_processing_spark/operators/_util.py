"""Shared operator plumbing."""

from __future__ import annotations

from collections import deque

from pyspark.sql import DataFrame
from pyspark.sql.functions import broadcast


def spread(df: DataFrame) -> DataFrame:
    """Repartition raw rows to the session's parallelism BEFORE a
    compute-dense stage. A small-on-disk parquet (one file) scans as a
    single partition, which would pin heavy per-row/per-pair compute to
    one core; shuffling the raw rows first costs almost nothing and
    unlocks every core. At 100 TB the scan is already wide and AQE
    coalesces excess partitions — it never hurts, and it rescues the
    small-input/heavy-compute corner."""
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)


# Tables persisted by cache_bounded/gate_broadcast, unpersisted FIFO
# once newer entries arrive — bounds cached blocks in a long-lived
# session without unpersisting a table the current query still reads.
_GATE_CACHE: deque[DataFrame] = deque(maxlen=4)


def cache_bounded(df: DataFrame) -> DataFrame:
    """persist() with a session-lifetime bound: the FIFO unpersists
    the oldest cached table once ``maxlen`` newer ones arrive, so a
    query that persists an intermediate it returns lazily (opq_topk's
    rotated table, gate_broadcast's pair tables) cannot accumulate
    cached blocks unboundedly across repeated invocations — while the
    most recent entries stay live for the caller still reading them.
    """
    df = df.persist()
    while len(_GATE_CACHE) == _GATE_CACHE.maxlen:
        try:
            _GATE_CACHE.popleft().unpersist()
        except Exception:
            pass
    _GATE_CACHE.append(df)
    return df

def plan_ckpt(df: DataFrame) -> DataFrame:
    """Plan-level lineage truncation for multi-consumer / loop-invariant
    tables (the r9/r10 stage-fusion lever: AQE reuses only canonically
    identical exchanges, and per-branch pruning defeats that for
    repeated subtrees — materializing the smallest shared table runs
    the corpus pass once per invocation).

    Durability is a deployment choice, threaded through ONE switch
    (the r9 verdict's ask): ``localCheckpoint`` stores blocks on
    executors only — fastest, but an executor loss kills the truncated
    lineage — so at 100 TB set the session conf
    ``spark.dfsp.reliableCheckpoint=true`` (and
    ``sparkContext.setCheckpointDir``) to route every plan-level
    truncation through the fault-tolerant ``checkpoint()`` instead,
    exactly like ``operators.dedup._ckpt``'s explicit flag. Nothing
    persists across runs either way: both forms are recomputed and
    rewritten on every invocation.
    """
    reliable = (
        df.sparkSession.conf.get("spark.dfsp.reliableCheckpoint", "false") or "false"
    ).lower() == "true"
    return df.checkpoint(eager=True) if reliable else df.localCheckpoint(eager=True)


# Broadcast bound for gate_broadcast. Conservative vs Spark's 8 GB
# broadcast-table hard cap: candidate-pair rows are two ids + a few
# numerics (~50 B), so 2M rows ≈ 100 MB serialized.
GATE_MAX_ROWS = 2_000_000


def gate_broadcast(df: DataFrame, max_rows: int | None = None) -> tuple[DataFrame, bool]:
    """Size-GATED broadcast hint for tables whose size tracks the data
    (LSH/candidate-pair outputs, dup-member lists).

    An unconditional ``broadcast()`` hint on such a table is the one
    anti-pattern that does not degrade at 100×: pair volume grows with
    corpus size × dup rate, and a hinted broadcast either OOMs the
    driver or hits Spark's 8 GB table cap with no fallback. This gate
    persists the table (it is re-read by the join anyway), counts it —
    one metadata-scale job — and hints only under ``max_rows``;
    above the bound it returns the un-hinted table so the join falls
    back to a plain key shuffle, which is the correct shape for a
    pathological dup rate. Returns ``(table, hinted)`` so call sites
    can keep any dependent outer hints consistent with the decision.
    ``max_rows`` defaults to the module-level ``GATE_MAX_ROWS`` read
    at CALL time (so tests can force the fallback path).
    """
    if max_rows is None:
        max_rows = GATE_MAX_ROWS
    df = cache_bounded(df)
    n = df.count()
    if n <= max_rows:
        return broadcast(df), True
    return df, False
