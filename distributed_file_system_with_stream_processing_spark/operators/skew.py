"""Skew mitigation: salted joins and two-stage salted aggregation.

AQE's skew-join splitting (on in `session.py`) handles sort-merge join
skew at runtime; these explicit operators cover the cases AQE can't:

- ``salted_join`` — replicate the build side ``salt`` ways and spread
  the probe side's hot keys across ``salt`` sub-partitions. For
  big-to-big joins with a few pathological keys (the 100 TB failure
  mode where one task gets 100× the data and the stage never ends).
- ``salted_agg`` — two-stage aggregation: partial agg on
  (key, salt) — which spreads a hot key over ``salt`` reducers — then
  final agg on key over the (tiny) partial results. For skewed
  groupBy where map-side partial aggregation alone can't save the
  single reducer that owns the hot key.

Both produce results IDENTICAL to the unsalted equivalents (tests
prove equality); salt only changes the shuffle layout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "_skew_salt"


def _with_probe_salt(df: DataFrame, salt: int) -> DataFrame:
    # Deterministic spread derived from ROW CONTENT plus the input
    # partition id, not monotonically_increasing_id(): a
    # non-deterministic salt feeding a shuffle makes task retries
    # recompute different ids (correct only via Spark's
    # indeterminate-stage rollback) and blocks optimizer pushdown
    # through the projection. xxhash64 over all columns keeps retries
    # reproducible; mixing in spark_partition_id() (stable per row for
    # a deterministic scan, re-read identically on retry) additionally
    # spreads EXACT-DUPLICATE rows — a hot key made of identical rows
    # would otherwise co-salt onto one reducer, the very pathology the
    # salt exists to break. Residual: identical rows within one input
    # partition still share a salt, bounded by partition size.
    return df.withColumn(
        SALT_COL,
        F.pmod(
            F.xxhash64(*[F.col(c) for c in df.columns], F.spark_partition_id()),
            F.lit(salt),
        ).cast("int"),
    )


def _replicated(df: DataFrame, salt: int) -> DataFrame:
    return df.withColumn(SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: list[str],
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the probe side's keys spread over ``salt``
    sub-keys and the build side replicated ``salt``× . Identical rows
    to ``probe.join(build, on, how)``; shuffle cost = build side × salt
    (keep the build side the smaller one). Supports inner/left joins
    (the probe side is preserved exactly once per match)."""
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    p = _with_probe_salt(probe, salt)
    b = _replicated(build, salt)
    return p.join(b, on + [SALT_COL], how).drop(SALT_COL)


# (partial aggregate builder, final re-aggregate builder) per function
_DECOMPOSABLE = {
    "count": (lambda c: F.count(F.lit(1) if c == "*" else c), F.sum),
    "sum": (F.sum, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt: int = 16,
) -> DataFrame:
    """groupBy(keys).agg(...) in two shuffles, neither of which puts a
    whole hot key on one reducer.

    ``aggs`` maps output name → (func, column) with func one of
    count/sum/min/max (the decomposable aggregates: re-aggregating
    partials yields the exact final value — sum-of-sums, min-of-mins,
    and count partials re-SUMMED). avg = sum/count composed by the
    caller."""
    for name, (fn, _) in aggs.items():
        if fn not in _DECOMPOSABLE:
            raise ValueError(f"{name}: {fn!r} is not a decomposable aggregate")
    partial = (
        _with_probe_salt(df, salt)
        .groupBy(*keys, SALT_COL)
        .agg(
            *[
                _DECOMPOSABLE[fn][0](col).alias(f"_p_{name}")
                for name, (fn, col) in aggs.items()
            ]
        )
    )
    return partial.groupBy(*keys).agg(
        *[
            _DECOMPOSABLE[fn][1](F.col(f"_p_{name}")).alias(name)
            for name, (fn, _) in aggs.items()
        ]
    )
