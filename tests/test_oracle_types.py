"""Registry-wide oracle type lint.

The driver's value-hash is type-sensitive: DuckDB returns HUGEINT
(int128) for an uncast integer ``sum(...)``, which pandas/Arrow
renders as float64 while Spark's BIGINT renders as int64 — equal
values, different hashes (the exact root cause of the six
CORRECTNESS_r03 ``hash_match: false`` rows, all judge-verified
value-exact). This lint DESCRIBEs every registered oracle against
the sf0.001 views and fails on any HUGEINT/UHUGEINT output column,
so the class of bug can never reach a driver round again. Fix is
always a one-line ``CAST(sum(...) AS BIGINT)`` in the oracle SQL.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from tests.oracle_compare import register_duck_views


def _oracles():
    from distributed_file_system_with_stream_processing_spark.plans.registry import ORACLES

    return sorted(ORACLES.items())


@pytest.mark.parametrize("name,sql", _oracles(), ids=[n for n, _ in _oracles()])
def test_oracle_projects_no_hugeint(duck, name, sql):
    register_duck_views(duck, SF_SMOKE)
    cols = duck.execute(f"DESCRIBE {sql}").fetchall()
    bad = [(c[0], c[1]) for c in cols if "HUGEINT" in c[1].upper()]
    assert not bad, (
        f"{name}: oracle projects int128 column(s) {bad} — wrap the integer "
        "sum() in CAST(... AS BIGINT) so the driver's type-sensitive hash "
        "matches Spark's BIGINT"
    )


def test_integral_div_matches_duckdb(spark, duck):
    """Spark `a div b` and DuckDB `a // b` must agree on EVERY signed
    combination — the precondition for the r8 bulk conversion of
    round(quotient, n) projections to the exact integer-division mean
    idiom ((s * 10^dp) div n). Both truncate toward zero (verified
    here, including negative sums like acctbal aggregates, remainder-
    boundary pairs, and near-overflow magnitudes); a floor-division
    engine would differ at (-7, 2)."""
    cases = []
    for s in [0, 1, -1, 7, -7, 49_999, -49_999, 50_000, -50_000,
              123_456_789, -123_456_789, 2**53, -(2**53),
              (2**62) // 10_000, -((2**62) // 10_000)]:
        for n in [1, 2, 3, 7, -2, -3, 10_000, 86_400]:
            cases.append((s, n))
    df = spark.createDataFrame(cases, "s long, n long")
    got = {
        (r["s"], r["n"]): r["d"]
        for r in df.selectExpr("s", "n", "s div n AS d").collect()
    }
    for (s, n), d in got.items():
        want = duck.execute("select ? // ?", [s, n]).fetchone()[0]
        assert d == want, (s, n, d, want)
        # and both equal C-style truncation — only checkable while
        # s/n is exactly representable; the near-overflow magnitudes
        # above are cross-engine-checked but skip this reference
        if abs(s) < 2**52:
            assert d == int(s / n)
