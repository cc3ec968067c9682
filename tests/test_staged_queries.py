"""Staged round-10 queries (plans/llm_ops23.py) — driver-grade oracle
checks run in pytest until they take front slots in round 10.

Runs the EXACT driver compare (tests/oracle_compare.compare) at
sf0.001 AND sf0.01 — the same two scale factors the front discipline
requires before a query may be fronted.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from tests.oracle_compare import compare

SF_T2 = "/root/testdata/sf0.01"


def _pairs():
    from distributed_file_system_with_stream_processing_spark.plans import llm_ops23

    return [
        (name, fn, llm_ops23.ORACLES[name])
        for name, fn in llm_ops23.QUERIES.items()
    ]


@pytest.mark.parametrize(
    "sf_dir", [SF_SMOKE, SF_T2], ids=["sf0.001", "sf0.01"]
)
@pytest.mark.parametrize("name,fn,sql", _pairs(), ids=[p[0] for p in _pairs()])
def test_staged_query_matches_oracle(spark, duck, name, fn, sql, sf_dir):
    df = fn(spark, sf_dir)
    assert df.columns, f"{name}: empty schema"
    ok, msg = compare(df, duck, sql, sf_dir)
    assert ok, f"{name}: {msg}"


def test_kmv_estimate_sane(spark):
    """The KMV estimate is a real distinct-count estimate: within the
    ~1/sqrt(k) band of the exact distinct count at sf0.01."""
    from distributed_file_system_with_stream_processing_spark.plans.llm_ops23 import (
        events_distinct_kmv,
    )
    from distributed_file_system_with_stream_processing_spark.sources.tables import (
        load_table,
    )
    from pyspark.sql import functions as F

    est = {
        r["event_type"]: (r["est_distinct"], r["sketch_size"])
        for r in events_distinct_kmv(spark, SF_T2).collect()
    }
    truth = {
        r["event_type"]: r["d"]
        for r in load_table(spark, SF_T2, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("d"))
        .collect()
    }
    assert set(est) == set(truth)
    for t, (e, sk) in est.items():
        if sk < 64:
            assert e == truth[t]  # exact below k
        else:
            assert 0.5 * truth[t] <= e <= 2.0 * truth[t], (t, e, truth[t])


def test_loghist_percentiles_within_octave(spark):
    """Every reported percentile midpoint lies within one octave of
    the exact percentile at sf0.01 — the sketch's guarantee."""
    from distributed_file_system_with_stream_processing_spark.plans.llm_ops23 import (
        order_percentiles_loghist,
    )
    from distributed_file_system_with_stream_processing_spark.sources.tables import (
        load_table,
    )
    from pyspark.sql import functions as F

    got = {
        (r["o_orderpriority"], r["q"]): r["est_cents"]
        for r in order_percentiles_loghist(spark, SF_T2).collect()
    }
    exact = {
        (r["o_orderpriority"], q): r[f"p{q}"]
        for r in load_table(spark, SF_T2, "orders")
        .groupBy("o_orderpriority")
        .agg(
            *[
                F.expr(
                    f"percentile(cast(round(o_totalprice * 100) as long), {q / 100})"
                ).alias(f"p{q}")
                for q in (50, 95)
            ]
        )
        .collect()
        for q in (50, 95)
    }
    assert set(got) == set(exact)
    for k, est in got.items():
        assert exact[k] / 2 < est < exact[k] * 2, (k, est, exact[k])


def test_staged_plans_no_cartesian_or_bad_loop_join(spark):
    """The registry-wide plan invariant, applied to the staged set
    before they take front slots: nothing cartesians; the only
    loop join is source_jaccard_minhash's METADATA-scale broadcast
    self-join of the |sources|-row sketch table on a strict
    inequality (the embedding_label_drift shape) — BuildRight, the
    corpus touched once upstream in the (source, shingle) agg.

    When these queries are fronted in r10, add source_jaccard_minhash
    to test_plans.test_no_cartesian_or_loop_join_anywhere's
    allowed_loop set with the comment above.
    """
    from tests.test_plans import executed_plan

    allowed_loop = {"source_jaccard_minhash"}
    for name, fn, _sql in _pairs():
        plan = executed_plan(fn(spark, SF_SMOKE))
        assert "CartesianProduct" not in plan, name
        if name not in allowed_loop:
            assert "BroadcastNestedLoopJoin" not in plan, name
        elif "BroadcastNestedLoopJoin" in plan:
            assert "BroadcastNestedLoopJoin BuildRight" in plan, name
