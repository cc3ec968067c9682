"""Skew operators: salted join / salted agg must equal their unsalted
twins exactly on a deliberately skewed dataset (one key owning ~90% of
rows — the 100 TB straggler shape)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributed_file_system_with_stream_processing_spark.operators import skew as K


@pytest.fixture(scope="module")
def skewed(spark):
    hot = spark.range(9000).select(
        F.lit("hot").alias("k"), (F.col("id") % 7).cast("double").alias("v")
    )
    cold = spark.range(1000).select(
        F.concat(F.lit("k"), (F.col("id") % 50).cast("string")).alias("k"),
        F.col("id").cast("double").alias("v"),
    )
    df = hot.unionByName(cold).cache()
    df.count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def dim(spark):
    rows = [("hot", "H")] + [(f"k{i}", f"D{i}") for i in range(50)]
    return spark.createDataFrame(rows, "k string, label string")


def test_salted_join_equals_plain_inner(skewed, dim):
    plain = skewed.join(dim, "k").groupBy("k", "label").count()
    salted = K.salted_join(skewed, dim, ["k"], salt=8).groupBy("k", "label").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_keeps_unmatched(skewed, dim):
    extra = skewed.unionByName(
        skewed.sparkSession.createDataFrame([("orphan", 1.0)], "k string, v double")
    )
    plain = extra.join(dim, "k", "left").groupBy("k").count()
    salted = K.salted_join(extra, dim, ["k"], salt=8, how="left").groupBy("k").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
    assert salted.filter("k = 'orphan'").count() == 1


def test_salted_agg_equals_plain(skewed):
    plain = {
        r["k"]: (r["cnt"], r["total"], r["lo"], r["hi"])
        for r in skewed.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("v").alias("total"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
        .collect()
    }
    salted = {
        r["k"]: (r["cnt"], r["total"], r["lo"], r["hi"])
        for r in K.salted_agg(
            skewed,
            ["k"],
            {"cnt": ("count", "*"), "total": ("sum", "v"), "lo": ("min", "v"), "hi": ("max", "v")},
            salt=8,
        ).collect()
    }
    assert plain == salted


def test_salted_agg_rejects_non_decomposable(skewed):
    with pytest.raises(ValueError, match="not a decomposable"):
        K.salted_agg(skewed, ["k"], {"a": ("avg", "v")})


def test_salt_column_not_leaked(skewed, dim):
    out = K.salted_join(skewed, dim, ["k"], salt=4)
    assert K.SALT_COL not in out.columns

def test_aqe_skew_join_splits_hot_partition(spark):
    """AQE's runtime skew-join handling — the first line of defense
    before the explicit salted ops above. Build a join where one key
    owns ~95% of a side, force a sort-merge join, shrink the skew
    thresholds so local data qualifies, and assert the executed plan
    actually split the hot partition (the join is marked ``skew=true``).
    At 100 TB this is the difference between one task processing a
    hot key's entire shuffle partition and N tasks sharing it."""
    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "2KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        left = spark.range(200_000).select(
            F.when(F.col("id") % 20 != 0, F.lit(0)).otherwise(F.col("id")).alias("k"),
            F.col("id").alias("v"),
        )
        right = spark.range(0, 200_000, 1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        j = left.join(right, "k").groupBy().agg(F.sum("v").alias("s"), F.sum("w").alias("t"))
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:4000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_triangle_census_planted_hub_no_last_reducer(spark):
    """The adversarial input the Suri-Vassilvitskii degree ordering
    exists for: one hub doc sharing a band with 10k docs (a star),
    plus a small planted clique for nonzero triangles. The census must
    be EXACT, and — the measured bound — no wedge-apex may own more
    than C(max_out_degree, 2) wedges with max_out_degree O(√m): a
    naive neighbor self-join would put C(10_000, 2) ≈ 5·10⁷ wedge
    rows on the hub's reducer; degree-from-smaller-endpoint orientation
    puts ZERO wedges on the hub (every star edge points AT it)."""
    import math

    from distributed_file_system_with_stream_processing_spark.plans.llm_ops6 import (
        triangle_census,
    )

    hub_n = 10_000
    star = spark.range(1, hub_n + 1).select(
        F.lit(0).cast("long").alias("a"), F.col("id").alias("b")
    )
    # planted 5-clique among high ids (disjoint from the star)
    clique_ids = [hub_n + 10 + i for i in range(5)]
    clique = spark.createDataFrame(
        [(a, b) for i, a in enumerate(clique_ids) for b in clique_ids[i + 1 :]],
        "a long, b long",
    )
    e = star.unionByName(clique)
    m = hub_n + 10  # edges
    got = triangle_census(e).collect()[0]
    assert got["n_edges"] == m
    # wedges: hub C(10000,2) + each clique node C(4,2)=6 + leaves 0
    assert got["n_wedges"] == hub_n * (hub_n - 1) // 2 + 5 * 6
    assert got["n_triangles"] == 10  # C(5,3)
    # measured per-apex bound: recompute the orientation exactly as
    # the census does and take the max out-degree
    sym = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    deg = sym.groupBy(F.col("a").alias("node")).agg(F.count(F.lit(1)).alias("d"))
    da = deg.select(F.col("node").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("d").alias("db"))
    ranked = e.join(da, "a").join(db, "b")
    fwd = F.struct(F.col("da").alias("d"), F.col("a").alias("n")) < F.struct(
        F.col("db").alias("d"), F.col("b").alias("n")
    )
    out_deg = (
        ranked.select(F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("src"))
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("od"))
        .agg(F.max("od").alias("mx"))
        .collect()[0]["mx"]
    )
    bound = int(math.isqrt(2 * m)) + 1
    assert out_deg <= bound, (out_deg, bound)
    # per-apex wedge work is C(out_deg, 2) — five orders of magnitude
    # under the naive hub reducer's C(10k, 2)
    assert out_deg * (out_deg - 1) // 2 < 100_000


def test_khop_reach_planted_hub_exact_distances(spark):
    """Bounded BFS through a 10k-leaf hub: seed → hub at hop 1 → ALL
    leaves at hop 2 → clique beyond horizon unreachable. Exact
    distances, frontier dedup keeps each node once."""
    from distributed_file_system_with_stream_processing_spark.plans.llm_ops6 import (
        khop_reach,
    )

    hub_n = 10_000
    # node 1 is the seed (seeds_below=2); hub is node 5; leaves 10..
    seed_edge = spark.createDataFrame([(1, 5)], "a long, b long")
    star = spark.range(10, hub_n + 10).select(
        F.lit(5).cast("long").alias("a"), F.col("id").alias("b")
    )
    last_leaf = hub_n + 9  # star leaves are 10 .. hub_n+9
    far = spark.createDataFrame(
        [(last_leaf, 20_000), (20_000, 20_001)], "a long, b long"
    )  # chain off one leaf: dist 3 then 4 > horizon 3
    e = seed_edge.unionByName(star).unionByName(far)
    got = {r["doc_id"]: r["dist"] for r in khop_reach(e, 2, 3).collect()}
    assert got[1] == 0 and got[5] == 1
    # every leaf at exactly 2
    leaves = {k: v for k, v in got.items() if 10 <= k <= last_leaf}
    assert len(leaves) == hub_n and set(leaves.values()) == {2}
    assert got[20_000] == 3 and 20_001 not in got


# ---------------------------------------------------------------------------
# Attribution-family user skew (r8 verdict watch item): the
# first/last/linear batch plans join purchases×prior-events equi-keyed
# on user_id with the 24 h bound as a join filter, so one power user
# enumerates O(purchases_u × events_u) pairs before filtering. Plant
# exactly that shape — one user with 10⁴ in-window events — and pin
# the exact integer outputs (AQE skew-join covers the hot key at
# cluster scale; this pins that the PLAN's semantics survive the
# fan-out — see PLANS.md "attribution user-skew note").


@pytest.fixture(scope="module")
def power_user_events(spark):
    views = spark.range(10_000).selectExpr(
        "id AS event_id",
        "'view' AS event_type",
        "CAST(id AS TIMESTAMP) AS ts",  # sec 0..9999
        "CAST(1 AS LONG) AS user_id",
    )
    extra = spark.createDataFrame(
        [
            (10_000, "purchase", 10_500, 1),
            (10_001, "purchase", 11_000, 1),
            (10_002, "purchase", 12_000, 1),
            (20_000, "purchase", 0, 2),  # nothing prior -> direct
        ],
        "event_id long, event_type string, sec long, user_id long",
    ).selectExpr(
        "event_id", "event_type", "CAST(sec AS TIMESTAMP) AS ts", "user_id"
    )
    df = views.unionByName(extra).cache()
    df.count()
    yield df
    df.unpersist()


def test_first_touch_batch_under_power_user_skew(power_user_events):
    from distributed_file_system_with_stream_processing_spark.streaming import ops as O

    got = {
        r["attributed_type"]: r["delta"]
        for r in O.FirstTouchOp("ft")(power_user_events).collect()
    }
    # all three skewed-user purchases first-touch to view id 0
    assert got == {"view": 3, "direct": 1}


def test_last_touch_batch_under_power_user_skew(power_user_events):
    from distributed_file_system_with_stream_processing_spark.streaming import ops as O

    got = {
        r["attributed_type"]: r["delta"]
        for r in O.LastTouchOp("lt")(power_user_events).collect()
    }
    # p@10500 -> view@9999; p@11000 -> purchase@10500; p@12000 ->
    # purchase@11000
    assert got == {"view": 1, "purchase": 2, "direct": 1}


def test_linear_attribution_batch_under_power_user_skew(power_user_events):
    from distributed_file_system_with_stream_processing_spark.streaming import ops as O

    got = {
        r["attributed_type"]: r["delta_micro"]
        for r in O.LinearAttributionOp("lin")(power_user_events).collect()
    }
    # hand-computed exact integer splits (base = 10^6 div n, earliest
    # candidate takes the remainder):
    # p1: n=10000 -> views 10^6
    # p2: n=10001, base 99 rem 9901 -> views 999901, purchase 99
    # p3: n=10002, base 99 rem 9802 -> views 999802, purchases 198
    assert got == {"view": 2_999_703, "purchase": 297, "direct": 1_000_000}
    # conservation: 10^6 per purchase, exactly
    assert sum(got.values()) == 4 * 1_000_000
