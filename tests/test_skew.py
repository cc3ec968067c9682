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
