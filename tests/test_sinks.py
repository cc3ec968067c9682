"""Layout sinks: partition pruning and shuffle-free bucketed joins —
plan-level proof that the write-side layout pays off read-side."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from distributed_file_system_with_stream_processing_spark.sinks.parquet import (
    read_partitioned,
    write_bucketed,
    write_partitioned,
)
from distributed_file_system_with_stream_processing_spark.sources.tables import load_table

from .conftest import SF_SMOKE


def test_partitioned_write_prunes(spark, tmp_path):
    events = load_table(spark, SF_SMOKE, "events")
    path = str(tmp_path / "events_by_type")
    write_partitioned(events, path, ["event_type"])

    back = read_partitioned(spark, path).filter(F.col("event_type") == "click")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the pruning filter must be IN the partition filters, and the scan
    # must touch only the one matching directory
    pf = plan.split("PartitionFilters")[1][:200]
    assert "event_type" in pf
    assert back.count() == events.filter("event_type = 'click'").count()


def test_bucketed_join_no_shuffle(spark, tmp_path):
    orders = load_table(spark, SF_SMOKE, "orders")
    lineitem = load_table(spark, SF_SMOKE, "lineitem")
    write_bucketed(orders, "b_orders", str(tmp_path / "b_orders"), "o_orderkey", 8)
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        str(tmp_path / "b_lineitem"),
        "o_orderkey",
        8,
    )
    # at sf0.001 the planner rightly broadcasts instead of using the
    # buckets; force the 100 TB regime (no side fits in memory) to
    # prove the co-located path
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bo = spark.table("b_orders")
        bl = spark.table("b_lineitem")
        joined = bo.join(bl, "o_orderkey").select("o_orderkey", "l_extendedprice")
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located: identical bucketing on the join key → no shuffle
        assert "Exchange" not in plan, plan
        assert "Bucketed: true" in plan, plan
        assert joined.count() == orders.join(
            lineitem, orders.o_orderkey == lineitem.l_orderkey
        ).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_agg_no_shuffle(spark, tmp_path):
    lineitem = load_table(spark, SF_SMOKE, "lineitem")
    write_bucketed(lineitem, "b_li_agg", str(tmp_path / "b_li_agg"), "l_orderkey", 8)
    try:
        agg = (
            spark.table("b_li_agg")
            .groupBy("l_orderkey")
            .agg(F.sum("l_quantity").alias("q"))
        )
        agg.collect()
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
    finally:
        spark.sql("DROP TABLE IF EXISTS b_li_agg")


def test_range_clustered_files_are_disjoint_and_skippable(spark, tmp_path):
    """Every file written by write_range_clustered must own a narrow,
    (near-)disjoint ts range — provable skipping: a day-slice filter
    touches few files, and parquet footer min/max confirm tight row
    groups (what a 100 TB reader's row-group pruning keys on)."""
    import pyarrow.parquet as pq

    from distributed_file_system_with_stream_processing_spark.sinks.parquet import (
        write_range_clustered,
    )

    events = load_table(spark, SF_SMOKE, "events")
    path = str(tmp_path / "events_by_ts")
    write_range_clustered(events, path, "ts", 16)

    back = spark.read.parquet(path)
    assert back.count() == events.count()

    # footer stats: per-file ts spans must be disjoint (range layout)
    spans = []
    files = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert len(files) >= 8
    for f in files:
        md = pq.ParquetFile(os.path.join(path, f)).metadata
        idx = [md.schema.column(i).name for i in range(md.num_columns)].index("ts")
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        spans.append((min(mins), max(maxs)))
    spans.sort()
    overlaps = sum(1 for a, b in zip(spans, spans[1:]) if a[1] > b[0])
    assert overlaps == 0, spans

    # scan-level proof: a one-day filter reads only the overlapping files
    lo, hi = "2024-01-15", "2024-01-16"
    touched = (
        back.filter((F.col("ts") >= lo) & (F.col("ts") < hi))
        .select(F.input_file_name().alias("f"))
        .distinct()
        .count()
    )
    assert 1 <= touched <= 3, touched


def test_zorder_clustered_prunes_2d_box(spark, tmp_path):
    """Z-order layout: a box filter on BOTH clustered columns touches a
    small fraction of files (2D locality), while data is preserved
    exactly. Contrast: a 1D ts-range layout cannot skip on user_id at
    all."""
    from distributed_file_system_with_stream_processing_spark.sinks.parquet import (
        write_zorder_clustered,
    )

    events = load_table(spark, SF_SMOKE, "events").withColumn(
        "ts_num", F.col("ts").cast("double")
    )
    path = str(tmp_path / "events_z")
    write_zorder_clustered(events, path, "user_id", "ts_num", 16)

    back = spark.read.parquet(path)
    assert back.count() == events.count()

    files_total = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    assert files_total >= 8

    # a ~1/4 x 1/4 box on (user_id, time)
    uid_lo, uid_hi = 0, 3
    stats = events.agg(F.min("ts_num"), F.max("ts_num")).first()
    t_lo = stats[0]
    t_hi = stats[0] + (stats[1] - stats[0]) / 4
    box = (
        (F.col("user_id") >= uid_lo)
        & (F.col("user_id") <= uid_hi)
        & (F.col("ts_num") >= t_lo)
        & (F.col("ts_num") < t_hi)
    )
    touched = (
        back.filter(box).select(F.input_file_name().alias("f")).distinct().count()
    )
    assert touched <= files_total // 2, (touched, files_total)
    # exactness preserved
    assert back.filter(box).count() == events.filter(box).count()


def test_bigram_model_bucketed_static_side_no_shuffle(spark, tmp_path):
    """The bigram stream scorer's 100 TB claim (streaming/rainstorm.py
    bigram_ppl_stream): with the persisted LM bucketed on gram, the
    score join reads the model WITHOUT an Exchange — only the arriving
    micro-batch's grams shuffle. Proven here on the batch twin: the
    model side of the join plan has no Exchange above its scan, scores
    are unchanged vs the unbucketed model, and the join reads
    'Bucketed: true'."""
    from distributed_file_system_with_stream_processing_spark.plans import llm_ops4 as M

    docs = load_table(spark, SF_SMOKE, "documents")
    model = M.bigram_model(docs)
    write_bucketed(model, "b_bigram_lm", str(tmp_path / "b_bigram_lm"), "gram", 8)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        static = spark.table("b_bigram_lm")
        scored = M.bigram_score(docs, static)
        expected = {
            (r["doc_id"], r["n_bigrams"], r["bigram_ppl"])
            for r in M.bigram_score(docs, model).collect()
        }
        got = {(r["doc_id"], r["n_bigrams"], r["bigram_ppl"]) for r in scored.collect()}
        assert got == expected and got
        plan = scored._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan, plan
        # the static (model) side must not re-shuffle: a score join
        # with both sides shuffling shows TWO gram Exchanges per
        # SortMergeJoin; with the bucketed model only the docs side
        # shuffles, so the counts are 1:1 (the plan string prints the
        # final + initial AQE sections — the ratio holds in both)
        n_smj = plan.count("SortMergeJoin")
        n_gram_ex = plan.count("Exchange hashpartitioning(gram")
        assert n_smj >= 1 and n_gram_ex == n_smj, (n_smj, n_gram_ex, plan)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_bigram_lm")
