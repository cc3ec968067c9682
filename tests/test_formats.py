"""Multi-format IO + compaction tests."""

from __future__ import annotations

import os

import pytest

from distributed_file_system_with_stream_processing_spark.sinks import formats as FM
from distributed_file_system_with_stream_processing_spark.sources.tables import load_table

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def nation(spark):
    return load_table(spark, SF_SMOKE, "nation")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_orc_roundtrip(spark, nation, tmp_path):
    p = str(tmp_path / "nation_orc")
    FM.write_table(nation, p, "orc")
    back = FM.read_table(spark, p, "orc")
    assert back.schema == nation.schema
    assert _rows(back) == _rows(nation)


def test_orc_predicate_pushdown(spark, nation, tmp_path):
    p = str(tmp_path / "nation_orc2")
    FM.write_table(nation, p, "orc")
    df = FM.read_table(spark, p, "orc").filter("n_regionkey = 0").select("n_name")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "n_regionkey" in plan.split("PushedFilters")[1][:120]


def test_json_roundtrip_with_schema(spark, nation, tmp_path):
    p = str(tmp_path / "nation_json")
    FM.write_table(nation, p, "json")
    ddl = "n_nationkey long, n_name string, n_regionkey long, n_comment string"
    back = FM.read_table(spark, p, "json", schema=ddl).select(*nation.columns)
    assert _rows(back) == _rows(nation)


def test_csv_requires_schema(spark, tmp_path):
    with pytest.raises(ValueError, match="schema"):
        FM.read_table(spark, str(tmp_path), "csv")


def test_avro_gated_with_clear_error(nation, tmp_path):
    with pytest.raises(ValueError, match="spark-avro"):
        FM.write_table(nation, str(tmp_path / "x"), "avro")


def test_compact_files_reduces_count_preserves_rows(spark, tmp_path):
    p = str(tmp_path / "many")
    df = spark.range(0, 10000).selectExpr("id", "id % 7 AS k")
    df.repartition(64).write.parquet(p)
    before = _rows(spark.read.parquet(p))
    stats = FM.compact_files(spark, p, target_bytes_per_file=1 << 30)
    assert stats["files_before"] >= 64
    assert stats["files_after"] == 1
    assert _rows(spark.read.parquet(p)) == before
    # swap left no debris
    assert not os.path.exists(p + ".old") and not os.path.exists(p + ".compacting")


def test_schema_evolution_mergeschema(spark, tmp_path):
    """Parquet appends may ADD columns over a table's life (a pipeline
    adds a feature column); readers opt into the union schema with
    mergeSchema — old files surface the new column as null. At 100 TB
    mergeSchema costs a footer read per file (no data pass), which is
    why it stays opt-in."""
    p = str(tmp_path / "evolving")
    spark.range(0, 5).selectExpr("id", "id * 2 AS a").write.parquet(p)
    spark.range(5, 10).selectExpr("id", "id * 2 AS a", "id * 3 AS b").write.mode(
        "append"
    ).parquet(p)
    merged = spark.read.option("mergeSchema", "true").parquet(p)
    assert set(merged.columns) == {"id", "a", "b"}
    rows = {r["id"]: (r["a"], r["b"]) for r in merged.collect()}
    assert rows[2] == (4, None)  # pre-evolution file: new column null
    assert rows[7] == (14, 21)


def test_compact_files_recovers_interrupted_swap(spark, tmp_path):
    """A crash between the two swap renames leaves path missing and
    .old intact; the next compact_files must roll back and proceed."""
    import shutil

    p = str(tmp_path / "crashy")
    spark.range(0, 1000).write.parquet(p)
    before = _rows(spark.read.parquet(p))
    # simulate the torn state: path renamed away, tmp half-written
    shutil.move(p, p + ".old")
    os.makedirs(p + ".compacting")
    stats = FM.compact_files(spark, p, target_bytes_per_file=1 << 30)
    assert stats["files_after"] >= 1
    assert _rows(spark.read.parquet(p)) == before
    assert not os.path.exists(p + ".old") and not os.path.exists(p + ".compacting")


def test_compact_files_respects_target_size(spark, tmp_path):
    p = str(tmp_path / "sized")
    spark.range(0, 50000).selectExpr("id", "repeat('x', 100) AS pad").repartition(
        40
    ).write.parquet(p)
    total = sum(
        os.path.getsize(os.path.join(p, f))
        for f in os.listdir(p)
        if f.endswith(".parquet")
    )
    stats = FM.compact_files(spark, p, target_bytes_per_file=total // 4 + 1)
    assert 2 <= stats["files_after"] <= 6


def test_compact_files_refuses_partitioned_root(spark, nation, tmp_path):
    """Regression (round-2 ADVICE): a hive-partitioned table root has
    no data files, so the old code computed total=0, read through
    partition discovery, and rewrote to ONE unpartitioned file —
    silently flattening the layout. It must refuse instead."""
    p = str(tmp_path / "part_root")
    nation.write.partitionBy("n_regionkey").parquet(p)
    with pytest.raises(ValueError, match="partitioned table root"):
        FM.compact_files(spark, p)
    # per-partition compaction (the documented usage) still works
    subs = [d for d in os.listdir(p) if not d.startswith(("_", "."))]
    sub = os.path.join(p, subs[0])
    stats = FM.compact_files(spark, sub)
    assert stats["files_after"] >= 1
