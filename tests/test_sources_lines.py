"""Line/CSV source tests — the reference's file-format surface
(line-keyed text and the CSV test corpus) driven end-to-end through a
RainStorm job, mirroring user/tests.go test_mp4 over Traffic_Signs CSV.
"""

from __future__ import annotations

import pytest

from distributed_file_system_with_stream_processing_spark.sources import lines as L
from distributed_file_system_with_stream_processing_spark.streaming import ops as O
from distributed_file_system_with_stream_processing_spark.streaming.rainstorm import RainStormJob

CSV = """sign_id,sign_type,street,color
1,stop,Main St,red
2,yield,Oak Ave,red
3,stop,Pine Rd,red
4,speed_25,Main St,white
5,stop,Main St,red
6,speed_35,Elm St,white
"""


@pytest.fixture()
def csv_path(tmp_path):
    p = tmp_path / "signs.csv"
    p.write_text(CSV)
    return str(p)


def test_read_lines_exact_global_numbering(csv_path, spark):
    df = L.read_lines(spark, csv_path)
    rows = sorted((r["line_id"], r["value"]) for r in df.collect())
    expected = list(enumerate(CSV.strip("\n").split("\n")))
    assert rows == expected  # exact 0-based line ids, none skipped


def test_read_csv_schema_and_values(csv_path, spark):
    df = L.read_csv(spark, csv_path, schema="sign_id int, sign_type string, street string, color string")
    assert df.columns == ["sign_id", "sign_type", "street", "color"]
    assert df.count() == 6
    assert df.filter("sign_type = 'stop'").count() == 3


def test_reference_t1_over_csv(csv_path, spark):
    """Test-1 shape on the CSV corpus: pattern filter + projection."""
    signs = L.read_csv(spark, csv_path, schema="sign_id int, sign_type string, street string, color string")
    job = RainStormJob(
        O.filter_contains("street", "Main", ["sign_id", "sign_type"]),
        O.identity(),
    )
    got = sorted((r["sign_id"], r["sign_type"]) for r in job.run_batch(signs).collect())
    assert got == [(1, "stop"), (4, "speed_25"), (5, "stop")]


def test_reference_t2_over_csv(csv_path, spark):
    """Test-2 shape: equality filter → count by category."""
    signs = L.read_csv(spark, csv_path, schema="sign_id int, sign_type string, street string, color string")
    job = RainStormJob(O.filter_equals("color", "red"), O.count_by("sign_type"))
    got = {r["sign_type"]: r["cnt"] for r in job.run_batch(signs).collect()}
    assert got == {"stop": 3, "yield": 1}


def test_stream_lines_tags_source_file(tmp_path, spark):
    src = tmp_path / "incoming"
    src.mkdir()
    (src / "a.txt").write_text("alpha\nbeta\n")
    stream = L.stream_lines(spark, str(src))
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory")
        .queryName("lines_mem")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("select * from lines_mem").collect()
        assert {r["value"] for r in rows} == {"alpha", "beta"}
        assert all(r["src_file"].endswith("a.txt") for r in rows)
    finally:
        q.stop()


def test_read_jsonl_explicit_schema_and_corrupt_routing(spark, tmp_path):
    p = tmp_path / "a.jsonl"
    p.write_text(
        '{"id": 1, "name": "x"}\n'
        'NOT JSON AT ALL\n'
        '{"id": 2, "name": "y"}\n'
    )
    from distributed_file_system_with_stream_processing_spark.sources.lines import read_jsonl

    df = read_jsonl(spark, str(p), "id long, name string")
    rows = df.collect()
    good = {(r["id"], r["name"]) for r in rows if r["_corrupt_record"] is None}
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert good == {(1, "x"), (2, "y")}
    assert len(bad) == 1 and bad[0]["id"] is None

    with pytest.raises(ValueError):
        read_jsonl(spark, str(p), "")


def test_stream_jsonl(spark, tmp_path):
    import os

    src = tmp_path / "src"
    os.makedirs(src)
    (src / "b1.jsonl").write_text('{"id": 1, "name": "x"}\n{"id": 2, "name": "y"}\n')
    from distributed_file_system_with_stream_processing_spark.sources.lines import stream_jsonl

    stream = stream_jsonl(spark, str(src), "id long, name string")
    q = (
        stream.writeStream.format("memory")
        .queryName("jsonl_mem")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = {(r["id"], r["name"]) for r in spark.sql("SELECT * FROM jsonl_mem").collect()}
    assert got == {(1, "x"), (2, "y")}
