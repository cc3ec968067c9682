"""Multimodal plumbing tests: schema, batch shape, explosion, determinism.

The codecs are stubbed (no PIL/libav in the container) — these tests
verify the Spark-side plumbing is real: Arrow batch round-trips,
declared schemas, per-kind routing, row explosion counts, and
run-to-run determinism of the stubbed decode.
"""

from __future__ import annotations

import pytest

from distributed_file_system_with_stream_processing_spark.operators import multimodal as M
from distributed_file_system_with_stream_processing_spark.sources.tables import load_table

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def media(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    df = M.media_from_documents(docs).cache()
    df.count()
    yield df
    df.unpersist()


def test_media_schema_and_kinds(media):
    assert dict(media.dtypes)["payload"] == "binary"
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}
    meta_fields = {f.name for f in media.schema["meta"].dataType.fields}
    assert meta_fields == {
        "width",
        "height",
        "channels",
        "sample_rate",
        "duration_ms",
        "codec",
    }


def test_decode_images_one_row_per_image(media):
    n_images = media.filter("kind = 'image'").count()
    feats = M.decode_images(media)
    assert feats.count() == n_images
    row = feats.orderBy("media_id").first()
    assert row["width"] >= 16 and row["height"] >= 16 and row["channels"] == 3
    assert 0.0 <= row["mean_luma"] <= 255.0
    assert len(row["payload_sha"]) == 16


def test_decode_images_deterministic(media):
    a = {r["media_id"]: r["mean_luma"] for r in M.decode_images(media).collect()}
    b = {r["media_id"]: r["mean_luma"] for r in M.decode_images(media).collect()}
    assert a == b


def test_resize_images_binary_roundtrip(media):
    out = M.resize_images(media, 32, 24)
    row = out.first()
    assert len(bytes(row["payload"])) == 32 * 24 * 3
    assert row["meta"]["width"] == 32 and row["meta"]["height"] == 24
    # original untouched fields survive the meta rewrite
    assert row["meta"]["sample_rate"] == 16000


def test_sample_frames_explosion_matches_meta(media):
    videos = media.filter("kind = 'video'")
    expected = sum(
        max(r["meta"]["duration_ms"] // 1000, 1)
        for r in videos.select("meta").collect()
    )
    frames = M.sample_frames(media, every_ms=1000)
    assert frames.count() == expected
    one = frames.filter("frame_idx = 1").first()
    assert one["frame_ts_ms"] == 1000
    assert len(bytes(one["frame"])) == 16


def test_audio_features_ranges(media):
    feats = M.audio_features(media)
    assert feats.count() == media.filter("kind = 'audio'").count()
    for r in feats.collect():
        assert 0.0 < r["rms"] <= 1.0
        assert 0.0 <= r["zero_cross"] <= 1.0
        assert r["sample_rate"] == 16000


def test_no_shuffle_in_decode_plan(media):
    """mapInPandas is a narrow transformation — a media decode over
    100 TB must not introduce an exchange."""
    plan = M.decode_images(media)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
