"""Real-codec multimodal tests — run only where PIL is importable.

The container this repo is developed in lacks PIL, so these skip clean
there; on a cluster image with Pillow they exercise the REAL
decode→resize→re-encode path through the same Arrow mapInPandas
plumbing the stub tests cover (operators/multimodal.py `_codec()`
probes at call time, no code change needed).
"""

from __future__ import annotations

import io

import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

from distributed_file_system_with_stream_processing_spark.operators import multimodal as M  # noqa: E402


@pytest.fixture(scope="module")
def real_media(spark):
    def png_bytes(w, h, color):
        buf = io.BytesIO()
        Image.new("RGB", (w, h), color).save(buf, format="PNG")
        return buf.getvalue()

    rows = [
        (1, "image", png_bytes(64, 48, (255, 0, 0)), {"width": 64, "height": 48, "channels": 3, "sample_rate": 0, "duration_ms": 0, "codec": "png"}),
        (2, "image", png_bytes(100, 100, (0, 0, 0)), {"width": 100, "height": 100, "channels": 3, "sample_rate": 0, "duration_ms": 0, "codec": "png"}),
    ]
    return spark.createDataFrame(
        rows,
        "media_id long, kind string, payload binary, "
        "meta struct<width:int,height:int,channels:int,sample_rate:int,duration_ms:int,codec:string>",
    )


def test_real_decode_reads_true_dims_and_luma(real_media):
    feats = {r["media_id"]: r for r in M.decode_images(real_media).collect()}
    assert (feats[1]["width"], feats[1]["height"]) == (64, 48)
    assert (feats[2]["width"], feats[2]["height"]) == (100, 100)
    # pure red RGB mean = (255+0+0)/3 = 85; pure black = 0
    assert feats[1]["mean_luma"] == pytest.approx(85.0, abs=0.5)
    assert feats[2]["mean_luma"] == pytest.approx(0.0, abs=0.5)


def test_real_resize_reencodes_at_target_dims(real_media):
    out = M.resize_images(real_media, 32, 24).collect()
    assert len(out) == 2
    for r in out:
        img = Image.open(io.BytesIO(bytes(r["payload"])))
        assert img.size == (32, 24)
        assert (r["meta"]["width"], r["meta"]["height"]) == (32, 24)


def test_real_resize_then_decode_roundtrip(real_media):
    resized = M.resize_images(real_media, 16, 16)
    feats = M.decode_images(
        resized.withColumn("kind", F.lit("image"))
    ).collect()
    assert {(r["width"], r["height"]) for r in feats} == {(16, 16)}
