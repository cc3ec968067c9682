"""Multimodal column plumbing — image/audio/video as opaque binary.

A media row is ``(media_id, kind, payload: binary, meta: struct)`` —
the payload is never interpreted JVM-side; all byte-level work happens
in Arrow-batched ``mapInPandas`` stages so a 100 TB media corpus
streams through executors in columnar batches without ever funneling
to the driver.

Codec note: the real decoders (PIL / libav / soundfile) are NOT in
this container, so the byte→pixels/samples step is STUBBED behind
``_codec()``: if a real library is importable it is used, otherwise a
clearly-marked deterministic fake derives stable pseudo-content from
an md5 of the payload. Everything around the stub — schemas, Arrow
batch shapes, UDF signatures, row explosion, partitioning — is real
and is what the tests exercise.

The reference engine has no media path (it streams text lines,
reference rainstorm/rainstorm.go:307-355); this module is part of the
beyond-reference LLM-data-pipeline surface (SURVEY.md §2).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# -- typed metadata schemas ------------------------------------------------

MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary, "
    "meta struct<width:int, height:int, channels:int, "
    "sample_rate:int, duration_ms:int, codec:string>"
)

IMAGE_FEATURES_SCHEMA = (
    "media_id bigint, width int, height int, channels int, "
    "mean_luma double, payload_sha string"
)

RESIZED_SCHEMA = (
    "media_id bigint, payload binary, "
    "meta struct<width:int, height:int, channels:int, "
    "sample_rate:int, duration_ms:int, codec:string>"
)

FRAME_SCHEMA = "media_id bigint, frame_idx int, frame_ts_ms int, frame binary"

FRAME_FEATURES_SCHEMA = (
    "media_id bigint, frame_idx int, frame_ts_ms int, lead_byte int, frame_mean double"
)

AUDIO_FEATURES_SCHEMA = (
    "media_id bigint, duration_ms int, sample_rate int, rms double, zero_cross double"
)


def _codec() -> str:
    """'pil' when a real image codec is importable, else 'stub'."""
    try:
        import PIL.Image  # noqa: F401

        return "pil"
    except ImportError:
        return "stub"


def _stub_digest(payload: bytes) -> np.ndarray:
    """Deterministic fake decode: 16 stable bytes derived from payload."""
    return np.frombuffer(hashlib.md5(payload).digest(), dtype=np.uint8)


# -- fixture builder -------------------------------------------------------


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic synthetic media table from the `documents` table
    (the container has no binary media fixtures): payload = utf-8 text
    bytes, kind cycles image/audio/video by doc_id, meta derived from
    payload length. Pure column expressions — JVM-side, no UDF."""
    payload = F.encode(F.col("text"), "utf-8")
    n = F.length(F.col("text"))
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    meta = F.struct(
        (n % 640 + 16).cast("int").alias("width"),
        (n % 480 + 16).cast("int").alias("height"),
        F.lit(3).alias("channels"),
        F.lit(16000).alias("sample_rate"),
        ((n % 50 + 1) * 1000).cast("int").alias("duration_ms"),
        F.lit("stub").alias("codec"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        meta.alias("meta"),
    )


# -- image path ------------------------------------------------------------


def decode_images(media: DataFrame) -> DataFrame:
    """payload → per-image features. One output row per input row.

    Arrow-batched: each pandas batch holds many images; the stub codec
    reads meta dims and derives a stable mean-luma from the payload
    hash, so results are reproducible run-to-run (required for the
    exactly-once streaming twin)."""
    use_real = _codec() == "pil"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        for pdf in batches:
            rows = []
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                payload = bytes(payload)
                sha = hashlib.sha256(payload).hexdigest()[:16]
                if use_real:
                    from PIL import Image

                    img = np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))
                    h, w, c = img.shape
                    luma = float(img.mean())
                else:
                    # STUB decode: dims from meta, luma from md5(payload)
                    w, h, c = meta["width"], meta["height"], meta["channels"]
                    luma = float(_stub_digest(payload).mean())
                rows.append((mid, w, h, c, luma, sha))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "width",
                    "height",
                    "channels",
                    "mean_luma",
                    "payload_sha",
                ],
            )

    return media.filter(F.col("kind") == "image").mapInPandas(
        gen, schema=IMAGE_FEATURES_SCHEMA
    )


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """payload → payload at new dims (binary in, binary out: the shape
    a real thumbnailing stage has). With PIL importable the real
    decode→resize→re-encode path runs (PNG out); otherwise the stub
    codec re-derives bytes deterministically sized w*h*c from the
    payload hash. Either way the distributed plumbing (Arrow batches,
    binary columns never on the driver) is identical."""
    use_real = _codec() == "pil"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        for pdf in batches:
            out_payload, out_meta = [], []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                payload = bytes(payload)
                m = dict(meta)
                if use_real:
                    from PIL import Image

                    img = Image.open(io.BytesIO(payload)).convert("RGB")
                    resized = img.resize((width, height))
                    buf = io.BytesIO()
                    resized.save(buf, format="PNG")
                    out_payload.append(buf.getvalue())
                    m["channels"] = 3
                else:
                    seed = _stub_digest(payload)
                    n = width * height * int(meta["channels"])
                    # STUB resize: tile the digest to the target byte count
                    out_payload.append(np.tile(seed, n // 16 + 1)[:n].tobytes())
                m["width"], m["height"] = width, height
                out_meta.append(m)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": out_payload,
                    "meta": out_meta,
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(gen, schema=RESIZED_SCHEMA)


# -- video path ------------------------------------------------------------


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video → one row per sampled frame (row explosion inside the
    Arrow batch — the flatMap shape). Frame count = duration/every_ms,
    so output cardinality is testable against meta alone."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                seed = _stub_digest(bytes(payload))
                n_frames = max(int(meta["duration_ms"]) // every_ms, 1)
                for i in range(n_frames):
                    # STUB frame grab: digest rotated by frame index
                    frame = np.roll(seed, i).tobytes()
                    rows.append((mid, i, i * every_ms, frame))
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "frame_ts_ms", "frame"]
            )

    return media.filter(F.col("kind") == "video").mapInPandas(gen, schema=FRAME_SCHEMA)


def frame_features(frames: DataFrame) -> DataFrame:
    """Sampled frame bytes → per-frame scalar features. The SECOND
    Arrow stage of the video path (sample_frames → frame_features):
    two chained ``mapInPandas`` stages with the binary frames staying
    on the executors between them — the decode→featurize pipeline
    shape a real video corpus needs. The feature math (first byte,
    byte mean) runs in numpy over each frame vector; with the stub
    codec the rolled-digest layout makes both reducible to closed
    forms over the md5 bytes, so the whole two-stage UDF chain is
    value-hash-verifiable end to end."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            arrs = [np.frombuffer(bytes(f), dtype=np.uint8) for f in pdf["frame"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "frame_idx": pdf["frame_idx"],
                    "frame_ts_ms": pdf["frame_ts_ms"],
                    "lead_byte": [int(a[0]) for a in arrs],
                    "frame_mean": [float(a.mean()) for a in arrs],
                }
            )

    return frames.mapInPandas(gen, schema=FRAME_FEATURES_SCHEMA)


# -- audio path ------------------------------------------------------------


def audio_features(media: DataFrame) -> DataFrame:
    """payload → scalar audio features. Stub codec synthesizes a
    deterministic sample vector from the payload hash and computes the
    real feature math (rms, zero-crossings) over it — so the numpy
    feature path is genuinely exercised even with fake samples."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                seed = _stub_digest(bytes(payload)).astype(np.float64)
                # STUB samples: 1024 pseudo-samples in [-1, 1]
                samples = (np.tile(seed, 64)[:1024] - 127.5) / 127.5
                rms = float(np.sqrt(np.mean(samples**2)))
                zc = float(np.mean(np.abs(np.diff(np.sign(samples))) > 0))
                rows.append(
                    (mid, int(meta["duration_ms"]), int(meta["sample_rate"]), rms, zc)
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "duration_ms", "sample_rate", "rms", "zero_cross"],
            )

    return media.filter(F.col("kind") == "audio").mapInPandas(
        gen, schema=AUDIO_FEATURES_SCHEMA
    )
