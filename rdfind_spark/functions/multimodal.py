"""Multimodal column plumbing: opaque ``binary`` payloads with typed
metadata, decoded / feature-extracted through Arrow-batched
``mapInPandas``.

The container has no image/audio codecs, so ``decode_image`` is a
clearly-marked stub (NotImplementedError) — but everything Spark-side
is real and tested: the binary column schema, the metadata struct, the
mapInPandas batch shape, and a deterministic feature extractor whose
output is reproducible in SQL (so the driver oracle verifies the whole
Arrow path end-to-end).

Scale notes: binary payloads ride ordinary parquet row groups; feature
extraction is embarrassingly parallel (mapInPandas, no shuffle);
downstream joins treat (doc_id → features) like any other table.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

N_FEATURES = 8


def attach_blobs(documents: DataFrame) -> DataFrame:
    """Simulate a multimodal table: payload = utf-8 bytes of the text
    (stands in for image bytes), metadata = deterministic fake
    width/height/format derived from content."""
    meta = F.struct(
        (F.crc32(F.col("text")) % 1920 + 1).cast("int").alias("width"),
        (F.crc32(F.col("text")) % 1080 + 1).cast("int").alias("height"),
        F.lit("fake/raw").alias("format"),
    )
    return documents.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        meta.alias("meta"),
    )


def decode_image(payload: bytes):  # pragma: no cover - stub by design
    """STUB: real image decoding needs codecs not present in this
    environment.  The Spark-side plumbing (schema, batching, partition
    behavior) is exercised via extract_features instead."""
    raise NotImplementedError(
        "image decoding requires an image codec library; "
        "plug PIL/libvips here in a real deployment"
    )


FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("features", ArrayType(IntegerType())),
        StructField("payload_len", IntegerType()),
    ]
)


def _feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched feature extraction: N_FEATURES ints per payload =
    the ordinals of the first N md5-hexdigest characters (deterministic
    + reproducible in SQL; a real extractor would decode + pool pixel
    data here)."""
    for pdf in batches:
        feats = [
            [ord(c) for c in hashlib.md5(p).hexdigest()[:N_FEATURES]]
            for p in pdf["payload"]
        ]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "features": feats,
                "payload_len": [len(p) for p in pdf["payload"]],
            }
        )


def extract_features(blobs: DataFrame) -> DataFrame:
    """(doc_id, payload, meta) → (doc_id, features, payload_len) via
    mapInPandas — the hot path stays Arrow-vectorized, no Python
    row-at-a-time."""
    return blobs.select("doc_id", "payload").mapInPandas(
        _feature_batches, schema=FEATURES_SCHEMA
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                ]
            ),
        ),
    ]
)


def resize_images(blobs: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing over mapInPandas: batch in, batch out, payload
    re-emitted at the target dimensions.  The pixel operation is a
    deterministic fake (truncate/cycle payload bytes to width*height) —
    swap ``_fake_resize`` for a PIL/libvips call in a real deployment;
    the Spark-side contract (binary in/out, metadata struct, Arrow
    batching, no shuffle) is the tested part."""

    target = width * height

    def _fake_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p in pdf["payload"]:
                b = bytes(p)
                resized = (b * (target // max(len(b), 1) + 1))[:target] if b else b
                out.append(resized)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": out,
                    "meta": [
                        {"width": width, "height": height} for _ in range(len(pdf))
                    ],
                }
            )

    return blobs.select("doc_id", "payload").mapInPandas(
        _fake_resize, schema=RESIZED_SCHEMA
    )


FRAME_SIZE = 64  # bytes per fake frame

FRAMES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(videos: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame sampling plumbing: each binary payload is treated as a
    sequence of FRAME_SIZE-byte frames; every ``every_n``-th frame is
    emitted as its own row (one input batch → many output rows, the
    shape a real video decoder produces).  Deterministic fake decode —
    swap the chunking for ffmpeg/pyav in a real deployment."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(p)
                n = len(b) // FRAME_SIZE
                for i in range(0, n, every_n):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(b[i * FRAME_SIZE : (i + 1) * FRAME_SIZE])
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    return videos.select("doc_id", "payload").mapInPandas(
        _frames, schema=FRAMES_SCHEMA
    )


def multimodal_features(documents: DataFrame) -> DataFrame:
    """End-to-end: documents → fake blobs → Arrow feature extraction,
    exploded to (doc_id, feature_idx, feature) rows (SQL-comparable)."""
    feats = extract_features(attach_blobs(documents))
    return feats.select(
        "doc_id",
        "payload_len",
        F.posexplode("features").alias("feature_idx", "feature"),
    ).select("doc_id", "feature_idx", "feature", "payload_len")


def multimodal_features_sql() -> str:
    """The oracle rendering: md5 of the utf-8 payload == md5 of the
    text, features = ordinals of the first N hex chars."""
    return f"""WITH f AS (
  SELECT doc_id, md5(text) AS h, octet_length(encode(text)) AS payload_len FROM documents
)
SELECT doc_id, i - 1 AS feature_idx, ascii(substr(h, i, 1)) AS feature, payload_len
FROM f, range(1, {N_FEATURES + 1}) r(i)"""
