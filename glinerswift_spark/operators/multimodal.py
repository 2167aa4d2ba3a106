"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schemas, Arrow-batched
mapInPandas with iterator reuse, batch shapes, partitioning — while the
actual codec work is stubbed (this container has no image/audio libs):

  * ``decode_image`` raises NotImplementedError unless the payload is the
    deterministic FAKE format produced by ``make_fake_image`` (a tiny
    header + width/height + per-pixel bytes), which tests use.
  * feature extraction / resize / frame sampling operate on the fake
    decode output with real numpy math, so the dataflow (binary -> decode
    -> transform -> features array) is genuinely exercised end to end.

At 100 TB the same pattern holds: binary column stays columnar in Arrow,
decode happens once per batch inside the Python worker, outputs are fixed
-width float arrays (never Python objects in DataFrame columns).
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FAKE_MAGIC = b"FAKEIMG1"


def make_fake_image(width: int, height: int, seed: int) -> bytes:
    """Deterministic fake image: magic + dims + seeded uint8 pixels."""
    rng = np.random.default_rng(seed)
    pixels = rng.integers(0, 256, size=width * height, dtype=np.uint8)
    return FAKE_MAGIC + struct.pack("<II", width, height) + pixels.tobytes()


def decode_image(payload: bytes) -> np.ndarray:
    """-> uint8 array [height, width]. Real codecs are NOT available in
    this container; any non-fake payload raises NotImplementedError (the
    documented stub seam — swap in PIL/libvips here in production)."""
    if payload is None or len(payload) < 16 or payload[:8] != FAKE_MAGIC:
        raise NotImplementedError(
            "real image codecs unavailable in this environment; "
            "expected FAKEIMG1 test payload"
        )
    w, h = struct.unpack("<II", payload[8:16])
    px = np.frombuffer(payload[16 : 16 + w * h], dtype=np.uint8)
    return px.reshape(h, w)


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Deterministic nearest-neighbor resize (pure numpy)."""
    h, w = img.shape
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[np.ix_(ys, xs)]


def image_features(img: np.ndarray, bins: int = 8) -> np.ndarray:
    """Normalized intensity histogram — a stand-in embedding with the real
    shape contract (fixed-width float vector)."""
    hist, _ = np.histogram(img, bins=bins, range=(0, 256))
    total = hist.sum()
    return (hist / total if total else hist).astype(np.float64)


IMAGE_FEATURE_SCHEMA = StructType(
    [
        StructField("item_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("features", ArrayType(FloatType())),
        StructField("status", StringType()),
    ]
)


def extract_image_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "item_id",
    resize_to: tuple[int, int] | None = (16, 16),
    bins: int = 8,
) -> DataFrame:
    """binary payloads -> (id, width, height, features, status).

    Undecodable payloads yield status='decode_unavailable' rows (never
    fail the batch) — at web scale a poison payload must not kill a task.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, feats, status = [], [], [], [], []
            for item_id, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    img = decode_image(payload)
                except NotImplementedError:
                    ids.append(item_id); ws.append(0); hs.append(0)
                    feats.append([]); status.append("decode_unavailable")
                    continue
                h, w = img.shape
                if resize_to:
                    img = resize_nearest(img, *resize_to)
                ids.append(item_id); ws.append(w); hs.append(h)
                feats.append([float(x) for x in image_features(img, bins)])
                status.append("ok")
            yield pd.DataFrame(
                {"item_id": ids, "width": ws, "height": hs,
                 "features": feats, "status": status}
            )

    return df.select(id_col, payload_col).mapInPandas(run, IMAGE_FEATURE_SCHEMA)


def sample_frames(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "item_id",
    every_nth: int = 2,
) -> DataFrame:
    """'Video' frame sampling over the fake container: payload holding K
    concatenated fake images -> one row per sampled frame. Exercises the
    one-binary -> many-rows explode shape inside mapInPandas."""
    out_schema = StructType(
        [
            StructField("item_id", LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("features", ArrayType(FloatType())),
        ]
    )

    def split_frames(payload: bytes):
        off = 0
        while off + 16 <= len(payload) and payload[off : off + 8] == FAKE_MAGIC:
            w, h = struct.unpack("<II", payload[off + 8 : off + 16])
            end = off + 16 + w * h
            yield payload[off:end]
            off = end

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, feats = [], [], []
            for item_id, payload in zip(pdf[id_col], pdf[payload_col]):
                for i, frame in enumerate(split_frames(payload or b"")):
                    if i % every_nth:
                        continue
                    img = decode_image(frame)
                    ids.append(item_id)
                    idxs.append(i)
                    feats.append([float(x) for x in image_features(img)])
            yield pd.DataFrame({"item_id": ids, "frame_idx": idxs, "features": feats})

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)
