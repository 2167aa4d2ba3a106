"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schemas, Arrow-batched
mapInPandas with iterator reuse, batch shapes, partitioning. Codecs:

  * REAL, dependency-free decoders for two uncompressed formats:
    binary PGM (P5) grayscale images and RIFF/WAV PCM audio (int16 /
    uint8), both parsed with struct + np.frombuffer. Audio features are
    genuine signal features (RMS, zero-crossing rate, FFT band
    energies) — numpy-only.
  * ``decode_image`` also accepts the deterministic FAKE format from
    ``make_fake_image`` (tests); COMPRESSED codecs (JPEG/PNG/MP3/...)
    raise NotImplementedError — the documented seam where PIL/libvips/
    ffmpeg drop in on a production image (this container ships none).
  * feature extraction / resize / frame sampling are real numpy math,
    so the dataflow (binary -> decode -> transform -> features array)
    is exercised end to end.

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


def make_pgm(img: np.ndarray) -> bytes:
    """uint8 [h, w] -> binary PGM (P5) bytes."""
    h, w = img.shape
    return f"P5\n{w} {h}\n255\n".encode() + np.ascontiguousarray(
        img, dtype=np.uint8
    ).tobytes()


def _decode_pgm(payload: bytes) -> np.ndarray:
    """Binary PGM (P5): ASCII header (width height maxval, '#' comments)
    then raw pixels — a REAL image decode in pure python/numpy."""
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PGM not supported")
    px = np.frombuffer(payload[pos : pos + w * h], dtype=np.uint8)
    if px.size != w * h:
        raise ValueError("truncated PGM payload")
    return px.reshape(h, w)


def decode_image(payload: bytes) -> np.ndarray:
    """-> uint8 array [height, width]. Decodes binary PGM (P5) for real
    and the deterministic FAKEIMG1 test format; COMPRESSED formats raise
    NotImplementedError (the documented seam — swap in PIL/libvips here
    on a production image; this container ships no compression codecs)."""
    if payload is not None and payload[:2] == b"P5":
        return _decode_pgm(payload)
    if payload is None or len(payload) < 16 or payload[:8] != FAKE_MAGIC:
        raise NotImplementedError(
            "compressed image codecs unavailable in this environment; "
            "supported: binary PGM (P5), FAKEIMG1 test payload"
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


# ---------------------------------------------------------------------------
# Audio: RIFF/WAV PCM decode (pure struct/numpy) + spectral features
# ---------------------------------------------------------------------------


def make_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """mono int16 samples -> minimal RIFF/WAV PCM bytes."""
    data = np.ascontiguousarray(samples, dtype="<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16,
        b"data", len(data),
    )
    return hdr + data


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAV PCM -> (float64 samples in [-1, 1] of channel 0, rate).

    Real decode: walks the RIFF chunk list, parses fmt (PCM int16 or
    uint8 only — compressed WAV raises), np.frombuffer on the data
    chunk. The documented seam for everything else (mp3/ogg/flac) is
    NotImplementedError, same contract as decode_image."""
    if payload is None or len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError(
            "compressed/unknown audio formats unavailable; supported: RIFF/WAV PCM"
        )
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack("<4sI", payload[pos : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    audio_fmt, n_ch, rate, _, _, bits = fmt
    if audio_fmt != 1:
        raise NotImplementedError("non-PCM WAV unavailable (compressed audio seam)")
    if bits == 16:
        x = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    elif bits == 8:
        x = (np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported PCM width {bits}")
    if n_ch > 1:
        x = x[::n_ch]  # channel 0
    return x, rate


def audio_features(x: np.ndarray, rate: int, n_bands: int = 8) -> np.ndarray:
    """[rms, zero-crossing rate, n_bands normalized FFT band energies] —
    real signal features, numpy-only."""
    if x.size == 0:
        return np.zeros(2 + n_bands)
    rms = float(np.sqrt(np.mean(x * x)))
    zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
    spec = np.abs(np.fft.rfft(x)) ** 2
    bands = np.array_split(spec, n_bands)
    energy = np.array([float(b.sum()) for b in bands])
    total = energy.sum()
    if total > 0:
        energy = energy / total
    return np.concatenate([[rms, zcr], energy])


AUDIO_FEATURE_SCHEMA = StructType(
    [
        StructField("item_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("features", ArrayType(FloatType())),
        StructField("status", StringType()),
    ]
)


def extract_audio_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "item_id",
    n_bands: int = 8,
) -> DataFrame:
    """binary WAV payloads -> (id, sample_rate, n_samples, features,
    status); undecodable payloads yield status='decode_unavailable' rows
    (a poison payload never kills the task)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, rates, ns, feats, status = [], [], [], [], []
            for item_id, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    x, rate = decode_wav(payload)
                except (NotImplementedError, ValueError):
                    ids.append(item_id); rates.append(0); ns.append(0)
                    feats.append([]); status.append("decode_unavailable")
                    continue
                ids.append(item_id); rates.append(rate); ns.append(len(x))
                feats.append([float(v) for v in audio_features(x, rate, n_bands)])
                status.append("ok")
            yield pd.DataFrame(
                {"item_id": ids, "sample_rate": rates, "n_samples": ns,
                 "features": feats, "status": status}
            )

    return df.select(id_col, payload_col).mapInPandas(run, AUDIO_FEATURE_SCHEMA)
