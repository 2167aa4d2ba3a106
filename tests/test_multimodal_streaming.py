"""Multimodal binary plumbing + streaming foreachBatch wrapper."""

import numpy as np
import pytest

from glinerswift_spark.operators.multimodal import (
    decode_image,
    extract_image_features,
    image_features,
    make_fake_image,
    resize_nearest,
    sample_frames,
)


def test_fake_image_roundtrip():
    img = decode_image(make_fake_image(8, 4, seed=7))
    assert img.shape == (4, 8) and img.dtype == np.uint8
    # deterministic
    assert np.array_equal(img, decode_image(make_fake_image(8, 4, seed=7)))


def test_decode_real_codec_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG\r\n\x1a\nxxxx")


def test_resize_and_features():
    img = decode_image(make_fake_image(16, 16, seed=1))
    small = resize_nearest(img, 4, 4)
    assert small.shape == (4, 4)
    f = image_features(img, bins=8)
    assert f.shape == (8,) and abs(f.sum() - 1.0) < 1e-9


def test_extract_image_features_spark(spark):
    rows = [
        (1, make_fake_image(16, 8, seed=1)),
        (2, make_fake_image(8, 8, seed=2)),
        (3, b"not an image"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "item_id long, payload binary")
    got = {r.item_id: r for r in extract_image_features(df).collect()}
    assert got[1].status == "ok" and (got[1].width, got[1].height) == (16, 8)
    assert len(got[1].features) == 8
    assert abs(sum(got[1].features) - 1.0) < 1e-6
    assert got[3].status == "decode_unavailable" and got[4].status == "decode_unavailable"


def test_sample_frames_spark(spark):
    video = b"".join(make_fake_image(4, 4, seed=s) for s in range(5))
    df = spark.createDataFrame([(1, video)], "item_id long, payload binary")
    frames = sample_frames(df, every_nth=2).collect()
    assert sorted(r.frame_idx for r in frames) == [0, 2, 4]


def test_streaming_foreach_batch(spark, tmp_path):
    from glinerswift_spark.scoring.backends import FLAGSHIP_LABELS, flagship_gazetteer
    from glinerswift_spark.streaming import kg_foreach_batch, stream_documents

    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    docs = spark.createDataFrame(
        [(1, "scan the table then join the stream", "en", "s", 35)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.parquet(src)

    q = (
        stream_documents(spark, src)
        .writeStream.foreachBatch(
            kg_foreach_batch(out, FLAGSHIP_LABELS, flagship_gazetteer())
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() > 0
    assert {"subj", "pred", "obj", "doc_id", "score"} <= set(got.columns)


def test_pgm_decode_real_format():
    import numpy as np

    from glinerswift_spark.operators.multimodal import decode_image, make_pgm

    img = np.arange(48, dtype=np.uint8).reshape(6, 8)
    assert np.array_equal(decode_image(make_pgm(img)), img)
    # comments and flexible whitespace in the header
    pgm = b"P5\n# made by a scanner\n8 6\n255\n" + img.tobytes()
    assert np.array_equal(decode_image(pgm), img)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="truncated"):
        decode_image(b"P5\n8 6\n255\n" + img.tobytes()[:-1])


def test_wav_decode_and_features():
    import numpy as np

    from glinerswift_spark.operators.multimodal import (
        audio_features,
        decode_wav,
        make_wav,
    )

    t = np.arange(16000) / 16000.0
    sig = (np.sin(2 * np.pi * 440 * t) * 20000).astype(np.int16)
    x, rate = decode_wav(make_wav(sig))
    assert rate == 16000 and len(x) == 16000
    f = audio_features(x, rate)
    # sine RMS = amplitude / sqrt(2); zcr = 2 * f0 / rate
    assert abs(f[0] - (20000 / 32768) / np.sqrt(2)) < 1e-3
    assert abs(f[1] - 2 * 440 / 16000) < 1e-3
    # 440 Hz lives in the lowest of 8 bands over 0..8 kHz
    assert int(np.argmax(f[2:])) == 0
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        decode_wav(b"ID3\x04compressed-audio-bytes")


def test_extract_audio_features_operator(spark):
    import numpy as np

    from glinerswift_spark.operators.multimodal import (
        extract_audio_features,
        make_wav,
    )

    t = np.arange(8000) / 8000.0
    rows = [
        (0, bytearray(make_wav((np.sin(2 * np.pi * 100 * t) * 10000).astype(np.int16), 8000))),
        (1, bytearray(b"\x89PNG not audio")),
        (2, None),
    ]
    df = spark.createDataFrame(rows, "item_id long, payload binary")
    got = {r.item_id: r for r in extract_audio_features(df).collect()}
    assert got[0].status == "ok" and got[0].sample_rate == 8000
    assert got[0].n_samples == 8000 and len(got[0].features) == 10
    assert got[1].status == "decode_unavailable"
    assert got[2].status == "decode_unavailable"


def test_extract_image_features_accepts_pgm(spark):
    import numpy as np

    from glinerswift_spark.operators.multimodal import (
        extract_image_features,
        make_pgm,
    )

    img = np.full((4, 4), 200, dtype=np.uint8)
    df = spark.createDataFrame(
        [(0, bytearray(make_pgm(img)))], "item_id long, payload binary"
    )
    (row,) = extract_image_features(df, resize_to=None).collect()
    assert row.status == "ok" and (row.width, row.height) == (4, 4)
    # all pixels 200 -> all mass in one histogram bin
    assert max(row.features) == 1.0
