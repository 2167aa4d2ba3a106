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
