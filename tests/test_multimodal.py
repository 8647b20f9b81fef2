"""Multimodal plumbing: schemas, mapInPandas batch shapes, stub decoders."""

from __future__ import annotations

from ufo_dedup_spark.functions.multimodal import (
    FEATURE_DIM,
    encode_fake_image,
    encode_fake_video,
    extract_image_features,
    extract_image_metadata,
    sample_video_frames,
)


def _media(spark):
    rows = [
        (1, "image", encode_fake_image(640, 480, b"px"), "https://a/1.jpg"),
        (2, "image", encode_fake_image(32, 32), "https://a/2.jpg"),
        (3, "image", b"not an image", "https://a/3.jpg"),
        (4, "image", None, "https://a/4.jpg"),
        (5, "video", encode_fake_video(25, 5), "https://a/5.mp4"),
        (6, "audio", b"AUD1....", "https://a/6.wav"),
    ]
    return spark.createDataFrame(
        rows, "media_id long, kind string, bytes binary, source_url string"
    )


def test_image_metadata(spark):
    got = {
        r["media_id"]: (r["width"], r["height"], r["valid"])
        for r in extract_image_metadata(_media(spark)).collect()
    }
    assert got[1] == (640, 480, True)
    assert got[2] == (32, 32, True)
    assert got[3] == (None, None, False)
    assert got[4] == (None, None, False)
    assert 5 not in got and 6 not in got  # non-image kinds filtered


def test_image_features_shape_and_determinism(spark):
    feats = {
        r["media_id"]: r["feature"]
        for r in extract_image_features(_media(spark)).collect()
    }
    assert set(feats) == {1, 2, 3}  # null bytes skipped
    for v in feats.values():
        assert len(v) == FEATURE_DIM
        assert abs(sum(x * x for x in v) - 1.0) < 1e-3  # unit norm
    feats2 = {
        r["media_id"]: r["feature"]
        for r in extract_image_features(_media(spark)).collect()
    }
    assert feats == feats2


def test_video_frame_sampling(spark):
    frames = sample_video_frames(_media(spark), every_nth=10).collect()
    idx = sorted(r["frame_idx"] for r in frames)
    assert idx == [0, 10, 20]
    assert all(r["media_id"] == 5 for r in frames)
