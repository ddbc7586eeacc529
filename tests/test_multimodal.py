"""Multimodal plumbing: typed metadata, stubbed decode, resize,
features, frame sampling — schema/batch shapes are the real contract
(the decoder itself is a documented deterministic stub)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from rio_toa_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media_df(spark):
    png_magic = bytes([137, 80, 78, 71]) + b"rest-of-payload"
    jpg_magic = b"\xff\xd8\xff\xe0" + b"jfif-payload"
    rows = [
        (1, png_magic),
        (2, jpg_magic),
        (3, b"RIFFxxxxWAVE"),
        (4, b"\x00\x01opaque"),
    ]
    return spark.createDataFrame(rows, "media_id int, payload binary")


def test_describe_media_types(spark, media_df):
    out = {r.media_id: r.media_meta for r in mm.describe_media(media_df).collect()}
    assert out[1].media_type == "image/png"
    assert out[2].media_type == "image/jpeg"
    assert out[3].media_type == "audio/wav"
    assert out[4].media_type == "application/octet-stream"
    assert all(m.n_bytes > 0 and m.content_hash > 0 for m in out.values())


def test_decode_deterministic(spark, media_df):
    a = {r.media_id: r.pixels for r in mm.decode_image(media_df).collect()}
    b = {r.media_id: r.pixels for r in mm.decode_image(media_df).collect()}
    assert a == b
    assert all(len(v) == 32 * 32 * 3 for v in a.values())


def test_resize_shapes(spark, media_df):
    decoded = mm.decode_image(media_df)
    small = mm.resize_image(decoded, out_h=8, out_w=8).collect()
    for r in small:
        assert (r.height, r.width, r.channels) == (8, 8, 3)
        assert len(r.pixels) == 8 * 8 * 3
    # nearest-neighbor: resized pixels are a subset sample of source
    src = {r.media_id: np.frombuffer(r.pixels, np.uint8).reshape(32, 32, 3) for r in decoded.collect()}
    for r in small:
        arr = np.frombuffer(r.pixels, np.uint8).reshape(8, 8, 3)
        assert np.array_equal(arr[0, 0], src[r.media_id][0, 0])


def test_image_features(spark, media_df):
    out = mm.image_features(mm.decode_image(media_df)).collect()
    for r in out:
        assert len(r.features) == 6  # mean + std per channel
        assert all(0 <= f <= 255 for f in r.features[:3])


def test_sample_video_frames_expands_rows(spark, media_df):
    out = mm.sample_video_frames(media_df, n_frames=4).collect()
    assert len(out) == media_df.count() * 4
    by_media = {}
    for r in out:
        by_media.setdefault(r.media_id, set()).add(r.frame_idx)
    assert all(v == {0, 1, 2, 3} for v in by_media.values())
    # frames differ from each other (per-frame seed)
    first = [r for r in out if r.media_id == 1]
    assert len({r.pixels for r in first}) == 4
