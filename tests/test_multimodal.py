"""Multimodal plumbing: decode round-trip, feature extraction, resize,
frame sampling, and the real-format stub boundary."""

import numpy as np
import pytest

from documentai_ocr_spark.multimodal import (
    decode_media,
    encode_image,
    extract_media_features,
    resize_images,
    sample_video_frames,
    synth_media,
)


@pytest.fixture(scope="module")
def media(spark):
    # synth_media is fully deterministic — no need to round-trip blobs
    # through the driver for stability
    return synth_media(spark, 60).repartition(4)


def test_decode_roundtrip():
    kind, arr = decode_media(encode_image(8, 10, seed=3))
    assert kind == "image" and arr.shape == (8, 10) and arr.dtype == np.uint8
    # determinism
    assert (decode_media(encode_image(8, 10, seed=3))[1] == arr).all()


def test_real_format_stub():
    with pytest.raises(NotImplementedError):
        decode_media(b"\x89PNG\r\n\x1a\n....")


def test_features_all_kinds(spark, media):
    rows = {r.media_id: r for r in extract_media_features(media).collect()}
    assert len(rows) == 60
    kinds = {r.kind for r in rows.values()}
    assert kinds == {"image", "audio", "video"}
    for r in rows.values():
        assert r.n_bytes > 0 and r.p_low <= r.p_high
        if r.kind == "image":
            assert r.h > 0 and r.w > 0 and r.n_units == r.h * r.w


def test_resize(spark, media):
    rows = resize_images(media, 12, 12).collect()
    assert rows and all(r.h == 12 and r.w == 12 for r in rows)
    kind, arr = decode_media(bytes(rows[0].content))
    assert kind == "image" and arr.shape == (12, 12)


def test_frame_sampling(spark, media):
    rows = sample_video_frames(media, stride=2).collect()
    assert rows
    by_id = {}
    for r in rows:
        by_id.setdefault(r.media_id, []).append(r.frame_idx)
    # expected frames come from the SOURCE metadata, not from the
    # sampler's own output — a truncating sampler must fail here
    want = {
        r.media_id: list(range(0, r.meta.n_frames, 2))
        for r in media.collect()
        if r.kind == "video"
    }
    assert set(by_id) == set(want)
    for mid, idxs in by_id.items():
        assert sorted(idxs) == want[mid], mid
