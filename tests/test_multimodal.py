"""Multimodal plumbing tests: deterministic fake decode, scalar feature
schema, frame-sample explode shape, and the declared real-decode stub."""

import numpy as np
import pytest

from marginaliasearch_spark.operators import multimodal


@pytest.fixture(scope="module")
def media(spark):
    return multimodal.synth_media(spark, n=12).cache()


def test_decode_stub_declares_missing_libs():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x00\x01", fake=False)


def test_fake_decode_deterministic():
    img1 = multimodal.decode_image(b"payload", fake=True)
    img2 = multimodal.decode_image(b"payload", fake=True)
    assert img1.shape == (32, 32, 3) and img1.dtype == np.uint8
    assert np.array_equal(img1, img2)
    assert not np.array_equal(img1, multimodal.decode_image(b"other", fake=True))


def test_image_features_scalar_schema(spark, media):
    feats = multimodal.image_features(media, fake=True)
    assert feats.columns == ["media_id"] + multimodal.FEATURE_COLS
    rows = feats.collect()
    assert len(rows) == 12
    for r in rows:
        assert 0.0 <= r["mean_r"] <= 1.0
        hist = [r[f"h{b}"] for b in range(multimodal.HIST_BINS)]
        assert abs(sum(hist) - 1.0) < 1e-9


def test_frame_sample_explodes_by_duration(spark, media):
    vids = media.filter(media.kind == "video")
    frames = multimodal.frame_sample(vids).collect()
    durations = {r["media_id"]: r["duration_ms"] for r in vids.collect()}
    per_media: dict[int, int] = {}
    for r in frames:
        per_media[r["media_id"]] = per_media.get(r["media_id"], 0) + 1
        assert len(r["frame_hex"]) == 32  # md5 hex frame id
    for mid, n in per_media.items():
        assert n == max(1, durations[mid] // 1000)
    # every video row yields at least one frame
    assert set(per_media) == set(durations)
