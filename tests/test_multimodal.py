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


# --- real (pure-numpy) image decoders: PPM P6 + 24-bit BMP -----------------


def _ppm_bytes(img, comment=False):
    import numpy as np

    h, w, _ = img.shape
    hdr = b"P6\n"
    if comment:
        hdr += b"# a comment line\n"
    hdr += f"{w} {h}\n255\n".encode()
    return hdr + np.asarray(img, dtype=np.uint8).tobytes()


def _bmp_bytes(img):
    """Minimal bottom-up 24-bit BI_RGB BMP with 4-byte row padding."""
    import struct

    import numpy as np

    h, w, _ = img.shape
    row = (w * 3 + 3) // 4 * 4
    data_off = 14 + 40
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        line = bytearray()
        for x in range(w):
            r, g, b = img[y, x]
            line += bytes([b, g, r])  # BGR
        line += b"\x00" * (row - len(line))
        body += line
    head = b"BM" + struct.pack(
        "<IHHI", data_off + len(body), 0, 0, data_off
    )
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return bytes(head + dib + body)


def test_decode_ppm_roundtrip():
    import numpy as np

    from marginaliasearch_spark.operators.multimodal import decode_image

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(5, 3, 3), dtype=np.uint8)
    assert np.array_equal(decode_image(_ppm_bytes(img)), img)
    assert np.array_equal(decode_image(_ppm_bytes(img, comment=True)), img)


def test_decode_bmp_roundtrip_with_padding():
    import numpy as np

    from marginaliasearch_spark.operators.multimodal import decode_image

    rng = np.random.default_rng(8)
    # width 3 → 9 bytes/row, padded to 12: exercises the padding path
    img = rng.integers(0, 256, size=(4, 3, 3), dtype=np.uint8)
    assert np.array_equal(decode_image(_bmp_bytes(img)), img)


def test_decode_compressed_still_raises():
    import pytest as _pytest

    from marginaliasearch_spark.operators.multimodal import decode_image

    with _pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0JFIF-fake-jpeg")


def test_image_features_over_real_ppm(spark):
    """image_features with fake=False over real PPM payloads — the same
    mapInPandas plumbing, a real decoder."""
    import numpy as np

    from marginaliasearch_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        image_features,
    )

    imgs = [
        np.full((4, 4, 3), 255, dtype=np.uint8),  # pure white
        np.zeros((2, 6, 3), dtype=np.uint8),  # pure black, non-square
    ]
    rows = [
        (i, "image", bytearray(_ppm_bytes(img)), "image/x-portable-pixmap",
         img.shape[1], img.shape[0], 0)
        for i, img in enumerate(imgs)
    ]
    media = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in image_features(media, fake=False).collect()}
    assert got[0]["mean_r"] == got[0]["mean_g"] == got[0]["mean_b"] == 1.0
    assert got[0]["h7"] == 1.0  # 765 // 96 capped at bin 7
    assert got[1]["mean_r"] == 0.0 and got[1]["h0"] == 1.0
