"""TIFF 6.0 codec tests — `multimodal._decode_tiff` / `encode_tiff`.

The encoder is the fixture writer (8-bit RGB strips, none/PackBits/LZW,
optional predictor 2, either byte order); the decoder is the general
artifact, so the photometric variants the encoder doesn't write (gray,
WhiteIsZero, palette, 16-bit) are exercised through hand-assembled
single-strip files below.
"""

from __future__ import annotations

import zlib

import numpy as np
import pytest

from marginaliasearch_spark.operators import multimodal as mm


# --- hand-assembled minimal TIFF (little-endian, single strip) -----------


def _mini_tiff(
    w: int,
    h: int,
    data: bytes,
    *,
    photo: int,
    spp: int = 1,
    bps: int = 8,
    colormap: list[int] | None = None,
) -> bytes:
    def b(v: int, size: int) -> bytes:
        return v.to_bytes(size, "little")

    entries: list[tuple[int, int, list[int]]] = [
        (256, 4, [w]),
        (257, 4, [h]),
        (258, 3, [bps] * spp),
        (259, 3, [1]),
        (262, 3, [photo]),
        (273, 4, [0]),  # patched
        (277, 3, [spp]),
        (278, 4, [h]),
        (279, 4, [len(data)]),
    ]
    if colormap is not None:
        entries.append((320, 3, colormap))
    entries.sort()
    data_start = 8 + 2 + len(entries) * 12 + 4
    arrays = bytearray()
    positions = {}
    for tag, typ, values in entries:
        sz = 2 if typ == 3 else 4
        if len(values) * sz > 4:
            positions[tag] = data_start + len(arrays)
            for v in values:
                arrays += b(v, sz)
    strip_off = data_start + len(arrays)
    entries = [
        (t, ty, [strip_off] if t == 273 else vs) for t, ty, vs in entries
    ]
    out = bytearray(b"II*\x00" + b(8, 4) + b(len(entries), 2))
    for tag, typ, values in entries:
        sz = 2 if typ == 3 else 4
        out += b(tag, 2) + b(typ, 2) + b(len(values), 4)
        if len(values) * sz <= 4:
            field = b"".join(b(v, sz) for v in values)
            out += field + b"\x00" * (4 - len(field))
        else:
            out += b(positions[tag], 4)
    out += b(0, 4)
    out += arrays + data
    return bytes(out)


# --- encoder<->decoder round-trips ----------------------------------------


@pytest.mark.parametrize("compression", ["none", "packbits", "lzw"])
@pytest.mark.parametrize("predictor", [1, 2])
@pytest.mark.parametrize("byte_order", ["<", ">"])
@pytest.mark.parametrize("rps", [None, 5, 1])
def test_roundtrip_variants(compression, predictor, byte_order, rps):
    rng = np.random.default_rng(
        zlib.crc32(repr((compression, predictor, byte_order, rps)).encode()) & 0xFFFF
    )
    img = rng.integers(0, 256, (17, 23, 3), dtype=np.uint8)
    enc = mm.encode_tiff(
        img,
        compression=compression,
        predictor=predictor,
        byte_order=byte_order,
        rows_per_strip=rps,
    )
    assert np.array_equal(mm._decode_tiff(enc), img)


def test_lzw_width_bumps_and_table_clear():
    """High-entropy data large enough that the LZW string table passes
    every width bump (9→10→11→12) and hits the 4094-entry Clear."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (96, 96, 3), dtype=np.uint8)
    enc = mm.encode_tiff(img, compression="lzw", predictor=2)
    assert np.array_equal(mm._decode_tiff(enc), img)


def test_packbits_long_runs():
    """Runs longer than 128 split across packets; literal/repeat mix."""
    row = ([7] * 300) + list(range(64)) + ([9] * 3) + [1, 1]
    img = np.array(row * 3, np.uint8).reshape(3, -1, 3)
    enc = mm.encode_tiff(img, compression="packbits")
    assert np.array_equal(mm._decode_tiff(enc), img)


def test_decode_image_dispatch():
    img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    for bo in ("<", ">"):
        assert np.array_equal(
            mm.decode_image(mm.encode_tiff(img, byte_order=bo)), img
        )


# --- decoder-only photometric paths ---------------------------------------


def test_grayscale_black_is_zero():
    g = np.arange(20, dtype=np.uint8).reshape(4, 5)
    t = _mini_tiff(5, 4, g.tobytes(), photo=1)
    out = mm._decode_tiff(t)
    assert out.shape == (4, 5, 3)
    assert np.array_equal(out[:, :, 0], g)
    assert np.array_equal(out[:, :, 1], g)
    assert np.array_equal(out[:, :, 2], g)


def test_grayscale_white_is_zero_inverts():
    g = np.arange(20, dtype=np.uint8).reshape(4, 5)
    out = mm._decode_tiff(_mini_tiff(5, 4, g.tobytes(), photo=0))
    assert np.array_equal(out[:, :, 0], 255 - g)


def test_sixteen_bit_keeps_high_byte():
    g16 = (np.arange(12, dtype=np.uint16) * 4096).reshape(3, 4)
    t = _mini_tiff(4, 3, g16.astype("<u2").tobytes(), photo=1, bps=16)
    out = mm._decode_tiff(t)
    assert np.array_equal(out[:, :, 0], (g16 >> 8).astype(np.uint8))


def test_palette_colormap():
    idx = np.array([[0, 1], [2, 3]], np.uint8)
    # ColorMap: 16-bit entries, all reds then greens then blues
    reds = [0, 65535, 256 * 10, 256 * 20]
    greens = [65535, 0, 256 * 30, 256 * 40]
    blues = [256 * 5, 256 * 6, 0, 65535]
    t = _mini_tiff(
        2, 2, idx.tobytes(), photo=3, colormap=reds + greens + blues
    )
    out = mm._decode_tiff(t)
    assert out[0, 0].tolist() == [0, 255, 5]
    assert out[0, 1].tolist() == [255, 0, 6]
    assert out[1, 0].tolist() == [10, 30, 0]
    assert out[1, 1].tolist() == [20, 40, 255]


def test_rgb_extra_samples_dropped():
    # RGBA-style spp=4: the 4th sample is ignored
    px = np.zeros((2, 2, 4), np.uint8)
    px[..., :3] = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    px[..., 3] = 99
    out = mm._decode_tiff(_mini_tiff(2, 2, px.tobytes(), photo=2, spp=4))
    assert np.array_equal(out, px[..., :3])


@pytest.mark.parametrize("compression", ["none", "packbits", "lzw"])
@pytest.mark.parametrize("predictor", [1, 2])
@pytest.mark.parametrize("tile", [(8, 8), (24, 16), (7, 5)])
def test_tiled_roundtrip(compression, predictor, tile):
    """Tiled layout incl. non-divisor tile sizes (zero-padded edges are
    written full and cropped on decode)."""
    rng = np.random.default_rng(zlib.crc32(repr((compression, predictor, tile)).encode()) & 0xFFFF)
    img = rng.integers(0, 256, (19, 29, 3), dtype=np.uint8)
    for bo in ("<", ">"):
        enc = mm.encode_tiff(
            img,
            compression=compression,
            predictor=predictor,
            byte_order=bo,
            tile=tile,
        )
        assert np.array_equal(mm._decode_tiff(enc), img)


def test_unknown_compression_raises():
    with pytest.raises(ValueError):
        mm._decode_tiff(b"not a tiff")
    # unknown compression id: patch tag 259's value in-place
    t = _mini_tiff(4, 4, b"\x00" * 16, photo=1)
    patched = t.replace(
        (259).to_bytes(2, "little") + (3).to_bytes(2, "little")
        + (1).to_bytes(4, "little") + (1).to_bytes(2, "little"),
        (259).to_bytes(2, "little") + (3).to_bytes(2, "little")
        + (1).to_bytes(4, "little") + (7).to_bytes(2, "little"),
    )
    with pytest.raises(NotImplementedError):
        mm._decode_tiff(patched)


# --- fixture closed form ----------------------------------------------------


def test_synth_tiff_pixels_match_closed_form(spark):
    """Decoding every fixture payload reproduces the splitmix64 closed
    form the SQL oracle replays (all 12 variant combinations covered
    within n=24)."""
    rows = mm.synth_tiff_media(spark, n=24).collect()
    idx = np.arange(mm._N_PIX * 3, dtype=np.uint64)
    for r in rows:
        want = (
            (mm._splitmix64(mm.tiff_pixel_seed(r.media_id) + idx)
             & np.uint64(255))
            .astype(np.uint8)
            .reshape(mm.IMG_H, mm.IMG_W, 3)
        )
        got = mm._decode_tiff(bytes(r.payload))
        assert np.array_equal(got, want), r.media_id
