"""Baseline JPEG codec: round-trip, subsampling, tables, oracle parity.

The decoder is general (table-driven Huffman, any DQT, up to 2x2
sampling, DRI/RSTn); the encoder is the 4:4:4 fixture writer. Round-trip
tests pin the full AC path against an independent IDCT reconstruction;
the DuckDB twin is pinned through the DC-only fixture.
"""

import duckdb
import numpy as np
import pytest

from marginaliasearch_spark.functions.sql_oracles import jpeg_features_sql
from marginaliasearch_spark.operators import multimodal as mm

Q16 = np.full(64, 16, dtype=np.int64)


def _expected_rgb(planes):
    y, cb, cr = (p.astype(np.float64) for p in planes)
    r = np.floor(y + 1.402 * (cr - 128.0) + 0.5)
    g = np.floor(
        y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0) + 0.5
    )
    b = np.floor(y + 1.772 * (cb - 128.0) + 0.5)
    return np.clip(np.stack([r, g, b], axis=2), 0, 255).astype(np.uint8)


def _idct_plane(coeffs, q, nby, nbx):
    a = mm._dct_basis()
    plane = np.zeros((nby * 8, nbx * 8))
    for by in range(nby):
        for bx in range(nbx):
            blk = np.zeros(64)
            blk[mm._ZIGZAG] = coeffs[by, bx][mm._ZIGZAG] * q[mm._ZIGZAG]
            plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                a.T @ blk.reshape(8, 8) @ a
            )
    return np.clip(np.floor(plane + 128.0 + 0.5), 0, 255).astype(np.int64)


def test_roundtrip_with_ac_coefficients():
    rng = np.random.default_rng(7)
    coeffs = np.zeros((4, 4, 3, 64), dtype=np.int64)
    coeffs[..., 0] = rng.integers(-64, 64, size=(4, 4, 3))
    mask = rng.random((4, 4, 3, 63)) < 0.2
    acs = rng.integers(-40, 41, size=(4, 4, 3, 63))
    acs[acs == 0] = 1
    coeffs[..., 1:] = np.where(mask, acs, 0)
    img = mm.decode_jpeg(mm.encode_jpeg(coeffs, 32, 32, Q16))
    exp = _expected_rgb(
        [_idct_plane(coeffs[:, :, c], Q16, 4, 4) for c in range(3)]
    )
    assert np.array_equal(img, exp)


def test_roundtrip_dense_ac_exercises_zrl_and_stuffing():
    # every AC populated -> long (run,size) streams; values chosen so the
    # entropy stream is long enough to contain stuffed 0xFF bytes with
    # high probability across blocks
    rng = np.random.default_rng(11)
    coeffs = rng.integers(-30, 31, size=(2, 2, 3, 64)).astype(np.int64)
    coeffs[coeffs == 0] = 3
    coeffs[..., 0] = np.clip(coeffs[..., 0], -64, 63)
    img = mm.decode_jpeg(mm.encode_jpeg(coeffs, 16, 16, Q16))
    exp = _expected_rgb(
        [_idct_plane(coeffs[:, :, c], Q16, 2, 2) for c in range(2 + 1)]
    )
    assert np.array_equal(img, exp)


def test_huffman_canonical_mixed_lengths():
    # symbols 5 (len 1, code 0), 9 (len 2, code 10), 2 (len 3, code 110)
    counts = [1, 1, 1] + [0] * 13
    table = mm._HuffTable(counts, bytes([5, 9, 2]))

    class Bits:
        def __init__(self, s):
            self.s, self.i = s, 0

        def read_bit(self):
            self.i += 1
            return int(self.s[self.i - 1])

    assert mm._huff_decode(Bits("0"), table) == 5
    assert mm._huff_decode(Bits("10"), table) == 9
    assert mm._huff_decode(Bits("110"), table) == 2


def _marker(m, body):
    return bytes([0xFF, m]) + (len(body) + 2).to_bytes(2, "big") + body


def test_grayscale_single_component():
    # hand-built 8x8 single-component DC-only JPEG: k = 10 -> plane 148
    dc = mm._huff_canonical_codes(mm._ENC_DC_COUNTS, mm._ENC_DC_VALUES)
    ac = mm._huff_canonical_codes(mm._ENC_AC_COUNTS, mm._ENC_AC_VALUES)
    bw = mm._BitWriter()
    code, ln = dc[4]  # category of 10
    bw.write(code, ln)
    bw.write(10, 4)
    code, ln = ac[0x00]
    bw.write(code, ln)
    data = (
        b"\xff\xd8"
        + _marker(0xDB, bytes([0]) + Q16.astype(np.uint8)[mm._ZIGZAG].tobytes())
        + _marker(0xC0, bytes([8, 0, 8, 0, 8, 1, 1, 0x11, 0]))
        + _marker(0xC4, bytes([0x00]) + bytes(mm._ENC_DC_COUNTS) + mm._ENC_DC_VALUES)
        + _marker(0xC4, bytes([0x10]) + bytes(mm._ENC_AC_COUNTS) + mm._ENC_AC_VALUES)
        + _marker(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + bw.flush()
        + b"\xff\xd9"
    )
    img = mm.decode_jpeg(data)
    assert img.shape == (8, 8, 3)
    assert np.all(img == 2 * 10 + 128)


def test_chroma_subsampling_420():
    # hand-built 16x16 4:2:0: one MCU = 4 Y blocks + Cb + Cr, DC-only
    dc = mm._huff_canonical_codes(mm._ENC_DC_COUNTS, mm._ENC_DC_VALUES)
    ac = mm._huff_canonical_codes(mm._ENC_AC_COUNTS, mm._ENC_AC_VALUES)
    ky = [20, -20, 5, -5]
    kcb, kcr = 8, -8
    bw = mm._BitWriter()
    pred = 0
    for k in ky:  # Y blocks, diff-coded within the component
        diff = k - pred
        pred = k
        t = abs(diff).bit_length()
        code, ln = dc[t]
        bw.write(code, ln)
        if t:
            bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
        code, ln = ac[0x00]
        bw.write(code, ln)
    for k in (kcb, kcr):
        t = abs(k).bit_length()
        code, ln = dc[t]
        bw.write(code, ln)
        if t:
            bw.write(k if k >= 0 else k + (1 << t) - 1, t)
        code, ln = ac[0x00]
        bw.write(code, ln)
    data = (
        b"\xff\xd8"
        + _marker(0xDB, bytes([0]) + Q16.astype(np.uint8)[mm._ZIGZAG].tobytes())
        + _marker(
            0xC0,
            bytes([8, 0, 16, 0, 16, 3, 1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0]),
        )
        + _marker(0xC4, bytes([0x00]) + bytes(mm._ENC_DC_COUNTS) + mm._ENC_DC_VALUES)
        + _marker(0xC4, bytes([0x10]) + bytes(mm._ENC_AC_COUNTS) + mm._ENC_AC_VALUES)
        + _marker(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
        + bw.flush()
        + b"\xff\xd9"
    )
    img = mm.decode_jpeg(data)
    assert img.shape == (16, 16, 3)
    # Y quadrants constant; chroma constant after nearest upsample
    y = np.zeros((16, 16), dtype=np.int64)
    y[:8, :8], y[:8, 8:] = 2 * ky[0] + 128, 2 * ky[1] + 128
    y[8:, :8], y[8:, 8:] = 2 * ky[2] + 128, 2 * ky[3] + 128
    cb = np.full((16, 16), 2 * kcb + 128, dtype=np.int64)
    cr = np.full((16, 16), 2 * kcr + 128, dtype=np.int64)
    assert np.array_equal(img, _expected_rgb([y, cb, cr]))


def test_extended_sequential_sof1_decodes_like_sof0():
    rng = np.random.default_rng(23)
    coeffs = np.zeros((2, 2, 3, 64), dtype=np.int64)
    coeffs[..., 0] = rng.integers(-64, 64, size=(2, 2, 3))
    payload = mm.encode_jpeg(coeffs, 16, 16, Q16)
    base = mm.decode_jpeg(payload)
    # SOF1 (extended sequential) is byte-identical decoding at 8-bit
    # precision: rewrite only the frame marker
    sof1 = payload.replace(b"\xff\xc0", b"\xff\xc1", 1)
    assert b"\xff\xc1" in sof1
    assert np.array_equal(mm.decode_jpeg(sof1), base)


def test_16bit_quant_table():
    # same quant values carried as Pq=1 (16-bit big-endian) entries must
    # decode identically; values above 255 must survive
    rng = np.random.default_rng(29)
    coeffs = np.zeros((1, 1, 3, 64), dtype=np.int64)
    coeffs[..., 0] = rng.integers(-10, 10, size=(1, 1, 3))
    payload = mm.encode_jpeg(coeffs, 8, 8, Q16)
    base = mm.decode_jpeg(payload)
    qzig = Q16[mm._ZIGZAG].astype(">u2").tobytes()
    dqt8 = _marker(0xDB, bytes([0]) + Q16[mm._ZIGZAG].astype(np.uint8).tobytes())
    dqt16 = _marker(0xDB, bytes([0x10]) + qzig)
    assert dqt8 in payload
    assert np.array_equal(mm.decode_jpeg(payload.replace(dqt8, dqt16, 1)), base)
    # a step of 300 (> uint8) through the 16-bit path: DC-only block of
    # k=1 decodes to the constant (300/8)*... -> just assert round-trip
    # against an independent IDCT with the wide table
    q300 = np.full(64, 300, dtype=np.int64)
    co = np.zeros((1, 1, 3, 64), dtype=np.int64)
    co[0, 0, :, 0] = [1, -1, 2]
    pay = mm.encode_jpeg(co, 8, 8, Q16).replace(
        dqt8, _marker(0xDB, bytes([0x10]) + q300[mm._ZIGZAG].astype(">u2").tobytes()), 1
    )
    img = mm.decode_jpeg(pay)
    exp = _expected_rgb(
        [_idct_plane(co[:, :, c], q300, 1, 1) for c in range(3)]
    )
    assert np.array_equal(img, exp)


def test_arithmetic_coding_raises():
    # SOF9 (extended sequential, arithmetic coding) is genuinely out
    data = b"\xff\xd8" + _marker(0xC9, bytes([8, 0, 8, 0, 8, 1, 1, 0x11, 0]))
    with pytest.raises(NotImplementedError):
        mm.decode_jpeg(data)


def test_progressive_equals_baseline_dc_only():
    rng = np.random.default_rng(3)
    coeffs = np.zeros((4, 4, 3, 64), dtype=np.int64)
    coeffs[..., 0] = rng.integers(-64, 64, size=(4, 4, 3))
    base = mm.decode_jpeg(mm.encode_jpeg(coeffs, 32, 32, Q16))
    prog = mm.decode_jpeg(mm.encode_jpeg_progressive(coeffs, 32, 32, Q16))
    assert np.array_equal(base, prog)


def test_progressive_equals_baseline_with_ac():
    # sparse AC: newly-nonzero refinement placements + cross-block EOB
    # runs; dense small values: +-1 coefficients are invisible in the
    # Al=1 first scan and must appear via refinement (run, 1) codes
    rng = np.random.default_rng(17)
    for dens, lo, hi in ((0.2, -40, 41), (1.0, -5, 6)):
        coeffs = np.zeros((4, 4, 3, 64), dtype=np.int64)
        coeffs[..., 0] = rng.integers(-100, 100, size=(4, 4, 3))
        mask = rng.random((4, 4, 3, 63)) < dens
        acs = rng.integers(lo, hi, size=(4, 4, 3, 63))
        acs[acs == 0] = 1
        coeffs[..., 1:] = np.where(mask, acs, 0)
        base = mm.decode_jpeg(mm.encode_jpeg(coeffs, 32, 32, Q16))
        prog = mm.decode_jpeg(
            mm.encode_jpeg_progressive(coeffs, 32, 32, Q16)
        )
        assert np.array_equal(base, prog)


def test_progressive_fuzz_scan_scripts():
    # randomized densities, spectral split points, and DC point
    # transforms: the progressive stream must reassemble the exact
    # coefficient array of its baseline twin in every configuration
    for trial in range(20):
        rng = np.random.default_rng(100 + trial)
        coeffs = np.zeros((2, 3, 3, 64), dtype=np.int64)
        coeffs[..., 0] = rng.integers(-128, 128, size=(2, 3, 3))
        mask = rng.random((2, 3, 3, 63)) < rng.random()
        acs = rng.integers(-60, 61, size=(2, 3, 3, 63))
        coeffs[..., 1:] = np.where(mask, acs, 0)
        split = int(rng.integers(1, 63))
        dal = int(rng.integers(1, 3))
        base = mm.decode_jpeg(mm.encode_jpeg(coeffs, 16, 24, Q16))
        prog = mm.decode_jpeg(
            mm.encode_jpeg_progressive(
                coeffs, 16, 24, Q16, dc_al=dal, ac_split=split
            )
        )
        assert np.array_equal(base, prog), (trial, split, dal)


def test_progressive_stream_is_genuinely_sof2():
    coeffs = np.zeros((1, 1, 3, 64), dtype=np.int64)
    payload = mm.encode_jpeg_progressive(coeffs, 8, 8, Q16)
    assert b"\xff\xc2" in payload and b"\xff\xc0" not in payload
    assert payload.count(b"\xff\xda") >= 6  # multi-scan ladder


def test_progressive_fixture_matches_duckdb_oracle(spark):
    media = mm.synth_jpeg_progressive_media(spark, n=6)
    feats = mm.image_features(media, fake=False).collect()
    got = {
        r.media_id: tuple(
            round(float(getattr(r, c)), 6) for c in mm.FEATURE_COLS
        )
        for r in feats
    }
    exp = {
        row[0]: tuple(row[1:])
        for row in duckdb.sql(jpeg_features_sql(6, prefix="jpgp:")).fetchall()
    }
    assert got == exp


def test_decode_image_dispatches_jpeg():
    coeffs = np.zeros((1, 1, 3, 64), dtype=np.int64)
    coeffs[0, 0, :, 0] = [0, 0, 0]
    img = mm.decode_image(mm.encode_jpeg(coeffs, 8, 8, Q16))
    assert np.all(img == 128)


def test_jpeg_features_match_duckdb_oracle(spark):
    media = mm.synth_jpeg_media(spark, n=6)
    feats = mm.image_features(media, fake=False).collect()
    got = {
        r.media_id: tuple(
            round(float(getattr(r, c)), 6) for c in mm.FEATURE_COLS
        )
        for r in feats
    }
    exp = {
        row[0]: tuple(row[1:])
        for row in duckdb.sql(jpeg_features_sql(6)).fetchall()
    }
    assert got == exp


def test_mjpeg_avi_roundtrip():
    # two 16x16 frames with distinct DC content survive the container
    q = np.full(64, 16, dtype=np.int64)
    frames = []
    for k in (7, -30):
        coeffs = np.zeros((2, 2, 3, 64), dtype=np.int64)
        coeffs[..., 0, 0] = k
        frames.append(mm.encode_jpeg(coeffs, 16, 16, q))
    payload = mm.encode_avi_mjpeg(frames, fps=10, w=16, h=16)
    lumas, fps = mm.decode_video(payload)
    assert fps == 10.0 and lumas.shape == (2, 16, 16)
    assert np.all(lumas[0] == 2 * 7 + 128)
    assert np.all(lumas[1] == 2 * -30 + 128)


def test_mjpeg_odd_sized_chunks_word_aligned():
    # an odd-length JPEG chunk forces the RIFF pad-byte path between
    # frames; a trailing byte after EOI is common in MJPEG writers
    q = np.full(64, 16, dtype=np.int64)
    coeffs = np.zeros((1, 1, 3, 64), dtype=np.int64)
    jpg = mm.encode_jpeg(coeffs, 8, 8, q)
    if len(jpg) % 2 == 0:
        jpg += b"\x00"
    payload = mm.encode_avi_mjpeg([jpg, jpg], fps=5, w=8, h=8)
    lumas, _ = mm.decode_video(payload)
    assert lumas.shape == (2, 8, 8) and np.all(lumas == 128)


def test_video_frame_stats_matches_duckdb_oracle(spark):
    import duckdb as _duckdb

    from marginaliasearch_spark.functions.sql_oracles import mjpeg_frames_sql

    media = mm.synth_mjpeg_media(spark, n=5)
    got = {
        (r.media_id, r.frame_idx): (r.y_sum, r.n_px, r.mean_y)
        for r in mm.video_frame_stats(media).collect()
    }
    exp = {
        (row[0], row[1]): tuple(row[2:])
        for row in _duckdb.sql(mjpeg_frames_sql(5)).fetchall()
    }
    assert got == exp


def test_mjpeg_rec_grouped_frames_decode_in_order():
    """Interleaved AVI muxers wrap each frame's chunks in a 'LIST rec '
    group; a deferred-stack walk pops sibling LISTs LIFO and reverses the
    frame order. Frames must come back in file order."""
    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + len(body).to_bytes(4, "little") + body + (
            b"\x00" if len(body) & 1 else b""
        )

    q = np.full(64, 16, dtype=np.int64)
    frames = []
    for k in (7, -30, 55):
        coeffs = np.zeros((1, 1, 3, 64), dtype=np.int64)
        coeffs[..., 0, 0] = k
        frames.append(mm.encode_jpeg(coeffs, 8, 8, q))
    avih = (100_000).to_bytes(4, "little") + b"\x00" * 52
    hdrl = chunk(b"LIST", b"hdrl" + chunk(b"avih", avih))
    movi = chunk(
        b"LIST",
        b"movi"
        + b"".join(
            chunk(b"LIST", b"rec " + chunk(b"00dc", f)) for f in frames
        ),
    )
    payload = chunk(b"RIFF", b"AVI " + hdrl + movi)
    lumas, fps = mm.decode_video(payload)
    assert fps == 10.0 and lumas.shape == (3, 8, 8)
    for i, k in enumerate((7, -30, 55)):
        assert np.all(lumas[i] == 2 * k + 128), i


def test_avi_list_bomb_raises_valueerror_not_recursionerror():
    """~200 nested LIST chunks in a few-KB RIFF payload must raise
    ValueError (the per-item skip allowlist), never RecursionError."""
    body = b"junk"
    for _ in range(200):
        body = b"LIST" + (len(body) + 4).to_bytes(4, "little") + b"rec " + body
    payload = b"RIFF" + (len(body) + 4).to_bytes(4, "little") + b"AVI " + body
    with pytest.raises(ValueError, match="nesting"):
        mm._decode_avi_mjpeg(payload)
