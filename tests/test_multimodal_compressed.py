"""Compressed-audio codecs: G.711 μ-law/A-law + IMA ADPCM WAV decode.

Pins the decode tables against published g711.c values, the ADPCM
quantizer recurrence against a hand-stepped trace, round-trips through
the WAV writers, and proves the Spark entry hash-matches the DuckDB
recursive-CTE oracle (the driver-gate twin).
"""

import duckdb
import zlib

import numpy as np
import pytest

from marginaliasearch_spark.functions.sql_oracles import audio_compressed_sql
from marginaliasearch_spark.operators import multimodal as mm


def test_ulaw_table_known_values():
    # Sun g711.c ulaw2linear: 0x00 -> -32124, 0x80 -> +32124, 0xFF -> 0
    t = mm._ULAW_TABLE
    assert t[0x00] == -32124
    assert t[0x80] == 32124
    assert t[0xFF] == 0
    assert t[0x7F] == 0  # negative zero collapses to 0
    assert t.min() == -32124 and t.max() == 32124


def test_alaw_table_known_values():
    # Sun g711.c alaw2linear: 0x55 -> -8, 0xD5 -> +8, extremes +-32256
    t = mm._ALAW_TABLE
    assert t[0x55] == -8
    assert t[0xD5] == 8
    assert t[0xAA] == 32256
    assert t[0x2A] == -32256
    assert t.min() == -32256 and t.max() == 32256


def test_adpcm_hand_stepped_trace():
    # pred0=0, idx0=0 (step 7): nib 2 -> +3; nib 8 -> -0; nib 15 -> -11
    # (idx jumps to 8, step 16); nib 4 -> +18
    out = mm._ima_adpcm_decode_block(np.array([2, 8, 15, 4]), 0, 0)
    assert out == [0, 3, 3, -8, 10]


def test_adpcm_clamps_predictor_and_index():
    # all-positive max-magnitude codes saturate at 32767 / index 88
    out = mm._ima_adpcm_decode_block(np.array([7] * 200), 32000, 80)
    assert max(out) == 32767 and out[-1] == 32767
    # all-negative saturates at -32768
    out = mm._ima_adpcm_decode_block(np.array([15] * 200), -32000, 80)
    assert min(out) == -32768 and out[-1] == -32768


def test_g711_wav_roundtrip():
    codes = np.arange(256, dtype=np.uint8)
    for law, table in (("ulaw", mm._ULAW_TABLE), ("alaw", mm._ALAW_TABLE)):
        s, rate = mm.decode_audio(mm.encode_wav_g711(codes, law))
        assert rate == mm.AUDIO_RATE
        assert np.array_equal(s, table[codes])


def test_adpcm_wav_roundtrip_single_block():
    nibbles = np.array([2, 8, 15, 4], dtype=np.int64)
    payload = mm.encode_wav_ima_adpcm(nibbles, 0, 0)
    s, rate = mm.decode_audio(payload)
    assert rate == mm.AUDIO_RATE
    assert s.tolist() == [0, 3, 3, -8, 10]


def test_adpcm_multi_block_and_fact_truncation():
    # two hand-assembled 8-byte blocks (4 header + 4 code bytes = 8
    # nibbles each) followed by decode; fact chunk trims the tail
    def block(pred, idx, nib):
        body = (nib[0::2] & 0x0F) | ((nib[1::2] & 0x0F) << 4)
        return (
            int(pred).to_bytes(2, "little", signed=True)
            + bytes([idx, 0])
            + body.astype(np.uint8).tobytes()
        )

    nib_a = np.array([1, 2, 3, 4, 5, 6, 7, 8])
    nib_b = np.array([8, 7, 6, 5, 4, 3, 2, 1])
    data = block(100, 3, nib_a) + block(-100, 10, nib_b)
    total = 2 * 9  # 9 samples per block
    payload = (
        mm._wav_header(0x11, 4, 8, len(data), 8000, fact_samples=total - 3)
        + data
    )
    s, _ = mm.decode_audio(payload)
    exp = mm._ima_adpcm_decode_block(nib_a, 100, 3) + mm._ima_adpcm_decode_block(
        nib_b, -100, 10
    )
    assert s.tolist() == exp[: total - 3]


def test_flac_roundtrip_all_fixed_orders():
    rng = np.random.default_rng(3)
    for order in range(5):
        for escape in (True, False):
            s = rng.integers(-1024, 1024, size=400).astype(np.int64)
            dec, rate = mm.decode_flac(
                mm.encode_flac(s, order, escape_raw=escape)
            )
            assert rate == mm.AUDIO_RATE
            assert np.array_equal(dec, s), (order, escape)


def test_flac_lpc_roundtrip():
    rng = np.random.default_rng(5)
    s = rng.integers(-2000, 2000, size=300).astype(np.int64)
    dec, _ = mm.decode_flac(mm.encode_flac(s, 0, lpc=([3000, -1500, 400], 11)))
    assert np.array_equal(dec, s)


def test_flac_crc_rejects_corruption():
    s = np.arange(-50, 50, dtype=np.int64)
    payload = bytearray(mm.encode_flac(s, 1))
    # flip a bit in the fixed-width warmup sample (byte 51: after the
    # 42-byte header, 8-byte frame header, 1-byte subframe header) so the
    # bitstream still parses and the frame CRC-16 is what catches it
    payload[51] ^= 0x40
    with pytest.raises(ValueError, match="CRC"):
        mm.decode_flac(bytes(payload))
    # corruption that derails rice parsing raises too (truncation guard)
    p2 = bytearray(mm.encode_flac(s, 1))
    p2[-10] ^= 0x40
    with pytest.raises(ValueError):
        mm.decode_flac(bytes(p2))


def test_synth_fixture_codecs_cycle(spark):
    media = mm.synth_compressed_audio_media(spark, n=12).collect()
    mimes = [r.mime for r in sorted(media, key=lambda r: r.media_id)]
    assert mimes == [
        "audio/basic", "audio/x-alaw", "audio/x-adpcm", "audio/flac",
        "audio/flac", "audio/wav",
    ] * 2
    # every payload is a decodable compressed stream
    for r in media:
        s, rate = mm.decode_audio(bytes(r.payload))
        assert rate == mm.AUDIO_RATE and len(s) >= 400


def test_audio_compressed_matches_duckdb_oracle(spark):
    media = mm.synth_compressed_audio_media(spark, n=9)
    got = {
        r.media_id: (
            r.n_samples, r.sample_rate, r.peak, r.zero_crossings,
            r.rms, r.mean_amp,
        )
        for r in mm.audio_features(media, fake=False).collect()
    }
    exp = {
        row[0]: tuple(row[1:])
        for row in duckdb.sql(audio_compressed_sql(9)).fetchall()
    }
    assert got == exp


# --- stereo decorrelation (RFC 9639 §9.1.3) --------------------------------


@pytest.mark.parametrize("mode", ["left_side", "right_side", "mid_side"])
def test_flac_stereo_decorrelation_reconstructs_left(mode):
    rng = np.random.default_rng(zlib.crc32(mode.encode()) & 0xFFFF)
    left = rng.integers(-32768, 32768, 400).astype(np.int64)
    right = rng.integers(-32768, 32768, 400).astype(np.int64)
    got, sr = mm.decode_flac(mm.encode_flac_stereo(left, right, mode))
    assert np.array_equal(got, left)


def test_flac_stereo_extremes():
    """Side channel needs its 17th bit: L/R at opposite int16 extremes."""
    left = np.array([32767, -32768, 32767, 0], np.int64)
    right = np.array([-32768, 32767, 32767, 0], np.int64)
    for mode in ("left_side", "right_side", "mid_side"):
        got, _ = mm.decode_flac(mm.encode_flac_stereo(left, right, mode))
        assert np.array_equal(got, left), mode


# --- PCM WAV depths ----------------------------------------------------------


@pytest.mark.parametrize("bits", [16, 24, 32, "f32"])
def test_wav_pcm_depths_roundtrip(bits):
    rng = np.random.default_rng(42 if bits == "f32" else bits)
    s = rng.integers(-32768, 32768, 777).astype(np.int64)
    got, sr = mm._decode_wav(mm.encode_wav_pcm(s, bits))
    assert sr == mm.AUDIO_RATE
    assert np.array_equal(got, s)


def test_wav_pcm_24bit_negative_values():
    s = np.array([-1, -32768, 32767, 0, -12345], np.int64)
    got, _ = mm._decode_wav(mm.encode_wav_pcm(s, 24))
    assert np.array_equal(got, s)


def test_ppm_16bit_floor_scaled():
    img = np.array(
        [[[0, 1, 257], [65535, 32768, 999]]], np.uint64
    )  # 1x2 RGB
    payload = b"P6 2 1 65535\n" + img.astype(">u2").tobytes()
    want = (img.astype(np.int64) * 255 // 65535).astype(np.uint8)
    assert np.array_equal(mm.decode_image(payload), want)
