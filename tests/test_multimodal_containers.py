"""Audio container formats: Ogg-FLAC demux, AIFF/AIFF-C, Sun AU.

Containers only wrap sample streams, so every roundtrip asserts exact
sample recovery; the Ogg tests additionally pin the page-framing layer
(CRC-32 verify, lacing reassembly, continued packets across pages)."""

import duckdb
import numpy as np
import pytest

from marginaliasearch_spark.functions.sql_oracles import audio_containers_sql
from marginaliasearch_spark.operators import multimodal as mm

rng = np.random.default_rng(1234)
SIG = rng.integers(-32768, 32768, 700).astype(np.int64)


# --- Ogg-FLAC (RFC 3533 framing + RFC 9639 §10.2 mapping) -------------------


@pytest.mark.parametrize("order", [0, 1, 2])
def test_ogg_flac_roundtrip(order):
    got, sr = mm.decode_audio(mm.encode_ogg_flac(SIG, order))
    assert sr == mm.AUDIO_RATE
    assert np.array_equal(got, SIG)


def _page_flags(payload: bytes) -> list[int]:
    flags, pos = [], 0
    while pos < len(payload):
        assert payload[pos : pos + 4] == b"OggS"
        flags.append(payload[pos + 5])
        n_segs = payload[pos + 26]
        body = sum(payload[pos + 27 : pos + 27 + n_segs])
        pos += 27 + n_segs + body
    return flags


@pytest.mark.parametrize("max_segs", [1, 2, 3])
def test_ogg_continued_packets_across_pages(max_segs):
    """max_segs < packet lacing count forces continuation flags; the
    demuxer must reassemble packets across page boundaries."""
    payload = mm.encode_ogg_flac(SIG, 0, max_segs=max_segs)
    flags = _page_flags(payload)
    assert len(flags) >= 2
    assert any(f & 0x01 for f in flags)  # some page continues a packet
    got, _ = mm.decode_audio(payload)
    assert np.array_equal(got, SIG)


def test_ogg_crc_tamper_detected():
    p = bytearray(mm.encode_ogg_flac(SIG))
    p[40] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        mm.decode_audio(bytes(p))


def test_ogg_lacing_255_multiple():
    """A packet whose length is an exact multiple of 255 needs the
    terminating zero lace."""
    n = 255 * 2  # VERBATIM 16-bit: frame bytes land where they land; use raw pages
    pkt = bytes(range(256)) * 2  # 512 bytes -> laces [255,255,2]
    pkt255 = pkt[:510]  # laces [255, 255, 0]
    pages = mm._ogg_write_pages([(pkt255, 0), (pkt, 1)])
    assert mm._ogg_packets(pages) == [pkt255, pkt]


def test_ogg_non_flac_raises():
    pages = mm._ogg_write_pages([(b"\x01vorbis-ish", 0)])
    with pytest.raises(NotImplementedError, match="not FLAC-mapped"):
        mm._decode_ogg(pages)


# --- AIFF / AIFF-C -----------------------------------------------------------


@pytest.mark.parametrize("comp", [None, b"NONE", b"twos", b"sowt"])
def test_aiff_roundtrip(comp):
    got, sr = mm.decode_audio(mm.encode_aiff(SIG, comp))
    assert sr == mm.AUDIO_RATE
    assert np.array_equal(got, SIG)


def test_aiff_stereo_takes_channel0():
    st = np.stack([SIG, -SIG], axis=1)
    for comp in (None, b"sowt"):
        got, _ = mm.decode_audio(mm.encode_aiff(st, comp))
        assert np.array_equal(got, SIG)


def test_aiff_unknown_compression_raises():
    p = mm.encode_aiff(SIG, b"sowt").replace(b"sowt", b"ima4")
    with pytest.raises(NotImplementedError, match="ima4"):
        mm.decode_audio(p)


@pytest.mark.parametrize(
    "rate", [8000, 11025, 16000, 22050, 44100, 48000, 96000]
)
def test_ext80_sample_rates(rate):
    assert mm._read_ext80(mm._write_ext80(rate)) == rate
    got, sr = mm._decode_aiff(mm.encode_aiff(SIG[:16], sample_rate=rate))
    assert sr == rate


# --- Sun AU ------------------------------------------------------------------


def test_au_pcm16_roundtrip():
    got, sr = mm.decode_audio(mm.encode_au(SIG))
    assert sr == mm.AUDIO_RATE
    assert np.array_equal(got, SIG)


def test_au_ulaw_matches_table():
    codes = rng.integers(0, 256, 300).astype(np.uint8)
    got, _ = mm.decode_audio(mm.encode_au(codes, encoding=1))
    assert np.array_equal(got, mm._ULAW_TABLE[codes])


def test_au_pcm8_signed():
    s8 = rng.integers(-128, 128, 200).astype(np.int8)
    got, _ = mm.decode_audio(mm.encode_au(s8, encoding=2))
    assert np.array_equal(got, s8.astype(np.int64) * 256)


def test_au_unknown_encoding_raises():
    p = bytearray(mm.encode_au(SIG))
    p[12:16] = (23).to_bytes(4, "big")  # ADPCM G.723 — no codec libs
    with pytest.raises(NotImplementedError, match="encoding 23"):
        mm.decode_audio(bytes(p))


# --- fixture + oracle --------------------------------------------------------


def test_container_fixture_cycle_and_decodability(spark):
    media = mm.synth_container_audio_media(spark, n=8).collect()
    mimes = [r.mime for r in sorted(media, key=lambda r: r.media_id)]
    assert mimes == ["audio/ogg", "audio/aiff", "audio/aiff", "audio/basic"] * 2
    for r in media:
        s, rate = mm.decode_audio(bytes(r.payload))
        assert rate == mm.AUDIO_RATE and len(s) >= 450
        # closed form holds regardless of container
        seed = mm.container_seed(r.media_id)
        idx = np.arange(len(s), dtype=np.uint64)
        want = (
            (mm._splitmix64(seed + idx) & np.uint64(8191)).astype(np.int64)
            - 4096
        )
        assert np.array_equal(s, want)


def test_container_fixture_multipage_ogg_rows(spark):
    """media_id 8 is the (i//4)%3 == 2 Ogg row: must carry a continued
    packet across pages (max_segs=3); media_id 0 stays single-lace-group
    (no continuation)."""
    media = {
        r.media_id: bytes(r.payload)
        for r in mm.synth_container_audio_media(spark, n=12).collect()
    }
    assert any(f & 0x01 for f in _page_flags(media[8]))
    assert not any(f & 0x01 for f in _page_flags(media[0]))


def test_audio_containers_matches_duckdb_oracle(spark):
    media = mm.synth_container_audio_media(spark, n=12)
    got = {
        r.media_id: (
            r.n_samples, r.sample_rate, r.peak, r.zero_crossings,
            r.rms, r.mean_amp,
        )
        for r in mm.audio_features(media, fake=False).collect()
    }
    exp = {
        row[0]: tuple(row[1:])
        for row in duckdb.sql(audio_containers_sql(12)).fetchall()
    }
    assert got == exp
