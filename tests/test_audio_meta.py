"""MPEG-1 Layer III / Ogg-Opus container METADATA (no sample decode).

Pins the frame-walk arithmetic (ISO 11172-3 frame length =
144000*kbps // rate), ID3v2/ID3v1 tag handling, RFC 7845 OpusHead /
OpusTags / granule-clock duration, and that the synth fixture's closed
forms agree with the DuckDB oracle column-for-column.
"""

import duckdb
import numpy as np
import pytest

from marginaliasearch_spark.functions.sql_oracles import audio_meta_sql
from marginaliasearch_spark.operators import multimodal as mm


# --- MPEG frame walk ---------------------------------------------------------


def test_mp3_cbr_mono():
    p = mm.encode_mpeg_stream(4, 43, 1, [9], True, "track 4")
    m = mm.mpeg_audio_meta(p)
    assert m == {
        "codec": "mp3", "n_frames": 43, "sample_rate": 48000, "channels": 1,
        "duration_ms": 43 * 1152 * 1000 // 48000, "avg_bitrate_kbps": 128,
        "vbr": False, "title": "track 4",
    }


def test_mp3_vbr_stereo_floor_avg():
    p = mm.encode_mpeg_stream(8, 41, 0, [9, 11], False, "track 8")
    m = mm.mpeg_audio_meta(p)
    assert m["vbr"] is True
    assert m["channels"] == 2 and m["sample_rate"] == 44100
    # frames 0,2,..,40 at 128 kbps (21), 1,3,..,39 at 192 (20); floor avg
    assert m["avg_bitrate_kbps"] == (128 * 21 + 192 * 20) // 41


def test_mp3_id3v1_fallback_title():
    p = mm.encode_mpeg_stream(8, 5, 0, [9], False, "track 8")
    bare = p[p.index(b"\xff\xfb"):]  # strip ID3v2, keep ID3v1 trailer
    m = mm.mpeg_audio_meta(bare)
    assert m["title"] == "track 8" and m["n_frames"] == 5


def test_mp3_no_tags_at_all():
    p = mm.encode_mpeg_stream(1, 7, 2, [14], True, "x")
    bare = p[p.index(b"\xff\xfb"): -128]
    m = mm.mpeg_audio_meta(bare)
    assert m["title"] == "" and m["n_frames"] == 7
    assert m["avg_bitrate_kbps"] == 320 and m["sample_rate"] == 32000


def test_mp3_every_bitrate_index_walks():
    # one frame per standard bitrate: the walk must land exactly at EOF
    p = mm.encode_mpeg_stream(2, 14, 0, list(range(1, 15)), False, "t")
    m = mm.mpeg_audio_meta(p)
    assert m["n_frames"] == 14
    assert m["avg_bitrate_kbps"] == sum(mm._MPEG1_L3_KBPS[1:]) // 14


def test_mp3_lost_sync_raises():
    p = bytearray(mm.encode_mpeg_stream(3, 3, 0, [9], False, "t"))
    start = bytes(p).index(b"\xff\xfb")
    p[start] = 0x00
    with pytest.raises(ValueError, match="sync"):
        mm.mpeg_audio_meta(bytes(p))


def test_mp3_layer2_rejected():
    hdr = bytes([0xFF, 0xE0 | (0b11 << 3) | (0b10 << 1) | 1, 0x90, 0x00])
    with pytest.raises(NotImplementedError):
        mm.mpeg_audio_meta(hdr + b"\x00" * 400)


# --- Ogg-Opus ----------------------------------------------------------------


def test_opus_meta_roundtrip():
    sizes = [60 + ((31 + k * 13) % 100) for k in range(57)]
    p = mm.encode_ogg_opus(1, 57, 2, 312, "track 1", sizes)
    m = mm.opus_meta(p)
    ab = sum(sizes)
    assert m == {
        "codec": "opus", "n_frames": 57, "sample_rate": 48000, "channels": 2,
        "duration_ms": 57 * 20,
        "avg_bitrate_kbps": (ab * 8 * 48000) // (57 * 960 * 1000),
        "vbr": True, "title": "track 1",
    }


def test_opus_header_pages_isolated():
    """RFC 7845: OpusHead and OpusTags must each end their own page."""
    p = mm.encode_ogg_opus(0, 3, 1, 312, "t", [80, 80, 80])
    pos, pages = 0, []
    while pos < len(p):
        assert p[pos:pos + 4] == b"OggS"
        n_segs = p[pos + 26]
        laces = p[pos + 27:pos + 27 + n_segs]
        body = pos + 27 + n_segs
        pages.append(p[body:body + sum(laces)])
        pos = body + sum(laces)
    assert pages[0][:8] == b"OpusHead" and len(pages[0]) == 19
    assert pages[1][:8] == b"OpusTags"
    # header pages carry granule 0; CBR-size packets -> vbr False
    assert mm.opus_meta(p)["vbr"] is False


def test_opus_duration_subtracts_preskip():
    p = mm.encode_ogg_opus(5, 10, 1, 960, "t", [64] * 10)
    m = mm.opus_meta(p)
    assert m["duration_ms"] == 10 * 20  # pre-skip excluded whatever its size


def test_opus_corrupt_page_crc_raises():
    p = bytearray(mm.encode_ogg_opus(2, 4, 1, 312, "t", [64] * 4))
    p[-1] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        mm.opus_meta(bytes(p))


# --- fixture closed forms vs the DuckDB twin ---------------------------------


def test_fixture_matches_oracle_closed_forms():
    """Driver-side recompute of the fixture metadata equals the SQL twin
    row-for-row (the Spark/mapInPandas plumbing is covered by the
    mm_audio_meta driver entry)."""
    want = {
        r[0]: r
        for r in duckdb.sql(audio_meta_sql(n=12)).fetchall()
    }
    for i in range(12):
        j = i // 2
        if i % 2 == 0:
            nf = 40 + (i * 7) % 25
            payload = mm.encode_mpeg_stream(
                i, nf, j % 3, [9] if j % 4 < 2 else [9, 11],
                mono=j % 2 == 1, title=f"track {i}",
            )
            m = mm.mpeg_audio_meta(payload)
        else:
            npk = 50 + (i * 11) % 40
            sizes = [60 + ((i * 31 + k * 13) % 100) for k in range(npk)]
            m = mm.opus_meta(
                mm.encode_ogg_opus(i, npk, 1 + j % 2, 312, f"track {i}", sizes)
            )
        got = (
            i, m["codec"], m["n_frames"], m["sample_rate"], m["channels"],
            m["duration_ms"], m["avg_bitrate_kbps"], m["vbr"], m["title"],
        )
        assert got == want[i], i


def test_id3v24_syncsafe_frame_sizes():
    """An ID3v2.4 tag whose TIT2 body is > 127 bytes: plain big-endian
    frame-size reads would walk off the frame; syncsafe must be used."""
    long_title = "t" * 130
    body = b"\x00" + long_title.encode("latin-1")
    sz = len(body)
    frame = (
        b"TIT2"
        + bytes([(sz >> 21) & 0x7F, (sz >> 14) & 0x7F, (sz >> 7) & 0x7F, sz & 0x7F])
        + b"\x00\x00" + body
    )
    tag_sz = len(frame)
    tag = b"ID3\x04\x00\x00" + bytes(
        [(tag_sz >> 21) & 0x7F, (tag_sz >> 14) & 0x7F,
         (tag_sz >> 7) & 0x7F, tag_sz & 0x7F]
    ) + frame
    frames = mm.encode_mpeg_stream(9, 3, 0, [9], True, "ignored")
    bare = frames[frames.index(b"\xff\xfb"): -128]
    m = mm.mpeg_audio_meta(tag + bare)
    assert m["title"] == long_title and m["n_frames"] == 3


def test_opus_multiplexed_stream_keeps_first_serial():
    """Interleave a second logical bitstream with a LARGER granule: both
    the packet filter and the duration clock must stick to stream 1."""
    p = mm.encode_ogg_opus(4, 5, 1, 312, "t", [64] * 5)
    # craft one foreign page: different serial, absurd granule
    foreign = mm._ogg_write_pages([(b"\x00" * 10, 10**9)], serial=0x0BADF00D)
    # splice the foreign page between stream-1 pages (after the first)
    first_end = 27 + p[26] + sum(p[27:27 + p[26]])
    spliced = p[:first_end] + foreign + p[first_end:]
    m = mm.opus_meta(spliced)
    assert m["n_frames"] == 5 and m["duration_ms"] == 100


def test_id3_utf16_title_and_footer_flag():
    """UTF-16 (enc 1, BOM) titles decode; the v2.4 footer's 10 bytes are
    skipped so the frame walk starts on sync."""
    title = "nappali füst"
    body = b"\x01" + title.encode("utf-16")  # BOM-led
    sz = len(body)
    frame = b"TIT2" + bytes(
        [(sz >> 21) & 0x7F, (sz >> 14) & 0x7F, (sz >> 7) & 0x7F, sz & 0x7F]
    ) + b"\x00\x00" + body
    tsz = len(frame)
    tag = b"ID3\x04\x00\x10" + bytes(  # flags: footer present
        [(tsz >> 21) & 0x7F, (tsz >> 14) & 0x7F, (tsz >> 7) & 0x7F, tsz & 0x7F]
    ) + frame + b"3DI\x04\x00\x10" + bytes(
        [(tsz >> 21) & 0x7F, (tsz >> 14) & 0x7F, (tsz >> 7) & 0x7F, tsz & 0x7F]
    )
    frames = mm.encode_mpeg_stream(9, 4, 0, [9], True, "ignored")
    bare = frames[frames.index(b"\xff\xfb"): -128]
    m = mm.mpeg_audio_meta(tag + bare)
    assert m["title"] == title and m["n_frames"] == 4


def test_id3_unsync_flag_falls_back_to_id3v1():
    p = mm.encode_mpeg_stream(6, 3, 0, [9], False, "realtitle")
    tag_end = 10 + (
        ((p[6] & 0x7F) << 21) | ((p[7] & 0x7F) << 14)
        | ((p[8] & 0x7F) << 7) | (p[9] & 0x7F)
    )
    mutated = bytearray(p)
    mutated[5] |= 0x80  # unsynchronisation flag
    m = mm.mpeg_audio_meta(bytes(mutated))
    assert m["title"] == "realtitle"  # via the ID3v1 trailer, not v2
    assert m["n_frames"] == 3
    _ = tag_end


def test_opus_tagless_stream_counts_all_audio_packets():
    p = mm.encode_ogg_opus(7, 4, 1, 312, "t", [64] * 4)
    packets = mm._ogg_packets(p)
    rebuilt = mm._ogg_write_pages(
        [(packets[0], 0)] + [(pk, 312 + 960 * (k + 1)) for k, pk in enumerate(packets[2:])],
        serial=0x4F505553,
        break_after={0},
    )
    m = mm.opus_meta(rebuilt)
    assert m["n_frames"] == 4 and m["duration_ms"] == 80 and m["title"] == ""


def test_on_error_policies(spark):
    """One corrupt payload among good ones: raise kills, skip drops,
    null emits a codec='error' row - the web-scale sweep contract."""
    good = mm.encode_mpeg_stream(0, 3, 0, [9], True, "ok")
    rows = [
        (0, "audio", bytearray(good), "audio/mpeg", 0, 0, 0),
        (1, "audio", bytearray(b"\xff\xfbgarbage-no-frames"), "audio/mpeg", 0, 0, 0),
        (2, "audio", bytearray(b"not a container at all"), "audio/mpeg", 0, 0, 0),
    ]
    media = spark.createDataFrame(rows, schema=mm.MEDIA_SCHEMA)
    with pytest.raises(Exception):
        mm.audio_container_meta(media).collect()
    skipped = mm.audio_container_meta(media, on_error="skip").collect()
    assert [r["media_id"] for r in skipped] == [0]
    nulled = {
        r["media_id"]: r
        for r in mm.audio_container_meta(media, on_error="null").collect()
    }
    assert nulled[0]["codec"] == "mp3" and nulled[0]["n_frames"] == 3
    assert nulled[1]["codec"] == "error" and nulled[2]["codec"] == "error"
