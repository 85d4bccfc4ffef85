"""Matroska / WebM EBML container: vint parse, cluster walk, lacing.

Lacing modes must be invisible in decoded output; codec payloads are
Y800 planes (bit-exact) or DC-only JPEG (closed-form pixels)."""

import duckdb
import numpy as np
import pytest

from marginaliasearch_spark.functions.sql_oracles import mkv_frames_sql
from marginaliasearch_spark.operators import multimodal as mm

rng = np.random.default_rng(99)
FRAMES = [rng.integers(0, 256, (16, 16)).astype(np.uint8) for _ in range(4)]
FB = [f.tobytes() for f in FRAMES]


# --- EBML primitives ---------------------------------------------------------


@pytest.mark.parametrize(
    "raw,want,width",
    [
        (b"\x81", 1, 1),
        (b"\x40\x02", 2, 2),
        (b"\x20\x00\x03", 3, 3),
        (b"\xfe", 126, 1),
        (b"\x10\x00\x00\x00", 0, 4),
    ],
)
def test_ebml_vint_decode(raw, want, width):
    val, pos = mm._ebml_vint(raw, 0, strip=True)
    assert (val, pos) == (want, width)


def test_ebml_vint_id_keeps_marker():
    val, _ = mm._ebml_vint(b"\x1aE\xdf\xa3", 0, strip=False)
    assert val == 0x1A45DFA3


def test_eb_size_roundtrip():
    for n in (0, 1, 126, 127, 128, 16382, 16383, 1 << 20, (1 << 35) + 7):
        enc = mm._eb_size(n)
        val, pos = mm._ebml_vint(enc, 0, strip=True)
        assert (val, pos) == (n, len(enc))


def test_ebml_svint():
    # 2-byte signed vint: stored = value + 8191
    enc = ((1 << 14) | (5 + 8191)).to_bytes(2, "big")
    val, pos = mm._ebml_svint(enc, 0)
    assert (val, pos) == (5, 2)
    enc = ((1 << 14) | (-100 + 8191)).to_bytes(2, "big")
    assert mm._ebml_svint(enc, 0)[0] == -100


# --- container roundtrips ----------------------------------------------------


@pytest.mark.parametrize("lacing", ["none", "fixed", "ebml", "xiph"])
def test_y800_roundtrip_all_lacings(lacing):
    p = mm.encode_mkv(
        FB, "V_UNCOMPRESSED", 16, 16, lacing=lacing, colour_space=b"Y800"
    )
    lumas, fps = mm.decode_video(p)
    assert lumas.shape == (4, 16, 16)
    assert fps == pytest.approx(25.0)
    for i in range(4):
        assert np.array_equal(lumas[i], FRAMES[i])


@pytest.mark.parametrize("lacing", ["none", "xiph", "ebml"])
def test_mjpeg_track_roundtrip(lacing):
    q = np.full(64, mm.JPEG_QDC, dtype=np.int64)
    jf, want = [], []
    for f in range(3):
        ks = np.array([[f * 3 - 10, 5], [-7, f]], dtype=np.int64)
        coeffs = np.zeros((2, 2, 3, 64), dtype=np.int64)
        coeffs[..., 0, 0] = ks
        jf.append(mm.encode_jpeg(coeffs, 16, 16, q))
        want.append(np.repeat(np.repeat(2 * ks + 128, 8, 0), 8, 1))
    lumas, _ = mm.decode_video(mm.encode_mkv(jf, "V_MJPEG", 16, 16, lacing=lacing))
    for i in range(3):
        assert np.array_equal(lumas[i], want[i]), lacing


def test_webm_doctype_accepted():
    p = mm.encode_mkv(
        FB, "V_UNCOMPRESSED", 16, 16, colour_space=b"Y800", doctype="webm"
    )
    assert mm.decode_video(p)[0].shape == (4, 16, 16)


def test_unknown_doctype_rejected():
    p = mm.encode_mkv(
        FB, "V_UNCOMPRESSED", 16, 16, colour_space=b"Y800", doctype="ogg?!"
    )
    with pytest.raises(ValueError, match="DocType"):
        mm.decode_video(p)


def test_interframe_codec_honest_stub():
    p = mm.encode_mkv(FB, "V_VP9", 16, 16)
    with pytest.raises(NotImplementedError, match="V_VP9"):
        mm.decode_video(p)
    p = mm.encode_mkv(FB, "V_UNCOMPRESSED", 16, 16, colour_space=b"I420")
    with pytest.raises(NotImplementedError, match="I420"):
        mm.decode_video(p)


def test_default_duration_sets_fps():
    p = mm.encode_mkv(
        FB, "V_UNCOMPRESSED", 16, 16, frame_ms=100, colour_space=b"Y800"
    )
    assert mm.decode_video(p)[1] == pytest.approx(10.0)


# --- fixture + oracle --------------------------------------------------------


def test_mkv_fixture_codec_and_lacing_cycle(spark):
    media = mm.synth_mkv_media(spark, n=12).collect()
    for r in sorted(media, key=lambda r: r.media_id):
        assert r.mime == "video/x-matroska"
        lumas, fps = mm.decode_video(bytes(r.payload))
        assert lumas.shape == (2 + r.media_id % 3, 16, 16)
        if r.media_id % 2 == 0:  # Y800 closed form
            seed = mm.mkv_seed(r.media_id)
            idx = np.arange(lumas.shape[0] * 256, dtype=np.uint64)
            want = (
                (mm._splitmix64(seed + idx) & np.uint64(255))
                .astype(np.uint8)
                .reshape(lumas.shape)
            )
            assert np.array_equal(lumas, want)


def test_mkv_frames_matches_duckdb_oracle(spark):
    got = {
        (r.media_id, r.frame_idx): (r.y_sum, r.n_px, r.mean_y)
        for r in mm.video_frame_stats(mm.synth_mkv_media(spark, n=16)).collect()
    }
    exp = {
        (row[0], row[1]): tuple(row[2:])
        for row in duckdb.sql(mkv_frames_sql(16)).fetchall()
    }
    assert got == exp


def test_blockgroup_keeps_cluster_timestamp_and_tracks_after_clusters():
    """Two layouts the fixture encoder never emits, both legal Matroska:
    (a) Blocks wrapped in BlockGroups (mkvmerge's layout) must keep their
    Cluster Timestamp — a recursion that resets it to 0 collapses every
    cluster onto ts 0 and breaks the fps fallback and frame order;
    (b) Clusters BEFORE the Tracks element (SeekHead-driven layout) must
    still resolve the video track and not be walked with track_no=None."""
    eb, ebu = mm._eb, mm._eb_uint
    video = ebu(0xB0, 16) + ebu(0xBA, 16) + eb(0x2EB524, b"Y800")
    track = eb(
        0xAE,
        ebu(0xD7, 1) + ebu(0x73C5, 1) + ebu(0x83, 1)
        + eb(0x86, b"V_UNCOMPRESSED") + eb(0xE0, video),
    )
    info = eb(0x1549A966, ebu(0x2AD7B1, 1_000_000))
    clusters = b""
    for f, fb in enumerate(FB[:3]):
        block = b"\x81" + (0).to_bytes(2, "big", signed=True) + b"\x80" + fb
        clusters += eb(
            0x1F43B675,
            ebu(0xE7, (2 - f) * 100)  # deliberately decreasing file order
            + eb(0xA0, eb(0xA3, block)),  # Block inside a BlockGroup
        )
    header = eb(
        0x1A45DFA3,
        ebu(0x4286, 1) + ebu(0x42F7, 1) + ebu(0x42F2, 4) + ebu(0x42F3, 8)
        + eb(0x4282, b"matroska") + ebu(0x4287, 4) + ebu(0x4285, 2),
    )
    # clusters FIRST, tracks last
    payload = header + eb(0x18538067, info + clusters + eb(0x1654AE6B, track))
    lumas, fps = mm.decode_video(payload)
    assert lumas.shape == (3, 16, 16)
    # ts order 200,100,0 reverses file order: frame 0 in output = FB[2]
    assert np.array_equal(lumas[0], FRAMES[2])
    assert np.array_equal(lumas[2], FRAMES[0])
    assert fps == 10.0  # 100ms deltas via the fallback, not ts-0 collapse


def test_blockgroup_bomb_raises_valueerror_not_recursionerror():
    """~200 nested BlockGroups in a few-KB payload: must raise ValueError
    (in the per-item skip allowlist) — RecursionError would escape the
    skip policy and kill the whole job after task retries."""
    eb, ebu = mm._eb, mm._eb_uint
    video = ebu(0xB0, 16) + ebu(0xBA, 16) + eb(0x2EB524, b"Y800")
    track = eb(
        0xAE,
        ebu(0xD7, 1) + ebu(0x73C5, 1) + ebu(0x83, 1)
        + eb(0x86, b"V_UNCOMPRESSED") + eb(0xE0, video),
    )
    block = b"\x81" + (0).to_bytes(2, "big", signed=True) + b"\x80" + FB[0]
    body = eb(0xA3, block)
    for _ in range(200):
        body = eb(0xA0, body)
    cluster = eb(0x1F43B675, ebu(0xE7, 0) + body)
    header = eb(
        0x1A45DFA3,
        ebu(0x4286, 1) + ebu(0x42F7, 1) + ebu(0x42F2, 4) + ebu(0x42F3, 8)
        + eb(0x4282, b"matroska") + ebu(0x4287, 4) + ebu(0x4285, 2),
    )
    payload = header + eb(
        0x18538067, eb(0x1549A966, ebu(0x2AD7B1, 1_000_000))
        + eb(0x1654AE6B, track) + cluster
    )
    with pytest.raises(ValueError, match="nesting"):
        mm.decode_video(payload)


def test_unknown_size_cluster_chain_is_linear_not_recursive():
    """300 unknown-size Clusters: each following cluster parses as a
    child of the previous one (live-muxed layout), chaining linearly.
    The walker must handle the chain iteratively — per-cluster recursion
    would RecursionError on a legitimate long stream."""
    eb, ebu = mm._eb, mm._eb_uint
    video = ebu(0xB0, 16) + ebu(0xBA, 16) + eb(0x2EB524, b"Y800")
    track = eb(
        0xAE,
        ebu(0xD7, 1) + ebu(0x73C5, 1) + ebu(0x83, 1)
        + eb(0x86, b"V_UNCOMPRESSED") + eb(0xE0, video),
    )
    n = 300
    clusters = b""
    for i in range(n):
        block = (
            b"\x81" + (0).to_bytes(2, "big", signed=True) + b"\x80"
            + FB[i % len(FB)]
        )
        body = ebu(0xE7, i * 100) + eb(0xA3, block)
        # unknown-size: id + all-ones 1-byte size vint, body runs on
        clusters += (0x1F43B675).to_bytes(4, "big") + b"\xff" + body
    header = eb(
        0x1A45DFA3,
        ebu(0x4286, 1) + ebu(0x42F7, 1) + ebu(0x42F2, 4) + ebu(0x42F3, 8)
        + eb(0x4282, b"matroska") + ebu(0x4287, 4) + ebu(0x4285, 2),
    )
    payload = header + eb(
        0x18538067, eb(0x1549A966, ebu(0x2AD7B1, 1_000_000))
        + eb(0x1654AE6B, track) + clusters
    )
    lumas, fps = mm.decode_video(payload)
    assert lumas.shape == (n, 16, 16)
    for i in (0, 1, n - 1):  # ts order == file order here
        assert np.array_equal(lumas[i], FRAMES[i % len(FRAMES)])
    assert fps == 10.0  # 100ms deltas
