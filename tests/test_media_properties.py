"""Property tests (hypothesis) for the round-4 container parsers: any
parameter combination the encoders accept must round-trip through the
metadata walk / cue parser exactly."""

from hypothesis import given, settings
from hypothesis import strategies as st

from marginaliasearch_spark.operators import multimodal as mm
from marginaliasearch_spark.operators import subtitles

TITLES = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    min_size=0,
    max_size=25,
).filter(lambda s: s.rstrip("\x00") == s)


@settings(max_examples=60, deadline=None)
@given(
    n_frames=st.integers(1, 40),
    rate_idx=st.integers(0, 2),
    kbps_indices=st.lists(st.integers(1, 14), min_size=1, max_size=6),
    mono=st.booleans(),
    title=TITLES,
)
def test_mp3_meta_roundtrip_property(n_frames, rate_idx, kbps_indices, mono, title):
    payload = mm.encode_mpeg_stream(7, n_frames, rate_idx, kbps_indices, mono, title)
    m = mm.mpeg_audio_meta(payload)
    kbps = [mm._MPEG1_L3_KBPS[kbps_indices[k % len(kbps_indices)]] for k in range(n_frames)]
    rate = mm._MPEG1_RATES[rate_idx]
    assert m["n_frames"] == n_frames
    assert m["sample_rate"] == rate
    assert m["channels"] == (1 if mono else 2)
    assert m["duration_ms"] == n_frames * 1152 * 1000 // rate
    assert m["avg_bitrate_kbps"] == sum(kbps) // n_frames
    assert m["vbr"] == (len(set(kbps)) > 1)
    assert m["title"] == title


@settings(max_examples=40, deadline=None)
@given(
    n_packets=st.integers(1, 30),
    channels=st.integers(1, 2),
    pre_skip=st.integers(0, 3840),
    sizes=st.lists(st.integers(1, 400), min_size=30, max_size=30),
    title=TITLES,
)
def test_opus_meta_roundtrip_property(n_packets, channels, pre_skip, sizes, title):
    sizes = sizes[:n_packets]
    payload = mm.encode_ogg_opus(3, n_packets, channels, pre_skip, title, sizes)
    m = mm.opus_meta(payload)
    dur_samples = n_packets * 960  # final granule - pre_skip by construction
    assert m["n_frames"] == n_packets
    assert m["channels"] == channels
    assert m["duration_ms"] == dur_samples * 1000 // 48000
    assert m["avg_bitrate_kbps"] == (sum(sizes) * 8 * 48000) // (dur_samples * 1000)
    assert m["vbr"] == (len(set(sizes)) > 1)
    assert m["title"] == title


@settings(max_examples=60, deadline=None)
@given(ms=st.integers(0, 99 * 3600000), comma=st.booleans(), hours=st.booleans())
def test_subtitle_clock_strings_decode_exactly(ms, comma, hours):
    """Every clock string the fixture generator can emit decodes back to
    the exact millisecond count via the parser's regex arithmetic —
    checked driver-side through the same regex + group math."""
    import re

    # reuse the synth generator's private formatter via a tiny local copy
    h, rem = divmod(ms, 3600000)
    m_, rem = divmod(rem, 60000)
    s, milli = divmod(rem, 1000)
    sep = "," if comma else "."
    if hours or h > 0:
        # WebVTT requires the hours component past 59 minutes: the
        # hour-less two-digit minutes field can't carry >=100 minutes
        # (found by this property test; the fixture formatter now falls
        # back to the hours form the same way)
        clock = f"{h:02d}:{m_:02d}:{s:02d}{sep}{milli:03d}"
    else:
        clock = f"{m_:02d}:{s:02d}{sep}{milli:03d}"
    line = f"{clock} --> {clock}"
    g = re.search(subtitles._TIMING, line)
    assert g, line
    hh = int(g.group(1) or 0)
    got = hh * 3600000 + int(g.group(2)) * 60000 + int(g.group(3)) * 1000 + int(g.group(4))
    # hour-less form folds hours into minutes; both must equal ms
    assert got == ms, (clock, got)


# --- FLAC: any sample sequence the encoder accepts must survive the
# decoder bit-exactly (RFC 9639 losslessness), across subframe types ---

SAMPLES16 = st.lists(st.integers(-32768, 32767), min_size=5, max_size=120)


@settings(max_examples=40, deadline=None)
@given(samples=SAMPLES16, order=st.integers(0, 4))
def test_flac_fixed_escape_roundtrip_property(samples, order):
    import numpy as np

    s = np.array(samples, dtype=np.int16)
    out, rate = mm.decode_flac(mm.encode_flac(s, order, escape_raw=True))
    assert (out == s).all()


@settings(max_examples=40, deadline=None)
@given(
    samples=st.lists(st.integers(-2000, 2000), min_size=5, max_size=120),
    order=st.integers(0, 1),
)
def test_flac_rice_roundtrip_property(samples, order):
    # rice-coded partitions (param capped at 14): bounded amplitude keeps
    # low-order residual quotients sane; escape handling covered above
    import numpy as np

    s = np.array(samples, dtype=np.int16)
    out, _ = mm.decode_flac(mm.encode_flac(s, order, escape_raw=False))
    assert (out == s).all()


@settings(max_examples=30, deadline=None)
@given(
    samples=SAMPLES16,
    coefs=st.lists(st.integers(-16, 16), min_size=1, max_size=4),
    shift=st.integers(0, 4),
)
def test_flac_lpc_roundtrip_property(samples, coefs, shift):
    import numpy as np

    s = np.array(samples, dtype=np.int16)
    payload = mm.encode_flac(s, 0, escape_raw=True, lpc=(coefs, shift))
    out, _ = mm.decode_flac(payload)
    assert (out == s).all()


@settings(max_examples=30, deadline=None)
@given(
    left=SAMPLES16,
    right=SAMPLES16,
    mode=st.sampled_from(["left_side", "right_side", "mid_side"]),
)
def test_flac_stereo_roundtrip_property(left, right, mode):
    import numpy as np

    n = min(len(left), len(right))
    l = np.array(left[:n], dtype=np.int16)
    r = np.array(right[:n], dtype=np.int16)
    out, _ = mm.decode_flac(mm.encode_flac_stereo(l, r, mode))
    assert (out == l).all()


# --- EBML (RFC 8794): size-vint coding and SimpleBlock lacing ---


@settings(max_examples=80, deadline=None)
@given(n=st.integers(0, (1 << 56) - 2))
def test_ebml_size_vint_roundtrip_property(n):
    enc = mm._eb_size(n)
    val, pos = mm._ebml_vint(enc, 0, strip=True)
    assert (val, pos) == (n, len(enc))
    # minimal width: the encoder must not emit a wider form
    assert n >= (1 << (7 * (len(enc) - 1))) - 1 or len(enc) == 1


def _simpleblock_of(payload):
    (_, hdr_end, _), (eid, seg_start, seg_end) = list(
        mm._ebml_children(payload, 0, len(payload))
    )
    assert eid == 0x18538067
    for eid, s, e in mm._ebml_children(payload, seg_start, seg_end):
        if eid == 0x1F43B675:  # first Cluster
            for eid2, s2, e2 in mm._ebml_children(payload, s, e):
                if eid2 == 0xA3:
                    return s2, e2
    raise AssertionError("no SimpleBlock")


@settings(max_examples=40, deadline=None)
@given(
    sizes=st.lists(st.integers(0, 4000), min_size=1, max_size=8),
    mode=st.sampled_from(["none", "xiph", "ebml"]),
    fixed_size=st.integers(0, 800),
    n_fixed=st.integers(1, 8),
)
def test_mkv_lacing_roundtrip_property(sizes, mode, fixed_size, n_fixed):
    if mode == "none":
        sizes = sizes[:1]
    frames = [bytes([i % 251]) * sz for i, sz in enumerate(sizes)]
    payload = mm.encode_mkv(frames, "V_TEST", 4, 4, lacing=mode)
    s, e = _simpleblock_of(payload)
    flags = payload[s + 3]
    got, data_start = mm._mkv_lace_sizes(payload, s + 4, flags, e)
    assert got == [len(f) for f in frames]
    # the laced data region re-concatenates to the original frames
    assert payload[data_start:e] == b"".join(frames)
    # fixed lacing separately (needs equal sizes)
    eq_frames = [bytes([7]) * fixed_size] * n_fixed
    p2 = mm.encode_mkv(eq_frames, "V_TEST", 4, 4, lacing="fixed")
    s2, e2 = _simpleblock_of(p2)
    got2, d2 = mm._mkv_lace_sizes(p2, s2 + 4, p2[s2 + 3], e2)
    assert got2 == [fixed_size] * n_fixed
    assert p2[d2:e2] == b"".join(eq_frames)
