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
