"""SRT / WebVTT caption parsing: clock syntaxes, block filtering,
multi-line bodies, CRLF, and the no-Python-worker plan guarantee."""

import duckdb
import pytest

from marginaliasearch_spark.functions.sql_oracles import (
    subtitle_stats_sql,
    subtitles_sql,
)
from marginaliasearch_spark.operators import subtitles


def _parse_one(spark, payload: str):
    df = spark.createDataFrame([(0, payload)], "media_id long, payload string")
    return [
        r.asDict()
        for r in subtitles.parse_subtitles(df).orderBy("cue_idx").collect()
    ]


def test_srt_basic_and_crlf(spark):
    payload = "1\r\n00:00:01,500 --> 00:00:03,000\r\nhello\r\nworld\r\n\r\n2\r\n00:01:00,000 --> 01:00:00,250\r\nbye\r\n"
    got = _parse_one(spark, payload)
    assert got == [
        {"media_id": 0, "cue_idx": 0, "start_ms": 1500, "end_ms": 3000,
         "text": "hello\nworld"},
        {"media_id": 0, "cue_idx": 1, "start_ms": 60000, "end_ms": 3600250,
         "text": "bye"},
    ]


def test_vtt_hourless_settings_note_style(spark):
    payload = (
        "WEBVTT\n\n"
        "NOTE a comment block\nstill the comment\n\n"
        "STYLE\n::cue { color: red }\n\n"
        "intro-cue\n00:05.250 --> 00:07.000 align:start position:10%\nfirst\n\n"
        "01:02:03.004 --> 01:02:04.005\nsecond line a\nsecond line b\n"
    )
    got = _parse_one(spark, payload)
    assert got == [
        {"media_id": 0, "cue_idx": 0, "start_ms": 5250, "end_ms": 7000,
         "text": "first"},
        {"media_id": 0, "cue_idx": 1,
         "start_ms": 3723004, "end_ms": 3724005,
         "text": "second line a\nsecond line b"},
    ]


def test_track_without_cues_yields_nothing(spark):
    assert _parse_one(spark, "WEBVTT\n\nNOTE nothing here\n") == []


def test_no_python_worker_in_plan(spark):
    tracks = subtitles.synth_subtitle_tracks(spark, n=4)
    plan = subtitles.parse_subtitles(tracks)._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan, marker


def test_fixture_matches_oracle(spark):
    tracks = subtitles.synth_subtitle_tracks(spark, n=16)
    got = sorted(
        tuple(r) for r in subtitles.parse_subtitles(tracks).collect()
    )
    want = sorted(tuple(r) for r in duckdb.sql(subtitles_sql(16)).fetchall())
    assert got == want


def test_stats_overlaps_exercised(spark):
    tracks = subtitles.synth_subtitle_tracks(spark, n=16)
    stats = {
        r["media_id"]: r.asDict()
        for r in subtitles.cue_stats(subtitles.parse_subtitles(tracks)).collect()
    }
    want = {r[0]: r for r in duckdb.sql(subtitle_stats_sql(16)).fetchall()}
    for mid, row in stats.items():
        assert (
            row["n_cues"], row["captioned_ms"], row["n_chars"], row["overlaps"]
        ) == want[mid][1:], mid
    # the fixture must actually exercise the overlap branch
    assert sum(r["overlaps"] for r in stats.values()) > 0


def test_cross_line_timing_match_is_dropped_not_crashed(spark):
    """A malformed cue whose '-->' spans lines matches the block-level
    regex but no single line: it must be dropped, not raise
    element_at(..., 0)."""
    payload = (
        "1\n00:00:01,000\n--> 00:00:02,000\nbroken\n\n"
        "2\n00:00:05,000 --> 00:00:06,000\ngood\n"
    )
    got = _parse_one(spark, payload)
    assert [(r["start_ms"], r["text"]) for r in got] == [(5000, "good")]


def test_fuzz_never_crashes(spark):
    """200 adversarial caption payloads (junk, truncated clocks, stray
    arrows, non-ascii noise, giant blocks) - the parser must classify
    or drop every cue, never raise: one bad sidecar in a 100-TB sweep
    must not kill the batch."""
    import random

    rng = random.Random(20260819)
    frag = [
        "00:00:01,000 --> 00:00:02,000", "00:01.000 -->", "--> 00:00:02,000",
        "99:59:59.999 --> 00:00:00.000", "WEBVTT", "NOTE x", "\u00ff\u2028",
        "a --> b", "1", ":::,", "00:00:01,00 --> 00:00:02,0000", "text",
        "00:00:01.000\n--> 00:00:02.000", "x" * 500, "",
    ]
    payloads = []
    for i in range(200):
        n = rng.randint(0, 8)
        payloads.append(
            (i, "\n\n".join("\n".join(rng.choices(frag, k=rng.randint(1, 4)))
                            for _ in range(n)))
        )
    df = spark.createDataFrame(payloads, "media_id long, payload string")
    out = subtitles.parse_subtitles(df)
    assert out.count() >= 0  # completes without raising
    bad = out.where((out.start_ms < 0) | (out.end_ms < 0)).count()
    assert bad == 0
