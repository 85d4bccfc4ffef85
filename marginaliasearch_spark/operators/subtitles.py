"""Subtitle / caption track parsing (SRT, WebVTT) — JVM-side, no UDFs.

Captions are the transcript modality of video: a 100-TB media-ingest
pipeline turns caption sidecars into (start_ms, end_ms, text) turn rows
that feed the SAME tokenize → index pipeline as conversation turns
(reference analogue: the converting process's per-format document
parsers feeding one keyword extractor downstream,
``code/processes/converting-process``).

Everything here is built-in expression work (split / posexplode /
regexp_extract / higher-order array functions), so the parse stays
inside whole-stage codegen and scales like any narrow projection — no
Python worker, no Arrow transfer. Cue bodies are reconstructed with the
original newlines; WEBVTT headers, NOTE/STYLE blocks and cue-settings
suffixes are dropped per the WebVTT spec; SRT's "HH:MM:SS,mmm" and
WebVTT's "[HH:]MM:SS.mmm" clocks are both accepted, hours optional.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# one timestamp: optional hours, minutes, seconds, millis (comma or dot)
_TS = r"(?:(\d+):)?(\d{1,2}):(\d{1,2})[.,](\d{3})"
_TIMING = rf"{_TS}\s*-->\s*{_TS}"

SUBTITLE_SCHEMA = (
    "media_id long, cue_idx int, start_ms long, end_ms long, text string"
)


def _clock_ms(clock: F.Column) -> F.Column:
    """One clock substring ("[HH:]MM:SS[.,]mmm") → millis. The caller
    pre-extracts each side of the arrow once, so the 4-group ``_TS``
    pattern runs on a ~12-char string instead of re-running the 8-group
    full-line pattern for every group."""

    def g(i: int) -> F.Column:
        raw = F.regexp_extract(clock, _TS, i)
        return F.when(raw == "", F.lit(0)).otherwise(raw.cast("long"))

    return g(1) * 3600000 + g(2) * 60000 + g(3) * 1000 + g(4)


def parse_subtitles(
    tracks: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Caption documents → one row per cue: ``(media_id, cue_idx,
    start_ms, end_ms, text)``.

    ``cue_idx`` is the 0-based cue position within the track (NOT the
    SRT index line — WebVTT has no numbering, and renumbering makes the
    two formats join-compatible). Blocks without a ``-->`` timing line
    (the WEBVTT magic, NOTE/STYLE comments) are dropped; an SRT index
    line or a WebVTT cue identifier before the timing line is skipped;
    cue-settings text after the end timestamp is ignored.
    """
    lines_col = "__cue_lines"
    timing_pos = "__timing_pos"
    cues = (
        tracks.select(
            F.col(id_col).alias("media_id"),
            F.posexplode(
                F.split(F.regexp_replace(F.col(payload_col), "\r\n", "\n"), "\n{2,}")
            ).alias("__pos", "__cue"),
        )
        .where(F.col("__cue").rlike(_TIMING))
        .withColumn(lines_col, F.split(F.col("__cue"), "\n"))
        .withColumn(
            timing_pos,
            F.array_position(
                F.transform(F.col(lines_col), lambda l: l.rlike(_TIMING)),
                F.lit(True),
            ).cast("int"),
        )
        # the block-level rlike can match ACROSS lines (\s* spans \n in a
        # malformed cue like "00:00:01,000\n--> 00:00:02,000"); if no
        # single line carries the timing, array_position is 0 and
        # element_at(…, 0) would throw — drop the cue instead
        .where(F.col(timing_pos) >= 1)
    )
    # F.get (0-based, NULL out of bounds) everywhere, never element_at:
    # Catalyst may push a caller's predicate on these computed columns
    # BELOW the timing_pos >= 1 guard (adjacent filters reorder), so the
    # expressions must be total functions — a throwing index would make
    # downstream filters crash on rows the guard was about to drop
    timing_line = F.get(F.col(lines_col), F.col(timing_pos) - 1)
    # split the timing line at the arrow ONCE; clock decode then runs the
    # small _TS pattern on each ~12-char half (cue settings trail the end
    # clock in half 2 and are ignored by regexp_extract)
    halves = F.split(timing_line, "-->", 2)
    w = Window.partitionBy("media_id").orderBy("__pos")
    return cues.select(
        "media_id",
        (F.row_number().over(w) - 1).cast("int").alias("cue_idx"),
        _clock_ms(F.get(halves, 0)).alias("start_ms"),
        _clock_ms(F.get(halves, 1)).alias("end_ms"),
        F.array_join(
            # drop empty lines: a blank line terminates a cue per spec, so
            # empties only arise from a file's trailing newline
            F.filter(
                F.slice(
                    F.col(lines_col),
                    F.col(timing_pos) + 1,
                    F.greatest(
                        F.size(F.col(lines_col)) - F.col(timing_pos), F.lit(0)
                    ),
                ),
                lambda l: l != F.lit(""),
            ),
            "\n",
        ).alias("text"),
    )


def cue_stats(cues: DataFrame) -> DataFrame:
    """Per-track caption statistics — the quality-gate columns an ingest
    pipeline filters on before scheduling heavier work: cue count, total
    captioned millis, chars/sec rate, overlap count (cues starting
    before the previous one ended)."""
    w = Window.partitionBy("media_id").orderBy("cue_idx")
    with_prev = cues.withColumn("__prev_end", F.lag("end_ms").over(w))
    return with_prev.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n_cues"),
        F.sum(F.col("end_ms") - F.col("start_ms")).alias("captioned_ms"),
        F.sum(F.length("text")).alias("n_chars"),
        F.sum(
            F.when(
                F.col("__prev_end").isNotNull()
                & (F.col("start_ms") < F.col("__prev_end")),
                1,
            ).otherwise(0)
        ).alias("overlaps"),
    )


def synth_subtitle_tracks(spark, n: int = 64) -> DataFrame:
    """Deterministic SRT / WebVTT caption table by ``media_id % 2``
    (even: SRT with index lines and comma clocks; odd: WebVTT with a
    NOTE block, hour-less clocks when ``i % 4 == 1``, a cue identifier
    line when ``k % 5 == 2`` and cue settings when ``k % 4 == 1``).
    Cue k of track i: start = ``k*2000 + (i*37) % 500``, duration =
    ``800 + (i*977 + k*641) % 2400``, text = ``'cue {i} {k}'`` plus a
    second line when ``k % 3 == 0`` — closed forms the DuckDB twin
    (``sql_oracles.subtitles_sql``) states directly."""

    def clock(ms: int, comma: bool, with_hours: bool) -> str:
        h, rem = divmod(ms, 3600000)
        m, rem = divmod(rem, 60000)
        s, milli = divmod(rem, 1000)
        sep = "," if comma else "."
        # WebVTT's hour-less form caps minutes at two digits (00-59):
        # past an hour the spec requires the hours component
        if with_hours or h > 0:
            return f"{h:02d}:{m:02d}:{s:02d}{sep}{milli:03d}"
        return f"{m:02d}:{s:02d}{sep}{milli:03d}"

    rows = []
    for i in range(n):
        n_cues = 5 + (i * 3) % 12
        vtt = i % 2 == 1
        blocks = []
        if vtt:
            blocks.append("WEBVTT")
            blocks.append("NOTE synthetic caption fixture")
        for k in range(n_cues):
            start = k * 2000 + (i * 37) % 500
            end = start + 800 + (i * 977 + k * 641) % 2400
            text = f"cue {i} {k}" + (f"\nline2 {k}" if k % 3 == 0 else "")
            if vtt:
                timing = (
                    f"{clock(start, False, i % 4 != 1)} --> "
                    f"{clock(end, False, i % 4 != 1)}"
                )
                if k % 4 == 1:
                    timing += " align:start position:10%"
                head = [f"cue-id-{k}"] if k % 5 == 2 else []
                blocks.append("\n".join(head + [timing, text]))
            else:
                timing = (
                    f"{clock(start, True, True)} --> {clock(end, True, True)}"
                )
                blocks.append("\n".join([str(k + 1), timing, text]))
        rows.append((i, "\n\n".join(blocks) + "\n"))
    return spark.createDataFrame(rows, "media_id long, payload string")
