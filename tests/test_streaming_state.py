"""Custom stateful streaming operators: sessionization via
applyInPandasWithState (event-time timeout) and append-mode watermarked
window aggregation with late-data drop."""

import datetime
import glob
import os
import shutil

import pytest

from marginaliasearch_spark.sources.transcripts import TRANSCRIPT_SCHEMA
from marginaliasearch_spark.streaming.sessions import (
    conversation_sessions,
    windowed_event_counts,
)

_T0 = datetime.datetime(2025, 3, 1, 10, 0, 0)


def _at(minutes: float) -> datetime.datetime:
    return _T0 + datetime.timedelta(minutes=minutes)


def _drop(spark, df, input_dir, name, tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp(f"sw_{name}"))
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    shutil.copy(part, os.path.join(input_dir, f"{name}.parquet"))


def _run_once(spark, make_stream, ckpt, out_dir):
    q = (
        make_stream()
        .writeStream.foreachBatch(
            lambda df, bid: df.write.mode("append").parquet(out_dir)
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _read_out(spark, out_dir):
    if not glob.glob(os.path.join(out_dir, "part-*.parquet")):
        return []
    return spark.read.parquet(out_dir).collect()


def test_conversation_sessions_event_time_timeout(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("sess")
    input_dir, ckpt, out_dir = (
        str(base / "in"),
        str(base / "ckpt"),
        str(base / "out"),
    )
    os.makedirs(input_dir)

    def rows(items):
        return spark.createDataFrame(items, TRANSCRIPT_SCHEMA)

    # conv a: 3 turns over 2 min; conv b: 2 turns, one tool role
    wave1 = rows(
        [
            ("a", 0, "user", "hi", "", _at(0)),
            ("a", 1, "assistant", "hello", "", _at(1)),
            ("a", 2, "user", "bye", "", _at(2)),
            ("b", 0, "user", "q", "", _at(0)),
            ("b", 1, "tool", "result", "grep", _at(5)),
        ]
    )
    # far-future turns push the watermark past a/b's last_ts + gap
    wave2 = rows([("c", 0, "user", "later", "", _at(120))])
    wave3 = rows([("d", 0, "user", "latest", "", _at(240))])

    def make_stream():
        turns = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(input_dir)
        return conversation_sessions(
            turns, gap="30 minutes", watermark="10 minutes"
        )

    _drop(spark, wave1, input_dir, "w1", tmp_path_factory)
    _run_once(spark, make_stream, ckpt, out_dir)
    assert _read_out(spark, out_dir) == []  # nothing timed out yet

    _drop(spark, wave2, input_dir, "w2", tmp_path_factory)
    _run_once(spark, make_stream, ckpt, out_dir)
    _drop(spark, wave3, input_dir, "w3", tmp_path_factory)
    _run_once(spark, make_stream, ckpt, out_dir)

    got = {r["conv_id"]: r for r in _read_out(spark, out_dir)}
    assert set(got) >= {"a", "b"}
    ms = lambda m: int(_at(m).timestamp() * 1000)  # noqa: E731
    assert got["a"]["n_turns"] == 3
    assert got["a"]["first_ts_ms"] == ms(0) and got["a"]["last_ts_ms"] == ms(2)
    assert got["a"]["n_tool_turns"] == 0
    assert got["b"]["n_turns"] == 2 and got["b"]["n_tool_turns"] == 1
    # a session is emitted exactly once
    assert len(_read_out(spark, out_dir)) == len(got)


def test_conversation_sessions_gap_split_matches_session_window(
    spark, tmp_path_factory
):
    """Gap semantics must hold regardless of micro-batch arrival timing:
    an intra-batch idle gap splits a conversation into two sessions, and a
    bridging turn arriving in a LATER batch (but above the watermark)
    re-merges pending sessions — byte-identical to batch
    ``F.session_window`` over the same rows."""
    from pyspark.sql import functions as F

    base = tmp_path_factory.mktemp("sess_gap")
    input_dir, ckpt, out_dir = (
        str(base / "in"),
        str(base / "ckpt"),
        str(base / "out"),
    )
    os.makedirs(input_dir)

    def rows(items):
        return spark.createDataFrame(items, TRANSCRIPT_SCHEMA)

    # e: one batch, idle gap inside it -> two sessions (0,10) and (60,65)
    # f: split pair (0 | 40,41)
    # g: 0 and 40 arrive first (two pending sessions), then 20 bridges them
    wave1 = rows(
        [
            ("e", 0, "user", "a", "", _at(0)),
            ("e", 1, "tool", "b", "grep", _at(10)),
            ("e", 2, "user", "c", "", _at(60)),
            ("e", 3, "assistant", "d", "", _at(65)),
            ("f", 0, "user", "x", "", _at(0)),
            ("f", 1, "user", "y", "", _at(40)),
            ("f", 2, "tool", "z", "ls", _at(41)),
            ("g", 0, "user", "p", "", _at(0)),
            ("g", 1, "user", "q", "", _at(40)),
        ]
    )
    wave2 = rows([("g", 2, "assistant", "bridge", "", _at(20))])
    flush1 = rows([("zz", 0, "user", "flush", "", _at(160))])
    flush2 = rows([("zz", 1, "user", "flush", "", _at(300))])

    def make_stream():
        turns = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(input_dir)
        return conversation_sessions(
            turns, gap="30 minutes", watermark="60 minutes"
        )

    for name, wave in [
        ("w1", wave1),
        ("w2", wave2),
        ("f1", flush1),
        ("f2", flush2),
    ]:
        _drop(spark, wave, input_dir, name, tmp_path_factory)
        _run_once(spark, make_stream, ckpt, out_dir)

    got = {
        (r["conv_id"], r["first_ts_ms"]): (
            r["n_turns"],
            r["last_ts_ms"],
            r["n_tool_turns"],
        )
        for r in _read_out(spark, out_dir)
        if r["conv_id"] != "zz"
    }
    # oracle: batch session_window over the SAME rows (waves 1+2)
    expected = {
        (r["conv_id"], r["first_ts_ms"]): (
            r["n_turns"],
            r["last_ts_ms"],
            r["n_tool_turns"],
        )
        for r in (
            wave1.union(wave2)
            .groupBy("conv_id", F.session_window("ts", "30 minutes"))
            .agg(
                F.count("*").alias("n_turns"),
                (F.unix_micros(F.min("ts")) / 1000)
                .cast("long")
                .alias("first_ts_ms"),
                (F.unix_micros(F.max("ts")) / 1000)
                .cast("long")
                .alias("last_ts_ms"),
                F.sum((F.col("role") == "tool").cast("long")).alias(
                    "n_tool_turns"
                ),
            )
            .collect()
        )
    }
    assert got == expected
    assert len(got) == 5  # e:2, f:2, g:1 (bridged)
    ms = lambda m: int(_at(m).timestamp() * 1000)  # noqa: E731
    assert got[("g", ms(0))] == (3, ms(40), 0)  # the bridge merged g


def test_windowed_event_counts_append_and_late_drop(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("wagg")
    input_dir, ckpt, out_dir = (
        str(base / "in"),
        str(base / "ckpt"),
        str(base / "out"),
    )
    os.makedirs(input_dir)
    schema = "ts timestamp, event_type string, value double"

    def rows(items):
        return spark.createDataFrame(items, schema)

    wave1 = rows(
        [
            (_at(5), "click", 1.0),
            (_at(20), "click", 2.0),
            (_at(70), "view", 5.0),
        ]
    )
    wave2 = rows([(_at(120), "view", 1.0)])
    # the 100.0 row is TOO late: its window's END (11:00) is below the
    # watermark entering this batch (12:00 − 30 min = 11:30) — Spark drops
    # a row only once its whole window can no longer be open
    wave3 = rows([(_at(240), "view", 1.0), (_at(10), "click", 100.0)])
    wave4 = rows([(_at(360), "view", 1.0)])

    def make_stream():
        ev = spark.readStream.schema(schema).parquet(input_dir)
        return windowed_event_counts(ev, window="1 hour", watermark="30 minutes")

    for name, wave in [("w1", wave1), ("w2", wave2), ("w3", wave3), ("w4", wave4)]:
        _drop(spark, wave, input_dir, name, tmp_path_factory)
        _run_once(spark, make_stream, ckpt, out_dir)

    got = {
        (r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in _read_out(spark, out_dir)
    }
    # the 10:00 click window closed with its 2 ON-TIME rows; the too-late
    # 100.0 row was dropped
    assert got[(_at(0), "click")] == (2, 3.0)
    assert got[(_at(60), "view")] == (1, 5.0)
    # append mode: each emitted window appears exactly once
    assert len(_read_out(spark, out_dir)) == len(got)


def test_streaming_exact_dedup_first_occurrence_wins(spark, tmp_path_factory):
    from marginaliasearch_spark.streaming.sessions import streaming_exact_dedup

    base = tmp_path_factory.mktemp("sdedup")
    input_dir, ckpt, out_dir = (
        str(base / "in"),
        str(base / "ckpt"),
        str(base / "out"),
    )
    os.makedirs(input_dir)

    def make_stream():
        src = spark.readStream.schema("doc_id long, text string").parquet(input_dir)
        return streaming_exact_dedup(src)

    # batch 1: "alpha" twice (ids 7, 3) + unique "beta"
    b1 = spark.createDataFrame(
        [(7, "alpha"), (3, "alpha"), (5, "beta")], "doc_id long, text string"
    )
    _drop(spark, b1, input_dir, "b1", tmp_path_factory)
    _run_once(spark, make_stream, ckpt, out_dir)
    got1 = {(r["text_hash"], r["doc_id"]) for r in _read_out(spark, out_dir)}
    assert {d for _, d in got1} == {3, 5}  # within-batch min id wins

    # batch 2: "alpha" again (cross-batch dup, dropped) + case-variant
    # "BETA" (normalized dup, dropped) + fresh "gamma"
    b2 = spark.createDataFrame(
        [(1, "alpha"), (9, "BETA"), (11, "gamma")], "doc_id long, text string"
    )
    _drop(spark, b2, input_dir, "b2", tmp_path_factory)
    _run_once(spark, make_stream, ckpt, out_dir)
    got2 = {r["doc_id"] for r in _read_out(spark, out_dir)}
    assert got2 == {3, 5, 11}

    # replaying the whole input as ONE batch through the BATCH operator
    # yields the same survivor set (keeper-rule equivalence)...
    from marginaliasearch_spark.operators.dedup import exact_dedup

    full = b1.union(b2)
    batch_ids = {r["doc_id"] for r in exact_dedup(full).collect()}
    # ...except where streaming's arrival order pins an earlier-batch id
    # (id 3 arrived before id 1): batch keeps global-min 1, streaming
    # keeps first-seen 3 — same CLUSTERS, documented ordering difference
    assert batch_ids == {1, 5, 11}


def test_replay_harness_order_and_late_batch(spark, tmp_path):
    """streaming/harness.py: arrival batches are mtime-ordered slices of
    the sort order, the displace hook's rows arrive LAST, and replay
    drives one micro-batch per file — pinned via streaming_exact_dedup,
    whose keeper (first batch to contain a digest wins) is
    arrival-order-sensitive."""
    import pandas as pd
    import pyarrow as pa

    from marginaliasearch_spark.streaming.harness import (
        replay,
        write_arrival_batches,
    )
    from marginaliasearch_spark.streaming.sessions import (
        streaming_exact_dedup,
    )

    # same text for ids 5 (early) and 1 (displaced-late): without the
    # late hook id 1 would win (min doc_id); arrival order must make 5 win
    src = tmp_path / "docs.parquet"
    pd.DataFrame(
        {"doc_id": [5, 1, 9, 12], "text": ["same", "same", "other", "same"]}
    ).to_parquet(src, index=False)

    def displace(tbl):
        late = pa.array(
            [i == 1 for i in tbl.column("doc_id").to_pylist()]
        )
        import pyarrow.compute as pc

        return tbl.filter(pc.invert(late)), tbl.filter(late)

    bdir = write_arrival_batches(
        str(src), [("doc_id", "ascending")], 2, displace=displace
    )
    import os

    files = sorted(os.listdir(bdir))
    assert len(files) == 3  # 2 batches + 1 late
    mtimes = [os.path.getmtime(os.path.join(bdir, f)) for f in files]
    assert mtimes == sorted(mtimes)

    out = replay(spark, bdir, streaming_exact_dedup).toPandas()
    assert sorted(out.doc_id) == [5, 9]  # 5 beat displaced 1; 12 deduped
