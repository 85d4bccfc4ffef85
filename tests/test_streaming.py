"""Streaming ingestion tests: exactly-once staging, cross-batch conversation
assembly, and the atomic index swap — the streamed index must answer queries
identically to a batch build over the same turns."""

import os

import pytest
from pyspark.sql import functions as F

from marginaliasearch_spark.operators.index_build import IndexPaths, build_index
from marginaliasearch_spark.operators.query_exec import IndexReader, run_query
from marginaliasearch_spark.sources.transcripts import bm25_corpus
from marginaliasearch_spark.streaming.ingest import (
    compact_to_index,
    read_staged_turns,
    start_stream_ingest,
)


@pytest.fixture(scope="module")
def dirs(tmp_path_factory):
    base = tmp_path_factory.mktemp("stream")
    d = {
        "input": str(base / "input"),
        "staging": str(base / "staging"),
        "ckpt": str(base / "ckpt"),
        "link": str(base / "live_index"),
    }
    os.makedirs(d["input"])
    return d


def _drop_wave(df, input_dir: str, name: str, tmp_path_factory):
    """Write a flat parquet FILE into the stream input dir (the file stream
    source lists plain files, not nested output directories)."""
    import glob
    import shutil

    tmp = str(tmp_path_factory.mktemp(f"wave_{name}"))
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    shutil.copy(part, os.path.join(input_dir, f"{name}.parquet"))


def test_stream_to_index_equals_batch(spark, dirs, tmp_path_factory):
    corpus = bm25_corpus(spark, 60).cache()
    n_turns = corpus.count()

    # wave 1: even turn_idx; wave 2: odd — every multi-turn conversation is
    # split across micro-batches (the hard case for position assembly)
    _drop_wave(
        corpus.filter(F.col("turn_idx") % 2 == 0),
        dirs["input"], "wave1", tmp_path_factory,
    )
    start_stream_ingest(spark, dirs["input"], dirs["staging"], dirs["ckpt"])
    _drop_wave(
        corpus.filter(F.col("turn_idx") % 2 == 1),
        dirs["input"], "wave2", tmp_path_factory,
    )
    start_stream_ingest(spark, dirs["input"], dirs["staging"], dirs["ckpt"])

    staged = read_staged_turns(spark, dirs["staging"])
    assert staged.count() == n_turns

    # exactly-once: re-running with the same checkpoint adds nothing
    start_stream_ingest(spark, dirs["input"], dirs["staging"], dirs["ckpt"])
    assert read_staged_turns(spark, dirs["staging"]).count() == n_turns

    compact_to_index(spark, dirs["staging"], dirs["link"])
    streamed = IndexReader(spark, IndexPaths(os.readlink(dirs["link"])))

    batch_root = str(tmp_path_factory.mktemp("batchidx"))
    build_index(spark, corpus, batch_root, n_buckets=1)
    batch = IndexReader(spark, IndexPaths(batch_root))

    for q in ["word00 word03", "word01 -word07", "word02 len>30"]:
        a = [(r["conv_id"], round(r["score"], 9)) for r in run_query(streamed, q, k=10).collect()]
        b = [(r["conv_id"], round(r["score"], 9)) for r in run_query(batch, q, k=10).collect()]
        assert a == b, q

    # swap is atomic + repeatable: recompaction retargets the symlink
    old_target = os.readlink(dirs["link"])
    compact_to_index(spark, dirs["staging"], dirs["link"])
    assert os.path.islink(dirs["link"])
    assert os.readlink(dirs["link"]) != old_target
    again = IndexReader(spark, IndexPaths(os.readlink(dirs["link"])))
    r1 = run_query(again, "word00 word03", k=5).collect()
    assert len(r1) == 5
    corpus.unpersist()
