"""Streaming ingestion: transcript turn stream → staging table → index swap.

Mirrors the reference's ingestion topology (live capture feeds the journal
as append-only batches; index construction is a separate resumable batch
step followed by an atomic switch — ``StatefulIndex.switchIndex()``,
``IndexQueryServiceIntegrationSmokeTest.java:117-119``):

- ``start_stream_ingest`` — ``readStream`` over a transcript directory,
  watermarked on ``ts``; each micro-batch appends its raw turns to a
  staging area under an idempotent per-batch path (exactly-once via the
  checkpoint + overwrite-by-batch-id; re-running a batch after a crash
  rewrites the same files).
- ``compact_to_index`` — batch index build over ALL accumulated turns into
  a fresh index root, then an atomic symlink swap. Building from raw turns
  (not per-batch journals) is what makes cross-batch conversations correct:
  a conversation whose turns arrive in different micro-batches is assembled
  once, at compaction, under stable ``turn_idx`` order — per-batch token
  positions could not be re-based after the fact (the 1-based position
  stream with +2 turn padding depends on all earlier turns).

Why turns (not postings) are the streaming unit: the reference's loader
also appends doc-batches to the journal and defers ALL index construction
to the batch constructor; Structured Streaming gives us the same shape with
exactly-once bookkeeping for free.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

from ..operators.index_build import IndexPaths, build_index
from ..sources.transcripts import TRANSCRIPT_SCHEMA


def start_stream_ingest(
    spark: SparkSession,
    input_dir: str,
    staging_dir: str,
    checkpoint_dir: str,
    trigger_once: bool = True,
    watermark: str = "1 hour",
):
    """Start (or run-once) the streaming turn appender.

    ``trigger_once=True`` (availableNow) drains pending files and stops —
    the test/CI mode; production uses a processing-time trigger.
    """
    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
        .withWatermark("ts", watermark)
    )

    def sink(batch_df: DataFrame, batch_id: int):
        out = os.path.join(staging_dir, f"batch={batch_id}")
        # overwrite of the deterministic per-batch path = idempotent replay
        batch_df.write.mode("overwrite").parquet(out)

    writer = stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_once:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.trigger(processingTime="30 seconds").start()


def read_staged_turns(spark: SparkSession, staging_dir: str) -> DataFrame:
    """All accumulated turns, deduplicated on (conv_id, turn_idx) — replayed
    micro-batches overwrite their own path, and a turn re-delivered across
    batch boundaries (at-least-once upstream) collapses here."""
    return spark.read.parquet(os.path.join(staging_dir, "batch=*")).dropDuplicates(
        ["conv_id", "turn_idx"]
    )


def compact_to_index(
    spark: SparkSession,
    staging_dir: str,
    index_link: str,
    n_buckets: int = 1,
) -> IndexPaths:
    """Rebuild the index over all staged turns; atomically swap ``index_link``.

    ``index_link`` is a symlink to the live index root (the reference's
    switchIndex; on a cluster this is an Iceberg snapshot commit). Readers
    opening the link after the swap see the new index; the old root is left
    for in-flight readers (GC is the caller's policy).
    """
    turns = read_staged_turns(spark, staging_dir)
    new_root = tempfile.mkdtemp(
        prefix="idx_", dir=os.path.dirname(os.path.abspath(index_link)) or "."
    )
    paths = build_index(spark, turns, new_root, n_buckets=n_buckets)
    tmp_link = index_link + ".tmp"
    if os.path.lexists(tmp_link):
        os.unlink(tmp_link)
    os.symlink(new_root, tmp_link)
    os.replace(tmp_link, index_link)  # atomic on POSIX
    return paths
