"""Streaming journal ingestion: transcript files → per-batch journal segments.

``readStream`` over a parquet directory of transcript turns; each micro-batch
groups complete conversations, tokenizes them with the SAME kernels as the
batch path (ingest.build_journal), and appends a journal segment keyed by
batch id. Compaction into the main postings index is the batch builder run
over the accumulated segments — mirroring the reference's journal→construct
split, where the journal is an append-only intermediate and index
construction is a separate, resumable batch step.

Caveat (documented divergence): conversations split across micro-batches are
re-assembled at compaction time, not within the stream — the journal segment
holds *turn-level* term postings, and compaction groups by conv_id across
segments. Watermarking is on ``ts`` with a configurable lateness bound.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import ingest
from ..sources.transcripts import TRANSCRIPT_SCHEMA


def start_stream_ingest(
    spark: SparkSession,
    input_dir: str,
    journal_dir: str,
    checkpoint_dir: str,
    trigger_once: bool = True,
):
    """Start (or run-once) the streaming journal writer.

    Exactly-once via the checkpoint dir + idempotent per-batch output paths;
    ``trigger_once=True`` (availableNow) drains pending files and stops —
    the test/CI mode; production uses a processing-time trigger.
    """
    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
        .withWatermark("ts", "1 hour")
    )

    def sink(batch_df: DataFrame, batch_id: int):
        journal = ingest.build_journal(batch_df)
        out = os.path.join(journal_dir, f"batch={batch_id}")
        journal.write.mode("overwrite").parquet(out)  # idempotent per batch

    writer = stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_once:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.trigger(processingTime="30 seconds").start()


def read_journal_segments(spark: SparkSession, journal_dir: str) -> DataFrame:
    """All accumulated journal segments (for compaction into the index).

    A conv split across batches appears once per batch; compaction re-groups:
    doc_len/tf are summed per (conv, term) and positions re-based — for the
    common case (whole conv per batch) this is a no-op pass-through.
    """
    return spark.read.parquet(os.path.join(journal_dir, "batch=*"))
