"""Incremental ingestion via Structured Streaming.

The reference is strictly batch (journal → construct → atomic switch); its
"live" modules feed batches. We still provide a streaming ingest path —
new transcript files appear, each micro-batch appends journal segments —
because an always-on transcript firehose is the realistic 100 TB deployment.
"""
