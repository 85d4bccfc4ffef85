"""Deterministic bounded replay of a batch relation through a streaming
operator.

The driver's correctness gate runs batch DataFrames against DuckDB SQL —
to get the STREAMING operators (sessions.py) under that gate, an entry
must actually run a StreamingQuery and hand back its materialized output.
This harness makes that replay deterministic:

- the input relation is written as N single-file parquet "arrival
  batches" in a caller-chosen sort order (pyarrow, preserving the source
  schema exactly), with strictly increasing mtimes — Spark's
  FileStreamSource admits oldest-mtime first, so with
  ``maxFilesPerTrigger=1`` the micro-batch sequence IS the chosen order;
- the query runs with ``trigger(availableNow=True)`` into a memory sink
  (no-data micro-batches flush watermark-sealed state after the last
  file), so the emitted set depends only on (input, order, operator) —
  exactly what a SQL oracle can recompute.

Scale note: the memory sink + single-file batches are gate harness
shapes, not the production path — a real deployment points the same
operator at a live file/queue source and a parquet/Delta sink; the
operator's bounded-state contract (see sessions.py) is what carries to
100 TB streams.
"""

from __future__ import annotations

import os
import tempfile
import uuid
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


def write_arrival_batches(
    source_parquet: str,
    sort_keys: list[tuple[str, str]],
    n_batches: int,
    displace: Callable | None = None,
) -> str:
    """Split one parquet file into ``n_batches`` chronological arrival
    files (sorted by ``sort_keys``, pyarrow order spec) under a temp dir,
    mtime-ordered. ``displace(table) -> (keep, late)`` optionally carves
    out rows to append as one extra LATE-arriving batch after the rest —
    the hook entries use to exercise watermark late-drop semantics."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    tbl = pq.read_table(source_parquet)
    tbl = tbl.take(pc.sort_indices(tbl, sort_keys=sort_keys))
    late = None
    if displace is not None:
        tbl, late = displace(tbl)
    d = tempfile.mkdtemp(prefix="replay_")
    n = tbl.num_rows
    bounds = [i * n // n_batches for i in range(n_batches + 1)]
    parts = [
        tbl.slice(bounds[i], bounds[i + 1] - bounds[i])
        for i in range(n_batches)
    ]
    if late is not None and late.num_rows:
        parts.append(late)
    for i, part in enumerate(parts):
        p = os.path.join(d, f"{i:04d}.parquet")
        pq.write_table(part, p)
        os.utime(p, (1_000_000 + i, 1_000_000 + i))
    return d


def replay(
    spark: SparkSession,
    batch_dir: str,
    op: Callable[[DataFrame], DataFrame],
    ts_cols: tuple[str, ...] = (),
    state_partitions: int = 8,
) -> DataFrame:
    """Run ``op`` over the arrival batches one micro-batch per file and
    return the memory-sink table of everything it emitted. ``ts_cols``
    are cast timestamp_ntz → timestamp (event-time watermarks require the
    instant type; the session time zone must already be pinned UTC so the
    cast is deterministic).

    ``spark.sql.shuffle.partitions`` is pinned to ``state_partitions``
    for the query's lifetime (and restored after): a streaming query
    fixes its state-store partition count at start, and a replay at gate
    scale under a plain 200-partition session pays ~200 state-store
    commits + Python worker round-trips PER MICRO-BATCH otherwise (a 7×
    wall-time difference measured at sf0.01). Results are partition-count
    independent; production picks this to match cluster parallelism."""
    from pyspark.sql import functions as F

    schema = spark.read.parquet(batch_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(batch_dir)
    )
    for c in ts_cols:
        stream = stream.withColumn(c, F.col(c).cast("timestamp"))
    name = f"replay_{uuid.uuid4().hex}"
    prev = spark.conf.get("spark.sql.shuffle.partitions", None)
    spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            op(stream)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
    # drain and DROP the memory sink: each replay otherwise leaves its
    # full materialized output pinned under a uuid table for the session
    # lifetime (a 144-entry sweep + bench reps would accumulate them all)
    out = spark.table(name)
    rows = out.collect()
    result = spark.createDataFrame(rows, out.schema)
    spark.catalog.dropTempView(name)
    return result
