"""End-to-end pretraining-corpus preparation plan.

Composes the engine's quality-filter, dedup, and split operators into the
one job a training-data team actually ships: raw documents in, a
per-(split, language) release manifest out. The point of having it as a
single plan (rather than three separate entries) is *composition* testing —
any drift in any stage changes the kept set and therefore every manifest
aggregate, so one hash-exact oracle row pins the whole chain.

Stages (all existing operators, no new kernels):

1. ``textstats.filter_chain`` — C4/Gopher keep/drop mask with reason
   bitmask (one narrow projection, no shuffle).
2. Exact dedup of survivors — keep the smallest doc_id per
   ``md5(lower(text))`` group, expressed as a single window-min over the
   digest (ONE shuffle; cheaper than groupBy+self-join, and the digest
   keeps shuffle rows ~32 bytes at 100 TB).
3. ``sampling.hash_split`` — deterministic 98/1/1 train/val/test buckets
   from a salted 60-bit hash (pure column expression, no shuffle; adding a
   document never moves an existing one, so the manifest is resumable).
4. Manifest aggregate per (split, lang): doc count, word/char volume, and
   an order-insensitive id checksum — what a release job publishes so a
   resumed or re-run build can verify the corpus didn't drift.

Reference seam: the converter→loader handoff in the reference is a
directory of processed-crawl artifacts plus counts the control service
reads back (code/processes/converting-process, code/processes/loading-
process); this plan is the LLM-pipeline analogue with the artifacts
replaced by manifest rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators import sampling, textstats

__all__ = ["pretrain_manifest"]


def pretrain_manifest(
    docs: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
    weights: dict[str, int] | None = None,
    salt: str = "split-v1",
) -> DataFrame:
    """Filter → exact-dedup → split → per-(split, lang) release manifest.

    Returns one row per (split, lang) with ``n_docs``, ``sum_words``
    (post-filter word counts), ``sum_chars``, and ``id_checksum``
    (sum of surviving doc ids). Deterministic end to end: the filter mask
    is pure per-row arithmetic, the dedup canonical is min-id (not
    first-seen), and the split is a salted hash — so the manifest is
    byte-stable across retries, partitionings, and cluster sizes.

    Scale shape: one projection (mask) fused into the scan, one shuffle
    for the dedup window (keyed on the 32-byte digest, never the text),
    one shuffle for the final groupBy on the tiny (split, lang) key space
    with map-side partial aggregation. The doc texts never shuffle.
    """
    kept = (
        textstats.filter_chain(docs, text_col, carry=(lang_col, text_col))
        .filter(F.col("reasons") == 0)
        .drop("reasons", "keep")
    )
    # exact dedup of survivors: window-min over the digest keeps it to a
    # single shuffle (vs groupBy(min)+join's two). Everything the manifest
    # needs from the text (digest, char count) is projected BEFORE the
    # exchange, so shuffle rows are ~60 bytes and the text never moves.
    w = Window.partitionBy("text_hash")
    surv = (
        kept.select(
            "doc_id",
            lang_col,
            "n_words",
            F.length(text_col).cast("long").alias("n_chars"),
            F.md5(F.lower(F.col(text_col))).alias("text_hash"),
        )
        .withColumn("canon_id", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("canon_id"))
        .drop("text_hash", "canon_id")
    )
    return (
        sampling.hash_split(surv, weights, id_col="doc_id", salt=salt)
        .groupBy("split", lang_col)
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_words").cast("long").alias("sum_words"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
            F.sum("doc_id").cast("long").alias("id_checksum"),
        )
    )
