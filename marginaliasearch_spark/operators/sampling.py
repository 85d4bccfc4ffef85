"""Deterministic corpus sampling / splitting over ``documents``.

Training-data pipelines carve a corpus into train/val/test and draw
stratified subsamples (per-language, per-quality-bucket) for evals and
ablations. At 100 TB both must be:

- **deterministic** — re-running the pipeline (or resuming a partial run)
  must assign every document to the same split, so the assignment is a
  pure hash of the document id, never ``rand()`` / ``sample()`` (Spark's
  ``DataFrame.sample`` is seed-stable only for a fixed partitioning —
  repartitioning the input silently reshuffles who is sampled);
- **shuffle-free where possible** — hash-threshold assignment is a pure
  per-row column expression (no shuffle at all); exact-quota stratified
  sampling needs one shuffle on the stratum key (a per-stratum sort), the
  minimum any exact-count sample needs.

Hashing is md5 over a salted id (first 15 hex chars → 60-bit uint), the
same construction the similarity module uses for deterministic centroid
sampling, so every assignment re-computes bit-exactly in the DuckDB
oracle: ``('0x' || substr(md5(...), 1, 15))::UBIGINT``.

Reference analogue: Marginalia partitions work by stable id hash
(code/common/model/java/nu/marginalia/model/id/UrlIdCodec.java assigns
documents stable ids precisely so downstream passes are reproducible);
split/sample semantics for LLM corpora follow the deterministic-holdout
practice of The Pile / Gopher / Dolma pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

HASH_BITS = 60  # 15 hex chars of md5 — fits signed int64 on the JVM
HASH_MOD = 1 << HASH_BITS


def _hash60(col: F.Column, salt: str) -> F.Column:
    """Deterministic 60-bit uint from a salted id column (SQL twin:
    ``('0x' || substr(md5('<salt>:' || id), 1, 15))::UBIGINT``)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt + ":"), col.cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")


def hash_split(
    docs: DataFrame,
    weights: dict[str, int] | None = None,
    id_col: str = "doc_id",
    salt: str = "split-v1",
) -> DataFrame:
    """Assign every document to a named split by integer hash buckets.

    ``weights`` maps split name → integer weight; a document lands in
    split s when ``hash % total_weight`` falls in s's cumulative range
    (ranges follow the dict's insertion order). Pure column expression —
    no shuffle, no state, resumable by construction; adding a document
    never moves an existing one.
    """
    if weights is None:
        weights = {"train": 98, "val": 1, "test": 1}
    total = sum(weights.values())
    bucket = F.pmod(_hash60(F.col(id_col), salt), F.lit(total))
    expr = None
    lo = 0
    for name, w in weights.items():
        cond = bucket < F.lit(lo + w)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
        lo += w
    return docs.withColumn("split", expr)


def split_summary(
    docs: DataFrame,
    weights: dict[str, int] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "split-v1",
) -> DataFrame:
    """Per-split audit aggregate: row count, byte volume, and an
    order-insensitive id checksum (sum of doc ids) — the manifest row a
    100-TB split job publishes so a resume can verify the assignment
    didn't drift."""
    return (
        hash_split(docs, weights, id_col=id_col, salt=salt)
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.length(text_col)).alias("sum_len"),
            F.sum(id_col).alias("id_checksum"),
        )
    )


def stratified_sample(
    docs: DataFrame,
    fraction: float,
    strata_col: str,
    id_col: str = "doc_id",
    salt: str = "sample-v1",
) -> DataFrame:
    """Exact-quota stratified sample: from each stratum, exactly
    ``ceil(fraction * stratum_size)`` documents, chosen as the smallest
    salted hashes (a deterministic total order uncorrelated with content).

    One shuffle (window partitioned by stratum, ordered by hash). Unlike
    a hash-threshold sample this hits the quota *exactly* per stratum —
    what eval-set construction needs — at the cost of the per-stratum
    sort. A skewed stratum (one language = 90% of the corpus) makes one
    window partition hot; at 100 TB, pre-aggregate per-stratum counts and
    fall back to threshold sampling for strata above a size cutoff (the
    quota error is negligible exactly when the stratum is huge).
    """
    h = _hash60(F.col(id_col), salt)
    w = Window.partitionBy(strata_col).orderBy("h", id_col)
    n = Window.partitionBy(strata_col)
    return (
        docs.withColumn("h", h)
        .withColumn("rn", F.row_number().over(w))
        .withColumn("quota", F.ceil(F.count("*").over(n) * F.lit(fraction)))
        .filter(F.col("rn") <= F.col("quota"))
        .drop("h", "rn", "quota")
    )
