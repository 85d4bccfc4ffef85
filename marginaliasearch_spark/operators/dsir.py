"""DSIR-style data selection: hashed n-gram importance resampling.

Re-expresses "Data Selection for Language Models via Importance Resampling"
(Xie et al. 2023) as a pure-JVM Spark pipeline over the ``documents`` shape:
raw-pool documents are weighted by how much their hashed unigram+bigram
feature distribution looks like a (small) target corpus, then the top
fraction by weight is selected. This is the canonical "make 100 TB of crawl
look like Wikipedia" pre-training op — the reference engine has no
analogue (it is a search engine, not a data pipeline), so the op follows
the paper directly.

Scale shape (the part that must survive 100 TB):

- features are HASHED into ``n_buckets`` (default 4096): the per-bucket
  distribution tables are O(buckets) rows regardless of corpus size, and
  broadcast into the per-document join — no vocabulary-sized state.
- exactly two data-sized shuffles: the (doc, bucket) count aggregation and
  the per-doc weight fold; target/raw totals are two O(buckets) aggregates.
- everything is column expressions (regex tokenize, zip_with bigrams,
  md5 bucket hash, fold) — whole-stage codegen, no Python in the hot path.
- selection is a global top-N = TakeOrderedAndProject, not a full sort.

Float determinism (for the cross-engine oracle): per-bucket log-ratios are
a fixed scalar expression; the per-doc weight folds contributions in
ascending-bucket order with a left-associated ``F.aggregate`` — the DuckDB
twin replays the identical op sequence via ``list_reduce(list_prepend(0.0,
list(contrib ORDER BY bucket)))`` — and only the final weight is rounded.
Totals stay exact integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: feature-hash salt — part of the on-disk/oracle contract
DSIR_SALT = "dsir-v1"
#: default feature-hash dimensionality (the paper uses 10k; 4096 keeps the
#: bucket tables broadcast-tiny while leaving collisions ~harmless)
DSIR_BUCKETS = 4096


def _hash60_str(col: F.Column, salt: str) -> F.Column:
    """60-bit uint from a salted string (same construction as
    sampling._hash60; SQL twin ``('0x' || substr(md5('<salt>:' || s), 1,
    15))::BIGINT``)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt + ":"), col)), 1, 15), 16, 10
    ).cast("long")


def _token_array(text: F.Column) -> F.Column:
    """Word tokens — identical to the dedup oracles' token relation
    (lowercase, ``[^a-z0-9]+`` split, non-empty, len < 64)."""
    return F.filter(
        F.split(F.lower(text), "[^a-z0-9]+"),
        lambda t: (t != "") & (F.length(t) < 64),
    )


def hashed_ngram_counts(
    docs: DataFrame,
    n_buckets: int = DSIR_BUCKETS,
    salt: str = DSIR_SALT,
) -> DataFrame:
    """documents(doc_id, text, ...) → (doc_id, bucket, cnt): hashed
    unigram+bigram feature counts (the paper's hashed n-gram features).

    Unigrams and bigrams are built as array expressions (no shuffle until
    the count aggregation); the bucket is a salted 60-bit md5 hash mod
    ``n_buckets`` so the oracle can replay it exactly.
    """
    toks = _token_array(F.col("text"))
    big = F.when(
        F.size(toks) >= 2,
        F.zip_with(
            F.slice(toks, 1, F.size(toks) - 1),
            F.slice(toks, 2, F.size(toks) - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    ngrams = F.concat(toks, big)
    return (
        docs.select("doc_id", F.explode(ngrams).alias("ng"))
        .select(
            "doc_id",
            F.pmod(_hash60_str(F.col("ng"), salt), F.lit(n_buckets)).alias(
                "bucket"
            ),
        )
        .groupBy("doc_id", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def importance_weights(
    docs: DataFrame,
    target_pred: F.Column,
    n_buckets: int = DSIR_BUCKETS,
    salt: str = DSIR_SALT,
) -> DataFrame:
    """Per-raw-document DSIR importance weight.

    ``target_pred`` is a boolean column over ``docs`` marking the target
    corpus; every OTHER document (the raw pool) gets
    ``logw = Σ_b cnt_b · (ln p̂_b − ln q̂_b)`` where p̂/q̂ are the add-1
    smoothed hashed-feature distributions of the target and raw pools
    (Xie et al. 2023 eq. 2, bag-of-hashed-ngrams variant). Returns
    (doc_id, logw) with logw rounded to 6 decimals.
    """
    flagged = docs.select("doc_id", target_pred.alias("is_target"))
    counts = hashed_ngram_counts(docs, n_buckets, salt).join(
        F.broadcast(flagged), "doc_id"
    )
    # O(buckets)-row distribution table: exact-integer per-bucket totals
    # for both pools in ONE aggregation pass
    dist = counts.groupBy("bucket").agg(
        F.sum(F.when(F.col("is_target"), F.col("cnt")).otherwise(0)).alias(
            "tcnt"
        ),
        F.sum(F.when(~F.col("is_target"), F.col("cnt")).otherwise(0)).alias(
            "rcnt"
        ),
    )
    totals = dist.agg(
        F.sum("tcnt").alias("T"), F.sum("rcnt").alias("R")
    ).collect()[0]
    t_tot, r_tot = int(totals["T"] or 0), int(totals["R"] or 0)
    # fixed scalar expression — written identically in the SQL oracle
    lr = F.log(
        (F.col("tcnt").cast("double") + F.lit(1.0))
        / F.lit(float(t_tot + n_buckets))
    ) - F.log(
        (F.col("rcnt").cast("double") + F.lit(1.0))
        / F.lit(float(r_tot + n_buckets))
    )
    bucket_lr = dist.select("bucket", lr.alias("lr"))
    contribs = (
        counts.filter(~F.col("is_target"))
        .join(F.broadcast(bucket_lr), "bucket")
        .select(
            "doc_id",
            "bucket",
            (F.col("cnt").cast("double") * F.col("lr")).alias("contrib"),
        )
    )
    # left-fold in ascending-bucket order → cross-engine-identical double
    folded = (
        contribs.groupBy("doc_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("bucket", "contrib"))
            ).alias("cs")
        )
        .select(
            "doc_id",
            F.round(
                F.aggregate(
                    F.transform(F.col("cs"), lambda s: s["contrib"]),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                6,
            ).alias("logw"),
        )
    )
    return folded


def importance_resample(
    docs: DataFrame,
    target_pred: F.Column,
    n: int,
    n_buckets: int = DSIR_BUCKETS,
    salt: str = DSIR_SALT,
) -> DataFrame:
    """Top-``n`` raw documents by importance weight (ties broken by
    ascending doc_id, so the selection is reproducible). The paper samples
    Gumbel-perturbed weights; the deterministic top-n variant keeps the
    selection resumable and oracle-checkable, and a seeded perturbation
    can be layered on via sampling.hash_split-style salted hashes.

    Plan shape: weight computation as above, then ONE
    TakeOrderedAndProject — no full sort, no extra shuffle.
    """
    w = importance_weights(docs, target_pred, n_buckets, salt)
    return w.orderBy(F.col("logw").desc(), F.col("doc_id").asc()).limit(n)
