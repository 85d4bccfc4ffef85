"""Distributed n-gram language-model scoring (Stupid Backoff).

The CCNet recipe (Wenzek et al. 2020) gates crawl text on the perplexity of
a language model trained on a clean target corpus; at cluster scale the
standard LM is count-based Stupid Backoff (Brants et al. 2007, "Large
Language Models in Machine Translation"), which was *designed* for
MapReduce-style distributed counting — no normalization pass, no
discounting state, just two count tables:

    S(w_i | w_{i-1}) = c(w_{i-1} w_i) / c(w_{i-1})      if the bigram is seen
                     = alpha * (c(w_i) + 1) / (N + V)    otherwise

(the unigram backoff is add-1 smoothed over the LM corpus's N tokens and
V-word vocabulary so unseen words score finitely). Document score =
Σ ln S over token transitions; pseudo-perplexity = exp(-logprob / n_trans).

Scale shape:

- LM tables are (ngram → exact integer count) relations — vocabulary-sized,
  NOT broadcast: the doc-bigram → LM-bigram join is a shuffle hash join
  co-keyed on the ngram, exactly how distributed LMs serve counts. The
  unigram table is small enough to broadcast in practice but the plan
  works either way (AQE decides).
- counting is two partial-first aggregations over pure codegen token
  expressions (adjacent pairs come straight from the token array via
  zip_with — no positions self-join); scoring adds the bigram/unigram
  count joins + one per-doc fold shuffle. No Python anywhere.

Float determinism (cross-engine oracle): counts are exact integers; each
transition's ln-score is a fixed scalar expression; the per-doc sum folds
transitions in ascending token-position order (left-associated
``F.aggregate`` ↔ DuckDB ``list_reduce`` over ``ORDER BY pos``); only the
final logprob/perplexity are rounded (6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: Stupid Backoff's fixed backoff weight (Brants et al. 2007 §4: "we use
#: a single value alpha = 0.4 for all backoffs")
BACKOFF_ALPHA = 0.4


def _tokens(text: F.Column) -> F.Column:
    """The dedup-oracle token array (lowercase, ``[^a-z0-9]+`` split,
    non-empty, len < 64)."""
    return F.filter(
        F.split(F.lower(text), "[^a-z0-9]+"),
        lambda t: (t != "") & (F.length(t) < 64),
    )


def _transitions(docs: DataFrame) -> DataFrame:
    """(doc_id, pos, prev, cur): adjacent token pairs, built from the token
    array with zip_with + posexplode — one scan, no self-join, no shuffle
    before the consumer's aggregation."""
    toks = _tokens(F.col("text"))
    pairs = F.when(
        F.size(toks) >= 2,
        F.zip_with(
            F.slice(toks, 1, F.size(toks) - 1),
            F.slice(toks, 2, F.size(toks) - 1),
            lambda a, b: F.struct(a.alias("prev"), b.alias("cur")),
        ),
    ).otherwise(F.array().cast("array<struct<prev:string,cur:string>>"))
    return docs.select(
        "doc_id", F.posexplode(pairs).alias("pos", "pc")
    ).select(
        "doc_id",
        "pos",
        F.col("pc.prev").alias("prev"),
        F.col("pc.cur").alias("cur"),
    )


def lm_counts(lm_docs: DataFrame) -> tuple[DataFrame, DataFrame, int, int]:
    """LM corpus → (bigram counts, unigram counts, N total tokens, V vocab
    size). Two aggregations; N/V are exact-integer driver scalars (a 1-row
    probe, like the index's corpus stats)."""
    uni = (
        lm_docs.select(F.explode(_tokens(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("uc"))
    )
    big = (
        _transitions(lm_docs)
        .groupBy("prev", "cur")
        .agg(F.count("*").alias("bc"))
    )
    totals = uni.agg(
        F.sum("uc").alias("n"), F.count("*").alias("v")
    ).collect()[0]
    return big, uni, int(totals["n"] or 0), int(totals["v"] or 0)


def stupid_backoff_scores(
    docs: DataFrame,
    lm_docs: DataFrame,
    alpha: float = BACKOFF_ALPHA,
) -> DataFrame:
    """Score every document of ``docs`` under the Stupid Backoff LM counted
    from ``lm_docs``: (doc_id, n_trans, logprob, ppl), ppl =
    exp(-logprob / n_trans) rounded to 6 (docs with < 2 tokens have no
    transitions and are omitted, as in CCNet's length floor)."""
    big, uni, n_tok, v = lm_counts(lm_docs)
    trans = _transitions(docs)
    scored = (
        trans.join(
            big, ["prev", "cur"], "left"
        )
        .join(uni.withColumnRenamed("term", "prev"), ["prev"], "left")
        .join(
            uni.select(
                F.col("term").alias("cur"), F.col("uc").alias("cur_uc")
            ),
            ["cur"],
            "left",
        )
    )
    # fixed scalar expression per transition — mirrored in the SQL twin
    seen = F.col("bc").isNotNull() & F.col("uc").isNotNull()
    ln_s = F.when(
        seen, F.log(F.col("bc").cast("double") / F.col("uc").cast("double"))
    ).otherwise(
        F.log(
            F.lit(float(alpha))
            * (F.coalesce(F.col("cur_uc"), F.lit(0)).cast("double") + F.lit(1.0))
            / F.lit(float(n_tok + v))
        )
    )
    per_tr = scored.select("doc_id", "pos", ln_s.alias("lp"))
    folded = (
        per_tr.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_trans"),
            F.sort_array(F.collect_list(F.struct("pos", "lp"))).alias("cs"),
        )
        .select(
            "doc_id",
            F.col("n_trans").cast("long").alias("n_trans"),
            F.round(
                F.aggregate(
                    F.transform(F.col("cs"), lambda s: s["lp"]),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                6,
            ).alias("logprob"),
        )
    )
    return folded.select(
        "doc_id",
        "n_trans",
        "logprob",
        F.round(
            F.exp(-F.col("logprob") / F.col("n_trans").cast("double")), 6
        ).alias("ppl"),
    )


def ppl_buckets(
    scored: DataFrame,
    buckets: int = 3,
    n_parts: int = 32,
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet head/middle/tail split (Wenzek et al. 2020 §4.3): documents
    ranked by pseudo-perplexity are cut into ``buckets`` equal-size
    tranches — bucket 1 ("head") is the most-fluent third that training
    pipelines keep preferentially.

    Distributed exact rank, no single-partition window: range-repartition
    on (ppl, id), per-partition counts to the driver (``n_parts`` rows),
    cumulative offsets + per-partition row_number. The global rank
    depends only on the total order, so the sampled range boundaries do
    not affect the result. (CCNet itself assigns by *threshold* from the
    training distribution; thresholds fall out of this rank relation as
    the ppl at ranks k·n/buckets, so either assignment form is served.)

    Output: (doc_id, ppl, rank, bucket, tranche) — tranche is the CCNet
    label for the default 3 buckets, else "b<i>".
    """
    from pyspark.sql import Window

    part = scored.repartitionByRange(
        n_parts, F.col("ppl"), F.col(id_col)
    ).withColumn("_pid", F.spark_partition_id())
    sizes = {
        r["_pid"]: r["cnt"]
        for r in part.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    n = sum(sizes.values())
    offsets, acc = {}, 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    off = F.element_at(
        F.create_map(
            *[F.lit(x) for pid in sorted(sizes) for x in (pid, offsets[pid])]
        ),
        F.col("_pid"),
    )
    local = F.row_number().over(
        Window.partitionBy("_pid").orderBy(F.col("ppl"), F.col(id_col))
    )
    rank = (off + local).cast("long")
    bucket = (F.lit(1) + (rank - 1) * buckets / F.lit(n)).cast("long")
    labels = (
        ["head", "middle", "tail"]
        if buckets == 3
        else [f"b{i + 1}" for i in range(buckets)]
    )
    lab = F.element_at(
        F.array([F.lit(x) for x in labels]), bucket.cast("int")
    )
    return part.select(
        F.col(id_col),
        "ppl",
        rank.alias("rank"),
        bucket.alias("bucket"),
        lab.alias("tranche"),
    )
