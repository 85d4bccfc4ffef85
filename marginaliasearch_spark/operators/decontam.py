"""Train/eval decontamination: n-gram overlap against a held-out set.

Before training, every serious pipeline checks the training split for
documents that leak evaluation content (GPT-3 appendix C, PaLM, Llama all
report n-gram-overlap decontamination). The primitive is: hash every
``width``-token window of every document, build the distinct window-hash
set of the eval corpus, and flag training documents sharing any window
with it.

Spark shape at 100 TB:

- shingle hashing is the same ``mapInPandas`` kernel the dedup module uses
  (`dedup.shingle_hash_sets` — pyarrow tokenize off the GIL, md5 per
  *unique* token, vectorized window mix), so one pass, no extra code path;
- split assignment is a pure hash projection (`sampling.hash_split`) — it
  composes onto the shingle relation with ZERO additional shuffle because
  the split is a function of ``doc_id`` alone;
- the eval shingle set is 1-2 % of the corpus (or a benchmark suite of a
  few MB): the overlap join keys on the 64-bit shingle hash, so AQE
  broadcasts the eval side when it fits and falls back to a
  hash-partitioned semi-join when it does not — never all-pairs;
- the per-document hit count is a map-side-combinable groupBy.

Reference analogue: Marginalia has no train/eval split, but the shingle
construction mirrors its keyword n-gram hashing
(code/functions/language-processing/java/nu/marginalia/keyword/model/
DocumentKeywordsBuilder.java); the decontamination semantics follow the
published GPT-3/Gopher methodology.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import dedup, sampling


def contamination(
    docs: DataFrame,
    shingle_width: int = 3,
    weights: dict[str, int] | None = None,
    eval_splits: tuple[str, ...] = ("val", "test"),
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "split-v1",
) -> DataFrame:
    """Per-training-document contamination counts against the eval splits.

    Returns ``(doc_id, n_shared)`` for every NON-eval document that shares
    at least one distinct ``shingle_width``-token window hash with any
    document of the ``eval_splits`` (assignment via the same deterministic
    ``sampling.hash_split`` the split job uses — so this audits exactly
    the split that ships). ``n_shared`` counts distinct contaminated
    window hashes, the quantity decontamination thresholds are usually
    expressed in.
    """
    # split BEFORE shingling: the assignment is a pure function of doc_id,
    # so each document is tokenized+hashed exactly once (filtering the
    # shingle relation instead would shingle the whole corpus twice — once
    # per branch — since Spark cannot share a MapInPandas across branches)
    split = sampling.hash_split(docs, weights, id_col=id_col, salt=salt)
    is_eval = F.col("split").isin(list(eval_splits))
    eval_sh = (
        dedup.shingle_hash_sets(split.filter(is_eval), shingle_width, text_col)
        .select("sh")
        .distinct()
    )
    train_sh = dedup.shingle_hash_sets(
        split.filter(~is_eval), shingle_width, text_col
    )
    return (
        train_sh.join(eval_sh, "sh")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_shared"))
    )
