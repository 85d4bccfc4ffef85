"""Distributed BPE vocabulary induction + encoding (Sennrich et al. 2016).

Training a subword tokenizer is a standard step of a large-scale training
-data pipeline. The classic algorithm is inherently iterative (greedy:
count adjacent symbol pairs, merge the most frequent, repeat), which maps
onto Spark the same way connected components does — a driver-coordinated
loop of small deterministic jobs:

- the corpus is touched ONCE: a whitespace word-frequency aggregation
  (map-side combinable groupBy). Everything after runs on the *vocab*
  relation (words × counts) — at 100 TB the corpus is petabytes but the
  vocab is millions of rows, so the per-merge-round cost is vocab-sized,
  never corpus-sized;
- each round: explode adjacent symbol pairs weighted by word count →
  one groupBy(pair) → take the argmax on the driver (freq DESC, pair ASC
  — a total order, so the learned merge table is deterministic) →
  rewrite the symbol arrays in a vectorized-ish mapInPandas pass;
- ``localCheckpoint`` every few rounds truncates the growing lineage
  (same pattern as ``dedup.connected_components``).

No SQL oracle: greedy iterative BPE is not expressible in one DuckDB
query, so the driver entry takes the rows-only check and exactness is
pinned by a pure-Python reference implementation in
tests/test_bpe.py (brute-force equality on merges AND encodings).

Reference analogue: Marginalia has no subword tokenizer (it stems), but
the brief's training-pipeline scope ("token counting — BPE-ish") makes
vocabulary induction the natural completion; textstats.token_counts'
``bpe_tokens`` column counts with a fixed regex, this learns the merges.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END = "</w>"  # end-of-word marker, as in the original BPE formulation


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) over lowercased whitespace words — the ONLY
    corpus-sized job of BPE training."""
    words = F.explode(
        F.filter(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+"), lambda t: t != ""
        )
    )
    return docs.select(words.alias("word")).groupBy("word").agg(
        F.count("*").alias("cnt")
    )


def _apply_merge(left: str, right: str):
    fused = left + right

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for syms in pdf["syms"]:
                syms = list(syms)
                j, res = 0, []
                while j < len(syms):
                    if (
                        j + 1 < len(syms)
                        and syms[j] == left
                        and syms[j + 1] == right
                    ):
                        res.append(fused)
                        j += 2
                    else:
                        res.append(syms[j])
                        j += 1
                out.append(res)
            yield pd.DataFrame(
                {"word": pdf["word"], "cnt": pdf["cnt"], "syms": out}
            )

    return fn


def learn_bpe(
    docs: DataFrame, n_merges: int = 20, text_col: str = "text"
) -> DataFrame:
    """Learn ``n_merges`` BPE merges → (rank, left, right, freq).

    Greedy argmax per round with the deterministic tie-break
    (freq DESC, left ASC, right ASC); stops early when no pair repeats.
    """
    spark = docs.sparkSession
    vocab = word_counts(docs, text_col).withColumn(
        "syms",
        F.concat(
            F.split(F.col("word"), ""),  # characters
            F.array(F.lit(END)),
        ),
    ).localCheckpoint()
    merges = []
    for rank in range(n_merges):
        pairs = vocab.select(
            "cnt",
            F.explode(
                F.zip_with(
                    F.slice(
                        F.col("syms"),
                        1,
                        F.greatest(F.size("syms") - 1, F.lit(0)),
                    ),
                    F.slice(
                        F.col("syms"),
                        2,
                        F.greatest(F.size("syms") - 1, F.lit(0)),
                    ),
                    lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                )
            ).alias("p"),
        )
        top = (
            pairs.groupBy("p")
            .agg(F.sum("cnt").alias("freq"))
            .orderBy(F.desc("freq"), F.col("p.l"), F.col("p.r"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["freq"] < 2:
            break
        left, right, freq = top[0]["p"]["l"], top[0]["p"]["r"], top[0]["freq"]
        merges.append((rank, left, right, int(freq)))
        vocab = vocab.mapInPandas(
            _apply_merge(left, right),
            schema="word string, cnt long, syms array<string>",
        )
        if (rank + 1) % 4 == 0:
            vocab = vocab.localCheckpoint()
    return spark.createDataFrame(
        merges, "rank long, left string, right string, freq long"
    )


def bpe_encode(
    docs: DataFrame, merges: list[tuple[str, str]], text_col: str = "text"
) -> DataFrame:
    """doc_id → BPE token count + md5 of the token stream, applying the
    learned merges in rank order (the trained tokenizer's application
    pass — one narrow mapInPandas over the corpus, merges broadcast in
    the closure)."""
    import hashlib
    import re as _re

    ms = list(merges)
    # ASCII \s, NOT str.split(): the learner (line 49, JVM Java-regex
    # \s+) and the DuckDB twin (RE2 \s+) both split on ASCII whitespace
    # only, while Python str.split() also splits on NBSP/U+2028/\x1c-\x1f
    # — a Unicode-whitespace doc would tokenize differently in the three
    # engines (same portability rule as plans/commands.py's re.ASCII)
    _ws = _re.compile(r"\s+", _re.ASCII)

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n_toks, digests = [], []
            for text in pdf["text"].fillna(""):
                toks: list[str] = []
                for w in _ws.split(str(text).lower().strip(" \t\n\x0b\f\r")):
                    if not w:
                        continue
                    syms = list(w) + [END]
                    for left, right in ms:
                        j, res = 0, []
                        while j < len(syms):
                            if (
                                j + 1 < len(syms)
                                and syms[j] == left
                                and syms[j + 1] == right
                            ):
                                res.append(left + right)
                                j += 2
                            else:
                                res.append(syms[j])
                                j += 1
                        syms = res
                    toks.extend(syms)
                n_toks.append(len(toks))
                digests.append(hashlib.md5(" ".join(toks).encode()).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "bpe_tokens": n_toks,
                    "stream_md5": digests,
                }
            )

    return docs.select("doc_id", text_col).mapInPandas(
        fn, schema="doc_id long, bpe_tokens long, stream_md5 string"
    )


# Seed word-frequency table for the PRETRAINED tokenizer constant below:
# drawn from the synthetic corpus domain so the learned merges actually
# fire on the driver tables, sized so ~20 merges clear the freq>=2 stop.
_SEED_WORD_COUNTS: dict[str, int] = {
    "spark": 8, "join": 8, "table": 6, "scan": 6, "batch": 6,
    "window": 5, "query": 7, "value": 6, "data": 7, "part": 5,
    "hash": 5, "agg": 4, "row": 4, "column": 4, "customer": 4,
    "slow": 4, "fast": 4, "small": 4, "line": 3, "order": 3,
    "filter": 3, "stream": 3, "vector": 3, "key": 3, "the": 9,
    "low": 5, "lower": 4, "lowest": 2,
}


def _learn_local(word_counts: dict[str, int], n_merges: int) -> list[tuple[str, str]]:
    """Pure-Python BPE learner over a word-frequency dict — the same
    greedy rule as ``learn_bpe`` (freq DESC, (l, r) ASC, stop at freq<2),
    used to derive the deterministic pretrained merge table that both the
    engine entry and its DuckDB oracle share as a constant."""
    vocab: dict[tuple[str, ...], int] = {}
    for w, c in word_counts.items():
        key = tuple(list(w) + [END])
        vocab[key] = vocab.get(key, 0) + c
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pc: dict[tuple[str, str], int] = {}
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] = pc.get((a, b), 0) + c
        if not pc:
            break
        (left, right), freq = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if freq < 2:
            break
        merges.append((left, right))
        nv: dict[tuple[str, ...], int] = {}
        for syms, c in vocab.items():
            j, res = 0, []
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == left and syms[j + 1] == right:
                    res.append(left + right)
                    j += 2
                else:
                    res.append(syms[j])
                    j += 1
            key = tuple(res)
            nv[key] = nv.get(key, 0) + c
        vocab = nv
    return merges


def pretrained_merges(n_merges: int = 24) -> list[tuple[str, str]]:
    """The fixed pretrained merge table (apply-a-trained-tokenizer
    scenario): deterministic, derived from the literal seed counts above,
    shared verbatim by ``bpe_encode`` entries and the DuckDB oracle."""
    return _learn_local(_SEED_WORD_COUNTS, n_merges)
