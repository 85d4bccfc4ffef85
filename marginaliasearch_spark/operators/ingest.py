"""Ingestion: transcripts → index journal (doc → term postings) + doc stats.

Rebuilds the reference's document-ingestion entry point
(``DocumentKeywordExtractor.java:36-90`` → ``LoaderIndexJournalWriter.putWords``
→ ``IndexJournalSlopWriter.java:57-83``) as one Spark job:

1. JVM-side group: turns of a conversation are collected and concatenated in
   ``turn_idx`` order (the per-row invariant: per-turn text equality under
   stable turn ordering), with a break marker between turns that the
   tokenizer charges 2 position slots (the reference's +2 inter-region
   padding, ``DocumentPositionMapper.java:33-39``).
2. Arrow-batched ``mapInPandas``: tokenize, assign 1-based positions, fold to
   per-(doc, term) rows (term, tf, positions).
3. JVM-side: ``term_id = xxhash64(term)``, ``doc_id`` from the rank-monotone
   layout (functions/ids.py).

The journal is the *exploded* doc→term table — one row per (doc, term) —
which is the shape every downstream Spark op (groupBy df, repartitionByRange,
block encode) wants. Journal "pages" (200k docs/page in the reference,
``LoaderIndexJournalWriter.java:80``) map to Spark partitions.

Scale notes: the groupBy(conv_id) is the single unavoidable shuffle (turns of
a document must colocate); everything after is map-side until the postings
shuffle. Tokenization runs on Arrow batches of whole conversations, so
per-group overhead is amortized (no per-conversation applyInPandas groups).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.ids import doc_id_for_conv, term_id_expr
from ..functions.tokenizer import TURN_BREAK, assign_positions, tokenize_texts

JOURNAL_SCHEMA = (
    "conv_id string, term string, tf int, positions array<int>, "
    "doc_len int, n_turns int"
)

_BREAK_SEP = f" {TURN_BREAK} "


def _tokenize_convs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched: (conv_id, full_text, n_turns) → per-(conv, term) rows.

    Emits one sentinel row (term=NULL, tf=0) per conversation so documents
    with no indexable terms still appear in doc_stats.
    """
    for pdf in batches:
        token_lists = tokenize_texts(pdf["full_text"])
        conv_ids: list[str] = []
        terms: list[str | None] = []
        poss: list[list[int]] = []
        doc_lens: list[int] = []
        n_turns_out: list[int] = []
        for conv_id, n_turns, tokens in zip(
            pdf["conv_id"], pdf["n_turns"], token_lists
        ):
            kept, positions, doc_len = assign_positions(tokens)
            # sentinel row → doc_stats
            conv_ids.append(conv_id)
            terms.append(None)
            poss.append([])
            doc_lens.append(doc_len)
            n_turns_out.append(int(n_turns))
            if kept:
                # fold to per-term position lists (order within group is
                # ascending because positions are emitted in doc order)
                s = pd.Series(positions, index=pd.Index(kept, name="term"))
                grouped = s.groupby(level=0, sort=False).agg(list)
                conv_ids.extend([conv_id] * len(grouped))
                terms.extend(grouped.index.tolist())
                poss.extend(grouped.tolist())
                doc_lens.extend([doc_len] * len(grouped))
                n_turns_out.extend([int(n_turns)] * len(grouped))
        yield pd.DataFrame(
            {
                "conv_id": conv_ids,
                "term": terms,
                "tf": [len(p) for p in poss],
                "positions": poss,
                "doc_len": doc_lens,
                "n_turns": n_turns_out,
            }
        )


def build_journal(transcripts: DataFrame, rank: int = 0) -> DataFrame:
    """transcripts → journal(doc_id, conv_id, term, term_id, tf, positions,
    doc_len, n_turns). Sentinel rows have term NULL."""
    conv_docs = transcripts.groupBy("conv_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("turn_idx", "text"))),
                lambda s: s["text"],
            ),
            _BREAK_SEP,
        ).alias("full_text"),
        F.count("*").cast("int").alias("n_turns"),
    )
    journal = conv_docs.mapInPandas(_tokenize_convs, schema=JOURNAL_SCHEMA)
    return journal.select(
        doc_id_for_conv("conv_id", rank),
        "conv_id",
        "term",
        term_id_expr("term").alias("term_id"),
        "tf",
        "positions",
        "doc_len",
        "n_turns",
    )


def doc_stats(journal: DataFrame) -> DataFrame:
    """doc_id → (conv_id, doc_len, n_turns); reads only sentinel rows, so no
    shuffle (the reference's forward index, ForwardIndexConverter.java:65-160)."""
    return journal.filter(F.col("term").isNull()).select(
        "doc_id", "conv_id", "doc_len", "n_turns"
    )


def corpus_stats(doc_stats_df: DataFrame) -> DataFrame:
    """Global N and average length (ForwardIndexReader.totalDocCount analogue;
    scoring itself uses the reference's hardcoded AVG_LENGTH=5000)."""
    return doc_stats_df.agg(
        F.count("*").alias("doc_count"),
        F.avg("doc_len").alias("avg_len"),
    )
