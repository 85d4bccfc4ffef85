"""Ingestion: transcripts → index journal (doc → term postings) + doc stats.

Rebuilds the reference's document-ingestion entry point
(``DocumentKeywordExtractor.java:36-90`` → ``LoaderIndexJournalWriter.putWords``
→ ``IndexJournalSlopWriter.java:57-83``) as one Spark job:

1. JVM-side group: turns of a conversation are collected and concatenated in
   ``turn_idx`` order (the per-row invariant: per-turn text equality under
   stable turn ordering), with a break marker between turns that the
   tokenizer charges 2 position slots (the reference's +2 inter-region
   padding, ``DocumentPositionMapper.java:33-39``).
2. Arrow-batched ``mapInArrow``: tokenize, assign 1-based positions, fold to
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

import itertools
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.codecs import segmented_delta, varbyte_encode_with_offsets
from ..functions.ids import doc_id_for_conv, term_id_expr
from ..functions.tokenizer import (
    MAX_WORD_LENGTH,
    STOPWORDS,
    TURN_BREAK,
    TURN_BREAK_COST,
    tokenize_texts,
)

# positions travel pre-encoded (per-(doc, term) varbyte of 1-based deltas) so
# the postings shuffle moves compact bytes and the block encoder is a plain
# byte concatenation (see functions/blocks.py)
JOURNAL_SCHEMA = (
    "conv_id string, doc_id long, term string, tf int, wtf_q4 int, "
    "positions binary, flags int, doc_len int, n_turns int, lang string, "
    "year int"
)

# Role-span weights for the BM25 count (quarter-scaled so the journal and
# postings carry an integer): the reference weights each occurrence by its
# enclosing tag span — TITLE 2.5, HEADING 1.25, BODY 1.0
# (IndexResultRankingService.java UnorderedMatches weights, :566-579).
# Transcript analogue: system turns play TITLE, tool turns HEADING, user/
# assistant turns are BODY. A system+tool turn takes the system weight
# (transcript roles don't nest, unlike HTML spans).
WEIGHT_Q4_SYSTEM = 10  # 2.5
WEIGHT_Q4_TOOL = 5  # 1.25
WEIGHT_Q4_BODY = 4  # 1.0

_BREAK_SEP = f" {TURN_BREAK} "

# Term flags — the transcript analogue of the reference's WordFlags byte
# (WordFlags.java:6-39 Title/Subjects/Site/...; term metadata low byte,
# IndexQueryExecution.java:351-353). A term's flag bit is set when it occurs
# in a turn with that role; TOOL additionally when the turn carries a tool
# annotation. Flags drive the query-strategy gate (reference F8,
# IndexResultRankingService.java:226-260) and the priority-tier membership
# (prio index holds flagged occurrences, code/index/readme.md).
FLAG_SYSTEM = 1  # role='system' — the TITLE-analogue span
FLAG_ASSISTANT = 2
FLAG_USER = 4
FLAG_TOOL = 8  # role='tool' OR tool annotation present
ROLE_FLAG = {"system": FLAG_SYSTEM, "assistant": FLAG_ASSISTANT, "user": FLAG_USER, "tool": FLAG_TOOL}
# flags that admit a term occurrence into the priority tier (the reference's
# prio index takes Title/Subjects/... flagged words)
PRIORITY_FLAGS = FLAG_SYSTEM | FLAG_TOOL


def _lang_batch(full_text: "object") -> "object":
    """Per-document language stamp (marker-hit argmax, ties alphabetical,
    no hits → 'und') over an Arrow string array — one pyarrow
    ``split_pattern_regex`` pass + per-unique-token marker lookup.

    Semantics mirror textstats.lang_pred_col / the DuckDB oracle's
    ``regexp_split_to_array(lower(text), '[^a-z]+')`` exactly. Computed
    HERE (inside the tokenize kernel) rather than as a JVM column because
    Catalyst's project-collapsing re-evaluates the split once per
    reference (~20x per document through the greatest/CASE tree), which
    measured ~40% of the whole journal build.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from .textstats import LANG_MARKERS

    langs = sorted(LANG_MARKERS)
    toks = pc.split_pattern_regex(pc.utf8_lower(full_text), "[^a-z]+")
    offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = toks.flatten()
    de = flat.dictionary_encode()
    codes = de.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    uniq = de.dictionary.to_pylist()
    n_docs = len(toks)
    hits = np.zeros((n_docs, len(langs)), dtype=np.int64)
    for li, lang in enumerate(langs):
        markers = set(LANG_MARKERS[lang])
        u_hit = np.fromiter(
            (u in markers for u in uniq), dtype=bool, count=len(uniq)
        )
        tok_hit = u_hit[codes] if codes.size else np.empty(0, dtype=bool)
        cs = np.zeros(len(flat) + 1, dtype=np.int64)
        np.cumsum(tok_hit, out=cs[1:])
        hits[:, li] = cs[offsets[1:]] - cs[offsets[:-1]]
    best = hits.max(axis=1)
    # first (alphabetical) language achieving the max, 'und' when max == 0
    arg = np.argmax(hits, axis=1)
    out = np.where(best > 0, np.asarray(langs, dtype=object)[arg], "und")
    return pa.array(out.tolist(), type=pa.string())


def _tokenize_convs(batches: "Iterator") -> "Iterator":
    """Arrow-batched (``mapInArrow``): (conv_id, full_text, n_turns,
    turn_flags) RecordBatches → per-(conv, term) journal RecordBatches.

    Fully batch-vectorized position assignment + (doc, term) fold: tokens of
    the whole Arrow batch are flattened once, ``pd.factorize`` maps them to
    vocabulary codes so all per-token attributes (stopword, break, length)
    are computed per *unique* term, positions come from one segmented cumsum,
    and the fold to per-(doc, term) rows is a single stable lexsort. The only
    per-document Python work is the regex findall.

    Output is built as Arrow arrays directly — the per-row varbyte position
    runs become ONE binary column from (offsets, buffer) with zero copies
    and zero per-row bytes objects, and string columns come from dictionary
    ``take`` on the batch vocabulary (pandas block consolidation was ~half
    the kernel's wall time before this).

    Emits one sentinel row (term=NULL, tf=0) per conversation so documents
    with no indexable terms still appear in doc_stats.
    """
    import pyarrow as pa

    for rb in batches:
        conv_pa = rb.column(rb.schema.get_field_index("conv_id"))
        ft_pa = rb.column(rb.schema.get_field_index("full_text"))
        if isinstance(ft_pa, pa.ChunkedArray):
            ft_pa = ft_pa.combine_chunks()
        lang_pa = _lang_batch(ft_pa)
        docid_arr = np.asarray(
            rb.column(rb.schema.get_field_index("doc_id")), dtype=np.int64
        )
        texts = pd.Series(
            rb.column(rb.schema.get_field_index("full_text")).to_pylist()
        )
        token_lists = tokenize_texts(texts).tolist()
        n_turns_arr = np.asarray(
            rb.column(rb.schema.get_field_index("n_turns")), dtype=np.int64
        )
        tf_col = rb.column(rb.schema.get_field_index("turn_flags"))
        if isinstance(tf_col, pa.ChunkedArray):
            tf_col = tf_col.combine_chunks()
        flat_turn_flags = np.asarray(tf_col.values, dtype=np.int64)
        turn_offsets = np.asarray(tf_col.offsets, dtype=np.int64)
        n_docs = len(token_lists)
        lens = np.fromiter(
            (len(t) for t in token_lists), dtype=np.int64, count=n_docs
        )
        doc_bounds = np.zeros(n_docs + 1, dtype=np.int64)
        np.cumsum(lens, out=doc_bounds[1:])
        flat_tokens = np.array(
            list(itertools.chain.from_iterable(token_lists)), dtype=object
        )
        if flat_tokens.size:
            codes, uniques = pd.factorize(flat_tokens)
            uniq = np.asarray(uniques, dtype=object)
            u_break = np.fromiter(
                (u == TURN_BREAK for u in uniq), dtype=bool, count=uniq.size
            )
            u_stop = np.fromiter(
                (u in STOPWORDS for u in uniq), dtype=bool, count=uniq.size
            )
            u_len = np.fromiter(
                (len(u) for u in uniq), dtype=np.int64, count=uniq.size
            )
            is_break = u_break[codes]
            # 1-based positions: words burn 1 slot, breaks burn 2
            costs = np.where(is_break, TURN_BREAK_COST, 1)
            gcum = np.cumsum(costs)
            ext = np.concatenate([[0], gcum])  # ext[i] = slots before token i
            doc_idx = np.repeat(np.arange(n_docs), lens)
            positions = gcum - ext[doc_bounds[:-1]][doc_idx]
            word_mask = ~is_break
            wcum = np.concatenate([[0], np.cumsum(word_mask)])
            doc_len_arr = wcum[doc_bounds[1:]] - wcum[doc_bounds[:-1]]
            # token's turn = number of break tokens before it within its doc
            bext = np.concatenate([[0], np.cumsum(is_break)[:-1]])
            turn_of_token = bext - bext[doc_bounds[:-1]][doc_idx]
            # defensive clip: assembly strips break-sentinel bytes from turn
            # text, so counts line up — but a miscount must never read a
            # neighboring conversation's flags
            turn_of_token = np.minimum(
                turn_of_token, n_turns_arr[doc_idx] - 1
            )
            tok_flags = flat_turn_flags[
                turn_offsets[:-1][doc_idx] + turn_of_token
            ]
            keep = word_mask & ~u_stop[codes] & (u_len[codes] <= MAX_WORD_LENGTH)
            kd, kc, kp, kf = (
                doc_idx[keep],
                codes[keep],
                positions[keep],
                tok_flags[keep],
            )
            # stable sort by (doc, term code): positions stay ascending
            order = np.lexsort((kc, kd))
            kd, kc, kp, kf = kd[order], kc[order], kp[order], kf[order]
            if kd.size:
                change = np.flatnonzero(
                    (kd[1:] != kd[:-1]) | (kc[1:] != kc[:-1])
                ) + 1
                bounds = np.concatenate([[0], change, [kd.size]])
            else:
                bounds = np.zeros(1, dtype=np.int64)
            grp_starts = bounds[:-1].astype(np.int64)
            tf = np.diff(bounds).astype(np.int64)
            # role-weighted count (quarter-scaled): per-token weight from
            # its turn's role flags, summed per (doc, term) group
            wq4 = np.where(
                kf & FLAG_SYSTEM,
                WEIGHT_Q4_SYSTEM,
                np.where(kf & FLAG_TOOL, WEIGHT_Q4_TOOL, WEIGHT_Q4_BODY),
            ).astype(np.int64)
            wtf = (
                np.add.reduceat(wq4, grp_starts)
                if wq4.size
                else np.empty(0, dtype=np.int64)
            )
            deltas = segmented_delta(kp.astype(np.uint64), grp_starts)
            enc, offs = varbyte_encode_with_offsets(deltas)
            byte_bounds = offs[bounds]
            g_doc = kd[grp_starts]
            g_codes = kc[grp_starts]
            g_flags = (
                np.bitwise_or.reduceat(kf, grp_starts)
                if kf.size
                else np.empty(0, dtype=np.int64)
            )
            term_dict = pa.array(uniq.tolist(), type=pa.string())
        else:
            doc_len_arr = np.zeros(n_docs, dtype=np.int64)
            tf = np.empty(0, dtype=np.int64)
            wtf = np.empty(0, dtype=np.int64)
            enc = b""
            byte_bounds = np.zeros(1, dtype=np.int64)
            g_doc = np.empty(0, dtype=np.int64)
            g_codes = np.empty(0, dtype=np.int64)
            g_flags = np.empty(0, dtype=np.int64)
            term_dict = pa.array([], type=pa.string())

        n_rows = n_docs + g_doc.size
        # positions: ONE binary array over the batch encode buffer — the
        # first n_docs rows (sentinels) are empty, then each group's byte
        # run, cut by offsets (varbyte is byte-aligned per value)
        offsets32 = np.concatenate(
            [np.zeros(n_docs, dtype=np.int32), byte_bounds.astype(np.int32)]
        )
        positions_col = pa.Array.from_buffers(
            pa.binary(),
            n_rows,
            [None, pa.py_buffer(offsets32.tobytes()), pa.py_buffer(enc)],
        )
        all_docs = pa.array(
            np.concatenate([np.arange(n_docs, dtype=np.int64), g_doc])
        )
        conv_col = conv_pa.take(all_docs)
        lang_col = lang_pa.take(all_docs)
        year_col = rb.column(rb.schema.get_field_index("year")).take(all_docs)
        term_col = pa.concat_arrays(
            [pa.nulls(n_docs, pa.string()), term_dict.take(pa.array(g_codes))]
        )
        i32 = lambda a: pa.array(a.astype(np.int32))  # noqa: E731
        yield pa.RecordBatch.from_arrays(
            [
                conv_col.combine_chunks()
                if isinstance(conv_col, pa.ChunkedArray)
                else conv_col,
                pa.array(
                    np.concatenate([docid_arr, docid_arr[g_doc]])
                ),
                term_col,
                i32(np.concatenate([np.zeros(n_docs, dtype=np.int64), tf])),
                i32(np.concatenate([np.zeros(n_docs, dtype=np.int64), wtf])),
                positions_col,
                i32(
                    np.concatenate([np.zeros(n_docs, dtype=np.int64), g_flags])
                ),
                i32(np.concatenate([doc_len_arr, doc_len_arr[g_doc]])),
                i32(np.concatenate([n_turns_arr, n_turns_arr[g_doc]])),
                lang_col.combine_chunks()
                if isinstance(lang_col, pa.ChunkedArray)
                else lang_col,
                year_col.combine_chunks()
                if isinstance(year_col, pa.ChunkedArray)
                else year_col,
            ],
            names=[
                "conv_id",
                "doc_id",
                "term",
                "tf",
                "wtf_q4",
                "positions",
                "flags",
                "doc_len",
                "n_turns",
                "lang",
                "year",
            ],
        )


def build_journal(
    transcripts: DataFrame,
    rank: int = 0,
    ranks: DataFrame | None = None,
) -> DataFrame:
    """transcripts → journal(doc_id, conv_id, term, term_id, tf, positions,
    flags, doc_len, n_turns). Sentinel rows have term NULL.

    ``ranks``: optional (conv_id, rank 0..63) table — rank is stamped into
    the doc id's high bits so docID-sorted posting lists are best-document-
    first (the reference's sort=rank trick, UrlIdCodec.java:3-7; stamped by
    DocIdRewriter during construction). The join shares the groupBy's
    conv_id key, so it adds no extra shuffle of the big side.
    """
    # turn text is sanitized INSIDE the collected struct: NULL text would be
    # silently dropped by array_join (fewer break markers than turn_flags
    # entries, so later tokens would read the wrong turn's flags), and a
    # literal NUL could smuggle the \x00turn\x00 break sentinel into the
    # text (extra break tokens → flag misalignment / IndexError). The
    # journal's per-turn text-equality invariant is unaffected for any text
    # free of NUL control bytes.
    clean_text = F.regexp_replace(
        F.coalesce(F.col("text"), F.lit("")), "\x00", ""
    )
    sorted_turns = F.array_sort(
        F.collect_list(
            F.struct(
                F.col("turn_idx"), clean_text.alias("text"), F.col("role"), F.col("tool")
            )
        )
    )
    # document year = year of the conversation's first turn (the reference
    # stamps a year into DocumentMetadata for the year[=><] specification
    # limit, QueryParser.java:229-231 / DocumentMetadata year bits); a
    # ts-less source (unit-test fixtures) stamps 0 = "unknown"
    year_aggs = (
        [F.year(F.min("ts")).cast("int").alias("year")]
        if "ts" in transcripts.columns
        else [F.min(F.lit(0)).cast("int").alias("year")]
    )
    conv_docs = transcripts.groupBy("conv_id").agg(
        F.array_join(
            F.transform(sorted_turns, lambda s: s["text"]), _BREAK_SEP
        ).alias("full_text"),
        *year_aggs,
        # per-turn flag byte, aligned with the turn segments of full_text
        F.transform(
            sorted_turns,
            lambda s: F.coalesce(
                F.when(s["role"] == "system", F.lit(FLAG_SYSTEM))
                .when(s["role"] == "assistant", F.lit(FLAG_ASSISTANT))
                .when(s["role"] == "user", F.lit(FLAG_USER))
                .when(s["role"] == "tool", F.lit(FLAG_TOOL)),
                F.lit(0),
            ).bitwiseOR(
                F.when(
                    F.coalesce(s["tool"], F.lit("")) != "", F.lit(FLAG_TOOL)
                ).otherwise(F.lit(0))
            ),
        ).alias("turn_flags"),
        F.count("*").cast("int").alias("n_turns"),
    )
    if ranks is not None:
        # conv-level join — co-keyed with the groupBy output (conv_id), so
        # only the (small) rank side shuffles; done BEFORE tokenization so
        # the per-(doc, term) explosion never carries a join
        conv_docs = conv_docs.join(ranks, "conv_id", "left")
        rank_col: F.Column | int = F.coalesce(F.col("rank"), F.lit(rank))
    else:
        rank_col = rank
    # the per-document language stamp (reference: languageIsoCode in the
    # journal, IndexJournalPage.java:22; per-language lexicons,
    # WordLexicon.java:34-41) is computed INSIDE the tokenize kernel
    # (_lang_batch) — one pyarrow pass per batch
    conv_docs = conv_docs.withColumn(
        "doc_id", doc_id_for_conv("conv_id", rank_col)
    ).select("conv_id", "doc_id", "full_text", "turn_flags", "n_turns", "year")
    journal = conv_docs.mapInArrow(_tokenize_convs, schema=JOURNAL_SCHEMA)
    return journal.select(
        "doc_id",
        "conv_id",
        "term",
        term_id_expr("term").alias("term_id"),
        "tf",
        "wtf_q4",
        "positions",
        "flags",
        "doc_len",
        "n_turns",
        "lang",
        "year",
    )


def conv_ranks_by_quality(transcripts: DataFrame, buckets: int = 64) -> DataFrame:
    """(conv_id, rank 0..buckets-1), rank 0 = best — quality-derived rank
    buckets for the doc-id high bits (the transcript analogue of the
    reference's domain-quality rank, stamped so docID order = quality order,
    UrlIdCodec.java:3-7). Quality = the C4/Gopher-style gates over the
    assembled conversation text (operators/textstats.quality_scores)."""
    from .textstats import quality_scores

    conv_text = transcripts.groupBy("conv_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("turn_idx", "text"))),
                lambda s: s["text"],
            ),
            " ",
        ).alias("text")
    )
    q = quality_scores(conv_text.select(F.col("conv_id").alias("doc_id"), "text"))
    return q.select(
        F.col("doc_id").alias("conv_id"),
        ((1.0 - F.col("quality")) * (buckets - 1)).cast("int").alias("rank"),
    )


def doc_stats(journal: DataFrame) -> DataFrame:
    """doc_id → (conv_id, doc_len, n_turns, lang); reads only sentinel rows,
    so no shuffle (the reference's forward index,
    ForwardIndexConverter.java:65-160)."""
    return journal.filter(F.col("term").isNull()).select(
        "doc_id", "conv_id", "doc_len", "n_turns", "lang", "year"
    )


def corpus_stats(doc_stats_df: DataFrame) -> DataFrame:
    """Global N and average length (ForwardIndexReader.totalDocCount analogue;
    scoring itself uses the reference's hardcoded AVG_LENGTH=5000)."""
    return doc_stats_df.agg(
        F.count("*").alias("doc_count"),
        F.avg("doc_len").alias("avg_len"),
    )
