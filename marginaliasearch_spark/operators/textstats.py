"""Text-analysis operators for a training-data pipeline.

All pure JVM column expressions (whole-stage codegen, no Python): language
ID (stopword-hit heuristic), quality scoring (length/punct/stopword ratios),
token counting (whitespace + BPE-ish regex), and document fingerprinting.
Each has an exact ANSI-SQL equivalent, so every one is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# tiny deterministic stopword marker sets per language — a real pipeline
# would use fastText/CLD3; the heuristic (count marker hits, argmax) is the
# point here, and it is exactly reproducible in SQL
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "a", "in", "that"],
    "es": ["el", "la", "de", "que", "y", "los", "en", "un"],
    "fr": ["le", "la", "et", "les", "des", "est", "un", "une"],
    "de": ["der", "die", "und", "das", "ist", "ein", "nicht", "mit"],
}

_WORD_SPLIT = "\\s+"


def ws_token_count(col: F.Column) -> F.Column:
    """Whitespace token count — THE token floor, shared by
    ``token_counts``, the quality text stats, and
    ``datacard.data_card`` so the rule can never silently diverge
    between the indexed counts and the release report (empty splits
    filtered: leading/trailing/repeated whitespace never counts)."""
    return F.size(F.filter(F.split(col, _WORD_SPLIT), lambda t: t != ""))
# BPE-ish sub-word segmentation: letter runs, digit runs, single punctuation
BPE_ISH_RE = "[a-z]+|[0-9]+|[^a-z0-9\\s]"


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """doc_id → whitespace token count + BPE-ish sub-token count."""
    lower = F.lower(F.col(text_col))
    ws = ws_token_count(F.trim(lower))
    bpe = F.size(F.regexp_extract_all(lower, F.lit(BPE_ISH_RE), F.lit(0)))
    return docs.select(
        "doc_id",
        ws.cast("long").alias("ws_tokens"),
        bpe.cast("long").alias("bpe_tokens"),
    )


def lang_pred_col(text: F.Column) -> F.Column:
    """Predicted-language column expression (marker-word hit argmax,
    ties → alphabetical, no hits → 'und') — shared between the analysis
    operator and the journal's per-document language stamp (the reference
    journals ``languageIsoCode``, IndexJournalPage.java:22)."""
    toks = F.split(F.lower(text), "[^a-z]+")
    langs = sorted(LANG_MARKERS)
    hits = {
        lang: F.size(F.filter(toks, lambda t: t.isin(LANG_MARKERS[lang])))  # noqa: B023
        for lang in langs
    }
    best = F.greatest(*[hits[lang] for lang in langs])
    pred = F.lit("und")
    for lang in reversed(langs):
        pred = F.when((hits[lang] == best) & (best > 0), F.lit(lang)).otherwise(
            pred
        )
    return pred


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """doc_id → predicted language by marker-word hit counts (ties → 'und').

    One narrow projection; marker matching via array_contains over the
    token array stays in codegen.
    """
    toks = F.split(F.lower(F.col(text_col)), "[^a-z]+")
    hit_cols = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        hits = F.size(F.filter(toks, lambda t: t.isin(markers)))  # noqa: B023
        hit_cols.append(hits.alias(f"hits_{lang}"))
    scored = docs.select("doc_id", *hit_cols)
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"hits_{lang}") for lang in langs])
    # deterministic argmax: first language (alphabetical) achieving the max
    pred = F.lit("und")
    for lang in reversed(langs):
        pred = F.when(
            (F.col(f"hits_{lang}") == best) & (best > 0), F.lit(lang)
        ).otherwise(pred)
    return scored.select(
        "doc_id", pred.alias("lang_pred"), best.alias("marker_hits")
    )


def _quality_signal_cols(text_col: str = "text") -> dict[str, F.Column]:
    """The quality signals as named (already-rounded) column expressions,
    shared by ``quality_scores`` and ``filter_chain`` so both stay a single
    narrow projection (no self-join to recombine signals)."""
    text = F.col(text_col)
    lower = F.lower(text)
    n_chars = F.length(text)
    words = F.filter(F.split(F.trim(lower), "\\s+"), lambda t: t != "")
    n_words = F.size(words)
    en_stops = LANG_MARKERS["en"]
    stop_frac = F.when(
        n_words > 0,
        F.size(F.filter(words, lambda t: t.isin(en_stops))) / n_words.cast("double"),
    ).otherwise(F.lit(0.0))
    punct_frac = F.when(
        n_chars > 0,
        F.size(F.regexp_extract_all(lower, F.lit("[^a-z0-9\\s]"), F.lit(0)))
        / n_chars.cast("double"),
    ).otherwise(F.lit(0.0))
    mean_word_len = F.when(
        n_words > 0,
        F.aggregate(
            words, F.lit(0.0), lambda acc, w: acc + F.length(w).cast("double")
        )
        / n_words.cast("double"),
    ).otherwise(F.lit(0.0))
    # score: in-range indicators averaged (each gate contributes 1/4)
    gates = (
        F.when((n_words >= 10) & (n_words <= 100000), 1.0).otherwise(0.0)
        + F.when((mean_word_len >= 2.0) & (mean_word_len <= 12.0), 1.0).otherwise(0.0)
        + F.when(punct_frac <= 0.2, 1.0).otherwise(0.0)
        + F.when(stop_frac >= 0.01, 1.0).otherwise(0.0)
    ) / 4.0
    return {
        "n_words": n_words.cast("long"),
        "mean_word_len": F.round(mean_word_len, 6),
        "punct_frac": F.round(punct_frac, 6),
        "stop_frac": F.round(stop_frac, 6),
        "quality": F.round(gates, 6),
    }


def quality_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio quality features + a 0-1 score.

    The classic pre-training quality gates (C4/Gopher-style rules) as one
    projection: mean word length, punctuation density, stopword fraction.
    """
    c = _quality_signal_cols(text_col)
    return docs.select("doc_id", *(c[k].alias(k) for k in c))


def fingerprints(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """doc_id → content fingerprint of the normalized token stream.

    md5 over the canonical (lowercased, whitespace-normalized) token join —
    whitespace/case-insensitive exact-dup key, reproducible in any engine.
    """
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda t: t != ""
    )
    return docs.select(
        "doc_id", F.md5(F.array_join(toks, " ")).alias("fingerprint")
    )


def repetition_signals(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021, table A1): per-doc
    duplicate-line fraction, duplicate-line character fraction, bullet-line
    fraction, and top-bigram character fraction.

    Definitions (mirrored exactly by the DuckDB oracle):

    - lines = trimmed, non-empty '\\n'-split lines; a line is *duplicate* if
      it occurs >= 2 times in the doc; ``dup_line_frac`` counts ALL
      occurrences in duplicated groups over all lines, ``dup_char_frac``
      the same weighted by line length;
    - ``bullet_line_frac`` = lines starting with '-', '*' or '\u2022';
    - ``top_bigram_frac`` = (occurrences of the most frequent word bigram x
      its non-space char length) / total token chars, ties broken by the
      lexicographically smallest bigram; 0.0 when the doc has < 2 tokens.

    SHUFFLE-FREE: every signal is a per-row array expression — duplicate
    detection sorts the line array and compares neighbors (``array_sort`` +
    ``zip_with`` over shifted slices), the top bigram is a run-length fold
    (``F.aggregate``) over the sorted bigram array — so the whole operator
    is one narrow projection, embarrassingly parallel at 100 TB (no
    explode, no groupBy, no join). Sorted-order ties give the
    lexicographically smallest max-count bigram because only a STRICTLY
    longer run displaces the incumbent. Per-doc cost is O(n log n).
    Bigrams pair ``zip_with``-ed array slices, which evaluates the token
    array once per row (an ``element_at``-in-lambda formulation would
    re-tokenize per element — measured pathological). All ratios are
    exact-integer divisions, so both engines produce bit-identical doubles.
    """
    c = _repetition_signal_cols(text_col)
    return docs.select("doc_id", *(c[k].alias(k) for k in c))


def _repetition_signal_cols(text_col: str = "text") -> dict[str, F.Column]:
    """The Gopher repetition signals as named rounded column expressions,
    shared by ``repetition_signals`` and ``filter_chain``."""
    lines_arr = F.filter(
        F.transform(F.split(F.col(text_col), "\n"), lambda l: F.trim(l)),
        lambda l: l != "",
    )
    toks_arr = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda t: t != ""
    )

    def _neighbor_dup_mask(arr: F.Column) -> F.Column:
        """Boolean mask over a SORTED array: element equals its predecessor
        or successor (i.e. belongs to a run of length >= 2)."""
        n1 = F.greatest(F.size(arr) - 1, F.lit(0))  # slice len must be >= 0
        eq_shift = F.zip_with(
            F.slice(arr, 1, n1), F.slice(arr, 2, n1), lambda a, b: a == b
        )
        eq_prev = F.concat(F.array(F.lit(False)), eq_shift)
        eq_next = F.concat(eq_shift, F.array(F.lit(False)))
        return F.zip_with(eq_prev, eq_next, lambda a, b: a | b)

    ls = F.array_sort(lines_arr)
    dup_mask = _neighbor_dup_mask(ls)
    n_lines = F.size(lines_arr)
    line_chars = F.aggregate(
        lines_arr, F.lit(0).cast("long"), lambda acc, l: acc + F.length(l)
    )
    dup_lines = F.size(F.filter(dup_mask, lambda m: m))
    dup_chars = F.aggregate(
        F.zip_with(
            ls, dup_mask, lambda l, m: F.when(m, F.length(l)).otherwise(0)
        ),
        F.lit(0).cast("long"),
        lambda acc, c: acc + c,
    )
    bullet_lines = F.size(
        F.filter(
            lines_arr,
            lambda l: l.startswith("-") | l.startswith("*") | l.startswith("\u2022"),
        )
    )

    nt = F.size(toks_arr)
    tok_chars = F.aggregate(
        toks_arr, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    nt1 = F.greatest(nt - 1, F.lit(0))  # slice len must be >= 0
    bigrams = F.array_sort(
        F.zip_with(
            F.slice(toks_arr, 1, nt1),
            F.slice(toks_arr, 2, nt1),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    )
    # run-length fold over the sorted bigrams: (prev, cur_run, best_cnt,
    # best_bg); first max run encountered wins => lexicographic tie-break
    fold_init = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("long").alias("cur"),
        F.lit(0).cast("long").alias("best"),
        F.lit("").alias("bestbg"),
    )

    def _fold(acc: F.Column, x: F.Column) -> F.Column:
        cur2 = F.when(x == acc["prev"], acc["cur"] + 1).otherwise(
            F.lit(1).cast("long")
        )
        better = cur2 > acc["best"]
        return F.struct(
            x.alias("prev"),
            cur2.alias("cur"),
            F.when(better, cur2).otherwise(acc["best"]).alias("best"),
            F.when(better, x).otherwise(acc["bestbg"]).alias("bestbg"),
        )

    top = F.aggregate(bigrams, fold_init, _fold)
    top_frac = F.when(
        top["best"] > 0,
        (top["best"] * (F.length(top["bestbg"]) - 1)) / tok_chars,
    ).otherwise(F.lit(0.0))

    zero_guard = n_lines > 0
    return {
        "n_lines": n_lines.cast("long"),
        "dup_line_frac": F.round(
            F.when(zero_guard, dup_lines / n_lines).otherwise(0.0), 6
        ),
        "dup_char_frac": F.round(
            F.when(zero_guard, dup_chars / line_chars).otherwise(0.0), 6
        ),
        "bullet_line_frac": F.round(
            F.when(zero_guard, bullet_lines / n_lines).otherwise(0.0), 6
        ),
        "top_bigram_frac": F.round(top_frac, 6),
    }


# filter_chain gate bits (Gopher table A1 thresholds, over the rounded
# signals so the DuckDB twin compares bit-identical values)
FILTER_GATES: tuple[tuple[int, str, str], ...] = (
    (1, "n_words", "outside [50, 100000]"),
    (2, "mean_word_len", "outside [3, 10]"),
    (4, "punct_frac", "> 0.2"),
    (8, "stop_frac", "< 0.01"),
    (16, "dup_line_frac", "> 0.3"),
    (32, "dup_char_frac", "> 0.2"),
    (64, "top_bigram_frac", "> 0.18"),
)


def filter_chain(
    docs: DataFrame, text_col: str = "text", carry: tuple[str, ...] = ()
) -> DataFrame:
    """Composite keep/drop decision with a reason bitmask — the C4/Gopher
    pre-training filter chain as ONE narrow projection.

    Real pipelines don't apply quality gates one scan at a time: every
    signal is a per-row expression over the same text column, so the whole
    chain evaluates in a single pass with no shuffle and no join (the
    signal expressions are shared with ``quality_scores`` /
    ``repetition_signals`` via the ``_*_signal_cols`` builders). The
    ``reasons`` bitmask (bit values in :data:`FILTER_GATES`) records WHY a
    document was dropped — the audit trail a 100-TB filtering job must
    publish for its removal-rate dashboards; ``keep`` is ``reasons == 0``.

    Thresholds are Gopher's (Rae et al. 2021, table A1) where defined:
    word count in [50, 100000], mean word length in [3, 10], duplicate
    line fraction <= 0.30, duplicate line character fraction <= 0.20, top
    bigram character fraction <= 0.18 — plus the C4-style symbol-density
    (punct_frac <= 0.2) and stopword-presence (stop_frac >= 0.01) gates.
    All comparisons run on the 6-decimal-rounded signals so engine and
    oracle agree bit-exactly at the boundaries.
    """
    q = _quality_signal_cols(text_col)
    r = _repetition_signal_cols(text_col)
    reasons = (
        F.when(~q["n_words"].between(50, 100000), 1).otherwise(0)
        + F.when(~q["mean_word_len"].between(3.0, 10.0), 2).otherwise(0)
        + F.when(q["punct_frac"] > 0.2, 4).otherwise(0)
        + F.when(q["stop_frac"] < 0.01, 8).otherwise(0)
        + F.when(r["dup_line_frac"] > 0.3, 16).otherwise(0)
        + F.when(r["dup_char_frac"] > 0.2, 32).otherwise(0)
        + F.when(r["top_bigram_frac"] > 0.18, 64).otherwise(0)
    ).cast("long")
    # keep references the materialized reasons column (not a second copy of
    # the expression tree): the twice-referenced non-cheap projection stops
    # CollapseProject from inlining, so the signals evaluate once per row
    # carry lets composite plans (plans/pretrain.py) keep payload columns
    # in the SAME single-scan projection instead of joining the mask back
    # onto the corpus — a self-join shuffle that would dominate at scale
    return docs.select(
        "doc_id",
        *carry,
        q["n_words"].alias("n_words"),
        reasons.alias("reasons"),
    ).withColumn("keep", F.col("reasons") == 0)
