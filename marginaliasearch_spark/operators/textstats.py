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
# BPE-ish sub-word segmentation: letter runs, digit runs, single punctuation
BPE_ISH_RE = "[a-z]+|[0-9]+|[^a-z0-9\\s]"


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """doc_id → whitespace token count + BPE-ish sub-token count."""
    lower = F.lower(F.col(text_col))
    ws = F.size(F.filter(F.split(F.trim(lower), _WORD_SPLIT), lambda t: t != ""))
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


def quality_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio quality features + a 0-1 score.

    The classic pre-training quality gates (C4/Gopher-style rules) as one
    projection: mean word length, punctuation density, stopword fraction.
    """
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
    return docs.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        F.round(mean_word_len, 6).alias("mean_word_len"),
        F.round(punct_frac, 6).alias("punct_frac"),
        F.round(stop_frac, 6).alias("stop_frac"),
        F.round(gates, 6).alias("quality"),
    )


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
      it occurs ≥ 2 times in the doc; ``dup_line_frac`` counts ALL
      occurrences in duplicated groups over all lines, ``dup_char_frac``
      the same weighted by line length;
    - ``bullet_line_frac`` = lines starting with '-', '*' or '•';
    - ``top_bigram_frac`` = (occurrences of the most frequent word bigram ×
      its non-space char length) / total token chars, ties broken by the
      lexicographically smallest bigram; 0.0 when the doc has < 2 tokens.

    Two per-doc hash aggregations (lines, bigrams — both map-side
    combinable, keyed by doc) joined back to one row per doc; everything
    else is JVM array expressions. All ratios are exact-integer divisions,
    so both engines produce bit-identical doubles.
    """
    lines_arr = F.filter(
        F.transform(F.split(F.col(text_col), "\n"), lambda l: F.trim(l)),
        lambda l: l != "",
    )
    toks_arr = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda t: t != ""
    )
    base = docs.select(
        "doc_id", lines_arr.alias("lines"), toks_arr.alias("toks")
    )
    nt = F.size("toks")
    per_doc = base.select(
        "doc_id",
        F.size(
            F.filter(
                F.col("lines"),
                lambda l: l.startswith("-") | l.startswith("*") | l.startswith("•"),
            )
        ).alias("bullet_lines"),
        F.aggregate(
            F.col("toks"), F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
        ).alias("tok_chars"),
    )

    ln = base.select("doc_id", F.explode("lines").alias("line"))
    lg = ln.groupBy("doc_id", "line").agg(F.count("*").alias("cnt"))
    lstat = lg.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_lines"),
        F.sum(F.col("cnt") * F.length("line")).alias("line_chars"),
        F.sum(F.when(F.col("cnt") >= 2, F.col("cnt")).otherwise(0)).alias(
            "dup_lines"
        ),
        F.sum(
            F.when(F.col("cnt") >= 2, F.col("cnt") * F.length("line")).otherwise(0)
        ).alias("dup_chars"),
    )

    bg_arr = F.when(
        nt >= 2,
        F.transform(
            F.sequence(F.lit(1), nt - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(F.col("toks"), i), F.element_at(F.col("toks"), i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bg = base.select("doc_id", F.explode(bg_arr).alias("bigram"))
    bgrp = bg.groupBy("doc_id", "bigram").agg(F.count("*").alias("cnt"))
    top = (
        bgrp.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(
                    F.col("cnt").desc(), "bigram"
                )
            ),
        )
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            F.col("cnt").alias("top_cnt"),
            (F.length("bigram") - 1).alias("top_chars"),
        )
    )

    out = (
        per_doc.join(lstat, "doc_id", "left")
        .join(top, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_lines"), F.lit(0)).cast("long").alias("n_lines"),
            F.round(
                F.coalesce(F.col("dup_lines") / F.col("n_lines"), F.lit(0.0)), 6
            ).alias("dup_line_frac"),
            F.round(
                F.coalesce(F.col("dup_chars") / F.col("line_chars"), F.lit(0.0)),
                6,
            ).alias("dup_char_frac"),
            F.round(
                F.coalesce(F.col("bullet_lines") / F.col("n_lines"), F.lit(0.0)),
                6,
            ).alias("bullet_line_frac"),
            F.round(
                F.coalesce(
                    (F.col("top_cnt") * F.col("top_chars")) / F.col("tok_chars"),
                    F.lit(0.0),
                ),
                6,
            ).alias("top_bigram_frac"),
        )
    )
    return out
