"""Per-document TF-IDF keyword extraction + flagging.

Reference: ``code/functions/language-processing/java/nu/marginalia/keyword/
extractors/WordsTfIdfCounts.java`` — per document, every keyword span's
stemmed form gets ``value = (0.1 + 0.9·cnt/maxCnt) · ln(freq/docCount)``
against the corpus term-frequency dictionary
(``TermFrequencyDict``, built by ``TermFrequencyExporter.java`` — one
count per document per term, i.e. a document frequency), normalized to
``(int)(-value·75)``; stems with ``cnt > 1`` and normalized value ``> 100``
are flagged TfIdfHigh (the ``WordFlags.TfIdfHigh`` bit that boosts
flag-BM25). The reference's keyword spans come from a POS-pattern grammar;
this engine's analogue is its ingestion keyword rule — non-stopword
tokens — since transcripts ship no POS model (same adaptation the journal
build uses; COVERAGE.md divergences).

Spark-first shape: per-document counting never shuffles — tokens,
stemming (an Arrow-batched pandas UDF with per-worker memo; see
``functions/stem_udfs.py``), distinct stems via a sorted run-length scan
and the per-doc max all run per-row; explode happens map-side. The ONLY
shuffle is the vocabulary-sized document-frequency aggregation (the
TermFrequencyDict build), which joins back co-keyed on stem (AQE
broadcast-converts it when the dictionary is small).
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.stem_udfs import stem_keyword_tokens, stem_token
from ..functions.tokenizer import STOPWORDS

__all__ = ["tfidf_keywords", "corpus_stem_map"]


def _clean_tokens(text: F.Column | str, lower: bool = True) -> F.Column:
    """Whitespace tokens with non-alphanumeric edges stripped (the
    punctuation-clean word stream the reference's sentence extractor
    produces); empty tokens dropped."""
    col = F.col(text) if isinstance(text, str) else text
    if lower:
        col = F.lower(col)
    return F.filter(
        F.transform(
            F.split(F.trim(col), r"\s+"),
            lambda t: F.regexp_replace(
                t, r"^[^A-Za-z0-9]+|[^A-Za-z0-9]+$", ""
            ),
        ),
        lambda t: t != "",
    )


def corpus_stem_map(docs: DataFrame, text_col: str = "text") -> dict[str, str]:
    """surface token → stem for every distinct non-stopword corpus token.

    The RESULT is vocabulary-sized and lands on the driver — this is a
    small-corpus / test convenience only. The operators below never call
    it: their default path stems distributedly (``stem_keyword_tokens``)
    so nothing vocabulary-sized ever reaches the driver. The stemming
    here is still distributed (Arrow-batched ``stem_token``); only the
    final collect is driver-sized."""
    rel = (
        docs.select(F.explode(_clean_tokens(text_col)).alias("tok"))
        .distinct()
        .withColumn("stem", stem_token("tok"))
    )
    return {
        r["tok"]: r["stem"]
        for r in rel.collect()
        if r["tok"] not in STOPWORDS
    }


def _run_starts(srt: F.Column) -> F.Column:
    """1-based positions opening a new run in an already-SORTED array.
    ``F.get`` (0-based, null out-of-bounds) avoids element_at's ANSI
    index errors at the run edges; i==1 makes the null comparison
    against the (absent) previous element irrelevant via OR."""
    n = F.size(srt)
    idx = F.when(n > 0, F.sequence(F.lit(1), n)).otherwise(
        F.array().cast("array<int>")
    )
    return F.filter(
        idx,
        lambda i: (i == F.lit(1))
        | (F.element_at(srt, i) != F.get(srt, i - 2)),
    )


def _stem_counts(srt: F.Column, starts: F.Column) -> tuple[F.Column, F.Column]:
    """(distinct stems, occurrence counts) from an already-SORTED stem
    array and its materialized run starts — an O(n log n)-per-document
    run-length scan, long-doc-safe (the nested count-by-filter
    alternative is O(distinct·n), quadratic on pathological documents).

    BOTH inputs must be plain pre-projected columns: Python-UDF outputs
    can't appear inside higher-order-function lambdas, and — because
    Catalyst does no common-subexpression elimination inside lambda
    bodies — an inline ``starts`` expression would be recomputed per
    element, turning the scan quadratic again."""
    n = F.size(srt)
    matched = F.transform(starts, lambda i: F.element_at(srt, i))
    m = F.size(starts)
    jdx = F.when(m > 0, F.sequence(F.lit(1), m)).otherwise(
        F.array().cast("array<int>")
    )
    # run length = next start (or n+1 past the last run) − this start
    counts = F.transform(
        jdx,
        lambda j: F.coalesce(F.get(starts, j), n + 1)
        - F.element_at(starts, j),
    )
    return matched, counts


def tfidf_keywords(
    docs: DataFrame,
    surface_stems: Mapping[str, str] | None = None,
    doc_count: int | None = None,
    term_df: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, stem, cnt, tfidf_norm, is_high) for every keyword stem of
    every document.

    ``tfidf_norm`` is the reference's normalized integer
    (``(int)(-(0.1 + 0.9·cnt/max)·ln(df/N)·75)``, truncation toward zero)
    and ``is_high`` its TfIdfHigh flag rule (``cnt > 1 AND norm > 100``).
    ``doc_count`` defaults to ``docs.count()`` (the dictionary's
    ``docCount()``).

    Without ``term_df`` the corpus is scanned twice (once to build the
    dictionary, once to score) — exactly the reference's lifecycle, where
    ``TermFrequencyExporter`` is a separate offline pass. At scale, pass
    the precomputed dictionary (``(stem, df)``; e.g. derived from the
    index lexicon's stem column) to make this a single-scan map job.

    By default stems come from the distributed Arrow-batched Porter UDF
    (nothing vocabulary-sized is ever materialized); pass a small curated
    ``surface_stems`` mapping to pin a literal-map plan instead."""
    if doc_count is None:
        doc_count = docs.count()

    toks = _clean_tokens(text_col)
    if surface_stems is None:
        stems_arr = stem_keyword_tokens(toks)
    else:
        smap = F.create_map(
            *[F.lit(x) for kv in sorted(surface_stems.items()) for x in kv]
        )
        stems_arr = F.filter(
            F.transform(toks, lambda t: F.element_at(smap, t)),
            lambda s: s.isNotNull(),
        )
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.array_sort(stems_arr).alias("_srt"),
    ).select("doc_id", "_srt", _run_starts(F.col("_srt")).alias("_starts"))
    matched, counts_arr = _stem_counts(F.col("_srt"), F.col("_starts"))
    per_doc = base.select(
        "doc_id",
        F.explode(F.arrays_zip(matched.alias("stem"), counts_arr.alias("cnt"))).alias("z"),
        F.array_max(counts_arr).alias("maxv"),
    ).select(
        "doc_id",
        F.col("z.stem").alias("stem"),
        F.col("z.cnt").cast("long").alias("cnt"),
        F.col("maxv").cast("double").alias("maxv"),
    )
    # the TermFrequencyDict build: one count per (document, stem) — the
    # only shuffle. The join back is co-keyed on stem (the groupBy's own
    # partitioning), so at vocabulary scale it's a co-partitioned
    # sort-merge join; AQE broadcast-converts it when the dictionary is
    # small. No explicit broadcast hint: a 10^8-stem dictionary must NOT
    # be forced driver/broadcast-side.
    df_rel = (
        term_df
        if term_df is not None
        else per_doc.groupBy("stem").agg(
            F.count("*").cast("double").alias("df")
        )
    )
    joined = per_doc.join(df_rel, "stem")
    value = (
        F.lit(0.1) + F.lit(0.9) * F.col("cnt").cast("double") / F.col("maxv")
    ) * F.log(F.col("df") / F.lit(float(doc_count)))
    norm = (-value * F.lit(75.0)).cast("long")  # (int) truncation
    return joined.select(
        "doc_id",
        "stem",
        "cnt",
        norm.alias("tfidf_norm"),
        ((F.col("cnt") > 1) & (norm > 100)).alias("is_high"),
    )


def name_like_keywords(
    docs: DataFrame,
    surface_stems: Mapping[str, str] | None = None,
    min_count: int = 2,
    top_k: int = 150,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document name-like keyword stems (the NamesWords flag source).

    Reference: ``keyword/extractors/NameLikeKeywords.java`` (constructed
    with ``minCount=2``, ``DocumentKeywordExtractor.java:48``) — NAME-
    pattern spans counted per stemmed form, single all-caps words skipped,
    unigrams kept when seen ``>= minCount + 1`` times, top 150 by count.
    The POS NAME pattern adapts to a capitalization heuristic (leading
    uppercase letter, not all-caps) — transcripts ship no POS model; and
    the reference's hash-order tie behavior is pinned deterministic here
    (count desc, stem asc).

    Shuffle-free: tokenize (case kept), candidate mask, Arrow-batched
    stemming, run-length count, threshold, sort and cap all run per-row;
    explode is map-side. Output: (doc_id, stem, cnt).
    """
    # case-preserving clean tokens so "Claude." and "Claude" count
    # together (the reference's NAME spans are punctuation-clean words)
    toks = _clean_tokens(text_col, lower=False)
    # leading uppercase letter, but not an all-caps word (isAllCaps skip)
    is_name = lambda t: t.rlike("^[A-Z]") & ~t.rlike("^[A-Z0-9]+$")  # noqa: E731
    name_toks = F.transform(F.filter(toks, is_name), F.lower)
    if surface_stems is None:
        name_stems = stem_keyword_tokens(name_toks)
    else:
        smap = F.create_map(
            *[F.lit(x) for kv in sorted(surface_stems.items()) for x in kv]
        )
        name_stems = F.filter(
            F.transform(name_toks, lambda t: F.element_at(smap, t)),
            lambda s: s.isNotNull(),
        )
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.array_sort(name_stems).alias("_srt"),
    ).select("doc_id", "_srt", _run_starts(F.col("_srt")).alias("_starts"))
    matched, counts = _stem_counts(F.col("_srt"), F.col("_starts"))
    pairs = F.zip_with(
        matched,
        counts,
        lambda s, c: F.struct((-c).alias("neg"), s.alias("stem")),
    )
    kept = F.filter(pairs, lambda z: -z["neg"] >= min_count + 1)
    ranked = F.slice(F.array_sort(kept), 1, top_k)
    return base.select(
        "doc_id", F.explode(ranked).alias("z")
    ).select(
        "doc_id",
        F.col("z.stem").alias("stem"),
        (-F.col("z.neg")).cast("long").alias("cnt"),
    )


# ArtifactKeywords.java: boilerplate addresses whose parts are not worth
# indexing separately
ARTIFACT_IGNORED_DOMAINS = ("@hotmail.com", "@gmail.com", "@paypal.com")
ARTIFACT_IGNORED_USERS = (
    "info", "legal", "contact", "press", "donotreply", "noreply",
    "no-reply", "admin", "root",
)
_MAIL_RE = r"^[a-zA-Z0-9._\-]+@[a-zA-Z0-9]+(\.[a-zA-Z0-9]+)+$"


def artifact_keywords(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Email-artifact keywords (keyword/extractors/ArtifactKeywords.java):
    every mail-like token (length ≥ 6, full pattern match) contributes the
    address itself, plus — unless boilerplate — its ``domain``/``@domain``
    forms and its ``user`` part, so all four are searchable. Output one
    (doc_id, artifact) row per distinct artifact; pure JVM array
    expressions, shuffle-free."""
    emails = F.filter(
        _clean_tokens(text_col),
        lambda t: (F.length(t) >= 6) & t.rlike(_MAIL_RE),
    )

    def expand(e):
        user = F.split(e, "@")[0]
        dom = F.split(e, "@")[1]
        dom_at = F.concat(F.lit("@"), dom)
        keep_dom = ~dom_at.isin(*ARTIFACT_IGNORED_DOMAINS)
        keep_user = ~user.isin(*ARTIFACT_IGNORED_USERS)
        return F.array(
            e,
            F.when(keep_dom, dom),
            F.when(keep_dom, dom_at),
            F.when(keep_user, user),
        )

    arts = F.array_sort(
        F.array_distinct(
            F.filter(
                F.flatten(F.transform(emails, expand)),
                lambda x: x.isNotNull(),
            )
        )
    )
    return docs.select(
        F.col(id_col).alias("doc_id"), F.explode(arts).alias("artifact")
    )
