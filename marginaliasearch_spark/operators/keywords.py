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

__all__ = ["tfidf_keywords", "corpus_stem_map", "subject_like_keywords"]


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


# SubjectLikeKeywords.java adaptation: the reference matches POS grammar
# patterns ([NOUN span] followed by a SUBJECT_SUFFIX verb pattern —
# languages-experimental.xml: (VBD VBZ) | MD VB | VBZ DT | ...). No POS
# model ships in transcripts (COVERAGE.md divergence 9), so "verb-like"
# adapts to: an auxiliary/modal surface form, or a regular past form
# (length >= 4 ending in 'ed' — the VBD suffix rule). The auxiliary list
# covers the finite forms the SUBJECT_SUFFIX patterns anchor on.
SUBJECT_AUX_VERBS = (
    "am", "is", "are", "was", "were", "be", "been", "being",
    "has", "have", "had", "do", "does", "did",
    "will", "would", "can", "could", "shall", "should", "may",
    "might", "must",
)


def subject_like_keywords(
    docs: DataFrame,
    threshold: int = 100,
    doc_count: int | None = None,
    term_df: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document subject-like keyword stems (the Subjects flag source).

    Reference: ``keyword/extractors/SubjectLikeKeywords.java:14`` — noun
    spans in the pattern ``[Name] (Verbs) ...`` ("Greeks bearing gifts" →
    Greeks), rejected when a comma immediately follows the span
    (``nextCommaPos(kw.end-1) <= kw.end``), grouped by stemmed form,
    scored by the span's TF-IDF (``getTermTfIdf``: an ``_``-joined n-gram
    averages its parts with Java int division), kept when ``score >= 100``.

    Adaptation (documented divergence — no POS model in transcripts):
    a "noun" is any non-stopword clean token; a span is a unigram or a
    bigram of adjacent nouns; "verb follows" means the next token is
    auxiliary/modal or a ``*ed`` past form (``SUBJECT_AUX_VERBS``); the
    comma rule becomes "the span's last raw token carries a comma" (and a
    comma between the two bigram words breaks the span, as a comma token
    breaks the reference's NOUN pattern).

    Spark-first shape: candidate detection is a per-row index scan over
    the raw token array (map-side, shuffle-free); candidate rows are
    sparse (only noun-before-verb positions survive), so the two scoring
    joins against the per-doc TF-IDF relation — co-keyed on
    ``(doc_id, stem)``, the groupBy's own partitioning — move candidate-
    sized data only. Nothing vocabulary-sized reaches the driver.

    Output: one (doc_id, stem, score) row per distinct surviving stem.
    """
    if doc_count is None:
        doc_count = docs.count()

    raw = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: t != ""
    )
    base = docs.select(F.col(id_col).alias("doc_id"), raw.alias("_raw"))
    clean = F.transform(
        F.col("_raw"),
        lambda t: F.regexp_replace(
            F.lower(t), r"^[^a-z0-9]+|[^a-z0-9]+$", ""
        ),
    )
    comma = F.transform(F.col("_raw"), lambda t: t.contains(","))
    toked = base.select(
        "doc_id", clean.alias("_clean"), comma.alias("_comma")
    )

    c, m = F.col("_clean"), F.col("_comma")
    n = F.size(c)
    # 0-based positions; F.get is 0-based and null out-of-bounds, so the
    # lookahead needs no edge guards
    idx = F.when(n > 0, F.sequence(F.lit(0), n - 1)).otherwise(
        F.array().cast("array<int>")
    )

    def noun(t):
        return t.isNotNull() & (t != "") & ~t.isin(*STOPWORDS)

    def verbish(t):
        return t.isNotNull() & (
            t.isin(*SUBJECT_AUX_VERBS)
            | ((F.length(t) >= 4) & t.endswith("ed"))
        )

    uni = F.transform(
        F.filter(
            idx,
            lambda i: noun(F.get(c, i))
            & ~F.get(m, i)
            & verbish(F.get(c, i + 1)),
        ),
        lambda i: F.struct(
            F.get(c, i).alias("w1"),
            F.lit(None).cast("string").alias("w2"),
        ),
    )
    bi = F.transform(
        F.filter(
            idx,
            lambda i: noun(F.get(c, i))
            & noun(F.get(c, i + 1))
            & ~F.get(m, i)
            & ~F.get(m, i + 1)
            & verbish(F.get(c, i + 2)),
        ),
        lambda i: F.struct(
            F.get(c, i).alias("w1"), F.get(c, i + 1).alias("w2")
        ),
    )
    cands = (
        toked.select(
            "doc_id", F.explode(F.concat(uni, bi)).alias("z")
        )
        .select("doc_id", F.col("z.w1").alias("w1"), F.col("z.w2").alias("w2"))
        .distinct()
        .withColumn("s1", stem_token("w1"))
        .withColumn("s2", stem_token("w2"))
    )

    tf = tfidf_keywords(
        docs,
        doc_count=doc_count,
        term_df=term_df,
        text_col=text_col,
        id_col=id_col,
    ).select("doc_id", "stem", "tfidf_norm")
    # candidate words are non-stopword tokens of the same document, so
    # every part has a per-doc TF-IDF row: inner on the first part, left
    # on the (unigram-null) second
    j = (
        cands.join(
            tf.withColumnRenamed("stem", "s1").withColumnRenamed(
                "tfidf_norm", "n1"
            ),
            ["doc_id", "s1"],
        ).join(
            tf.withColumnRenamed("stem", "s2").withColumnRenamed(
                "tfidf_norm", "n2"
            ),
            ["doc_id", "s2"],
            "left",
        )
    )
    # getTermTfIdf: '_'-joined n-grams average their parts with Java int
    # division (sum / parts.length, truncation; values are non-negative)
    score = F.when(
        F.col("s2").isNull(), F.col("n1")
    ).otherwise(
        F.floor((F.col("n1") + F.col("n2")) / F.lit(2)).cast("long")
    )
    stem = F.when(F.col("s2").isNull(), F.col("s1")).otherwise(
        F.concat_ws("_", "s1", "s2")
    )
    return (
        j.select(
            "doc_id", stem.alias("stem"), score.alias("score")
        )
        .where(F.col("score") >= threshold)
        .distinct()
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
