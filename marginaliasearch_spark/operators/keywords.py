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

Spark-first shape: per-document counting never shuffles — tokens, the
surface→stem map, distinct stems, per-stem counts and the per-doc max all
run as JVM higher-order array expressions; explode happens map-side. The
ONLY shuffle is the vocabulary-sized document-frequency aggregation (the
TermFrequencyDict build), whose result broadcasts back. Stemming runs
once per distinct corpus token (driver-side Porter over the vocabulary),
as in operators/topics.py.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.stemmer import porter_stem
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
    """surface token → stem for every distinct non-stopword corpus token
    (one vocabulary-sized aggregation + driver-side Porter)."""
    toks = (
        docs.select(F.explode(_clean_tokens(text_col)).alias("tok"))
        .distinct()
        .collect()
    )
    return {
        r["tok"]: porter_stem(r["tok"])
        for r in toks
        if r["tok"] not in STOPWORDS
    }


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
    index lexicon's stem column) to make this a single-scan, single-
    broadcast map job."""
    if surface_stems is None:
        surface_stems = corpus_stem_map(docs, text_col)
    if doc_count is None:
        doc_count = docs.count()

    toks = _clean_tokens(text_col)
    smap = F.create_map(
        *[F.lit(x) for kv in sorted(surface_stems.items()) for x in kv]
    )
    stems_arr = F.filter(
        F.transform(toks, lambda t: F.element_at(smap, t)),
        lambda s: s.isNotNull(),
    )
    matched = F.array_sort(F.array_distinct(stems_arr))

    def cnt_of(s):
        return F.size(F.filter(stems_arr, lambda x: x == s))

    counts_arr = F.transform(matched, cnt_of)
    per_doc = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.arrays_zip(matched.alias("stem"), counts_arr.alias("cnt"))).alias("z"),
        F.array_max(counts_arr).alias("maxv"),
    ).select(
        "doc_id",
        F.col("z.stem").alias("stem"),
        F.col("z.cnt").cast("long").alias("cnt"),
        F.col("maxv").cast("double").alias("maxv"),
    )
    # the TermFrequencyDict build: one count per (document, stem) — the
    # only shuffle; vocabulary-sized output broadcasts back
    df_rel = (
        term_df
        if term_df is not None
        else per_doc.groupBy("stem").agg(
            F.count("*").cast("double").alias("df")
        )
    )
    joined = per_doc.join(F.broadcast(df_rel), "stem")
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

    Shuffle-free: tokenize (case kept), candidate mask, stem map, count,
    threshold, sort and cap all run as JVM array expressions; explode is
    map-side. Output: (doc_id, stem, cnt).
    """
    if surface_stems is None:
        surface_stems = corpus_stem_map(docs, text_col)
    # case-preserving clean tokens so "Claude." and "Claude" count
    # together (the reference's NAME spans are punctuation-clean words)
    toks = _clean_tokens(text_col, lower=False)
    smap = F.create_map(
        *[F.lit(x) for kv in sorted(surface_stems.items()) for x in kv]
    )
    # leading uppercase letter, but not an all-caps word (isAllCaps skip)
    is_name = lambda t: t.rlike("^[A-Z]") & ~t.rlike("^[A-Z0-9]+$")  # noqa: E731
    name_stems = F.filter(
        F.transform(
            F.filter(toks, is_name), lambda t: F.element_at(smap, F.lower(t))
        ),
        lambda s: s.isNotNull(),
    )
    distinct = F.array_distinct(name_stems)

    def cnt_of(s):
        return F.size(F.filter(name_stems, lambda x: x == s))

    kept = F.filter(distinct, lambda s: cnt_of(s) >= min_count + 1)
    ranked = F.slice(
        F.array_sort(
            F.transform(
                kept, lambda s: F.struct((-cnt_of(s)).alias("neg"), s.alias("stem"))
            )
        ),
        1,
        top_k,
    )
    return docs.select(
        F.col(id_col).alias("doc_id"), F.explode(ranked).alias("z")
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
