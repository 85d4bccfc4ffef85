"""BM25 scoring math — exact reference formulas as Spark column expressions.

From ``Bm25GraphVisitor.java:41-70`` and
``PrototypeRankingParameters.java:11-19``:

    IDF = ln(1 + (N - n + 0.5) / (n + 0.5))
    TF  = c * (k1 + 1) / (c + k1 * (1 - b + b * len / AVG_LENGTH))
    k1 = 1.2, b = 0.5, AVG_LENGTH = 5000 (hardcoded — NOT the corpus average)

For plain-text transcripts every position falls in the BODY span (weight
1.0), so the reference's span-weighted count ``c`` reduces to the raw
in-document term frequency (SURVEY §5 equivalence note).

Final ordering is ASCENDING by
    normalize(v, p) = sqrt((1 + 500 + 20*p) / (1 + v))
(``IndexResultRankingService.java:690-695``); with no document penalties
(p = 0) this is a monotone-decreasing transform of the raw BM25 sum, so
rank order equals descending raw BM25.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

K1 = 1.2
B = 0.5
AVG_LENGTH = 5000.0
BM25_WEIGHT = 1.0
SCALE = 1.0 + 500.0  # normalize() numerator base


def idf(df: Column, n_docs: Column | float) -> Column:
    n = F.lit(n_docs) if isinstance(n_docs, (int, float)) else n_docs
    return F.log(1.0 + (n - df + 0.5) / (df + 0.5))


def tf_norm(tf: Column, doc_len: Column) -> Column:
    return (tf * (K1 + 1.0)) / (tf + K1 * (1.0 - B + B * doc_len / AVG_LENGTH))


def bm25_partial(tf: Column, doc_len: Column, df: Column, n_docs: Column | float) -> Column:
    """One term's BM25 contribution for one doc."""
    return idf(df, n_docs) * tf_norm(tf, doc_len)


def normalize(value: Column, penalty: Column | float = 0.0) -> Column:
    """Reference's ascending score transform (lower = better)."""
    p = F.lit(penalty) if isinstance(penalty, (int, float)) else penalty
    return F.sqrt((SCALE + 20.0 * p) / (1.0 + value))


# ---------------------------------------------------------------------------
# Flag-BM25 (``score_bFlags``): a second BM25 over flag-derived pseudo-counts
# at weight 0.5 * bm25Weight (IndexResultRankingService.java:139-141,
# TermFlagsGraphVisitor.java:30-81). Per term the reference sums weights of
# the word's flag bits (Title 1.5, Subjects 1.25, NamesWords 0.25, ...) and
# saturates with b = 0 — "priority terms are independent of document length"
# (TermFlagsGraphVisitor.java:35). Transcript analogue of the flag weights:
# SYSTEM turns play Title, TOOL turns play Subjects, ASSISTANT turns play
# NamesWords; plain USER turns are the body (no flag score), so an all-user
# corpus scores identically with or without the flag term.
# ---------------------------------------------------------------------------

FLAG_BM25_WEIGHT = 0.5 * BM25_WEIGHT
FLAG_WEIGHT_SYSTEM = 1.5
FLAG_WEIGHT_TOOL = 1.25
FLAG_WEIGHT_ASSISTANT = 0.25


def flag_qcount(flags: Column) -> Column:
    """Flag bits → pseudo-count (TermFlagsGraphVisitor.evaluatePriorityScore
    analogue over ingest's role-flag byte: SYSTEM=1, ASSISTANT=2, TOOL=8)."""
    def bit(mask: int, w: float) -> Column:
        return F.when(flags.bitwiseAND(F.lit(mask)) != 0, F.lit(w)).otherwise(
            F.lit(0.0)
        )

    return (
        bit(1, FLAG_WEIGHT_SYSTEM)
        + bit(8, FLAG_WEIGHT_TOOL)
        + bit(2, FLAG_WEIGHT_ASSISTANT)
    )


def flags_partial(flags: Column, df: Column, n_docs: Column | float) -> Column:
    """One term's flag-BM25 contribution: ``idf * q(k1+1)/(q+k1)`` (b = 0,
    length-independent; q = 0 → 0, so unflagged occurrences are free)."""
    q = flag_qcount(flags)
    return idf(df, n_docs) * (q * (K1 + 1.0)) / (q + K1)


# ---------------------------------------------------------------------------
# Document bonus/penalty (calculateDocumentBonus,
# IndexResultRankingService.java:281-360): the negative part feeds
# ``normalize(value, penalty)`` (:155-158 ``-min(0, documentBonus)``; positive
# bonus is only allowed to offset penalties, never to boost). Constants from
# PrototypeRankingParameters.java:12-16. Transcript analogue: the 6-bit
# quality-derived rank bucket stamped in the doc id's high bits (ids.py,
# rank 0 = best of 64) plays both the reference's 8-bit domain rank
# (rankingBonus, :306) and its quality byte (qualityPenalty, :621-630);
# the short-document penalty carries over unchanged (:308-309).
# ---------------------------------------------------------------------------

SHORT_DOC_THRESHOLD = 2000  # setShortDocumentThreshold
SHORT_DOC_PENALTY = 2.0  # setShortDocumentPenalty
QUALITY_PENALTY = 1.0 / 15.0  # setQualityPenalty
DOMAIN_RANK_BONUS = 1.0 / 100.0  # setDomainRankBonus
MAX_RANK = 63  # 6-bit rank bucket (reference: 8-bit, 255)


def document_bonus(doc_len: Column, rank: Column) -> Column:
    """Signed bonus; callers clamp to the penalty via ``-min(0, bonus)``."""
    r = rank.cast("double")
    length_pen = F.when(
        doc_len > F.lit(SHORT_DOC_THRESHOLD), F.lit(0.0)
    ).otherwise(F.lit(-SHORT_DOC_PENALTY))
    quality_pen = -r * F.lit(QUALITY_PENALTY)
    rank_bonus = (F.lit(float(MAX_RANK)) - r) * F.lit(DOMAIN_RANK_BONUS)
    return length_pen + quality_pen + rank_bonus


def document_penalty(doc_len: Column, rank: Column) -> Column:
    """``-min(0, documentBonus)`` — the magnitude of the net penalty."""
    return -F.least(F.lit(0.0), document_bonus(doc_len, rank))


#: setTemporalBiasWeight default (PrototypeRankingParameters.java:24)
TEMPORAL_BIAS_WEIGHT = 5.0


def temporal_bias(
    year: Column, anchor: int, weight: float = TEMPORAL_BIAS_WEIGHT
) -> Column:
    """``-|year - anchor| * weight`` — the reference's RECENT/OLD temporal
    bias term in the document bonus
    (IndexResultRankingService.java:322-330). Divergence note: the
    reference anchors RECENT at wall-clock ``PubDate.MAX_YEAR`` and OLD at
    the constant 1995; a deterministic engine anchors at the INDEX's own
    max/min document year (IndexReader.year_range), which is reproducible
    and tracks the corpus rather than the clock."""
    return -F.abs(year.cast("double") - F.lit(float(anchor))) * F.lit(
        float(weight)
    )


# ---------------------------------------------------------------------------
# Positional bonuses (IndexResultRankingService.java:133-135, 360-402,
# 489-507; defaults TcfFirstPositionWeight=2.5, TcfProximityWeight=0.5,
# PrototypeRankingParameters.java:21-22). For plain-text transcripts every
# position is in the BODY span, so the tag-weighted variants collapse to the
# BODY constants (full-match weight 1.0, attenuation 0.5).
# ---------------------------------------------------------------------------

TCF_FIRST_POSITION_WEIGHT = 2.5
TCF_PROXIMITY_WEIGHT = 0.5
VERBATIM_BODY_WEIGHT = 1.0  # weights_full[BODY]
VERBATIM_BODY_ATTENUATION = 0.5  # attenuation[BODY]


def first_position_bonus(first_position: Column) -> Column:
    """``2.5 / sqrt(max over query terms of the term's first position)``
    (:133; UnorderedMatches tracks the max of first positions, :595)."""
    return TCF_FIRST_POSITION_WEIGHT / F.sqrt(
        F.greatest(first_position.cast("double"), F.lit(1.0))
    )


def proximity_bonus(min_dist: Column, n_terms: int) -> Column:
    """``0.5 * 2/(0.1 + sqrt(minDist))`` when ``0 < minDist < n_terms+8``
    (:376-381); minDist is the smallest max-min spread over one position per
    term, order-adjusted by the term's query index (SequenceOperations
    .minDistance). Applies only to 3+-term queries (:374 length > 2)."""
    d = min_dist.cast("double")
    return F.when(
        (d > 0) & (d < F.lit(float(n_terms + 8))),
        TCF_PROXIMITY_WEIGHT * 2.0 / (0.1 + F.sqrt(d)),
    ).otherwise(F.lit(0.0))


OPTIONAL_BODY_WEIGHT = 0.5  # weights_partial[BODY] (:441-453)


def optional_group_bonus(
    phrase_count: Column, size: int, full_size: int
) -> Column:
    """Optional phrase-constraint group score (expansion segments):
    ``0.5 * size * sqrt(size/full) * (1 + ln(1 + cnt^0.5))`` for cnt > 0
    in-order matches — the BODY case of the reference's optional-group
    verbatim scoring (IndexResultRankingService.java:521-545; partial
    weight 0.5, attenuation 0.5, sizeScalingFactor sqrt(size/full))."""
    import math

    c = phrase_count.cast("double")
    scale = math.sqrt(size / float(max(full_size, 1)))
    return F.when(
        c > 0,
        OPTIONAL_BODY_WEIGHT
        * float(size)
        * scale
        * (1.0 + F.log(1.0 + F.pow(c, VERBATIM_BODY_ATTENUATION))),
    ).otherwise(F.lit(0.0))


def verbatim_bonus(phrase_count: Column, n_terms: int) -> Column:
    """BODY full-group verbatim score: ``1.0 * n_terms *
    (1 + ln(1 + cnt^0.5))`` for cnt > 0 in-order full-query phrase matches
    (:489-507 — transcript positions carry no HTML tags, so every match is
    the mixed/BODY case)."""
    c = phrase_count.cast("double")
    return F.when(
        c > 0,
        VERBATIM_BODY_WEIGHT
        * float(n_terms)
        * (1.0 + F.log(1.0 + F.pow(c, VERBATIM_BODY_ATTENUATION))),
    ).otherwise(F.lit(0.0))
