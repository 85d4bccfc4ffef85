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
