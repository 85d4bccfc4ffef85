"""Arrow-batched Porter stemming columns.

Scale note — why UDFs and not a dictionary map: stemming is pure
per-token computation, so the 100-TB shape is NOT a driver-side
vocabulary map (a ``distinct().collect()`` over 10^8–10^9 corpus tokens
OOMs the driver, and a ``create_map`` literal of that arity won't even
analyze in Catalyst). Instead each executor stems the tokens it sees
through a vectorized pandas UDF with a per-worker memo, which matches
the stem-once-per-distinct-token cost of the dictionary approach
without materializing the vocabulary anywhere. The memo is capped so a
worker that streams an unbounded vocabulary can't grow without bound.

Reference provenance: the stem itself is the same Porter implementation
the rest of the engine uses (``functions/stemmer.py``; reference
``PorterStemmer`` usage in ``code/functions/language-processing/java/nu/
marginalia/keyword/extractors/WordsTfIdfCounts.java:40``), so results
are hash-identical to the former create_map path.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from .stemmer import porter_stem
from .tokenizer import STOPWORDS

__all__ = ["stem_token", "stem_keyword_tokens"]

# per-python-worker memo (persists across Arrow batches); capped so an
# adversarially diverse vocabulary can't grow a worker without bound
_MEMO_CAP = 1 << 20


def _memo_stem(memo: dict, tok: str) -> str | None:
    """Stem with stopwords dropped (None), memoized."""
    if tok in memo:
        return memo[tok]
    s = None if tok in STOPWORDS else porter_stem(tok)
    if len(memo) < _MEMO_CAP:
        memo[tok] = s
    return s


_TOKEN_MEMO: dict[str, str] = {}
_KEYWORD_MEMO: dict[str, str | None] = {}


@F.pandas_udf(StringType())
def stem_token(toks: pd.Series) -> pd.Series:
    """Porter stem of a single token column (no stopword handling)."""

    def one(t):
        if t is None:
            return None
        s = _TOKEN_MEMO.get(t)
        if s is None:
            s = porter_stem(t)
            if len(_TOKEN_MEMO) < _MEMO_CAP:
                _TOKEN_MEMO[t] = s
        return s

    return toks.map(one)


@F.pandas_udf(ArrayType(StringType()))
def stem_keyword_tokens(arrs: pd.Series) -> pd.Series:
    """Lower-cased token array -> Porter-stem array, stopwords dropped.

    Exactly the keyword-stem stream the former vocabulary map produced:
    ``[porter_stem(t) for t in toks if t not in STOPWORDS]``.
    """

    def one(arr):
        if arr is None:
            return None
        out = []
        for t in arr:
            s = _memo_stem(_KEYWORD_MEMO, t)
            if s is not None:
                out.append(s)
        return out

    return arrs.map(one)
