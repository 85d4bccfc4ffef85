"""Independent numpy reference implementation of the ranking formulas.

This is the test oracle (FIXTURES.md T1b): ~60 lines of numpy implementing
exactly the reference's published scoring math — IDF/TF from
``Bm25GraphVisitor.java:41-70`` (k1=1.2, b=0.5, AVG_LENGTH=5000) and the
ascending ``normalize()`` from ``IndexResultRankingService.java:690-695`` —
with NO imports from the engine package, so engine bugs can't hide in shared
code.
"""

from __future__ import annotations

import math

K1 = 1.2
B = 0.5
AVG_LENGTH = 5000.0


def tokenize(text: str) -> list[str]:
    return [t for t in text.lower().split() if t]


def assemble(turns: list[tuple[int, str]]) -> list[str]:
    """Concat turn token streams in turn_idx order."""
    out: list[str] = []
    for _, text in sorted(turns):
        out.extend(tokenize(text))
    return out


def bm25_rank(
    docs: dict[str, list[str]],
    include: list[str],
    exclude: list[str] = (),
    k: int = 10,
) -> list[tuple[str, float]]:
    """AND query over token-list docs → ascending-normalized top-k.

    Returns [(conv_id, score)] sorted ascending by score (lower = better).
    """
    n_docs = len(docs)
    df: dict[str, int] = {}
    for terms in docs.values():
        for t in set(terms):
            df[t] = df.get(t, 0) + 1
    results = []
    for conv_id, terms in docs.items():
        tset = set(terms)
        if any(t not in tset for t in include):
            continue
        if any(t in tset for t in exclude):
            continue
        doc_len = len(terms)
        raw = 0.0
        for q in include:
            n = df[q]
            idf = math.log(1.0 + (n_docs - n + 0.5) / (n + 0.5))
            c = terms.count(q)
            tf = c * (K1 + 1.0) / (c + K1 * (1.0 - B + B * doc_len / AVG_LENGTH))
            raw += idf * tf
        score = math.sqrt(501.0 / (1.0 + raw))
        results.append((conv_id, score))
    results.sort(key=lambda r: (r[1], r[0]))
    return results[:k]
