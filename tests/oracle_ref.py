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


def assemble_positions(turns: list[tuple[int, str]]) -> list[tuple[str, int]]:
    """Token stream with 1-based positions; stopword-free corpora assumed;
    each turn boundary burns 2 extra slots (the reference's +2 inter-region
    padding, DocumentPositionMapper.java:33-39)."""
    out: list[tuple[str, int]] = []
    slot = 0
    for i, (_, text) in enumerate(sorted(turns)):
        if i:
            slot += 2
        for t in tokenize(text):
            slot += 1
            out.append((t, slot))
    return out


def positional_bonuses(
    positioned: list[tuple[str, int]], include: list[str]
) -> float:
    """First-position + verbatim + proximity bonuses (SURVEY §5 formulas),
    brute-force implementation independent of the engine kernels."""
    pos_of: dict[str, list[int]] = {}
    for t, p in positioned:
        pos_of.setdefault(t, []).append(p)
    plists = [pos_of.get(t, []) for t in include]
    if any(not p for p in plists):
        return 0.0
    # first position: max over terms of the term's first occurrence
    first = max(max(p[0] for p in plists), 1)
    bonus = 2.5 / math.sqrt(first)
    # verbatim: count of in-order full-phrase matches (BODY weights)
    if len(include) >= 2:
        cnt = sum(
            1
            for p in plists[0]
            if all((p + i) in pos_of.get(include[i], ()) for i in range(1, len(include)))
        )
        if cnt > 0:
            bonus += 1.0 * len(include) * (1.0 + math.log(1.0 + cnt**0.5))
    # proximity: min spread of order-adjusted positions, 3+ terms only
    if len(include) > 2:
        import itertools

        adj = [[p - i for p in pl] for i, pl in enumerate(plists)]
        best = min(
            max(combo) - min(combo) for combo in itertools.product(*adj)
        )
        if 0 < best < len(include) + 8:
            bonus += 0.5 * 2.0 / (0.1 + math.sqrt(best))
    return bonus


def flag_pseudo_count(roles: set[str]) -> float:
    """Role set of a term's occurrences → flag pseudo-count (the transcript
    analogue of TermFlagsGraphVisitor.evaluatePriorityScore weights)."""
    q = 0.0
    if "system" in roles:
        q += 1.5
    if "tool" in roles:
        q += 1.25
    if "assistant" in roles:
        q += 0.25
    return q


def document_penalty(doc_len: int, rank: int) -> float:
    """-min(0, documentBonus): short-doc penalty (threshold 2000, penalty 2)
    + quality penalty (rank/15) offset by the rank bonus ((63-rank)/100) —
    IndexResultRankingService.java:281-360 constants, transcript rank
    bucket in place of the 8-bit domain rank."""
    bonus = (
        (0.0 if doc_len > 2000 else -2.0)
        + (-rank * (1.0 / 15.0))
        + ((63.0 - rank) * (1.0 / 100.0))
    )
    return max(0.0, -bonus)


def bm25_rank(
    docs: dict[str, list[str]],
    include: list[str],
    exclude: list[str] = (),
    k: int = 10,
    positions: dict[str, list[tuple[str, int]]] | None = None,
    term_roles: dict[str, dict[str, set[str]]] | None = None,
    ranks: dict[str, int] | None = None,
    weighted_counts: dict[str, dict[str, float]] | None = None,
) -> list[tuple[str, float]]:
    """AND query over token-list docs → ascending-normalized top-k.

    Returns [(conv_id, score)] sorted ascending by score (lower = better).
    ``positions``: conv_id → positioned token stream; when given, positional
    bonuses are added to the raw score (include order = query order).
    ``term_roles``: conv_id → term → set of roles of turns containing it;
    when given, the flag-BM25 term (score_bFlags, weight 0.5, b=0) is added.
    ``ranks``: conv_id → rank bucket; when given, the document penalty feeds
    normalize() instead of 0.
    ``weighted_counts``: conv_id → term → role-span-weighted occurrence
    count (system 2.5 / tool 1.25 / body 1.0 per occurrence); when given it
    replaces the raw term frequency as BM25's c.
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
        for q in sorted(set(include)):
            n = df[q]
            idf = math.log(1.0 + (n_docs - n + 0.5) / (n + 0.5))
            if weighted_counts is not None:
                c = weighted_counts[conv_id].get(q, 0.0)
            else:
                c = terms.count(q)
            tf = c * (K1 + 1.0) / (c + K1 * (1.0 - B + B * doc_len / AVG_LENGTH))
            raw += idf * tf
            if term_roles is not None:
                qc = flag_pseudo_count(term_roles[conv_id].get(q, set()))
                raw += 0.5 * idf * (qc * (K1 + 1.0)) / (qc + K1)
        if positions is not None:
            raw += positional_bonuses(positions[conv_id], include)
        p = document_penalty(doc_len, ranks[conv_id]) if ranks is not None else 0.0
        score = math.sqrt((501.0 + 20.0 * p) / (1.0 + raw))
        results.append((conv_id, score))
    results.sort(key=lambda r: (r[1], r[0]))
    return results[:k]
