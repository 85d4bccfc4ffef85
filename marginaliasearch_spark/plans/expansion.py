"""Query expansion: alternative execution branches for a keyword query.

Re-implements the reference's expansion strategies
(``QueryExpansion.java:57-166``) against our index's lexicon as the
term-frequency dictionary (the reference's ``TermFrequencyDict``; our
``lexicon(term, df, ctf)`` table carries the same statistics):

- ``joinDashes``  — ``lawn-chair`` → variant ``lawnchair`` (:85-92);
- ``splitWordNum``— ``mp3`` → variant ``mp-3`` (:110-119);
- ``joinTerms``   — adjacent pair ``lawn chair`` → span variant
  ``lawnchair`` when the dictionary says the joined form is at least as
  frequent as its parts (or common in absolute terms), plus the
  alpha+number forms ``trs 80`` → ``trs80`` / ``trs-80`` (:140-166);
- ``ngramAll``    — the whole query as one ``_``-joined token (:95-107) —
  kept only when the joined token actually exists in the lexicon (our
  tokenizer preserves ``_``/``-``-joined tokens, so such terms are real);
- ``nounPluralForms`` — last-word plural/singular variants (:169-180),
  heuristic s/es/ies rules filtered by lexicon presence (the reference uses
  a dictionary; we have no POS data for transcripts).

``categoryKeywords`` (recipe → category:food, :123-138) is web-specific
and intentionally out of scope.

Everything is driver-side planning: one batched lexicon probe for all
candidate variants, then pure-Python path enumeration into the parser's
And/Or tree — the expanded query executes through the ordinary engine.
"""

from __future__ import annotations

import re
from dataclasses import replace

from .parser import And, Or, ParsedQuery, Term, parse_query

_NUM_BOUNDARY = re.compile(r"^(?:[0-9]+[a-z]+|[a-z]+[0-9]+)$")
_SPLIT_NUM = re.compile(r"(?<=[0-9])(?=[a-z])|(?<=[a-z])(?=[0-9])")
JOIN_CTF_FLOOR = 1000  # reference: scoreCombo > 1000 admits the join
MAX_PATHS = 32


def _plural_variants(word: str) -> list[str]:
    out = []
    if word.endswith("ies") and len(word) > 4:
        out.append(word[:-3] + "y")
    if word.endswith("es") and len(word) > 3:
        out.append(word[:-2])
    if word.endswith("s") and not word.endswith("ss") and len(word) > 2:
        out.append(word[:-1])
    else:
        out.extend([word + "s", word + "es"])
    if word.endswith("y") and len(word) > 2:
        out.append(word[:-1] + "ies")
    return [v for v in out if v != word]


def candidate_variants(words: list[str]) -> dict[str, list[tuple]]:
    """All candidate variant terms the strategies might introduce.

    Returns {variant_term: [(kind, position, span_len)]} so the planner can
    place admitted variants after one batched lexicon probe.
    """
    cands: dict[str, list[tuple]] = {}

    def add(term: str, kind: str, pos: int, span: int):
        cands.setdefault(term, []).append((kind, pos, span))

    for i, w in enumerate(words):
        if "-" in w:
            add(w.replace("-", ""), "word", i, 1)  # joinDashes
        if _NUM_BOUNDARY.match(w):
            add(_SPLIT_NUM.sub("-", w), "word", i, 1)  # splitWordNum
    for i in range(len(words) - 1):
        a, b = words[i], words[i + 1]
        add(a + b, "join", i, 2)  # joinTerms
        if a.isalpha() and b.isdigit():
            add(a + "-" + b, "alphanum", i, 2)
    if len(words) > 1:
        add("_".join(words), "ngram", 0, len(words))  # ngramAll
    if words:
        for v in _plural_variants(words[-1]):
            add(v, "plural", len(words) - 1, 1)
    return cands


def expand_terms(
    words: list[str], stats: dict[str, tuple[int, int]]
) -> object | None:
    """Build the expanded And/Or include tree for an AND term list.

    ``stats``: term → (df, ctf) for every original word and candidate
    variant present in the lexicon (absent = unknown term).
    """
    if not words:
        return None
    cands = candidate_variants(words)

    def ctf(t: str) -> int:
        return stats.get(t, (0, 0))[1]

    # per-position single-word alternatives
    alts: list[list[str]] = [[w] for w in words]
    # span variants: (start, length) → [replacement terms]
    spans: dict[tuple[int, int], list[str]] = {}
    for term, places in cands.items():
        if term not in stats:
            continue  # variant never indexed → dead branch
        for kind, pos, span in places:
            if kind in ("word", "plural"):
                if term not in alts[pos]:
                    alts[pos].append(term)
            elif kind == "alphanum" or kind == "ngram":
                spans.setdefault((pos, span), []).append(term)
            elif kind == "join":
                a, b = words[pos], words[pos + 1]
                if ctf(term) > ctf(a) + ctf(b) or ctf(term) > JOIN_CTF_FLOOR:
                    spans.setdefault((pos, 2), []).append(term)

    # enumerate token sequences: at each position pick an alternative, or
    # enter a span variant and skip its covered words
    paths: list[list[str]] = []

    def walk(i: int, acc: list[str]):
        if len(paths) >= MAX_PATHS:
            return
        if i == len(words):
            paths.append(acc)
            return
        # original word first so the base path survives the MAX_PATHS cap
        for a in alts[i]:
            walk(i + 1, acc + [a])
        for (s, ln), terms in spans.items():
            if s == i:
                for t in terms:
                    walk(i + ln, acc + [t])

    walk(0, [])
    uniq = []
    seen = set()
    for p in paths:
        key = tuple(p)
        if key not in seen:
            seen.add(key)
            uniq.append(p)
    if len(uniq) == 1:
        p = uniq[0]
        return Term(p[0]) if len(p) == 1 else And(tuple(Term(w) for w in p))
    return Or(
        tuple(
            Term(p[0]) if len(p) == 1 else And(tuple(Term(w) for w in p))
            for p in uniq
        )
    )


def expand_query(reader, query: str | ParsedQuery) -> ParsedQuery:
    """Parse + expand a query against ``reader``'s lexicon.

    Only the positive (include) terms are expanded; phrases, exclusions,
    priority terms, limits and gates pass through untouched (the reference
    expands the positive word graph only).
    """
    pq = parse_query(query) if isinstance(query, str) else query
    words = pq.ordered_include_terms()
    if not words:
        return pq
    probe = sorted(set(words) | set(candidate_variants(words)))
    stats = {w: (df, ctf) for w, (tid, df, ctf) in _probe(reader, probe).items()}
    tree = expand_terms(words, stats)
    return replace(pq, include=tree)


def _probe(reader, terms: list[str]) -> dict[str, tuple[int, int, int]]:
    """term → (term_id, df, ctf) for terms present in the lexicon."""
    from pyspark.sql import functions as F

    rows = reader.lexicon.filter(F.col("term").isin(terms)).collect()
    return {r["term"]: (r["term_id"], r["df"], r["ctf"]) for r in rows}
