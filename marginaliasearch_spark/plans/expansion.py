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
- ``nounPluralForms`` — last-word variants (:167-178): Porter stem-class
  mates from the (build-time stemmed) lexicon — the Snowball stemming the
  reference applies to every graph word (``QueryExpansion.java:21``) —
  plus the irregular singular/plural table (``NounVariants.java``
  analogue, functions/stemmer.py).

``joinTerms`` admission compares STEMMED collection frequencies
(``dict.getTermFreqStemmed``, :147-153), which the lexicon's ``stem``
column provides via a grouped probe.

``categoryKeywords`` (recipe → category:food, :123-138) is web-specific
and intentionally out of scope.

Everything is driver-side planning: one batched lexicon probe for all
candidate variants, then pure-Python path enumeration into the parser's
And/Or tree — the expanded query executes through the ordinary engine.
"""

from __future__ import annotations

import re
from dataclasses import replace

from ..functions.stemmer import noun_variants, porter_stem
from .parser import And, Or, ParsedQuery, Term, parse_query

_NUM_BOUNDARY = re.compile(r"^(?:[0-9]+[a-z]+|[a-z]+[0-9]+)$")
_SPLIT_NUM = re.compile(r"(?<=[0-9])(?=[a-z])|(?<=[a-z])(?=[0-9])")
JOIN_CTF_FLOOR = 1000  # reference: scoreCombo > 1000 admits the join
MAX_PATHS = 32
MAX_LAST_WORD_VARIANTS = 4  # stem-mates kept per last word (by ctf desc)
# ngram-lexicon segmentation: a query window is a recognized segment when
# its corpus adjacency count reaches this floor (the reference's learned
# NgramLexicon membership test, QueryExpansion.java:187-228 createSegments)
NGRAM_MIN_COUNT = 30
NGRAM_MAX_N = 3


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
    return cands


def expand_terms(
    words: list[str],
    stats: dict[str, tuple[int, int]],
    last_variants: list[str] = (),
    stem_ctf: dict[str, int] | None = None,
) -> object | None:
    """Build the expanded And/Or include tree for an AND term list.

    ``stats``: term → (df, ctf) for every original word and candidate
    variant present in the lexicon (absent = unknown term).
    ``last_variants``: lexicon-verified alternatives for the final word
    (stem-class mates + irregular noun forms), already capped.
    ``stem_ctf``: stem → summed collection frequency; when given, join
    admission uses stemmed frequencies like the reference
    (``dict.getTermFreqStemmed``), else falls back to surface-term ctf.
    """
    if not words:
        return None
    cands = candidate_variants(words)

    def ctf(t: str) -> int:
        return stats.get(t, (0, 0))[1]

    def stemmed_ctf(t: str) -> int:
        if stem_ctf is None:
            return ctf(t)
        return stem_ctf.get(porter_stem(t), 0)

    # per-position single-word alternatives
    alts: list[list[str]] = [[w] for w in words]
    for v in last_variants:
        if v not in alts[-1]:
            alts[-1].append(v)
    # span variants: (start, length) → [replacement terms]
    spans: dict[tuple[int, int], list[str]] = {}
    for term, places in cands.items():
        if term not in stats:
            continue  # variant never indexed → dead branch
        for kind, pos, span in places:
            if kind == "word":
                if term not in alts[pos]:
                    alts[pos].append(term)
            elif kind == "alphanum" or kind == "ngram":
                spans.setdefault((pos, span), []).append(term)
            elif kind == "join":
                a, b = words[pos], words[pos + 1]
                if (
                    stemmed_ctf(term) > stemmed_ctf(a) + stemmed_ctf(b)
                    or stemmed_ctf(term) > JOIN_CTF_FLOOR
                ):
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
    # admitted word spans become optional phrase-constraint groups (the
    # reference's createSegments constraints, QueryExpansion.java:187-228:
    # every recognized segment is both an n-gram variant AND an optional
    # constraint that boosts docs where the original words appear in order)
    opt_constraints = sorted(
        {
            tuple(words[s : s + ln])
            for (s, ln) in spans
            if ln >= 2 and ln < len(words)
        }
    )
    tree: object
    if len(uniq) == 1:
        p = uniq[0]
        tree = Term(p[0]) if len(p) == 1 else And(tuple(Term(w) for w in p))
    else:
        tree = Or(
            tuple(
                Term(p[0]) if len(p) == 1 else And(tuple(Term(w) for w in p))
                for p in uniq
            )
        )
    return tree, [list(c) for c in opt_constraints]


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
    last_variants = _last_word_variants(reader, words[-1])
    stem_ctf = _stem_ctf_probe(
        reader, words + list(candidate_variants(words))
    )
    tree, opt_constraints = expand_terms(words, stats, last_variants, stem_ctf)
    # ngram-lexicon segmentation (createSegments): windows frequent as
    # corpus adjacencies become optional constraint groups even when their
    # joined form was never indexed as a token
    for seg in ngram_segments(reader, words):
        if seg not in opt_constraints:
            opt_constraints.append(seg)
    return replace(pq, include=tree, opt_phrases=opt_constraints)


def ngram_segments(
    reader,
    words: list[str],
    min_count: int = NGRAM_MIN_COUNT,
    max_n: int = NGRAM_MAX_N,
) -> list[list[str]]:
    """Recognized sub-windows of ``words`` per the index's ngram lexicon
    (``index_build.build_ngrams``); empty when the index has none.

    The full-query window is excluded — the full group already earns the
    verbatim bonus. One pushed-``IN`` probe for all windows; windows are
    returned in (length, start) order — length-major, then start within a
    length — so downstream score terms accumulate deterministically.
    """
    from pyspark.sql import functions as F

    ng = getattr(reader, "ngrams", None)
    if ng is None or len(words) < 2:
        return []
    windows = [
        (i, n)
        for n in range(2, min(max_n, len(words) - 1) + 1)
        for i in range(len(words) - n + 1)
    ]
    if not windows:
        return []
    keys = {" ".join(words[i : i + n]) for i, n in windows}
    rows = (
        ng.filter(F.col("key").isin(sorted(keys)) & (F.col("cnt") >= min_count))
        .select("key")
        .collect()
    )
    admitted = {r["key"] for r in rows}
    return [
        list(words[i : i + n])
        for i, n in windows
        if " ".join(words[i : i + n]) in admitted
    ]


def _probe(reader, terms: list[str]) -> dict[str, tuple[int, int, int]]:
    """term → (term_id, df, ctf) for terms present in the lexicon."""
    from pyspark.sql import functions as F

    rows = reader.lexicon.filter(F.col("term").isin(terms)).collect()
    return {r["term"]: (r["term_id"], r["df"], r["ctf"]) for r in rows}


def _last_word_variants(reader, word: str) -> list[str]:
    """Lexicon-verified variants of the last word: Porter stem-class mates
    (regular plurals + derivations) and irregular noun forms, ranked by
    collection frequency and capped — one pushed-filter lexicon probe."""
    from pyspark.sql import functions as F

    s = porter_stem(word)
    irregular = noun_variants(word)
    if "stem" in reader.lexicon.columns:
        cond = F.col("stem") == s
        if irregular:
            cond = cond | F.col("term").isin(irregular)
        rows = reader.lexicon.filter(cond).select("term", "ctf").collect()
    elif irregular:  # pre-stem-column index: irregular table only
        rows = (
            reader.lexicon.filter(F.col("term").isin(irregular))
            .select("term", "ctf")
            .collect()
        )
    else:
        return []
    ranked = sorted(rows, key=lambda r: (-r["ctf"], r["term"]))
    out = [r["term"] for r in ranked if r["term"] != word]
    return out[:MAX_LAST_WORD_VARIANTS]


def _stem_ctf_probe(reader, terms: list[str]) -> dict[str, int] | None:
    """stem → summed ctf over the lexicon for the stems of ``terms`` (the
    reference's ``getTermFreqStemmed``); None on a pre-stem-column index."""
    from pyspark.sql import functions as F

    if "stem" not in reader.lexicon.columns:
        return None
    stems = sorted({porter_stem(t) for t in terms})
    rows = (
        reader.lexicon.filter(F.col("stem").isin(stems))
        .groupBy("stem")
        .agg(F.sum("ctf").alias("ctf"))
        .collect()
    )
    return {r["stem"]: int(r["ctf"]) for r in rows}
