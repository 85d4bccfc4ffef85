"""Porter stemmer (M.F. Porter, 1980 — public-domain algorithm) + a compact
irregular-noun table.

The reference stems via Snowball's PorterStemmer for query-expansion variant
generation (``QueryExpansion.java:21,147-150``) and consults a
singular/plural dictionary (``NounVariants.java``, a 1M-entry CSV resource)
for noun variants. We mirror both: the classic Porter algorithm below, and a
small built-in irregular table standing in for the dictionary resource
(which is not shippable here). Regular plural/derivational variants don't
need a dictionary at all — the index's lexicon is stemmed at build time
(``index_build``), so "variants of word w" = the lexicon rows sharing
``stem(w)``, which by construction only proposes terms that are actually
indexed.
"""

from __future__ import annotations

_VOWELS = frozenset("aeiou")


def _is_cons(word: str, i: int) -> bool:
    c = word[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """The Porter 'm' value: number of VC sequences in [C](VC)^m[V]."""
    m = 0
    prev_vowel = False
    for i in range(len(stem)):
        cons = _is_cons(stem, i)
        if cons and prev_vowel:
            m += 1
        prev_vowel = not cons
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(word: str) -> bool:
    return (
        len(word) >= 2
        and word[-1] == word[-2]
        and _is_cons(word, len(word) - 1)
    )


def _ends_cvc(word: str) -> bool:
    if len(word) < 3:
        return False
    if not (
        _is_cons(word, len(word) - 3)
        and not _is_cons(word, len(word) - 2)
        and _is_cons(word, len(word) - 1)
    ):
        return False
    return word[-1] not in "wxy"


# suffix map per the official updated algorithm (includes Porter's two
# published departures from the 1980 paper: bli->ble, logi->log)
_STEP2 = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("bli", "ble"), ("alli", "al"), ("entli", "ent"),
    ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
    ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
    ("logi", "log"),
]
_STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]
_STEP4 = [
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
]


def porter_stem(word: str) -> str:
    """Stem one lowercase word (non-alpha tokens pass through unchanged)."""
    if len(word) <= 2 or not word.isalpha():
        return word
    w = word

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # step 1b
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        flag = False
        if w.endswith("ed") and _has_vowel(w[:-2]):
            w, flag = w[:-2], True
        elif w.endswith("ing") and _has_vowel(w[:-3]):
            w, flag = w[:-3], True
        if flag:
            if w.endswith(("at", "bl", "iz")):
                w += "e"
            elif _ends_double_cons(w) and w[-1] not in "lsz":
                w = w[:-1]
            elif _measure(w) == 1 and _ends_cvc(w):
                w += "e"

    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # step 2
    for suf, rep in _STEP2:
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break

    # step 3
    for suf, rep in _STEP3:
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break

    # step 4
    for suf in _STEP4:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if suf == "ion" and not stem.endswith(("s", "t")):
                break
            if _measure(stem) > 1:
                w = stem
            break

    # step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _ends_cvc(stem)):
            w = stem
    # step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]
    return w


# Irregular singular/plural pairs — the stand-in for the reference's
# NounVariants dictionary resource (noun_list.csv). Both directions apply.
_IRREGULAR_PAIRS = [
    ("child", "children"), ("foot", "feet"), ("goose", "geese"),
    ("man", "men"), ("woman", "women"), ("mouse", "mice"), ("tooth", "teeth"),
    ("person", "people"), ("ox", "oxen"), ("louse", "lice"),
    ("datum", "data"), ("index", "indices"), ("matrix", "matrices"),
    ("vertex", "vertices"), ("axis", "axes"), ("crisis", "crises"),
    ("criterion", "criteria"), ("phenomenon", "phenomena"),
    ("medium", "media"), ("analysis", "analyses"), ("basis", "bases"),
    ("thesis", "theses"), ("schema", "schemata"), ("leaf", "leaves"),
    ("life", "lives"), ("knife", "knives"), ("half", "halves"),
    ("wolf", "wolves"), ("cactus", "cacti"), ("focus", "foci"),
    ("fungus", "fungi"), ("nucleus", "nuclei"), ("radius", "radii"),
    ("stimulus", "stimuli"), ("syllabus", "syllabi"), ("series", "series"),
]

NOUN_VARIANTS: dict[str, list[str]] = {}
for _a, _b in _IRREGULAR_PAIRS:
    NOUN_VARIANTS.setdefault(_a, []).append(_b)
    NOUN_VARIANTS.setdefault(_b, []).append(_a)


def noun_variants(word: str) -> list[str]:
    """Irregular singular↔plural variants (NounVariants.pluralVariant)."""
    return NOUN_VARIANTS.get(word, [])
