"""Search-front-end command dispatch — the reference's SearchQueryService
special-command chain.

Reference (`code/services-application/search-service/java/nu/marginalia/
search/`):

- chain order, first match wins (`svc/SearchQueryService.java:42-50`):
  browse-redirect → convert → definition → bang → lang → site-redirect →
  default search
- `command/BrowseRedirectCommand.java`: ``^browse:[.A-Za-z\\-0-9:]+$`` →
  ``/explore`` (word ``random``) or ``/explore/<word>`` (lowercased)
- `svc/SearchUnitConversionService.java:14-33` ``tryConversion``: the
  conversion pattern must match the WHOLE query; the command fires only
  when the conversion service actually succeeds (unknown/incompatible
  units fall through to the next command), group(1)=value expression,
  group(3)=from, group(4)=to
- `command/DefinitionCommand.java`: ``^define:[A-Za-z\\s-0-9]+$`` → word
  = remainder, lowercased
- `command/BangCommand.java`: ``!g``/``!ddg``/``!w`` anywhere in the
  query, both neighbors space-or-edge (`BangMatcher`), remainder =
  ``trim(prefix) + ' ' + trim(suffix)`` trimmed; a blank remainder does
  NOT fire
- `command/LangCommand.java`: ``(^|\\s)lang:([a-z]{2})(\\s|$)`` with the
  iso code present in the language configuration → strip the token
  (``replaceAll(" ")``, trimmed) and carry the language
- `command/SiteRedirectCommand.java`: ``^(?:site|links):[.A-Za-z\\-0-9:/]+$``
  → ``/site/<domain>?view=info|links`` with scheme/path stripping

Spark-first shape: the router is a pure function (regex + string ops, no
I/O — the reference's renderers/redirects are presentation); the column
application is one shuffle-free ``mapInPandas`` pass like the assistant
surface. All regexes stay inside the Java∩RE2 syntax subset so the DuckDB
oracle can replay routing decisions.
"""

from __future__ import annotations

import re
import unicodedata
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import StructType

from .assistant import MathParser, Units

__all__ = ["BANGS", "route_query", "route_queries", "try_eval"]

# BangCommand.java:14-16 — bang key → redirect URL pattern. The payload
# this router emits is "<key> <remainder>"; URL-encoding the remainder
# into the pattern is presentation.
BANGS = {
    "!g": "https://www.google.com/search?q=%s",
    "!ddg": "https://duckduckgo.com/?q=%s",
    "!w": "/search?query=%s+site:en.wikipedia.org",
}

# re.ASCII throughout: Java Pattern \s is [ \t\n\x0B\f\r] and \d is
# [0-9] by default, while Python's default \s/\d are Unicode-aware — a
# query containing NBSP/U+2028 must NOT route as if it held a space.
_BROWSE_RE = re.compile(r"browse:[.A-Za-z\-0-9:]+", re.ASCII)
_DEFINE_RE = re.compile(r"define:[A-Za-z\s\-0-9]+", re.ASCII)
_SITE_RE = re.compile(r"(?:site|links):[.A-Za-z\-0-9:/]+", re.ASCII)
_LANG_RE = re.compile(r"(^|\s)lang:([a-z]{2})(\s|$)", re.ASCII)
# SearchUnitConversionService.conversionPattern, verbatim (matches() =
# full match). Group numbering as in Java: 1 = value expression,
# 3 = from-unit, 4 = to-unit.
_CONVERSION_RE = re.compile(
    r"((\d+|\s+|[.()\-^+%*/]|log[^a-z]|log2[^a-z]|sqrt[^a-z]|log10"
    r"|cos[^a-z]|sin[^a-z]|tan[^a-z]|log2|pi[^a-z]|e[^a-z]|2pi[^a-z])+)"
    r"\s*([a-zA-Z][a-zA-Z^.0-9]*\s?[a-zA-Z^.0-9]*)"
    r"\s+in\s+([a-zA-Z^.0-9]+\s?[a-zA-Z^.0-9]*)",
    re.ASCII,
)
_EVAL_RE = re.compile(
    r"(\d+|\s+|[.()\-^+%*/]|log|log2|sqrt|log10|cos|sin|tan|pi|e|2pi)+",
    re.ASCII,
)


_JAVA_WS = "".join(chr(c) for c in range(0x21))


def _java_trim(s: str) -> str:
    """String.trim() parity: strip only chars <= U+0020 (str.strip()
    removes ALL Unicode whitespace — NBSP etc. must survive)."""
    return s.strip(_JAVA_WS)


# Java Pattern line terminators: a non-MULTILINE `$` also matches just
# before ONE final terminator, so `^browse:...$` via asPredicate() accepts
# a trailing newline (the command then consumes the RAW remainder,
# terminator included). matches()-based predicates (conversion, eval) are
# strict full-input and get plain fullmatch.
_TERMINATORS = ("\r\n", "\n", "\r", "\x85", "\u2028", "\u2029")


def _java_anchored(rx: re.Pattern, s: str) -> bool:
    if rx.fullmatch(s):
        return True
    for t in _TERMINATORS:
        if s.endswith(t):
            return rx.fullmatch(s, 0, len(s) - len(t)) is not None
    return False


def _match_bang(query: str, key: str) -> str | None:
    """BangMatcher replay: find ``key`` with space-or-edge on both sides;
    remainder = trimmed prefix + ' ' + trimmed suffix, trimmed. Returns
    None when no boundary-valid occurrence exists OR the remainder is
    blank (a bare bang does not fire — BangCommand.java:44-47)."""
    def _space(ch: str) -> bool:
        # Character.isSpaceChar — Zs/Zl/Zp separators ONLY (a tab is NOT a
        # valid bang boundary in the reference)
        return unicodedata.category(ch) in ("Zs", "Zl", "Zp")

    pos = -1
    while True:
        pos = query.find(key, pos + 1)
        if pos < 0:
            return None
        before_ok = pos == 0 or _space(query[pos - 1])
        end = pos + len(key)
        after_ok = end >= len(query) or _space(query[end])
        if not (before_ok and after_ok):
            continue
        ret = _java_trim(
            _java_trim(query[:pos]) + " " + _java_trim(query[end:])
        )
        return ret or None


def try_eval(query: str) -> bool:
    """``SearchUnitConversionService.tryEval`` admission gate: the whole
    query matches the expression alphabet AND is not purely digits (a bare
    number is not worth evaluating). The evaluation itself is
    ``assistant.MathParser.eval`` over ``query.lower().strip()``."""
    if not _EVAL_RE.fullmatch(query):
        return False
    expr = query.lower().strip()
    # Java: expr.chars().allMatch(isDigit) rejects — vacuously true on a
    # blank expr, so an all-whitespace query does not eval either
    return bool(expr) and not expr.isdigit()


def route_query(
    query: str,
    known_langs: frozenset[str] | set[str] = frozenset({"en"}),
    units: Units | None = None,
) -> tuple[str, str]:
    """→ ``(command, payload)``, first matching command in chain order.

    Payloads: browse → redirect path; convert → ``value|from|to`` (the
    matched groups, pipe-joined — the conversion RESULT is the
    ``assist_convert`` surface); define → the lowercased word; bang →
    ``<key> <remainder>``; lang → ``<iso> <rewritten query>``; site/links
    → the redirect path; search → the query unchanged."""
    if not isinstance(query, str):
        # SearchParameters coerces a missing query to "" (requireNonNullElse)
        query = ""
    if _java_anchored(_BROWSE_RE, query):
        word = query[len("browse:"):].lower()
        return ("browse", "/explore" if word == "random" else f"/explore/{word}")
    m = _CONVERSION_RE.fullmatch(query)
    if m is not None:
        u = units if units is not None else _default_units()
        if u.convert(m.group(1), m.group(3), m.group(4)) is not None:
            return ("convert", f"{m.group(1)}|{m.group(3)}|{m.group(4)}")
    if _java_anchored(_DEFINE_RE, query):
        return ("define", query[len("define:"):].lower())
    for key in BANGS:
        rem = _match_bang(query, key)
        if rem is not None:
            return ("bang", f"{key} {rem}")
    m = _LANG_RE.search(query)
    if m is not None and m.group(2) in known_langs:
        return ("lang", f"{m.group(2)} {_java_trim(_LANG_RE.sub(' ', query))}")
    if _java_anchored(_SITE_RE, query):
        idx = query.index(":")
        prefix, domain = query[:idx], query[idx + 1:].lower()
        if ":" in domain:
            # find(), not index(): 'site:foo:8080' has ':' but no '://' —
            # Java's indexOf gives -1 and substring(-1+3) chops two chars;
            # bug-compatible on purpose (SiteRedirectCommand.java:24-28)
            domain = domain[domain.find("://") + 3:]
            if domain.find("/") > 0:
                domain = domain[: domain.index("/")]
        view = "links" if prefix == "links" else "info"
        return ("site", f"/site/{domain}?view={view}")
    return ("search", query)


_UNITS: Units | None = None


def _default_units() -> Units:
    global _UNITS
    if _UNITS is None:
        _UNITS = Units(MathParser())
    return _UNITS


def route_queries(
    df: DataFrame,
    query_col: str = "query",
    known_langs: frozenset[str] | set[str] = frozenset({"en"}),
) -> DataFrame:
    """Route a column of search-box queries: adds ``command`` and
    ``payload``. One shuffle-free mapInPandas pass; the Units table builds
    once per executor (module-level memo), not per batch."""
    # copy before .add(): StructType.add mutates in place, and df.schema
    # hands back the DataFrame's live schema object
    schema = StructType(list(df.schema.fields))
    schema.add("command", "string").add("payload", "string")
    langs = frozenset(known_langs)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        u = _default_units()
        for b in batches:
            routed = [route_query(q, langs, u) for q in b[query_col]]
            b = b.copy()
            b["command"] = [c for c, _ in routed]
            b["payload"] = [p for _, p in routed]
            yield b

    return df.mapInPandas(run, schema=schema)
