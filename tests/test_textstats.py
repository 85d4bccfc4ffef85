"""Repetition-signal tests (Gopher rules, Rae et al. 2021 table A1): the
engine's per-doc fractions vs a Python mirror on crafted documents, plus
edge cases (no lines, no tokens, all-duplicate docs)."""

import re
from collections import Counter

import pytest

from marginaliasearch_spark.operators import textstats


def _mirror(text: str) -> dict:
    lines = [ln.strip() for ln in text.split("\n")]
    lines = [ln for ln in lines if ln != ""]
    toks = [t for t in re.split("[^a-z0-9]+", text.lower()) if t]
    n_lines = len(lines)
    lc = Counter(lines)
    dup_lines = sum(c for c in lc.values() if c >= 2)
    line_chars = sum(len(ln) for ln in lines)
    dup_chars = sum(c * len(ln) for ln, c in lc.items() if c >= 2)
    bullets = sum(1 for ln in lines if ln[:1] in ("-", "*", "•"))
    bigrams = Counter(
        f"{a} {b}" for a, b in zip(toks, toks[1:])
    )
    tok_chars = sum(len(t) for t in toks)
    if bigrams:
        top_bg = min(bigrams, key=lambda b: (-bigrams[b], b))
        top_frac = bigrams[top_bg] * (len(top_bg) - 1) / tok_chars
    else:
        top_frac = 0.0
    return {
        "n_lines": n_lines,
        "dup_line_frac": round(dup_lines / n_lines, 6) if n_lines else 0.0,
        "dup_char_frac": round(dup_chars / line_chars, 6) if n_lines else 0.0,
        "bullet_line_frac": round(bullets / n_lines, 6) if n_lines else 0.0,
        "top_bigram_frac": round(top_frac, 6),
    }


DOCS = [
    # duplicated lines + bullets
    (0, "error: retry\nerror: retry\nok\n- item one\n- item one\n* item two"),
    # pure repetition (boilerplate): one bigram dominates
    (1, "buy now " * 20),
    # clean prose, no repetition
    (2, "the quick brown fox jumps over the lazy dog tonight"),
    # empty / whitespace-only
    (3, "   \n  \n"),
    # unicode bullet + blank lines between dups
    (4, "• point\n\n• point\n\ntext line"),
    # single token (no bigrams)
    (5, "solo"),
]


@pytest.fixture(scope="module")
def rep_rows(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    return {
        r["doc_id"]: r.asDict()
        for r in textstats.repetition_signals(df).collect()
    }


class TestRepetitionSignals:
    @pytest.mark.parametrize("doc_id,text", DOCS)
    def test_matches_python_mirror(self, rep_rows, doc_id, text):
        want = _mirror(text)
        got = rep_rows[doc_id]
        for k, v in want.items():
            assert got[k] == pytest.approx(v, abs=1e-9), (doc_id, k)

    def test_boilerplate_doc_flags_high(self, rep_rows):
        # "buy now buy now ..." — top bigram covers nearly all chars
        assert rep_rows[1]["top_bigram_frac"] > 0.9

    def test_clean_doc_flags_low(self, rep_rows):
        assert rep_rows[2]["dup_line_frac"] == 0.0
        assert rep_rows[2]["top_bigram_frac"] < 0.3

    def test_empty_doc_all_zero(self, rep_rows):
        r = rep_rows[3]
        assert r["n_lines"] == 0
        assert (
            r["dup_line_frac"]
            == r["dup_char_frac"]
            == r["bullet_line_frac"]
            == r["top_bigram_frac"]
            == 0.0
        )

    def test_every_doc_has_a_row(self, rep_rows):
        assert set(rep_rows) == {d for d, _ in DOCS}
