"""Search-box assistant parity: MathParser + Units + question-spam.

Mirrors the reference semantics pinned in MathParser.java (staged
rewrite order, unary minus contexts, function binding, NaN on /0,
US HALF_UP formatting), Units.java (base-ratio + temperature formulas,
sig-fig formatting) and GoogleAnwersSpamDetector.java (question-prefix
gate: strictly more than 4 positives AND strictly more than half).
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from marginaliasearch_spark.operators.topics import question_spam_scores
from marginaliasearch_spark.plans.assistant import MathParser, Units


@pytest.fixture(scope="module")
def parser():
    return MathParser()


@pytest.fixture(scope="module")
def units():
    return Units()


@pytest.mark.parametrize(
    "expr,want",
    [
        ("1+1", 2.0),
        ("2+3*4", 14.0),          # precedence: * before +
        ("2*3+4", 10.0),
        ("2^10", 1024.0),
        ("2^2^3", 64.0),           # left-assoc fold: (2^2)^3
        ("(1+2)*3", 9.0),
        ("1 + 2 * (3 - 1)", 5.0),
        ("-5+3", -2.0),            # leading unary minus
        ("2*-3", -6.0),            # unary minus after operator
        ("5-3", 2.0),              # binary minus
        ("sqrt 4", 2.0),           # function binds next token
        ("sqrt(16)+1", 5.0),
        ("log(e)", 1.0),
        ("cos 0", 1.0),
        ("sin 0", 0.0),
        ("tan 0", 0.0),
        ("10/4", 2.5),
        ("pi", math.pi),
        ("e", math.e),
        ("3.5", 3.5),              # trivial fast path
        (".5", 0.5),
    ],
)
def test_eval(parser, expr, want):
    assert parser.eval(expr) == pytest.approx(want, rel=1e-12)


def test_eval_division_by_zero_is_nan(parser):
    assert math.isnan(parser.eval("1/0"))


@pytest.mark.parametrize(
    "expr",
    [
        "log10(100)",  # tokenizer splits 'log'/'10' — fails in the
        "2pi",         # reference too (constants map is unreachable for
        "1..2",        # these shapes); malformed number; garbage char
        "@@",
        "(1+2",        # unbalanced parens
    ],
)
def test_eval_formatted_failures_return_empty(parser, expr):
    assert parser.eval_formatted(expr) == ""


def test_eval_formatted_us_locale(parser):
    # grouping + HALF_UP + max 6 fraction digits, no trailing zeros
    assert parser.eval_formatted("1234.5678+1") == "1,235.5678"
    assert parser.eval_formatted("10/3") == "3.333333"
    assert parser.eval_formatted("2.0000001/2") == "1"
    assert parser.eval_formatted("5") == "5"
    assert parser.eval_formatted("1000000*2") == "2,000,000"


def test_units_basic(units):
    v, name, fmt = units.convert("1", "km", "miles")
    assert v == pytest.approx(1000.0 / 1609.344)
    assert name == "miles" and fmt == "0.62 miles"
    v, name, fmt = units.convert("2.5", "kg", "lbs")
    assert v == pytest.approx(2.5 / 0.45359237)
    assert name == "lb" and fmt == "5.512 lb"


def test_units_temperature(units):
    assert units.convert("100", "c", "f")[0] == 212.0
    assert units.convert("32", "f", "c")[0] == 0.0
    assert units.convert("0", "c", "k")[0] == 273.15
    assert units.convert("273.15", "k", "c")[0] == 0.0
    assert units.convert("212", "fahrenheit", "kelvins")[0] == pytest.approx(373.15)


def test_units_incompatible_and_unknown(units):
    assert units.convert("1", "km", "kg") is None       # type mismatch
    assert units.convert("1", "flurbs", "m") is None    # unknown unit
    assert units.convert("nonsense", "km", "m") is None  # unparsable value


def test_units_same_unit_echo(units):
    v, name, fmt = units.convert("7", "km", "kilometers")
    assert v == 7.0 and name == "km" and fmt == "7 km"


def test_units_value_may_be_expression(units):
    # Units.convert evals the value through the MathParser
    v, _, _ = units.convert("1+1", "m", "cm")
    assert v == pytest.approx(200.0)


def test_question_spam_gates(spark):
    # conv a: 6/8 user turns question-prefixed -> spam (6>4, 0.75>0.5)
    # conv b: 4/8 -> NOT spam (4>4 fails)
    # conv c: 5/12 -> NOT spam (ratio 0.416 <= 0.5)
    rows = []
    for conv, n_pos, n_tot in (("a", 6, 8), ("b", 4, 8), ("c", 5, 12)):
        for i in range(n_tot):
            text = ("What is this " if i < n_pos else "plain text ") + str(i)
            rows.append((conv, "user", text))
        rows.append((conv, "assistant", "What about non-user turns"))
    turns = spark.createDataFrame(
        pd.DataFrame(rows, columns=["conv_id", "role", "text"])
    )
    out = (
        question_spam_scores(turns)
        .toPandas()
        .set_index("conv_id")
        .sort_index()
    )
    assert out.loc["a", "spam_score"] == 1.0
    assert out.loc["b", "spam_score"] == 0.0
    assert out.loc["c", "spam_score"] == 0.0
    # non-user turns are not counted
    assert out.loc["a", "total"] == 8 and out.loc["a", "positive"] == 6


def test_question_spam_case_sensitive(spark):
    # reference startsWith is case-sensitive: 'what...' does not count
    turns = spark.createDataFrame(
        pd.DataFrame(
            [("x", "user", "what is lowercase " + str(i)) for i in range(10)]
            + [("x", "user", "Why yes " + str(i)) for i in range(10)],
            columns=["conv_id", "role", "text"],
        )
    )
    out = question_spam_scores(turns).toPandas()
    assert out.loc[0, "positive"] == 10 and out.loc[0, "total"] == 20
    # exactly half -> strict > 0.5 fails
    assert out.loc[0, "spam_score"] == 0.0
