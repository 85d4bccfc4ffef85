"""Tokenizer rule tests (reference rules: SentenceSegmentSplitter /
DocumentPositionMapper / WordPatterns — see tokenizer.py docstring)."""

import pandas as pd

from marginaliasearch_spark.functions.tokenizer import (
    MAX_WORD_LENGTH,
    TURN_BREAK,
    assign_positions,
    tokenize_texts,
)


def toks(text: str) -> list[str]:
    return tokenize_texts(pd.Series([text])).iloc[0]


def test_basic_lower_and_split():
    assert toks("Hello, World!") == ["hello", "world"]


def test_separator_joined_tokens():
    # alnum runs joined by .-_/:+*@# stay one token
    assert toks("foo.bar-baz_qux a/b c:d e+f g@h i#j") == [
        "foo.bar-baz_qux",
        "a/b",
        "c:d",
        "e+f",
        "g@h",
        "i#j",
    ]


def test_trailing_dots_and_quotes_stripped():
    assert toks("trailing. dots... 'quoted' <tag>") == [
        "trailing",
        "dots",
        "quoted",
        "tag",
    ]


def test_possessive_stripped():
    assert toks("the dog's bone") == ["the", "dog", "bone"]


def test_unicode_nfkc():
    # ﬁ ligature folds to fi under NFKC; accents are preserved letters
    assert toks("ﬁne") == ["fine"]


def test_positions_basic():
    kept, pos, doc_len = assign_positions(["alpha", "beta", "gamma"])
    assert kept == ["alpha", "beta", "gamma"]
    assert pos.tolist() == [1, 2, 3]
    assert doc_len == 3


def test_positions_stopwords_consume_slots():
    # "the" is a stopword: emitted nowhere, but beta lands at position 3
    kept, pos, doc_len = assign_positions(["alpha", "the", "beta"])
    assert kept == ["alpha", "beta"]
    assert pos.tolist() == [1, 3]
    assert doc_len == 3


def test_positions_turn_break_pads_two():
    kept, pos, doc_len = assign_positions(["alpha", TURN_BREAK, "beta"])
    assert kept == ["alpha", "beta"]
    assert pos.tolist() == [1, 4]  # break burns slots 2-3
    assert doc_len == 2  # breaks don't count toward BM25 length


def test_overlong_token_dropped_but_consumes_position():
    long_tok = "x" * (MAX_WORD_LENGTH + 1)
    kept, pos, doc_len = assign_positions(["alpha", long_tok, "beta"])
    assert kept == ["alpha", "beta"]
    assert pos.tolist() == [1, 3]
    assert doc_len == 3


def test_break_marker_survives_tokenization():
    out = toks(f"alpha {TURN_BREAK} beta")
    assert out == ["alpha", TURN_BREAK, "beta"]
