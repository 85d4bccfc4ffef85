"""Topic-detector parity (converting-process classifier/topic).

Pins the engine against a straight-line pure-Python mirror of
RecipeDetector.testP / AdHocDetector.testP on the REAL reference
dictionaries, the decay closed form against the reference's iterated
merge, the sqrt length penalty, and the Spark operator against the
mirror on real corpus data.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from marginaliasearch_spark.functions.stemmer import porter_stem
from marginaliasearch_spark.operators import topics as T


def _test_p(
    term_values: dict[str, float],
    words: list[str],
    avg_length: int,
    mode: str,
) -> float:
    """Mirror of the reference testP loops (values.put / values.merge)."""
    stem_vals = {porter_stem(w): v for w, v in term_values.items()}
    values: dict[str, float] = {}
    count = 0
    for w in words:
        count += 1
        s = porter_stem(w)
        if s in stem_vals:
            if mode == "once":
                values[s] = stem_vals[s]  # RecipeDetector: put
            else:  # AdHocDetector: merge (a,b) -> 0.5*a + b
                v = stem_vals[s]
                values[s] = 0.5 * values[s] + v if s in values else v
    if count == 0:
        return 0.0
    penalty = math.sqrt(avg_length) / math.sqrt(max(avg_length, count))
    return sum(values.values()) * penalty


RECIPE_TEXT = (
    "this recipe needs simple ingredients: chop the onions, slice the "
    "peppers, saute in butter, add rice and boil. bake in the oven, "
    "garnish and heat before dinner."
)
MENU_TEXT = "our menu: reviews, newsletter signup, email checkout"


def test_recipe_detector_mirror_positive():
    words = RECIPE_TEXT.lower().replace(",", " ").replace(":", " ").replace(
        ".", " "
    ).split()
    score = _test_p(T.RECIPE_TERMS, words, T.RECIPE_AVG_LENGTH, "once")
    assert score > 0.3  # clearly recipe-like
    neg = _test_p(
        T.RECIPE_TERMS,
        MENU_TEXT.replace(",", " ").replace(":", " ").split(),
        T.RECIPE_AVG_LENGTH,
        "once",
    )
    assert neg < 0  # menu/boilerplate penalties dominate


def test_once_mode_counts_each_stem_once():
    # 'recipe recipe recipe' scores the same as 'recipe'
    one = _test_p(T.RECIPE_TERMS, ["recipe"], 250, "once")
    many = _test_p(T.RECIPE_TERMS, ["recipe"] * 3, 250, "once")
    assert one == many


def test_decay_closed_form_matches_iterated_merge():
    # engine contribution v*(2 - 2^(1-k)) == reference iterated merge
    v = 0.3
    for k in range(1, 60):
        it = v
        for _ in range(k - 1):
            it = 0.5 * it + v
        closed = v * (2.0 - 2.0 ** (1 - k))
        assert it == pytest.approx(closed, rel=1e-12)


def test_length_penalty():
    # 1000 words of which one matches: penalty = sqrt(250)/sqrt(1000)
    words = ["recipe"] + ["filler"] * 999
    score = _test_p(T.RECIPE_TERMS, words, 250, "once")
    assert score == pytest.approx(0.1 * math.sqrt(250) / math.sqrt(1000))
    # short docs: max(avg, count) = avg -> no damping
    assert _test_p(T.RECIPE_TERMS, ["recipe"], 250, "once") == pytest.approx(0.1)


def test_empty_doc_scores_zero():
    assert _test_p(T.RECIPE_TERMS, [], 250, "once") == 0.0


def test_stem_dictionary_rejects_non_thousandths():
    with pytest.raises(ValueError):
        T.stem_dictionary({"x": 0.0001})


def test_reference_dictionaries_shape():
    # stemming collapses some surfaces (e.g. grill/grilled); all values
    # are exact thousandths (the oracle's integer representation)
    for d in (T.RECIPE_TERMS, T.TEXTILE_CRAFT_TERMS, T.WOODWORKING_TERMS):
        sd = T.stem_dictionary(d)
        assert 0 < len(sd) <= len(d)
        for v in sd.values():
            assert round(v * 1000) == v * 1000


@pytest.mark.parametrize("mode,avg", [("once", 250), ("decay", 1000)])
def test_spark_operator_matches_mirror(spark, mode, avg):
    texts = [
        "customer query slow table scan",
        "merge merge merge stream window",
        "batch vector vector customer customer query",
        "the a big small data line",  # nothing matches
        "",
        "slow slow slow slow slow slow slow slow slow slow",
    ]
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    out = (
        T.topic_scores(docs, T.SYNTH_TOPIC_TERMS, avg_length=avg, mode=mode)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for i, t in enumerate(texts):
        words = t.split()
        want = round(_test_p(T.SYNTH_TOPIC_TERMS, words, avg, mode), 6)
        assert out.loc[i, "score"] == pytest.approx(want, abs=1e-9), (i, t)
        assert out.loc[i, "n_words"] == len(words)


def test_corpus_surface_stems(spark):
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0], "text": ["customer tables querying"]})
    )
    m = T.corpus_surface_stems(
        docs, T.stem_dictionary({"customer": 0.1, "table": 0.1})
    )
    # inflected surfaces land on the dictionary stems; non-hits excluded
    assert m == {"customer": "custom", "tables": "tabl"}


def test_content_farm_penalty(spark):
    texts = [
        "Benefits of widgets\nplain line",                     # 10
        "key benefits here\nKey Takeaways follow",             # 5 + 5
        "benefits of x\nkey benefits y\nkey takeaways z",      # all: 20
        "no headers at all",                                   # 0
        "the benefits of x",          # startsWith only: mid-line no match
        "",                                                     # 0
    ]
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    out = (
        T.content_farm_penalty(docs)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(out.penalty) == [10.0, 10.0, 20.0, 0.0, 0.0, 0.0]
    assert bool(out.loc[1, "key_benefits"]) and bool(out.loc[1, "key_takeaways"])
    assert not out.loc[4, "benefits_of"]


def test_content_farm_counts_each_prefix_once(spark):
    # repeated headers still contribute their weight once (boolean flags,
    # exactly the reference accumulation)
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0], "text": ["benefits of a\nbenefits of b"]})
    )
    out = T.content_farm_penalty(docs).toPandas()
    assert out.loc[0, "penalty"] == 10.0
