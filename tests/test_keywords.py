"""TF-IDF keyword extraction parity (WordsTfIdfCounts.java).

Pins the value/normalize formulas against a straight-line mirror, the
TfIdfHigh flag rule (cnt > 1 AND norm > 100), truncation-toward-zero,
stopword exclusion, and stem-class merging of counts.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from marginaliasearch_spark.functions.stemmer import porter_stem
from marginaliasearch_spark.functions.tokenizer import STOPWORDS
from marginaliasearch_spark.operators.keywords import (
    corpus_stem_map,
    tfidf_keywords,
)


def _mirror(docs: list[str]) -> dict[tuple[int, str], tuple[int, int, bool]]:
    """(doc, stem) -> (cnt, tfidf_norm, is_high), the reference loops."""
    counts: list[dict[str, int]] = []
    for text in docs:
        c: dict[str, int] = {}
        for tok in text.lower().split():
            if tok in STOPWORDS:
                continue
            s = porter_stem(tok)
            c[s] = c.get(s, 0) + 1
        counts.append(c)
    n = float(len(docs))
    df: dict[str, int] = {}
    for c in counts:
        for s in c:
            df[s] = df.get(s, 0) + 1
    out = {}
    for i, c in enumerate(counts):
        if not c:
            continue
        maxv = max(c.values())
        for s, cnt in c.items():
            # WordsTfIdfCounts.value + normalizeValue: truncation to int
            v = (0.1 + 0.9 * cnt / maxv) * math.log(df[s] / n)
            norm = int(-v * 75)
            out[(i, s)] = (cnt, norm, cnt > 1 and norm > 100)
    return out


def test_spark_matches_mirror_and_flags_rare_repeats(spark):
    # 40 filler docs make 'xylophone' rare (df=1); doc 0 repeats it, so
    # its norm clears 100 with cnt>1 -> TfIdfHigh fires
    docs = ["xylophone xylophone common words here"] + [
        f"common words here filler{i % 3}" for i in range(40)
    ]
    sdf = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    )
    out = tfidf_keywords(sdf).toPandas()
    got = {
        (r.doc_id, r.stem): (r.cnt, r.tfidf_norm, r.is_high)
        for r in out.itertuples()
    }
    assert got == _mirror(docs)
    assert got[(0, porter_stem("xylophone"))][2] is True
    assert any(not v[2] for v in got.values())


def test_stopwords_excluded_and_stems_merge(spark):
    docs = ["the tables table a big bigger"]
    sdf = spark.createDataFrame(pd.DataFrame({"doc_id": [0], "text": docs}))
    out = tfidf_keywords(sdf).toPandas().set_index("stem")
    assert "the" not in out.index and "a" not in out.index
    # tables + table stem-merge into one count of 2
    assert out.loc[porter_stem("table"), "cnt"] == 2


def test_truncation_toward_zero():
    # df == n -> ln(1) = 0 -> norm exactly 0 (not -1 from floor)
    assert _mirror(["solo word", "solo word"])[(0, "solo")][1] == 0


def test_empty_and_stopword_only_docs(spark):
    sdf = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1, 2], "text": ["", "the a of", "real content"]})
    )
    out = tfidf_keywords(sdf).toPandas()
    assert set(out.doc_id) == {2}


def test_corpus_stem_map(spark):
    sdf = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0], "text": ["the tables querying"]})
    )
    m = corpus_stem_map(sdf)
    assert m == {"tables": "tabl", "querying": porter_stem("querying")}


def test_name_like_keywords(spark):
    from marginaliasearch_spark.operators.keywords import name_like_keywords

    texts = [
        # Alice x3 (capitalized) -> kept (needs >= min_count+1 = 3);
        # Bob x2 -> dropped; NASA all-caps -> skipped entirely;
        # lowercase alice occurrences don't count
        "Alice met Bob then Alice called NASA while alice slept Alice Bob",
        "nothing capitalized here at all",
        "Xyz Xyz Xyz Xyz",  # 4x capitalized
    ]
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    out = name_like_keywords(docs).toPandas()
    by_doc = {
        (r.doc_id, r.stem): r.cnt for r in out.itertuples()
    }
    assert by_doc == {
        (0, porter_stem("alice")): 3,
        (2, porter_stem("xyz")): 4,
    }


def test_name_like_top_k_and_tiebreak(spark):
    from marginaliasearch_spark.operators.keywords import name_like_keywords

    # two stems tie at 3 -> both kept, output deterministic; top_k=1
    # keeps the lexicographically first of the tie
    text = "Aaa Aaa Aaa Bbb Bbb Bbb"
    docs = spark.createDataFrame(pd.DataFrame({"doc_id": [0], "text": [text]}))
    full = name_like_keywords(docs).toPandas()
    assert list(full.sort_values("stem").stem) == ["aaa", "bbb"]
    one = name_like_keywords(docs, top_k=1).toPandas()
    assert list(one.stem) == ["aaa"]


def test_artifact_keywords(spark):
    from marginaliasearch_spark.operators.keywords import artifact_keywords

    texts = [
        "reach me at Jane.Doe-1@sub.Example.COM today",   # all 4 forms
        "write to admin@corp.example.org please",          # ignored user
        "or bob@gmail.com works too",                      # ignored domain
        "not-an-email @nope a@b x@y.z",                    # too short / no match
    ]
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    out = artifact_keywords(docs).toPandas()
    got = {(r.doc_id, r.artifact) for r in out.itertuples()}
    assert got == {
        # lowercased full address + domain forms + user
        (0, "jane.doe-1@sub.example.com"),
        (0, "sub.example.com"),
        (0, "@sub.example.com"),
        (0, "jane.doe-1"),
        # ignored user: address + domain forms only
        (1, "admin@corp.example.org"),
        (1, "corp.example.org"),
        (1, "@corp.example.org"),
        # ignored domain: address + user only
        (2, "bob@gmail.com"),
        (2, "bob"),
    }


def test_default_path_never_materializes_vocabulary(spark, monkeypatch):
    """The operators' default stem path must be fully distributed: no
    vocabulary-sized driver collect (corpus_stem_map), no create_map
    literal — the 100-TB corpus has a 10^8-token vocabulary that can't
    land on the driver or in a Catalyst literal."""
    import marginaliasearch_spark.operators.keywords as kw
    import marginaliasearch_spark.operators.topics as tp
    from marginaliasearch_spark.operators.keywords import (
        name_like_keywords,
        tfidf_keywords,
    )

    def boom(*a, **k):  # pragma: no cover - trips only on regression
        raise AssertionError("vocabulary-sized driver materialization")

    monkeypatch.setattr(kw, "corpus_stem_map", boom)
    docs = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [0, 1], "text": ["Tables Tables Tables big", "Big query"]}
        )
    )
    tf_plan = tfidf_keywords(docs)._jdf.queryExecution().toString()
    nm_plan = name_like_keywords(docs)._jdf.queryExecution().toString()
    for plan in (tf_plan, nm_plan):
        # stemming runs as the Arrow-batched UDF, not a literal map
        assert "stem_keyword_tokens" in plan
        assert "keys: [" not in plan and "map(" not in plan
    assert tfidf_keywords(docs).count() > 0
    assert name_like_keywords(docs).count() > 0
    # topics: the dictionary-hit filter runs BEFORE collect — patch
    # DataFrame.collect to cap what the driver may receive
    from marginaliasearch_spark.operators.topics import corpus_surface_stems

    got = corpus_surface_stems(docs, {"tabl", "queri"})
    assert got == {"tables": "tabl", "query": "queri"}


def test_long_doc_counting_is_not_quadratic(spark):
    """50k-token document completes in bounded time: per-doc counting is
    a sorted run-length scan (O(n log n)), not the nested
    count-by-filter (O(distinct·n))."""
    import time

    rng_words = [f"w{i % 5000}" for i in range(50_000)]
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0], "text": [" ".join(rng_words)]})
    )
    t0 = time.monotonic()
    out = tfidf_keywords(docs).toPandas()
    elapsed = time.monotonic() - t0
    assert len(out) == 5000
    assert set(out.cnt) == {10}
    # quadratic shape took minutes here; generous bound for slow boxes
    assert elapsed < 120


def test_artifact_min_length_and_full_match(spark):
    from marginaliasearch_spark.operators.keywords import artifact_keywords

    # 'a@b.c' is 5 chars -> rejected; 'aa@b.c' is 6 -> accepted
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1], "text": ["a@b.c", "aa@b.c"]})
    )
    out = artifact_keywords(docs).toPandas()
    assert set(out.doc_id) == {1}


def _subject_mirror(
    docs: list[str], threshold: int = 100
) -> set[tuple[int, str, int]]:
    """Straight-line SubjectLikeKeywords.java mirror under the documented
    adaptation: spans are non-stopword unigrams/bigrams whose next token
    is auxiliary/modal or a >=4-char '*ed' form, rejected when the span's
    last raw token carries a comma (or one splits the bigram); score =
    per-doc tfidf_norm, bigrams averaging parts with int division; keep
    score >= threshold."""
    from marginaliasearch_spark.operators.keywords import SUBJECT_AUX_VERBS

    tf = _mirror(docs)  # (doc, stem) -> (cnt, norm, high)

    def clean(t: str) -> str:
        import re

        t = t.lower()
        return re.sub(r"^[^a-z0-9]+|[^a-z0-9]+$", "", t)

    def verbish(t: str | None) -> bool:
        return t is not None and (
            t in SUBJECT_AUX_VERBS or (len(t) >= 4 and t.endswith("ed"))
        )

    def noun(t: str | None) -> bool:
        return bool(t) and t not in STOPWORDS

    out: set[tuple[int, str, int]] = set()
    for d, text in enumerate(docs):
        raws = text.split()
        cl = [clean(t) for t in raws]
        cm = ["," in t for t in raws]

        def get(i):
            return cl[i] if 0 <= i < len(cl) else None

        for i in range(len(raws)):
            if noun(get(i)) and not cm[i] and verbish(get(i + 1)):
                s = porter_stem(cl[i])
                sc = tf[(d, s)][1]
                if sc >= threshold:
                    out.add((d, s, sc))
            if (
                noun(get(i))
                and noun(get(i + 1))
                and not cm[i]
                and not cm[i + 1]
                and verbish(get(i + 2))
            ):
                s1, s2 = porter_stem(cl[i]), porter_stem(cl[i + 1])
                sc = (tf[(d, s1)][1] + tf[(d, s2)][1]) // 2
                if sc >= threshold:
                    out.add((d, f"{s1}_{s2}", sc))
    return out


def test_subject_like_keywords_matches_mirror(spark):
    from marginaliasearch_spark.operators.keywords import subject_like_keywords

    # rare nouns before verbs clear the tfidf cut; commas veto; bigram
    # spans average their parts; filler docs push df down for the subjects
    docs = [
        "caesar crossed rivers and caesar marched while senate, was watching",
        "roman republic was strong and roman republic endured the wars",
        "gifts carried by greeks, were suspected but greeks bearing gifts arrived",
        "plain filler text without any subjects at all",
    ] + [f"common filler{i % 5} words here" for i in range(30)]
    sdf = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    )
    got = {
        (r.doc_id, r.stem, r.score)
        for r in subject_like_keywords(sdf).toPandas().itertuples()
    }
    exp = _subject_mirror(docs)
    assert got == exp
    # sanity: the fixture genuinely exercises unigram, bigram and veto paths
    assert any("_" in s for _, s, _ in exp)
    assert any("_" not in s for _, s, _ in exp)
    assert not any(s.startswith("senate") and "_" not in s for _, s, _ in exp)


def test_subject_like_threshold_and_comma_rules(spark):
    from marginaliasearch_spark.operators.keywords import subject_like_keywords

    docs = [
        "zebra was here",  # unigram subject
        "zebra, was here",  # comma veto
        "quick zebra was here",  # bigram + unigram
        "quick, zebra was here",  # comma splits the bigram, unigram survives
    ] + ["filler words only"] * 20
    sdf = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    )
    out = subject_like_keywords(sdf, threshold=1).toPandas()
    by_doc = {
        d: sorted(g.stem) for d, g in out.groupby("doc_id")
    }
    assert by_doc.get(0) == ["zebra"]
    assert 1 not in by_doc
    assert by_doc.get(2) == ["quick_zebra", "zebra"]
    assert by_doc.get(3) == ["zebra"]
    assert set(out.columns) == {"doc_id", "stem", "score"}
