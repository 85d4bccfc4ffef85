"""conv:<id> doc-range filters (F5 analogue) + result decoration join (J7)."""

import pytest

from marginaliasearch_spark.operators.index_build import IndexPaths, build_index
from marginaliasearch_spark.operators.query_exec import (
    IndexReader,
    decorate_results,
    run_query,
)
from marginaliasearch_spark.sources.transcripts import factor_corpus


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    corpus = factor_corpus(spark, 128).cache()
    root = str(tmp_path_factory.mktemp("convidx"))
    build_index(spark, corpus, root, n_buckets=1)
    return corpus, IndexReader(spark, IndexPaths(root))


def test_conv_include(spark, built):
    _, reader = built
    got = {
        r["conv_id"]
        for r in run_query(reader, "factor2 conv:conv12 conv:conv30", k=50).collect()
    }
    assert got == {"conv12", "conv30"}


def test_conv_exclude(spark, built):
    _, reader = built
    base = {r["conv_id"] for r in run_query(reader, "factor30", k=50).collect()}
    got = {
        r["conv_id"]
        for r in run_query(reader, "factor30 -conv:conv60", k=50).collect()
    }
    assert got == base - {"conv60"}
    assert "conv60" in base


def test_conv_include_no_match(spark, built):
    _, reader = built
    assert run_query(reader, "factor2 conv:nope", k=5).count() == 0


def test_decoration_join(spark, built):
    corpus, reader = built
    res = run_query(reader, "factor64", k=5)
    dec = decorate_results(res, corpus, n_turns=2).collect()
    assert len(dec) == res.count()
    first_turns = {}
    for r in corpus.filter("turn_idx < 2").collect():
        first_turns.setdefault(r["conv_id"], []).append((r["turn_idx"], r["text"]))
    all_turns = {}
    for r in corpus.collect():
        all_turns.setdefault(r["conv_id"], []).append(
            (r["turn_idx"], r["text"], r["ts"])
        )
    import hashlib

    for row in dec:
        expect = " ".join(t for _, t in sorted(first_turns[row["conv_id"]]))
        assert row["snippet"] == expect
        assert row["first_role"] == "user"  # turn 0 role in factor corpus
        # DecoratedSearchResultItem metadata parity: pubYear from the
        # first turn's ts, dataHash over the FULL conversation text,
        # wordsTotal = the indexed doc length
        turns = sorted(all_turns[row["conv_id"]])
        assert row["pub_year"] == min(ts for _, _, ts in turns).year
        full = "\n".join(t for _, t, _ in turns)
        assert row["data_hash"] == int(
            hashlib.md5(full.encode()).hexdigest()[:15], 16
        )
        assert row["words_total"] == row["doc_len"]


def test_keyword_positions_slot_semantics(spark):
    """First positions come from the tokenizer's slot numbering: stopwords
    consume slots without being indexed, so 'zeta' in 'alpha the zeta' sits
    at slot 3 — and absent (doc, term) combos yield no row."""
    import datetime
    import tempfile

    from marginaliasearch_spark.operators.index_build import (
        IndexPaths,
        build_index,
    )
    from marginaliasearch_spark.operators.query_exec import (
        IndexReader,
        keyword_positions,
        run_query,
    )

    ts = datetime.datetime(2025, 1, 1)
    rows = [
        ("c1", 0, "user", "alpha the zeta zeta", "", ts),
        ("c2", 0, "user", "zeta alpha", "", ts),
        ("c3", 0, "user", "alpha only here", "", ts),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp"
    )
    root = tempfile.mkdtemp(prefix="kwpos_")
    build_index(spark, df, root, n_buckets=1)
    reader = IndexReader(spark, IndexPaths(root))
    res = run_query(reader, "alpha", k=10)
    kw = keyword_positions(reader, res, ["alpha", "zeta"])
    got = {
        (r["conv_id"], r["term"]): (r["first_pos"], r["tf"])
        for r in kw.collect()
    }
    assert got == {
        ("c1", "alpha"): (1, 1),
        ("c1", "zeta"): (3, 2),  # 'the' consumed slot 2
        ("c2", "alpha"): (2, 1),
        ("c2", "zeta"): (1, 1),
        ("c3", "alpha"): (1, 1),  # no zeta row for c3
    }
