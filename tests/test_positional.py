"""Positional-ranking tests: engine scores (first-position + verbatim +
proximity bonuses, SURVEY §5) must match the independent numpy oracle, and
the min-spread kernel must agree with brute force (fuzz)."""

import itertools

import numpy as np
import pandas as pd
import pytest

from marginaliasearch_spark.operators.query_exec import (
    IndexReader,
    RankingParams,
    _min_spread_kernel,
    run_query,
)
from marginaliasearch_spark.sources.transcripts import bm25_corpus

from .oracle_ref import assemble, assemble_positions, bm25_rank


@pytest.fixture(scope="module")
def corpus_and_reader(spark, tmp_path_factory):
    from marginaliasearch_spark.operators.index_build import IndexPaths, build_index

    corpus = bm25_corpus(spark, 120)
    rows = corpus.collect()
    turns: dict[str, list[tuple[int, str]]] = {}
    for r in rows:
        turns.setdefault(r["conv_id"], []).append((r["turn_idx"], r["text"]))
    docs = {cid: assemble(t) for cid, t in turns.items()}
    positions = {cid: assemble_positions(t) for cid, t in turns.items()}
    root = str(tmp_path_factory.mktemp("posidx"))
    build_index(spark, corpus, root, n_buckets=1)
    reader = IndexReader(spark, IndexPaths(root))
    return docs, positions, reader


@pytest.mark.parametrize(
    "include",
    [
        ["word01", "word03", "word07"],  # 3 terms → proximity active
        ["word02", "word05"],  # 2 terms → firstpos + verbatim only
        ["word00"],  # single term → firstpos only
    ],
)
def test_positional_scores_match_oracle(spark, corpus_and_reader, include):
    docs, positions, reader = corpus_and_reader
    expect = bm25_rank(docs, include, k=15, positions=positions)
    got = run_query(
        reader, " ".join(include), k=15, ranking=RankingParams(positional=True)
    ).collect()
    got_pairs = [(r["conv_id"], r["score"]) for r in got]
    assert [c for c, _ in got_pairs] == [c for c, _ in expect]
    for (_, gs), (_, es) in zip(got_pairs, expect):
        assert gs == pytest.approx(es, abs=1e-9)


def test_positional_changes_ranking_only_with_flag(spark, corpus_and_reader):
    docs, positions, reader = corpus_and_reader
    include = ["word01", "word03", "word07"]
    plain = run_query(reader, " ".join(include), k=10).collect()
    expect = bm25_rank(docs, include, k=10, positions=None)
    assert [r["conv_id"] for r in plain] == [c for c, _ in expect]


def test_opt_group_word_off_live_paths_is_skipped(spark, corpus_and_reader):
    """An optional phrase group containing a word that IS in the lexicon but
    on no live path has no decoded ``pos_<w>`` column; the group must be
    skipped, not blow up the query with an unresolvable-column error
    (ADVICE r2: expansion can produce exactly this shape when a span
    variant replaces the group's words on every surviving path)."""
    from marginaliasearch_spark.plans.parser import And, ParsedQuery, Term

    docs, positions, reader = corpus_and_reader
    pq = ParsedQuery(
        include=And((Term("word01"), Term("word03"))),
        # word05 is indexed (in the lexicon) but on no include path
        opt_phrases=[["word01", "word05"]],
    )
    got = run_query(
        reader, pq, k=10, ranking=RankingParams(positional=True)
    ).collect()
    # result must equal the same query without the dead group
    plain = run_query(
        reader,
        ParsedQuery(include=And((Term("word01"), Term("word03")))),
        k=10,
        ranking=RankingParams(positional=True),
    ).collect()
    assert [(r["conv_id"], r["score"]) for r in got] == [
        (r["conv_id"], r["score"]) for r in plain
    ]


def _brute_spread(lists):
    adj = lists  # already adjusted by caller
    return min(max(c) - min(c) for c in itertools.product(*adj))


@pytest.mark.parametrize("seed", range(10))
def test_min_spread_kernel_fuzz(seed):
    rng = np.random.default_rng(seed)
    rows = []
    expects = []
    for _ in range(20):
        k = int(rng.integers(2, 5))
        lists = [
            sorted(rng.choice(200, size=int(rng.integers(1, 8)), replace=False).tolist())
            for _ in range(k)
        ]
        rows.append(lists)
        expects.append(_brute_spread(lists))
    out = _min_spread_kernel(pd.Series(rows))
    assert out.tolist() == expects


def test_min_spread_kernel_edges():
    rows = [
        None,  # whole row null
        [[1, 2, 3]],  # single list → 0 (no bonus path)
        [[1, 2], []],  # empty list → 0
        [[5], [5]],  # exact overlap → spread 0
        [[1], [100]],  # far apart
    ]
    out = _min_spread_kernel(pd.Series(rows, dtype=object))
    assert out.tolist() == [0, 0, 0, 0, 99]
