"""Flag-BM25 (score_bFlags) and document-penalty ranking vs the independent
numpy oracle (tests/oracle_ref.py — no engine imports), over the role-varied
bm25 corpus."""

import pytest
from pyspark.sql import functions as F

from marginaliasearch_spark.operators.index_build import IndexPaths, build_index
from marginaliasearch_spark.operators.ingest import conv_ranks_by_quality
from marginaliasearch_spark.operators.query_exec import (
    IndexReader,
    RankingParams,
    run_query,
)
from marginaliasearch_spark.sources.transcripts import bm25_corpus

from .oracle_ref import assemble, bm25_rank, tokenize


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    corpus = bm25_corpus(spark, 200)
    rows = corpus.collect()
    ranks = conv_ranks_by_quality(corpus)
    root = str(tmp_path_factory.mktemp("featidx"))
    build_index(spark, corpus, root, n_buckets=1, ranks=ranks)
    rank_of = {r["conv_id"]: r["rank"] for r in ranks.collect()}
    by_conv: dict[str, list] = {}
    for r in rows:
        by_conv.setdefault(r["conv_id"], []).append(r)
    docs = {
        cid: assemble([(r["turn_idx"], r["text"]) for r in turns])
        for cid, turns in by_conv.items()
    }
    term_roles: dict[str, dict[str, set]] = {}
    for cid, turns in by_conv.items():
        m: dict[str, set] = {}
        for r in turns:
            roles = {r["role"]}
            if (r["tool"] or "") != "":
                roles.add("tool")
            for tok in tokenize(r["text"]):
                m.setdefault(tok, set()).update(roles)
        term_roles[cid] = m
    return IndexReader(spark, IndexPaths(root)), docs, term_roles, rank_of


def _engine(reader, query, ranking, k=15):
    return [
        (r["conv_id"], round(r["score"], 9))
        for r in run_query(reader, query, k=k, ranking=ranking).collect()
    ]


@pytest.mark.parametrize("query", ["word00 word03", "word01", "word02 word05"])
def test_flag_bm25_matches_numpy_oracle(spark, built, query):
    reader, docs, term_roles, _ = built
    include = query.split()
    want = [
        (cid, round(s, 9))
        for cid, s in bm25_rank(docs, include, k=15, term_roles=term_roles)
    ]
    got = _engine(reader, query, RankingParams(flag_score=True))
    assert [c for c, _ in got] == [c for c, _ in want]
    for (gc, gs), (wc, ws) in zip(got, want):
        assert gs == pytest.approx(ws, abs=1e-9), (gc, wc)


def test_flag_bm25_changes_ranking_somewhere(spark, built):
    """The flag term must actually discriminate on a role-varied corpus."""
    reader, *_ = built
    plain = _engine(reader, "word00 word03", None, k=50)
    flagged = _engine(reader, "word00 word03", RankingParams(flag_score=True), k=50)
    assert [c for c, _ in plain] != [c for c, _ in flagged]


@pytest.mark.parametrize("query", ["word00 word03", "word04"])
def test_penalties_match_numpy_oracle(spark, built, query):
    reader, docs, _, rank_of = built
    include = query.split()
    want = [
        (cid, round(s, 9))
        for cid, s in bm25_rank(docs, include, k=15, ranks=rank_of)
    ]
    got = _engine(reader, query, RankingParams(penalties=True))
    assert [c for c, _ in got] == [c for c, _ in want]
    for (gc, gs), (wc, ws) in zip(got, want):
        assert gs == pytest.approx(ws, abs=1e-9), (gc, wc)


def _role_weight(role: str, has_tool: bool) -> float:
    if role == "system":
        return 2.5
    if role == "tool" or has_tool:
        return 1.25
    return 1.0


@pytest.mark.parametrize("query", ["word00 word03", "word02"])
def test_weighted_counts_match_numpy_oracle(spark, built, query):
    """Role-span-weighted BM25 counts (the reference's tag-weighted c) vs a
    brute-force per-turn recomputation."""
    reader, docs, _, _ = built
    corpus_rows = bm25_corpus(spark, 200).collect()
    wc: dict[str, dict[str, float]] = {}
    for r in corpus_rows:
        w = _role_weight(r["role"], (r["tool"] or "") != "")
        m = wc.setdefault(r["conv_id"], {})
        for tok in tokenize(r["text"]):
            m[tok] = m.get(tok, 0.0) + w
    include = query.split()
    want = [
        (cid, round(s, 9))
        for cid, s in bm25_rank(docs, include, k=15, weighted_counts=wc)
    ]
    got = _engine(reader, query, RankingParams(weighted_counts=True))
    assert [c for c, _ in got] == [c for c, _ in want]
    for (gc, gs), (wc_, ws) in zip(got, want):
        assert gs == pytest.approx(ws, abs=1e-9), (gc, wc_)


def test_flags_and_penalties_compose(spark, built):
    reader, docs, term_roles, rank_of = built
    want = [
        (cid, round(s, 9))
        for cid, s in bm25_rank(
            docs, ["word00", "word03"], k=15, term_roles=term_roles, ranks=rank_of
        )
    ]
    got = _engine(
        reader,
        "word00 word03",
        RankingParams(flag_score=True, penalties=True),
    )
    assert [c for c, _ in got] == [c for c, _ in want]
