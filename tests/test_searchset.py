"""Search sets: set:<name> token, RankingSearchSet builder + persistence.

Reference semantics pinned here: top-depth selection with the (score desc,
id) tie pin (SearchSetsService.recalculateNormal → calculate(depth, ...)),
write/load lifecycle (RankingSearchSet.write/load), the empty-set-matches-
everything quirk (RankingSearchSet.contains), and the query-time membership
gate being equivalent to an explicit conv: restriction.
"""

import pytest
from pyspark.sql import functions as F

from marginaliasearch_spark.operators.index_build import IndexPaths, build_index
from marginaliasearch_spark.operators.query_exec import IndexReader, run_query
from marginaliasearch_spark.operators.searchset import (
    explicit_search_set,
    load_search_set,
    ranking_search_set,
    write_search_set,
)
from marginaliasearch_spark.sources.transcripts import factor_corpus


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    corpus = factor_corpus(spark, 128).cache()
    root = str(tmp_path_factory.mktemp("setidx"))
    build_index(spark, corpus, root, n_buckets=1)
    return root, IndexReader(spark, IndexPaths(root))


def test_ranking_search_set_top_depth(spark):
    scores = spark.createDataFrame(
        [(5, 90), (1, 100), (2, 100), (3, 40), (4, 70)], "id long, score long"
    )
    got = {r["conv_id"] for r in ranking_search_set(scores, depth=3).collect()}
    # score desc, id asc tiebreak → 1, 2 (tied at 100), then 5
    assert got == {"1", "2", "5"}


def test_write_load_roundtrip(spark, built):
    root, reader = built
    members = spark.createDataFrame(
        [("conv3",), ("conv7",), ("conv3",)], "conv_id string"
    )
    write_search_set(explicit_search_set(members), root, "trio")
    loaded = load_search_set(spark, root, "trio")
    assert {r["conv_id"] for r in loaded.collect()} == {"conv3", "conv7"}


def test_missing_and_empty_sets_impose_no_constraint(spark, built):
    root, reader = built
    base = {r["conv_id"] for r in run_query(reader, "factor2", k=100).collect()}
    # missing set: load → None; query matches everything (contains() quirk)
    assert load_search_set(spark, root, "ghost") is None
    got = {
        r["conv_id"]
        for r in run_query(reader, "factor2 set:ghost", k=100).collect()
    }
    assert got == base
    # persisted-but-empty set: same no-constraint behavior
    empty = spark.createDataFrame([], "conv_id string")
    write_search_set(empty, root, "void")
    assert load_search_set(spark, root, "void") is None


def test_set_gate_equals_explicit_conv_filter(spark, built):
    root, reader = built
    want = ["conv12", "conv24", "conv36"]
    write_search_set(
        explicit_search_set(
            spark.createDataFrame([(c,) for c in want], "conv_id string")
        ),
        root,
        "twelves",
    )
    reader._searchset_cache.clear()
    via_set = run_query(reader, "factor2 set:twelves", k=50)
    via_conv = run_query(
        reader, "factor2 " + " ".join(f"conv:{c}" for c in want), k=50
    )
    assert sorted(map(tuple, via_set.collect())) == sorted(
        map(tuple, via_conv.collect())
    )
    assert {r["conv_id"] for r in via_set.collect()} <= set(want)


def test_set_intersects_with_conv_filter(spark, built):
    root, reader = built
    write_search_set(
        explicit_search_set(
            spark.createDataFrame(
                [("conv12",), ("conv24",)], "conv_id string"
            )
        ),
        root,
        "pair",
    )
    reader._searchset_cache.clear()
    got = {
        r["conv_id"]
        for r in run_query(
            reader, "factor2 set:pair conv:conv24 conv:conv36", k=50
        ).collect()
    }
    assert got == {"conv24"}


def test_nonmember_set_empties_result(spark, built):
    root, reader = built
    write_search_set(
        explicit_search_set(
            spark.createDataFrame([("no_such_conv",)], "conv_id string")
        ),
        root,
        "strangers",
    )
    reader._searchset_cache.clear()
    assert run_query(reader, "factor2 set:strangers", k=10).count() == 0


def test_invalid_set_name_rejected(spark, built):
    root, _ = built
    with pytest.raises(ValueError):
        load_search_set(spark, root, "../escape")


def test_invalid_set_name_in_query_is_no_constraint(spark, built):
    """A user-typed set: name outside [a-z0-9_] (e.g. 'set:my-blogs') is
    just an unloadable set — the reference treats those as imposing no
    constraint (RankingSearchSet.java:73-82), never a query error. The
    write-path traversal guard must not surface to run_query."""
    root, reader = built
    base = {r["conv_id"] for r in run_query(reader, "factor2", k=100).collect()}
    got = {
        r["conv_id"]
        for r in run_query(reader, "factor2 set:my-blogs", k=100).collect()
    }
    assert got == base


def test_pagerank_set_builder_matches_topk(spark):
    """ranking_search_set over pagerank scores = the ids of pagerank_topk
    (same tie pin), i.e. the builder selects exactly the top-depth ranked
    nodes the reference's accumulator would collect."""
    from marginaliasearch_spark.operators import ranking

    nodes = spark.createDataFrame([(i,) for i in range(12)], "id long")
    edges = spark.createDataFrame(
        [(i, (i * 5 + 1) % 12) for i in range(12)]
        + [(i, 0) for i in range(1, 12, 3)],
        "src long, dst long",
    )
    scores = ranking.pagerank(nodes, edges, iterations=3)
    set_ids = {
        r["conv_id"] for r in ranking_search_set(scores, depth=4).collect()
    }
    top_ids = {
        str(r["id"]) for r in ranking.pagerank_topk(scores, k=4).collect()
    }
    assert set_ids == top_ids
