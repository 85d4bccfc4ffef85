"""Fixed-point integer PageRank (operators/ranking.py) vs a pure-Python
integer reference, plus personalized / dangling / invariance properties.

Reference behavior mirrored: PageRankDomainRanker.java (rank indices down
the sorted score list), PersonalizedPageRank.java (teleport restricted to
the influence set), LinkGraphSource.java (edges to unknown vertices are
dropped)."""

import pytest
from pyspark.sql import functions as F

from marginaliasearch_spark.operators import ranking

SCALE = 10**12


def ref_pagerank(n_ids, edge_list, iterations, scale=SCALE, influence=None):
    """Pure-Python-int twin of ranking.pagerank (exact, arbitrary precision)."""
    nodes = sorted(set(n_ids))
    edges = sorted({(u, v) for u, v in edge_list if u in set(nodes) and v in set(nodes)})
    outdeg = {}
    for u, _ in edges:
        outdeg[u] = outdeg.get(u, 0) + 1
    tset = sorted(set(influence)) if influence is not None else nodes
    base = (15 * scale * len(nodes)) // (100 * len(tset))
    s = {i: scale for i in nodes}
    for _ in range(iterations):
        d = sum((85 * s[u]) // 100 for u in nodes if u not in outdeg)
        d_share = d // len(tset)
        nxt = {i: (base + d_share if i in set(tset) else 0) for i in nodes}
        for u, v in edges:
            nxt[v] += (85 * s[u]) // (100 * outdeg[u])
        s = nxt
    return s


@pytest.fixture()
def star_graph(spark):
    """0..9; 1..8 all link to 0 (hub); 0 and 9 are dangling."""
    nodes = spark.createDataFrame([(i,) for i in range(10)], ["id"])
    edge_list = [(i, 0) for i in range(1, 9)]
    edges = spark.createDataFrame(edge_list, ["src", "dst"])
    return nodes, edges, list(range(10)), edge_list


def _collect_scores(df):
    return {r["id"]: r["score"] for r in df.collect()}


class TestPagerank:
    def test_matches_integer_reference(self, spark, star_graph):
        nodes, edges, n_ids, edge_list = star_graph
        got = _collect_scores(ranking.pagerank(nodes, edges, iterations=4))
        assert got == ref_pagerank(n_ids, edge_list, 4)

    def test_hub_ranks_first_and_rank_indices(self, spark, star_graph):
        nodes, edges, _, _ = star_graph
        top = ranking.pagerank_topk(
            ranking.pagerank(nodes, edges, iterations=4), k=3
        ).collect()
        assert [r["rank"] for r in top] == [0, 1, 2]
        assert top[0]["id"] == 0  # the hub
        assert top[1]["id"] == 1  # 1..9 are symmetric; ties break on id
        assert top[0]["score"] > top[1]["score"] == top[2]["score"]

    def test_edges_to_unknown_vertices_dropped(self, spark, star_graph):
        """LinkGraphSource.java:30-36 containsVertex guard."""
        nodes, edges, n_ids, edge_list = star_graph
        noisy = edges.union(
            spark.createDataFrame([(0, 999), (999, 0), (998, 997)], ["src", "dst"])
        )
        got = _collect_scores(ranking.pagerank(nodes, noisy, iterations=3))
        assert got == ref_pagerank(n_ids, edge_list, 3)
        assert 999 not in got

    def test_personalized_teleport_restricted(self, spark, star_graph):
        nodes, edges, n_ids, edge_list = star_graph
        got = _collect_scores(
            ranking.pagerank(nodes, edges, iterations=4, influence=[9])
        )
        assert got == ref_pagerank(n_ids, edge_list, 4, influence=[9])
        # all teleport + dangling mass lands on node 9; nodes with no
        # in-links and no teleport decay to zero
        assert got[9] > got[2] == 0

    def test_partitioning_invariance(self, spark, star_graph):
        nodes, edges, _, _ = star_graph
        a = _collect_scores(ranking.pagerank(nodes, edges, iterations=4))
        b = _collect_scores(
            ranking.pagerank(nodes.repartition(7), edges.repartition(5), iterations=4)
        )
        assert a == b

    def test_zero_iterations_is_init_mass(self, spark, star_graph):
        nodes, edges, _, _ = star_graph
        got = _collect_scores(ranking.pagerank(nodes, edges, iterations=0))
        assert got == {i: SCALE for i in range(10)}

    def test_duplicate_edges_collapse(self, spark, star_graph):
        nodes, edges, n_ids, edge_list = star_graph
        got = _collect_scores(
            ranking.pagerank(nodes, edges.union(edges), iterations=3)
        )
        assert got == ref_pagerank(n_ids, edge_list, 3)


def test_ranks_from_scores_buckets(spark):
    scores = spark.createDataFrame(
        [(i, 1000 - i) for i in range(64)], ["id", "score"]
    )
    ranks = {r["conv_id"]: r["rank"] for r in ranking.ranks_from_scores(scores).collect()}
    assert ranks[0] == 0 and ranks[63] == 63  # best score → rank 0
    assert sorted(ranks.values()) == list(range(64))
