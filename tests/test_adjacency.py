"""Website-adjacency similarity graph (ranking.adjacency_similarities) vs
a brute-force pure-Python replica of the reference algorithm.

Reference behavior mirrored: WebsiteAdjacenciesCalculator.java
(two-stage cheap→weighted cosine, card>10 driving gate, cardMin
candidate gate, 128-cap), AdjacenciesData.java (self-inclusive vectors,
card<10000 eligibility, 1/ln(2+card) weights, weight 1.0 for sources
without a vector), SparseBitVector.java (weightedProduct/mulAndSum).

The replica iterates ALL eligible pairs brute-force, while the engine
only aggregates co-source pairs — their equality is also the proof that
the candidate generation (the reference's sToDMap walk) loses nothing:
any pair passing the cheap filter shares at least one source.
"""

import math
from collections import defaultdict

import pytest

from marginaliasearch_spark.operators.ranking import adjacency_similarities


def ref_adjacencies(
    edge_list, max_card=10_000, min_card=10, threshold=0.1, top_k=128
):
    """Pure-Python brute-force twin (float64, ascending-src sum order)."""
    raw = defaultdict(set)
    for s, d in edge_list:
        raw[d].add(s)
        raw[d].add(d)  # createBitmapWithSelf
    vec = {d: v for d, v in raw.items() if len(v) < max_card}

    def weight(i):
        v = vec.get(i)
        return 1.0 / math.log(2 + len(v)) if v is not None else 1.0

    def wsum(ids):
        acc = 0.0
        for s in sorted(ids):
            acc += weight(s)
        return acc

    out = {}
    order = {}
    for a, va in vec.items():
        if not len(va) > min_card:
            continue
        sims = []
        for b, vb in vec.items():
            if b == a or len(vb) < max(2, int(0.01 * len(va))):
                continue
            and_card = len(va & vb)
            if (and_card / math.sqrt(len(va))) / math.sqrt(
                len(vb)
            ) <= threshold:
                continue
            val = wsum(va & vb) / math.sqrt(wsum(va) * wsum(vb))
            if val > threshold:
                sims.append((b, val))
        sims.sort(key=lambda t: (-t[1], t[0]))
        for b, v in sims[:top_k]:
            out[(a, b)] = v
            order[(a, b)] = len([x for x in sims[:top_k] if x[0] <= b])
    return out


def community_edges():
    """Three 40-node communities (cards ~21), a hub dest, a pure source,
    self-loops. Node ids 0..119; hub=200; pure source=300."""
    edges = []
    for c in range(3):
        lo = c * 40
        for d in range(lo, lo + 40):
            for s in range(lo, lo + 40):
                if s != d and (s + d) % 2 == 0:
                    edges.append((s, d))
    # sparse cross-community bridges
    for i in range(0, 120, 17):
        edges.append((i, (i + 40) % 120))
    # hub dest: receives from every community node
    edges += [(i, 200) for i in range(120)]
    # pure source: links out, never a dest
    edges += [(300, i) for i in range(0, 120, 11)]
    # self loops (must be absorbed)
    edges += [(5, 5), (200, 200)]
    return edges


@pytest.fixture(scope="module")
def adj_edges(spark):
    el = community_edges()
    return el, spark.createDataFrame(el, ["src", "dst"])


def _collect(df):
    return {
        (r["domain_id"], r["neighbor_id"]): (r["relatedness"], r["value"])
        for r in df.collect()
    }


class TestAdjacency:
    def test_matches_brute_force(self, spark, adj_edges):
        el, edges = adj_edges
        got = _collect(adjacency_similarities(edges))
        ref = ref_adjacencies(el)
        assert set(got) == set(ref)
        assert got  # non-degenerate
        for pair, val in ref.items():
            rel, v6 = got[pair]
            assert abs(v6 - round(val, 6)) <= 1e-6, pair
            assert rel == round(100 * val), pair

    def test_symmetric_clusters_drive_both_directions(
        self, spark, adj_edges
    ):
        _, edges = adj_edges
        got = _collect(adjacency_similarities(edges))
        flipped = {(b, a) for (a, b) in got}
        # community structure is symmetric; the hub (card 121) breaks
        # symmetry only through the cardMin gate, which our cards don't hit
        assert flipped == set(got)

    def test_top_k_cap_keeps_highest(self, spark, adj_edges):
        el, edges = adj_edges
        capped = _collect(adjacency_similarities(edges, top_k=3))
        full = ref_adjacencies(el)
        per_domain = defaultdict(list)
        for (a, b), v in full.items():
            per_domain[a].append((b, v))
        expect = {}
        for a, sims in per_domain.items():
            sims.sort(key=lambda t: (-t[1], t[0]))
            for b, v in sims[:3]:
                expect[(a, b)] = v
        assert set(capped) == set(expect)

    def test_max_card_eligibility(self, spark, adj_edges):
        el, edges = adj_edges
        # hub card = 121 (+self): max_card=100 removes its vector entirely
        # AND flips its source weight to 1.0 — replica applies both
        got = _collect(adjacency_similarities(edges, max_card=100))
        ref = ref_adjacencies(el, max_card=100)
        assert set(got) == set(ref)
        assert not any(200 in pair for pair in got)
        for pair, val in ref.items():
            assert abs(got[pair][1] - round(val, 6)) <= 1e-6

    def test_min_card_driving_gate(self, spark, adj_edges):
        el, edges = adj_edges
        # raising min_card above the community card (21) silences all
        # community domains as DRIVERS; the hub (121) still drives
        got = _collect(adjacency_similarities(edges, min_card=30))
        assert set(got) == set(ref_adjacencies(el, min_card=30))
        assert all(a == 200 for (a, _) in got) or not got

    def test_self_loops_absorbed(self, spark, adj_edges):
        el, edges = adj_edges
        no_loops = spark.createDataFrame(
            [e for e in el if e[0] != e[1]], ["src", "dst"]
        )
        assert _collect(adjacency_similarities(no_loops)) == _collect(
            adjacency_similarities(edges)
        )

    def test_partitioning_invariance(self, spark, adj_edges):
        _, edges = adj_edges
        a = _collect(adjacency_similarities(edges))
        b = _collect(adjacency_similarities(edges.repartition(17)))
        assert a == b
