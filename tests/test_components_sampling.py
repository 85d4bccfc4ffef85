"""Connected-components clustering and deterministic sampling tests.

Components: star contraction must agree with a driver-side union-find on
random graphs (including worst-case path graphs, where naive neighbor
propagation needs O(diameter) rounds). Sampling: assignments must be pure
functions of the id — stable under repartitioning and under corpus growth —
and stratified quotas must be hit exactly.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from marginaliasearch_spark.operators import dedup, sampling


def _union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min id in component
    return {x: find(x) for x in parent}


def _check(spark, pairs):
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    got = {
        r["doc_id"]: r["component"]
        for r in dedup.connected_components(df).collect()
    }
    assert got == _union_find(pairs)


def test_components_two_clusters(spark):
    _check(spark, [(1, 2), (2, 3), (3, 1), (10, 11)])


def test_components_path_graph(spark):
    # worst-case diameter: 0-1-2-...-40 in shuffled edge order
    rng = np.random.default_rng(3)
    edges = [(i, i + 1) for i in range(40)]
    rng.shuffle(edges)
    _check(spark, [(int(a), int(b)) for a, b in edges])


def test_components_random_vs_union_find(spark):
    rng = np.random.default_rng(11)
    for trial in range(3):
        n = 60
        m = int(rng.integers(20, 80))
        pairs = []
        seen = set()
        while len(pairs) < m:
            a, b = int(rng.integers(n)), int(rng.integers(n))
            if a == b or (a, b) in seen:
                continue
            seen.add((a, b))
            pairs.append((a, b))
        _check(spark, pairs)


def test_components_partitioning_invariant(spark):
    pairs = [(i, i + 1) for i in range(0, 30, 2)] + [(0, 29)]
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    a = sorted(map(tuple, dedup.connected_components(df).collect()))
    b = sorted(
        map(tuple, dedup.connected_components(df.repartition(7)).collect())
    )
    assert a == b


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"doc number {i} " + "filler " * (i % 5)) for i in range(500)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hash_split_stable_under_growth(spark, docs):
    """Adding documents never moves an existing one (pure id hash)."""
    full = {
        r["doc_id"]: r["split"]
        for r in sampling.hash_split(docs).select("doc_id", "split").collect()
    }
    half = {
        r["doc_id"]: r["split"]
        for r in sampling.hash_split(docs.filter(F.col("doc_id") < 250))
        .select("doc_id", "split")
        .collect()
    }
    assert all(full[k] == v for k, v in half.items())
    # 98/1/1 weights: train dominates, all splits present at n=500
    from collections import Counter

    c = Counter(full.values())
    assert set(c) == {"train", "val", "test"}
    assert c["train"] > 400


def test_split_summary_accounts_for_every_doc(spark, docs):
    out = sampling.split_summary(docs).collect()
    assert sum(r["n_docs"] for r in out) == 500
    assert sum(r["id_checksum"] for r in out) == sum(range(500))


def test_stratified_sample_exact_quota(spark):
    rows = [(i, "en" if i % 3 else "de") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = sampling.stratified_sample(df, fraction=0.1, strata_col="lang")
    got = out.groupBy("lang").count().collect()
    counts = {r["lang"]: r["count"] for r in got}
    assert counts == {"en": 20, "de": 10}  # ceil(200*.1), ceil(100*.1)


def test_stratified_sample_deterministic(spark):
    rows = [(i, "s") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    s1 = sorted(
        r["doc_id"]
        for r in sampling.stratified_sample(df, 0.2, "lang").collect()
    )
    s2 = sorted(
        r["doc_id"]
        for r in sampling.stratified_sample(
            df.repartition(13), 0.2, "lang"
        ).collect()
    )
    assert s1 == s2 and len(s1) == 20
