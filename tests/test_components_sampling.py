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


def test_temperature_mix_quotas(spark):
    # 400 en / 25 de: alpha=.5, scale=2 -> en ceil(2*20)=40, de ceil(2*5)=10;
    # tiny stratum capped at its size when the quota exceeds it
    rows = [(i, "en" if i < 400 else ("de" if i < 425 else "xx"))
            for i in range(427)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = sampling.temperature_mix(df, "lang", alpha=0.5, scale=2.0)
    counts = {r["lang"]: r["count"] for r in out.groupBy("lang").count().collect()}
    assert counts == {"en": 40, "de": 10, "xx": 2}  # xx: min(2, ceil(2*sqrt(2))=3)


def test_temperature_mix_subset_of_stratified_order(spark):
    # same salt construction => the chosen docs are a prefix of the
    # per-stratum hash order, so growing scale only ADDS documents
    rows = [(i, "s") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    small = {r["doc_id"] for r in sampling.temperature_mix(df, "lang", scale=1.0).collect()}
    big = {r["doc_id"] for r in sampling.temperature_mix(df, "lang", scale=3.0).collect()}
    assert small < big


def _brute_pack(rows, budget, salt="pack-v1"):
    import hashlib

    def h(i):
        return int(hashlib.md5(f"{salt}:{i}".encode()).hexdigest()[:15], 16)

    order = sorted(rows, key=lambda r: (h(r[0]), r[0]))
    cum, out = 0, {}
    for i, text in order:
        tok = len(text.split())
        out[i] = (tok, cum // budget, (cum + max(tok - 1, 0)) // budget,
                  cum % budget)
        cum += tok
    return out


def test_pack_sequences_brute_force(spark):
    rows = [(i, "w " * (1 + i % 17)) for i in range(300)]
    want = _brute_pack(rows, 64)
    got = {
        r["doc_id"]: (r["n_tokens"], r["seq_first"], r["seq_last"],
                      r["seq_offset"])
        for r in sampling.pack_sequences(
            spark.createDataFrame(rows, "doc_id long, text string"), budget=64
        ).collect()
    }
    assert got == want
    # some doc must straddle a sequence boundary for the test to bite
    assert any(f != l for (_, f, l, _) in got.values())


def test_pack_sequences_invariant_to_buckets_and_partitioning(spark):
    rows = [(i, "tok " * (1 + i % 9)) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, sampling.pack_sequences(df, 128, n_buckets=3).collect()))
    b = sorted(map(tuple, sampling.pack_sequences(
        df.repartition(11), 128, n_buckets=8).collect()))
    assert a == b


def test_pack_sequences_budget_respected(spark):
    # no document may claim an offset >= budget, and every sequence index
    # range must be consistent with its token count
    rows = [(i, "x " * (1 + i % 30)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for r in sampling.pack_sequences(df, budget=32).collect():
        assert 0 <= r["seq_offset"] < 32
        span = r["seq_last"] - r["seq_first"]
        assert span == (r["seq_offset"] + max(r["n_tokens"] - 1, 0)) // 32


def test_canonicalize_keeps_min_per_cluster(spark):
    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in range(10)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(1, 4), (4, 7), (2, 3)], "doc_a long, doc_b long"
    )
    kept = sorted(
        r["doc_id"] for r in dedup.canonicalize(docs, pairs).collect()
    )
    # clusters {1,4,7} -> keep 1; {2,3} -> keep 2; singletons survive
    assert kept == [0, 1, 2, 5, 6, 8, 9]


class TestChunkDocuments:
    def _mirror(self, text, max_tokens, overlap):
        toks = text.split()
        n = len(toks)
        if n == 0:
            return []
        stride = max_tokens - overlap
        n_chunks = 1 if n <= max_tokens else (n - max_tokens + stride - 1) // stride + 1
        out = []
        for i in range(n_chunks):
            c = toks[i * stride : i * stride + max_tokens]
            out.append((i, len(c), " ".join(c)))
        return out

    @pytest.mark.parametrize("max_tokens,overlap", [(8, 2), (8, 0), (4, 3)])
    def test_matches_python_mirror(self, spark, max_tokens, overlap):
        from marginaliasearch_spark.operators.sampling import chunk_documents

        texts = [
            "",  # no chunks
            "one",  # single short chunk
            " ".join(f"t{i}" for i in range(max_tokens)),  # exactly max
            " ".join(f"t{i}" for i in range(max_tokens + 1)),  # one over
            " ".join(f"w{i}" for i in range(37)),
            "  padded   whitespace   tokens  ",
        ]
        docs = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        got = sorted(
            (r["doc_id"], r["chunk_idx"], r["n_tokens"], r["chunk_text"])
            for r in chunk_documents(docs, max_tokens, overlap).collect()
        )
        want = sorted(
            (i, idx, n, t)
            for i, text in enumerate(texts)
            for idx, n, t in self._mirror(text, max_tokens, overlap)
        )
        assert got == want

    def test_full_coverage_and_overlap(self, spark):
        """Every token appears in some chunk; consecutive chunks share
        exactly `overlap` tokens (except a short last chunk)."""
        from marginaliasearch_spark.operators.sampling import chunk_documents

        text = " ".join(f"w{i}" for i in range(100))
        docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
        rows = sorted(
            chunk_documents(docs, 16, 4).collect(), key=lambda r: r["chunk_idx"]
        )
        seen = set()
        for r in rows:
            seen.update(r["chunk_text"].split())
        assert seen == {f"w{i}" for i in range(100)}
        for a, b in zip(rows, rows[1:]):
            ta, tb = a["chunk_text"].split(), b["chunk_text"].split()
            shared = set(ta) & set(tb)
            assert len(shared) == min(4, len(tb)), (a, b)

    def test_rejects_bad_overlap(self, spark):
        from marginaliasearch_spark.operators.sampling import chunk_documents

        docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with pytest.raises(ValueError):
            chunk_documents(docs, 8, 8)


class TestEpochOrder:
    def test_matches_brute_force_permutation(self, spark):
        """Positions are exactly the hash-order ranks a driver-side sort
        produces — the two-pass prefix sum introduces no approximation."""
        import hashlib

        ids = list(range(137))
        df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
        got = {
            r["doc_id"]: r["pos"]
            for r in sampling.epoch_order(df, seed="epoch-7").collect()
        }

        def h(i):
            return int(
                hashlib.md5(f"epoch-7:{i}".encode()).hexdigest()[:15], 16
            )

        want = {
            i: p for p, i in enumerate(sorted(ids, key=lambda i: (h(i), i)))
        }
        assert got == want

    def test_invariant_to_bucket_count(self, spark):
        """The permutation is a pure function of (seed, id): any bucket
        count — including 1 and more-buckets-than-rows — yields identical
        positions (the cluster-size-portability property)."""
        df = spark.createDataFrame([(i,) for i in range(101)], "doc_id long")
        ref = sorted(
            sampling.epoch_order(df, n_buckets=1).collect()
        )
        for p in (3, 16, 257):
            assert sorted(sampling.epoch_order(df, n_buckets=p).collect()) == ref

    def test_distinct_seeds_distinct_orders(self, spark):
        df = spark.createDataFrame([(i,) for i in range(64)], "doc_id long")
        a = {r["doc_id"]: r["pos"] for r in sampling.epoch_order(df, "epoch-0").collect()}
        b = {r["doc_id"]: r["pos"] for r in sampling.epoch_order(df, "epoch-1").collect()}
        assert a != b
        # both are bijections onto 0..N-1
        assert sorted(a.values()) == list(range(64))
        assert sorted(b.values()) == list(range(64))


class TestLengthBuckets:
    @staticmethod
    def _brute_ntile(rows, k):
        """(doc_id, text) -> {doc_id: bucket} with SQL ntile semantics."""
        order = sorted(
            ((len(t.split()), i) for i, t in rows),
        )
        n = len(order)
        q, r = divmod(n, k)
        out = {}
        for pos, (_, i) in enumerate(order):  # pos 0-based
            if pos < r * (q + 1):
                out[i] = pos // (q + 1) + 1
            else:
                out[i] = r + (pos - r * (q + 1)) // q + 1
        return out

    def test_matches_brute_force_with_ties(self, spark):
        """Heavily tied lengths (few distinct counts) still rank exactly;
        bucket sizes follow ntile (first N mod k buckets one larger)."""
        rows = [(i, " ".join(["w"] * (i % 5 + 1))) for i in range(103)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: r["bucket"]
            for r in sampling.length_buckets(df, n_buckets=4).collect()
        }
        assert got == self._brute_ntile(rows, 4)

    def test_more_buckets_than_rows(self, spark):
        """k > N (q = 0): row j lands alone in bucket j+1, like SQL ntile."""
        rows = [(i, " ".join(["w"] * (i + 1))) for i in range(3)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: r["bucket"]
            for r in sampling.length_buckets(df, n_buckets=8).collect()
        }
        assert got == {0: 1, 1: 2, 2: 3}

    def test_giant_same_length_group(self, spark):
        """The realistic worst case — 90% of docs share one length (the
        chunk_documents output shape) — still ranks exactly; the id-range
        sub-buckets keep it from being one serialized sort."""
        rows = [(i + 1000, "w " * 7) for i in range(450)]
        rows += [(i, " ".join(["v"] * (i % 9 + 1))) for i in range(50)]
        rows = [(i, t.strip()) for i, t in rows]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: r["bucket"]
            for r in sampling.length_buckets(df, n_buckets=7).collect()
        }
        assert got == self._brute_ntile(rows, 7)

    def test_null_text_counts_as_empty(self, spark):
        """A NULL text row is the empty document (0 tokens, lowest rank
        block) — never a crash, never engine-dependent NULL ordering."""
        rows = [(1, "a b c"), (2, None), (3, "a")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: (r["n_tokens"], r["bucket"])
            for r in sampling.length_buckets(df, n_buckets=3).collect()
        }
        assert got == {2: (0, 1), 3: (1, 2), 1: (3, 3)}

    def test_rejects_bad_inputs(self, spark):
        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with pytest.raises(ValueError):
            sampling.length_buckets(df, n_buckets=0)
        null_id = spark.createDataFrame(
            [(None, "x")], "doc_id long, text string"
        )
        with pytest.raises(ValueError, match="NULL"):
            sampling.length_buckets(null_id, n_buckets=2)


def test_epoch_order_rejects_null_ids(spark):
    df = spark.createDataFrame([(1,), (None,)], "doc_id long")
    with pytest.raises(ValueError, match="NULL"):
        sampling.epoch_order(df)
