"""Similarity-search tests: exact baseline recovers planted neighbors, ANN
variants (LSH bucket probe, IVF lists) achieve useful recall against the
exact top-k, and the embedding near-dup join finds planted duplicates."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from marginaliasearch_spark.operators import similarity

DIM = 32


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((300, DIM)).astype(np.float32)
    # planted near-duplicate pair: 900/901 almost identical
    vecs[251] = vecs[250] + rng.standard_normal(DIM).astype(np.float32) * 0.01
    rows = [(i, v.tolist()) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df.cache(), vecs


def test_exact_top1_is_planted_neighbor(spark, emb):
    df, vecs = emb
    q = (vecs[42] + 0.05 * np.random.default_rng(1).standard_normal(DIM)).tolist()
    top = similarity.cosine_topk(df, q, k=1).collect()
    assert top[0]["vec_id"] == 42


@pytest.mark.parametrize("variant", ["lsh", "ivf"])
def test_ann_recall_vs_exact(spark, emb, variant):
    df, vecs = emb
    rng = np.random.default_rng(3)
    recalls = []
    for trial in range(5):
        q = vecs[int(rng.integers(0, 300))].astype(np.float64)
        q = (q + 0.1 * rng.standard_normal(DIM)).tolist()
        exact = {r["vec_id"] for r in similarity.cosine_topk(df, q, k=10).collect()}
        if variant == "lsh":
            with_b = similarity.add_lsh_bucket(df, DIM, n_planes=6)
            approx = {
                r["vec_id"]
                for r in similarity.lsh_bucket_topk(
                    with_b, q, k=10, n_planes=6, multiprobe_hamming=2
                ).collect()
            }
        else:
            approx = {
                r["vec_id"]
                for r in similarity.ivf_topk(
                    df, q, k=10, n_centroids=8, nprobe=4
                ).collect()
            }
        recalls.append(len(exact & approx) / 10.0)
    assert np.mean(recalls) >= 0.5, recalls


def test_ivf_partition_invariant(spark, emb):
    """Centroid sampling is md5-keyed (not limit()-order-dependent), so the
    IVF answer must be byte-identical at any partition layout — the same
    determinism-at-any-parallelism invariant the index build carries."""
    df, vecs = emb
    q = vecs[7].astype(np.float64).tolist()
    r1 = similarity.ivf_topk(df.repartition(1), q, k=5, n_centroids=8).collect()
    r8 = similarity.ivf_topk(df.repartition(8), q, k=5, n_centroids=8).collect()
    assert r1 == r8


def test_neardup_pairs_find_planted(spark, emb):
    df, _ = emb
    pairs = similarity.embedding_neardup_pairs(
        df, threshold=0.95, dim=DIM, n_planes=4
    ).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (250, 251) in found
    for r in pairs:
        assert r["cosine"] >= 0.95


class TestKnnJoin:
    def test_planted_pair_is_mutual_top1(self, spark, emb):
        df, _ = emb
        knn = similarity.knn_join(df, k=1, dim=DIM, n_planes=4).collect()
        top1 = {r["vec_id"]: r["neighbor_id"] for r in knn}
        assert top1[250] == 251 and top1[251] == 250

    def test_at_most_k_rows_per_vec_and_no_self(self, spark, emb):
        df, _ = emb
        knn = similarity.knn_join(df, k=3, dim=DIM, n_planes=4).collect()
        per = {}
        for r in knn:
            assert r["vec_id"] != r["neighbor_id"]
            per.setdefault(r["vec_id"], []).append(r["cosine"])
        assert all(len(v) <= 3 for v in per.values())
        # within a vec the list is rank-ordered
        assert all(v == sorted(v, reverse=True) for v in per.values())

    def test_collision_witness_unique_no_dup_pairs(self, spark, emb):
        """Each candidate pair must appear exactly once before the window
        (the XOR mask uniquely witnesses the pair's bucket distance) —
        otherwise row_number would rank duplicates."""
        df, _ = emb
        knn = similarity.knn_join(df, k=10**6, dim=DIM, n_planes=4)
        pairs = knn.groupBy("vec_id", "neighbor_id").count()
        assert pairs.filter(F.col("count") > 1).count() == 0

    def test_matches_duckdb_oracle(self, spark, emb):
        import duckdb

        from marginaliasearch_spark.functions.sql_oracles import knn_join_sql

        df, vecs = emb
        got = sorted(
            (r["vec_id"], r["neighbor_id"], r["cosine"])
            for r in similarity.knn_join(df, k=3, dim=DIM, n_planes=4).collect()
        )
        con = duckdb.connect()
        con.register(
            "embeddings_src",
            __import__("pandas").DataFrame(
                {"vec_id": range(len(vecs)), "embedding": [v.tolist() for v in vecs]}
            ),
        )
        con.execute("CREATE VIEW embeddings AS SELECT * FROM embeddings_src")
        want = sorted(
            (int(a), int(b), float(c))
            for a, b, c in con.execute(
                knn_join_sql(k=3, dim=DIM, n_planes=4)
            ).fetchall()
        )
        assert got == want

    def test_recall_vs_exact_knn(self, spark, emb):
        """Hamming-1 multiprobe at 16 buckets over 300 docs should recover
        most of the true top-3 for most vectors (approximation sanity)."""
        df, vecs = emb
        v = vecs.astype(np.float64)
        v = v / np.linalg.norm(v, axis=1, keepdims=True)
        sims = v @ v.T
        np.fill_diagonal(sims, -np.inf)
        true_top3 = np.argsort(-sims, axis=1)[:, :3]
        knn = similarity.knn_join(df, k=3, dim=DIM, n_planes=4).collect()
        got: dict[int, set] = {}
        for r in knn:
            got.setdefault(r["vec_id"], set()).add(r["neighbor_id"])
        hits = sum(
            len(got.get(i, set()) & set(true_top3[i].tolist()))
            for i in range(len(v))
        )
        assert hits / (3 * len(v)) > 0.5


def test_semantic_dedup_drops_planted_duplicate(spark, emb):
    """SemDeDup composition: near-dup pairs → components → canonicalize
    keeps the smaller id of the planted 250/251 duplicate pair."""
    from marginaliasearch_spark.operators import dedup

    df, _ = emb
    pairs = similarity.embedding_neardup_pairs(
        df, threshold=0.95, dim=DIM, n_planes=4
    ).select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"))
    kept = {
        r["vec_id"]
        for r in dedup.canonicalize(
            df.select("vec_id"), pairs, id_col="vec_id"
        ).collect()
    }
    assert 250 in kept and 251 not in kept
