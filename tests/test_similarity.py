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


class TestQuantized:
    def test_roundtrip_error_bounded(self, spark, emb):
        """Dequantized values are within half a quantization step of the
        originals and the extreme element hits exactly ±127."""
        df, vecs = emb
        rows = similarity.quantize_embeddings(df).collect()
        by_id = {r["vec_id"]: r for r in rows}
        for i in (0, 42, 250):
            r = by_id[i]
            q = np.asarray(r["qvec"], dtype=np.float64)
            orig = vecs[i].astype(np.float64)
            scale = float(r["scale"])
            assert np.abs(q).max() == 127
            assert np.abs(q * scale - orig).max() <= scale / 2 + 1e-12

    def test_matches_numpy_reference(self, spark, emb):
        """Engine top-k == a pure-numpy reimplementation of the identical
        quantize + integer-cosine arithmetic (value-exact, not approx)."""
        df, vecs = emb
        q = vecs[42].astype(np.float64).tolist()
        got = [
            (r["vec_id"], r["qcosine"])
            for r in similarity.quantized_cosine_topk(
                similarity.quantize_embeddings(df), q, k=10
            ).collect()
        ]
        v = vecs.astype(np.float64)
        am = np.abs(v).max(axis=1, keepdims=True)
        qm = np.sign(v) * np.floor(np.abs(v) / (am / 127.0) + 0.5)
        qm = qm.astype(np.int64)
        qq, qnorm = similarity.quantize_vector(q)
        dots = (qm * qq[None, :]).sum(axis=1)
        nrm = np.sqrt((qm * qm).sum(axis=1).astype(np.float64))
        cos = np.round(dots.astype(np.float64) / (nrm * qnorm), 6)
        order = np.lexsort((np.arange(len(v)), -cos))[:10]
        want = [(int(i), float(cos[i])) for i in order]
        assert got == want

    def test_quantized_close_to_exact(self, spark, emb):
        """int8 cosine is a tight approximation: top-10 recall vs the
        float path ≥ 0.7 and the planted near-dup is still top-1."""
        df, vecs = emb
        q = vecs[250].astype(np.float64).tolist()
        qemb = similarity.quantize_embeddings(df)
        approx = similarity.quantized_cosine_topk(qemb, q, k=10).collect()
        exact = {r["vec_id"] for r in similarity.cosine_topk(df, q, k=10).collect()}
        assert approx[0]["vec_id"] == 250  # self
        assert approx[1]["vec_id"] == 251  # planted near-dup
        assert len({r["vec_id"] for r in approx} & exact) >= 7

    def test_zero_vector_guard(self, spark):
        df = spark.createDataFrame(
            [(1, [0.0] * 4), (2, [1.0, 2.0, -2.0, 0.5])],
            "vec_id long, embedding array<float>",
        )
        rows = {
            r["vec_id"]: r for r in similarity.quantize_embeddings(df).collect()
        }
        assert list(rows[1]["qvec"]) == [0, 0, 0, 0]
        assert list(rows[2]["qvec"]) == [64, 127, -127, 32]
        top = similarity.quantized_cosine_topk(
            similarity.quantize_embeddings(df), [1.0, 2.0, -2.0, 0.5], k=2
        ).collect()
        assert top[0]["vec_id"] == 2 and top[0]["qcosine"] == 1.0
        assert top[1]["qcosine"] == -2.0  # zero vector sentinel sorts last

    def test_matches_duckdb_oracle(self, spark, emb):
        import duckdb

        from marginaliasearch_spark.functions.sql_oracles import quantized_topk_sql

        df, vecs = emb
        q = vecs[7].astype(np.float64).tolist()
        got = [
            (r["vec_id"], r["qcosine"])
            for r in similarity.quantized_cosine_topk(
                similarity.quantize_embeddings(df), q, k=10
            ).collect()
        ]
        con = duckdb.connect()
        con.register(
            "embeddings_src",
            __import__("pandas").DataFrame(
                {"vec_id": range(len(vecs)), "embedding": [v.tolist() for v in vecs]}
            ),
        )
        con.execute("CREATE VIEW embeddings AS SELECT * FROM embeddings_src")
        want = [
            (int(a), float(c))
            for a, c in con.execute(quantized_topk_sql(q, k=10, dim=DIM)).fetchall()
        ]
        assert got == want


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


class TestKMeans:
    """Lattice k-means: exact oracle parity, layout determinism, the
    empty-cluster carry rule, and the Lloyd improvement property."""

    def _duck(self, vecs):
        import duckdb
        import pandas as pd

        con = duckdb.connect()
        con.register(
            "embeddings_src",
            pd.DataFrame(
                {"vec_id": range(len(vecs)), "embedding": [v.tolist() for v in vecs]}
            ),
        )
        con.execute("CREATE VIEW embeddings AS SELECT * FROM embeddings_src")
        return con

    def test_matches_duckdb_oracle(self, spark, emb):
        from marginaliasearch_spark.functions.sql_oracles import kmeans_sql

        df, vecs = emb
        got = sorted(
            (r["vec_id"], r["cluster"], r["d2"])
            for r in similarity.kmeans_assign(df, k=5, iters=2).collect()
        )
        want = sorted(
            (int(a), int(b), int(c))
            for a, b, c in self._duck(vecs).execute(
                kmeans_sql(k=5, iters=2)
            ).fetchall()
        )
        assert got == want

    def test_partition_layout_invariant(self, spark, emb):
        df, _ = emb
        a = sorted(map(tuple, similarity.kmeans_assign(df, k=5).collect()))
        b = sorted(
            map(tuple, similarity.kmeans_assign(df.repartition(13), k=5).collect())
        )
        assert a == b

    def test_iterations_do_not_worsen_cost(self, spark, emb):
        # Lloyd with EXACT means is monotone, but the integer lattice
        # floors each updated centroid coordinate by δ ∈ [0,1), which can
        # RAISE cost by up to Σ_points Σ_dims (2|x−c*| + δ²) per update —
        # a 1-d counterexample: points {0,1,1}, centroid 1 (cost 1)
        # updates to floor(2/3)=0 (cost 2). Assert monotonicity up to the
        # Cauchy-Schwarz bound on that requantization term, not exactly.
        df, _ = emb
        c0 = similarity.kmeans_assign(df, k=5, iters=0)
        c2 = similarity.kmeans_assign(df, k=5, iters=2)
        s0 = c0.agg(F.sum("d2")).first()[0]
        s2 = c2.agg(F.sum("d2")).first()[0]
        n = df.count()
        dims = len(df.first()["embedding"])
        slack = 2 * (s0 * n * dims) ** 0.5 + n * dims
        assert s2 <= s0 + slack, (s2, s0, slack)

    def test_empty_cluster_keeps_previous_centroid(self, spark):
        # 1 far outlier + a tight blob, k=3: at least one init centroid
        # ends up empty after reassignment; the run must still produce k
        # valid cluster ids and every point must get exactly one row
        rows = [(0, [100.0, 100.0])] + [
            (i, [0.001 * i, -0.001 * i]) for i in range(1, 40)
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        out = similarity.kmeans_assign(df, k=3, iters=3).collect()
        assert len(out) == 40
        assert {r["cluster"] for r in out} <= {0, 1, 2}
        # the outlier sits alone in its own cluster
        solo = [r["cluster"] for r in out if r["vec_id"] == 0][0]
        assert sum(1 for r in out if r["cluster"] == solo) == 1

    def test_oracle_parity_on_blob_corpus(self, spark):
        from marginaliasearch_spark.functions.sql_oracles import kmeans_sql

        rng = np.random.default_rng(7)
        vecs = np.concatenate(
            [rng.standard_normal((30, 8)) + c * 5 for c in range(3)]
        ).astype(np.float32)
        df = spark.createDataFrame(
            [(i, v.tolist()) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<float>",
        )
        got = sorted(
            map(tuple, similarity.kmeans_assign(df, k=3, iters=3).collect())
        )
        want = sorted(
            (int(a), int(b), int(c))
            for a, b, c in self._duck(vecs).execute(
                kmeans_sql(k=3, iters=3)
            ).fetchall()
        )
        assert got == want

    def test_trained_ivf_matches_exact_on_blob_corpus(self, spark):
        # 3 well-separated blobs: Lloyd-trained centroids recover the blob
        # structure, so nprobe=1 over trained lists already contains the
        # exact cosine top-k (the md5-sampled init has no such guarantee)
        rng = np.random.default_rng(3)
        offs = np.eye(3, 8) * 6.0
        vecs = np.concatenate(
            [rng.standard_normal((40, 8)) * 0.3 + o for o in offs]
        ).astype(np.float32)
        df = spark.createDataFrame(
            [(i, v.tolist()) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<float>",
        )
        q = (vecs[5] + 0.01).tolist()
        exact = [r["vec_id"] for r in similarity.cosine_topk(df, q, k=5).collect()]
        trained = similarity.kmeans_centroids(df, k=3, iters=3)
        got = [
            r["vec_id"]
            for r in similarity.ivf_topk(
                df, q, k=5, nprobe=1, centroids=trained
            ).collect()
        ]
        assert got == exact

    def test_semantic_kmeans_dedup_drops_planted_duplicate(self, spark, emb):
        """SemDeDup, paper shape: k-means clusters bound the pair join;
        the planted 250/251 near-identical pair shares a cluster (argmin
        of near-equal lattice points), so canonicalize keeps only 250."""
        from marginaliasearch_spark.operators import dedup

        df, _ = emb
        pairs = similarity.kmeans_neardup_pairs(
            df, threshold=0.95, k=4, iters=2
        ).select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"))
        kept = {
            r["vec_id"]
            for r in dedup.canonicalize(
                df.select("vec_id"), pairs, id_col="vec_id"
            ).collect()
        }
        assert 250 in kept and 251 not in kept

    def test_kmeans_pairs_subset_of_brute_force(self, spark, emb):
        """Every emitted pair really has cosine >= τ (the cluster bound
        may MISS cross-cluster pairs — the paper's approximation — but
        must never emit a false positive)."""
        df, vecs = emb
        got = similarity.kmeans_neardup_pairs(df, threshold=0.9, k=4).collect()
        v = vecs.astype(np.float64)
        for r in got:
            a, b = v[r["id_a"]], v[r["id_b"]]
            cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
            assert cos >= 0.9 - 1e-9

    def test_zero_vector_never_pairs(self, spark):
        """A zero embedding (how hash_embed_documents encodes token-free
        docs) has no direction: 0/0 = NaN, and Spark's NaN-is-greatest
        ordering would make `NaN >= τ` TRUE without the norm guard —
        pairing the empty doc with its whole cluster and letting
        canonicalize delete real documents."""
        rng = np.random.default_rng(5)
        rows = [(i, rng.standard_normal(8).tolist()) for i in range(20)]
        rows.append((99, [0.0] * 8))
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        got = similarity.kmeans_neardup_pairs(df, threshold=0.9, k=2).collect()
        assert all(r["id_a"] != 99 and r["id_b"] != 99 for r in got)


class TestProductQuantization:
    """PQ codebooks/codes/ADC: exact oracle parity, layout determinism,
    code-shape invariants, and recall of a planted duplicate."""

    def _duck(self, vecs):
        import duckdb
        import pandas as pd

        con = duckdb.connect()
        con.register(
            "embeddings_src",
            pd.DataFrame(
                {"vec_id": range(len(vecs)), "embedding": [v.tolist() for v in vecs]}
            ),
        )
        con.execute("CREATE VIEW embeddings AS SELECT * FROM embeddings_src")
        return con

    def _pipeline(self, df, q, m=4, ksub=4, iters=2, k=10):
        cents = similarity.pq_train(df, m=m, ksub=ksub, iters=iters)
        codes = similarity.pq_encode(df, cents, m=m)
        return similarity.pq_topk(codes, cents, q, k=k)

    def test_matches_duckdb_oracle(self, spark, emb):
        from marginaliasearch_spark.functions.sql_oracles import pq_topk_sql

        df, vecs = emb
        q = vecs[42].astype(np.float64).tolist()
        got = [tuple(r) for r in self._pipeline(df, q).collect()]
        want = [
            (int(a), int(b))
            for a, b in self._duck(vecs)
            .execute(pq_topk_sql(q, k=10, m=4, ksub=4, iters=2, dim=DIM))
            .fetchall()
        ]
        assert got == want

    def test_partition_layout_invariant(self, spark, emb):
        df, vecs = emb
        q = vecs[7].astype(np.float64).tolist()
        a = [tuple(r) for r in self._pipeline(df, q).collect()]
        b = [tuple(r) for r in self._pipeline(df.repartition(13), q).collect()]
        assert a == b

    def test_code_shape(self, spark, emb):
        df, _ = emb
        cents = similarity.pq_train(df, m=4, ksub=4, iters=1)
        codes = similarity.pq_encode(df, cents, m=4)
        rows = codes.collect()
        assert len(rows) == 300
        for r in rows:
            assert len(r["codes"]) == 4
            assert all(0 <= c < 4 for c in r["codes"])

    def test_planted_duplicate_shares_codes_and_ranks(self, spark, emb):
        # 250/251 differ by ~1% noise: under any reasonable codebook they
        # quantize to the same cell per subspace, so querying with 250's
        # own vector must surface both in the ADC top-10
        df, vecs = emb
        q = vecs[250].astype(np.float64).tolist()
        cents = similarity.pq_train(df, m=4, ksub=4, iters=2)
        codes = {r["vec_id"]: list(r["codes"])
                 for r in similarity.pq_encode(df, cents, m=4).collect()}
        assert codes[250] == codes[251]
        top = {r["vec_id"]
               for r in similarity.pq_topk(
                   similarity.pq_encode(df, cents, m=4), cents, q, k=10
               ).collect()}
        assert {250, 251} <= top


class TestIVFPQ:
    """IVFADC: oracle parity, layout determinism, and the probe-restriction
    contract (results come only from probed cells)."""

    def _duck(self, vecs):
        import duckdb
        import pandas as pd

        con = duckdb.connect()
        con.register(
            "embeddings_src",
            pd.DataFrame(
                {"vec_id": range(len(vecs)), "embedding": [v.tolist() for v in vecs]}
            ),
        )
        con.execute("CREATE VIEW embeddings AS SELECT * FROM embeddings_src")
        return con

    def test_matches_duckdb_oracle(self, spark, emb):
        from marginaliasearch_spark.functions.sql_oracles import ivfpq_topk_sql

        df, vecs = emb
        q = vecs[42].astype(np.float64).tolist()
        got = [
            tuple(r)
            for r in similarity.ivfpq_topk(
                df, q, k=10, coarse_k=4, nprobe=2, m=4, ksub=4, iters=2
            ).collect()
        ]
        want = [
            (int(a), int(b))
            for a, b in self._duck(vecs)
            .execute(
                ivfpq_topk_sql(
                    q, k=10, coarse_k=4, nprobe=2, m=4, ksub=4, iters=2, dim=DIM
                )
            )
            .fetchall()
        ]
        assert got == want

    def test_partition_layout_invariant(self, spark, emb):
        df, vecs = emb
        q = vecs[7].astype(np.float64).tolist()
        kw = dict(k=10, coarse_k=4, nprobe=2, m=4, ksub=4, iters=1)
        a = [tuple(r) for r in similarity.ivfpq_topk(df, q, **kw).collect()]
        b = [
            tuple(r)
            for r in similarity.ivfpq_topk(df.repartition(13), q, **kw).collect()
        ]
        assert a == b

    def test_results_come_from_probed_cells_only(self, spark, emb):
        # nprobe = coarse_k degenerates to scanning every cell: the top-k
        # ids from a restricted probe must be a subset of the full-probe
        # candidate ORDER at equal-or-worse rank positions
        df, vecs = emb
        q = vecs[100].astype(np.float64).tolist()
        full = [
            r["vec_id"]
            for r in similarity.ivfpq_topk(
                df, q, k=300, coarse_k=4, nprobe=4, m=4, ksub=4, iters=1
            ).collect()
        ]
        narrow = {
            r["vec_id"]
            for r in similarity.ivfpq_topk(
                df, q, k=300, coarse_k=4, nprobe=1, m=4, ksub=4, iters=1
            ).collect()
        }
        assert narrow < set(full)
        # with every cell probed the scan covers the whole corpus
        assert len(full) == 300


class TestHashEmbed:
    """Feature-hashing BoW embeddings: oracle parity (bitwise), the
    zero-vector contract for token-free docs, unit norm, and duplicate
    texts mapping to identical vectors."""

    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_matches_duckdb_oracle_bitwise(self, spark):
        import duckdb
        import pandas as pd
        from marginaliasearch_spark.functions.sql_oracles import hash_embed_sql

        rows = [
            (0, "alpha beta beta gamma"),
            (1, "Alpha, beta! beta gamma"),   # same tokens after cleaning
            (2, "delta epsilon zeta eta theta iota"),
            (3, "   "),                        # token-free
            (4, "kappa"),
        ]
        df = self._docs(spark, rows)
        got = {r["doc_id"]: list(r["embedding"])
               for r in similarity.hash_embed_documents(df, dim=16).collect()}
        con = duckdb.connect()
        con.register("documents_src", pd.DataFrame(rows, columns=["doc_id", "text"]))
        con.execute("CREATE VIEW documents AS SELECT * FROM documents_src")
        want = {r[0]: list(r[1]) for r in con.execute(hash_embed_sql(16)).fetchall()}
        assert got == want  # bitwise: both sides are ints / pinned IEEE ops

    def test_contracts(self, spark):
        rows = [
            (0, "alpha beta beta gamma"),
            (1, "Alpha, beta! beta gamma"),
            (3, ""),
        ]
        df = self._docs(spark, rows)
        got = {r["doc_id"]: list(r["embedding"])
               for r in similarity.hash_embed_documents(df, dim=32).collect()}
        assert got[0] == got[1]                       # cleaner-equal texts
        assert got[3] == [0.0] * 32                    # token-free -> zero
        assert abs(sum(v * v for v in got[0]) - 1.0) < 1e-12  # unit norm

    def test_feeds_kmeans_pipeline(self, spark):
        # the bridge property: hashed embeddings drive the k-means
        # operators directly (dedup_semantic_text composition)
        rows = [(i, f"common base words plus w{i % 3}") for i in range(30)]
        df = self._docs(spark, rows)
        emb = similarity.hash_embed_documents(df, dim=16)
        out = similarity.kmeans_assign(
            emb, k=3, iters=2, id_col="doc_id"
        ).collect()
        assert len(out) == 30
        # identical texts land in identical clusters
        by_text = {}
        for r in out:
            by_text.setdefault(r["doc_id"] % 3, set()).add(r["cluster"])
        assert all(len(v) == 1 for v in by_text.values())
