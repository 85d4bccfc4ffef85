"""Similarity search over an embedding column (``array<float>``).

- ``cosine_topk``        — exact brute-force top-k for a query vector
                           (JVM-side ``aggregate``/``zip_with`` dot product:
                           no Python in the scan);
- ``lsh_bucket_topk``    — random-hyperplane LSH variant: candidates come
                           from matching sign-bucket(s) only, the scale path
                           (probes partition-prunable bucket keys);
- ``ivf_topk``           — IVF-style: k-means-lite centroids (seeded,
                           deterministic), probe the ``nprobe`` nearest
                           inverted lists;
- ``embedding_neardup_pairs`` — pairwise cosine ≥ τ via LSH bucket join.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot_expr(col, qvec: list[float]):
    """JVM dot product of an array<float> column with a literal vector."""
    q = F.array(*[F.lit(float(x)) for x in qvec])
    return F.aggregate(
        F.zip_with(col, q, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm_expr(col):
    return F.sqrt(
        F.aggregate(col, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_scores(
    emb: DataFrame, qvec: list[float], id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    qnorm = float(np.linalg.norm(np.asarray(qvec, dtype=np.float64)))
    return emb.select(
        F.col(id_col),
        (
            _dot_expr(F.col(vec_col), qvec)
            / (_norm_expr(F.col(vec_col)) * F.lit(qnorm))
        ).alias("cosine"),
    )


def cosine_topk(
    emb: DataFrame,
    qvec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k — the correctness baseline.

    The scan is one narrow map stage (whole-stage codegen) + TakeOrdered;
    no shuffle. At 100 TB this is the query you run when recall must be 1.0.
    """
    return (
        cosine_scores(emb, qvec, id_col, vec_col)
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


# --- random-hyperplane LSH ---------------------------------------------------


def _hyperplanes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def _sign_bucket(vecs: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (vecs @ planes.T) > 0
    weights = (1 << np.arange(planes.shape[0], dtype=np.int64))[None, :]
    return (bits * weights).sum(axis=1)


def add_lsh_bucket(
    emb: DataFrame,
    dim: int,
    n_planes: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
) -> DataFrame:
    """Append a sign-pattern bucket column (the IVF/LSH partition key).

    At scale the embeddings table is written partitioned by this column, so
    a probe reads only matching partitions (partition pruning on a computed
    key — same trick as term buckets in the inverted index).
    """
    planes = _hyperplanes(dim, n_planes, seed)

    def batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            vecs = np.stack(pdf[vec_col].to_numpy())
            other = {c: pdf[c] for c in pdf.columns}
            yield pd.DataFrame({**other, "bucket": _sign_bucket(vecs, planes)})

    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in emb.schema)
    return emb.mapInPandas(batch, schema=f"{fields}, bucket long")


def lsh_bucket_topk(
    emb_with_bucket: DataFrame,
    qvec: list[float],
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
    multiprobe_hamming: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: scan only buckets within ``multiprobe_hamming`` of
    the query's sign pattern, then exact cosine on the survivors."""
    q = np.asarray(qvec, dtype=np.float64)
    planes = _hyperplanes(q.size, n_planes, seed)
    qb = int(_sign_bucket(q[None, :], planes)[0])
    probes = {qb}
    if multiprobe_hamming >= 1:
        probes.update(qb ^ (1 << i) for i in range(n_planes))
    if multiprobe_hamming >= 2:
        probes.update(
            qb ^ (1 << i) ^ (1 << j)
            for i in range(n_planes)
            for j in range(i + 1, n_planes)
        )
    cands = emb_with_bucket.filter(F.col("bucket").isin(sorted(probes)))
    return cosine_topk(cands, qvec, k, id_col, vec_col)


def ivf_topk(
    emb: DataFrame,
    qvec: list[float],
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_size: int = 2048,
) -> DataFrame:
    """IVF: assign vectors to seeded-sample centroids (one k-means++-ish
    pass), probe the nprobe nearest lists. Deterministic, two narrow scans."""
    sample = np.stack(
        [
            np.asarray(r[vec_col], dtype=np.float64)
            for r in emb.select(vec_col).limit(sample_size).collect()
        ]
    )
    rng = np.random.default_rng(seed)
    idx = rng.choice(sample.shape[0], size=min(n_centroids, sample.shape[0]), replace=False)
    centroids = sample[idx]
    cn = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)

    def assign(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            vecs = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            vn = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    vec_col: pdf[vec_col],
                    "list_id": np.argmax(vn @ cn.T, axis=1).astype(np.int32),
                }
            )

    dim = len(qvec)
    assigned = emb.select(id_col, vec_col).mapInPandas(
        assign, schema=f"{id_col} long, {vec_col} array<float>, list_id int"
    )
    q = np.asarray(qvec, dtype=np.float64)
    qn = q / np.linalg.norm(q)
    probe_lists = np.argsort(-(cn @ qn))[:nprobe].tolist()
    cands = assigned.filter(F.col("list_id").isin(probe_lists))
    return cosine_topk(cands, qvec, k, id_col, vec_col)


def embedding_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    dim: int = 64,
    n_planes: int = 6,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """cosine ≥ τ pairs via LSH-bucket self-join + exact verification."""
    b = add_lsh_bucket(emb.select(id_col, vec_col), dim, n_planes, seed, vec_col)
    a_df = b.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"), "bucket"
    )
    b_df = b.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"), "bucket"
    )
    pairs = a_df.join(b_df, "bucket").filter(F.col("id_a") < F.col("id_b"))
    dot = F.aggregate(
        F.zip_with(F.col("vec_a"), F.col("vec_b"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cos = dot / (_norm_expr(F.col("vec_a")) * _norm_expr(F.col("vec_b")))
    return (
        pairs.withColumn("cosine", cos)
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
        .dropDuplicates(["id_a", "id_b"])
    )
