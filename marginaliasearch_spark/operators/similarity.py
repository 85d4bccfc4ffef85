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
- ``embedding_neardup_pairs`` — pairwise cosine ≥ τ via LSH bucket join;
- ``knn_join``           — every vector's top-k neighbors (kNN graph /
                           SemDeDup primitive) via multiprobe bucket join
                           + one row_number window;
- ``quantize_embeddings`` / ``quantized_cosine_topk`` — symmetric int8
                           scalar quantization (4× scan-byte reduction)
                           and exact-integer-arithmetic cosine over it;
- ``kmeans_assign``      — distributed Lloyd k-means on an integer lattice
                           (order-free int64 arithmetic → byte-identical at
                           any parallelism); the SemDeDup cluster step and
                           the proper IVF list trainer.
- ``pq_train`` / ``pq_encode`` / ``pq_topk`` — product quantization
                           (Jégou et al. 2011): per-subspace lattice
                           k-means codebooks, m-byte codes per vector,
                           asymmetric-distance (ADC) top-k via a
                           codebook-sized lookup table — the 100 TB
                           serving tier where even int8 vectors don't fit.
- ``ivfpq_topk``         — IVFADC: coarse lattice cells + PQ on the cell
                           residuals, probing only the nprobe nearest
                           cells (FAISS's default architecture), all on
                           the integer lattice so residuals are exact.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot_expr(col, qvec: list[float]):
    """JVM dot product of an array<float> column with a literal vector.

    Elements are widened to double BEFORE multiplying — the DuckDB oracles
    cast each element to DOUBLE, and an f32 product can land a boundary
    pair on the other side of an unrounded >= threshold filter."""
    q = F.array(*[F.lit(float(x)) for x in qvec])
    return F.aggregate(
        F.zip_with(col, q, lambda a, b: a.cast("double") * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm_expr(col):
    return F.sqrt(
        F.aggregate(
            col,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
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


def _seq_dots(vecs: np.ndarray, w: np.ndarray) -> np.ndarray:
    """Row-wise dot products accumulated strictly left-to-right in float64.

    Not ``vecs @ w`` (BLAS blocks/reorders the summation): the DuckDB
    correctness oracles re-express the same dot as an explicit left-assoc
    ``e[1]*w1 + e[2]*w2 + ...`` chain, and sign/argmax decisions must land
    identically on both sides, so the accumulation order is pinned.
    Still vectorized across rows (one fused multiply-add per dimension).
    """
    vecs = np.asarray(vecs, dtype=np.float64)
    w = np.asarray(w, dtype=np.float64)
    acc = vecs[:, 0] * w[0]
    for i in range(1, w.size):
        acc = acc + vecs[:, i] * w[i]
    return acc


def _sign_bucket(vecs: np.ndarray, planes: np.ndarray) -> np.ndarray:
    out = np.zeros(np.asarray(vecs).shape[0], dtype=np.int64)
    for j in range(planes.shape[0]):
        out |= (_seq_dots(vecs, planes[j]) > 0).astype(np.int64) << np.int64(j)
    return out


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
    probes = lsh_probe_set(qvec, n_planes, seed, multiprobe_hamming)
    cands = emb_with_bucket.filter(F.col("bucket").isin(probes))
    return cosine_topk(cands, qvec, k, id_col, vec_col)


def lsh_probe_set(
    qvec: list[float],
    n_planes: int = 8,
    seed: int = 42,
    multiprobe_hamming: int = 1,
) -> list[int]:
    """The (deterministic) bucket ids a query probes — driver-side only,
    shared with the DuckDB oracle generator."""
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
    return sorted(probes)


def md5_order_col(id_col: str) -> F.Column:
    """Deterministic pseudo-random sort key: first 60 bits of md5(id).

    Partition-layout-independent (unlike ``limit()`` sampling) and
    SQL-mirrorable (DuckDB: ``('0x'||substr(md5(id::VARCHAR),1,15))::UBIGINT``).
    """
    return F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10
    ).cast("long")


def ivf_centroids(
    emb: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[np.ndarray, np.ndarray]:
    """(centroid ids, centroid vectors) — the ``n_centroids`` vectors with
    the smallest (md5-hash, id) keys, returned in ascending-id order.

    A deterministic uniform sample that is byte-identical at any
    parallelism / partition layout — ``limit()`` without an order is not
    (it returns whichever partitions answer first).
    """
    rows = (
        emb.select(id_col, vec_col)
        .withColumn("_h", md5_order_col(id_col))
        .orderBy("_h", id_col)
        .limit(n_centroids)
        .collect()
    )
    rows.sort(key=lambda r: r[id_col])
    cids = np.array([r[id_col] for r in rows], dtype=np.int64)
    cents = np.array(
        [[float(x) for x in r[vec_col]] for r in rows], dtype=np.float64
    )
    return cids, cents


def ivf_topk(
    emb: DataFrame,
    qvec: list[float],
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: tuple[np.ndarray, np.ndarray] | None = None,
) -> DataFrame:
    """IVF: assign vectors to deterministically-sampled centroids, probe the
    ``nprobe`` nearest inverted lists, exact cosine on the survivors.

    Fully deterministic at any partition layout (centroid choice is
    md5-keyed, assignment argmax tie-breaks on ascending centroid id) and
    float-order-pinned (``_seq_dots``) so the DuckDB oracle reproduces the
    identical candidate lists. Assumes no all-zero vectors (no norm guard —
    the oracle has none either).

    ``centroids`` overrides the md5 sample with a pre-trained
    (ids, float64 vectors) pair — e.g. ``kmeans_centroids(...)`` for
    Lloyd-trained inverted lists (higher recall at the same ``nprobe``).
    """
    if centroids is not None:
        cids, cents = centroids
        cids = np.asarray(cids, dtype=np.int64)
        cents = np.asarray(cents, dtype=np.float64)
    else:
        cids, cents = ivf_centroids(emb, n_centroids, id_col, vec_col)
    ones = np.ones(cents.shape[1])
    # sqrt of the left-assoc chain of squares (x*1.0 is exact, so feeding
    # the squares through _seq_dots pins the same summation order as the
    # oracle's `e[1]*e[1] + e[2]*e[2] + ...` SQL chain)
    cn = np.sqrt(_seq_dots(cents * cents, ones))
    q = np.asarray(qvec, dtype=np.float64)
    qnorm = float(np.sqrt(_seq_dots((q * q)[None, :], ones)[0]))
    # probe ranking mirrors the oracle: dot/(cn*qnorm) desc, centroid id asc
    cq = _seq_dots(cents, q) / (cn * qnorm)
    order = np.lexsort((cids, -cq))
    probe_ids = [int(cids[j]) for j in order[:nprobe]]

    def assign(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            vecs = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            nv = np.sqrt(_seq_dots(vecs * vecs, np.ones(vecs.shape[1])))
            cos = np.empty((vecs.shape[0], cents.shape[0]))
            for j in range(cents.shape[0]):
                cos[:, j] = _seq_dots(vecs, cents[j]) / (nv * cn[j])
            best = np.argmax(cos, axis=1)  # first max = smallest cid on ties
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    vec_col: pdf[vec_col],
                    "list_id": cids[best],
                }
            )

    assigned = emb.select(id_col, vec_col).mapInPandas(
        assign, schema=f"{id_col} long, {vec_col} array<float>, list_id long"
    )
    cands = assigned.filter(F.col("list_id").isin(probe_ids))
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
        F.zip_with(
            F.col("vec_a"),
            F.col("vec_b"),
            lambda x, y: x.cast("double") * y.cast("double"),
        ),
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


def knn_join(
    emb: DataFrame,
    k: int = 3,
    dim: int = 64,
    n_planes: int = 6,
    seed: int = 42,
    probe_hamming: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Every vector's top-k cosine neighbors (the kNN-graph / SemDeDup
    primitive) via a Hamming-≤h multiprobe LSH bucket join.

    Scale shape: NOT all-pairs — each vector joins only the buckets within
    Hamming distance ``probe_hamming`` of its own sign pattern (h+1 probe
    rows per vector for h=1), so the candidate volume is Σ_bucket
    |bucket|·|probe neighborhood|, bounded by bucket geometry, and the
    equi-join on the bucket key shuffles/partition-prunes like any other
    key. The per-vector top-k is one ``row_number`` window (single shuffle
    on the left id). Skew guard: a hot bucket (embedding mass collapsed to
    one orthant) is split by raising ``n_planes`` — the same remedy as
    adding IVF centroids.

    Determinism / oracle parity: bucket assignment uses the order-pinned
    float chains (`_seq_dots`), cosine is computed in double with the
    left-assoc fold the SQL twin replicates, the rank orders by the
    ROUNDED cosine with ``neighbor_id`` as tie-break, and each candidate
    pair collides in EXACTLY ONE probe bucket (a XOR mask is a unique
    witness of the pair's bucket Hamming distance), so no dedup is needed
    and ``sql_oracles.knn_join_sql`` reproduces the result set verbatim.
    """
    if probe_hamming not in (0, 1, 2):
        raise ValueError("probe_hamming must be 0, 1 or 2")
    b = add_lsh_bucket(emb.select(id_col, vec_col), dim, n_planes, seed, vec_col)
    probes = [F.col("bucket")]
    if probe_hamming >= 1:
        probes += [
            F.col("bucket").bitwiseXOR(F.lit(1 << j)) for j in range(n_planes)
        ]
    if probe_hamming >= 2:
        probes += [
            F.col("bucket").bitwiseXOR(F.lit((1 << i) | (1 << j)))
            for i in range(n_planes)
            for j in range(i + 1, n_planes)
        ]
    left = b.select(
        F.col(id_col).alias("_id_a"),
        F.col(vec_col).alias("vec_a"),
        F.explode(F.array(*probes)).alias("bucket"),
    )
    right = b.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vec_b"), "bucket"
    )
    pairs = left.join(right, "bucket").filter(F.col("_id_a") != F.col("neighbor_id"))
    dot = F.aggregate(
        F.zip_with(
            F.col("vec_a"),
            F.col("vec_b"),
            lambda x, y: x.cast("double") * y.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cos = F.round(
        dot / (_norm_expr(F.col("vec_a")) * _norm_expr(F.col("vec_b"))), 6
    )
    w = Window.partitionBy("_id_a").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        pairs.withColumn("cosine", cos)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(F.col("_id_a").alias(id_col), "neighbor_id", "cosine")
    )


# --- int8 scalar quantization ------------------------------------------------


def quantize_embeddings(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Per-vector symmetric int8 quantization: ``q_i = round(x_i / scale)``
    with ``scale = max|x| / 127`` — the standard 4× memory reduction that
    makes a 100 TB float32 embedding corpus fit the ANN serving tier.

    Pure JVM column expressions (aggregate for max-abs, transform for the
    rounding), no shuffle. The rounded values are integers in [-127, 127]
    stored as ``array<tinyint>``; cosine over quantized vectors needs no
    dequantization at all — the per-vector scales cancel:
    ``cos_q(a,b) = Σ qa·qb / (|qa|·|qb|)`` is pure integer arithmetic up
    to the final division, which is why the quantized ANN path is exactly
    reproducible in any engine (no float-summation-order pinning needed).

    Rounding is the explicit half-away-from-zero formula
    ``sign(v) · floor(|v|/scale + 0.5)`` — every step an IEEE double op
    that numpy and DuckDB replicate bit-identically (``F.round`` would go
    through BigDecimal-of-shortest-string, a cross-engine hazard; max is
    order-independent so the fold needs no ``_seq_dots`` pinning).
    """
    absmax = F.aggregate(
        F.col(vec_col),
        F.lit(0.0),
        lambda acc, v: F.greatest(acc, F.abs(v.cast("double"))),
    )
    # absmax is materialized as its own column BEFORE the transform — left
    # nested inside the lambda it would re-run the d-element fold for every
    # element (O(d²) per row); referenced ≥2× it is non-cheap enough that
    # CollapseProject keeps the stacked Project split.
    with_m = emb.select(F.col(id_col), F.col(vec_col), absmax.alias("_absmax"))
    scale = F.col("_absmax") / F.lit(127.0)
    q = F.transform(
        F.col(vec_col),
        lambda v: F.when(F.col("_absmax") == 0, F.lit(0))
        .otherwise(
            F.floor(F.abs(v.cast("double")) / scale + F.lit(0.5))
            * F.when(v < 0, F.lit(-1)).otherwise(F.lit(1))
        )
        .cast("tinyint"),
    )
    return with_m.select(
        F.col(id_col),
        scale.alias("scale"),
        q.alias("qvec"),
    )


def quantize_vector(qvec: list[float]) -> tuple[np.ndarray, float]:
    """Driver-side twin of :func:`quantize_embeddings` for one vector:
    (int64 quantized values, integer L2 norm as float). Shared with the
    DuckDB oracle generator so both engines see the same literal ints."""
    q = np.asarray(qvec, dtype=np.float64)
    am = float(np.abs(q).max()) if q.size else 0.0
    if am > 0:
        scaled = np.abs(q) / (am / 127.0)
        # sign·floor(|v|/scale + 0.5): same IEEE op sequence as the
        # engine's transform() lambda (np.round is half-to-even and
        # would diverge on exact .5 quotients)
        qq = (np.sign(q) * np.floor(scaled + 0.5)).astype(np.int64)
    else:
        qq = np.zeros(q.size, dtype=np.int64)
    return qq, float(np.sqrt(float((qq * qq).sum())))


def quantized_cosine_topk(
    qemb: DataFrame,
    qvec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Brute-force top-k by quantized cosine against a float query vector
    (quantized with the same rule). Same narrow-scan + TakeOrdered shape
    as :func:`cosine_topk`, but the scan reads 1/4 the bytes and the dot
    product is integer multiply-adds — the bandwidth-bound regime's win.
    """
    qq, qnorm = quantize_vector(qvec)
    v = F.col("qvec")
    dot = F.aggregate(
        F.zip_with(
            v,
            F.array(*[F.lit(int(c)) for c in qq]),
            lambda a, b: a.cast("long") * b,
        ),
        F.lit(0).cast("long"),
        lambda acc, t: acc + t,
    )
    sumsq = F.aggregate(
        v,
        F.lit(0).cast("long"),
        lambda acc, t: acc + t.cast("long") * t.cast("long"),
    )
    # materialize the folds once; sumsq feeds both the zero-norm guard and
    # the divisor (same CollapseProject-blocking split as the quantizer)
    s = qemb.select(F.col(id_col), dot.alias("_dot"), sumsq.alias("_sumsq"))
    nrm = F.sqrt(F.col("_sumsq").cast("double"))
    cos = F.when(nrm * qnorm == 0, F.lit(-2.0)).otherwise(
        F.round(F.col("_dot").cast("double") / (nrm * F.lit(qnorm)), 6)
    )
    return (
        s.select(F.col(id_col), cos.alias("qcosine"))
        .orderBy(F.col("qcosine").desc(), F.col(id_col))
        .limit(k)
    )


def kmeans_assign(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    quant: int = 1 << 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Distributed Lloyd k-means on an integer lattice → (id, cluster, d2).

    Upgrades ``ivf_topk``'s seeded "k-means-lite" sample to real Lloyd
    iterations — the clustering step SemDeDup (Abbas et al. 2023) runs
    before intra-cluster dedup, and the proper trainer for IVF lists.

    Determinism (the property every oracle entry in this repo needs, and
    float k-means lacks: a groupBy mean over doubles is partial-agg-order
    dependent): every vector is snapped onto an integer lattice
    (``floor(x·quant)`` per component), distances are exact int64 sums of
    squares, and each iteration's new centroid is *re-quantized* onto the
    same lattice (``floor(sum/count)`` — one IEEE double division + floor,
    bit-identical everywhere). Integer sums are order-free, so the result
    is byte-identical at any partition layout / parallelism, and int64
    headroom is layout-independent: per-dim diffs ≤ 2·quant·|x|max keep
    d² ≪ 2⁶³ for any dim ≤ 2¹⁴ at the default quant, and centroid sums
    fit for clusters up to ~2⁶³/quant ≈ 10¹³ rows.

    Scale shape (100 TB): the only data-sized shuffles per iteration are
    one argmin groupBy(id) and one posexplode→groupBy(cluster, dim) sum —
    both map-side combinable; centroids (k·dim longs) ride a broadcast
    cross join, never a shuffle. Iteration count is fixed (no driver-side
    convergence collect). Empty clusters keep their previous centroid.

    Reference anchor: the reference has no clusterer (its ranking is
    link-graph PageRank, ``ranking/PageRankDomainRanker.java``); this is a
    beyond-reference LLM-pipeline operator (SURVEY §6 similarity family).
    """
    pts = _kmeans_pts(emb, quant, id_col, vec_col)
    cents = _kmeans_train(pts, k, iters, id_col)
    return _kmeans_assign_to(pts, cents, id_col)


def _kmeans_pts(
    emb: DataFrame, quant: int, id_col: str, vec_col: str
) -> DataFrame:
    return emb.select(
        id_col,
        F.transform(
            vec_col, lambda x: F.floor(x.cast("double") * quant).cast("long")
        ).alias("vq"),
    )


def _kmeans_assign_to(
    pts: DataFrame,
    cents_df: DataFrame,
    id_col: str,
    with_vq: bool = False,
) -> DataFrame:
    d2 = F.aggregate(
        F.zip_with("vq", "cq", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, t: acc + t,
    )
    # vq rides the argmin aggregate (functionally dependent on the
    # group key, so first() is deterministic) — saves the in-loop
    # update a second data-sized shuffle join back to pts
    aggs = [
        F.min_by(
            F.struct(F.col("cid"), F.col("_d2")),
            F.struct(F.col("_d2"), F.col("cid")),
        ).alias("_m")
    ] + ([F.first("vq").alias("vq")] if with_vq else [])
    return (
        pts.crossJoin(F.broadcast(cents_df))
        .withColumn("_d2", d2)
        .groupBy(id_col)
        .agg(*aggs)
        .select(
            id_col,
            F.col("_m.cid").alias("cluster"),
            F.col("_m._d2").alias("d2"),
            *(["vq"] if with_vq else []),
        )
    )


def _kmeans_train(
    pts: DataFrame, k: int, iters: int, id_col: str
) -> DataFrame:
    """The Lloyd loop: (cid, cq) lattice centroids after ``iters`` rounds."""
    # init: the k lattice points with smallest (md5, id) keys, cid = rank
    # in that order (mirrors the oracle's row_number() OVER (ORDER BY h, id))
    # constant partition key: the frame is k rows (post-limit), so a
    # single-partition window is the point — this just keeps WindowExec
    # from warning about it
    init_w = Window.partitionBy(F.lit(0)).orderBy("_h", id_col)
    cents = (
        pts.withColumn("_h", md5_order_col(id_col))
        .orderBy("_h", id_col)
        .limit(k)
        .withColumn("cid", F.row_number().over(init_w) - 1)
        .select("cid", F.col("vq").alias("cq"))
    )
    for _ in range(iters):
        upd = (
            _kmeans_assign_to(pts, cents, id_col, with_vq=True)
            .select("cluster", F.posexplode("vq").alias("i", "v"))
            .groupBy("cluster", "i")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
            .groupBy("cluster")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("i", "s", "n"))),
                    lambda t: F.floor(
                        t["s"].cast("double") / t["n"].cast("double")
                    ).cast("long"),
                ).alias("cq_new")
            )
        )
        # eager k-row localCheckpoint: cents is referenced twice per
        # iteration (update input + empty-cluster carry join), so without
        # truncation the lazy plan re-executes the whole prior iteration
        # 2× per level — the same lineage blowup pagerank truncates
        cents = (
            cents.join(upd, cents.cid == upd.cluster, "left")
            .select("cid", F.coalesce("cq_new", "cq").alias("cq"))
            .localCheckpoint(eager=True)
        )
    return cents


def kmeans_centroids(
    emb: DataFrame,
    k: int = 16,
    iters: int = 2,
    quant: int = 1 << 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[np.ndarray, np.ndarray]:
    """Lloyd-trained IVF centroids: (ids ``0..k-1``, float64 vectors).

    Drop-in replacement for ``ivf_centroids``' md5 sample — pass the
    result as ``ivf_topk(..., centroids=...)`` to serve against trained
    lists (tighter clusters → higher recall at the same ``nprobe``).
    Lattice centroids are de-quantized by ``/quant`` (exact: a power-of-
    two division), so the float vectors are deterministic too."""
    pts = _kmeans_pts(emb, quant, id_col, vec_col)
    rows = sorted(
        _kmeans_train(pts, k, iters, id_col).collect(), key=lambda r: r["cid"]
    )
    cids = np.array([r["cid"] for r in rows], dtype=np.int64)
    cents = np.array([r["cq"] for r in rows], dtype=np.float64) / float(quant)
    return cids, cents


def kmeans_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    k: int = 8,
    iters: int = 2,
    quant: int = 1 << 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup's actual two-step shape (Abbas et al. 2023 §3): Lloyd
    k-means partitions the corpus, then exact cosine ≥ τ pairs are found
    ONLY within each cluster — the cluster count is the knob that bounds
    the pairwise cost (n²/k per cluster in expectation), where
    ``embedding_neardup_pairs`` uses LSH buckets for the same bound.

    Scale shape: the pair join is keyed on the cluster id (co-partitioned
    self-join, no cartesian product); the cosine is the same order-pinned
    JVM fold the LSH variant uses, so the oracle reproduces it exactly.
    Like the paper, duplicates spanning two clusters are missed by
    construction — that approximation is part of the operator's contract
    (and of the oracle)."""
    # the (id, cluster) relation feeds BOTH sides of the self-join and
    # Spark does not canonicalize the two subtrees into a ReusedExchange,
    # so materialize it once (two longs per row) instead of running the
    # whole k-means assignment twice
    assigned = (
        kmeans_assign(emb, k, iters, quant, id_col, vec_col)
        .select(id_col, "cluster")
        .localCheckpoint(eager=True)
    )
    b = emb.select(id_col, vec_col).join(assigned, id_col)
    a_df = b.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"), "cluster"
    )
    b_df = b.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"), "cluster"
    )
    pairs = a_df.join(b_df, "cluster").filter(F.col("id_a") < F.col("id_b"))
    dot = F.aggregate(
        F.zip_with(
            F.col("vec_a"),
            F.col("vec_b"),
            lambda x, y: x.cast("double") * y.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na, nb = _norm_expr(F.col("vec_a")), _norm_expr(F.col("vec_b"))
    cos = dot / (na * nb)
    # zero-norm guard: a zero embedding (hash_embed_documents emits one
    # for token-free docs) yields 0/0 = NaN, and Spark's NaN-is-greatest
    # ordering would make `NaN >= threshold` TRUE — pairing the empty doc
    # with its whole cluster and letting canonicalize delete real docs.
    # A zero vector has no direction, hence no cosine neighbors.
    return (
        pairs.filter((na > F.lit(0.0)) & (nb > F.lit(0.0)))
        .withColumn("cosine", cos)
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


# --- product quantization (IVF-PQ's PQ half) ---------------------------------


def _pq_pts(
    emb: DataFrame, m: int, quant: int, id_col: str, vec_col: str
) -> DataFrame:
    """(id, sub, vq): each vector lattice-snapped then split into ``m``
    contiguous subvectors. One explode — the whole codebook trains from a
    single relation, so every Lloyd shuffle below covers all ``m``
    subspaces at once instead of looping m driver-side jobs."""
    vq = F.transform(
        vec_col, lambda x: F.floor(x.cast("double") * quant).cast("long")
    )
    return _pq_split(emb, vq, m, id_col)


def _pq_split(
    df: DataFrame, vq: F.Column, m: int, id_col: str
) -> DataFrame:
    """Split an already-latticed ``array<long>`` expression into the
    (id, sub, vq) subvector relation (shared by the raw-vector and the
    IVF-residual paths)."""
    subdim = (F.size(vq) / m).cast("int")
    subs = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda s: F.struct(
            s.cast("int").alias("sub"),
            F.slice(vq, s * subdim + 1, subdim).alias("vq"),
        ),
    )
    return df.select(id_col, F.explode(subs).alias("_s")).select(
        id_col, F.col("_s.sub").alias("sub"), F.col("_s.vq").alias("vq")
    )


def _pq_assign_to(
    pts: DataFrame, cents: DataFrame, id_col: str, with_vq: bool = False
) -> DataFrame:
    """Per-(id, sub) nearest codeword: broadcast the (m·ksub)-row codebook,
    join on the subspace key, argmin by exact int64 d² (ties → lowest cid
    — same pin as ``_kmeans_assign_to``)."""
    d2 = F.aggregate(
        F.zip_with("vq", "cq", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, t: acc + t,
    )
    aggs = [
        F.min_by(
            F.struct(F.col("cid"), F.col("_d2")),
            F.struct(F.col("_d2"), F.col("cid")),
        ).alias("_m")
    ] + ([F.first("vq").alias("vq")] if with_vq else [])
    return (
        pts.join(F.broadcast(cents), "sub")
        .withColumn("_d2", d2)
        .groupBy(id_col, "sub")
        .agg(*aggs)
        .select(
            id_col,
            "sub",
            F.col("_m.cid").alias("cid"),
            F.col("_m._d2").alias("d2"),
            *(["vq"] if with_vq else []),
        )
    )


def pq_train(
    emb: DataFrame,
    m: int = 8,
    ksub: int = 8,
    iters: int = 2,
    quant: int = 1 << 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ codebook: (sub, cid, cq) — ``ksub`` lattice codewords per
    subspace, trained by the same order-free integer Lloyd loop as
    ``kmeans_assign`` but with the subspace id riding every key, so one
    set of shuffles trains all ``m`` codebooks concurrently.

    Init mirrors the oracle: per subspace, the ``ksub`` subvectors with
    the smallest ``(md5(id), id)`` keys, cid = rank in that order. Each
    iteration's new codeword is re-quantized onto the lattice
    (``floor(sum/count)``), empty codewords carry over — byte-identical
    at any parallelism, same argument as the k-means docstring.

    Scale shape: per iteration one broadcast join (codebook is m·ksub
    rows — KiBs) + one groupBy(id, sub) argmin + one posexplode→
    groupBy(sub, cid, dim) sum, all map-side combinable; nothing
    vocabulary- or corpus-sized ever lands on the driver."""
    return _pq_train_pts(
        _pq_pts(emb, m, quant, id_col, vec_col), ksub, iters, id_col
    )


def _pq_train_pts(
    pts: DataFrame, ksub: int, iters: int, id_col: str
) -> DataFrame:
    """The per-subspace Lloyd loop over an (id, sub, vq) relation —
    shared by ``pq_train`` (raw lattice vectors) and ``ivfpq_topk``
    (coarse-cell residuals)."""
    init_w = Window.partitionBy("sub").orderBy("_h", id_col)
    cents = (
        pts.withColumn("_h", md5_order_col(id_col))
        .withColumn("_rn", F.row_number().over(init_w))
        .filter(F.col("_rn") <= ksub)
        .select("sub", (F.col("_rn") - 1).alias("cid"), F.col("vq").alias("cq"))
    )
    for _ in range(iters):
        upd = (
            _pq_assign_to(pts, cents, id_col, with_vq=True)
            .select("sub", "cid", F.posexplode("vq").alias("i", "v"))
            .groupBy("sub", "cid", "i")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
            .groupBy("sub", "cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("i", "s", "n"))),
                    lambda t: F.floor(
                        t["s"].cast("double") / t["n"].cast("double")
                    ).cast("long"),
                ).alias("cq_new")
            )
            .withColumnsRenamed({"sub": "u_sub", "cid": "u_cid"})
        )
        # same 2-consumer lineage blowup as _kmeans_train: truncate the
        # (m·ksub)-row codebook eagerly each round
        cents = (
            cents.join(
                upd,
                (cents.sub == upd.u_sub) & (cents.cid == upd.u_cid),
                "left",
            )
            .select("sub", "cid", F.coalesce("cq_new", "cq").alias("cq"))
            .localCheckpoint(eager=True)
        )
    return cents


def pq_encode(
    emb: DataFrame,
    cents: DataFrame,
    m: int = 8,
    quant: int = 1 << 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes): each vector as ``m`` codebook indices, ordered by
    subspace — the m-byte serving representation (64-dim float32 → 8
    bytes: 32× smaller scans than the float corpus, 4× under int8)."""
    return _pq_encode_pts(
        _pq_pts(emb, m, quant, id_col, vec_col), cents, id_col
    )


def _pq_encode_pts(
    pts: DataFrame, cents: DataFrame, id_col: str
) -> DataFrame:
    return (
        _pq_assign_to(pts, cents, id_col)
        .groupBy(id_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("sub", "cid"))),
                lambda t: t["cid"].cast("int"),
            ).alias("codes")
        )
    )


def pq_topk(
    codes_df: DataFrame,
    cents: DataFrame,
    qvec: list[float],
    k: int = 10,
    quant: int = 1 << 20,
    id_col: str = "vec_id",
) -> DataFrame:
    """ADC top-k: asymmetric distance from a float query to every encoded
    vector, ``d²(q, x) ≈ Σ_sub lut[sub][codes[sub]]`` where ``lut`` is the
    (m·ksub)-entry table of exact int64 d²(q_sub, codeword) values.

    The codebook is collected — it is m·ksub rows by construction (KiBs,
    same boundedness as ``ivf_topk``'s centroid table), never data-sized
    — and the LUT rides the scan as a nested array literal, so the plan
    is a zero-shuffle narrow scan of (id, m codes) + TakeOrdered: the
    whole corpus read is m bytes/row. All-integer arithmetic → the DuckDB
    twin reproduces distances bit-for-bit."""
    rows = cents.collect()
    if not rows:  # empty corpus trains an empty codebook: no neighbors
        return codes_df.sparkSession.createDataFrame(
            [], f"{id_col} long, adc_d2 long"
        )
    q = np.floor(np.asarray(qvec, dtype=np.float64) * quant).astype(np.int64)
    adc = _adc_expr(_adc_lut(q, rows))
    return (
        codes_df.select(F.col(id_col), adc.alias("adc_d2"))
        .orderBy(F.col("adc_d2").asc(), F.col(id_col))
        .limit(k)
    )


def _adc_lut(q_lat: np.ndarray, cent_rows) -> np.ndarray:
    """(m × ksub) int64 table of d²(query subvector, codeword) — the ADC
    lookup table, built driver-side from a codebook that is m·ksub rows
    by construction."""
    m = 1 + max(r["sub"] for r in cent_rows)
    ksub = 1 + max(r["cid"] for r in cent_rows)
    subdim = q_lat.size // m
    lut = np.zeros((m, ksub), dtype=np.int64)
    for r in cent_rows:
        dq = q_lat[r["sub"] * subdim : (r["sub"] + 1) * subdim] - np.asarray(
            r["cq"], dtype=np.int64
        )
        lut[r["sub"], r["cid"]] = int((dq * dq).sum())
    return lut


def _adc_expr(lut: np.ndarray) -> F.Column:
    """The per-row ADC sum ``Σ_sub lut[sub][codes[sub]]`` with the LUT
    riding the scan as a nested int64 array literal — THE fold shared by
    ``pq_topk`` and ``ivfpq_topk``'s per-cell dispatch."""
    lut_col = F.array(
        *[F.array(*[F.lit(int(v)) for v in row]) for row in lut]
    )
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(int(lut.shape[0]) - 1)),
        F.lit(0).cast("long"),
        lambda acc, i: acc
        + F.element_at(
            F.element_at(lut_col, (i + 1).cast("int")),
            (F.element_at(F.col("codes"), (i + 1).cast("int")) + 1).cast(
                "int"
            ),
        ),
    )


def ivfpq_topk(
    emb: DataFrame,
    qvec: list[float],
    k: int = 10,
    coarse_k: int = 8,
    nprobe: int = 2,
    m: int = 8,
    ksub: int = 8,
    iters: int = 2,
    quant: int = 1 << 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVFADC (Jégou et al. 2011 §IV): coarse k-means cells + PQ over the
    RESIDUAL (vector − its cell centroid), probing only the ``nprobe``
    cells nearest the query — FAISS's default 100 TB architecture, here
    entirely on the integer lattice so the DuckDB twin is hash-exact
    (both the point and its centroid are lattice int64s, so the residual
    is exact — no float subtraction anywhere).

    Scale shape: train = one Lloyd loop for the coarse cells + one for
    the m sub-codebooks (each the same map-combinable shuffles as
    ``kmeans_assign``/``pq_train``); serve = the codes relation filtered
    to probed cells (partition-prunable when written partitioned by
    cell), ADC-summed against an (nprobe·m·ksub)-literal LUT, TakeOrdered
    — no joins, no shuffle. Probed cells and LUTs come from the two
    bounded codebooks (coarse_k and m·ksub rows), never from data-sized
    state. Approximate distance = Σ_sub d²(q_residual_sub, codeword) for
    the row's own cell's residual query — the paper's ADC estimator.
    """
    pts = _kmeans_pts(emb, quant, id_col, vec_col)
    coarse = _kmeans_train(pts, coarse_k, iters, id_col)
    assigned = _kmeans_assign_to(pts, coarse, id_col, with_vq=True)
    res = (
        assigned.join(F.broadcast(coarse), assigned.cluster == coarse.cid)
        .select(
            id_col,
            "cluster",
            F.zip_with("vq", "cq", lambda a, b: a - b).alias("rq"),
        )
        # materialized once: the residual relation is re-read by every PQ
        # Lloyd iteration, the encode pass, and the codes join — without
        # this each reader re-runs the corpus-sized coarse-argmin shuffle
        # (same policy as kmeans_neardup_pairs' assignment checkpoint)
        .localCheckpoint(eager=True)
    )
    rpts = _pq_split(res, F.col("rq"), m, id_col)
    pq_cents = _pq_train_pts(rpts, ksub, iters, id_col)
    codes = _pq_encode_pts(rpts, pq_cents, id_col).join(
        res.select(id_col, "cluster"), id_col
    )

    # probe selection + per-cell residual LUTs: both driver-side off the
    # two bounded codebooks (coarse_k rows / m·ksub rows)
    q_lat = np.floor(np.asarray(qvec, dtype=np.float64) * quant).astype(
        np.int64
    )
    coarse_rows = coarse.collect()
    cd = sorted(
        (
            int(((q_lat - np.asarray(r["cq"], dtype=np.int64)) ** 2).sum()),
            int(r["cid"]),
        )
        for r in coarse_rows
    )
    probes = [cid for _, cid in cd[:nprobe]]
    if not probes:  # empty corpus (no centroids) or nprobe < 1
        return emb.sparkSession.createDataFrame(
            [], f"{id_col} long, adc_d2 long"
        )
    pq_rows = pq_cents.collect()
    by_cid = {r["cid"]: np.asarray(r["cq"], dtype=np.int64) for r in coarse_rows}
    luts = {
        int(c): _adc_lut(q_lat - by_cid[c], pq_rows) for c in probes
    }

    # cell → LUT dispatch as a chained CASE over nprobe literal tables
    adc = None
    for c, lut in luts.items():
        cell_adc = _adc_expr(lut)
        adc = (
            F.when(F.col("cluster") == c, cell_adc)
            if adc is None
            else adc.when(F.col("cluster") == c, cell_adc)
        )
    return (
        codes.filter(F.col("cluster").isin([int(c) for c in probes]))
        .select(F.col(id_col), adc.alias("adc_d2"))
        .orderBy(F.col("adc_d2").asc(), F.col(id_col))
        .limit(k)
    )


# --- hashed n-gram document embeddings ----------------------------------------


def hash_embed_documents(
    docs: DataFrame,
    dim: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, embedding): signed feature-hashing bag-of-words embedding
    (Weinberger et al. 2009) — the model-free bridge from the documents
    table to every embedding operator in this module (kNN, k-means,
    SemDeDup, PQ). Token → md5 → bit 0 picks the sign, the next bits pick
    the bucket; per-bucket signed counts are L2-normalized.

    Determinism: bucket values are exact integer sums (order-free), the
    squared norm is an exact integer, and the only float ops are one
    ``sqrt`` + one division per component — pinned IEEE doubles the
    DuckDB twin reproduces bit-for-bit. Docs with no tokens embed as the
    zero vector.

    Scale shape: one explode + one groupBy(doc, bucket) + one
    groupBy(doc) — both map-side combinable; ``dim`` bounds the row
    width, nothing vocabulary-sized anywhere (the hashing trick's whole
    point). Tokenization is the keyword extractors' shared cleaner, so
    embeddings agree with the index's view of the text."""
    from .keywords import _clean_tokens

    t = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_clean_tokens(text_col)).alias("tok"),
    )
    h = F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10).cast("long")
    sgn = F.when(h % 2 == 1, F.lit(-1)).otherwise(F.lit(1))
    per_bucket = (
        t.select("doc_id", F.pmod(F.shiftright(h, 1), dim).alias("bucket"), sgn.alias("sgn"))
        .groupBy("doc_id", "bucket")
        .agg(F.sum("sgn").cast("long").alias("v"))
    )
    vec = (
        per_bucket.groupBy("doc_id")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("bucket", "v"))
            ).alias("_m")
        )
        .select(
            "doc_id",
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda i: F.coalesce(
                    F.element_at(F.col("_m"), i.cast("long")), F.lit(0)
                ).cast("long"),
            ).alias("_iv"),
        )
    )
    # left join keeps token-free docs (zero vector); the squared norm is
    # an exact int64, materialized once (CollapseProject split — same
    # reasoning as quantize_embeddings)
    base = docs.select(F.col(id_col).alias("doc_id")).join(vec, "doc_id", "left")
    zero = F.array_repeat(F.lit(0).cast("long"), dim)
    withv = base.select(
        "doc_id", F.coalesce(F.col("_iv"), zero).alias("_iv")
    )
    sumsq = F.aggregate(
        F.col("_iv"), F.lit(0).cast("long"), lambda acc, v: acc + v * v
    )
    s = withv.select("doc_id", "_iv", sumsq.alias("_ss"))
    nrm = F.sqrt(F.col("_ss").cast("double"))
    return s.select(
        "doc_id",
        F.transform(
            F.col("_iv"),
            lambda v: F.when(F.col("_ss") == 0, F.lit(0.0)).otherwise(
                v.cast("double") / nrm
            ),
        ).alias("embedding"),
    )
