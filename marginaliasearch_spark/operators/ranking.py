"""Graph centrality ranking — the reference's domain-ranking stage.

MarginaliaSearch ranks domains with (Personalized) PageRank over the
domain link graph or the domain-similarity graph and stamps the resulting
rank into the high bits of every document id, so index order ≈ quality
order (reference: `code/index/java/nu/marginalia/domainranking/
PageRankDomainRanker.java:17-60`, `.../jgrapht/PersonalizedPageRank.java`,
graph sources `.../data/{LinkGraphSource,SimilarityGraphSource}.java`,
rank bits `code/common/model/java/nu/marginalia/model/id/UrlIdCodec.java`).

Spark-first re-expression with one deliberate twist: **fixed-point integer
PageRank**. Scores are int64 "mass units" (``scale`` units per node at
init) and every update is integer multiply / integer division / integer
sum. Integer sums are order-independent, so the result is bit-identical
across engines, partitionings, and retries — float PageRank is not (the
per-node Σ over in-edges is a float reduction whose rounding depends on
aggregation order), which is why jgrapht's scores could never be
hash-checked against a SQL twin. The floor divisions leak a few units of
mass per iteration (< outdeg per node); ranking order is what the rank
stamp consumes and ties break on node id, so the leak is harmless and —
crucially — identical everywhere.

Update rule (iteration t → t+1, damping 85/100, all ops on int64):

    share(u)   = (85 · s_u) div (100 · outdeg(u))   per out-edge of u
    dangling D = Σ over outdeg-0 nodes of (85 · s_u) div 100
    s_i'       = B_i + D div |T| · [i ∈ T] + Σ_{(u,i) ∈ E} share(u)

where T is the teleport set (all nodes, or the ``influence`` set for
personalized PageRank — the reference's PersonalizedPageRank jumps only
into the influence set) and B_i = (15 · scale · N) div (100 · |T|) for
i ∈ T else 0.

Scale shape: one ``links ⋈ scores`` hash join + one ``groupBy(dst)`` sum
per iteration — two shuffles, both on graph keys, no all-pairs work, no
driver state beyond the 1-row dangling-mass fetch; lineage truncated per
iteration with ``localCheckpoint`` (use reliable ``checkpoint`` on a real
cluster). Overflow headroom: scores sum to ≤ N·scale, so with the default
``scale=10**12`` the 85·s multiplier stays < 2⁶³ for any realistic mass
concentration; lower ``scale`` for graphs beyond ~10⁶ nodes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "pagerank",
    "pagerank_topk",
    "ranks_from_scores",
    "adjacency_similarities",
]


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    *,
    iterations: int = 5,
    scale: int = 10**12,
    influence: list | None = None,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Fixed-point integer PageRank → ``(id, score)`` (int64 mass units).

    ``nodes`` is the vertex set (one column ``id_col``); edges whose
    endpoints are not in it are dropped, as the reference's graph builder
    does (``LinkGraphSource.java:30-36`` ``containsVertex`` guards).
    ``influence`` switches to personalized PageRank: teleport + dangling
    mass land uniformly on the influence set only
    (``PersonalizedPageRank.java`` semantics).
    """
    if iterations < 0:
        raise ValueError("iterations must be >= 0")
    vs = nodes.select(F.col(id_col).alias("id")).distinct().localCheckpoint()
    n = vs.count()
    if n == 0:
        return vs.withColumn("score", F.lit(0).cast("long"))
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
        .join(vs.select(F.col("id").alias("src")), "src")
        .join(vs.select(F.col("id").alias("dst")), "dst")
    )
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # (src, dst, outdeg) is loop-invariant: join it once, checkpoint it,
    # and each iteration only re-joins the fresh scores
    links = e.join(outdeg, "src").localCheckpoint()

    if influence is not None:
        t_ids = sorted(set(influence))
        if not t_ids:
            raise ValueError("influence set must be non-empty")
        t_size = len(t_ids)
        is_teleport = F.col("id").isin(t_ids)
    else:
        t_size = n
        is_teleport = F.lit(True)
    base = (15 * scale * n) // (100 * t_size)

    dangling = vs.join(outdeg.select(F.col("src").alias("id")), "id", "left_anti")

    scores = vs.select("id", F.lit(int(scale)).cast("long").alias("s"))
    for it in range(iterations):
        # dangling mass: a 1-row relation broadcast into the update instead
        # of a driver-side .first() — one Spark job per iteration, not two
        # (the scalar share is identical: d >= 0, so `div` == Python //)
        dmass = scores.join(dangling, "id").agg(
            F.coalesce(F.sum(F.expr("(85 * s) div 100")), F.lit(0))
            .cast("long")
            .alias("dm")
        )
        contrib = (
            links.join(scores.withColumnRenamed("id", "src"), "src")
            .select(
                F.col("dst").alias("id"),
                F.expr("(85 * s) div (100 * outdeg)").alias("c"),
            )
            .groupBy("id")
            .agg(F.sum("c").alias("c"))
        )
        scores = (
            vs.join(contrib, "id", "left")
            .crossJoin(F.broadcast(dmass))
            .select(
                "id",
                (
                    F.when(
                        is_teleport,
                        F.lit(base) + F.expr(f"dm div {t_size}"),
                    ).otherwise(F.lit(0))
                    + F.coalesce(F.col("c"), F.lit(0))
                )
                .cast("long")
                .alias("s"),
            )
        )
        if it + 1 < iterations:
            # truncate lineage between rounds; the LAST round stays lazy so
            # the caller's downstream plan (top-k, rank stamp) fuses with it
            scores = scores.localCheckpoint()
    return scores.select("id", F.col("s").alias("score"))


def pagerank_topk(scores: DataFrame, k: int = 20) -> DataFrame:
    """Top-k ``(id, score, rank)`` with rank 0 = best — the reference's
    accumulator assigns ascending rank indices down the sorted score list
    (``PageRankDomainRanker.java:45-58``). Ties break on ascending id
    (jgrapht leaves ties unspecified; pinning them is what makes the
    result reproducible). TakeOrderedAndProject — no full sort."""
    w = Window.orderBy(F.col("score").desc(), F.col("id"))
    return (
        scores.orderBy(F.col("score").desc(), F.col("id"))
        .limit(k)
        .withColumn("rank", F.row_number().over(w) - F.lit(1))
    )


def ranks_from_scores(scores: DataFrame, buckets: int = 64) -> DataFrame:
    """Quantize centrality scores into ``buckets`` rank tiers (0 = best)
    for the doc-id rank bits — the stamp ``build_index(ranks=…)`` consumes
    (reference: 6-bit domain rank in ``UrlIdCodec.java:26-34``). ntile over
    the pinned (score desc, id) order is deterministic.

    The single-window global sort is fine for vertex-sized relations
    (domains, not documents); at 10⁹+ vertices swap in the two-pass
    distributed prefix-sum used by ``sampling.pack_sequences``.
    """
    w = Window.orderBy(F.col("score").desc(), F.col("id"))
    return scores.select(
        F.col("id").alias("conv_id"),
        (F.ntile(buckets).over(w) - F.lit(1)).alias("rank"),
    )


def adjacency_similarities(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    max_card: int = 10_000,
    min_card: int = 10,
    threshold: float = 0.1,
    top_k: int = 128,
) -> DataFrame:
    """Domain-adjacency similarity graph — the reference's website
    adjacencies export (``code/processes/export-task-process/java/nu/
    marginalia/adjacencies/WebsiteAdjacenciesCalculator.java:70-125``,
    ``AdjacenciesData.java:24-122``, ``SparseBitVector.java:163-256``),
    which feeds ``EC_DOMAIN_NEIGHBORS_2`` and the similar-domains service
    (``SimilarDomainsService.java``).

    Semantics, kept exactly:

    - a domain's sparse vector is the set of sources linking to it PLUS
      itself (``createBitmapWithSelf``); self-loops in the raw edge list
      are absorbed by the set
    - vectors exist only for *eligible* dests, ``card < max_card``
      (``AdjacenciesData.isEligible``); a domain drives only when its
      card strictly exceeds ``min_card`` (``cardinalityExceeds(10)``)
    - a candidate must satisfy ``card_b >= max(2, int(0.01 * card_a))``
      (asymmetric — the ``cardMin`` gate)
    - two-stage scoring: cheap set cosine ``(and / sqrt(ca)) / sqrt(cb) >
      threshold`` first, then the weighted cosine
      ``Σ_{s∈A∩B} w_s / sqrt(Σ_{s∈A} w_s · Σ_{s∈B} w_s) > threshold``
      with ``w_s = 1/ln(2 + card_s)`` for sources with an eligible
      vector, else 1.0 (``getWeight``; double here vs the reference's
      float32 — documented divergence, same everywhere)
    - per driving domain keep the ``top_k`` highest values (the
      reference's 128-cap), ties pinned on ascending neighbor id

    Returns ``(domain_id, neighbor_id, relatedness, value)`` where
    ``relatedness = round(100·value)`` is what the reference's service
    serves (``SimilarDomainsService.java:117``) and ``value`` rounds to
    6 places.

    Scale shape: the one heavy relation (the co-source self-join) is
    aggregated with a COUNT only (map-side combinable); shared-source
    lists are collected solely for pairs that survive the cheap filter,
    and denominators solely for domains appearing in survivors. Weighted
    sums fold over src-ascending sorted lists, so they are bit-identical
    across engines and partitionings (the DuckDB twin replays the same
    fold). No all-pairs work anywhere: candidates come from the shared
    source, exactly the reference's ``sToDMap`` candidate generation —
    the self-bits make the co-source join complete (any pair with a
    nonzero intersection shares an element that is a source of both).
    A mega-out-degree source fans into outdeg² pair rows, the same
    quadratic the reference's candidate sets pay; ``max_card``
    eligibility is the reference's own guard on the dst side.
    """
    e = (
        edges.select(
            F.col(dst_col).cast("long").alias("dst"),
            F.col(src_col).cast("long").alias("src"),
        )
        .where(F.col("dst") != F.col("src"))
        .distinct()
    )
    dsts = e.select("dst").distinct()
    r = e.unionByName(dsts.select("dst", F.col("dst").alias("src")))
    card = r.groupBy("dst").agg(F.count(F.lit(1)).alias("c"))
    elig = card.where(F.col("c") < max_card)
    vec = r.join(elig, "dst")  # (dst, src, c) — eligible vectors only
    wt = (
        r.select("src")
        .distinct()
        .join(
            elig.select(F.col("dst").alias("src"), F.col("c").alias("sc")),
            "src",
            "left",
        )
        .select(
            "src",
            F.coalesce(
                F.lit(1.0) / F.log(F.lit(2.0) + F.col("sc")), F.lit(1.0)
            ).alias("w"),
        )
    )
    a = vec.select(F.col("dst").alias("da"), "src", F.col("c").alias("ca"))
    b = vec.select(F.col("dst").alias("db"), "src", F.col("c").alias("cb"))
    pairs = (
        a.join(b, "src")
        .where(F.col("da") != F.col("db"))
        .groupBy("da", "db", "ca", "cb")
        .agg(F.count(F.lit(1)).alias("and_card"))
    )
    surv = pairs.where(
        (F.col("ca") > F.lit(min_card))
        & (
            F.col("cb")
            >= F.greatest(
                F.lit(2).cast("long"),
                F.floor(F.lit(0.01) * F.col("ca")).cast("long"),
            )
        )
        & (
            (
                F.col("and_card").cast("double")
                / F.sqrt(F.col("ca").cast("double"))
            )
            / F.sqrt(F.col("cb").cast("double"))
            > F.lit(threshold)
        )
    )
    sv = surv.select("da", "db")
    shared = (
        sv.join(vec.select(F.col("dst").alias("da"), "src"), "da")
        .join(vec.select(F.col("dst").alias("db"), "src"), ["db", "src"])
        .join(wt, "src")
    )
    _fold = lambda c: F.aggregate(  # noqa: E731 — src-asc pinned fold
        F.sort_array(F.collect_list(F.struct("src", "w"))),
        F.lit(0.0),
        lambda acc, x: acc + x["w"],
    ).alias(c)
    num = shared.groupBy("da", "db").agg(_fold("num"))
    ids = sv.select(F.col("da").alias("dst")).union(
        sv.select(F.col("db"))
    ).distinct()
    den = (
        vec.join(ids, "dst")
        .join(wt, "src")
        .groupBy("dst")
        .agg(_fold("den"))
    )
    out = (
        surv.join(num, ["da", "db"])
        .join(
            den.select(F.col("dst").alias("da"), F.col("den").alias("dna")),
            "da",
        )
        .join(
            den.select(F.col("dst").alias("db"), F.col("den").alias("dnb")),
            "db",
        )
        .withColumn(
            "value", F.col("num") / F.sqrt(F.col("dna") * F.col("dnb"))
        )
        .where(F.col("value") > F.lit(threshold))
    )
    wnd = Window.partitionBy("da").orderBy(
        F.col("value").desc(), F.col("db").asc()
    )
    return (
        out.withColumn("rn", F.row_number().over(wnd))
        .where(F.col("rn") <= top_k)
        .select(
            F.col("da").alias("domain_id"),
            F.col("db").alias("neighbor_id"),
            F.round(F.lit(100.0) * F.col("value")).cast("int").alias(
                "relatedness"
            ),
            F.round(F.col("value"), 6).alias("value"),
        )
    )
