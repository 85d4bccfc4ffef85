"""Exploration browse + domain-info panel — the reference's
``features-search/random-websites`` feature and ``domain-info`` function.

Reference surface re-expressed here:

- ``DbBrowseDomainsRandom.getRandomDomains``
  (`code/features-search/random-websites/java/nu/marginalia/browse/
  DbBrowseDomainsRandom.java:22-48`): eligible domains ``ORDER BY RAND()
  LIMIT count``, blacklist applied while iterating the already-limited
  resultset.
- ``DbBrowseDomainsSimilarCosine.getDomainNeighborsAdjacentCosineRequireScreenshot``
  (`.../browse/DbBrowseDomainsSimilarCosine.java:20-55`): one domain's
  neighbors from the adjacency-similarity view (``EC_NEIGHBORS_VIEW`` =
  ``ranking.adjacency_similarities``), inner-joined to a screenshot
  presence table, ordered by relatedness, blacklist-skipped while filling
  ``count`` rows.
- ``DomainInformationService.domainInfo``
  (`code/functions/domain-info/java/nu/marginalia/functions/domains/
  DomainInformationService.java:32-120`): a per-domain panel joining
  domain metadata, link-graph in/out counts
  (``linkGraphClient.countLinksTo/FromDomain``) and the ranking percentile
  ``Math.round(100.0 * (1.0 - RANK))``.

Spark-first deviations, deliberate and documented:

- ``ORDER BY RAND()`` becomes a salted-md5 order (same convention as
  ``sampling._hash60``) so browse results are reproducible across engines
  and SQL-twin-able; a seed change is the reference's re-roll.
- the reference answers one domain per RPC; ``domain_info`` computes the
  identical panel for EVERY domain in one pass (three vertex-keyed
  aggregate joins — the RPC-per-domain shape would be a driver-side loop,
  the anti-pattern this engine avoids).
- the ranking percentile is exact integer round-half-up (Java
  ``Math.round``) over the pinned (score desc, id) order, so it is
  bit-identical in any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .sampling import _hash60

__all__ = ["random_browse", "similar_browse", "domain_info"]


def random_browse(
    domains: DataFrame,
    count: int = 20,
    *,
    blacklist: DataFrame | None = None,
    id_col: str = "id",
    salt: str = "browse-v1",
) -> DataFrame:
    """Deterministic ``ORDER BY RAND() LIMIT count`` browse sample.

    ``domains`` is the already-eligibility-filtered relation (the
    reference's ``STATE<2 AND SERVER_AVAILABLE AND DOMAIN_SET=? AND
    DOMAIN_ALIAS IS NULL`` predicate belongs to the caller — it is a plain
    filter over its domain table). The blacklist is applied AFTER the
    limit, exactly like the reference's result-set loop: a blacklisted row
    reduces the returned count rather than being replaced
    (``DbBrowseDomainsRandom.java:36-40``).

    Scale shape: salted-md5 key + ``orderBy().limit()`` is
    TakeOrderedAndProject (per-partition top-count, no global sort); the
    ≤ ``count``-row limited result is then anti-joined against the
    broadcast blacklist. The BLACKLIST side is what broadcasts, so it
    should be dimension-sized (the reference's is a curated table) — a
    corpus-sized blacklist would need the hint dropped.
    """
    key = _hash60(F.col(id_col), salt)
    out = (
        domains.withColumn("_rk", key)
        .orderBy(F.col("_rk"), F.col(id_col))
        .limit(count)
    )
    if blacklist is not None:
        out = out.join(
            F.broadcast(blacklist.select(id_col)), id_col, "left_anti"
        )
    return out.drop("_rk")


def similar_browse(
    neighbors: DataFrame,
    domain_id: int,
    count: int = 10,
    *,
    require: DataFrame | None = None,
    blacklist: DataFrame | None = None,
    domain_col: str = "domain_id",
    id_col: str = "neighbor_id",
    rel_col: str = "relatedness",
) -> DataFrame:
    """One domain's similar-domain browse list.

    ``neighbors`` is the adjacency-similarity relation
    (``ranking.adjacency_similarities`` output — the materialized
    ``EC_NEIGHBORS_VIEW``). ``require`` is the presence gate (the
    ``DATA_DOMAIN_SCREENSHOT`` inner join — one id column). Unlike
    :func:`random_browse`, the blacklist applies BEFORE the count cut: the
    reference's loop skips blacklisted rows and keeps reading until
    ``count`` results are collected (``DbBrowseDomainsSimilarCosine.java:
    41-48``). Ties in relatedness pin on ascending neighbor id (the
    reference inherits MySQL's unspecified tie order; pinning makes the
    result reproducible).
    """
    out = neighbors.where(F.col(domain_col) == F.lit(domain_id))
    if require is not None:
        out = out.join(F.broadcast(require.select(id_col)), id_col, "left_semi")
    if blacklist is not None:
        out = out.join(F.broadcast(blacklist.select(id_col)), id_col, "left_anti")
    return out.orderBy(F.col(rel_col).desc(), F.col(id_col)).limit(count)


def domain_info(
    meta: DataFrame,
    edges: DataFrame,
    scores: DataFrame,
    *,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Per-domain information panel over the whole vertex set.

    ``meta`` carries the domain's own columns (keyed ``id_col``);
    ``edges`` is the link graph; ``scores`` the centrality scores
    (``ranking.pagerank`` output — the reference's ``EC_DOMAIN.RANK`` is
    the persisted domain-ranking result). Output = ``meta.* +
    incoming_links + outbound_links + ranking``:

    - in/out counts are the ``countLinksTo/FromDomain`` aggregates —
      two map-side-combinable groupBys on graph keys, broadcast back
      (vertex-sized relations);
    - ``ranking = round_half_up(100 · (1 − rn/(N−1)))`` where ``rn`` is
      the 0-based position in (score desc, id) order — the reference's
      ``setRanking(Math.round(100.0 * (1.0 - RANK)))`` with RANK the
      [0,1]-normalized rank. Computed as exact integer arithmetic
      ``(200·(N−1−rn) + (N−1)) div (2·(N−1))`` (Math.round =
      floor(x+0.5) = this, for non-negative x), so any engine agrees
      bit-for-bit. A domain missing from ``scores`` gets ranking 0, the
      reference's ``IFNULL(RANK, 1)`` worst-rank default.

    The single global window is over a vertex-sized relation (domains,
    not documents) — same documented bound as ``ranking.ranks_from_scores``.
    """
    out_deg = edges.groupBy(F.col(src_col).alias(id_col)).agg(
        F.count(F.lit(1)).alias("outbound_links")
    )
    in_deg = edges.groupBy(F.col(dst_col).alias(id_col)).agg(
        F.count(F.lit(1)).alias("incoming_links")
    )
    # the count() below needs an action anyway; checkpointing first means
    # the caller's scores plan (e.g. the last lazy PageRank iteration)
    # executes once, not once for the count and again under the window
    scores = scores.localCheckpoint()
    n = scores.count()
    w = Window.orderBy(F.col("score").desc(), F.col(id_col))
    rk = scores.select(
        F.col(id_col), (F.row_number().over(w) - F.lit(1)).alias("_rn")
    )
    if n > 1:
        ranking = F.expr(
            f"(200 * ({n - 1} - _rn) + {n - 1}) div {2 * (n - 1)}"
        ).cast("long")
    else:
        ranking = F.when(F.col("_rn").isNotNull(), F.lit(100)).cast("long")
    return (
        meta.join(F.broadcast(in_deg), id_col, "left")
        .join(F.broadcast(out_deg), id_col, "left")
        .join(F.broadcast(rk), id_col, "left")
        .select(
            *[F.col(c) for c in meta.columns],
            F.coalesce(F.col("incoming_links"), F.lit(0)).alias(
                "incoming_links"
            ),
            F.coalesce(F.col("outbound_links"), F.lit(0)).alias(
                "outbound_links"
            ),
            F.coalesce(ranking, F.lit(0)).alias("ranking"),
        )
    )
