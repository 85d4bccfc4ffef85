"""Ranking search sets — the reference's RankingSearchSet / SearchSetsService.

A search set in MarginaliaSearch is a persisted id set that scopes a query
to a curated slice of the corpus (`set:<name>`):

- `SearchSetsService.recalculateNormal`
  (`code/index/java/nu/marginalia/index/searchset/SearchSetsService.java:145-168`)
  builds a set by running PageRank over the link/similarity graph seeded
  with the set's domains and keeping the top ``depth()`` ranked ids
  (``PageRankDomainRanker.forDomainNames(...).calculate(depth, ...)``).
- Special sets are explicit id lists (`recalculateSpecialSetSet`,
  `SearchSetsService.java:171-189`; `SmallSearchSet.java`).
- The set is persisted (`RankingSearchSet.write`,
  `RankingSearchSet.java:88-100`) and loaded into RAM at query time;
  membership gates candidates via `RankingSearchSet.contains`
  (`RankingSearchSet.java:73-82`). Quirk mirrored deliberately: an EMPTY
  set imposes no constraint (``contains`` returns true for every id when
  the set is empty — same line range).

Spark shape: a set is a dimension-sized ``conv_id`` relation persisted as
parquet under ``<index_root>/searchsets/<name>``. At query time the
members resolve to doc ids through the forward index and seed the postings
decode exactly like the ``conv:`` doc-range filters (blocks outside the
members' doc-id windows are skipped undecoded); the reference holds the
same set in executor RAM as an ``IntOpenHashSet``, so a driver-side id
array honors the same size contract, and oversized sets degrade to a
distributed semi-join instead of failing.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "ranking_search_set",
    "explicit_search_set",
    "write_search_set",
    "load_search_set",
]

# persisted set names are path components — keep them boring
_NAME_RE = re.compile(r"^[a-z0-9_]+$")


def _set_dir(index_root: str, name: str) -> str:
    if not _NAME_RE.match(name):
        raise ValueError(f"invalid search-set name {name!r} (want [a-z0-9_]+)")
    return os.path.join(index_root, "searchsets", name)


def ranking_search_set(
    scores: DataFrame, depth: int, id_col: str = "id"
) -> DataFrame:
    """Top-``depth`` ids of a centrality run → one-column set relation.

    The reference's ``PageRankDomainRanker.calculate(depth, accumulator)``
    keeps the ``depth`` best-ranked domains (``SearchSetsService.java:156``);
    ties break on ascending id, same pin as ``ranking.pagerank_topk``.
    ``orderBy().limit()`` is TakeOrderedAndProject — no full sort; depth is
    set-sized (the reference's RETRO/POPULAR depths are 10⁴-10⁵).
    """
    return (
        scores.orderBy(F.col("score").desc(), F.col(id_col))
        .limit(depth)
        .select(F.col(id_col).cast("string").alias("conv_id"))
    )


def explicit_search_set(ids: DataFrame, id_col: str = "conv_id") -> DataFrame:
    """Explicit id-list set — ``SmallSearchSet`` / the special BLOGS/SMALL
    sets (``SearchSetsService.java:171-189``)."""
    return ids.select(F.col(id_col).cast("string").alias("conv_id")).distinct()


def write_search_set(set_df: DataFrame, index_root: str, name: str) -> str:
    """Persist a set under the index root (``RankingSearchSet.write``).

    One-column dimension-sized relation → ``coalesce(1)`` keeps the
    artifact a single small file, like the reference's flat int stream.
    """
    path = _set_dir(index_root, name)
    set_df.select(F.col("conv_id").cast("string")).distinct().coalesce(
        1
    ).write.mode("overwrite").parquet(path)
    return path


def load_search_set(
    spark: SparkSession, index_root: str, name: str
) -> DataFrame | None:
    """Load a persisted set; ``None`` when missing or empty.

    The reference loads a missing file as an empty set and ``contains``
    then matches everything (``RankingSearchSet.java:40-48,73-82``) — the
    caller treats ``None`` as "no constraint" to mirror that.
    """
    path = _set_dir(index_root, name)
    if not os.path.isdir(path):
        return None
    df = spark.read.parquet(path).select("conv_id")
    if not df.take(1):
        return None
    return df
