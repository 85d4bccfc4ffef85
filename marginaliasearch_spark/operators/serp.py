"""SERP result deduplication (search-service UrlDeduplicator parity).

Reference: ``code/services-application/search-service/java/nu/marginalia/
search/results/UrlDeduplicator.java`` — walking the ranked result list in
order, a result is dropped when (1) its superficial key (URL path +
title) was already seen, else (2) its 64-bit ``dataHash`` is within
hamming distance < 2 (``LSH_SIMILARITY_THRESHOLD``) of ANY previously
*retained* hash (EasyLSH; a zero hash always passes and is never
remembered), else (3) its domain already yielded ``resultsPerKey``
results that reached this rule. State updates mirror the reference's
short-circuit exactly: the superficial key is remembered even for
dropped results; the hash and the domain count advance only for results
that passed the earlier rules.

Spark shape: this is per-SERP-page post-processing over the top-k rows —
the reference runs it on the request thread, and k is bounded by the
page size, so the honest distributed form is one ``applyInPandas`` group
per page (the chain is order-sequential by construction; parallelism
comes from processing many pages, not from inside one page).
"""

from __future__ import annotations

from typing import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["dedupe_results", "LSH_SIMILARITY_THRESHOLD"]

LSH_SIMILARITY_THRESHOLD = 2


def _dedupe_page(
    pdf: pd.DataFrame,
    key_cols: Sequence[str],
    hash_col: str,
    group_col: str,
    results_per_key: int,
    max_hamming: int,
) -> pd.DataFrame:
    seen_keys: set = set()
    kept_hashes: list[int] = []
    group_counts: dict = {}
    retained = []
    for row in pdf.itertuples(index=False):
        d = row._asdict()
        key = tuple(d[c] for c in key_cols)
        sup_ok = key not in seen_keys
        seen_keys.add(key)
        if not sup_ok:
            retained.append(False)
            continue
        h = int(d[hash_col]) & 0xFFFFFFFFFFFFFFFF
        if h == 0:
            lsh_ok = True
        else:
            lsh_ok = all(
                bin(h ^ other).count("1") >= max_hamming
                for other in kept_hashes
            )
            if lsh_ok:
                kept_hashes.append(h)
        if not lsh_ok:
            retained.append(False)
            continue
        g = d[group_col]
        group_counts[g] = group_counts.get(g, 0) + 1
        retained.append(group_counts[g] <= results_per_key)
    out = pdf.copy()
    out["retained"] = retained
    return out


def dedupe_results(
    results: DataFrame,
    order_col: str = "rank",
    key_cols: Sequence[str] = ("superficial",),
    hash_col: str = "data_hash",
    group_col: str = "group",
    page_col: str | None = None,
    results_per_key: int = 3,
    max_hamming: int = LSH_SIMILARITY_THRESHOLD,
) -> DataFrame:
    """Apply the three-rule chain to ranked results; adds ``retained``.

    ``page_col`` groups independent SERP pages (each deduped in its own
    task); ``None`` treats the whole relation as one page — fine for a
    single query's top-k, which is what the reference processes."""
    schema = T.StructType(
        list(results.schema) + [T.StructField("retained", T.BooleanType())]
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.drop(columns=["_serp_page"], errors="ignore")
        return _dedupe_page(
            pdf.sort_values(order_col, kind="stable"),
            key_cols,
            hash_col,
            group_col,
            results_per_key,
            max_hamming,
        )

    if page_col is None:
        grouped = results.withColumn("_serp_page", F.lit(1)).groupBy(
            "_serp_page"
        )
    else:
        grouped = results.groupBy(page_col)
    return grouped.applyInPandas(run, schema)
