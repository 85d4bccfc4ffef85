"""Corpus data-card reporting — the summary a training-data pipeline
publishes with every release (per-slice doc/token counts, duplicate
rates, length percentiles; cf. "Datasheets for Datasets", Gebru et al.
2021, and the data cards shipped with The Pile / ROOTS / Dolma).

One map-side-combinable groupBy over a narrow projection: every
aggregate here (counts, distinct-hash counts, sums, exact percentiles)
is a partial-aggregatable JVM expression, so the card costs a single
shuffle of partially-aggregated slice rows no matter the corpus size.
``percentile`` (exact, interpolated — chosen over ``approx_percentile``
for oracle parity) aggregates a value→count map internally, so its
state scales with DISTINCT document lengths (bounded, ~10^6), not with
corpus rows — safe at 100 TB.

Reference analogue: the control service's per-crawl summary screens
(domain/document counts by state) — here re-shaped to the corpus-slice
columns an LLM-data release documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def data_card(
    docs: DataFrame,
    text_col: str = "text",
    group_cols: tuple[str, ...] = ("lang", "source"),
) -> DataFrame:
    """One row per corpus slice: doc count, exact-duplicate count
    (docs minus distinct text md5s), char/whitespace-token totals, and
    exact interpolated p50/p90 character lengths.

    Token rule: non-empty ``\\s+`` splits — the same whitespace floor
    ``textstats.token_counts`` uses; the DuckDB twin
    (``sql_oracles.datacard_sql``) restates it with
    ``string_split_regex`` + ``list_filter``.
    """
    from .textstats import ws_token_count

    toks = ws_token_count(F.col(text_col))
    # char length: use the table's stored n_chars when present (the
    # driver schema carries it, == length(text) there), else derive from
    # text_col — the operator's parameters alone must be sufficient
    nc = (
        F.col("n_chars")
        if "n_chars" in docs.columns
        else F.length(F.col(text_col)).cast("long")
    )
    return docs.groupBy(*[F.col(c) for c in group_cols]).agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.count(F.lit(1)) - F.countDistinct(F.md5(F.col(text_col)))).alias(
            "n_exact_dups"
        ),
        F.sum(nc).alias("total_chars"),
        F.sum(toks).alias("total_tokens"),
        F.round(F.percentile(nc, F.lit(0.5)), 6).alias("p50_chars"),
        F.round(F.percentile(nc, F.lit(0.9)), 6).alias("p90_chars"),
    )
