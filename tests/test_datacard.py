"""Corpus data-card report: exact dup counts, token rule, percentile
parity with the DuckDB twin, and dup-column exercise."""

import duckdb

from marginaliasearch_spark.functions.sql_oracles import datacard_sql
from marginaliasearch_spark.operators.datacard import data_card

DOCS = [
    # (doc_id, text, lang, source, n_chars) — two exact dups in en/a,
    # whitespace variants that must NOT count as dups, empty text
    (1, "alpha beta  gamma", "en", "a", 17),
    (2, "alpha beta  gamma", "en", "a", 17),
    (3, "alpha beta gamma", "en", "a", 16),
    (4, "alpha beta  gamma", "en", "a", 17),
    (5, "", "en", "b", 0),
    (6, "  un deux\ttrois ", "fr", "a", 16),
    (7, "solo", "fr", "a", 4),
]
SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def test_data_card_exact(spark):
    got = {
        (r["lang"], r["source"]): r.asDict()
        for r in data_card(spark.createDataFrame(DOCS, SCHEMA)).collect()
    }
    en_a = got[("en", "a")]
    assert en_a["n_docs"] == 4
    assert en_a["n_exact_dups"] == 2  # three identical texts -> 2 dups
    assert en_a["total_tokens"] == 12  # 3 tokens per doc, double spaces ignored
    assert en_a["total_chars"] == 17 + 17 + 16 + 17
    assert got[("en", "b")]["total_tokens"] == 0  # empty text -> 0 tokens
    fr_a = got[("fr", "a")]
    assert fr_a["total_tokens"] == 4  # leading/trailing/tab whitespace
    assert fr_a["p50_chars"] == 10.0  # interpolated between 4 and 16
    assert fr_a["p90_chars"] == 14.8


def test_data_card_matches_duckdb_twin(spark):
    df = spark.createDataFrame(DOCS, SCHEMA)
    got = sorted(tuple(r) for r in data_card(df).collect())
    con = duckdb.connect()
    con.register("documents", df.toPandas())
    want = sorted(tuple(r) for r in con.sql(datacard_sql()).fetchall())
    assert got == want
