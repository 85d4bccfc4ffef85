"""NULL-text parity between operators and their DuckDB oracle twins.

The driver's sf fixtures carry no NULL text, so the 144/144 sweep cannot
see a NULL-policy drift between an entry and its oracle SQL (the r4
ADVICE medium finding: operators coalesce NULL text to the empty string,
but three twins still propagated SQL NULL — DuckDB string_agg silently
skips NULL elements and NULL token counts sort NULLS LAST).  This test
runs the SAME entry query and entry oracle over a tiny documents table
that DOES carry NULL text and asserts the value multisets match, pinning
the shared NULL policy on both sides.
"""

import decimal
import os

import duckdb
import numpy as np
import pandas as pd
import pytest


def _entry_mod():
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import __spark_entry__ as m

    return m


ENTRIES = ["sample_length_buckets", "sft_pairs", "dedup_conv_prefix"]


def _cv(v):
    if isinstance(v, np.integer):
        return int(v)
    if isinstance(v, (np.floating, float)):
        # NULL→NaN round-trips through pandas on BOTH engines; NaN != NaN
        # would fail rows that agree
        return None if v != v else float(v)
    if isinstance(v, decimal.Decimal):
        return float(v) if v % 1 else int(v)
    if isinstance(v, (np.ndarray, list, tuple)):
        return tuple(_cv(x) for x in v)
    return v


def _canon(df: pd.DataFrame):
    cols = sorted(df.columns)
    return sorted(
        (tuple(_cv(v) for v in t) for t in df[cols].itertuples(index=False)),
        key=repr,
    )


@pytest.fixture(scope="module")
def null_docs_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("nulldocs")
    rows = []
    for i in range(40):
        # NULL text lands on a context turn, a response turn, and a
        # prefix-digest turn (doc_id % 5 in {1, 2}) across several convs
        text = None if i % 9 in (1, 2) else f"word{i} alpha beta " * (i % 4 + 1)
        rows.append({"doc_id": i, "text": text, "lang": "en",
                     "source": "synth", "n_chars": len(text or "")})
    pd.DataFrame(rows).to_parquet(os.path.join(d, "documents.parquet"))
    return str(d)


@pytest.mark.parametrize("name", ENTRIES)
def test_null_text_matches_oracle(spark, null_docs_dir, name):
    m = _entry_mod()
    sdf = m.queries()[name](spark, null_docs_dir).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{null_docs_dir}/documents.parquet'"
    )
    odf = con.execute(m.oracle_sql()[name]).df()
    assert len(sdf) == len(odf), (len(sdf), len(odf))
    assert sorted(sdf.columns) == sorted(odf.columns)
    a, b = _canon(sdf), _canon(odf)
    assert a == b, [(x, y) for x, y in zip(a, b) if x != y][:5]
