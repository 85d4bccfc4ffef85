"""SERP dedup chain parity (UrlDeduplicator.java).

Pins the three-rule first-wins chain and its state subtleties: keys
remembered even for dropped rows, zero hashes pass unremembered, hashes
remembered past rules 1-2 even when the row is then capped, per-group
counts advancing on capped rows.
"""

from __future__ import annotations

import pandas as pd

from marginaliasearch_spark.operators.serp import dedupe_results


def _run(spark, rows, **kw):
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["rank", "superficial", "data_hash", "grp"])
    )
    out = dedupe_results(
        df,
        order_col="rank",
        key_cols=("superficial",),
        hash_col="data_hash",
        group_col="grp",
        **kw,
    ).toPandas()
    return dict(zip(out["rank"], out.retained))


def test_superficial_first_wins(spark):
    rows = [(1, "k", 100, "a"), (2, "k", 200, "b"), (3, "x", 300, "c")]
    got = _run(spark, rows, results_per_key=5)
    assert got == {1: True, 2: False, 3: True}


def test_lsh_hamming_chain(spark):
    # 0b1000 vs 0b1001: distance 1 -> dropped; 0b1011 vs 0b1000 is
    # distance 2 -> retained (the dropped middle hash was NOT remembered)
    rows = [(1, "a", 0b1000, "g"), (2, "b", 0b1001, "g"), (3, "c", 0b1011, "g")]
    got = _run(spark, rows, results_per_key=5)
    assert got == {1: True, 2: False, 3: True}


def test_zero_hash_passes_and_is_not_remembered(spark):
    rows = [(1, "a", 0, "g"), (2, "b", 0, "g"), (3, "c", 1, "g")]
    got = _run(spark, rows, results_per_key=5)
    assert got == {1: True, 2: True, 3: True}


def test_group_cap_and_capped_hash_still_blocks(spark):
    # ranks 1,2 fill group g (cap 2); rank 3 passes rules 1-2 (distant
    # hash) but is capped — ITS hash is remembered, so rank 4 (hamming 1
    # from rank 3's hash, fresh group) is dropped by LSH, exactly as the
    # reference's state updates dictate
    rows = [
        (1, "a", 1 << 10, "g"),
        (2, "b", 1 << 20, "g"),
        (3, "c", 1 << 30, "g"),
        (4, "d", (1 << 30) | 1, "h"),
    ]
    got = _run(spark, rows, results_per_key=2)
    assert got == {1: True, 2: True, 3: False, 4: False}


def test_dropped_superficial_key_still_blocks_later_dup(spark):
    # rank 2 dropped by LSH; rank 3 repeats rank 2's key -> dropped by
    # rule 1 (keys are remembered even for dropped rows)
    rows = [(1, "a", 0b1000, "g"), (2, "b", 0b1001, "g"), (3, "b", 1 << 40, "g")]
    got = _run(spark, rows, results_per_key=5)
    assert got == {1: True, 2: False, 3: False}


def test_pages_dedupe_independently(spark):
    rows = [
        (1, "k", 100, "g", "p1"),
        (2, "k", 100, "g", "p2"),  # same key, other page -> retained
    ]
    df = spark.createDataFrame(
        pd.DataFrame(
            rows, columns=["rank", "superficial", "data_hash", "grp", "page"]
        )
    )
    out = dedupe_results(
        df,
        order_col="rank",
        key_cols=("superficial",),
        hash_col="data_hash",
        group_col="grp",
        page_col="page",
    ).toPandas()
    assert out.retained.all()
