"""Stupid Backoff LM scoring tests: Spark must equal a pure-Python replay
(math.log, exact counts, pos-ordered left fold) bit for bit; LM-corpus-like
documents must score lower pseudo-perplexity than off-domain ones."""

import math
import re

import pytest

from marginaliasearch_spark.operators import lm

LM_DOCS = [
    (100, "the cat sat on the mat"),
    (101, "the cat ate the fish"),
    (102, "a dog sat on a log"),
]
POOL_DOCS = [
    (1, "the cat sat on the mat"),          # in-domain, all bigrams seen
    (2, "the dog sat on the log"),          # partly seen
    (3, "quantum flux capacitor overload"), # fully out-of-vocabulary
    (4, "zzz"),                             # single token → no transitions
    (5, ""),                                # no tokens
]


def _toks(t):
    return [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w and len(w) < 64]


def _brute(pool, lm_docs, alpha=0.4):
    uni, big = {}, {}
    for _, t in lm_docs:
        tl = _toks(t)
        for w in tl:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(tl, tl[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    n, v = sum(uni.values()), len(uni)
    out = {}
    for doc, t in pool:
        tl = _toks(t)
        if len(tl) < 2:
            continue
        acc = 0.0
        for a, b in zip(tl, tl[1:]):  # ascending position order
            if (a, b) in big and a in uni:
                acc = acc + math.log(float(big[(a, b)]) / float(uni[a]))
            else:
                acc = acc + math.log(
                    alpha * (float(uni.get(b, 0)) + 1.0) / float(n + v)
                )
        lp = round(acc, 6)
        out[doc] = (len(tl) - 1, lp, round(math.exp(-lp / (len(tl) - 1)), 6))
    return out


@pytest.fixture(scope="module")
def frames(spark):
    pool = spark.createDataFrame(POOL_DOCS, "doc_id long, text string").cache()
    lmd = spark.createDataFrame(LM_DOCS, "doc_id long, text string").cache()
    return pool, lmd


def test_equals_pure_python_replay(spark, frames):
    pool, lmd = frames
    got = {
        r["doc_id"]: (r["n_trans"], r["logprob"], r["ppl"])
        for r in lm.stupid_backoff_scores(pool, lmd).collect()
    }
    assert got == _brute(POOL_DOCS, LM_DOCS)


def test_short_docs_omitted(spark, frames):
    pool, lmd = frames
    ids = {r["doc_id"] for r in lm.stupid_backoff_scores(pool, lmd).collect()}
    assert ids == {1, 2, 3}


def test_in_domain_scores_lower_ppl(spark, frames):
    pool, lmd = frames
    ppl = {
        r["doc_id"]: r["ppl"]
        for r in lm.stupid_backoff_scores(pool, lmd).collect()
    }
    assert ppl[1] < ppl[2] < ppl[3]


def test_partitioning_invariance(spark, frames):
    pool, lmd = frames
    a = sorted(
        (r["doc_id"], r["logprob"], r["ppl"])
        for r in lm.stupid_backoff_scores(pool.repartition(1), lmd).collect()
    )
    b = sorted(
        (r["doc_id"], r["logprob"], r["ppl"])
        for r in lm.stupid_backoff_scores(
            pool.repartition(5, "doc_id"), lmd.repartition(3)
        ).collect()
    )
    assert a == b


def test_alpha_changes_only_backoff(spark, frames):
    pool, lmd = frames
    base = {
        r["doc_id"]: r["logprob"]
        for r in lm.stupid_backoff_scores(pool, lmd, alpha=0.4).collect()
    }
    half = {
        r["doc_id"]: r["logprob"]
        for r in lm.stupid_backoff_scores(pool, lmd, alpha=0.2).collect()
    }
    assert base[1] == half[1]          # fully-seen doc: no backoff terms
    assert half[3] < base[3]           # fully-OOV doc: every term shrinks


def test_ppl_buckets_exact_thirds(spark):
    import pandas as pd

    from marginaliasearch_spark.operators.lm import ppl_buckets

    # 9 docs with distinct ppl -> exact thirds; ties broken by doc_id
    pdf = pd.DataFrame(
        {"doc_id": range(9), "ppl": [5.0, 1.0, 3.0, 9.0, 7.0, 2.0, 8.0, 4.0, 6.0]}
    )
    out = (
        ppl_buckets(spark.createDataFrame(pdf), n_parts=4)
        .toPandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    assert list(out.doc_id) == [1, 5, 2, 7, 0, 8, 4, 6, 3]  # by ppl asc
    assert list(out.bucket) == [1, 1, 1, 2, 2, 2, 3, 3, 3]
    assert list(out.tranche) == ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3
    assert list(out["rank"]) == list(range(1, 10))


def test_ppl_buckets_partition_invariance(spark):
    import pandas as pd

    from marginaliasearch_spark.operators.lm import ppl_buckets

    pdf = pd.DataFrame(
        {"doc_id": range(100), "ppl": [(i * 37) % 100 + 0.5 for i in range(100)]}
    )
    base = None
    for n_parts in (1, 3, 32):
        out = (
            ppl_buckets(spark.createDataFrame(pdf), n_parts=n_parts)
            .toPandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        if base is None:
            base = out
        else:
            assert out.equals(base), n_parts


def test_ppl_buckets_tie_break_by_doc_id(spark):
    import pandas as pd

    from marginaliasearch_spark.operators.lm import ppl_buckets

    pdf = pd.DataFrame({"doc_id": [3, 1, 2], "ppl": [2.0, 2.0, 2.0]})
    out = (
        ppl_buckets(spark.createDataFrame(pdf), n_parts=2)
        .toPandas()
        .sort_values("rank")
    )
    assert list(out.doc_id) == [1, 2, 3]
