"""Distributed BPE induction vs a pure-Python reference implementation
(Sennrich et al. 2016 greedy algorithm with the same freq-DESC, pair-ASC
tie-break): merges AND encodings must match exactly."""

import hashlib
from collections import Counter

from marginaliasearch_spark.operators import bpe


def _ref_bpe(texts, n_merges):
    vocab = Counter()
    for t in texts:
        for w in t.lower().split():
            vocab[tuple(list(w) + [bpe.END])] += 1
    merges = []
    for rank in range(n_merges):
        pc = Counter()
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += c
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (l, r), freq = best
        if freq < 2:
            break
        merges.append((rank, l, r, freq))
        nv = Counter()
        for syms, c in vocab.items():
            j, res = 0, []
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == l and syms[j + 1] == r:
                    res.append(l + r)
                    j += 2
                else:
                    res.append(syms[j])
                    j += 1
            nv[tuple(res)] += c
        vocab = nv
    return merges


def _ref_encode(text, merges):
    toks = []
    for w in text.lower().split():
        syms = list(w) + [bpe.END]
        for l, r in merges:
            j, res = 0, []
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == l and syms[j + 1] == r:
                    res.append(l + r)
                    j += 2
                else:
                    res.append(syms[j])
                    j += 1
            syms = res
        toks.extend(syms)
    return toks


TEXTS = [
    "low lower lowest low low",
    "new newer newest new newer",
    "wide wider widest low newer",
    "the lowly newt went lower and lower",
]


def test_learn_bpe_matches_reference(spark):
    docs = spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id long, text string"
    )
    got = [
        (r["rank"], r["left"], r["right"], r["freq"])
        for r in bpe.learn_bpe(docs, n_merges=12).orderBy("rank").collect()
    ]
    want = _ref_bpe(TEXTS, 12)
    assert got == want
    assert len(got) >= 6, "corpus must drive several merges"


def test_bpe_encode_matches_reference(spark):
    docs = spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id long, text string"
    )
    learned = [
        (r["left"], r["right"])
        for r in bpe.learn_bpe(docs, n_merges=8).orderBy("rank").collect()
    ]
    out = {
        r["doc_id"]: (r["bpe_tokens"], r["stream_md5"])
        for r in bpe.bpe_encode(docs, learned).collect()
    }
    for i, t in enumerate(TEXTS):
        toks = _ref_encode(t, learned)
        assert out[i] == (
            len(toks),
            hashlib.md5(" ".join(toks).encode()).hexdigest(),
        )


def test_learn_bpe_partitioning_invariant(spark):
    docs = spark.createDataFrame(
        list(enumerate(TEXTS * 3)), "doc_id long, text string"
    )
    a = bpe.learn_bpe(docs, n_merges=6).collect()
    b = bpe.learn_bpe(docs.repartition(7), n_merges=6).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_pretrained_merges_deterministic_and_nonempty():
    a = bpe.pretrained_merges()
    b = bpe.pretrained_merges()
    assert a == b and len(a) == 24
    # every merge must have been derivable from the seed (freq >= 2 rule)
    assert all(isinstance(l, str) and isinstance(r, str) for l, r in a)


def test_pretrained_encode_matches_pure_python(spark):
    merges = bpe.pretrained_merges()
    texts = TEXTS + ["spark join query window", ""]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r["doc_id"]: (r["bpe_tokens"], r["stream_md5"])
           for r in bpe.bpe_encode(df, merges).collect()}
    import hashlib
    for i, t in enumerate(texts):
        toks = _ref_encode(t, merges)
        assert got[i] == (
            len(toks), hashlib.md5(" ".join(toks).encode()).hexdigest()
        )


def test_recursive_cte_oracle_matches_engine(spark):
    import duckdb
    import pandas as pd
    from marginaliasearch_spark.functions.sql_oracles import bpe_encode_sql

    merges = bpe.pretrained_merges()
    texts = TEXTS + ["spark join query window the lowest"]
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r["doc_id"], r["bpe_tokens"], r["stream_md5"])
        for r in bpe.bpe_encode(df, merges).collect()
    )
    con = duckdb.connect()
    con.register("documents_src", pd.DataFrame(rows, columns=["doc_id", "text"]))
    con.execute("CREATE VIEW documents AS SELECT * FROM documents_src")
    want = sorted(map(tuple, con.execute(bpe_encode_sql(merges)).fetchall()))
    assert got == want
