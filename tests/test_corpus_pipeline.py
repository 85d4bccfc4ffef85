"""Decontamination, span removal, and the composite filter chain.

Each operator is checked against a driver-side brute-force reimplementation
on hand-built corpora with known structure (shared windows straddling the
hash split, a planted duplicated span, one document per filter gate), plus
invariants (split-purity of contamination hits, removal never touching
non-covered tokens).
"""

import hashlib
import re

import pytest
from pyspark.sql import functions as F

from marginaliasearch_spark.operators import decontam, dedup, sampling, textstats


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _bucket(doc_id: int, salt: str = "split-v1") -> int:
    h = hashlib.md5(f"{salt}:{doc_id}".encode()).hexdigest()[:15]
    return int(h, 16) % 100


def _toks(text: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t and len(t) < 64]


# --- contamination ----------------------------------------------------------


def test_contamination_brute_force(spark):
    # ids 0..199: hash split puts a few in val/test (buckets >= 98)
    ids = list(range(200))
    evals = [i for i in ids if _bucket(i) >= 98]
    assert evals, "need at least one eval doc for the test to bite"
    # every doc gets a unique filler plus a shared phrase for even ids
    rows = []
    for i in ids:
        phrase = "alpha beta gamma delta" if i % 2 == 0 else f"solo{i} x{i} y{i} z{i}"
        rows.append((i, f"{phrase} filler{i} tail{i}"))
    out = decontam.contamination(_docs(spark, rows), shingle_width=3)
    got = {r["doc_id"]: r["n_shared"] for r in out.collect()}
    # brute force: distinct whitespace 3-gram sets, eval union, train overlap
    def grams(text):
        t = text.lower().split()
        if not t:
            return set()
        if len(t) < 3:
            return {tuple(t)}
        return {tuple(t[i : i + 3]) for i in range(len(t) - 2)}

    ev = set()
    for i, txt in rows:
        if _bucket(i) >= 98:
            ev |= grams(txt)
    want = {}
    for i, txt in rows:
        if _bucket(i) >= 98:
            continue
        n = len(grams(txt) & ev)
        if n:
            want[i] = n
    assert got == want
    assert want, "planted shared phrase must produce contamination"
    # no eval doc may appear in the output (split purity)
    assert not set(got) & set(evals)


def test_contamination_deterministic_under_repartition(spark):
    rows = [(i, f"common words here plus unique{i}") for i in range(60)]
    a = decontam.contamination(_docs(spark, rows)).collect()
    b = decontam.contamination(_docs(spark, rows).repartition(7)).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


# --- duplicated-span removal -------------------------------------------------


def test_span_removal_planted_span(spark):
    span = " ".join(f"s{k}" for k in range(8))  # 8-token duplicated run
    rows = [
        (1, f"pre1 {span} post1 post1b"),
        (2, f"pre2a pre2b {span} post2"),
        (3, "totally unrelated words only here"),
    ]
    out = {
        r["doc_id"]: r
        for r in dedup.remove_duplicate_spans(_docs(spark, rows)).collect()
    }
    assert out[1]["n_tokens"] == 11 and out[1]["n_removed"] == 8
    assert out[2]["n_tokens"] == 11 and out[2]["n_removed"] == 8
    assert out[3]["n_removed"] == 0
    assert out[1]["clean_text"] == "pre1 post1 post1b"
    assert out[2]["clean_text"] == "pre2a pre2b post2"
    assert out[3]["clean_text"] == "totally unrelated words only here"


def test_span_removal_overlapping_runs_merge(spark):
    # a 10-token duplicated region => windows at starts 1..3 merge into one
    # island covering all 10 tokens
    region = " ".join(f"r{k}" for k in range(10))
    rows = [(1, f"{region} tail1"), (2, f"{region} tail2")]
    out = {
        r["doc_id"]: r
        for r in dedup.remove_duplicate_spans(_docs(spark, rows)).collect()
    }
    for d in (1, 2):
        assert out[d]["n_removed"] == 10
        assert out[d]["clean_text"] == f"tail{d}"


def test_span_removal_matches_spans_arithmetic(spark):
    # on driver data: n_removed must equal the summed span lengths
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    spans = (
        dedup.duplicate_spans(docs)
        .groupBy("doc_id")
        .agg(F.sum("span_len").alias("covered"))
    )
    rem = dedup.remove_duplicate_spans(docs).select("doc_id", "n_removed")
    j = rem.join(spans, "doc_id", "left").fillna(0, ["covered"]).collect()
    assert j, "driver corpus must produce rows"
    assert all(r["n_removed"] == r["covered"] for r in j)
    assert any(r["n_removed"] > 0 for r in j), "sf0.001 has duplicated spans"


# --- filter chain ------------------------------------------------------------


def _mk_text_for_gate(bit: int) -> str:
    ok_words = ("the quick brown fox jumps over a lazy dog near the old barn "
                * 5).split()  # 60 words, stopwords present, no punct
    base = " ".join(ok_words)
    if bit == 0:
        return base
    if bit == 1:  # too few words
        return "the short one has few words only"
    if bit == 2:  # mean word length out of range
        return " ".join(["ab"] * 60)  # mwl=2 < 3, but keeps stopword gate ok? no
    if bit == 4:  # punctuation-dense
        return " ".join(["the!!!"] * 60)
    if bit == 8:  # no stopwords
        return " ".join(f"zz{i}word" for i in range(60))
    if bit == 16:  # duplicated lines
        return "\n".join(["the same line of words here now ok"] * 10)
    if bit == 64:  # one dominating bigram
        return " ".join(["the fox"] * 40)
    raise AssertionError(bit)


def test_filter_chain_gates(spark):
    rows = [(0, _mk_text_for_gate(0)), (1, _mk_text_for_gate(1)),
            (4, _mk_text_for_gate(4)), (8, _mk_text_for_gate(8)),
            (16, _mk_text_for_gate(16)), (64, _mk_text_for_gate(64))]
    out = {r["doc_id"]: r for r in textstats.filter_chain(_docs(spark, rows)).collect()}
    assert out[0]["reasons"] == 0 and out[0]["keep"]
    for bit in (1, 4, 8, 16, 64):
        assert out[bit]["reasons"] & bit, (bit, out[bit]["reasons"])
        assert not out[bit]["keep"]


def test_filter_chain_consistent_with_signal_operators(spark):
    # reasons must be re-derivable from the published signal tables —
    # guards the shared-column refactor (one projection == two operators)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    q = {r["doc_id"]: r for r in textstats.quality_scores(docs).collect()}
    rep = {r["doc_id"]: r for r in textstats.repetition_signals(docs).collect()}
    out = textstats.filter_chain(docs).collect()
    assert out
    for r in out:
        d = r["doc_id"]
        want = 0
        if not (50 <= q[d]["n_words"] <= 100000):
            want |= 1
        if not (3.0 <= q[d]["mean_word_len"] <= 10.0):
            want |= 2
        if q[d]["punct_frac"] > 0.2:
            want |= 4
        if q[d]["stop_frac"] < 0.01:
            want |= 8
        if rep[d]["dup_line_frac"] > 0.3:
            want |= 16
        if rep[d]["dup_char_frac"] > 0.2:
            want |= 32
        if rep[d]["top_bigram_frac"] > 0.18:
            want |= 64
        assert r["reasons"] == want and r["keep"] == (want == 0)
    assert {r["keep"] for r in out} == {True, False}, "both classes present"


# --- pretrain manifest (filter -> dedup -> split composition) ---------------


def test_pretrain_manifest_brute_force(spark):
    """The composite manifest must equal a driver-side recomputation from
    the already-tested stage operators: filter_chain survivors, min-id per
    exact text group, md5 hash split, per-(split, lang) sums."""
    from marginaliasearch_spark.plans.pretrain import pretrain_manifest

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # plant exact duplicates across split/lang boundaries so the dedup
    # stage genuinely bites: every third doc gets one of 7 shared texts,
    # built from all-distinct tokens (plus one stopword) so every filter
    # gate passes and the planted docs reach the dedup stage
    shared = {
        v: "the " + " ".join(f"zq{v}n{i}" for i in range(79)) for v in range(7)
    }
    variant = None
    for v, txt in shared.items():
        cond = F.col("doc_id") % 7 == v
        variant = F.when(cond, txt) if variant is None else variant.when(cond, txt)
    planted = docs.withColumn(
        "text",
        F.when(F.col("doc_id") % 3 == 0, variant).otherwise(F.col("text")),
    )
    got = {
        (r["split"], r["lang"]): (
            r["n_docs"], r["sum_words"], r["sum_chars"], r["id_checksum"]
        )
        for r in pretrain_manifest(planted).collect()
    }

    rows = planted.select("doc_id", "lang", "text").collect()
    mask = {
        r["doc_id"]: r
        for r in textstats.filter_chain(planted).collect()
    }
    kept = [r for r in rows if mask[r["doc_id"]]["reasons"] == 0]
    canon: dict[str, int] = {}
    for r in kept:
        h = hashlib.md5(r["text"].lower().encode()).hexdigest()
        canon[h] = min(canon.get(h, r["doc_id"]), r["doc_id"])
    surv = [r for r in kept if canon[
        hashlib.md5(r["text"].lower().encode()).hexdigest()] == r["doc_id"]]
    assert len(surv) < len(kept), "dedup stage must bite"
    want: dict[tuple, list] = {}
    for r in surv:
        b = _bucket(r["doc_id"])
        split = "train" if b < 98 else ("val" if b < 99 else "test")
        agg = want.setdefault((split, r["lang"]), [0, 0, 0, 0])
        agg[0] += 1
        agg[1] += mask[r["doc_id"]]["n_words"]
        agg[2] += len(r["text"])
        agg[3] += r["doc_id"]
    assert got == {k: tuple(v) for k, v in want.items()}


def test_pretrain_manifest_partitioning_invariant(spark):
    """Manifest rows must be byte-identical regardless of input layout —
    the resumability claim (a re-run over a differently-bucketed copy of
    the corpus publishes the same manifest)."""
    from marginaliasearch_spark.plans.pretrain import pretrain_manifest

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = {tuple(r) for r in pretrain_manifest(docs).collect()}
    b = {tuple(r) for r in pretrain_manifest(docs.repartition(17)).collect()}
    assert a == b and a
