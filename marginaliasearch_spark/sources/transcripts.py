"""Deterministic transcript-corpus generators (FIXTURES.md T1a-T1d).

Input schema is fixed by the engine contract:
``(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp)``. All generators are seeded and wall-clock-free; the large
Zipf corpus is generated *inside Spark* with a counter-based hash RNG so the
output is identical at any parallelism level (a core determinism requirement
— see SURVEY §8 risk 5).
"""

from __future__ import annotations

import datetime
import itertools

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)

_EPOCH = datetime.datetime(2025, 1, 1)
_ROLES = ["user", "assistant", "system", "tool"]


def _df_from_rows(spark: SparkSession, rows: list[tuple]) -> DataFrame:
    return spark.createDataFrame(rows, schema=TRANSCRIPT_SCHEMA)


def _ts(i: int) -> datetime.datetime:
    return _EPOCH + datetime.timedelta(seconds=int(i))


# ---------------------------------------------------------------------------
# T1a — factor oracle: conversation i contains token "factor<f>" iff f | i.
# Port of the reference's arithmetic smoke test
# (IndexQueryServiceIntegrationSmokeTest.java:105-166: docs are ints 1..512,
# words are their factors; "2 3 5 -4" must return multiples of 30 not
# divisible by 4) — set correctness checkable without trusting the engine.
# ---------------------------------------------------------------------------


def factor_corpus(spark: SparkSession, n: int = 512) -> DataFrame:
    rows = []
    for i in range(1, n + 1):
        factors = [f for f in range(1, n + 1) if i % f == 0]
        tokens = [f"factor{f}" for f in factors]
        n_turns = 1 + (i % 4)  # deterministic 1..4 turns
        chunks = [tokens[j::n_turns] for j in range(n_turns)]
        for t, chunk in enumerate(chunks):
            rows.append(
                (
                    f"conv{i}",
                    t,
                    _ROLES[t % 4],
                    " ".join(chunk),
                    "",
                    _ts(i * 100 + t),
                )
            )
    return _df_from_rows(spark, rows)


# ---------------------------------------------------------------------------
# T1b — BM25 score-oracle corpus: small vocabulary, controlled tf/df, multi
# turn so position padding is exercised. Ranked against the independent numpy
# implementation in oracle/bm25_ref.py.
# ---------------------------------------------------------------------------


def bm25_corpus(spark: SparkSession, n_convs: int = 200, seed: int = 42) -> DataFrame:
    rng = np.random.default_rng(seed)
    vocab = [f"word{k:02d}" for k in range(50)]
    # Zipf-ish selection weights so dfs vary widely
    weights = 1.0 / np.arange(1, 51) ** 1.1
    weights /= weights.sum()
    rows = []
    for i in range(n_convs):
        n_turns = int(rng.integers(1, 4))
        for t in range(n_turns):
            n_tok = int(rng.integers(5, 60))
            toks = rng.choice(vocab, size=n_tok, p=weights)
            rows.append(
                (
                    f"bm{i:04d}",
                    t,
                    _ROLES[int(rng.integers(0, 4))],
                    " ".join(toks.tolist()),
                    "",
                    _ts(i * 10 + t),
                )
            )
    return _df_from_rows(spark, rows)


# ---------------------------------------------------------------------------
# T1c — Zipf skew corpus at scale, generated distributively. Token k is drawn
# with p ∝ 1/k^s; the head terms appear in >80% of documents, which is the
# skew the salted build must survive. Counter-based splitmix64 hashing makes
# every token a pure function of (seed, turn_id, slot) — independent of
# partitioning, so two runs at different parallelism produce identical data.
# ---------------------------------------------------------------------------


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z = x
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _hash01(key: np.ndarray) -> np.ndarray:
    return _splitmix64(key).astype(np.float64) / float(2**64)


def zipf_corpus(
    spark: SparkSession,
    n_convs: int = 10_000,
    turns_per_conv: int = 10,
    tokens_per_turn: int = 40,
    vocab_size: int = 20_000,
    s: float = 1.1,
    seed: int = 42,
) -> DataFrame:
    """Distributed deterministic Zipf corpus (~n_convs*turns_per_conv turns)."""
    probs = 1.0 / np.arange(1, vocab_size + 1, dtype=np.float64) ** s
    probs /= probs.sum()
    cdf = np.cumsum(probs)
    n_turns_total = n_convs * turns_per_conv
    base = np.uint64((seed * 0xA076_1D64_78BD_642F) % (1 << 64))

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy(dtype=np.int64).astype(np.uint64)
            conv = (ids // np.uint64(turns_per_conv)).astype(np.int64)
            turn = (ids % np.uint64(turns_per_conv)).astype(np.int64)
            # (n_rows, tokens_per_turn) u values
            slot = np.arange(tokens_per_turn, dtype=np.uint64)
            key = base + ids[:, None] * np.uint64(1_000_003) + slot[None, :]
            u = _hash01(key.ravel()).reshape(len(ids), tokens_per_turn)
            tok_idx = np.searchsorted(cdf, u)  # Zipf via inverse CDF
            texts = [
                " ".join(f"z{j}" for j in row) for row in tok_idx
            ]
            # realistic agent-transcript role mix (random-uniform roles
            # would mark ~3/4 of postings as priority-flagged and distort
            # the prio tier): turn 0 is 'system' for 1 conv in 8, turns
            # alternate user/assistant, ~5% of turns are 'tool'
            u = _splitmix64(ids + np.uint64(17))
            role_idx = np.where(turn % 2 == 0, 0, 1).astype(np.int64)  # user/assistant
            role_idx = np.where(
                (turn == 0) & (conv % 8 == 0), 2, role_idx
            )  # system opener
            role_idx = np.where(
                (u % np.uint64(20) == 0) & (turn > 0), 3, role_idx
            )  # tool (_ROLES order: user, assistant, system, tool)
            yield pd.DataFrame(
                {
                    "conv_id": [f"zc{c:08d}" for c in conv],
                    "turn_idx": turn.astype(np.int32),
                    "role": [_ROLES[r] for r in role_idx],
                    "text": texts,
                    "tool": "",
                    "ts": pd.to_datetime(_EPOCH) + pd.to_timedelta(ids.astype(np.int64), unit="s"),
                }
            )

    return (
        spark.range(n_turns_total)
        .repartition(max(32, spark.sparkContext.defaultParallelism))
        .mapInPandas(gen, schema=TRANSCRIPT_SCHEMA)
    )


# ---------------------------------------------------------------------------
# T1d — adversarial tokenizer corpus (FIXTURES.md): over-long tokens,
# trailing punctuation, possessives, separator-joined tokens, unicode,
# empty turns, 1-turn and many-turn conversations.
# ---------------------------------------------------------------------------


def adversarial_corpus(spark: SparkSession) -> DataFrame:
    long_tok = "x" * 80
    near_long = "y" * 48
    too_long = "w" * 49
    rows = [
        ("adv0", 0, "user", f"hello {long_tok} world", "", _ts(0)),
        ("adv0", 1, "assistant", "", "", _ts(1)),  # empty turn
        ("adv0", 2, "user", "trailing. dots... and 'quotes' <tags>", "", _ts(2)),
        ("adv1", 0, "user", "the dog's bone is the dog's", "", _ts(10)),
        ("adv2", 0, "user", "foo.bar-baz_qux a/b c:d e+f g@h i#j", "", _ts(20)),
        ("adv3", 0, "user", "Crème brûlée CAFÉ ﬁne", "", _ts(30)),
        ("adv4", 0, "user", f"{near_long} {too_long}", "", _ts(40)),
        ("adv5", 0, "tool", "single turn conversation", "grep", _ts(50)),
    ]
    rows += [
        ("adv6", t, _ROLES[t % 4], f"turn{t} marker common", "", _ts(100 + t))
        for t in range(200)
    ]
    return _df_from_rows(spark, rows)


# ---------------------------------------------------------------------------
# Adapter: driver-provided documents.parquet → transcript shape (one document
# = one single-turn conversation), so oracle-checked queries run the real
# engine over driver data.
# ---------------------------------------------------------------------------


def documents_as_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One document = one single-turn conversation; the turn's role cycles
    deterministically with ``doc_id % 4`` (system/assistant/user/tool) so
    role-flag surface — gates, the priority tier, flag-BM25 — is exercised
    on driver data AND remains recomputable in the DuckDB oracles as a pure
    ``doc_id % 4`` expression."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    role = (
        F.when(F.pmod("doc_id", F.lit(4)) == 0, F.lit("system"))
        .when(F.pmod("doc_id", F.lit(4)) == 1, F.lit("assistant"))
        .when(F.pmod("doc_id", F.lit(4)) == 2, F.lit("user"))
        .otherwise(F.lit("tool"))
    )
    return docs.select(
        F.col("doc_id").cast("string").alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        role.alias("role"),
        F.col("text"),
        F.lit("").alias("tool"),
        # deterministic per-doc year (2020..2025) so the year[=><] spec
        # limit is exercisable on driver data and stays a pure doc_id
        # expression the DuckDB oracles can recompute
        F.expr(
            "make_timestamp(2020 + pmod(doc_id, 6), 1, 1, 0, 0, 0)"
        ).alias("ts"),
    )
