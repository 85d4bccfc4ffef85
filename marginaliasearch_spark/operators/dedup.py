"""Deduplication operators over a ``documents(doc_id, text, ...)`` table.

Large-scale training-data pipeline ops, each designed around one shuffle:

- ``exact_dedup``          — hash-groupBy on normalized text (exact dups);
- ``jaccard_candidates``   — token-inverted-index self-join → word-set
                             Jaccard ≥ τ pairs (exact, index-pruned);
- ``minhash_lsh_pairs``    — shingle → minhash → band-bucket join (approx,
                             the 100 TB path: candidates meet only in
                             band buckets, never all-pairs);
- ``simhash_pairs``        — 64-bit simhash + banded hamming join.

All hashing is deterministic (splitmix64 over xxhash-style mixes) and all
row-level work is numpy inside ``mapInPandas``/``pandas_udf``.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.tokenizer import MAX_RAW_TOKEN_LENGTH, SIMPLE_SPLIT_RE


def simple_tokens_col(text_col: str = "text") -> F.Column:
    """The SQL-expressible 'simple' tokenizer as a JVM column expression
    (shared spec with the DuckDB oracle — see tokenizer.SIMPLE_SPLIT_RE)."""
    toks = F.split(F.lower(F.col(text_col)), SIMPLE_SPLIT_RE)
    return F.filter(
        toks, lambda t: (t != "") & (F.length(t) < MAX_RAW_TOKEN_LENGTH)
    )


def exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Keep the smallest doc_id per exact normalized-text group.

    One hash aggregation; at 100 TB, group on a digest (md5) rather than the
    text itself so shuffle rows are ~32 bytes.
    """
    return (
        docs.select("doc_id", F.md5(F.lower(F.col(text_col))).alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("doc_id"), F.count("*").alias("n_dups"))
        .select("doc_id", "n_dups")
    )


def jaccard_candidates(
    docs: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    max_df: int | None = None,
) -> DataFrame:
    """Exact word-set Jaccard ≥ threshold pairs via inverted-index join.

    docs × docs is never materialized: pairs meet through shared tokens
    (posting-list self-join), the same access path the search index uses.
    ``max_df`` drops ubiquitous tokens from candidate generation — the skew
    guard (a stop-word token would otherwise create df² candidate pairs) —
    while Jaccard itself is still computed on full token sets.
    """
    tok = docs.select(
        "doc_id", F.explode(F.array_distinct(simple_tokens_col(text_col))).alias("tok")
    )
    sizes = tok.groupBy("doc_id").agg(F.count("*").alias("set_size"))
    tok_f = tok
    if max_df is not None:
        dfc = tok.groupBy("tok").agg(F.count("*").alias("df"))
        tok_f = tok.join(dfc.filter(F.col("df") <= max_df), "tok")
    a = tok_f.select(F.col("doc_id").alias("doc_a"), "tok")
    b = tok_f.select(F.col("doc_id").alias("doc_b"), "tok")
    inter = (
        a.join(b, "tok")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("set_size").alias("size_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("set_size").alias("size_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_common")
            / (F.col("size_a") + F.col("size_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


# --- MinHash + LSH ---------------------------------------------------------

_MERSENNE = np.uint64((1 << 61) - 1)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _stable_hash64(s: str) -> int:
    """Deterministic 64-bit string hash (blake2b) — Python's built-in hash()
    is process-randomized and would break cross-executor determinism."""
    import hashlib

    return int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "little")


def _shingle_hashes(text: str, width: int) -> np.ndarray:
    toks = [t for t in text.lower().split() if t]
    if len(toks) < width:
        toks = toks + [""] * (width - len(toks))
    shingles = {" ".join(toks[i : i + width]) for i in range(len(toks) - width + 1)}
    h = np.fromiter(
        (_stable_hash64(s) for s in sorted(shingles)),
        dtype=np.uint64,
        count=len(shingles),
    )
    return _splitmix64(h)


def minhash_signatures(
    docs: DataFrame,
    num_hashes: int = 64,
    shingle_width: int = 3,
    text_col: str = "text",
    seed: int = 42,
) -> DataFrame:
    """doc_id → array<long> minhash signature (shingle → k permutations).

    Permutation i is the affine map ``(a_i * h + b_i) mod 2^61-1`` with
    (a, b) drawn from a seeded RNG — deterministic across runs/parallelism.
    """
    rng = np.random.default_rng(seed)
    a = rng.integers(1, int(_MERSENNE), size=num_hashes, dtype=np.uint64)
    b = rng.integers(0, int(_MERSENNE), size=num_hashes, dtype=np.uint64)

    def sig_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            sigs = []
            for text in pdf[text_col].fillna(""):
                h = _shingle_hashes(text, shingle_width) % _MERSENNE
                if h.size == 0:
                    sigs.append(np.full(num_hashes, int(_MERSENNE), dtype=np.int64))
                    continue
                # (k, n) affine maps, min over shingles
                vals = (a[:, None] * h[None, :] + b[:, None]) % _MERSENNE
                sigs.append(vals.min(axis=1).astype(np.int64))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "signature": [s.tolist() for s in sigs]}
            )

    return docs.select("doc_id", text_col).mapInPandas(
        sig_batch, schema="doc_id long, signature array<long>"
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float = 0.7,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_width: int = 3,
    text_col: str = "text",
    seed: int = 42,
) -> DataFrame:
    """Near-dup pairs: banded LSH buckets → exact signature-similarity check.

    The scale path: docs collide only within (band, bucket-hash) groups, so
    the self-join shuffles band keys, not the corpus cross-product. The
    estimated Jaccard is the fraction of agreeing minhash components.
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(docs, num_hashes, shingle_width, text_col, seed)
    banded = sig.select(
        "doc_id",
        "signature",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda i: F.xxhash64(
                    F.slice(
                        F.col("signature"),
                        i * rows_per_band + 1,
                        rows_per_band,
                    ).cast("string")
                ),
            )
        ).alias("band", "bucket"),
    )
    a = banded.select(
        F.col("doc_id").alias("doc_a"),
        F.col("signature").alias("sig_a"),
        "band",
        "bucket",
    )
    b = banded.select(
        F.col("doc_id").alias("doc_b"),
        F.col("signature").alias("sig_b"),
        "band",
        "bucket",
    )
    pairs = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sig_a", "sig_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    agree = F.size(
        F.filter(
            F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: (x == y).cast("int")),
            lambda v: v == 1,
        )
    )
    return (
        pairs.withColumn("est_jaccard", agree / F.lit(float(num_hashes)))
        .filter(F.col("est_jaccard") >= threshold)
        .select("doc_a", "doc_b", "est_jaccard")
    )


# --- SimHash ---------------------------------------------------------------


def simhash_bits(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """doc_id → 64-bit simhash over token hashes (numpy bit-vote kernel)."""

    def batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bit_idx = np.arange(64, dtype=np.uint64)
        for pdf in it:
            out = np.zeros(len(pdf), dtype=np.int64)
            for i, text in enumerate(pdf[text_col].fillna("")):
                toks = [t for t in text.lower().split() if t]
                if not toks:
                    continue
                h = _splitmix64(
                    np.fromiter(
                        (_stable_hash64(t) for t in toks),
                        dtype=np.uint64,
                        count=len(toks),
                    )
                )
                bits = (h[:, None] >> bit_idx[None, :]) & np.uint64(1)
                votes = bits.sum(axis=0) * 2 - len(toks)  # >0 → bit set
                word = np.uint64(0)
                for j in np.flatnonzero(votes > 0):
                    word |= np.uint64(1) << np.uint64(j)
                out[i] = np.int64(word.astype(np.int64))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "simhash": out})

    return docs.select("doc_id", text_col).mapInPandas(
        batch, schema="doc_id long, simhash long"
    )


def simhash_pairs(
    docs: DataFrame, max_hamming: int = 3, text_col: str = "text"
) -> DataFrame:
    """Pairs with hamming(simhash) ≤ max_hamming via banded join.

    Pigeonhole: split 64 bits into max_hamming+1 bands; any pair within the
    hamming budget must agree
    exactly on ≥1 band, so candidates meet in band-value buckets (never
    all-pairs). Exact hamming verified with bit_count on the survivors.
    """
    nbands = max_hamming + 1
    width = 64 // nbands
    sh = simhash_bits(docs, text_col)
    banded = sh.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("simhash"), i * width).bitwiseAND(
                        F.lit((1 << width) - 1)
                    )
                    for i in range(nbands)
                ]
            )
        ).alias("band", "band_val"),
    )
    a = banded.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sh_a"), "band", "band_val"
    )
    b = banded.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sh_b"), "band", "band_val"
    )
    return (
        a.join(b, ["band", "band_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
        .withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )
