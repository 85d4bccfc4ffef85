"""Single-hidden-layer MLP binary document classifier (NSFW-filter parity).

Reference behavior re-expressed Spark-first:

- ``code/libraries/classifier-net/java/nu/marginalia/classifier/
  BinaryClassifierModel.java`` — one ReLU hidden layer, sigmoid output,
  sparse BINARY or COUNTED input activation, per-sample SGD with log-loss
  backprop, seeded He/Glorot weight init.
- ``ClassifierVocabulary.java`` — unigram + ``a_b`` bigram vocabulary over
  lowercased whitespace tokens with non-alphanumeric edges stripped
  (``trimTerm``); the previous *trimmed* token is always the bigram prefix.

Spark-first split: **training stays driver-side** on an in-memory sample
list exactly as the reference does (``BinaryClassifierTrainer`` loops an
ArrayList; the model is a few KiB) — but the samples themselves may be
*assembled* by a Spark job. **Inference is the 100-TB job**: one
``mapInPandas`` pass, model weights captured in the closure (broadcast by
task serialization — the model is tiny), tokenization in pyarrow compute
(C++, off the GIL), feature lookup per *unique* token, and scoring as
dense numpy accumulation. No shuffle, no collect, output rows == input
rows — embarrassingly parallel at any scale.

Oracle exactness (same discipline as dedup/similarity): the default
deterministic model's weights are dyadic rationals (splitmix64-derived
integers over 2^24 / 2^20), so every hidden-layer sum, bias add, and ReLU
is *exact* in float64 regardless of summation order; the hidden→output
reduction is pinned to a left-associative chain on both engines; the only
transcendental step is the final sigmoid, emitted identically
(``1/(1+exp(-z))``) and rounded to 6 decimals. The flag decision uses the
exact pre-sigmoid logit (``z2 >= 0`` ⇔ ``score >= 0.5``) so it can never
straddle a rounding boundary.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Iterator, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from pyspark.sql import DataFrame
from pyspark.sql import types as T

__all__ = [
    "ClassifierModel",
    "Vocabulary",
    "DEFAULT_VOCAB",
    "default_model",
    "trim_term",
    "train",
    "train_sample",
    "classify_documents",
]

# default vocabulary for the driver-contract entries: unigrams + ``a_b``
# bigrams over the synthetic corpus lexicon (the reference ships its
# vocabulary as a text file, one feature per line, '#' comments —
# ClassifierVocabulary.java:63-77)
DEFAULT_VOCAB: list[str] = [
    # unigrams
    "spark", "table", "query", "scan", "join", "merge", "sort", "window",
    "batch", "stream", "vector", "value", "row", "column", "hash", "key",
    "filter", "agg", "group", "order", "data", "line", "part", "customer",
    "big", "small", "fast", "slow",
    # bigrams (underscore-joined adjacent pairs, ClassifierVocabulary.java:37-47)
    "table_scan", "value_table", "a_row", "the_line", "sort_table",
    "row_scan", "key_agg", "fast_merge", "table_key", "hash_value",
    "stream_window", "query_value",
]

_TRIM_RE = re.compile(r"^[^a-z0-9]+|[^a-z0-9]+$")


def trim_term(term: str) -> str:
    """Strip non-alphanumeric leading/trailing chars (post-lowercase).

    Mirror of ``ClassifierVocabulary.trimTerm`` (reference uses
    ``Character.isAlphabetic``; we pin ASCII ``[a-z0-9]`` so the DuckDB
    twin — RE2 ``regexp_replace`` — is bit-identical; documented
    divergence, same class as the tokenizer's)."""
    return _TRIM_RE.sub("", term)


@dataclass
class ClassifierModel:
    """w1: (M, N) input→hidden, b1: (M,), w2: (M,) hidden→output, b2."""

    w1: np.ndarray
    b1: np.ndarray
    w2: np.ndarray
    b2: float
    mode: str = "binary"  # "binary" | "counted" (InputActivationMode)

    @property
    def n_inputs(self) -> int:
        return self.w1.shape[1]

    @property
    def m_hidden(self) -> int:
        return self.w1.shape[0]


def _sm64_scalar(x: int) -> int:
    """splitmix64 finalizer over a python int (uint64 wrap)."""
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return x ^ (x >> 31)


def _dyadic(key: int, denom_bits: int) -> float:
    """Deterministic weight in [-1, 1) with denominator 2**denom_bits.

    Dyadic rationals make sparse-feature sums order-independent in
    float64 (all partial sums exact while numerators stay < 2^53), which
    is what lets the DuckDB oracle use an unordered SUM()."""
    h = _sm64_scalar(key)
    k = int((h >> 24) % (1 << 21)) - (1 << 20)
    return k / float(1 << denom_bits)


def default_model(
    n_inputs: int, m_hidden: int = 8, seed: int = 0x5EED, mode: str = "binary"
) -> ClassifierModel:
    """Deterministic dyadic-rational model (the oracle-checkable analogue
    of the reference's seeded-Gaussian ``initializeWeights``,
    BinaryClassifierModel.java:432-448; Random(451) is not reproducible
    cross-engine, splitmix64 dyadics are)."""
    w1 = np.empty((m_hidden, n_inputs), dtype=np.float64)
    for i in range(m_hidden):
        for j in range(n_inputs):
            w1[i, j] = _dyadic(seed ^ (1 << 40) ^ (i * n_inputs + j), 24)
    b1 = np.array(
        [_dyadic(seed ^ (2 << 40) ^ i, 20) for i in range(m_hidden)],
        dtype=np.float64,
    )
    w2 = np.array(
        [_dyadic(seed ^ (3 << 40) ^ i, 20) for i in range(m_hidden)],
        dtype=np.float64,
    )
    b2 = _dyadic(seed ^ (4 << 40), 20)
    return ClassifierModel(w1, b1, w2, b2, mode=mode)


def init_model_for_training(
    n_inputs: int, m_hidden: int, mode: str = "binary", seed: int = 451
) -> ClassifierModel:
    """He-init hidden layer, Glorot-init output layer — the training-path
    twin of ``BinaryClassifierModel.forTraining`` / ``initializeWeights``
    (ReluActivationFunction.initVariance = 2/inputs,
    SigmoidActivationFunction.initVariance = 2/(in+out))."""
    rng = np.random.default_rng(seed)
    hidden_scale = np.sqrt(2.0 / n_inputs)
    output_scale = np.sqrt(2.0 / (m_hidden + 1))
    return ClassifierModel(
        w1=rng.standard_normal((m_hidden, n_inputs)) * hidden_scale,
        b1=np.zeros(m_hidden),
        w2=rng.standard_normal(m_hidden) * output_scale,
        b2=0.0,
        mode=mode,
    )


class Vocabulary:
    """Unigram + bigram feature vocabulary (ClassifierVocabulary.java)."""

    def __init__(self, terms: Sequence[str]):
        self.terms = [t for t in terms if t.strip() and not t.startswith("#")]
        self.uni: dict[str, int] = {}
        self.bi: dict[str, int] = {}  # keyed "a_b", same shape as the term
        for i, t in enumerate(self.terms):
            if "_" in t:
                self.bi[t] = i
            else:
                self.uni[t] = i

    def __len__(self) -> int:
        return len(self.terms)

    def features(self, text: str) -> np.ndarray:
        """BINARY features: sorted distinct vocab indices present."""
        idx, _ = self.counted_features(text)
        return idx

    def counted_features(self, text: str) -> tuple[np.ndarray, np.ndarray]:
        """COUNTED features: (sorted indices, occurrence counts).

        Semantics mirror the String overload of
        ``ClassifierVocabulary.features`` — whitespace split of the
        lowercased text, ``trimTerm`` each token, and the previous
        *trimmed* token (vocab member or not, empty or not) is always the
        bigram prefix."""
        counts: dict[int, int] = {}
        prev: str | None = None
        for tok in text.lower().split():
            w = trim_term(tok)
            j = self.uni.get(w)
            if j is not None:
                counts[j] = counts.get(j, 0) + 1
            if prev is not None:
                j = self.bi.get(prev + "_" + w)
                if j is not None:
                    counts[j] = counts.get(j, 0) + 1
            prev = w
        idx = np.array(sorted(counts), dtype=np.int64)
        act = np.array([counts[j] for j in sorted(counts)], dtype=np.float64)
        return idx, act


# ---------------------------------------------------------------------------
# inference


def _logits_batch(
    model: ClassifierModel,
    n_rows: int,
    row_of_nnz: np.ndarray,
    j_of_nnz: np.ndarray,
    act_of_nnz: np.ndarray,
) -> np.ndarray:
    """Dense-batch forward pass over a CSR-ish sparse feature triple.

    z1[r] = b1 + Σ_f w1[:, j_f]·act_f  (np.add.at: sequential adds — exact
    for the dyadic default model, and order-stable for trained models),
    a = relu(z1), z2 = ((b2 + a·w2[0]) + a·w2[1]) + … (left-assoc chain,
    pinned to match the SQL oracle's textual chain)."""
    m = model.m_hidden
    z1 = np.tile(model.b1, (n_rows, 1))
    if len(row_of_nnz):
        contribs = model.w1[:, j_of_nnz].T * act_of_nnz[:, None]
        np.add.at(z1, row_of_nnz, contribs)
    a = np.maximum(z1, 0.0)
    z2 = np.full(n_rows, model.b2, dtype=np.float64)
    for h in range(m):
        z2 = z2 + a[:, h] * model.w2[h]
    return z2


def predict_logits(
    model: ClassifierModel, samples: list[tuple[np.ndarray, np.ndarray]]
) -> np.ndarray:
    """Batch logit for a list of (idx, act) sparse samples."""
    rows = np.repeat(
        np.arange(len(samples)), [len(s[0]) for s in samples]
    ).astype(np.int64)
    j = (
        np.concatenate([s[0] for s in samples])
        if samples
        else np.empty(0, np.int64)
    ).astype(np.int64)
    act = (
        np.concatenate([s[1] for s in samples])
        if samples
        else np.empty(0, np.float64)
    ).astype(np.float64)
    return _logits_batch(model, len(samples), rows, j, act)


def predict(model: ClassifierModel, vocab: Vocabulary, text: str) -> float:
    """Single-document score — BinaryClassifierModel.predict."""
    idx, act = vocab.counted_features(text)
    if model.mode == "binary":
        act = np.ones_like(act)
    z2 = predict_logits(model, [(idx, act)])[0]
    return float(1.0 / (1.0 + np.exp(-z2)))


# ---------------------------------------------------------------------------
# training (driver-side, mirrors BinaryClassifierModel.trainSample/train)


def train_sample(
    model: ClassifierModel,
    y0: float,
    x: np.ndarray,
    act: np.ndarray | None,
    lr: float,
) -> float:
    """One SGD step; returns the sample's log-loss.

    Mirrors ``trainSample`` (BinaryClassifierModel.java:232-397):
    forward pass, clamped binary cross-entropy, then
    ∂L/∂z2 = y - y0 backprop through the ReLU mask."""
    if act is None:
        act = np.ones(len(x), dtype=np.float64)
    z1 = model.b1 + (model.w1[:, x] * act[None, :]).sum(axis=1)
    a = np.maximum(z1, 0.0)
    z2 = model.b2 + a @ model.w2
    y = 1.0 / (1.0 + np.exp(-z2))

    eps = 1e-14
    yc = min(max(y, eps), 1.0 - eps)
    loss = -y0 * np.log(yc) - (1.0 - y0) * np.log(1.0 - yc)

    dl_dz2 = y - y0
    # hidden layer: dL/dz1[i] = dL/dz2 * w2[i] * relu'(z1[i])
    dl_dz1 = dl_dz2 * model.w2 * (z1 > 0.0)
    model.w1[:, x] -= lr * dl_dz1[:, None] * act[None, :]
    model.b1 -= lr * dl_dz1
    # output layer (uses pre-update activations, as the reference does)
    model.w2 -= lr * dl_dz2 * a
    model.b2 -= lr * dl_dz2
    return float(loss)


def train(
    model: ClassifierModel,
    samples: list[tuple[float, np.ndarray, np.ndarray | None]],
    epochs: int,
    lr: float,
) -> list[float]:
    """Epoch loop with the reference's lr *= 0.98 decay every 100 epochs
    (BinaryClassifierModel.train, java:221-229). Returns per-epoch mean
    loss."""
    losses = []
    for e in range(epochs):
        total = 0.0
        for y0, x, act in samples:
            total += train_sample(model, y0, x, act, lr)
        if e > 0 and e % 100 == 0:
            lr *= 0.98
        losses.append(total / max(len(samples), 1))
    return losses


# ---------------------------------------------------------------------------
# distributed inference operator


def _extract_features_batch(
    texts: pd.Series, vocab: Vocabulary, counted: bool
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Batch feature extraction → (row_of_nnz, j_of_nnz, act_of_nnz,
    n_features_per_row).

    Tokenization in pyarrow (utf8_lower + utf8_split_whitespace, same
    no-empty-token semantics as the SQL twin's list_filter), trimTerm and
    unigram lookup per *unique* token, bigram lookup only at positions
    whose trimmed prefix is a bigram head."""
    n_docs = len(texts)
    arr = pa.array(texts.fillna("").astype(str), type=pa.string())
    toks = pc.utf8_split_whitespace(pc.utf8_lower(arr))
    offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat_all = toks.flatten()
    keep = pc.not_equal(flat_all, "")
    keep_np = keep.to_numpy(zero_copy_only=False)
    cs = np.zeros(len(flat_all) + 1, dtype=np.int64)
    np.cumsum(keep_np, out=cs[1:])
    lens = cs[offsets[1:]] - cs[offsets[:-1]]
    empty = (
        np.empty(0, np.int64),
        np.empty(0, np.int64),
        np.empty(0, np.float64),
        np.zeros(n_docs, np.int64),
    )
    if int(lens.sum()) == 0:
        return empty
    de = flat_all.filter(keep).dictionary_encode()
    codes = de.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    uniques = pd.Series(de.dictionary.to_pylist(), dtype=object)
    trimmed_uniq = uniques.str.replace(_TRIM_RE, "", regex=True).to_numpy(
        dtype=object
    )
    uni_uniq = np.array(
        [vocab.uni.get(w, -1) for w in trimmed_uniq], dtype=np.int64
    )
    trimmed = trimmed_uniq[codes]
    doc_idx = np.repeat(np.arange(n_docs), lens)

    pair_rows = [np.empty(0, np.int64)]
    pair_js = [np.empty(0, np.int64)]
    # unigram hits
    uni_j = uni_uniq[codes]
    m = uni_j >= 0
    pair_rows.append(doc_idx[m])
    pair_js.append(uni_j[m])
    # bigram hits: positions p with same-doc predecessor
    if vocab.bi and len(trimmed) > 1:
        has_prev = np.zeros(len(trimmed), dtype=bool)
        has_prev[1:] = doc_idx[1:] == doc_idx[:-1]
        heads = {t.split("_", 1)[0] for t in vocab.bi}
        head_uniq = np.array(
            [w in heads for w in trimmed_uniq], dtype=bool
        )
        cand = has_prev.copy()
        cand[1:] &= head_uniq[codes[:-1]]
        pos = np.nonzero(cand)[0]
        if len(pos):
            keys = pd.Series(trimmed[pos - 1]) + "_" + pd.Series(trimmed[pos])
            bi_j = keys.map(vocab.bi).to_numpy()
            hit = ~pd.isna(bi_j)
            pair_rows.append(doc_idx[pos[hit]])
            pair_js.append(bi_j[hit].astype(np.int64))
    rows = np.concatenate(pair_rows)
    js = np.concatenate(pair_js)
    if not len(rows):
        return empty
    # fold to distinct (row, j) with counts
    key = rows * np.int64(len(vocab)) + js
    ukey, cnt = np.unique(key, return_counts=True)
    urows = (ukey // len(vocab)).astype(np.int64)
    ujs = (ukey % len(vocab)).astype(np.int64)
    act = cnt.astype(np.float64) if counted else np.ones(len(ukey))
    n_feats = np.zeros(n_docs, dtype=np.int64)
    np.add.at(n_feats, urows, 1)
    return urows, ujs, act, n_feats


_CLASSIFY_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_features", T.LongType()),
        T.StructField("act_total", T.LongType()),
        T.StructField("logit", T.DoubleType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("is_flagged", T.BooleanType()),
    ]
)


def classify_documents(
    docs: DataFrame,
    vocab: Vocabulary | Sequence[str] | None = None,
    model: ClassifierModel | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score every document with the MLP classifier — one mapInPandas
    pass, no shuffle (the converting-process's document-classifier step,
    distributed).

    Output: (doc_id, n_features, act_total, logit, score, is_flagged);
    logit/score rounded to 6 decimals, is_flagged decided on the exact
    logit sign so it never straddles the rounding."""
    v = vocab if isinstance(vocab, Vocabulary) else Vocabulary(
        vocab or DEFAULT_VOCAB
    )
    m = model or default_model(len(v))
    counted = m.mode == "counted"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows, js, act, n_feats = _extract_features_batch(
                pdf[text_col], v, counted
            )
            z2 = _logits_batch(m, len(pdf), rows, js, act)
            act_total = np.zeros(len(pdf), dtype=np.int64)
            if len(rows):
                np.add.at(act_total, rows, act.astype(np.int64))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].to_numpy(),
                    "n_features": n_feats,
                    "act_total": act_total,
                    "logit": np.round(z2, 6),
                    "score": np.round(1.0 / (1.0 + np.exp(-z2)), 6),
                    "is_flagged": z2 >= 0.0,
                }
            )

    return docs.select(id_col, text_col).mapInPandas(run, _CLASSIFY_SCHEMA)
