"""MLP binary document classifier (classifier-net parity).

Pins: trimTerm edge semantics, unigram+bigram feature extraction against a
straight-line mirror of ClassifierVocabulary.features, forward-pass logits
against a per-sample loop mirror of BinaryClassifierModel.predict, SGD
training convergence on separable data (BINARY and COUNTED), and the
distributed kernel's exact agreement with single-document predict.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from marginaliasearch_spark.operators import classifier as C


def test_trim_term():
    # ClassifierVocabulary.trimTerm: strip non-alphanumeric edges only
    assert C.trim_term("--foo!!") == "foo"
    assert C.trim_term("'tis") == "tis"
    assert C.trim_term("a.b") == "a.b"
    assert C.trim_term("!!!") == ""
    assert C.trim_term("") == ""
    assert C.trim_term("x9") == "x9"


def _features_mirror(vocab: C.Vocabulary, text: str) -> dict[int, int]:
    """Straight-line mirror of ClassifierVocabulary.countedFeatures
    (String overload): prevTerm is ALWAYS the previous trimmed token,
    empty or out-of-vocab included."""
    counts: dict[int, int] = {}
    prev = None
    for tok in text.lower().split():
        w = C.trim_term(tok)
        if w in vocab.uni:
            counts[vocab.uni[w]] = counts.get(vocab.uni[w], 0) + 1
        if prev is not None and (prev + "_" + w) in vocab.bi:
            j = vocab.bi[prev + "_" + w]
            counts[j] = counts.get(j, 0) + 1
        prev = w
    return counts


@pytest.mark.parametrize(
    "text",
    [
        "Table scan; table SCAN!  fast merge",
        "value table value  table_scan",  # literal underscore token is NOT a bigram hit
        "a row a row a",
        "-- nothing here matches --",
        "",
        "spark",
        "!!! table !!! scan",  # '!!!' trims to '' → breaks the table~scan adjacency
    ],
)
def test_feature_extraction_matches_mirror(text):
    v = C.Vocabulary(C.DEFAULT_VOCAB)
    idx, act = v.counted_features(text)
    mirror = _features_mirror(v, text)
    assert dict(zip(idx.tolist(), act.astype(int).tolist())) == mirror


def test_bigram_requires_adjacency():
    v = C.Vocabulary(["table", "scan", "table_scan"])
    # adjacent → unigrams + bigram
    idx, act = v.counted_features("table scan")
    assert set(idx.tolist()) == {0, 1, 2}
    # separated → no bigram
    idx, _ = v.counted_features("table big scan")
    assert set(idx.tolist()) == {0, 1}
    # punctuation-only token trims to '' and the pair ('', scan) misses,
    # but ('table', '') + ('', 'scan') both update prev → adjacency broken
    idx, _ = v.counted_features("table !!! scan")
    assert set(idx.tolist()) == {0, 1}


def test_vocabulary_skips_comments_and_blanks():
    v = C.Vocabulary(["# comment", "", "table", "a_b"])
    assert len(v) == 2
    assert "table" in v.uni and "a_b" in v.bi


def _predict_mirror(m: C.ClassifierModel, idx, act) -> float:
    """Per-sample loop mirror of BinaryClassifierModel.predict."""
    z1 = m.b1.copy()
    for j, a in zip(idx, act):
        z1 += m.w1[:, j] * a
    a1 = np.maximum(z1, 0.0)
    z2 = m.b2
    for h in range(m.m_hidden):
        z2 += a1[h] * m.w2[h]
    return 1.0 / (1.0 + np.exp(-z2))


def test_forward_pass_matches_reference_loop():
    v = C.Vocabulary(C.DEFAULT_VOCAB)
    m = C.default_model(len(v), mode="counted")
    texts = [
        "table scan fast merge value table",
        "spark spark spark query value",
        "",
        "the line a row key agg",
    ]
    samples = [v.counted_features(t) for t in texts]
    z2 = C.predict_logits(m, samples)
    for (idx, act), z in zip(samples, z2):
        want = _predict_mirror(m, idx, act)
        got = 1.0 / (1.0 + np.exp(-z))
        # dyadic weights ⇒ every sum is exact ⇒ bit-identical logits
        assert got == want


def test_default_model_weights_are_dyadic():
    m = C.default_model(40)
    for w in np.concatenate([m.w1.ravel(), m.b1, m.w2, [m.b2]]):
        # k / 2^24 exactly (so sparse sums are order-independent in f64)
        assert w * (1 << 24) == round(w * (1 << 24))
        assert abs(w) <= 1.0


@pytest.mark.parametrize("mode", ["binary", "counted"])
def test_training_learns_separable_data(mode):
    """BinaryClassifierTrainer analogue: SGD on a linearly separable
    sparse problem drives loss down and reaches high accuracy."""
    rng = np.random.default_rng(7)
    n_inputs, m_hidden = 32, 8
    pos_feats, neg_feats = np.arange(0, 8), np.arange(24, 32)
    samples = []
    for _ in range(200):
        y = int(rng.random() < 0.5)
        base = pos_feats if y else neg_feats
        x = np.unique(
            np.concatenate([
                rng.choice(base, 4, replace=False),
                rng.choice(np.arange(8, 24), 3, replace=False),
            ])
        )
        act = (
            None
            if mode == "binary"
            else rng.integers(1, 4, len(x)).astype(np.float64)
        )
        samples.append((float(y), x, act))
    model = C.init_model_for_training(n_inputs, m_hidden, mode=mode)
    losses = C.train(model, samples, epochs=60, lr=0.05)
    assert losses[-1] < 0.25 * losses[0]
    correct = 0
    for y0, x, act in samples:
        z = C.predict_logits(
            model, [(x, act if act is not None else np.ones(len(x)))]
        )[0]
        correct += (z >= 0) == (y0 > 0.5)
    assert correct / len(samples) >= 0.95


def test_batch_kernel_equals_single_predict(spark):
    v = C.Vocabulary(C.DEFAULT_VOCAB)
    m = C.default_model(len(v), mode="counted")
    texts = [
        "table scan value table fast merge key agg",
        "spark query value the line",
        "",
        "!!! ---",
        "a row a row hash value stream window",
    ]
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    out = (
        C.classify_documents(docs, v, m)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for i, t in enumerate(texts):
        assert out.loc[i, "score"] == round(C.predict(m, v, t), 6)
        idx, act = v.counted_features(t)
        assert out.loc[i, "n_features"] == len(idx)
        assert out.loc[i, "act_total"] == int(act.sum())
