"""Codec roundtrip + fuzz tests.

Mirrors the reference's test strategy for its compressed structures:
encode→decode roundtrips and seeded randomized fuzzing against brute force
(cf. reference skiplist fuzz tests, SkipListFuzzTests.java:74-260, and
VarintCodedSequenceTest.java).
"""

import numpy as np
import pytest

from marginaliasearch_spark.functions.codecs import (
    decode_positions,
    decode_sorted,
    delta_decode,
    delta_encode,
    encode_positions,
    encode_sorted,
    varbyte_decode,
    varbyte_encode,
    varbyte_encode_with_offsets,
)


def test_varbyte_empty():
    assert varbyte_encode(np.array([], dtype=np.uint64)) == b""
    assert varbyte_decode(b"").size == 0


def test_varbyte_known_values():
    # 0 and 127 fit one byte; 128 needs two
    assert varbyte_encode(np.array([0], dtype=np.uint64)) == b"\x00"
    assert varbyte_encode(np.array([1], dtype=np.uint64)) == b"\x01"
    assert varbyte_encode(np.array([127], dtype=np.uint64)) == b"\x7f"
    assert varbyte_encode(np.array([128], dtype=np.uint64)) == b"\x80\x01"
    out = varbyte_decode(b"\x80\x01\x7f\x00")
    assert out.tolist() == [128, 127, 0]


@pytest.mark.parametrize("seed", range(8))
def test_varbyte_fuzz_roundtrip(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 5000))
    # mix of magnitudes incl. >2^56 (forces 9-10 byte varints)
    exp = (63 - rng.integers(0, 64, size=n)).astype(np.uint64)
    vals = rng.integers(0, 2**63 - 1, size=n).astype(np.uint64) >> exp
    buf = varbyte_encode(vals)
    out = varbyte_decode(buf)
    np.testing.assert_array_equal(out, vals)


def test_varbyte_max_u64():
    vals = np.array([2**64 - 1, 2**63, 2**57 - 1], dtype=np.uint64)
    np.testing.assert_array_equal(varbyte_decode(varbyte_encode(vals)), vals)


@pytest.mark.parametrize("seed", range(8))
def test_delta_sorted_roundtrip(seed):
    rng = np.random.default_rng(100 + seed)
    n = int(rng.integers(1, 3000))
    vals = np.sort(rng.choice(2**40, size=n, replace=False)).astype(np.uint64)
    np.testing.assert_array_equal(decode_sorted(encode_sorted(vals)), vals)
    np.testing.assert_array_equal(delta_decode(delta_encode(vals)), vals)


@pytest.mark.parametrize("seed", range(8))
def test_positions_block_roundtrip(seed):
    rng = np.random.default_rng(200 + seed)
    n_docs = int(rng.integers(1, 500))
    lists = []
    for _ in range(n_docs):
        k = int(rng.integers(0, 30))
        # strictly increasing, 1-based (reference uses 1-based positions,
        # DocumentPositionMapper.java:64-68)
        p = np.sort(rng.choice(np.arange(1, 10000), size=k, replace=False)).astype(
            np.uint64
        )
        lists.append(p)
    buf = encode_positions(lists)
    counts = np.array([len(p) for p in lists], dtype=np.uint64)
    flat = decode_positions(buf, counts)
    expect = (
        np.concatenate(lists) if any(len(p) for p in lists) else np.empty(0, np.uint64)
    )
    np.testing.assert_array_equal(flat, expect)


def test_positions_flat_input():
    counts = np.array([2, 0, 3], dtype=np.uint64)
    flat = np.array([1, 5, 2, 4, 9], dtype=np.uint64)
    buf = encode_positions(flat, counts=counts)
    f = decode_positions(buf, counts)
    np.testing.assert_array_equal(f, flat)


def test_positions_all_empty():
    buf = encode_positions([np.empty(0, np.uint64)] * 4)
    assert buf == b""
    f = decode_positions(buf, np.zeros(4, dtype=np.uint64))
    assert f.size == 0


def test_positions_concat_equals_block_encode():
    """Byte concatenation of per-doc runs == one-shot block encode (the
    invariant the journal→block pipeline relies on)."""
    lists = [
        np.array([1, 4, 9], dtype=np.uint64),
        np.array([2], dtype=np.uint64),
        np.array([3, 7], dtype=np.uint64),
    ]
    whole = encode_positions(lists)
    per_doc = b"".join(encode_positions([p]) for p in lists)
    assert whole == per_doc


def test_varbyte_offsets_slicing():
    vals = np.array([0, 127, 128, 2**40, 5], dtype=np.uint64)
    buf, offs = varbyte_encode_with_offsets(vals)
    assert offs[0] == 0 and offs[-1] == len(buf)
    for i, v in enumerate(vals):
        piece = buf[offs[i] : offs[i + 1]]
        assert varbyte_decode(piece).tolist() == [int(v)]
