"""Pin the DuckDB SQL 64-bit-wrapping helpers to their numpy twins."""

import hashlib

import duckdb
import numpy as np

from marginaliasearch_spark.functions import sql64
from marginaliasearch_spark.operators.dedup import _splitmix64


def _eval_u64(expr_sql: str, xs: np.ndarray) -> np.ndarray:
    vals = ", ".join(f"{int(v)}::UBIGINT" for v in xs)
    q = f"SELECT {expr_sql} AS v FROM (SELECT unnest([{vals}]) AS x)"
    out = duckdb.sql(q).fetchall()
    return np.array([int(r[0]) for r in out], dtype=np.uint64)


def _rand_u64(n: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 2**64, size=n, dtype=np.uint64)


def test_mul64_matches_numpy():
    xs = _rand_u64(200, 1)
    for c in [3, 0x9E3779B97F4A7C15, 2**64 - 1, 2**63, 0xC2B2AE3D27D4EB4F]:
        got = _eval_u64(sql64.mul64_const("x", c), xs)
        want = xs * np.uint64(c)
        assert np.array_equal(got, want), f"mul64 const {c:#x}"


def test_mul64_column_operand():
    xs = _rand_u64(100, 2)
    ys = _rand_u64(100, 3)
    vals = ", ".join(
        f"({int(a)}::UBIGINT, {int(b)}::UBIGINT)" for a, b in zip(xs, ys)
    )
    q = (
        f"SELECT {sql64.mul64('a', 'b')} AS v"
        f" FROM (SELECT x.a AS a, x.b AS b FROM (VALUES {vals}) x(a, b))"
    )
    got = np.array([int(r[0]) for r in duckdb.sql(q).fetchall()], dtype=np.uint64)
    assert np.array_equal(got, xs * ys)


def test_add64_matches_numpy():
    xs = _rand_u64(200, 4)
    got = _eval_u64(sql64.add64("x", sql64.u64(0x9E3779B97F4A7C15)), xs)
    assert np.array_equal(got, xs + np.uint64(0x9E3779B97F4A7C15))


def test_sm64_matches_numpy_splitmix64():
    xs = np.concatenate(
        [_rand_u64(200, 5), np.array([0, 1, 2**63, 2**64 - 1], dtype=np.uint64)]
    )
    got = _eval_u64(sql64.sm64("x"), xs)
    assert np.array_equal(got, _splitmix64(xs))


def test_md5_u64_matches_hashlib():
    words = ["", "a", "spark", "hello world", "0", "Ünïcode"]
    vals = ", ".join(f"({w!r})" for w in words)
    q = f"SELECT {sql64.md5_u64('w')} FROM (VALUES {vals}) t(w)"
    got = [int(r[0]) for r in duckdb.sql(q).fetchall()]
    want = [
        int(hashlib.md5(w.encode()).hexdigest()[:16], 16) for w in words
    ]
    assert got == want


def test_to_signed64_matches_numpy():
    xs = np.array([0, 1, 2**63 - 1, 2**63, 2**64 - 1], dtype=np.uint64)
    vals = ", ".join(f"{int(v)}::UBIGINT" for v in xs)
    q = (
        f"SELECT {sql64.to_signed64('x')} AS v"
        f" FROM (SELECT unnest([{vals}]) AS x)"
    )
    got = [int(r[0]) for r in duckdb.sql(q).fetchall()]
    assert got == list(xs.astype(np.int64))
