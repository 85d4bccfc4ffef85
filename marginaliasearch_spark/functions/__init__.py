"""Row-level functions: codecs, tokenization, hashing, scoring math.

Everything here is vectorized (numpy / pandas on Arrow batches) — the engine
contains no row-at-a-time Python UDFs by design (enforced by
``tests/test_no_row_udf.py``).
"""
