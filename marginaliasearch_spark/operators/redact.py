"""PII redaction for a training-data pipeline.

Scrubs personally-identifiable substrings (emails, IPv4 addresses, phone
numbers) from a text column and reports per-document match counts — the
standard pre-training hygiene pass (C4/Gopher/Dolma-style pipelines run
exactly this shape of regex scrub before tokenization).

Spark-first design: everything is ``regexp_count`` / ``regexp_replace``
column expressions — pure JVM, whole-stage codegen, no Python in the hot
path, trivially partition-parallel at 100 TB (a narrow map over the text
column, no shuffle). The patterns are deliberately restricted to syntax
with identical semantics in Java regex (Spark) and RE2 (DuckDB) — no
backreferences, no lookaround, only greedy quantifiers over disjoint
character classes — so the operator is oracle-checkable verbatim.

Reference note: Marginalia has no PII scrub (it indexes the public web);
this operator extends the engine for the LLM-training-pipeline surface the
brief asks for, reusing the same pure-column-expression idiom as
``textstats`` (cf. converting-process cleanup passes,
code/processes/converting-process/ffs — structural analogue only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Order matters: emails are scrubbed before IPs/phones so digit runs inside
# an email's domain are never double-counted; each pattern is anchored with
# \b or structure so the three match sets are disjoint on any input.
PII_PATTERNS: list[tuple[str, str, str]] = [
    # (name, pattern, replacement token)
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{1,2}-\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
]


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """doc_id → redacted text + per-category match counts.

    Counts are taken on the ORIGINAL text (before any replacement) and the
    replacements are applied in ``PII_PATTERNS`` order, so the output is a
    pure function of the input row — deterministic, no cross-row state,
    no shuffle.
    """
    text = F.col(text_col)
    out = docs.select(
        "doc_id",
        *[
            F.regexp_count(text, F.lit(pat)).cast("long").alias(f"n_{name}")
            for name, pat, _ in PII_PATTERNS
        ],
        _redacted_col(text).alias("redacted"),
    )
    return out


def _redacted_col(text: F.Column) -> F.Column:
    for _, pat, token in PII_PATTERNS:
        text = F.regexp_replace(text, pat, token)
    return text


def pii_redact_sql(table: str = "documents", text_expr: str = "text") -> str:
    """DuckDB twin of :func:`redact_pii` over ``table`` (same patterns,
    same order; RE2 and Java regex agree on this restricted syntax).
    ``text_expr`` lets callers inject synthetic PII deterministically."""
    counts = ",\n       ".join(
        f"len(regexp_extract_all(t, '{pat}'))::BIGINT AS n_{name}"
        for name, pat, _ in PII_PATTERNS
    )
    red = "t"
    for _, pat, token in PII_PATTERNS:
        red = f"regexp_replace({red}, '{pat}', '{token}', 'g')"
    return f"""
WITH base AS (SELECT doc_id, {text_expr} AS t FROM {table})
SELECT doc_id,
       {counts},
       {red} AS redacted
FROM base"""
