"""PII redaction: Spark (Java regex) vs DuckDB (RE2) must agree exactly.

The operator's whole design constraint is cross-engine regex identity on a
restricted syntax (no backreferences/lookaround, greedy quantifiers over
disjoint classes) — so the test feeds adversarial strings (adjacent
matches, over-long octets, emails wrapping IP-shaped domains, boundary
punctuation) through BOTH engines and requires byte-identical output.
"""

import duckdb
import pytest

from marginaliasearch_spark.operators.redact import pii_redact_sql, redact_pii

CASES = [
    "plain text no pii at all",
    "mail me at alice.smith+spam@sub.example.co.uk today",
    "two mails a@b.io c%d_e@f-g.org back to back",
    "server at 10.0.0.1 and 192.168.255.254, ok",
    "not an ip 1234.5.6.7 nor 1.2.3.4567 but 1.2.3.4.5 starts with one",
    "call +1-555-123-4567 or +44-207-946-0958 now",
    "phone-like but no plus 555-123-4567 stays",
    "email with ip-ish domain user@1.2.3.4 leaves the ip",
    "punct boundaries (8.8.8.8) [bob@x.yz] {+1-800-555-1212}",
    "",
    "trailing dot ip 9.9.9.9. and email end bob@x.io.",
]


@pytest.fixture(scope="module")
def results(spark):
    rows = [(i, t) for i, t in enumerate(CASES)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r.asDict()
        for r in redact_pii(docs).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ",".join(f"({i}, ?)" for i in range(len(CASES)))
        + ") t(doc_id, text)",
        list(CASES),
    )
    cols = ["doc_id", "n_email", "n_ip", "n_phone", "redacted"]
    want = {
        row[0]: dict(zip(cols, row))
        for row in con.execute(pii_redact_sql()).fetchall()
    }
    return got, want


def test_engines_agree_exactly(results):
    got, want = results
    assert got == want


def test_counts_and_tokens(results):
    got, _ = results
    assert got[1]["n_email"] == 1 and "<EMAIL>" in got[1]["redacted"]
    assert got[2]["n_email"] == 2
    assert got[3]["n_ip"] == 2 and got[3]["redacted"].count("<IP>") == 2
    # 1234.5.6.7 has no \b-clean 1-3 digit first octet match from its
    # start, 1.2.3.4567 fails the trailing \b, 1.2.3.4.5 matches 1.2.3.4
    assert got[4]["n_ip"] == 1
    assert got[5]["n_phone"] == 2
    assert got[6]["n_phone"] == 0  # no leading +<cc>
    assert got[7]["n_email"] == 0 and got[7]["n_ip"] == 1
    assert got[9] == {
        "doc_id": 9,
        "n_email": 0,
        "n_ip": 0,
        "n_phone": 0,
        "redacted": "",
    }


def test_no_pii_survives(results):
    got, _ = results
    import re

    from marginaliasearch_spark.operators.redact import PII_PATTERNS

    for r in got.values():
        for _, pat, _tok in PII_PATTERNS:
            assert not re.search(pat, r["redacted"]), (r, pat)
