"""PII detectors/redaction: cross-engine parity (Spark Java regex vs
DuckDB RE2) on constructed text, plus redaction invariants."""

import duckdb
import pytest
from pyspark.sql import functions as F

from hyperspace_spark.llm import pii

ROWS = [
    (1, "contact me at alice.smith+spam@example.co.uk or bob@test.org today"),
    (2, "server 192.168.0.1 and 10.0.0.255 responded; not 999999.1.1.1.1 though"),
    (3, "ssn 123-45-6789, phone 415-555-2671, also 415.555.2671"),
    (4, "card 4111-1111-1111-1111 and 4111 1111 1111 1111 but not 41111111"),
    (5, "perfectly clean text with numbers 12345 and words"),
    (6, ""),
]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(ROWS, ["doc_id", "text"])


def test_counts_match_duckdb(spark, df):
    got = {
        r.doc_id: {k: r[f"n_{k}"] for k in pii.PATTERNS}
        for r in pii.pii_counts(df).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id INT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", ROWS)
    sel = ", ".join(
        f"len(regexp_extract_all(text, '{pat}')) AS n_{kind}"
        for kind, pat in pii.PATTERNS.items()
    )
    want = {
        row[0]: dict(zip(pii.PATTERNS, row[1:]))
        for row in con.execute(f"SELECT doc_id, {sel} FROM t").fetchall()
    }
    assert got == want


def test_expected_hits(spark, df):
    r = {row.doc_id: row for row in pii.pii_counts(df).collect()}
    assert r[1].n_email == 2
    # 2 real IPs + the "1.1.1.1" tail of 999999.1.1.1.1 (the \b after the
    # first dot legitimately opens a match — both engines agree).
    assert r[2].n_ipv4 == 3
    assert r[3].n_ssn == 1 and r[3].n_phone == 2
    assert r[4].n_credit_card == 2
    assert not r[5].has_pii and not r[6].has_pii


def test_redaction_removes_everything(spark, df):
    clean = pii.redact(df)
    counts = pii.pii_counts(clean).agg(
        *[F.sum(f"n_{k}").alias(k) for k in pii.PATTERNS]
    ).collect()[0]
    assert all((counts[k] or 0) == 0 for k in pii.PATTERNS)
    # idempotent: redacting again changes nothing
    once = {r.doc_id: r.text for r in clean.collect()}
    twice = {r.doc_id: r.text for r in pii.redact(clean).collect()}
    assert once == twice
    assert "[EMAIL]" in once[1] and "[SSN]" in once[3] and "[CREDIT_CARD]" in once[4]


def test_stats(spark, df):
    row = pii.pii_stats(df).collect()[0]
    assert row.n_docs == len(ROWS)
    assert row.docs_with_pii == 4
    assert row.total_email == 2


def test_narrow_plan(spark, df):
    plan = pii.redact(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
