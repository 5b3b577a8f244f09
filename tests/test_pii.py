"""PII detection/redaction (functions/pii.py): hand-built cases, a
DuckDB RE2 differential (the patterns must mean the same thing in Java
regex and RE2 — the repo's cross-engine regex rule), and plan shape.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from featureform_spark.functions.pii import (
    PII_PATTERNS,
    pii_report,
    pii_scan,
)

DOCS = [
    (1, "mail me at jane.doe+spam@corp.example.com or at work"),
    (2, "server 10.0.0.1 and 192.168.254.3 rebooted"),
    (3, "call 555-867-5309 or 555.867.5309 tonight"),
    (4, "ssn 123-45-6789 leaked with card 4111222233334444"),
    (5, "nothing sensitive here, just 12 plain numbers 42"),
]


def test_pii_scan_counts_and_redaction(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = {r["doc_id"]: r for r in pii_scan(df).collect()}
    assert out[1]["n_email"] == 1 and out[1]["n_card"] == 0
    assert out[2]["n_ipv4"] == 2
    assert out[3]["n_phone"] == 2
    assert out[4]["n_ssn"] == 1 and out[4]["n_card"] == 1
    assert all(
        out[5][f"n_{t}"] == 0 for t in PII_PATTERNS
    )
    assert "[EMAIL]" in out[1]["redacted"]
    assert out[2]["redacted"].count("[IPV4]") == 2
    assert "[SSN]" in out[4]["redacted"] and "[CARD]" in out[4]["redacted"]
    assert out[5]["redacted"] == DOCS[4][1]  # untouched


def test_pii_report_single_pass(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    rep = {r["pii_type"]: r for r in pii_report(df).collect()}
    assert rep["ipv4"]["n_matches"] == 2 and rep["ipv4"]["n_docs"] == 1
    assert rep["phone"]["n_matches"] == 2 and rep["phone"]["n_docs"] == 1
    assert rep["email"]["n_docs"] == 1
    assert rep["card"]["n_matches"] == 1


def test_pii_duckdb_differential(spark):
    """Counts AND redacted text must agree exactly with DuckDB's RE2
    over the same patterns — the cross-engine contract the suite row
    hash-compares at corpus scale."""
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in pii_scan(df).orderBy("doc_id").collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in DOCS)
        + ") v(doc_id, text)"
    )
    counts = ", ".join(
        f"len(regexp_extract_all(text, '{PII_PATTERNS[t]}')) AS n_{t}"
        for t in sorted(PII_PATTERNS)
    )
    red = "text"
    for t in sorted(PII_PATTERNS):
        red = (
            f"regexp_replace({red}, '{PII_PATTERNS[t]}', "
            f"'[{t.upper()}]', 'g')"
        )
    for row in con.execute(
        f"SELECT doc_id, {counts}, {red} AS redacted FROM docs"
    ).fetchall():
        doc_id = row[0]
        for i, t in enumerate(sorted(PII_PATTERNS)):
            assert got[doc_id][f"n_{t}"] == row[1 + i], (doc_id, t)
        assert got[doc_id]["redacted"] == row[-1], doc_id


def test_pii_validation_and_plan(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    with pytest.raises(ValueError, match="unknown PII types"):
        pii_scan(df, types=["email", "dna"])
    out = pii_scan(df, types=["email", "ssn"])
    assert "n_email" in out.columns and "n_card" not in out.columns
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
    assert "Exchange" not in plan  # pure projection


def test_pii_scan_refuses_colliding_columns(spark):
    df = spark.createDataFrame(
        [(1, "x", 0)], "doc_id long, text string, n_email long"
    )
    with pytest.raises(ValueError, match="collide"):
        pii_scan(df)
    # rerunning on own output collides on 'redacted'
    clean = pii_scan(df.drop("n_email"))
    with pytest.raises(ValueError, match="collide"):
        pii_scan(clean)
