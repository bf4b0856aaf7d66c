"""PII scrubbing (llm/pii.py): redaction + counts over crafted rows —
the synthetic corpus has no PII, so evidence lives here."""

from pyspark.sql import functions as F

from flink_release_1_10_0_spark.llm.pii import (PII_PATTERNS, pii_counts,
                                                scrub_pii)
from tests.conftest import spark  # noqa: F401  (fixture)

ROWS = [
    (1, "contact alice.smith+x@example.co.uk for details"),
    (2, "call +1 (415) 555-0123 or 020 7946 0958 today"),
    (3, "server at 192.168.001.1 and 10.0.0.255 responded"),
    (4, "mixed: bob@host.org, +44 7700 900123, 8.8.8.8"),
    (5, "clean text with no identifiers at all"),
]


def _df(spark):
    return spark.createDataFrame(ROWS, ["doc_id", "text"])


def test_scrub_replaces_and_counts(spark):  # noqa: F811
    out = {r["doc_id"]: r for r in scrub_pii(_df(spark)).collect()}
    assert out[1]["email_count"] == 1
    assert "<EMAIL>" in out[1]["text"] and "alice" not in out[1]["text"]
    assert out[2]["phone_count"] == 2
    assert "<PHONE>" in out[2]["text"] and "555" not in out[2]["text"]
    assert out[3]["ipv4_count"] == 2
    assert "<IPV4>" in out[3]["text"] and "192.168" not in out[3]["text"]
    # mixed row: one of each; email redacted before phone so the mailbox
    # is not double-eaten
    assert (out[4]["email_count"], out[4]["phone_count"],
            out[4]["ipv4_count"]) == (1, 1, 1)
    assert out[5]["text"] == ROWS[4][1]
    assert (out[5]["email_count"], out[5]["phone_count"],
            out[5]["ipv4_count"]) == (0, 0, 0)


def test_counts_are_jvm_side(spark):  # noqa: F811
    plan = (_df(spark).select("doc_id", *pii_counts("text"))
            ._jdf.queryExecution().executedPlan().toString())
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_patterns_precision(spark):  # noqa: F811
    # things that must NOT match: bare version strings, short numbers,
    # `a@b` without a TLD
    df = spark.createDataFrame(
        [(1, "v1.2.3 released; see a@b note; room 1234")], ["i", "text"])
    row = df.select(*pii_counts("text")).collect()[0]
    assert (row["email_count"], row["phone_count"], row["ipv4_count"]) == (0, 0, 0)
    assert set(PII_PATTERNS) == {"email", "phone", "ipv4"}
