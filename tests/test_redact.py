"""PII redaction (operators/redact.py): unit cases, ordering semantics,
and DuckDB parity with the SAME pattern strings (Java-regex ∩ RE2)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from bigdataproject_spark.operators.redact import (
    PII_PATTERNS,
    pii_counts,
    redact_expr,
)

CASES = [
    ("mail me at jo.smith+tag@example.co.uk please", "mail me at <email> please"),
    ("see https://example.com/a?b=c&d=e now", "see <url> now"),
    ("host is 192.168.0.1 ok", "host is <ipv4> ok"),
    ("999.999.999.999 is not an ip", "999.999.999.999 is not an ip"),
    ("call +1 (555) 010-4477 today", "call <phone> today"),
    # dot-separated phones are the documented miss ('.' is not a phone
    # separator so dotted digit runs — IPs, versions — survive)
    ("call 555.010.4477 today", "call 555.010.4477 today"),
    ("v1.2.3.4000 stays", "v1.2.3.4000 stays"),
    ("a url with creds http://u:p@h.example/x", "a url with creds <url>"),
    # IP-literal hosts redact as one email token — without the
    # dotted-quad alternative the ipv4 pass would leave 'user@' exposed
    ("mail user@192.168.1.1 ok", "mail <email> ok"),
    # invalid quad host: not an email, not an ip — fully untouched
    # (the IP alternative carries \b so no partial redaction)
    ("mail user@192.168.1.1234 ok", "mail user@192.168.1.1234 ok"),
    ("no pii here", "no pii here"),
    ("", ""),
]


def test_redact_unit_cases(spark):
    df = spark.createDataFrame([(t,) for t, _ in CASES], "text string")
    got = [r["red"] for r in df.select(redact_expr("text").alias("red")).collect()]
    assert got == [want for _, want in CASES]


def test_url_swallows_email_first(spark):
    """Ordering: the email inside a URL's userinfo must not survive as
    a second token, and counts mirror the redaction."""
    df = spark.createDataFrame(
        [("ftp is fine but http://bob@example.com/x and bob@example.com",)],
        "text string",
    )
    out = df.select(
        redact_expr("text").alias("red"),
        *[c.alias(n) for n, c in pii_counts("text").items()],
    ).collect()[0]
    assert out["red"] == "ftp is fine but <url> and <email>"
    assert out["n_url"] == 1 and out["n_email"] == 1
    assert out["n_ipv4"] == 0 and out["n_phone"] == 0


def test_counts_selected_kinds_only(spark):
    df = spark.createDataFrame([("a@b.io and 10.0.0.7",)], "text string")
    cols = pii_counts("text", kinds=("email",))
    assert list(cols) == ["n_email"]
    assert df.select(cols["n_email"].alias("n")).collect()[0]["n"] == 1


@pytest.mark.parametrize("kind", list(PII_PATTERNS))
def test_duckdb_pattern_parity(spark, kind):
    """The exact pattern string must behave identically in DuckDB (RE2)
    — the property that makes a registry oracle possible."""
    texts = [t for t, _ in CASES] + [
        "mixed: a@b.co http://x.y/z 8.8.8.8 +44 20 7946 0958 end"
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    spark_out = [
        r["red"]
        for r in df.select(
            F.regexp_replace("text", F.lit(PII_PATTERNS[kind]), F.lit("#")).alias(
                "red"
            )
        ).collect()
    ]
    con = duckdb.connect()
    duck_out = [
        con.execute(
            "SELECT regexp_replace(?, ?, '#', 'g')", [t, PII_PATTERNS[kind]]
        ).fetchone()[0]
        for t in texts
    ]
    assert spark_out == duck_out


def test_redaction_idempotent(spark):
    """Redacting already-redacted text changes nothing (tokens contain
    no redactable substrings)."""
    df = spark.createDataFrame([(t,) for t, _ in CASES], "text string")
    once = df.select(redact_expr("text").alias("text"))
    twice = once.select(redact_expr("text").alias("text"))
    assert [r["text"] for r in once.collect()] == [
        r["text"] for r in twice.collect()
    ]
