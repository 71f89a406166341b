"""PII/secret redaction: counts on original text, sequential scrub."""

from __future__ import annotations

from log_aggregation_pipeline_spark.operators.redact import redact

ROWS = [
    (0, "reach me at a.user+x@sub.example.co.uk or b@x.io thanks"),
    (1, "conn from 192.168.1.100 and 10.0.0.7 refused"),
    (2, "Authorization: Bearer abcdef1234567890 sent"),
    (3, "API_KEY=sk_live_0123456789abcdef set in env"),
    (4, "plain text with no sensitive content at all"),
    (5, "short token=ab7 must NOT match (under 8 chars)"),
]


def _rows(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    return {r.doc_id: r for r in redact(df).collect()}


def test_counts_per_pattern(spark):
    got = _rows(spark)
    assert got[0].n_email == 2 and got[0].n_ipv4 == 0
    assert got[1].n_ipv4 == 2
    assert got[2].n_secret == 1  # case-insensitive 'Bearer'
    assert got[3].n_secret == 1  # 'API_KEY=' upper-case
    assert got[4].n_email == got[4].n_ipv4 == got[4].n_secret == 0
    assert got[5].n_secret == 0  # value under the 8-char floor


def test_scrubbed_text(spark):
    got = _rows(spark)
    assert got[0].redacted == "reach me at [EMAIL] or [EMAIL] thanks"
    assert got[1].redacted == "conn from [IP] and [IP] refused"
    assert got[2].redacted == "Authorization: [SECRET] sent"
    assert got[4].redacted == got[4].text  # untouched when clean
