"""Parser goldens — same literal in/out pairs as the reference's tests
(/root/reference/pkg/pipeline/parser/parser_test.go,
 /root/reference/internal/agent/collector/syslog.go:188-244) so our
parsers agree line-for-line (FIXTURES.md §4)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from log_aggregation_pipeline_spark.functions.levels import normalize_level
from log_aggregation_pipeline_spark.operators.parse import (
    grok_to_regex,
    parse_grok,
    parse_json,
    parse_nginx,
    parse_regex,
    parse_syslog,
    parse_transcripts,
)


def _one(spark, raw):
    return spark.createDataFrame([Row(raw=raw)])


# --- P1 JSON (parser_test.go:13-41) ---------------------------------------
def test_json_happy_path(spark):
    raw = '{"level":"ERROR","message":"test error","timestamp":"2024-01-01T12:00:00Z","custom":"value"}'
    r = parse_json(_one(spark, raw)).first()
    assert r.message == "test error"
    assert r.level == "ERROR"
    assert r.fields["custom"] == "value"
    assert str(r.parsed_ts) == "2024-01-01 12:00:00"
    assert r.parse_ok


def test_json_invalid_is_total(spark):
    # reference errors the row (parser_test.go:31-41); ours is total:
    # parse_ok=false, message falls back to raw.
    r = parse_json(_one(spark, "not json at all")).first()
    assert not r.parse_ok
    assert r.message == "not json at all"


# --- P2 level table (parser.go:92-108) -------------------------------------
@pytest.mark.parametrize(
    "raw,expected",
    [
        ("DEBUG", "DEBUG"), ("DBG", "DEBUG"), ("TRACE", "DEBUG"),
        ("INFO", "INFO"), ("INFORMATION", "INFO"),
        ("WARN", "WARN"), ("WARNING", "WARN"),
        ("ERROR", "ERROR"), ("ERR", "ERROR"),
        ("FATAL", "FATAL"), ("CRITICAL", "FATAL"), ("PANIC", "FATAL"),
        ("weird", "INFO"), ("info", "INFO"), ("warning", "WARN"),
    ],
)
def test_level_normalization(spark, raw, expected):
    r = _one(spark, raw).select(normalize_level("raw").alias("lvl")).first()
    assert r.lvl == expected


def test_level_null_preserved(spark):
    df = spark.createDataFrame([Row(raw=None)], "raw string")
    assert df.select(normalize_level("raw").alias("l")).first().l is None


# --- P4 regex named groups (parser_test.go:44-68) ---------------------------
def test_regex_named_groups(spark):
    pat = r"^(?P<timestamp>\S+) (?P<level>\w+) (?P<message>.+)$"
    r = parse_regex(
        _one(spark, "2024-01-01T12:00:00Z ERROR something went wrong"), pat, "raw"
    ).first()
    assert r.message == "something went wrong"
    assert r.level == "ERROR"
    assert str(r.parsed_ts) == "2024-01-01 12:00:00"
    assert r.parse_ok


def test_regex_no_match_is_total(spark):
    pat = r"^(?P<timestamp>\d+) (?P<level>\w+)$"
    r = parse_regex(_one(spark, "no digits here"), pat, "raw").first()
    assert not r.parse_ok
    assert r.timestamp is None


# --- P3 unix seconds (parser.go:132 time.Unix path) --------------------------
def test_timestamp_unix_seconds(spark):
    from log_aggregation_pipeline_spark.functions.timestamps import multi_format_ts

    df = spark.createDataFrame(
        [Row(raw="1704110400"), Row(raw="1704110400.5"), Row(raw="not a ts")]
    )
    rows = df.select(multi_format_ts("raw").alias("t")).collect()
    assert str(rows[0].t) == "2024-01-01 12:00:00"
    assert str(rows[1].t) == "2024-01-01 12:00:00.500000"
    assert rows[2].t is None  # total: unparseable -> NULL


# --- P5 nginx (parser_test.go:75-110) ---------------------------------------
NGINX_LINE = (
    '192.168.1.1 - user1 [01/Jan/2024:12:00:00 +0000] '
    '"GET /api/users HTTP/1.1" 200 1234 "https://example.com" "Mozilla/5.0"'
)


def test_nginx_combined(spark):
    r = parse_nginx(_one(spark, NGINX_LINE)).first()
    assert r.remote_addr == "192.168.1.1"
    assert r.remote_user == "user1"
    assert r.request_method == "GET"
    assert r.request_path == "/api/users"
    assert r.status == "200"
    assert r.body_bytes_sent == "1234"
    assert r.level == "INFO"
    assert r.message == "GET /api/users HTTP/1.1 - 200"
    assert str(r.parsed_ts) == "2024-01-01 12:00:00"


@pytest.mark.parametrize("status,level", [(200, "INFO"), (404, "WARN"), (500, "ERROR"), (503, "ERROR")])
def test_nginx_status_level(spark, status, level):
    line = NGINX_LINE.replace(" 200 ", f" {status} ")
    assert parse_nginx(_one(spark, line)).first().level == level


# --- P6 syslog RFC3164 (syslog.go:188-244) ----------------------------------
def test_syslog_rfc3164(spark):
    r = parse_syslog(_one(spark, "<11>Jan  2 15:04:05 myhost something failed")).first()
    assert r.severity == 3  # 11 & 7
    assert r.level == "ERROR"
    assert r.syslog_host == "myhost"
    assert r.message == "something failed"
    assert str(r.parsed_ts) == "2024-01-02 15:04:05"


@pytest.mark.parametrize(
    "pri,level",
    [(0, "FATAL"), (2, "FATAL"), (3, "ERROR"), (4, "WARN"), (5, "INFO"), (6, "INFO"), (7, "DEBUG"), (165, "INFO")],
)
def test_syslog_severity_table(spark, pri, level):
    r = parse_syslog(_one(spark, f"<{pri}>Jan  2 15:04:05 h m")).first()
    assert r.level == level


def test_syslog_fallback_total(spark):
    r = parse_syslog(_one(spark, "plain non-syslog line")).first()
    assert not r.parse_ok and r.level == "INFO" and r.message == "plain non-syslog line"


# --- P7 grok ---------------------------------------------------------------
def test_grok_expansion_and_parse(spark):
    g = "%{TIMESTAMP_ISO8601:timestamp} %{LOGLEVEL:level} %{GREEDYDATA:message}"
    r = parse_grok(
        _one(spark, "2024-01-01T12:00:00Z ERROR boom town"), g, raw_col="raw"
    ).first()
    assert r.level == "ERROR" and r.message == "boom town"


def test_grok_unnamed_refs():
    assert grok_to_regex("%{INT}") == r"(?:[+-]?\d+)"


# --- canonical transcript parse ---------------------------------------------
def test_transcript_parse_pandas_vs_native(spark, transcripts):
    a = parse_transcripts(transcripts, impl="pandas")
    b = parse_transcripts(transcripts, impl="native")
    cols = ["conv_id", "turn_idx", "id", "level_raw", "level",
            "error_code", "tool_sig", "tool_args", "parse_ok"]
    pa = a.select(cols).orderBy("conv_id", "turn_idx").toPandas()
    pb = b.select(cols).orderBy("conv_id", "turn_idx").toPandas()
    import pandas as pd

    pd.testing.assert_frame_equal(pa, pb)


def test_transcript_parse_total(spark, transcripts):
    parsed = parse_transcripts(transcripts)
    assert parsed.count() == transcripts.count()  # no rows dropped, ever
    bad = parsed.filter(~F.col("parse_ok"))
    assert bad.count() > 0  # generator makes ~10% garbled
    assert bad.filter(F.col("level").isNotNull()).count() == 0


def test_grok_recursive_library_and_cycle_guard():
    import re

    import pytest as _pytest

    rx = grok_to_regex("%{COMBINEDAPACHELOG}")
    line = (
        '10.0.0.7 - alice [10/Oct/2000:13:55:36 -0700] '
        '"POST /api/v1/items HTTP/1.1" 201 512 '
        '"http://ref.example/" "curl/8.0"'
    )
    m = re.match(rx, line)
    assert m and m.group("clientip") == "10.0.0.7"
    assert m.group("verb") == "POST" and m.group("response") == "201"
    # nested refs expand transitively (IPORHOST -> IP/HOSTNAME)
    assert "%{" not in rx
    with _pytest.raises(ValueError):
        grok_to_regex("%{A}", extra={"A": "%{B}", "B": "%{A}"})
