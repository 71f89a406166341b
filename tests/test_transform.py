"""Processor library goldens (reference processor.go:31-200)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from log_aggregation_pipeline_spark.operators.transform import (
    add_fields,
    build_chain,
    drop_fields,
    filter_contains,
    lowercase,
    rename_fields,
    trim,
)


@pytest.fixture()
def df(spark):
    return spark.createDataFrame(
        [
            Row(message="  Hello World  ", fields={"env": "PROD", "old": "v1"}),
            Row(message="other", fields=None),
        ]
    )


def test_add_fields_upserts(df):
    out = df.transform(add_fields({"env": "staging", "team": "core"}))
    rows = {r.message: r.fields for r in out.collect()}
    assert rows["  Hello World  "] == {"old": "v1", "env": "staging", "team": "core"}
    assert rows["other"] == {"env": "staging", "team": "core"}  # NULL map ok


def test_rename_fields(df):
    out = df.transform(rename_fields({"old": "new", "absent": "x"}))
    r = out.filter("message like '%Hello%'").first()
    assert r.fields == {"env": "PROD", "new": "v1"}  # old moved, absent no-op


def test_drop_fields(df):
    r = df.transform(drop_fields(["old", "nope"])).first()
    assert r.fields == {"env": "PROD"}


def test_lowercase_envelope_and_map(df):
    out = df.transform(lowercase(["message", "env"]))
    r = out.filter("message like '%hello%'").first()
    assert r.message == "  hello world  "
    assert r.fields["env"] == "prod"  # map entry, envelope col absent


def test_trim(df):
    assert df.transform(trim(["message"])).first().message == "Hello World"


def test_filter_drop_and_keep(df):
    assert df.transform(filter_contains("message", "Hello")).count() == 1
    assert (
        df.transform(filter_contains("message", "Hello", drop_if_match=False)).count()
        == 1
    )
    # map-field filter, NULL map row is kept when dropping
    assert df.transform(filter_contains("env", "PROD")).count() == 1


def test_build_chain(df):
    chain = build_chain(
        [
            {"type": "trim", "fields": ["message"]},
            {"type": "lowercase", "fields": ["message"]},
            {"type": "add_fields", "fields": {"stage": "test"}},
            {"type": "filter", "field": "message", "pattern": "hello",
             "drop_if_match": False},
        ]
    )
    rows = chain(df).collect()
    assert len(rows) == 1
    assert rows[0].message == "hello world"
    assert rows[0].fields["stage"] == "test"


def test_tags_ops(spark):
    from pyspark.sql import Row

    from log_aggregation_pipeline_spark.operators.transform import (
        add_tags,
        filter_by_tag,
        has_tag,
    )

    df = spark.createDataFrame(
        [Row(msg="a", tags=["x"]), Row(msg="b", tags=None)]
    )
    tagged = df.transform(add_tags(["x", "prod"]))
    rows = {r.msg: r.tags for r in tagged.collect()}
    assert rows["a"] == ["x", "prod"]  # append-if-absent, no dup 'x'
    assert rows["b"] == ["x", "prod"]  # NULL array ok
    assert tagged.filter(has_tag("prod")).count() == 2
    assert df.transform(filter_by_tag("x")).count() == 1
    assert df.transform(filter_by_tag("x", keep=False)).count() == 1


def test_parse_with_fields(spark, transcripts):
    from log_aggregation_pipeline_spark.operators.parse import parse_transcripts

    p = parse_transcripts(transcripts, with_fields=True)
    r = p.filter("parse_ok AND error_code IS NOT NULL").first()
    assert r.fields["svc"] == "api"
    assert r.fields["code"] == "E" + r.error_code


def test_conditional_processor(spark):
    from pyspark.sql import functions as F

    from log_aggregation_pipeline_spark.operators.transform import conditional

    df = spark.createDataFrame(
        [("ERROR boom",), ("info fine",), (None,)], "message string"
    )
    out = df.transform(
        conditional("message LIKE 'ERROR%'", lowercase(["message"]))
    ).collect()
    msgs = sorted((r.message or "") for r in out)
    assert msgs == ["", "error boom", "info fine"]  # only matches transformed
    assert len(out) == 3  # NULL-condition rows pass through untouched


def test_conditional_project_one_pass(spark):
    from pyspark.sql import functions as F

    from log_aggregation_pipeline_spark.operators.transform import (
        conditional_project,
    )

    df = spark.createDataFrame(
        [("ERROR boom",), ("info fine",), (None,)], "message string"
    )
    op = conditional_project(
        "message LIKE 'ERROR%'", message=F.lower("message")
    )
    out = df.transform(op)
    msgs = sorted((r.message or "") for r in out.collect())
    assert msgs == ["", "error boom", "info fine"]
    # one pass: a single scan, no Union in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Union" not in plan and plan.count("Scan") == 1


def test_dedup_and_sample_filters(spark, transcripts):
    from log_aggregation_pipeline_spark.functions.ids import deterministic_id
    from log_aggregation_pipeline_spark.operators.transform import (
        dedup_filter,
        sample_filter,
    )

    with_id = transcripts.withColumn("id", deterministic_id())
    doubled = with_id.unionByName(with_id)
    assert doubled.transform(dedup_filter()).count() == with_id.count()

    n = transcripts.count()
    s1 = transcripts.transform(sample_filter(0.25)).count()
    s2 = transcripts.transform(sample_filter(0.25)).count()
    assert s1 == s2  # seeded => reproducible
    assert 0.1 * n < s1 < 0.4 * n


def test_build_chain_unknown_type():
    with pytest.raises(ValueError, match="unknown processor type"):
        build_chain([{"type": "nope"}])
