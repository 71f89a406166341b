"""Lucene-ish query syntax (F4), KV/CSV parsers, sessionization,
top-k per group, pivot/rollup."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from log_aggregation_pipeline_spark.operators.agg import pivot_counts, rollup_counts
from log_aggregation_pipeline_spark.operators.order import sessionize, top_k_per_group
from log_aggregation_pipeline_spark.operators.parse import (
    parse_csv_lines,
    parse_kv,
    parse_transcripts,
)
from log_aggregation_pipeline_spark.operators.search_syntax import (
    QuerySyntaxError,
    compile_query,
)


# --- F4 query syntax ---------------------------------------------------------
@pytest.fixture(scope="module")
def parsed(spark, transcripts):
    return parse_transcripts(transcripts)


def test_syntax_field_equality(parsed):
    got = parsed.filter(compile_query("level:ERROR")).count()
    assert got == parsed.filter(F.col("level") == "ERROR").count() > 0


def test_syntax_bool_and_parens(parsed):
    q = "level:ERROR AND (role:user OR role:system)"
    exp = parsed.filter(
        (F.col("level") == "ERROR")
        & ((F.col("role") == "user") | (F.col("role") == "system"))
    ).count()
    assert parsed.filter(compile_query(q)).count() == exp


def test_syntax_not_and_juxtaposition(parsed):
    # juxtaposition = AND (lucene default)
    a = parsed.filter(compile_query("level:ERROR NOT role:user")).count()
    b = parsed.filter(
        (F.col("level") == "ERROR") & ~(F.col("role") == "user")
    ).count()
    assert a == b


def test_syntax_bare_term_substring(parsed):
    assert (
        parsed.filter(compile_query("CODE=E0")).count()
        == parsed.filter(F.lower("text").contains("code=e0")).count()
    )


def test_syntax_range(parsed):
    q = 'ts:[2024-01-02 TO "2024-01-03 00:00:00"]'
    exp = parsed.filter(
        F.col("ts").between("2024-01-02", "2024-01-03 00:00:00")
    ).count()
    assert parsed.filter(compile_query(q)).count() == exp


def test_syntax_empty_matches_all(parsed):
    assert parsed.filter(compile_query("  ")).count() == parsed.count()


@pytest.mark.parametrize("bad", ["(level:ERROR", "ts:[1 TO", "a AND", ":x"])
def test_syntax_errors(bad):
    with pytest.raises(QuerySyntaxError):
        compile_query(bad)


# --- KV / CSV parsers --------------------------------------------------------
def test_parse_kv(spark):
    df = spark.createDataFrame(
        [Row(text="svc=api code=E042 took value=29ms"), Row(text="no pairs here")]
    )
    rows = parse_kv(df).collect()
    by_ok = {r.parse_ok: r for r in rows}
    assert by_ok[True].fields == {"svc": "api", "code": "E042", "value": "29ms"}
    assert by_ok[False].fields == {}


def test_parse_csv(spark):
    df = spark.createDataFrame([Row(raw="7,hello,2.5"), Row(raw="8,world,")])
    out = parse_csv_lines(df, "a INT, b STRING, c DOUBLE").collect()
    assert (out[0].a, out[0].b, out[0].c) == (7, "hello", 2.5)
    assert out[1].c is None  # missing trailing field -> NULL, row kept


# --- sessionize --------------------------------------------------------------
def test_sessionize_gap_semantics(spark):
    rows = [
        ("c1", 0, "2024-01-01 00:00:00"),
        ("c1", 1, "2024-01-01 00:10:00"),  # 10 min -> same session
        ("c1", 2, "2024-01-01 01:10:00"),  # 60 min -> new session
        ("c1", 3, "2024-01-01 01:15:00"),
        ("c2", 0, "2024-01-01 05:00:00"),  # other conv independent
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, ts_s string")
    df = df.withColumn("ts", F.to_timestamp("ts_s"))
    got = {
        (r.conv_id, r.turn_idx): r.session_id
        for r in sessionize(df, gap_minutes=30).collect()
    }
    assert got == {("c1", 0): 0, ("c1", 1): 0, ("c1", 2): 1, ("c1", 3): 1, ("c2", 0): 0}


# --- top-k per group ---------------------------------------------------------
def test_top_k_per_group(transcripts):
    counts = transcripts.groupBy("role", "conv_id").agg(F.count("*").alias("n"))
    top = top_k_per_group(counts, ["role"], "n", 3, tiebreakers=["conv_id"])
    pdf = top.toPandas()
    assert (pdf.groupby("role").size() <= 3).all()
    # each group's members are the true maxima
    for role, grp in pdf.groupby("role"):
        all_n = counts.filter(F.col("role") == role).toPandas()["n"]
        assert grp["n"].min() >= all_n.nlargest(3).min()


# --- pivot / rollup ----------------------------------------------------------
def test_pivot_counts(parsed):
    out = pivot_counts(parsed, "role", "level", ["ERROR", "INFO", "WARN"]).toPandas()
    exp = (
        parsed.filter(F.col("level") == "ERROR").groupBy("role").count().toPandas()
        .set_index("role")["count"]
    )
    got = out.set_index("role")["ERROR"]
    assert got.sort_index().eq(exp.sort_index()).all()
    assert (out[["ERROR", "INFO", "WARN"]].fillna(-1) >= 0).all().all()  # fill(0)


def test_rollup_counts(parsed):
    out = rollup_counts(parsed, ["role", "level"]).toPandas()
    total = out[out["gid"] == 3]["n"]  # both dims rolled up
    assert len(total) == 1 and total.iloc[0] == parsed.count()
    per_role = out[out["gid"] == 1]  # level rolled up, role kept
    assert per_role["n"].sum() == parsed.count()
    # gid separates subtotals from genuine NULL level values
    null_level_data = out[(out["gid"] == 0) & out["level"].isna()]
    assert null_level_data["n"].sum() == parsed.filter("level IS NULL").count()
