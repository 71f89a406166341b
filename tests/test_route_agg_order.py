"""Route fan-out, aggregates, ordering — Spark vs the pure-pandas
fixture twin (FIXTURES.md §3).  Both sides derive predicates from the
single ROUTES dict, and the pandas twin applies the same regexes."""

from __future__ import annotations

import re

import pandas as pd
import pytest
from pyspark.sql import functions as F

from log_aggregation_pipeline_spark.operators.agg import (
    conv_hour_agg,
    date_histogram,
    terms_agg,
)
from log_aggregation_pipeline_spark.operators.order import (
    ordered_turn_triples,
    with_turn_order,
)
from log_aggregation_pipeline_spark.operators.parse import (
    CODE_PATTERN,
    LEVEL_PATTERN,
    TOOL_PATTERN,
    parse_transcripts,
)
from log_aggregation_pipeline_spark.operators.route import ROUTES, route_all, route_pandas
from log_aggregation_pipeline_spark.functions.levels import LEVEL_ALIASES


def pandas_parse(pdf: pd.DataFrame) -> pd.DataFrame:
    """The fixture twin of parse_transcripts (pure pandas)."""
    out = pdf.copy()
    out["level_raw"] = out["text"].str.extract(re.compile(LEVEL_PATTERN))[0]
    out["error_code"] = out["text"].str.extract(re.compile(CODE_PATTERN))[0]
    tool = out["text"].str.extract(re.compile(TOOL_PATTERN))
    out["tool_sig"], out["tool_args"] = tool[0], tool[1]
    alias_to_canon = {a: c for c, al in LEVEL_ALIASES.items() for a in al}
    out["level"] = out["level_raw"].map(
        lambda v: None if pd.isna(v) else alias_to_canon.get(v.upper(), "INFO")
    )
    out["parse_ok"] = out["level_raw"].notna()
    return out


@pytest.fixture(scope="module")
def parsed(spark, transcripts):
    return parse_transcripts(transcripts).persist()


@pytest.fixture(scope="module")
def parsed_pdf(transcripts_pdf):
    return pandas_parse(transcripts_pdf)


KEY = ["conv_id", "turn_idx"]


def test_routed_row_equality(parsed, parsed_pdf):
    sinks = route_all(parsed, persist=False)
    expected = route_pandas(parsed_pdf)
    for name in ROUTES:
        got = (
            sinks[name].select("conv_id", "turn_idx", "text").toPandas()
            .sort_values(KEY).reset_index(drop=True)
        )
        exp = (
            expected[name][["conv_id", "turn_idx", "text"]]
            .sort_values(KEY).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_fanout_not_partition(parsed, parsed_pdf):
    """A row may land in several sinks; union of sinks ⊆ input."""
    exp = route_pandas(parsed_pdf)
    in_both = exp["errors"].merge(exp["user_turns"], on=KEY, how="inner")
    # generator makes user-role ERROR rows, so overlap must exist
    assert len(in_both) > 0
    sinks = route_all(parsed, persist=False)
    union = None
    for s in sinks.values():
        part = s.select(*KEY)
        union = part if union is None else union.unionByName(part)
    # set containment (union is a multiset — fan-out duplicates keys)
    assert union.distinct().join(parsed.select(*KEY), KEY, "left_anti").count() == 0


def test_conv_hour_agg_vs_pandas(parsed, parsed_pdf):
    exp = (
        route_pandas(parsed_pdf)["errors"]
        .assign(hour=lambda d: d["ts"].dt.floor("h"))
        .groupby(["conv_id", "hour"], as_index=False)
        .agg(n_turns=("ts", "size"), min_ts=("ts", "min"), max_ts=("ts", "max"))
        .sort_values(["conv_id", "hour"]).reset_index(drop=True)
    )
    got = (
        conv_hour_agg(parsed.filter(ROUTES["errors"].spark_pred())).toPandas()
        .sort_values(["conv_id", "hour"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_salted_equals_unsalted(parsed):
    plain = conv_hour_agg(parsed).orderBy("conv_id", "hour").toPandas()
    salted = conv_hour_agg(parsed, salted=True, n_salt=8).orderBy(
        "conv_id", "hour"
    ).toPandas()
    pd.testing.assert_frame_equal(plain, salted)


def test_terms_agg_skips_empty(spark):
    df = spark.createDataFrame(
        [("a",), ("a",), ("b",), ("",), (None,)], "f string"
    )
    rows = terms_agg(df, "f").collect()
    assert [(r.key, r["count"]) for r in rows] == [("a", 2), ("b", 1)]


def test_date_histogram_buckets(parsed, parsed_pdf):
    got = date_histogram(parsed, "ts", "hour").toPandas()
    exp = (
        parsed_pdf.assign(bucket=lambda d: d["ts"].dt.floor("h"))
        .groupby("bucket", as_index=False).size()
        .rename(columns={"size": "count"})
        .sort_values("bucket").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_turn_order_equality(transcripts, transcripts_pdf):
    """North-rule invariant: per-turn text equality under stable order."""
    got = ordered_turn_triples(transcripts).toPandas()
    exp = (
        transcripts_pdf[["conv_id", "turn_idx", "text"]]
        .sort_values(KEY).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_turn_rank_contiguous(transcripts):
    df = with_turn_order(transcripts, prev_text=True)
    # turn_idx is 0-based contiguous in the generator -> rank = idx + 1
    assert df.filter(F.col("turn_rank") != F.col("turn_idx") + 1).count() == 0
    # prev_text lags within conversation only
    first = df.filter(F.col("turn_idx") == 0)
    assert first.filter(F.col("prev_text").isNotNull()).count() == 0


def test_skew_present(transcripts_pdf):
    """Generator sanity: heavy hitters really are ≥20% each."""
    counts = transcripts_pdf["conv_id"].value_counts(normalize=True)
    assert (counts.iloc[:2] >= 0.15).all()
