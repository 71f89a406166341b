"""Query engine: search/sort/paginate/lookup/aggregate vs pandas truth
(reference query.go + store.go semantics, with documented fixes)."""

from __future__ import annotations

import pandas as pd
import pytest

from log_aggregation_pipeline_spark.functions.ids import deterministic_id
from log_aggregation_pipeline_spark.operators.agg import limited_terms_agg_compat
from log_aggregation_pipeline_spark.operators.query import (
    DEFAULT_LIMIT,
    MAX_LIMIT,
    SearchQuery,
    aggregate,
    clamp,
    get_by_id,
    search,
)

TIE = ("conv_id", "turn_idx")


def test_clamps():
    q = clamp(SearchQuery(limit=-5, offset=-3, sort_by="bogus", sort_order="sideways"))
    assert (q.limit, q.offset, q.sort_by, q.sort_order) == (
        DEFAULT_LIMIT, 0, "timestamp", "desc")
    assert clamp(SearchQuery(limit=999_999)).limit == MAX_LIMIT


def test_time_range_closed(transcripts, transcripts_pdf):
    start, end = "2024-01-01 00:00:00", "2024-01-02 00:00:00"
    got = search(
        transcripts, SearchQuery(start=start, end=end, limit=MAX_LIMIT),
        tiebreakers=TIE,
    ).count()
    m = transcripts_pdf["ts"].between(pd.Timestamp(start), pd.Timestamp(end))
    assert got == int(m.sum())
    # closed interval: a row exactly at the bound is included
    bound = transcripts_pdf["ts"].iloc[0]
    got_b = search(
        transcripts, SearchQuery(start=str(bound), end=str(bound), limit=10),
    ).count()
    assert got_b == int((transcripts_pdf["ts"] == bound).sum())


def test_substring_ci(transcripts, transcripts_pdf):
    got = search(
        transcripts, SearchQuery(query="CODE=e0", limit=MAX_LIMIT)
    ).count()
    exp = transcripts_pdf["text"].str.lower().str.contains("code=e0").sum()
    assert got == int(exp)


def test_empty_query_matches_all(transcripts, transcripts_pdf):
    assert (
        search(transcripts, SearchQuery(limit=MAX_LIMIT)).count()
        == len(transcripts_pdf)
    )


def test_field_filters(transcripts, transcripts_pdf):
    got = search(
        transcripts,
        SearchQuery(filters={"role": "user"}, limit=MAX_LIMIT),
    ).count()
    assert got == int((transcripts_pdf["role"] == "user").sum())


def test_global_order_then_paginate(transcripts, transcripts_pdf):
    """Corrected O3: pagination is over the global order, so pages
    concatenate to the global prefix (the reference's page-local sort
    does not guarantee this)."""
    pages = []
    for off in (0, 40, 80):
        pdf = search(
            transcripts,
            SearchQuery(limit=40, offset=off, sort_order="asc"),
            tiebreakers=TIE,
        ).toPandas()
        pages.append(pdf)
    got = pd.concat(pages, ignore_index=True)
    exp = (
        transcripts_pdf.sort_values(["ts", *TIE]).head(120)
        .reset_index(drop=True)[got.columns]
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_offset_past_end_is_empty(transcripts):
    n = transcripts.count()
    assert search(transcripts, SearchQuery(limit=10, offset=n + 5)).count() == 0


def test_get_by_id(spark, transcripts):
    with_id = transcripts.withColumn("id", deterministic_id())
    some = with_id.first()
    r = get_by_id(with_id, some.id).collect()
    assert len(r) == 1 and r[0].conv_id == some.conv_id
    assert get_by_id(with_id, "no-such-id").count() == 0


def test_aggregate_full_set_not_page(transcripts, transcripts_pdf):
    """Deviation test (SURVEY.md §2.5): our terms agg covers the whole
    filtered set; the reference's covers at most `limit` rows."""
    out = aggregate(transcripts, SearchQuery(limit=10), "terms", "role").toPandas()
    exp = transcripts_pdf["role"].value_counts()
    assert dict(zip(out["key"], out["count"])) == exp.to_dict()
    # the reproduced quirk, for documentation:
    page = limited_terms_agg_compat(transcripts, "role", 10).toPandas()
    assert page["count"].sum() == 10


def test_aggregate_unsupported_type(transcripts):
    with pytest.raises(ValueError, match="unsupported aggregation"):
        aggregate(transcripts, SearchQuery(), "median_of_medians")
