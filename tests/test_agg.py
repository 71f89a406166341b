

def test_trending_terms_rank_movement(spark):
    """Day 1: E1 x3, E2 x2, E3 x1.  Day 2: E3 x5, E1 x2, E2 x1.
    top_k=2 cuts E3 from day 1's OUTPUT but its day-2 prev_rank must
    still be 3 (ranked over all values before the cut)."""
    import datetime as dt

    from log_aggregation_pipeline_spark.operators.agg import trending_terms

    d1, d2 = dt.datetime(2024, 1, 1, 9), dt.datetime(2024, 1, 2, 9)
    rows = (
        [("E1", d1)] * 3 + [("E2", d1)] * 2 + [("E3", d1)]
        + [("E3", d2)] * 5 + [("E1", d2)] * 2 + [("E2", d2)]
    )
    df = spark.createDataFrame(
        [(i, c, t) for i, (c, t) in enumerate(rows)],
        "id long, error_code string, ts timestamp",
    )
    got = {(r.bucket.day, r.term): r for r in
           trending_terms(df, "error_code", top_k=2).collect()}
    assert set(got) == {(1, "E1"), (1, "E2"), (2, "E3"), (2, "E1")}
    assert got[(1, "E1")].rank == 1 and got[(1, "E1")].prev_rank is None
    r = got[(2, "E3")]
    assert (r.rank, r.prev_rank, r.rank_delta) == (1, 3, -2)  # riser
    r = got[(2, "E1")]
    assert (r.rank, r.prev_rank, r.rank_delta) == (2, 1, 1)   # faller


def test_trending_terms_gap_reentrant_is_new(spark):
    """A term returning after an absent bucket must have prev_rank
    NULL (lag alone would skip the gap and report it 'steady')."""
    import datetime as dt

    from log_aggregation_pipeline_spark.operators.agg import trending_terms

    d1, d3 = dt.datetime(2024, 1, 1, 9), dt.datetime(2024, 1, 3, 9)
    rows = [("E1", d1), ("FILL", d1), ("FILL", d3), ("E1", d3)]
    df = spark.createDataFrame(
        [(i, c, t) for i, (c, t) in enumerate(rows)],
        "id long, error_code string, ts timestamp",
    )
    got = {(r.bucket.day, r.term): r for r in
           trending_terms(df, "error_code", top_k=5).collect()}
    r = got[(3, "E1")]
    assert r.prev_rank is None and r.rank_delta is None  # day 2 absent


def test_trending_terms_invalid_interval_raises(spark):
    import pytest

    from log_aggregation_pipeline_spark.operators.agg import trending_terms

    df = spark.range(1)  # never evaluated — validation is up-front
    with pytest.raises(ValueError, match="interval"):
        trending_terms(df, "error_code", interval="fortnight")
