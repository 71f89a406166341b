"""Spike detection: constructed burst flags, steady traffic doesn't."""

from __future__ import annotations

import datetime as dt

from log_aggregation_pipeline_spark.operators.anomaly import spike_detection


def _events(spark, counts_by_hour, etype="error"):
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    for h, n in enumerate(counts_by_hour):
        for i in range(n):
            rows.append((len(rows), t0 + dt.timedelta(hours=h, minutes=i % 60), etype))
    return spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string")


def test_burst_flags_steady_does_not(spark):
    # 12 steady hours at ~10/h (slight jitter so variance > 0), then a 60-burst
    steady = [10, 11, 9, 10, 12, 10, 9, 11, 10, 10, 9, 11]
    df = _events(spark, steady + [60] + [10])
    got = {r.bucket.hour: r for r in spike_detection(df, min_history=6).collect()}
    assert got[12].is_spike and got[12].z_score > 3
    # the steady hours with enough history are scored but not flagged
    flagged = [h for h, r in got.items() if r.is_spike]
    assert flagged == [12]
    # hour 13 is scored against a window containing the burst -> not a spike
    assert not got[13].is_spike


def test_warmup_hours_not_scored(spark):
    df = _events(spark, [10, 11, 9, 10, 12])  # under min_history everywhere
    assert spike_detection(df, min_history=6).count() == 0


def test_zero_variance_history_excluded(spark):
    # perfectly constant history -> var 0 -> no division blowup, no rows
    df = _events(spark, [10] * 10)
    assert spike_detection(df, min_history=6).count() == 0


def test_min_history_guard_and_validation(spark):
    import pytest

    # 3-bucket input, min_history=2: the cnt=0/cnt=1 rows flow through
    # the projection before the history filter — the guarded divisors
    # must yield NULL there, not an ANSI DIVIDE_BY_ZERO
    df = _events(spark, [10, 12, 30])
    got = {r.bucket.hour: r for r in spike_detection(df, min_history=2).collect()}
    assert list(got) == [2]  # only the bucket with 2 history rows scores
    with pytest.raises(ValueError, match="min_history"):
        spike_detection(df, min_history=1)
