"""Volume anomaly detection — spike flags on the event stream.

A log pipeline's first alerting primitive: per (event_type, hour)
counts scored against the trailing window's distribution, flagging
buckets whose z-score clears a threshold.  The reference has no
anomaly story (its metrics are plain counters, metrics.go); this is
the aggregate-family extension an operator actually pages on.

Scale/portability notes:
- one count shuffle keyed on (type, hour) then a window per type —
  event-type cardinality is small, each partition's state is one row
  per hour (trailing RANGE frame on epoch seconds, so missing hours
  widen the gap instead of silently shrinking the frame);
- mean/variance are derived from EXACT integer window sums
  (sum, sum of squares, count) with the identical double formula on
  both engines — the repo's float-oracle rule; Welford-style built-in
  stddev aggregates are NOT used because engines disagree in the last
  ulps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def spike_detection(
    events: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    window_hours: int = 24,
    z_thresh: float = 3.0,
    min_history: int = 6,
) -> DataFrame:
    """(event_type, bucket, n, z_score, is_spike) per hour bucket with
    at least ``min_history`` trailing buckets of history and non-zero
    variance.  ``is_spike`` derives from the ROUNDED z-score so the
    boolean is reproducible across engines."""
    if min_history < 2:
        # variance needs >= 2 history rows; below that the (cnt-1)
        # divisor is 0 for every scored bucket
        raise ValueError(f"min_history must be >= 2, got {min_history}")
    hourly = (
        events.groupBy(
            F.col(type_col).alias("event_type"),
            F.date_trunc("hour", F.col(ts_col).cast("timestamp")).alias(
                "bucket"
            ),
        )
        .agg(F.count("*").alias("n"))
        .withColumn("epoch", F.col("bucket").cast("long"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("epoch")
        .rangeBetween(-window_hours * 3600, -1)
    )
    sum_n = F.sum("n").over(w)
    sum_sq = F.sum(F.col("n") * F.col("n")).over(w)
    cnt = F.count("n").over(w)
    mean = sum_n.cast("double") / cnt
    # divisors guarded explicitly: Spark 4's default ANSI mode makes
    # x/0 a runtime error, and the cnt>=min_history / var>0 row filter
    # below is NOT a guard — Catalyst may evaluate the projection
    # before (or regardless of) where it plants the filter.  when()
    # only evaluates the matched branch, so cnt<2 rows get NULL var
    # and var<=0 rows get NULL z instead of DIVIDE_BY_ZERO.
    var = F.when(
        cnt >= 2,
        (sum_sq.cast("double") - sum_n.cast("double") * sum_n / cnt)
        / (cnt - 1),
    )
    z = F.when(var > 0, F.round((F.col("n") - mean) / F.sqrt(var), 6))
    # the filter references the windowed cnt/var via this projection;
    # computing them once here also keeps the two frames identical
    scored = hourly.select(
        "event_type",
        "bucket",
        "n",
        cnt.alias("_cnt"),
        var.alias("_var"),
        z.alias("z_score"),
    )
    return scored.filter(
        (F.col("_cnt") >= min_history) & (F.col("_var") > 0)
    ).select(
        "event_type",
        "bucket",
        "n",
        "z_score",
        (F.col("z_score") > z_thresh).alias("is_spike"),
    )
