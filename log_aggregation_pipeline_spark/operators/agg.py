"""Aggregations (SURVEY.md §2.5).

Query-engine parity (A1-A3 from
/root/reference/internal/server/query/query.go):

- A1 count            -> ``count_all``
- A2 terms            -> ``terms_agg``   (query.go:130-166)
- A3 date_histogram   -> ``date_histogram`` (query.go:169-200)
- A4 conv-hour        -> ``conv_hour_agg`` (+ salted two-phase variant)
- A5 declared extras  -> ``stats_agg`` (sum/avg/min/max/percentile/
                         cardinality, blueprint.md:368-378)

Deliberate deviation (SURVEY.md §2.5 caveat): the reference aggregates
the post-limit page (query.go:107 -> store.go:209-213), so its counts
are over at most ``limit`` arbitrary rows.  We aggregate the full
filtered set — SQL-correct and oracle-checkable.  The quirk is
reproduced only in ``limited_terms_agg_compat`` for documentation.

Scale notes: every aggregate here is a hash aggregate with map-side
partial combine (free from Catalyst).  The conv-hour aggregate keys on
(conv_id, hour) — conv_id is the skew axis at 10^12 turns, so
``conv_hour_agg(salted=True)`` splits hot keys across ``n_salt``
partial groups and merges; count/min/max are associative so the
two-phase result is exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def count_all(df: DataFrame) -> DataFrame:
    return df.agg(F.count("*").alias("n"))


def terms_agg(df: DataFrame, field: str, limit: int | None = None) -> DataFrame:
    """Group by a field's value -> {key, count} buckets, biggest first.

    Mirrors query.go:130-166 including the skip of NULL/empty values
    (query.go:158: ``if value != ""``).  Ties broken by key for
    determinism (the reference emits map-ordered buckets — unordered)."""
    out = (
        df.filter(F.col(field).isNotNull() & (F.col(field) != ""))
        .groupBy(F.col(field).alias("key"))
        .agg(F.count("*").alias("count"))
        .orderBy(F.desc("count"), F.asc("key"))
    )
    return out.limit(limit) if limit else out


def date_histogram(
    df: DataFrame, ts_col: str = "ts", interval: str = "hour"
) -> DataFrame:
    """Bucket by truncated timestamp -> {bucket, count}.

    interval ∈ {minute, hour, day} (query.go:174-183; default hour)."""
    if interval not in ("minute", "hour", "day"):
        interval = "hour"
    return (
        df.groupBy(F.date_trunc(interval, F.col(ts_col)).alias("bucket"))
        .agg(F.count("*").alias("count"))
        .orderBy("bucket")
    )


def stats_agg(df: DataFrame, group_cols: list[str], value_col: str) -> DataFrame:
    """The blueprint's declared aggregation set (A5)."""
    return df.groupBy(*group_cols).agg(
        F.count("*").alias("n"),
        F.sum(value_col).alias("sum_v"),
        F.avg(value_col).alias("avg_v"),
        F.min(value_col).alias("min_v"),
        F.max(value_col).alias("max_v"),
        F.percentile_approx(value_col, 0.95).alias("p95_v"),
        F.approx_count_distinct(value_col).alias("approx_distinct_v"),
    )


def value_histogram(
    df: DataFrame, value_col: str, interval: float
) -> DataFrame:
    """Numeric histogram (the ES-style histogram agg — A3's complement
    for a VALUE axis instead of time): bucket = floor(v / interval) *
    interval, one count shuffle with map-side partials.  The bucket
    is computed floor-on-double then scaled, exactly as DuckDB's twin
    does, so edge values land identically in both engines."""
    if interval <= 0:
        raise ValueError(f"interval must be > 0, got {interval}")
    bucket = F.floor(F.col(value_col) / interval) * F.lit(interval)
    return (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(F.round(bucket, 6).alias("bucket"))
        .agg(F.count("*").alias("count"))
        .orderBy("bucket")
    )


def percentiles_agg(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    percentiles: tuple[float, ...] = (0.5, 0.9, 0.95, 0.99),
) -> DataFrame:
    """Exact interpolated per-group percentiles (the quantile_cont
    definition shared by Spark ``percentile`` and DuckDB) — the
    latency-SLO report shape.  Exact percentile gathers each group's
    values: fine for bounded per-group cardinality (event types,
    sinks); switch to ``stats_agg``'s approx sketch for unbounded
    groups."""
    aggs = [
        F.round(F.percentile(value_col, F.lit(p)), 6).alias(
            f"p{int(round(p * 100))}_v"
        )
        for p in percentiles
    ]
    return df.groupBy(*group_cols).agg(
        F.count("*").alias("n"), *aggs
    )


def moving_avg(
    df: DataFrame,
    partition_cols: list[str],
    order_cols: list[str],
    value_col: str,
    n_rows: int = 5,
) -> DataFrame:
    """CORRECT trailing moving average over the last ``n_rows`` rows
    per partition — what the reference's latency metric pretends to be
    (pipeline.go:154-181 computes ``(old+new)/2``, an exponential
    decay that weights the newest sample 50% regardless of history).
    Window avg over rowsBetween(-(n-1), 0): each row's ``mavg`` is the
    plain mean of its trailing window, plus ``mavg_n`` (how many rows
    actually contributed — the first n-1 rows of a partition have
    shorter windows, disclosed instead of silently diluted).

    One shuffle on the partition key.  Cross-engine exactness: feed an
    INTEGER value column (counts, lengths, integer micros) — the mean
    is then a single exact-integer division rounded to 6dp on both
    engines; a float value column risks 1-ulp drift because moving
    windows may sum in different orders per engine (DuckDB can use
    segment trees, Spark accumulates in window order).
    ``order_cols`` must be a total order within the partition or the
    trailing window itself is nondeterministic."""
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(*order_cols)
        .rowsBetween(-(n_rows - 1), 0)
    )
    return df.withColumn(
        "mavg", F.round(F.sum(value_col).over(w) / F.count("*").over(w), 6)
    ).withColumn("mavg_n", F.count("*").over(w))
def conv_hour_agg(
    df: DataFrame,
    ts_col: str = "ts",
    salted: bool = False,
    n_salt: int = 16,
    extra_group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(conv_id, hour) -> count/min(ts)/max(ts).

    ``salted=True`` runs the two-phase variant: phase 1 groups on
    (conv_id, hour, salt) where salt spreads a hot conv_id's rows over
    ``n_salt`` reducers; phase 2 merges partials.  Exact because
    count=sum(counts), min=min(mins), max=max(maxs) are associative.
    Use when a conv_id exceeds ~1 partition of rows; for uniform data
    the plain hash aggregate's map-side combine is already optimal.
    """
    hour = F.date_trunc("hour", F.col(ts_col)).alias("hour")
    extra = [F.col(c) for c in extra_group_cols]
    if not salted:
        return df.groupBy(*extra, "conv_id", hour).agg(
            F.count("*").alias("n_turns"),
            F.min(ts_col).alias("min_ts"),
            F.max(ts_col).alias("max_ts"),
        )
    # Salt from turn_idx (uniform within a conversation), not random()
    # — determinism is a hard requirement (SURVEY.md §7).
    salt = (F.col("turn_idx") % n_salt).alias("_salt")
    partial = df.groupBy(*extra, "conv_id", hour, salt).agg(
        F.count("*").alias("_n"),
        F.min(ts_col).alias("_min"),
        F.max(ts_col).alias("_max"),
    )
    return partial.groupBy(*extra_group_cols, "conv_id", "hour").agg(
        F.sum("_n").alias("n_turns"),
        F.min("_min").alias("min_ts"),
        F.max("_max").alias("max_ts"),
    )


def pivot_counts(
    df: DataFrame, row_col: str, pivot_col: str, values: list[str]
) -> DataFrame:
    """Cross-tab counts: one row per ``row_col``, one column per
    pinned ``pivot_col`` value.  Values are pinned so the plan is a
    single pass (no distinct-values pre-query) and the output schema
    is stable for the oracle."""
    return df.groupBy(row_col).pivot(pivot_col, values).count().na.fill(0, values)


def rollup_counts(df: DataFrame, cols: list[str]) -> DataFrame:
    """Hierarchical subtotals (GROUP BY ROLLUP): counts at every
    prefix level.  ``gid`` (grouping_id) distinguishes NULL-as-data
    from NULL-as-subtotal — required because e.g. ``level`` is
    legitimately NULL for unparseable rows."""
    return df.rollup(*cols).agg(
        F.count("*").alias("n"), F.grouping_id().alias("gid")
    )


def cube_counts(df: DataFrame, cols: list[str]) -> DataFrame:
    """All-subsets subtotals (GROUP BY CUBE) — rollup's superset:
    2^len(cols) grouping sets in one pass (Expand + single hash
    aggregate, no re-scan per set).  ``gid`` disambiguates NULL-as-data
    from NULL-as-subtotal exactly as in ``rollup_counts``."""
    return df.cube(*cols).agg(
        F.count("*").alias("n"), F.grouping_id().alias("gid")
    )


def limited_terms_agg_compat(
    df: DataFrame, field: str, limit: int, ts_col: str = "ts"
) -> DataFrame:
    """Reference-quirk reproduction (documentation only): terms agg
    over the first ``limit`` rows, as query.go:107 + store.go:209-213
    actually compute.  The reference's "first" is partition-iteration
    order (nondeterministic); we pin ts order to make it testable."""
    page = df.orderBy(ts_col).limit(limit)
    return terms_agg(page, field)


def trending_terms(
    df: DataFrame,
    field: str,
    ts_col: str = "ts",
    interval: str = "day",
    top_k: int = 5,
) -> DataFrame:
    """Dashboard "trending" view: per time bucket, the top-k values of
    ``field`` with their rank and the rank delta vs the IMMEDIATELY
    previous bucket (negative delta = rising).  Ranks are computed
    over ALL values per bucket before the top-k cut, so a term
    entering the top-k still shows its true previous rank; a term
    absent from the immediately previous bucket (including one
    returning after a gap) has prev_rank NULL — a re-entrant is a new
    entrant, not "steady since last seen".

    Shape: one (bucket, value) count shuffle, a per-bucket rank window
    (bucket count bounds state), a per-value lag window — uniform
    keys, ties broken by value for determinism.
    """
    if interval not in ("minute", "hour", "day"):
        # the unit is interpolated into an INTERVAL literal below —
        # validate up front (matching date_histogram's whitelist)
        # instead of failing late with an opaque parse error
        raise ValueError(
            f"interval must be one of minute/hour/day, got {interval!r}"
        )
    daily = (
        df.filter(F.col(field).isNotNull() & (F.col(field) != ""))
        .groupBy(
            F.date_trunc(interval, F.col(ts_col).cast("timestamp")).alias(
                "bucket"
            ),
            F.col(field).alias("term"),
        )
        .agg(F.count("*").alias("n"))
    )
    w_rank = Window.partitionBy("bucket").orderBy(F.desc("n"), F.asc("term"))
    w_prev = Window.partitionBy("term").orderBy("bucket")
    # lag() skips buckets where the term emitted nothing — a term
    # returning after a gap must read as a NEW entrant (prev_rank
    # NULL), not as "steady since last week", so the lagged rank only
    # counts when the lagged bucket is the immediately previous one
    adjacent = F.lag("bucket").over(w_prev) == F.col("bucket") - F.expr(
        f"INTERVAL 1 {interval}"
    )
    ranked = daily.withColumn("rank", F.row_number().over(w_rank)).withColumn(
        "prev_rank", F.when(adjacent, F.lag("rank").over(w_prev))
    )
    return ranked.filter(F.col("rank") <= top_k).select(
        "bucket",
        "term",
        "n",
        "rank",
        "prev_rank",
        (F.col("rank") - F.col("prev_rank")).alias("rank_delta"),
    )
