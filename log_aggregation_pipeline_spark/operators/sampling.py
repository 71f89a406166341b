"""Sampling operators for training-data curation (F7's grown-up form;
the reference only *declares* a sampling filter,
/root/reference/log-aggregation-pipeline-blueprint.md:269-274).

Three tools, all seeded and deterministic (SURVEY.md §7 — never
unseeded randomness, so reruns and the DuckDB oracle agree):

- ``hash_sample``       — Bernoulli-by-content-hash: keep rows whose
  seeded md5 rank-key falls below the fraction.  NO shuffle (pure
  filter, pushes into the scan stage); fraction is approximate
  (binomial), the 100 TB default.
- ``stratified_sample_exact`` — EXACT per-stratum fraction via
  rank-by-hash window: ceil(fraction x n) rows per stratum, smallest
  hash first.  One shuffle on the strata key.  Use when class balance
  must be exact (eval splits, per-language quotas).
- ``reservoir_sample``  — exact k rows (global or per stratum) as
  bottom-k by seeded hash: the distributed equivalent of reservoir
  sampling (per-partition heap + merge — TakeOrderedAndProject — for
  the global form; a rank window for the per-stratum form).

Rank-key = md5(id-cols:seed): content-derived, so uniform, skew-free,
and reproducible across engines (md5 is identical in DuckDB, which is
what makes every operator here oracle-checkable)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sample_key(id_cols: list[str], seed: int = 17) -> Column:
    """Deterministic uniform rank key: md5 over the row identity and
    the seed.  Changing the seed draws an independent sample."""
    return F.md5(F.concat_ws(":", *id_cols, F.lit(str(seed))))


def hash_sample(
    df: DataFrame, fraction: float, id_cols: list[str], seed: int = 17
) -> DataFrame:
    """Approximate-fraction Bernoulli sample, zero shuffle: the md5
    hex key is uniform on [0, 16^32), so comparing its 8-hex-digit
    prefix against fraction*16^8 keeps ~fraction of rows."""
    threshold = int(fraction * (16**8))
    key = F.conv(F.substring(sample_key(id_cols, seed), 1, 8), 16, 10).cast("long")
    return df.filter(key < threshold)


def stratified_sample_exact(
    df: DataFrame,
    strata_cols: list[str],
    fraction: float,
    id_cols: list[str],
    seed: int = 17,
) -> DataFrame:
    """Exactly ceil(fraction x n) rows per stratum (the smallest-hash
    rows, so the choice is uniform and seeded).  One shuffle: both
    windows share the strata partitioning.  Scale note: each stratum
    is sorted — for strata too large to sort, use ``hash_sample``
    per stratum instead (approximate but shuffle-free)."""
    key = sample_key(id_cols, seed)
    order = [key.asc()] + [F.col(c) for c in id_cols]  # total order
    w_rank = Window.partitionBy(*strata_cols).orderBy(*order)
    w_all = Window.partitionBy(*strata_cols)
    return (
        df.withColumn("_rk", F.row_number().over(w_rank))
        .withColumn("_n", F.count("*").over(w_all))
        .filter(F.col("_rk") <= F.ceil(F.col("_n") * F.lit(fraction)))
        .drop("_rk", "_n")
    )


def reservoir_sample(
    df: DataFrame, k: int, id_cols: list[str], seed: int = 17
) -> DataFrame:
    """Exact k uniformly-without-replacement rows: bottom-k by seeded
    hash ≡ a reservoir sample.  Plans as TakeOrderedAndProject —
    per-partition top-k heaps merged on the driver, no full sort, no
    shuffle of the losers."""
    key = sample_key(id_cols, seed)
    return (
        df.withColumn("_rk", key)
        .orderBy(F.col("_rk").asc(), *id_cols)
        .limit(k)
        .drop("_rk")
    )


def stratified_reservoir(
    df: DataFrame,
    strata_cols: list[str],
    k: int,
    id_cols: list[str],
    seed: int = 17,
) -> DataFrame:
    """Exact k rows per stratum (bottom-k by hash within stratum)."""
    key = sample_key(id_cols, seed)
    w = Window.partitionBy(*strata_cols).orderBy(
        key.asc(), *[F.col(c) for c in id_cols]
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )
