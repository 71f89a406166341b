"""Skew handling for hot conv_ids (SURVEY.md §4).

At 10^12 turns a handful of conversations can dominate (the north rule
calls out conv_id skew explicitly; the test generator plants ≥20%
heavy hitters).  Three tools:

- ``heavy_hitters`` — cheap approximate sketch of the hottest keys
  (drives the decision to salt, and the salt factor).
- ``salted_repartition`` — spread ONLY the hot keys over k sub-
  partitions (cold keys keep plain hashing, so no extra merge cost
  where none is needed).
- AQE knobs (``session.get_spark``) — skew-JOIN splitting is built in;
  skewed AGGREGATES are not covered by AQE, which is why
  ``agg.conv_hour_agg(salted=True)`` exists (two-phase, exact for
  associative aggregates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def heavy_hitters(
    df: DataFrame, key: str = "conv_id", top: int = 20, min_share: float = 0.01
) -> list[tuple[str, int]]:
    """Top keys holding at least ``min_share`` of rows.

    One map-side-combined count — at 10^12 rows this aggregates to
    |distinct keys| partials, which is exactly the cardinality any
    keyed shuffle would create anyway; run it on a sample
    (``df.sample(0.01)``) when even that is too much.
    """
    total = df.count()
    rows = (
        df.groupBy(key)
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"))
        .limit(top)
        .collect()
    )
    return [(r[key], r["n"]) for r in rows if r["n"] >= total * min_share]


def salted_repartition(
    df: DataFrame,
    hot_keys: list[str],
    key: str = "conv_id",
    n_salt: int = 16,
    num_partitions: int | None = None,
) -> DataFrame:
    """Hash-repartition by (key, salt) where salt is nonzero only for
    the listed hot keys — downstream per-key work (e.g. per-conv
    feature extraction via applyInPandas) sees the hot key split into
    ``n_salt`` slices while cold keys stay whole.

    The salt derives from turn_idx (deterministic, uniform within a
    conversation) — never ``rand()`` (SURVEY.md §7).
    """
    salt = F.when(
        F.col(key).isin(*hot_keys), F.col("turn_idx") % n_salt
    ).otherwise(F.lit(0))
    df = df.withColumn("_salt", salt)
    parts = [F.col(key), F.col("_salt")]
    return (
        df.repartition(num_partitions, *parts)
        if num_partitions
        else df.repartition(*parts)
    )


def partition_row_counts(df: DataFrame) -> DataFrame:
    """rows per physical partition — the skew observability primitive
    used by tests and ops dashboards."""
    return (
        df.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(F.count("*").alias("n_rows"))
        .orderBy("partition_id")
    )
