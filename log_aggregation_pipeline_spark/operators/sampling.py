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


def mix_targets(weights: dict[str, float], token_budget: int) -> dict[str, int]:
    """Per-source token targets: floor(budget * w / sum(w)), computed
    ONCE driver-side and embedded as integer literals in both the
    Spark plan and the DuckDB oracle — the float division never runs
    inside either engine, so 1-ulp drift cannot split the twins."""
    if token_budget < 0:
        raise ValueError(f"token_budget must be >= 0, got {token_budget}")
    total = sum(weights.values())
    if not weights or total <= 0:
        raise ValueError("weights must be a non-empty map with positive sum")
    return {s: int(token_budget * w / total) for s, w in weights.items()}


def corpus_mix(
    df: DataFrame,
    weights: dict[str, float],
    token_budget: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 17,
) -> DataFrame:
    """Corpus mixing/weighting — the curation step after
    ``dataset_card``: draw documents per source until each source's
    share of the token budget is filled (e.g. 3x web, 1x code, 0.5x
    forums), deterministically.

    Docs inside each source are ordered by the seeded md5 rank key
    (``sample_key`` — uniform, content-derived, reproducible across
    engines) and taken while the running token total stays within the
    source's target; sources absent from ``weights`` get target 0 and
    drop out.  The greedy prefix draw means the budget is filled to
    within one document per source — exact-fill packing is
    ``packing.pack_sequences``' job, not the mixer's.

    Output: the selected rows as (id, source, n_tokens, cum_tokens).

    Scale shape: ONE shuffle keyed on the source (the cumsum window);
    each source's stratum is sorted, the same caveat as
    ``stratified_sample_exact`` — for a source too large to sort,
    pre-filter with ``hash_sample`` at ~target/total_tokens fraction
    and mix the survivors."""
    from log_aggregation_pipeline_spark.operators.text_analysis import (
        whitespace_token_count,
    )

    targets = mix_targets(weights, token_budget)
    tgt: Column = F.lit(0).cast("long")
    for s, t in targets.items():  # literal CASE chain, mirrored in SQL
        tgt = F.when(F.col(source_col) == s, F.lit(t).cast("long")).otherwise(tgt)
    key = sample_key([id_col], seed)
    w = (
        Window.partitionBy(source_col)
        .orderBy(key.asc(), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("n_tokens", whitespace_token_count(text_col))
        .withColumn("_cum", F.sum("n_tokens").over(w).cast("long"))
        # n_tokens > 0: a zero-token doc satisfies cum <= 0 in a
        # target-0 source, leaking empty docs from sources the weights
        # exclude (ADVICE r5) — mirrored in oracle.corpus_mix_sql
        .filter((F.col("_cum") <= tgt) & (F.col("n_tokens") > 0))
        .select(id_col, source_col, "n_tokens", F.col("_cum").alias("cum_tokens"))
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
