"""Per-conversation feature extraction — the grouped-map
(``applyInPandas``) surface of SURVEY.md §2.11, wired for conv_id skew.

``conv_features`` is the plain grouped-map: one pandas frame per
conversation.  At 10^12 turns a single hot conversation can exceed an
executor's memory (the whole group materializes in one Arrow batch),
so ``conv_features_salted`` is the scale form: conversations are split
into CONTIGUOUS turn-index blocks (block = turn_idx // block_size —
contiguity is what keeps gap statistics exact across the split),
partials are computed per (conv_id, block) grouped-map, and a second
associative aggregate merges blocks, reconstructing the block-boundary
gaps from each block's first/last timestamp.  Both forms return
identical values (pinned by tests on a ≥20%-heavy-hitter corpus).

Determinism design: gap statistics are summed in INTEGER microseconds
(order-independent, exact in int64), and every fractional output is a
single IEEE double division of integers evaluated in the same formula
order on all sides — so pandas, the JVM merge path, and the DuckDB
oracle produce bit-identical doubles with no summation-order drift."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("n_turns", T.LongType()),
        T.StructField("n_roles", T.IntegerType()),
        T.StructField("n_error_turns", T.LongType()),
        T.StructField("total_chars", T.LongType()),
        T.StructField("mean_gap_s", T.DoubleType()),
        T.StructField("max_gap_s", T.DoubleType()),
        T.StructField("frac_error", T.DoubleType()),
        T.StructField("first_ts", T.TimestampType()),
        T.StructField("last_ts", T.TimestampType()),
    ]
)

_PARTIAL_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("_blk", T.IntegerType()),
        T.StructField("n_turns", T.LongType()),
        T.StructField("roles", T.ArrayType(T.StringType())),
        T.StructField("n_error_turns", T.LongType()),
        T.StructField("total_chars", T.LongType()),
        T.StructField("sum_gap_us", T.LongType()),
        T.StructField("max_gap_us", T.LongType()),
        # value extremes (what first_ts/last_ts mean in the output) and
        # turn-order anchors (what boundary-gap reconstruction needs)
        # are DIFFERENT when ts is not monotone in turn_idx — emit both.
        T.StructField("min_ts", T.TimestampType()),
        T.StructField("max_ts", T.TimestampType()),
        T.StructField("anchor_first_ts", T.TimestampType()),
        T.StructField("anchor_last_ts", T.TimestampType()),
    ]
)

def _prep(df: DataFrame) -> DataFrame:
    # parquet ts loads as TIMESTAMP_NTZ in Spark 4 — cast before
    # unix_micros/arithmetic (session TZ is pinned UTC, lossless)
    return df.select(
        "conv_id", "turn_idx", "role", "text",
        F.col("ts").cast("timestamp").alias("ts"),
    )


def _gap_us(pdf: pd.DataFrame) -> pd.Series:
    """Successive turn-order ts gaps in integer microseconds."""
    diffs = pdf["ts"].diff().iloc[1:]
    return (diffs / pd.Timedelta(microseconds=1)).astype("int64")


def conv_features(df: DataFrame) -> DataFrame:
    """One row of features per conversation (grouped-map).  Input
    needs (conv_id, turn_idx, role, text, ts); gaps are successive
    turn-order deltas, first/last_ts are min/max."""

    def feats(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("turn_idx", kind="mergesort")
        n = len(pdf)
        gaps = _gap_us(pdf)
        n_err = int(pdf["text"].str.lower().str.contains("error").sum())
        return pd.DataFrame(
            [
                {
                    "conv_id": pdf["conv_id"].iloc[0],
                    "n_turns": n,
                    "n_roles": pdf["role"].nunique(),
                    "n_error_turns": n_err,
                    "total_chars": int(pdf["text"].str.len().sum()),
                    "mean_gap_s": (int(gaps.sum()) / (n - 1)) / 1e6
                    if n > 1
                    else None,
                    "max_gap_s": int(gaps.max()) / 1e6 if n > 1 else None,
                    "frac_error": n_err / n,
                    "first_ts": pdf["ts"].min(),
                    "last_ts": pdf["ts"].max(),
                }
            ]
        )

    return _prep(df).groupBy("conv_id").applyInPandas(feats, FEATURES_SCHEMA)


def conv_features_salted(df: DataFrame, block_size: int = 4096) -> DataFrame:
    """Same features, skew-safe: per-(conv, block) partials bounded at
    ``block_size`` turns, merged associatively.  Boundary gaps between
    consecutive blocks are reconstructed from first/last turn
    timestamps (blocks are contiguous turn ranges, so this is exact).
    The block column is a pure projection and cold conversations land
    in one block, so no hot-key list is needed — skew is bounded by
    construction."""

    def partial(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("turn_idx", kind="mergesort")
        gaps = _gap_us(pdf)
        return pd.DataFrame(
            [
                {
                    "conv_id": pdf["conv_id"].iloc[0],
                    "_blk": int(pdf["_blk"].iloc[0]),
                    "n_turns": len(pdf),
                    "roles": sorted(pdf["role"].unique()),
                    "n_error_turns": int(
                        pdf["text"].str.lower().str.contains("error").sum()
                    ),
                    "total_chars": int(pdf["text"].str.len().sum()),
                    "sum_gap_us": int(gaps.sum()) if len(gaps) else 0,
                    "max_gap_us": int(gaps.max()) if len(gaps) else None,
                    # value extremes (merge to first_ts/last_ts outputs)
                    "min_ts": pdf["ts"].min(),
                    "max_ts": pdf["ts"].max(),
                    # first/last BY TURN ORDER (boundary-gap anchors —
                    # NOT the same as min/max when ts is non-monotonic)
                    "anchor_first_ts": pdf["ts"].iloc[0],
                    "anchor_last_ts": pdf["ts"].iloc[-1],
                }
            ]
        )

    blocked = _prep(df).withColumn(
        "_blk", (F.col("turn_idx") / block_size).cast("int")
    )
    partials = blocked.groupBy("conv_id", "_blk").applyInPandas(
        partial, _PARTIAL_SCHEMA
    )
    w = Window.partitionBy("conv_id").orderBy("_blk")
    with_boundary = partials.withColumn(
        "_bgap_us",
        F.unix_micros("anchor_first_ts")
        - F.lag(F.unix_micros("anchor_last_ts")).over(w),
    )
    merged = with_boundary.groupBy("conv_id").agg(
        F.sum("n_turns").alias("n_turns"),
        F.size(F.array_distinct(F.flatten(F.collect_list("roles"))))
        .cast("int")
        .alias("n_roles"),
        F.sum("n_error_turns").alias("n_error_turns"),
        F.sum("total_chars").alias("total_chars"),
        (F.sum("sum_gap_us") + F.coalesce(F.sum("_bgap_us"), F.lit(0))).alias(
            "_sum_gap_us"
        ),
        F.greatest(F.max("max_gap_us"), F.max("_bgap_us")).alias("_max_gap_us"),
        F.min("min_ts").alias("first_ts"),
        F.max("max_ts").alias("last_ts"),
    )
    gt1 = F.col("n_turns") > 1
    return merged.select(
        "conv_id",
        "n_turns",
        "n_roles",
        "n_error_turns",
        "total_chars",
        F.when(gt1, (F.col("_sum_gap_us") / (F.col("n_turns") - 1)) / F.lit(1e6))
        .alias("mean_gap_s"),
        F.when(gt1, F.col("_max_gap_us") / F.lit(1e6)).alias("max_gap_s"),
        (F.col("n_error_turns") / F.col("n_turns")).alias("frac_error"),
        "first_ts",
        "last_ts",
    )
