"""Stable turn ordering (SURVEY.md §2.6 W2).

The north-rule per-row invariant: per-turn text equality under stable
turn ordering — ``Window.partitionBy(conv_id).orderBy(turn_idx)``.
``turn_rank`` is a dense per-conversation sequence independent of the
stored turn_idx values; ``prev_text``/gap columns support turn-delta
features.  All window state stays within one conversation's partition
slice — no cross-conv shuffle beyond the hash on conv_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

def turn_window():
    """Built lazily: WindowSpec construction needs an active session."""
    return Window.partitionBy("conv_id").orderBy("turn_idx")


def with_turn_order(df: DataFrame, prev_text: bool = False) -> DataFrame:
    w = turn_window()
    out = df.withColumn("turn_rank", F.row_number().over(w))
    if prev_text:
        # ts may be TIMESTAMP_NTZ (parquet); go via instant with the
        # session TZ pinned to UTC, so the gap is deterministic.
        secs = F.col("ts").cast("timestamp").cast("double")
        out = out.withColumn("prev_text", F.lag("text").over(w)).withColumn(
            "ts_gap_s", secs - F.lag(secs).over(w)
        )
    return out


def ordered_turn_triples(df: DataFrame) -> DataFrame:
    """(conv_id, turn_idx, text) in stable order — the equality
    fixture surface (FIXTURES.md §3)."""
    return df.select("conv_id", "turn_idx", "text").orderBy("conv_id", "turn_idx")
