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


def training_pairs(
    df: DataFrame,
    prompt_role: str = "user",
    response_role: str = "assistant",
) -> DataFrame:
    """SFT pair extraction — the step that turns a transcript table
    into (prompt, response) training rows: every ``response_role``
    turn whose IMMEDIATELY preceding turn (by turn_idx, the stable
    order) is a ``prompt_role`` turn yields one pair.  Interrupted
    exchanges (tool call between user and assistant, consecutive
    assistant turns) produce no pair — adjacency is the contract, not
    "most recent user turn" (an asof-style variant can relax it).

    One shuffle on conv_id (the turn window); pure lag projections
    after it — at corpus scale this is the same plan class as
    with_turn_order."""
    w = turn_window()
    return (
        df.withColumn("_prev_role", F.lag("role").over(w))
        .withColumn("_prev_text", F.lag("text").over(w))
        .withColumn("_prev_idx", F.lag("turn_idx").over(w))
        .filter(
            (F.col("role") == response_role)
            & (F.col("_prev_role") == prompt_role)
        )
        .select(
            "conv_id",
            F.col("_prev_idx").alias("prompt_turn_idx"),
            F.col("turn_idx").alias("response_turn_idx"),
            F.col("_prev_text").alias("prompt"),
            F.col("text").alias("response"),
        )
    )


def ordered_turn_triples(df: DataFrame) -> DataFrame:
    """(conv_id, turn_idx, text) in stable order — the equality
    fixture surface (FIXTURES.md §3)."""
    return df.select("conv_id", "turn_idx", "text").orderBy("conv_id", "turn_idx")


def sessionize(df: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessions within a conversation: a new session starts
    when the pause since the previous turn exceeds ``gap_minutes``.
    Classic lag + conditional cumsum over the turn window — one
    shuffle on conv_id, state never crosses a conversation.
    ``session_id`` is 0-based per conversation."""
    w = turn_window()
    secs = F.col("ts").cast("timestamp").cast("double")
    gap = secs - F.lag(secs).over(w)
    new_session = F.when(
        gap.isNull() | (gap <= gap_minutes * 60), F.lit(0)
    ).otherwise(F.lit(1))
    return df.withColumn(
        "session_id",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("int"),
    )


def top_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    k: int,
    tiebreakers: list[str] | None = None,
) -> DataFrame:
    """Top-k rows per group by descending order_col — the standard
    ranking-window + filter plan (per-partition heap after AQE; no
    global sort)."""
    keys = [F.desc(order_col)] + [F.asc(c) for c in (tiebreakers or [])]
    w = Window.partitionBy(*group_cols).orderBy(*keys)
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
