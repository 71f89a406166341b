"""Token-budget sequence packing — sharding docs into training bins.

A training job consumes documents in fixed token-capacity bins
(context windows / per-worker budgets).  The scalable packing shape is
NOT a global greedy pass (that is a single sequential scan — a
one-partition window over a global order, the classic 100 TB
scale-killer); it is N independent shards, each packed by a
deterministic contiguous fill:

- shard  = md5-derived hash of doc_id mod n_shards — uniform,
  content-keyed, and engine-portable (the repo's sampling rank-key
  idiom; identical in DuckDB, so the oracle re-derives shards itself)
- within a shard, docs are ordered by doc_id and filled greedily into
  bins of ``capacity`` tokens via a running cumsum: a doc's bin is
  ``(cumsum_before) div capacity``; a doc whose span crosses a bin
  boundary is flagged ``straddles`` (the caller chooses: split it,
  pad past it, or let the bin overflow — the flag makes the policy
  explicit instead of a silent overflow).

One window per shard (partitionBy shard — parallel across shards,
bounded state per shard) plus a projection.  Deterministic: same
corpus -> same bins, independent of cluster layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from log_aggregation_pipeline_spark.operators.text_analysis import (
    whitespace_token_count,
)


def pack_sequences(
    df: DataFrame,
    capacity: int = 512,
    n_shards: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, shard, n_tokens, bin_id, bin_offset, straddles) packing
    assignment.  ``bin_offset`` is the doc's start position within its
    bin; ``straddles`` marks docs that cross the capacity boundary
    (docs longer than ``capacity`` always straddle)."""
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    shard_key = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
    ).cast("long")
    toks = df.select(
        F.col(id_col),
        F.pmod(shard_key, F.lit(n_shards)).cast("int").alias("shard"),
        whitespace_token_count(text_col).alias("n_tokens"),
    )
    before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return toks.select(
        id_col,
        "shard",
        "n_tokens",
        F.floor(before / capacity).cast("int").alias("bin_id"),
        (before % capacity).cast("int").alias("bin_offset"),
        (
            F.floor((before + F.col("n_tokens") - 1) / capacity)
            > F.floor(before / capacity)
        ).alias("straddles"),
    )
