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


def adaptive_n_shards(
    total_tokens: int,
    target_tokens_per_shard: int = 50_000_000,
    min_shards: int = 16,
) -> int:
    """Shard-count policy: each shard is ONE sequential cumsum window,
    so per-shard token mass is the bounded-state knob.  Deriving
    ``ceil(total / target)`` keeps every shard's window at
    ~``target_tokens_per_shard`` no matter how large the corpus grows —
    a static shard count would turn each shard into a multi-TB
    single-partition scan at 100 TB (same policy class as
    dedupe.adaptive_n_blocks).  ``min_shards`` keeps small corpora
    parallel across local cores."""
    import math

    return max(min_shards, math.ceil(total_tokens / target_tokens_per_shard))


def _token_count(text_col: str, tokenizer: str):
    if tokenizer == "whitespace":
        return whitespace_token_count(text_col)
    if tokenizer == "bpeish":
        from log_aggregation_pipeline_spark.operators.text_analysis import (
            bpeish_token_count,
        )

        return bpeish_token_count(text_col)
    raise ValueError(f"unknown tokenizer {tokenizer!r}")


def pack_sequences(
    df: DataFrame,
    capacity: int = 512,
    n_shards: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    target_tokens_per_shard: int = 50_000_000,
    tokenizer: str = "whitespace",
) -> DataFrame:
    """(id, shard, n_tokens, bin_id, bin_offset, straddles) packing
    assignment.  ``bin_offset`` is the doc's start position within its
    bin; ``straddles`` marks docs that cross the capacity boundary
    (docs longer than ``capacity`` always straddle).

    ``n_shards=None`` (default) sizes itself from the corpus token
    count via ``adaptive_n_shards`` — one extra column-pruned pass over
    ``text_col`` (a cheap count-style job next to the window stage);
    pass an explicit ``n_shards`` to skip it when the caller already
    knows the scale (the driver contract pins it so the oracle's shard
    literal matches).

    ``tokenizer`` mirrors chunking's modes: bin budgets count either
    whitespace tokens (default, the oracle-checked form) or BPE-ish
    pre-tokenizer pieces — pack with the SAME tokenizer the training
    run bills context by, or bins systematically overflow on
    punctuation-dense text."""
    tok = _token_count(text_col, tokenizer)
    if n_shards is None:
        total = df.select(F.sum(tok)).first()[0]
        n_shards = adaptive_n_shards(
            int(total or 0), target_tokens_per_shard
        )
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
        tok.alias("n_tokens"),
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


def split_straddlers(
    packed: DataFrame, capacity: int = 512, id_col: str = "doc_id"
) -> DataFrame:
    """Expand packing assignments into per-bin SEGMENTS — the "split"
    policy for straddling docs: a doc spanning bins [b0..b1] yields one
    row per bin with doc-relative token offsets [tok_start, tok_end),
    so a loader can slice each doc's tokens straight into its bins.

    Pure projection + explode over ``sequence(first_bin, last_bin)``
    (bounded by ceil(n_tokens/capacity)+1 segments per doc — no
    shuffle on top of ``pack_sequences``).  Zero-token docs occupy no
    space and emit no segments."""
    abs_start = F.col("bin_id").cast("long") * capacity + F.col("bin_offset")
    abs_end = abs_start + F.col("n_tokens")  # exclusive
    last_bin = F.floor((abs_end - 1) / capacity).cast("int")
    seg = F.explode(F.sequence(F.col("bin_id"), last_bin)).alias("seg_bin")
    with_seg = packed.filter(F.col("n_tokens") > 0).select(
        "*", seg
    )
    seg_start = F.greatest(abs_start, F.col("seg_bin").cast("long") * capacity)
    seg_end = F.least(abs_end, (F.col("seg_bin").cast("long") + 1) * capacity)
    return with_seg.select(
        id_col,
        "shard",
        F.col("seg_bin").alias("bin_id"),
        (F.col("seg_bin") - F.col("bin_id")).cast("int").alias("seg_idx"),
        (seg_start - abs_start).cast("int").alias("tok_start"),
        (seg_end - abs_start).cast("int").alias("tok_end"),
    )
