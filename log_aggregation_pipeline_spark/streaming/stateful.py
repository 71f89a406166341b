"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference keeps per-pipeline running counters in mutable structs
(/root/reference/pkg/pipeline/pipeline.go:154-181); the streaming-
native equivalent is keyed state: one state cell per conv_id holding
(turns_so_far, errors_so_far, last_ts), updated per micro-batch and
emitted as an update stream.  This is the pattern slot for any
per-conversation accumulator (token budgets, rolling quality flags,
session carryover) — swap the update function, keep the plumbing.

State scales with |active conv_ids|, not rows; the HDFS-backed state
store partitions by the groupBy key, so the conv_id skew story is the
same as the batch aggregate's (hot key => one hot state partition —
mitigate by pre-splitting the key upstream if a single conversation
ever exceeds one partition's throughput).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "conv_id string, turns_total long, errors_total long, last_ts timestamp"
)
STATE_SCHEMA = "turns long, errors long, last_ts timestamp"


def _update_conv_state(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    turns, errors, last_ts = (
        state.get if state.exists else (0, 0, None)
    )
    for pdf in pdfs:
        turns += len(pdf)
        if "level" in pdf:
            errors += int(pdf["level"].isin(["ERROR", "FATAL"]).sum())
        hi = pdf["ts"].max()
        last_ts = hi if last_ts is None else max(last_ts, hi)
    state.update((turns, errors, last_ts))
    yield pd.DataFrame(
        {
            "conv_id": [key[0]],
            "turns_total": [turns],
            "errors_total": [errors],
            "last_ts": [last_ts],
        }
    )


def running_conv_totals(stream: DataFrame) -> DataFrame:
    """Streaming per-conversation running totals (update mode).

    Input: a (possibly parsed) transcript stream with conv_id/ts and
    optionally level.  Output: one updated row per conv_id per
    micro-batch that touched it."""
    cols = ["conv_id", "ts"] + (["level"] if "level" in stream.columns else [])
    return (
        stream.select(*cols)
        .groupBy("conv_id")
        .applyInPandasWithState(
            _update_conv_state,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
