"""Per-partition metrics records (SURVEY.md §2.11, A6).

The reference tracks Processed/Failed/Dropped counters and a broken
"moving average" latency per pipeline
(/root/reference/pkg/pipeline/pipeline.go:154-181 — ``(old+new)/2``).
The Spark rebuild records true per-partition metrics instead: one
record per (Spark partition, sink) with row counts, parse health,
payload bytes and wall time — emitted by a ``mapInPandas`` stage (the
UDTF-shaped plugin surface), consuming Arrow batches and yielding a
tiny summary frame per partition.  Wall-clock appears ONLY here:
metrics are operational metadata, never data-plane (SURVEY.md §7).

Dropped is structurally zero in batch Spark (no backpressure drops,
R2) — the column exists to make that invariant explicit and testable.
"""

from __future__ import annotations

import time
from typing import Iterator

import pandas as pd
from pyspark import TaskContext
from pyspark.sql import DataFrame
from pyspark.sql import types as T

METRICS_SCHEMA = T.StructType(
    [
        T.StructField("partition_id", T.IntegerType()),
        T.StructField("sink", T.StringType()),
        T.StructField("n_rows", T.LongType()),
        T.StructField("n_parse_failed", T.LongType()),
        T.StructField("n_dropped", T.LongType()),
        T.StructField("text_bytes", T.LongType()),
        T.StructField("min_ts", T.TimestampType()),
        T.StructField("max_ts", T.TimestampType()),
        T.StructField("wall_ms", T.DoubleType()),
    ]
)


def partition_metrics(
    df: DataFrame,
    sink_col: str | None = "sink",
    extra_group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """One metrics row per (partition, sink[, *extra_group_cols]) — or
    per partition when ``sink_col`` is None/absent.

    ``extra_group_cols`` (e.g. ``("hour_key",)``) lets ONE pass serve
    both observability granularities: the pipeline derives its
    per-(sink, hour) lineage stats from these records instead of
    re-scanning the written files a second time.

    The text column itself never crosses into Python: its length is
    projected JVM-side first, so the Arrow stream carries one int64
    per row instead of the payload (measured: the full-text variant
    was a second whole-corpus pass over the memory bus — the exact
    pattern the scaling A/B showed caps 4N efficiency)."""
    has_sink = sink_col is not None and sink_col in df.columns
    cols = ["ts"] + (["parse_ok"] if "parse_ok" in df.columns else [])
    if has_sink:
        cols.append(sink_col)
    cols += list(extra_group_cols)
    from pyspark.sql import functions as F

    df = df.select(*cols, F.length("text").alias("_text_len"))

    group_cols = ([sink_col] if has_sink else []) + list(extra_group_cols)

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        t0 = time.perf_counter()
        pid = TaskContext.get().partitionId()
        acc: dict[tuple, dict] = {}
        for pdf in batches:
            if group_cols:
                groups = pdf.groupby(group_cols)
            else:
                groups = [((), pdf)]
            for key, g in groups:
                key = key if isinstance(key, tuple) else (key,)
                a = acc.setdefault(
                    key,
                    {"n": 0, "failed": 0, "bytes": 0, "min": None, "max": None},
                )
                a["n"] += len(g)
                if "parse_ok" in g:
                    a["failed"] += int((~g["parse_ok"].astype(bool)).sum())
                a["bytes"] += int(g["_text_len"].fillna(0).sum())
                lo, hi = g["ts"].min(), g["ts"].max()
                a["min"] = lo if a["min"] is None else min(a["min"], lo)
                a["max"] = hi if a["max"] is None else max(a["max"], hi)
        wall = (time.perf_counter() - t0) * 1000
        if not acc:
            return
        keys = list(acc)
        out = {
            "partition_id": [pid] * len(acc),
            "sink": [k[0] if has_sink else "" for k in keys],
        }
        for i, c in enumerate(extra_group_cols):
            out[c] = [k[(1 if has_sink else 0) + i] for k in keys]
        out.update(
            {
                "n_rows": [a["n"] for a in acc.values()],
                "n_parse_failed": [a["failed"] for a in acc.values()],
                "n_dropped": [0] * len(acc),  # batch Spark never drops (R2)
                "text_bytes": [a["bytes"] for a in acc.values()],
                "min_ts": [a["min"] for a in acc.values()],
                "max_ts": [a["max"] for a in acc.values()],
                "wall_ms": [wall] * len(acc),
            }
        )
        yield pd.DataFrame(out)

    schema = T.StructType(
        METRICS_SCHEMA.fields[:2]
        + [T.StructField(c, T.StringType()) for c in extra_group_cols]
        + METRICS_SCHEMA.fields[2:]
    )
    return df.mapInPandas(emit, schema)
