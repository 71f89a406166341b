"""Streaming pipeline (SURVEY.md §2.9).

The reference is a continuous system: tailer micro-batches (100
lines / 5 s, tailer.go:240-305), shipper batches (1000 / 5 s,
shipper.go:178-205), server pipeline workers.  Its streaming semantics
map onto Structured Streaming:

- micro-batching (R1)      -> trigger(processingTime=...) +
                              maxFilesPerTrigger
- checkpoint/resume (R3)   -> checkpointLocation (offset log), the
                              streaming twin of plans.lineage
- at-least-once + retry    -> task retries + idempotent foreachBatch
- backpressure drop (R2)   -> N/A: Spark never drops; the invariant is
                              recorded, not implemented
- date_histogram (A3)      -> tumbling window + watermark for late data

The batch pipeline's parse/enrich/route stages are reused verbatim in
``foreachBatch`` — one code path, two execution modes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.route import ROUTES
from ..plans.pipeline import parsed_view
from ..schema import TRANSCRIPT_SCHEMA


def read_transcript_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-source stream over a transcripts parquet directory.

    ``maxFilesPerTrigger`` is the rate limit — the analog of the
    receiver's token bucket (receiver.go:297-340, R6)."""
    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def start_routed_stream(
    spark: SparkSession,
    stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str | None = None,
    impl: str = "native",
) -> StreamingQuery:
    """parse -> enrich -> route each micro-batch; per-sink parquet.

    ``foreachBatch`` reuses the exact batch-stage functions, writing
    each sink with an epoch-scoped path so retried epochs overwrite
    rather than duplicate (exactly-once per sink dir).  Default
    ``impl='native'`` keeps the streaming hot path JVM-only.
    """
    checkpoint_dir = checkpoint_dir or os.path.join(out_dir, "_checkpoint")

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        parsed = parsed_view(spark, batch_df, impl=impl).persist()
        try:
            for name, route in ROUTES.items():
                (
                    parsed.filter(route.spark_pred())
                    .write.mode("overwrite")
                    .parquet(os.path.join(out_dir, "sinks", name, f"epoch={epoch_id}"))
                )
        finally:
            parsed.unpersist()

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def windowed_counts(
    stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming date_histogram (A3): tumbling-window counts per level
    of lateness up to ``watermark``.  The reference has no late-data
    story at all (rows land in whatever partition their ts says,
    store.go:148); the watermark makes the tradeoff explicit."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "role")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("bucket"), "role", "n")
    )


def sliding_term_counts(
    stream: DataFrame,
    term_col: str = "role",
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming trending-terms feed: SLIDING-window term counts —
    each event lands in window/slide overlapping windows, so the
    emitted table answers "what is rising right now" at ``slide``
    granularity without waiting a full window (the continuous twin of
    the batch ``agg.trending_terms`` bucket counts).

    Emits (window_start, window_end, term, count).  The top-k /
    prev-rank comparison runs on the EMITTED table, not in-stream: a
    rank over a streaming aggregate is not expressible in append mode,
    and the sink is tiny (windows x terms) while the stream side is
    the data-sized count — the state store holds one count per open
    (window, term), bounded by watermark eviction."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", window, slide).alias("w"),
            F.col(term_col).alias("term"),
        )
        .agg(F.count("*").alias("count"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "term",
            "count",
        )
    )


def session_counts(
    stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming sessionization — the continuous twin of the batch
    ``operators.order.sessionize`` gap rule, via Spark's native
    ``session_window``: a conversation's turns merge into one session
    while consecutive gaps stay under ``gap``; the window closes (and
    emits, in append mode) once the watermark passes its end.  Same
    30-minute-gap semantics, but with bounded state: the store holds
    only OPEN sessions per conv_id, and the watermark is the
    session-finalization horizon the batch form doesn't need."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "conv_id")
        .agg(F.count("*").alias("n_turns"))
        .select(
            "conv_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_turns",
        )
    )


def dedup_stream(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup — the continuous twin of
    ``operators.dedupe.exact_dedup_rows`` (F7): first occurrence of a
    normalized content hash wins, duplicates arriving later are
    dropped.  ``dropDuplicatesWithinWatermark`` keys the state store
    on the content hash and EVICTS entries older than the watermark —
    the property that makes streaming dedup viable at all: unbounded
    ``dropDuplicates`` state would grow with the corpus, while the
    watermark bounds it to the duplicate-arrival window (dupes in a
    log/transcript feed arrive close together; far-apart re-sends are
    the batch dedup's job downstream).  State is per-key in the HDFS/
    RocksDB state store, so it shards with the hash — no skew."""
    from ..operators.dedupe import content_hash

    return (
        stream.withColumn("_ch", content_hash(text_col))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["_ch"])
        .drop("_ch")
    )


def run_stream_to_completion(
    spark: SparkSession,
    in_path: str,
    out_dir: str,
    impl: str = "native",
) -> None:
    """Drain all available input (availableNow) and stop — the batch
    harness for streaming tests; restart-with-same-checkpoint resumes
    from the offset log exactly like the tailer's FileState."""
    q = start_routed_stream(
        spark, read_transcript_stream(spark, in_path), out_dir, impl=impl
    )
    q.awaitTermination()
