"""Streaming curation leg — the corpus-cleaning operators run as a
Structured Streaming pipeline.

A crawl/ingest pipeline curates documents AS THEY ARRIVE: file-stream
of raw docs -> ``strip_markup`` -> ``gopher_rules`` gate -> one
parquet sink partitioned by the pass flag (accepted and rejected docs
land in sibling ``gopher_pass=`` directories from a single write — no
second pass, no foreachBatch fan-out needed).  strip_markup's
whitespace collapse is newline-PRESERVING (_WS_NORM_STEPS), so the
line-based Gopher gates (bullet_frac, ellipsis_frac) still see real
line structure in ``clean_text`` rather than one collapsed line.  Both operators are
pure projections (pinned stream-safe in
tests/test_streaming.py::test_projection_operators_compose_with_streams),
so the streaming plan is the batch plan with a file source in front:
checkpointed, exactly-once per input file, no state store.

Scale posture: stateless micro-batches — throughput is the projection
throughput; the partitioned sink keeps accepted/rejected separable
for downstream training readers without a filter scan.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from log_aggregation_pipeline_spark.operators.text_analysis import (
    gopher_rules,
    strip_markup,
)

DOCS_SCHEMA = "doc_id long, source string, text string"


def run_incremental_dedup_stream(
    spark: SparkSession,
    in_dir: str,
    seen_hashes_dir: str,
    out_dir: str,
    checkpoint_dir: str | None = None,
    await_termination: bool = True,
) -> StreamingQuery:
    """Incremental dedup as a stream: new docs arriving in ``in_dir``
    are content-hashed and STREAM-STATIC left_anti joined against the
    seen-hash table (``dedupe.seen_content_hashes`` written to
    ``seen_hashes_dir``); only corpus-novel docs land in ``out_dir``,
    with ``content_hash`` attached — the rows to append to the seen
    table before the next increment.

    The static side's parquet FILE LISTING is snapshotted when this
    function builds the plan — a long-running stream would NOT see
    files appended to ``seen_hashes_dir`` afterwards (ADVICE r5).
    Each availableNow invocation rebuilds the plan, so the increment
    workflow is: run one invocation to drain pending files, append the
    emitted hashes to the seen table, invoke again for the next
    increment — every invocation re-reads the seen table fresh.  In-batch duplicate pairs are NOT collapsed here
    (that is ``dropDuplicatesWithinWatermark`` composed upstream, or
    the batch ``incremental_exact_new`` window); this leg is the
    corpus-novelty gate, stateless and checkpointed — exactly-once
    per input file, no state store."""
    from log_aggregation_pipeline_spark.operators.dedupe import content_hash

    cp = checkpoint_dir or os.path.join(out_dir, "_checkpoint")
    src = spark.readStream.schema(DOCS_SCHEMA).parquet(in_dir)
    seen = spark.read.parquet(seen_hashes_dir).select("content_hash")
    novel = src.withColumn("content_hash", content_hash("text")).join(
        seen, "content_hash", "left_anti"
    )
    q = (
        novel.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        q.awaitTermination()
    return q


def run_curation_stream(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint_dir: str | None = None,
    await_termination: bool = True,
) -> StreamingQuery:
    """Drain ``in_dir`` (parquet docs, DOCS_SCHEMA) through the
    curation chain into ``out_dir`` partitioned by ``gopher_pass``;
    ``availableNow`` processes the current backlog and stops, the
    checkpoint makes re-runs incremental (new files only)."""
    cp = checkpoint_dir or os.path.join(out_dir, "_checkpoint")
    src = spark.readStream.schema(DOCS_SCHEMA).parquet(in_dir)
    curated = gopher_rules(strip_markup(src), text_col="clean_text").select(
        "doc_id",
        "source",
        "clean_text",
        "n_tags",
        "n_tokens",
        "stop_hits",
        "gopher_pass",
    )
    q = (
        curated.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", cp)
        .partitionBy("gopher_pass")
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        q.awaitTermination()
    return q
