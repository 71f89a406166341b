"""applyInPandasWithState: state carries across micro-batches and the
final totals equal the batch ground truth."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from log_aggregation_pipeline_spark.operators.parse import parse_transcripts
from log_aggregation_pipeline_spark.streaming.stateful import running_conv_totals
from log_aggregation_pipeline_spark.streaming.stream import read_transcript_stream


def test_running_totals_across_batches(spark, transcripts, tmp_path):
    in_dir = str(tmp_path / "in")
    # two files => two micro-batches with maxFilesPerTrigger=1
    transcripts.filter(F.col("turn_idx") % 2 == 0).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    transcripts.filter(F.col("turn_idx") % 2 == 1).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)

    stream = read_transcript_stream(spark, in_dir, max_files_per_trigger=1)
    q = (
        running_conv_totals(parse_transcripts(stream, impl="native"))
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("conv_totals")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # memory sink in update mode appends each update; the LAST update
    # per conv_id must equal the full-batch ground truth
    updates = spark.sql("select * from conv_totals").toPandas()
    assert len(updates) > 0
    last = (
        updates.groupby("conv_id", as_index=False).last()
        .set_index("conv_id")
    )
    truth = (
        parse_transcripts(transcripts, impl="native")
        .groupBy("conv_id")
        .agg(
            F.count("*").alias("turns_total"),
            F.sum(F.col("level").isin("ERROR", "FATAL").cast("long")).alias(
                "errors_total"
            ),
            F.max("ts").alias("last_ts"),
        )
        .toPandas()
        .set_index("conv_id")
    )
    assert last["turns_total"].to_dict() == truth["turns_total"].to_dict()
    assert last["errors_total"].to_dict() == truth["errors_total"].to_dict()
    # state really carried: at least one conv got two cumulative updates
    multi = updates.groupby("conv_id").size()
    assert (multi >= 2).any()
    increasing = updates.sort_index().groupby("conv_id")["turns_total"].apply(
        lambda s: s.is_monotonic_increasing
    )
    assert increasing.all()
