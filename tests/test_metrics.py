"""Per-partition metrics emitter (SURVEY.md A6 / §2.11)."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from log_aggregation_pipeline_spark.operators.route import ROUTES
from log_aggregation_pipeline_spark.plans.metrics import partition_metrics
from log_aggregation_pipeline_spark.plans.pipeline import parsed_view, run_pipeline


def test_partition_metrics_totals(spark, transcripts):
    parsed = parsed_view(spark, transcripts).repartition(4)
    m = partition_metrics(parsed, sink_col=None).toPandas()
    assert m["partition_id"].nunique() == 4
    assert m["n_rows"].sum() == transcripts.count()
    failed = parsed.filter(~F.col("parse_ok")).count()
    assert m["n_parse_failed"].sum() == failed
    assert (m["n_dropped"] == 0).all()  # batch never drops (R2)
    assert (m["wall_ms"] >= 0).all()
    assert m["min_ts"].min() == parsed.agg(F.min("ts")).first()[0]


def test_pipeline_emits_metrics(spark, transcripts, tmp_path):
    out = str(tmp_path / "o")
    res = run_pipeline(spark, transcripts, out)
    files = glob.glob(f"{out}/metrics/run=*/*.parquet")
    assert files
    m = spark.read.parquet(f"{out}/metrics/run={res.run_id}").toPandas()
    per_sink = m.groupby("sink")["n_rows"].sum().to_dict()
    assert per_sink == res.sink_counts  # metrics agree with lineage
    assert set(per_sink) == set(ROUTES)
