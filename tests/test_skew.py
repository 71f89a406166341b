"""Skew handling: heavy-hitter detection + salted repartition actually
flattens the physical partition distribution."""

from __future__ import annotations

from pyspark.sql import functions as F

from log_aggregation_pipeline_spark.operators.agg import conv_hour_agg
from log_aggregation_pipeline_spark.operators.skew import (
    heavy_hitters,
    partition_row_counts,
    salted_repartition,
)


def test_heavy_hitters_found(transcripts):
    hh = heavy_hitters(transcripts, min_share=0.1)
    names = [k for k, _ in hh]
    assert "conv_00000" in names and "conv_00001" in names  # planted skew
    assert len(names) == 2


def test_salted_repartition_flattens(spark, transcripts):
    hot = [k for k, _ in heavy_hitters(transcripts, min_share=0.1)]
    n = transcripts.count()

    plain = partition_row_counts(transcripts.repartition(16, "conv_id")).toPandas()
    salted = partition_row_counts(
        salted_repartition(transcripts, hot, n_salt=16, num_partitions=16)
    ).toPandas()
    # the hot key pins plain partitions at >= its full size; salting
    # must cut the max partition substantially
    assert salted["n_rows"].max() < plain["n_rows"].max() * 0.6
    assert salted["n_rows"].sum() == n == plain["n_rows"].sum()


def test_salted_agg_correct_under_extreme_skew(spark):
    # one conversation owns 90% of rows
    from log_aggregation_pipeline_spark.sources.transcripts import (
        generate_transcripts,
        transcripts_df,
    )

    pdf = generate_transcripts(n_convs=10, turns_per_conv=30, skew_convs=1,
                               skew_factor=270, seed=3)
    df = transcripts_df(spark, pdf)
    a = conv_hour_agg(df).orderBy("conv_id", "hour").toPandas()
    b = conv_hour_agg(df, salted=True, n_salt=32).orderBy("conv_id", "hour").toPandas()
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)
