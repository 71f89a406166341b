"""Per-source dataset card — the composition report a training run
publishes next to its corpus: size, token distribution, quality and
Gopher pass counts, majority language, per source.

Shape: ONE chained projection (quality_features -> gopher_rules ->
lang_id — all pure codegen, single scan, no joins between the
feature stages) feeding two aggregates: the per-source metric rollup
(one shuffle on the source key) and a (source, lang) count + window
for the majority language (deterministic ties: count desc, lang asc —
NOT mode(), whose tie behavior is engine-arbitrary).  Counts are
integers and quantiles follow the corpus_stats percentile ==
quantile_cont equivalence, so the DuckDB twin hashes identically;
mean-of-double-score columns are deliberately absent (float sum order
is not associative across engines — repo float-oracle rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from log_aggregation_pipeline_spark.operators.text_analysis import (
    gopher_rules,
    lang_id,
    quality_features,
)


def dataset_card(
    docs: DataFrame,
    group_col: str = "source",
    quality_min: float = 1.0,
    text_col: str = "text",
) -> DataFrame:
    """(source, n_docs, total_tokens, p50_tokens, p95_tokens,
    n_quality, n_gopher_pass, top_lang) per source."""
    base = lang_id(
        gopher_rules(quality_features(docs, text_col), text_col), text_col
    )
    per = base.groupBy(group_col).agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(F.percentile("n_tokens", F.lit(0.5)), 6).alias("p50_tokens"),
        F.round(F.percentile("n_tokens", F.lit(0.95)), 6).alias("p95_tokens"),
        F.count(F.when(F.col("quality_score") >= quality_min, 1)).alias(
            "n_quality"
        ),
        F.count(F.when(F.col("gopher_pass"), 1)).alias("n_gopher_pass"),
    )
    lang_counts = base.groupBy(group_col, "lang_pred").agg(
        F.count("*").alias("_n")
    )
    w = Window.partitionBy(group_col).orderBy(
        F.desc("_n"), F.asc("lang_pred")
    )
    top = (
        lang_counts.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(group_col, F.col("lang_pred").alias("top_lang"))
    )
    return per.join(top, group_col)
