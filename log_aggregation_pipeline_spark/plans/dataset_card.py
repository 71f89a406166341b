"""Per-source dataset card — the composition report a training run
publishes next to its corpus: size, token distribution, quality and
Gopher pass counts, majority language, per source.

Shape: ONE chained projection (quality_features -> gopher_rules ->
lang_id — all pure codegen, single scan, no joins between the
feature stages) feeding ONE per-source aggregate.  The majority
language is computed INSIDE that aggregate: per-language counts over
the small fixed language set (LANG_MARKERS + 'und'), then a
deterministic strictly-greater fold in ascending language order —
which is exactly "count desc, lang asc" tie-breaking, and avoids both
a second scan (a separate (source, lang) aggregate would re-evaluate
every regexp/HOF in the projection — Catalyst does not share
non-exchange subplans) and mode(), whose tie behavior is
engine-arbitrary.  Counts are integers and quantiles follow the
corpus_stats percentile == quantile_cont equivalence, so the DuckDB
twin hashes identically; mean-of-double-score columns are
deliberately absent (float sum order is not associative across
engines — repo float-oracle rule).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from log_aggregation_pipeline_spark.operators.text_analysis import (
    LANG_MARKERS,
    gopher_rules,
    lang_id,
    quality_features,
)

CARD_LANGS = tuple(sorted(LANG_MARKERS)) + ("und",)


def _majority_lang() -> Column:
    """Fold per-language counts (columns ``_n_<lang>``) to the
    majority language: iterate in ascending language order, replace
    only on a STRICTLY greater count — ties keep the earlier
    (ascending-min) language, i.e. ORDER BY count DESC, lang ASC."""
    best = F.lit(CARD_LANGS[0])
    best_n = F.col(f"_n_{CARD_LANGS[0]}")
    for lg in CARD_LANGS[1:]:
        take = F.col(f"_n_{lg}") > best_n
        best = F.when(take, F.lit(lg)).otherwise(best)
        best_n = F.when(take, F.col(f"_n_{lg}")).otherwise(best_n)
    return best


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
        *[
            F.count(F.when(F.col("lang_pred") == lg, 1)).alias(f"_n_{lg}")
            for lg in CARD_LANGS
        ],
    )
    return per.select(
        group_col,
        "n_docs",
        "total_tokens",
        "p50_tokens",
        "p95_tokens",
        "n_quality",
        "n_gopher_pass",
        _majority_lang().alias("top_lang"),
    )
