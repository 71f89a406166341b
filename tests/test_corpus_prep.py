"""Corpus-prep funnel: every stage must actually bite on a corpus
constructed to trip each filter."""

from __future__ import annotations

from log_aggregation_pipeline_spark.plans.corpus_prep import corpus_prep_funnel

GOOD = ("the quick brown fox jumps over the lazy dog and then it runs "
        "far away into the woods to rest for a while in the shade")


def test_funnel_stages_monotone_and_correct(spark):
    docs = [
        (0, GOOD),                       # keeper, good quality
        (1, GOOD),                       # exact dup of 0 -> dropped at dedup
        (2, GOOD.upper()),               # normalized dup of 0 -> dropped
        (3, "x " * 5),                   # too short -> quality floor
        (4, GOOD + " extra tail words on it that keep the score high"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    row = corpus_prep_funnel(
        df, quality_min=0.9, decontam_k=5, n_eval=1
    ).first()
    assert row.n_docs == 5
    assert row.n_keepers == 3          # {0, 3, 4}
    assert row.n_quality == 2          # 3 fails the floor
    # n_eval=1 removes one doc as eval; any keeper sharing a 5-gram
    # with it is decontaminated -> clean is a strict subset
    assert row.n_clean <= row.n_quality
    assert row.n_docs >= row.n_keepers >= row.n_quality >= row.n_clean >= 0
    if row.n_clean == 0:
        assert row.clean_tokens == 0
    else:
        assert row.clean_tokens > 0
