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


def test_neardup_funnel_drops_cluster_losers(spark):
    """v2 funnel: near-dup members that lose the quality election are
    dropped between the exact stage and the quality floor."""
    from log_aggregation_pipeline_spark.plans.corpus_prep import (
        corpus_prep_funnel_neardup,
    )

    near = GOOD.replace("lazy", "sleepy")  # high-jaccard variant of GOOD
    docs = [
        (0, GOOD),                     # near-dup cluster {0, 2}
        (1, GOOD),                     # exact dup of 0 -> exact stage
        (2, near),                     # loses to 0 (equal quality, min id)
        (3, "x " * 5),                 # survives dedup, fails the floor
        (4, "completely different text about other things entirely "
            "with many of the usual stop words in it for a while"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    row = corpus_prep_funnel_neardup(
        df, quality_min=0.9, jaccard_k=3, jaccard_t=0.4,
        max_shingle_freq=None, decontam_k=5, n_eval=1,
    ).first()
    assert row.n_docs == 5
    assert row.n_exact == 4            # 1 collapsed into 0
    assert row.n_neardup == 3          # 2 lost the cluster election
    assert row.n_quality == 2          # 3 fails the floor -> {0, 4}
    assert row.n_docs >= row.n_exact >= row.n_neardup >= row.n_quality
    assert row.n_quality >= row.n_clean >= 0


def test_dataset_card_per_source(spark):
    from log_aggregation_pipeline_spark.plans.dataset_card import (
        dataset_card,
    )

    en = ("the results of the run were good and the team shipped "
          "them with the usual care that the work deserves always")
    es = "el que los una por la que los una por el que los una por"
    docs = [
        (1, "a", en * 2),      # quality-passing English doc
        (2, "a", en),
        (3, "a", "x"),         # junk: fails quality, lang 'und'... but
        (4, "b", es),          # Spanish-marker doc
        (5, "b", es + " extra"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, source string, text string")
    got = {r.source: r for r in dataset_card(df, quality_min=0.9).collect()}
    a, b = got["a"], got["b"]
    assert a.n_docs == 3 and b.n_docs == 2
    assert a.top_lang == "en" and b.top_lang == "es"
    assert a.n_quality == 2    # doc 3 fails the floor
    assert a.total_tokens == sum(len(t.split()) for _, s, t in docs if s == "a")
    # every constructed doc is under the 50-token Gopher floor (the
    # doubled doc fuses at the join point: 2*21-1 = 41 tokens) — the
    # counts are fully determined
    assert a.n_gopher_pass == 0 and b.n_gopher_pass == 0


def test_neardup_funnel_custom_text_col(spark):
    # text_col must thread through EVERY stage incl. the keeper
    # election (regression: cluster_drop_list hard-coded 'text')
    from log_aggregation_pipeline_spark.plans.corpus_prep import (
        corpus_prep_funnel_neardup,
    )

    near = GOOD.replace("lazy", "sleepy")
    df = spark.createDataFrame(
        [(0, GOOD), (1, GOOD), (2, near)], "doc_id long, body string"
    )
    row = corpus_prep_funnel_neardup(
        df, quality_min=0.9, max_shingle_freq=None, n_eval=1,
        text_col="body",
    ).first()
    assert row.n_docs == 3 and row.n_exact == 2 and row.n_neardup == 1


def test_funnel_lsh_propagates_persisted_handle(spark):
    """The funnel LSH form embeds minhash_lsh_pairs' persisted shingle
    frame in its plan; the report must surface that handle
    (lap_persisted) so bench/sweep callers can free it after
    materialization (ADVICE r6 #1).  The jaccard form persists
    nothing, so its handle set is empty."""
    from log_aggregation_pipeline_spark.plans.corpus_prep import (
        corpus_prep_funnel_neardup,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    report = corpus_prep_funnel_neardup(docs, pairs="lsh")
    report.collect()
    # r8: minhash_lsh_pairs persists the shingle frame AND the band
    # table (both consumed twice) — the funnel surfaces both handles
    assert len(report.lap_persisted) == 2
    for f in report.lap_persisted:
        assert f.storageLevel.useMemory
        f.unpersist()
        assert not f.storageLevel.useMemory
    assert corpus_prep_funnel_neardup(docs).lap_persisted == ()
