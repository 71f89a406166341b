"""Eval-set decontamination: overlap flags, threshold, filter form."""

from __future__ import annotations

from log_aggregation_pipeline_spark.operators.decontam import (
    contaminated_docs,
    decontaminate,
)

EVAL = [
    (100, "the capital of france is paris and it is large"),
    (101, "water boils at one hundred degrees celsius exactly"),
]
TRAIN = [
    # copies an eval 5-gram span verbatim -> contaminated
    (1, "some filler then the capital of france is paris end of doc"),
    # shares two distinct eval 5-grams (overlapping spans count once each)
    (2, "water boils at one hundred degrees celsius exactly said the teacher"),
    # same words, different order -> no shared 5-gram
    (3, "paris is the large capital and france of it"),
    (4, "completely unrelated text about spark shuffle partitions here"),
]


def _dfs(spark):
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    return mk(TRAIN), mk(EVAL)


def test_flags_verbatim_span_not_reordered_words(spark):
    train, ev = _dfs(spark)
    got = {r.doc_id: r.n_shared for r in
           contaminated_docs(train, ev, k=5).collect()}
    assert set(got) == {1, 2}
    # doc 1 copies the 5-token span 'the capital of france is' plus
    # 'capital of france is paris' -> 2 shared 5-grams
    assert got[1] == 2
    # doc 2 contains eval 101's full 8-token text -> all 4 of its 5-grams
    assert got[2] == 4


def test_min_overlap_threshold(spark):
    train, ev = _dfs(spark)
    got = {r.doc_id for r in
           contaminated_docs(train, ev, k=5, min_overlap=3).collect()}
    assert got == {2}  # doc 1's 2 shared shingles fall under the bar


def test_decontaminate_removes_only_flagged(spark):
    train, ev = _dfs(spark)
    kept = {r.doc_id for r in decontaminate(train, ev, k=5).collect()}
    assert kept == {3, 4}


def test_shuffle_join_fallback_same_answer(spark):
    train, ev = _dfs(spark)
    a = {(r.doc_id, r.n_shared) for r in
         contaminated_docs(train, ev, k=5).collect()}
    b = {(r.doc_id, r.n_shared) for r in
         contaminated_docs(train, ev, k=5, broadcast_eval=False).collect()}
    assert a == b
