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


def test_k13_profile_short_doc_exemption(spark):
    """The published 13-gram profile (GPT3_K): a 13+-token verbatim
    overlap flags, and a doc SHORTER than k tokens yields no shingles
    so it is never flagged even when it is an exact substring of an
    eval doc — the documented min-doc-length interaction."""
    from log_aggregation_pipeline_spark.operators.decontam import (
        GPT3_K,
        contaminated_docs,
    )

    bench = " ".join(f"q{i}" for i in range(20))  # 20-token eval item
    ev = spark.createDataFrame([(100, bench)], "doc_id long, text string")
    train = spark.createDataFrame(
        [
            # 13-token verbatim span of the benchmark -> flagged
            (1, " ".join(f"q{i}" for i in range(13))),
            # 12-token verbatim span: under k, zero shingles -> exempt
            (2, " ".join(f"q{i}" for i in range(12))),
            # unrelated long doc -> clean
            (3, " ".join(f"w{i}" for i in range(30))),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.n_shared
        for r in contaminated_docs(train, ev, k=GPT3_K).collect()
    }
    assert got == {1: 1}


def test_semantic_contaminated_planted(spark):
    """Embedding-space decontam on planted vectors: a near-copy of an
    eval item flags with the right nearest id, an orthogonal vector
    does not, a vector equidistant from two eval items (cosines equal
    at 6dp) resolves nearest to the LOWEST eval id, and sub-threshold
    similarity stays unflagged."""
    from log_aggregation_pipeline_spark.operators.decontam import (
        semantic_contaminated,
    )

    d = 8
    e = lambda i: [1.0 if j == i else 0.0 for j in range(d)]
    evals = [(100, e(0)), (101, e(1))]
    rows = [
        (1, [0.99, 0.01] + [0.0] * (d - 2)),            # ~e0
        (2, e(2)),                                       # orthogonal to both
        (3, [0.70710678, 0.70710678] + [0.0] * (d - 2)), # exact tie e0/e1
        (4, [0.2, 0.1] + [0.0] * (d - 2)),               # cos ~0.894 -> also hits
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r.vec_id: r for r in
           semantic_contaminated(df, evals, threshold=0.5).collect()}
    assert got[1].nearest_eval_id == 100 and got[1].max_cosine > 0.99
    assert 2 not in got
    assert got[3].nearest_eval_id == 100 and got[3].max_cosine == 0.707107
    assert got[4].nearest_eval_id == 100  # cos = 0.2/sqrt(0.05) ~ 0.894
    # threshold bites: raise it above the tie and near-hit cosines
    got2 = {r.vec_id for r in
            semantic_contaminated(df, evals, threshold=0.95).collect()}
    assert got2 == {1}
