"""Model-based quality gate: deterministic training, frozen-literal
parity, integer-feature dialect equivalence, and the projection-only
plan property that makes scoring free at 100 TB."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from log_aggregation_pipeline_spark.operators.quality_model import (
    QUALITY_CLF_BIAS_NANO,
    QUALITY_CLF_FEATURES,
    QUALITY_CLF_WEIGHTS_NANO,
    clf_features,
    score_quality_clf,
    train_quality_classifier,
)

SF01 = "/root/testdata/sf0.01"


def _feature_matrix(spark, sf: str) -> pd.DataFrame:
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    return (
        clf_features(docs)
        .select("doc_id", *QUALITY_CLF_FEATURES)
        .orderBy("doc_id")
        .toPandas()
    )


def test_training_is_deterministic():
    rng = np.random.default_rng(7)
    X = rng.integers(0, 1_000_000, size=(200, len(QUALITY_CLF_FEATURES)))
    y = (X[:, 0] > 500_000).astype(float)
    w1, b1 = train_quality_classifier(X, y)
    w2, b2 = train_quality_classifier(X, y)
    assert w1 == w2 and b1 == b2
    assert all(isinstance(v, int) for v in w1) and isinstance(b1, int)


def test_frozen_weights_regenerate_from_training_corpus(spark):
    """The committed literals are reproducible from the documented
    provenance (sf0.01 documents, quality_score >= 1.0 weak label,
    defaults).  <=1 nano-unit slack per component absorbs any future
    numpy last-ulp drift without letting a real change hide."""
    from log_aggregation_pipeline_spark.operators.text_analysis import (
        quality_features,
    )

    feats = _feature_matrix(spark, SF01)
    docs = spark.read.parquet(f"{SF01}/documents.parquet")
    lab = (
        quality_features(docs)
        .selectExpr("doc_id", "quality_score >= 1.0 AS y")
        .orderBy("doc_id")
        .toPandas()
    )
    assert (feats.doc_id.values == lab.doc_id.values).all()
    w, b = train_quality_classifier(
        feats[list(QUALITY_CLF_FEATURES)].to_numpy(np.float64),
        lab.y.to_numpy(np.float64),
    )
    for got, frozen in zip(w, QUALITY_CLF_WEIGHTS_NANO):
        assert abs(got - frozen) <= 1, (w, QUALITY_CLF_WEIGHTS_NANO)
    assert abs(b - QUALITY_CLF_BIAS_NANO) <= 1


def test_classifier_agrees_with_weak_label(spark):
    """>=95% agreement with the heuristic gate it was weakly
    supervised by — a feature or dialect drift trips this before it
    reaches the driver oracle."""
    from log_aggregation_pipeline_spark.operators.text_analysis import (
        quality_features,
    )

    docs = spark.read.parquet(f"{SF01}/documents.parquet")
    scored = (
        score_quality_clf(docs)
        .select("doc_id", "clf_pass")
        .orderBy("doc_id")
        .toPandas()
    )
    lab = (
        quality_features(docs)
        .selectExpr("doc_id", "quality_score >= 1.0 AS y")
        .orderBy("doc_id")
        .toPandas()
    )
    agree = (scored.clf_pass.values == lab.y.values).mean()
    assert agree >= 0.95, agree
    # both classes present — the gate is a real decision boundary on
    # this corpus, not a constant
    assert 0 < scored.clf_pass.sum() < len(scored)


def test_scoring_is_pure_projection(spark):
    """Weights are literals, features are per-row expressions: the
    scored plan must be scan -> project only — ZERO Exchange, zero
    joins, no aggregates.  That is the property that lets the gate
    ride any 100 TB scan for free."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    p = score_quality_clf(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p
    assert "Join" not in p
    assert "Aggregate" not in p


def test_features_match_duckdb_on_edge_texts(spark):
    """Differential mini-test on adversarial inputs: empty text,
    whitespace-only, a vertical tab (the Java-\\s-vs-RE2 trap),
    accented words, punctuation runs, single token.  Spark features
    must equal the DuckDB twin's CELL FOR CELL."""
    from log_aggregation_pipeline_spark import oracle
    from log_aggregation_pipeline_spark.operators.text_analysis import (
        STOPWORDS,
    )

    rows = [
        (0, ""),
        (1, "   \t  "),
        (2, "a\x0bb word"),
        (3, "the quick brown fox the the"),
        (4, "único añejo œuvre"),
        (5, "!!! ??? ... ###"),
        (6, "word"),
        (7, "The  THE   the\nnewline line two"),
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    sp = (
        clf_features(spark.createDataFrame(pdf))
        .select("doc_id", *QUALITY_CLF_FEATURES)
        .orderBy("doc_id")
        .toPandas()
    )
    con = duckdb.connect()
    con.register("documents", pdf)
    sql = oracle.quality_clf_sql(
        QUALITY_CLF_WEIGHTS_NANO, QUALITY_CLF_BIAS_NANO, STOPWORDS
    )
    dk = con.sql(
        f"SELECT doc_id, {', '.join(QUALITY_CLF_FEATURES)} FROM ({sql}) "
        "ORDER BY doc_id"
    ).df()
    pd.testing.assert_frame_equal(
        sp.reset_index(drop=True), dk.reset_index(drop=True),
        check_dtype=False,
    )


def test_no_int32_overflow_on_long_documents(spark):
    """Regression: F.size()/F.length() are IntegerType and
    `1000000 * int32` overflows at >2147 tokens before the div widens
    — an ANSI-mode ArithmeticException on any real-length document
    (found by the r7 self-review, reproduced on Spark 4.1.2).  A
    3000-distinct-token doc must score without error and match the
    BIGINT DuckDB twin cell for cell."""
    from log_aggregation_pipeline_spark import oracle
    from log_aggregation_pipeline_spark.operators.text_analysis import (
        STOPWORDS,
    )

    text = " ".join(f"tok{i}" for i in range(3000)) + " !!! the"
    pdf = pd.DataFrame({"doc_id": [0], "text": [text]})
    sp = (
        score_quality_clf(spark.createDataFrame(pdf))
        .select("doc_id", *QUALITY_CLF_FEATURES,
                "quality_logit_nano", "clf_pass")
        .toPandas()
    )
    assert sp.f_ntok[0] == 3002 and sp.f_uniq_ppm[0] > 0
    con = duckdb.connect()
    con.register("documents", pdf)
    sql = oracle.quality_clf_sql(
        QUALITY_CLF_WEIGHTS_NANO, QUALITY_CLF_BIAS_NANO, STOPWORDS
    )
    dk = con.sql(
        f"SELECT doc_id, {', '.join(QUALITY_CLF_FEATURES)}, "
        "quality_logit_nano, clf_pass FROM (" + sql + ")"
    ).df()
    pd.testing.assert_frame_equal(
        sp.reset_index(drop=True), dk.reset_index(drop=True),
        check_dtype=False,
    )


def test_weight_arity_validated():
    # arity is checked before any plan is constructed, so no frame is
    # needed to trip it
    with pytest.raises(ValueError):
        score_quality_clf(None, weights_nano=(1, 2, 3))
