"""Model-based quality filtering — the published classifier-filter
pattern (GPT-3 appendix A; DCLM; RefinedWeb's fasttext gate)
re-expressed Spark-first with this repo's fixed-point determinism
discipline.

The published recipe is: train a small classifier on weak labels
(known-good vs known-bad documents), then score the whole corpus and
keep high-scoring docs.  At 100 TB the two halves have very different
shapes and this module keeps them separate:

- **Training is driver-side on a BOUNDED labeled sample** (the same
  posture as the IVF k-means in similarity.py: a few thousand feature
  rows collected once).  ``train_quality_classifier`` is a
  deterministic full-batch logistic regression — fixed step count,
  fixed learning rate, float64 numpy, no randomness — whose output is
  quantized to INTEGER nano-unit weights.
- **Scoring is a pure codegen projection**: integer features (ppm /
  centi ratios via true integer division, the repo's fixed-point
  rule) dotted with the literal integer weights.  No shuffle, no
  join, no float anywhere in the scored plan, so the DuckDB twin is
  hash-exact by construction and the stage rides any scan at any
  scale (plan pinned in tests/test_quality_model.py).

Weak label used for the frozen weights: ``quality_features``'s
composite score == 1.0 (doc passes all four heuristic gates) — the
"known good" side, exactly the published weak-supervision shape
(RefinedWeb labels wiki-linked pages good, random crawl bad; here the
rule-based gates play the trusted side).  Reference parity: the
reference has no classifier gate (its quality surface is rule-based
only, SURVEY §2); this operator is part of the LLM-data-pipeline
tier, not a port.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedupe import normalize_text
from .text_analysis import STOPWORDS, whitespace_token_count

# Feature order is part of the model contract: weights are positional.
QUALITY_CLF_FEATURES: tuple[str, ...] = (
    "f_ntok",       # whitespace token count
    "f_nchars",     # raw character count
    "f_mtl_c100",   # mean token length, centi-chars: (100*chars) div tok
    "f_punct_ppm",  # punctuation chars per million chars
    "f_stop_ppm",   # stopword tokens per million tokens
    "f_uniq_ppm",   # distinct tokens per million tokens (type-token)
)

# Frozen model (provenance): trained 2026-08-18 by
# train_quality_classifier on the sf0.01 documents table (500 rows,
# every row — the bounded-sample regime), label
# quality_features.quality_score >= 1.0 (311 pos / 189 neg),
# steps=800, lr=1.0.  Agreement with the weak label on the training
# corpus: 99.4% (pinned as >= 0.95 in tests so a feature or dialect
# drift trips a named test).  tests/test_quality_model.py also
# re-trains from the same parquet and asserts the regenerated weights
# match these literals to <= 1 nano-unit per component.
QUALITY_CLF_WEIGHTS_NANO: tuple[int, ...] = (
    5889202,      # f_ntok
    -2258129,     # f_nchars
    -2099566,     # f_mtl_c100
    0,            # f_punct_ppm (constant 0 on this corpus)
    223174,       # f_stop_ppm
    -1467,        # f_uniq_ppm
)
QUALITY_CLF_BIAS_NANO: int = -8886938545


def clf_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add the six integer feature columns.

    Every ratio is one true integer division (``div``, truncating —
    identical to DuckDB's ``//`` because every numerator here is
    non-negative); no float ever materializes, so there is nothing to
    round and nothing to drift.  The punctuation class spells out
    whitespace (``\\s`` differs between Java and RE2 — repo rule) and
    the token/normalization primitives are the suite-shared ones, so
    the DuckDB twin reuses the already-proven N_TOKENS_SQL/NORM_SQL
    fragments."""
    c = F.col(text_col)
    norm = normalize_text(text_col)
    # every count is cast to LONG at creation: F.size()/F.length()
    # return IntegerType, and `1000000 * int32` overflows at >2147
    # tokens BEFORE the div widens — an ANSI-mode crash (or, with ANSI
    # off, a silent wrong value the BIGINT DuckDB twin would expose as
    # a hash mismatch) on any real-length document
    base = (
        df.withColumn(
            "_ntok", whitespace_token_count(text_col).cast("long"))
        .withColumn("_nchars", F.length(c).cast("long"))
        .withColumn(
            "_npunct",
            # regexp_count == size(regexp_extract_all(..., 0)) minus
            # the match-array materialization (r8)
            F.regexp_count(c, F.lit(r"[^\w \t\n\x0B\f\r]")).cast("long"),
        )
        .withColumn("_t", F.split(norm, " "))
    )
    n_stop = F.size(F.filter(F.col("_t"), lambda t: t.isin(*STOPWORDS)))
    n_uniq = F.size(F.array_distinct("_t"))
    out = (
        base.withColumn("_nstop", n_stop.cast("long"))
        .withColumn("_nuniq", n_uniq.cast("long"))
        .withColumn("f_ntok", F.col("_ntok"))
        .withColumn("f_nchars", F.col("_nchars"))
        .withColumn(
            "f_mtl_c100",
            F.expr("(100 * _nchars) div greatest(_ntok, 1)"),
        )
        .withColumn(
            "f_punct_ppm",
            F.expr("(1000000 * _npunct) div greatest(_nchars, 1)"),
        )
        .withColumn(
            "f_stop_ppm",
            F.expr("(1000000 * _nstop) div greatest(_ntok, 1)"),
        )
        .withColumn(
            "f_uniq_ppm",
            F.expr("(1000000 * _nuniq) div greatest(_ntok, 1)"),
        )
    )
    return out.drop("_ntok", "_nchars", "_npunct", "_t", "_nstop", "_nuniq")


def score_quality_clf(
    df: DataFrame,
    weights_nano: tuple[int, ...] = QUALITY_CLF_WEIGHTS_NANO,
    bias_nano: int = QUALITY_CLF_BIAS_NANO,
    text_col: str = "text",
) -> DataFrame:
    """Score documents with literal integer weights: one BIGINT dot
    product per row, classify on the sign.  ``quality_logit_nano`` is
    monotone in the trained model's probability, so downstream top-k /
    percentile selection can rank on it directly (deterministic with
    the usual (score, id) tie-break).  Bounds: |feature| <= 1e6-ish,
    |weight| < 1e7 nano ⇒ per-term < 1e13, six terms — no BIGINT
    overflow anywhere near."""
    if len(weights_nano) != len(QUALITY_CLF_FEATURES):
        raise ValueError(
            f"need {len(QUALITY_CLF_FEATURES)} weights, "
            f"got {len(weights_nano)}"
        )
    out = clf_features(df, text_col)
    logit = F.lit(int(bias_nano)).cast("long")
    for name, w in zip(QUALITY_CLF_FEATURES, weights_nano):
        logit = logit + F.col(name) * F.lit(int(w)).cast("long")
    return out.withColumn("quality_logit_nano", logit).withColumn(
        "clf_pass", F.col("quality_logit_nano") >= 0
    )


def train_quality_classifier(
    features: np.ndarray,
    labels: np.ndarray,
    steps: int = 800,
    lr: float = 1.0,
) -> tuple[tuple[int, ...], int]:
    """Deterministic logistic regression over a BOUNDED sample.

    Full-batch gradient descent (no shuffling, no minibatches, no
    initialization randomness — weights start at exactly zero), so the
    same (features, labels) always yields the same model.  Features
    are standardized for conditioning; the standardization is folded
    back into raw-space coefficients afterwards so SCORING needs no
    corpus statistics, then quantized to integer nano-units — the only
    representation the scoring path ever sees.

    100 TB note: this function touches a driver-side numpy array and
    must stay in the bounded-sample regime (the IVF-centroid rule,
    similarity.py:194) — curate a few thousand weak-labeled rows, not
    the corpus."""
    X = np.asarray(features, dtype=np.float64)
    y = np.asarray(labels, dtype=np.float64)
    if X.ndim != 2 or X.shape[1] != len(QUALITY_CLF_FEATURES):
        raise ValueError(
            f"features must be (n, {len(QUALITY_CLF_FEATURES)})")
    mu, sd = X.mean(axis=0), X.std(axis=0)
    sd = np.where(sd == 0, 1.0, sd)
    Z = (X - mu) / sd
    w = np.zeros(Z.shape[1])
    b = 0.0
    n = len(y)
    for _ in range(steps):
        p = 1.0 / (1.0 + np.exp(-(Z @ w + b)))
        w -= lr * (Z.T @ (p - y) / n)
        b -= lr * float((p - y).mean())
    w_raw = w / sd
    b_raw = b - float((w * mu / sd).sum())
    weights = tuple(int(v) for v in np.round(w_raw * 1e9).astype(np.int64))
    return weights, int(round(b_raw * 1e9))
