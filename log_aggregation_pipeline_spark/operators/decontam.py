"""Eval-set decontamination: flag training docs that leak benchmark text.

Before training, every serious pipeline removes documents that share
n-gram spans with held-out evaluation sets (the GPT-3 appendix-C
recipe: 13-gram overlap).  The reference pipeline has no analog — this
belongs to the training-data suite alongside ``operators.dedupe``.

Shape at 100 TB: the EVAL side is tiny (benchmarks are 10^4-10^6
items → at most a few 10^7 distinct shingles), the TRAIN side is the
100 TB — so the only sane plan is "collect eval shingles, broadcast,
hash-join against the train shingle stream": zero shuffle on the big
side, one scan, map-side join.  ``broadcast_eval=False`` exists for a
pathological eval set (falls back to a shuffle join keyed on shingle —
uniform content keys, no skew).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from log_aggregation_pipeline_spark.operators.dedupe import (
    _explode_shingles,
    _shingle_df,
)

# The published GPT-3 appendix-C recipe's n-gram size.  The driver
# contract runs k=5 because the synthetic test corpus's docs are short
# word salad (13-gram collisions never occur there); production runs
# against real benchmarks should use this profile.  Interaction to
# know: a doc with FEWER than k tokens produces zero shingles and can
# therefore NEVER be flagged, however much of it appears in the eval
# set — at k=13 that silently exempts sub-13-token docs (tweets, titles,
# single-line code).  If short docs matter, run a second pass at a
# smaller k over only the short-doc slice (tested in
# tests/test_decontam.py::test_k13_profile_short_doc_exemption).
GPT3_K = 13


def eval_split(df: DataFrame, n: int, id_col: str = "doc_id") -> DataFrame:
    """Deterministic md5-ranked eval slice — the engine-portable split
    idiom (same rank key as operators.sampling).  The single shared
    implementation: the driver queries, the corpus-prep funnel and the
    bench all call THIS, and the DuckDB oracles' eval_ids CTE mirrors
    it verbatim — edit both together or the oracle gate flips."""
    return df.orderBy(
        F.md5(F.col(id_col).cast("string")), id_col
    ).limit(n)


def contaminated_docs(
    train: DataFrame,
    eval_df: DataFrame,
    k: int = 5,
    min_overlap: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_eval: bool = True,
) -> DataFrame:
    """(doc_id, n_shared) for train docs sharing >= ``min_overlap``
    distinct word-k-gram shingles with ANY eval doc.

    ``n_shared`` counts the train doc's distinct shingles that appear
    anywhere in the eval set (shingle sets are distinct on both sides,
    so the join emits each shared shingle exactly once per doc).
    Normalization is the dedup family's ``normalize_text``.
    """
    ev = (
        _explode_shingles(_shingle_df(eval_df, k, text_col, id_col))
        .select("_s")
        .distinct()
    )
    if broadcast_eval:
        ev = F.broadcast(ev)
    tr = _explode_shingles(_shingle_df(train, k, text_col, id_col))
    return (
        tr.join(ev, "_s")
        .groupBy(F.col("_id").alias(id_col))
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_overlap)
    )


def eval_contamination_report(
    train: DataFrame,
    eval_df: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_eval: bool = True,
) -> DataFrame:
    """Per-EVAL-item burn report — the complement of
    ``contaminated_docs``: not "which train docs to drop" but "which
    benchmark items are compromised and how badly".  For each eval doc
    sharing >=1 shingle with the train side: the number of distinct
    train docs that hit it and the total (train doc, shared shingle)
    hit count.

    Same scale shape as decontamination: eval shingles broadcast (now
    keyed (shingle, eval_id) — still eval-sized), the train stream
    map-side joins with NO shuffle of the big side; the only exchange
    is the final eval-keyed aggregate, whose cardinality is the eval
    set's."""
    ev = _explode_shingles(_shingle_df(eval_df, k, text_col, id_col)).select(
        F.col("_id").alias("_eval_id"), "_s"
    )
    if broadcast_eval:
        ev = F.broadcast(ev)
    tr = _explode_shingles(_shingle_df(train, k, text_col, id_col))
    return (
        tr.join(ev, "_s")
        .groupBy(F.col("_eval_id").alias("eval_doc_id"))
        .agg(
            F.count_distinct("_id").alias("n_train_docs"),
            F.count("*").alias("n_hits"),
        )
    )


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    k: int = 5,
    min_overlap: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Train rows with the contaminated docs REMOVED (left-anti join
    against the flagged set) — the filter form of the same plan."""
    flagged = contaminated_docs(
        train, eval_df, k, min_overlap, text_col, id_col
    ).select(id_col)
    return train.join(flagged, id_col, "left_anti")


def semantic_contaminated(
    train: DataFrame,
    eval_vectors: list[tuple[int, list[float]]],
    threshold: float = 0.3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Semantic (embedding-space) eval-set decontamination: flag train
    vectors whose max cosine against ANY eval item reaches
    ``threshold`` — the paraphrase-leak complement of the exact
    n-gram pass above (``contaminated_docs`` catches verbatim spans;
    a reworded benchmark item shares no 13-gram but sits next to the
    original in embedding space).

    Output: (vec_id, nearest_eval_id, max_cosine) for flagged rows —
    nearest = highest 6dp-rounded cosine, ties to the LOWEST eval id
    (rounding BEFORE the argmax so both engines break the same ties
    the same way).

    ``eval_vectors`` is a driver-side materialized list [(eval_id,
    vector)] — eval sets are bounded (the module-docstring scale
    argument: benchmarks are 10^4-10^6 items, the corpus is the
    100 TB), so the eval side rides the closure as LITERALS and the
    scoring is a pure projection over the train scan: per-row work is
    n_eval dot folds, zero joins, zero shuffles, nothing broadcast at
    runtime.  This literal form is right up to ~10^2-10^3 eval items
    (codegen expression size bounds it); past that, switch the eval
    side to an explicit ``F.broadcast`` cross join — the same
    per-row arithmetic executed through a build-side hash relation
    instead of the expression tree."""
    from .similarity import dot_expr, double_array_lit, norm_expr

    import numpy as np

    if not eval_vectors:
        # F.array() with zero elements cannot carry the struct type —
        # and a silent "nothing flagged" would hide a wiring bug
        raise ValueError("semantic_contaminated: eval_vectors is empty")
    vec = F.col(vec_col).cast("array<double>")
    base = train.select(F.col(id_col), vec.alias("_v")).withColumn(
        "_n", norm_expr("_v")
    )
    scored = []
    for eid, ve in eval_vectors:
        v = np.asarray(ve, dtype=np.float64)
        lit = double_array_lit(v)
        cos = dot_expr(F.col("_v"), lit) / (
            F.col("_n") * F.lit(float(np.linalg.norm(v)))
        )
        scored.append(
            F.struct(
                F.round(cos, 6).alias("c"),
                F.lit(-int(eid)).cast("long").alias("nid"),
            )
        )
    best = F.array_max(F.array(*scored))
    return (
        base.withColumn("_best", best)
        .filter(F.col("_best.c") >= threshold)
        .select(
            id_col,
            (-F.col("_best.nid")).alias("nearest_eval_id"),
            F.col("_best.c").alias("max_cosine"),
        )
    )
