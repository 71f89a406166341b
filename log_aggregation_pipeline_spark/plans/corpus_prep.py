"""Corpus-prep funnel: the training-data operators composed end-to-end.

dedup keepers -> quality floor -> eval removal -> decontamination ->
dataset totals: one DataFrame plan whose single-row report carries the
count at each funnel stage plus the surviving token budget — the
numbers a data lead reads before a training run.

Composition notes (why this shape survives 100 TB):
- every stage is one of the already-plan-audited operators (hash
  groupBy dedup, codegen quality projection, broadcast-eval
  decontamination), chained with left-semi/anti joins on doc_id —
  uniform key, no new shuffle classes;
- contamination is a PER-DOC property vs the eval set (independent of
  other train docs), so flagging the full corpus and anti-joining the
  filtered set is exactly equivalent to flagging the filtered set —
  letting the decontam stage share one scan shape regardless of the
  upstream filters;
- the five funnel counts are independent single-row aggregates
  crossJoined together (1x1 joins — free).

Cold-plan cost: this is the repo's largest composed plan, so a fresh
session pays its full codegen once — measured 7.8-9.9 s single-shot at
sf0.1 across three fresh JVMs (BENCH/METHODOLOGY.md "Cold-plan
costs"); warm re-runs are ~2 s.  A one-time per-session cost, not a
per-batch one — at 100 TB the same plan compiles once and runs for
hours.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from log_aggregation_pipeline_spark.operators.decontam import (
    contaminated_docs,
    eval_split,
)
from log_aggregation_pipeline_spark.operators.dedupe import exact_dedup_rows
from log_aggregation_pipeline_spark.operators.text_analysis import (
    quality_features,
    whitespace_token_count,
)


def corpus_prep_funnel(
    docs: DataFrame,
    quality_min: float = 1.0,
    decontam_k: int = 5,
    n_eval: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Single-row funnel report:
    (n_docs, n_keepers, n_quality, n_clean, clean_tokens)."""
    keepers = exact_dedup_rows(docs, text_col=text_col, id_col=id_col)
    ev = eval_split(docs, n_eval, id_col)
    flagged = contaminated_docs(
        docs.join(ev.select(id_col), id_col, "left_anti"),
        ev,
        k=decontam_k,
        text_col=text_col,
        id_col=id_col,
    ).select(id_col)
    # ONE annotated pass over the keepers (r8): the r7 form referenced
    # the exact-dedup window subtree from three independent aggregates
    # (n_keepers, n_quality, the clean count/token agg) — Catalyst
    # does not dedupe subplans, so each crossJoined report column
    # re-ran the scan + hash + window shuffle.  Flags via LEFT joins
    # (the drop/eval/flag sets all carry UNIQUE ids, so a left join
    # marks without duplicating — exactly the anti/semi-join row
    # sets) + one conditional aggregate produce identical counts.
    ann = (
        quality_features(keepers, text_col=text_col)
        .join(
            ev.select(id_col).withColumn("_ev", F.lit(True)), id_col, "left"
        )
        .join(flagged.withColumn("_fl", F.lit(True)), id_col, "left")
    )
    is_qual = F.col("quality_score") >= quality_min
    is_clean = is_qual & F.col("_ev").isNull() & F.col("_fl").isNull()
    stats = ann.agg(
        F.count("*").alias("n_keepers"),
        F.count(F.when(is_qual, 1)).alias("n_quality"),
        F.count(F.when(is_clean, 1)).alias("n_clean"),
        F.coalesce(
            F.sum(F.when(is_clean, whitespace_token_count(text_col))), F.lit(0)
        ).cast("long").alias("clean_tokens"),
    )
    return docs.agg(F.count("*").alias("n_docs")).crossJoin(stats).select(
        "n_docs", "n_keepers", "n_quality", "n_clean", "clean_tokens"
    )


def corpus_prep_funnel_neardup(
    docs: DataFrame,
    quality_min: float = 1.0,
    jaccard_k: int = 3,
    jaccard_t: float = 0.4,
    max_shingle_freq: int | None = 1000,
    decontam_k: int = 5,
    n_eval: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
    materialize_dir: str | None = None,
    pairs: str = "jaccard",
    lsh_num_hashes: int = 64,
    lsh_bands: int = 16,
) -> DataFrame:
    """The funnel with a NEAR-dup stage between exact dedup and the
    quality floor — the full curation recipe a pretraining run uses:

    exact keepers -> near-dup pairs over the keepers ->
    quality-elected cluster keepers (losers anti-joined away) ->
    quality floor -> eval removal -> decontamination.

    Single-row report: (n_docs, n_exact, n_neardup, n_quality,
    n_clean, clean_tokens).

    ``pairs`` selects the pair source.  **Run ``pairs="lsh"`` (ideally
    with ``materialize_dir``) for any real workload** — it is both the
    100 TB shape AND the fastest form at sf0.1 (5.6 s best vs 8.7
    recompute / 8.8 materialized, BENCH/METHODOLOGY.md).  The default
    ``"jaccard"`` form is DEPRECATED for scale use and kept only as
    the bench/oracle twin (its exactness is what lets the driver's
    funnel oracle apply to the LSH form at this corpus's jaccard
    floor): it is EXACT-by-contract but its capped shingle self-join's
    candidate volume (sum of f² over sub-cap shingle frequencies) is
    super-linear in corpus size — fine for audits and test scale,
    never the shape to run at 100 TB.  ``pairs="lsh"`` uses banded
    MinHash buckets
    (``minhash_lsh_pairs``, 64 hashes x 16 bands) + exact-Jaccard
    verify — candidate volume is bounded by bucket collisions, and at
    this corpus's qualifying-pair floor (jaccard >= 0.8) the per-pair
    miss probability is (1-0.8^4)^16 ~= 2e-4, so the output equals the
    exact pair set (the same recall arithmetic the driver's
    ``doc_minhash_lsh_pairs`` entry relies on; equality pinned in
    tests).  ``max_shingle_freq`` applies to the jaccard source only
    (the LSH verify stage computes true Jaccard over all shingles).

    Composition notes on top of ``corpus_prep_funnel``'s:
    - pairs are computed over the EXACT keepers (identical copies are
      already collapsed, so the pair stage never wastes shingle work
      on them — and tiny docs below the shingle size, which the
      jaccard stage cannot see, were already handled by the exact
      stage);
    - the drop list reuses cluster_keepers' election window
      (``cluster_drop_list``), so "keeper" means the same thing in
      both report columns and the dedup filter;
    - decontamination stays a per-doc property vs the eval set, so
      flagging the full corpus and anti-joining remains equivalent to
      flagging the filtered set (same argument as the v1 funnel).

    Plan notes: the only nested-loop joins are the 1x1 crossJoins of
    the single-row report aggregates (free by construction; pinned
    no-CartesianProduct in tests/test_plans.py).  The exact-keeper
    sub-plan is referenced by several stages; with the default
    ``materialize_dir=None`` Catalyst recomputes it per reference (~5
    extra column-pruned scans — fine at test scale).  Passing
    ``materialize_dir`` writes the exact-keeper set to parquet ONCE
    (eagerly, at call time — the plans/pipeline.py write-then-reread
    idiom, measured faster than persist() for wide frames) and every
    downstream stage re-reads the written files column-pruned: the
    final plan contains no hash-dedup aggregate at all, only keeper
    scans.  This is the 100 TB form — recomputing the exact-dedup
    shuffle 5x over the full corpus is 5 corpus-wide shuffles for one
    report."""
    from log_aggregation_pipeline_spark.operators.cluster import (
        cluster_drop_list,
    )
    from log_aggregation_pipeline_spark.operators.dedupe import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )

    if pairs not in ("jaccard", "lsh"):
        raise ValueError(f"pairs must be 'jaccard' or 'lsh', got {pairs!r}")
    exact = exact_dedup_rows(docs, text_col=text_col, id_col=id_col)
    if materialize_dir is not None:
        exact.write.mode("overwrite").parquet(materialize_dir)
        exact = docs.sparkSession.read.parquet(materialize_dir)
    if pairs == "lsh":
        pair_df = minhash_lsh_pairs(
            exact, num_hashes=lsh_num_hashes, bands=lsh_bands,
            threshold=jaccard_t, k=jaccard_k, text_col=text_col,
            id_col=id_col,
        )
    else:
        pair_df = ngram_jaccard_pairs(
            exact, k=jaccard_k, threshold=jaccard_t,
            max_shingle_freq=max_shingle_freq, text_col=text_col,
            id_col=id_col,
        )
    drop = cluster_drop_list(exact, pair_df, id_col=id_col, text_col=text_col)
    ev = eval_split(docs, n_eval, id_col)
    flagged = contaminated_docs(
        docs.join(ev.select(id_col), id_col, "left_anti"),
        ev,
        k=decontam_k,
        text_col=text_col,
        id_col=id_col,
    ).select(id_col)
    # ONE annotated pass over the exact keepers (r8): the r7 form
    # referenced the exact-dedup subtree from four independent report
    # aggregates (n_exact, n_neardup, n_quality, clean) on top of the
    # pair stage's own references — ~7 evaluations of the scan + hash
    # + window shuffle.  Flags via LEFT joins (drop list, eval ids
    # and flagged ids are all UNIQUE, so a left join marks without
    # duplicating — row-identical to the anti-join chain) + one
    # conditional aggregate produce identical counts with 4
    # evaluations (2 in the pair stage, 1 in the drop-list election,
    # 1 here).
    ann = (
        quality_features(exact, text_col=text_col)
        .join(drop.withColumn("_dr", F.lit(True)), id_col, "left")
        .join(
            ev.select(id_col).withColumn("_ev", F.lit(True)), id_col, "left"
        )
        .join(flagged.withColumn("_fl", F.lit(True)), id_col, "left")
    )
    is_kept = F.col("_dr").isNull()
    is_qual = is_kept & (F.col("quality_score") >= quality_min)
    is_clean = is_qual & F.col("_ev").isNull() & F.col("_fl").isNull()
    stats = ann.agg(
        F.count("*").alias("n_exact"),
        F.count(F.when(is_kept, 1)).alias("n_neardup"),
        F.count(F.when(is_qual, 1)).alias("n_quality"),
        F.count(F.when(is_clean, 1)).alias("n_clean"),
        F.coalesce(
            F.sum(F.when(is_clean, whitespace_token_count(text_col))), F.lit(0)
        ).cast("long").alias("clean_tokens"),
    )
    report = docs.agg(F.count("*").alias("n_docs")).crossJoin(stats).select(
        "n_docs", "n_exact", "n_neardup", "n_quality", "n_clean",
        "clean_tokens",
    )
    # caller-owned cache lifetime (ADVICE r6): the LSH pair source
    # persists its shingle frame (consumed by the signature AND verify
    # legs WITHIN one action — unpersisting before materialization
    # would recompute it); surface the handle on the report so callers
    # that materialize repeatedly (bench rep loops) can free the
    # blocks instead of accumulating them until session end.
    report.lap_persisted = getattr(pair_df, "lap_persisted", ())
    return report
