#!/usr/bin/env python
"""Per-query isolation harness for the r8 optimization round.

NOT the driver contract (bench.py is frozen for measurement): this
file exists so individual queries can be timed with the noop sink and
their ``explain("formatted")`` captured, per guide §1 (measure first).

Usage::

    python bench_extra.py --queries minhash_lsh_pairs doc_dup_clusters
    python bench_extra.py --explain-dir plans/r08 --suffix before
    python bench_extra.py            # all queries, timing only

Per-query timings are best-of-N (default 3) with all reps printed, in
the same session shape as bench.py (get_spark, same cores/sf envs).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def build_queries(spark, sf_dir: str):
    """name -> zero-arg callable that EXECUTES the query (noop sink).

    Mirrors bench.py's constructions exactly; also returns a map of
    name -> zero-arg callable returning the DataFrame (for explain),
    None for queries whose run path is not a single frame."""
    from pyspark.sql import functions as F

    from log_aggregation_pipeline_spark.operators.agg import (
        conv_hour_agg,
        date_histogram,
        terms_agg,
    )
    from log_aggregation_pipeline_spark.operators.enrich import enrich
    from log_aggregation_pipeline_spark.operators.order import (
        sessionize,
        with_turn_order,
    )
    from log_aggregation_pipeline_spark.operators.parse import parse_transcripts
    from log_aggregation_pipeline_spark.operators.route import route_one
    from log_aggregation_pipeline_spark.operators.query import (
        SearchQuery,
        search,
    )
    from log_aggregation_pipeline_spark.sources.transcripts import (
        transcripts_from_events,
    )
    from log_aggregation_pipeline_spark.operators.dedupe import (
        embedding_near_dup_pairs_blocked,
        incremental_exact_new,
        minhash_lsh_pairs,
        minhash_lsh_pairs_cross,
        ngram_jaccard_pairs,
        semdedup_keep,
        semdedup_pairs,
    )
    from log_aggregation_pipeline_spark.operators.cluster import (
        cluster_keepers,
        dup_clusters,
    )
    from log_aggregation_pipeline_spark.operators.decontam import (
        contaminated_docs,
        eval_contamination_report,
        eval_split,
        semantic_contaminated,
    )
    from log_aggregation_pipeline_spark.operators.similarity import (
        topk_mapinpandas,
        train_ivf_centroids,
    )
    from log_aggregation_pipeline_spark.operators.text_analysis import (
        corpus_stats,
        gopher_repetition_rules,
        gopher_rules,
        lm_repetition_features,
        line_dedup,
        ngram_logppl,
        ngram_novelty,
        normalize_unicode,
        quality_percentile,
        source_overlap,
        strip_markup,
        substring_dedup,
        tfidf_keywords,
        top_ngrams,
        vocab_stats,
    )
    from log_aggregation_pipeline_spark.operators.quality_model import (
        score_quality_clf,
    )
    from log_aggregation_pipeline_spark.operators.redact import redact
    from log_aggregation_pipeline_spark.operators.sampling import corpus_mix
    from log_aggregation_pipeline_spark.operators.asof import range_join_within
    from log_aggregation_pipeline_spark.operators.chunking import chunk_documents
    from log_aggregation_pipeline_spark.plans.corpus_prep import (
        corpus_prep_funnel,
        corpus_prep_funnel_neardup,
    )
    from log_aggregation_pipeline_spark.plans.dataset_card import dataset_card
    from __spark_entry__ import (
        CHUNK_OVERLAP,
        CHUNK_TOKENS,
        MIX_TOKEN_BUDGET,
        MIX_WEIGHTS,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    ev_all = spark.read.parquet(f"{sf_dir}/events.parquet")
    transcripts = transcripts_from_events(spark, sf_dir)
    parsed = lambda: parse_transcripts(transcripts_from_events(spark, sf_dir))  # noqa: E731
    cent = train_ivf_centroids(emb, n_centroids=8)
    emb1k = emb.filter("vec_id < 1000")
    qv = [float(x) for x in emb.first()["embedding"]]
    evs = eval_split(emb, 20, id_col="vec_id")
    ev_rows = [
        (r["vec_id"], [float(x) for x in r["embedding"]]) for r in evs.collect()
    ]
    evd = eval_split(docs, 200)
    train = docs.join(evd.select("doc_id"), "doc_id", "left_anti")
    seen_b = docs.filter("doc_id % 10 != 0")
    new_b = docs.filter("doc_id % 10 = 0")

    def _free_lap(df) -> None:
        for f in getattr(df, "lap_persisted", ()):
            f.unpersist()

    frames = {
        "parse_level_terms": lambda: terms_agg(parsed(), "level"),
        "parse_native_terms": lambda: terms_agg(
            parse_transcripts(transcripts_from_events(spark, sf_dir), impl="native"),
            "level"),
        "route_errors": lambda: route_one(parsed(), "errors"),
        "agg_conv_hour_errors": lambda: conv_hour_agg(route_one(parsed(), "errors")),
        "agg_conv_hour_salted": lambda: conv_hour_agg(parsed(), salted=True),
        "enrich_rollup": lambda: enrich(parsed()).groupBy(
            "role_kind", "tool_family").agg(F.count("*").alias("n")),
        "turn_order_window": lambda: with_turn_order(
            transcripts_from_events(spark, sf_dir), prev_text=True),
        "date_histogram_hour": lambda: date_histogram(ev_all, "ts", "hour"),
        "search_page": lambda: search(
            transcripts_from_events(spark, sf_dir),
            SearchQuery(query="code=e", start="2024-01-05 00:00:00",
                        end="2024-01-20 00:00:00", limit=200, offset=50),
            tiebreakers=("conv_id", "turn_idx")),
        "sessionize": lambda: sessionize(transcripts_from_events(spark, sf_dir)),
        "ngram_jaccard_capped": lambda: ngram_jaccard_pairs(
            docs, max_shingle_freq=1000),
        "emb_near_dup_blocked_1k": lambda: embedding_near_dup_pairs_blocked(
            emb1k, threshold=0.3),
        "ann_topk_blas": lambda: topk_mapinpandas(emb, qv, 10),
        "emb_semdedup_pairs": lambda: semdedup_pairs(emb, cent, threshold=0.3),
        "emb_semdedup_keep": lambda: semdedup_keep(emb, cent, threshold=0.3),
        "emb_semantic_decontam": lambda: semantic_contaminated(
            emb.join(evs.select("vec_id"), "vec_id", "left_anti"),
            ev_rows, threshold=0.3),
        "doc_lm_score": lambda: lm_repetition_features(docs).select(
            "doc_id", "ttr", "top_tok_frac", "dup_bigram_frac", "lm_score"),
        "doc_corpus_stats": lambda: corpus_stats(docs),
        "dataset_card": lambda: dataset_card(docs),
        "doc_gopher_quality": lambda: gopher_rules(docs).select(
            "doc_id", "mean_word_len", "alpha_word_frac", "stop_hits",
            "gopher_pass"),
        "doc_quality_clf": lambda: score_quality_clf(docs).select(
            "doc_id", "quality_logit_nano", "clf_pass"),
        "doc_gopher_repetition": lambda: gopher_repetition_rules(docs).select(
            "doc_id", "dup_line_frac", "dup_para_frac", "rep_pass"),
        "doc_redact": lambda: redact(docs).select(
            "doc_id", "n_email", "n_ipv4", "n_secret", "redacted"),
        "doc_markup_strip": lambda: strip_markup(docs).select(
            "doc_id", "n_tags", "clean_text"),
        "doc_unicode_nfc": lambda: normalize_unicode(docs).select(
            "doc_id", "text_nfc", "nfc_changed"),
        "events_range_join_10m": lambda: range_join_within(
            ev_all.filter("event_type = 'purchase'").select(
                "user_id", "event_id", "ts"),
            ev_all.filter("event_type = 'error'").select(
                "user_id", "event_id", "ts")),
        "doc_decontaminate": lambda: contaminated_docs(train, evd, k=5),
        "eval_contamination_report": lambda: eval_contamination_report(
            train, evd, k=5),
        "doc_dup_clusters": lambda: dup_clusters(
            ngram_jaccard_pairs(docs, max_shingle_freq=1000)),
        "doc_cluster_keepers": lambda: cluster_keepers(
            docs, ngram_jaccard_pairs(docs, max_shingle_freq=1000)),
        "doc_top_ngrams": lambda: top_ngrams(docs),
        "doc_quality_percentile": lambda: quality_percentile(docs),
        "doc_vocab_stats": lambda: vocab_stats(docs),
        "doc_ngram_novelty": lambda: ngram_novelty(docs),
        "doc_ngram_logppl": lambda: ngram_logppl(docs),
        "doc_tfidf_keywords": lambda: tfidf_keywords(docs),
        "doc_line_dedup": lambda: line_dedup(docs),
        "doc_substring_dedup": lambda: substring_dedup(docs, k=5),
        "doc_source_overlap": lambda: source_overlap(docs),
        "corpus_mix_weighted": lambda: corpus_mix(
            docs, MIX_WEIGHTS, MIX_TOKEN_BUDGET),
        "doc_incremental_exact_new": lambda: incremental_exact_new(
            new_b, seen_b),
        "doc_chunks": lambda: chunk_documents(docs, CHUNK_TOKENS, CHUNK_OVERLAP),
        "corpus_prep_funnel": lambda: corpus_prep_funnel(docs),
        "corpus_prep_funnel_neardup": lambda: corpus_prep_funnel_neardup(docs),
    }

    # queries whose bench form needs explicit cache-freeing or scratch
    # dirs: runner does the full cycle; frame builder still works for
    # explain (caches freed right after)
    def run_minhash():
        pairs = minhash_lsh_pairs(docs)
        noop(pairs)
        _free_lap(pairs)

    def run_neardup_cross():
        pairs = minhash_lsh_pairs_cross(new_b, seen_b)
        noop(pairs)
        _free_lap(pairs)

    def run_funnel_lsh():
        report = corpus_prep_funnel_neardup(docs, pairs="lsh")
        noop(report)
        _free_lap(report)

    def run_funnel_mat():
        mat_root = tempfile.mkdtemp(prefix="lap_bx_mat_")
        try:
            noop(corpus_prep_funnel_neardup(
                docs, materialize_dir=f"{mat_root}/keepers"))
        finally:
            shutil.rmtree(mat_root, ignore_errors=True)

    def run_funnel_lsh_mat():
        mat_root = tempfile.mkdtemp(prefix="lap_bx_lshmat_")
        try:
            report = corpus_prep_funnel_neardup(
                docs, pairs="lsh", materialize_dir=f"{mat_root}/keepers")
            noop(report)
            _free_lap(report)
        finally:
            shutil.rmtree(mat_root, ignore_errors=True)

    def run_semdedup_keep_mat():
        mat_root = tempfile.mkdtemp(prefix="lap_bx_sdk_")
        try:
            noop(semdedup_keep(
                emb, cent, threshold=0.3, materialize_dir=f"{mat_root}/base"))
        finally:
            shutil.rmtree(mat_root, ignore_errors=True)

    runners = {name: (lambda fn=fn: noop(fn())) for name, fn in frames.items()}
    runners["minhash_lsh_pairs"] = run_minhash
    runners["doc_incremental_neardup_new"] = run_neardup_cross
    runners["corpus_prep_funnel_neardup_lsh"] = run_funnel_lsh
    runners["corpus_prep_funnel_neardup_mat"] = run_funnel_mat
    runners["corpus_prep_funnel_neardup_lsh_mat"] = run_funnel_lsh_mat
    runners["emb_semdedup_keep_mat"] = run_semdedup_keep_mat

    def frame_minhash():
        return minhash_lsh_pairs(docs)

    def frame_neardup_cross():
        return minhash_lsh_pairs_cross(new_b, seen_b)

    def frame_funnel_lsh():
        return corpus_prep_funnel_neardup(docs, pairs="lsh")

    frames["minhash_lsh_pairs"] = frame_minhash
    frames["doc_incremental_neardup_new"] = frame_neardup_cross
    frames["corpus_prep_funnel_neardup_lsh"] = frame_funnel_lsh
    return runners, frames, _free_lap


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cores", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--explain-dir", default=None,
                    help="write <query>_<suffix>.txt explain files here")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--queries", nargs="*", default=None)
    args = ap.parse_args()

    from log_aggregation_pipeline_spark.session import get_spark

    spark = get_spark(app_name="lap-bench-extra", cores=args.cores)
    spark.range(1_000_000).count()
    runners, frames, _free_lap = build_queries(spark, args.sf_dir)
    names = args.queries or list(runners)
    unknown = [n for n in names if n not in runners]
    if unknown:
        sys.exit(f"unknown queries: {unknown}; known: {sorted(runners)}")

    if args.explain_dir:
        os.makedirs(args.explain_dir, exist_ok=True)

    out: dict[str, list[float]] = {}
    for name in names:
        if args.explain_dir and name in frames:
            df = frames[name]()
            path = os.path.join(args.explain_dir, f"{name}_{args.suffix}.txt")
            with open(path, "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
            _free_lap(df)
        spark.sparkContext.setJobDescription(name)
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            runners[name]()
            ts.append(round(time.perf_counter() - t0, 4))
        spark.sparkContext.setJobDescription(None)
        out[name] = ts
        print(f"{name}: min={min(ts):.3f} reps={ts}", flush=True)
    print(json.dumps({k: min(v) for k, v in out.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
