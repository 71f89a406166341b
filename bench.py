#!/usr/bin/env python
"""Benchmark harness.

Default mode (driver contract): run the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and print ONE JSON line::

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...}, "queries_median": {...}, "pipeline": {...},
     "sf": ..., "turns_per_sec": ...}

The printed line is kept under ``MAX_CONTRACT_LINE_BYTES`` (r4's
full-columns line overflowed the driver's tail-capture buffer →
``"parsed": null``); per-rep/spread/single-shot evidence goes to
``BENCH/local_last_run.json`` instead (``write_verbose``).

``--scaling`` mode: run the identical end-to-end pipeline at local[8]
and local[32] in fresh subprocesses (one JVM each — two parallelism
levels standing in for N and 4N executors, per BASELINE.md), print both
throughputs and the normalized scaling efficiency, and append the table
to BENCH/SCALING.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time


def _sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def replicate_transcripts(spark, sf_dir: str, factor: int):
    """Deterministic factor-x blow-up: each replica gets its own
    conv_id namespace, preserving the per-conversation skew profile.
    Used for sustained-throughput measurement (amortizes the ~8 s
    JVM/Python-worker cold start that dominates tiny inputs)."""
    from pyspark.sql import functions as F

    from log_aggregation_pipeline_spark.sources.transcripts import (
        transcripts_from_events,
    )

    t = transcripts_from_events(spark, sf_dir)
    return replicate_transcripts_df(spark, t, factor)


def replicate_transcripts_df(spark, t, factor: int):
    from pyspark.sql import functions as F

    # Repartition BEFORE the explode: the small pre-blowup rows shuffle
    # (cheap), then each task explodes its own slice in parallel.
    # Repartitioning after would (a) serialize the 100x explode into
    # the single-split source task and (b) shuffle the full blown-up
    # volume.  A real 100 TB table arrives in thousands of splits and
    # needs neither.
    return (
        t.repartition(spark.sparkContext.defaultParallelism * 2)
        .withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(factor - 1))))
        .withColumn("conv_id", F.concat_ws("_", "conv_id", F.col("rep").cast("string")))
        .drop("rep")
    )


def run_bench(sf_dir: str, cores: int, pipeline_only: bool = False) -> dict:
    from pyspark.sql import functions as F

    from log_aggregation_pipeline_spark.session import get_spark
    from log_aggregation_pipeline_spark.operators.agg import (
        conv_hour_agg,
        date_histogram,
        terms_agg,
    )
    from log_aggregation_pipeline_spark.operators.enrich import enrich
    from log_aggregation_pipeline_spark.operators.order import with_turn_order
    from log_aggregation_pipeline_spark.operators.parse import parse_transcripts
    from log_aggregation_pipeline_spark.operators.route import route_one
    from log_aggregation_pipeline_spark.plans.pipeline import run_pipeline
    from log_aggregation_pipeline_spark.sources.transcripts import (
        transcripts_from_events,
    )

    spark = get_spark(app_name=f"lap-bench-{cores}", cores=cores)
    spark.range(1_000_000).count()  # JVM warmup outside all timings

    timings: dict[str, float] = {}
    single_shot: dict[str, float] = {}
    medians: dict[str, float] = {}
    spreads: dict[str, float] = {}
    reps_log: dict[str, list[float]] = {}

    # per-query timings are best-of-3: this host's phase noise swings a
    # single-shot measurement 2-3x (same op 3.6s/26s back-to-back);
    # noise is strictly additive so min is the honest estimate.  The
    # first iteration still pays that query's codegen (fresh plan), so
    # cold-plan regressions remain visible in the first-run delta.
    # METHODOLOGY NOTE: r1 single-shot, r2-r3 best-of-2, r4+ best-of-3
    # with median/spread/per-rep columns so a cross-round delta is
    # self-adjudicating (a wide spread flags phase noise; a tight
    # spread around a slower median flags a real regression) — the
    # r3-vs-r2 false-alarm was a single best-of-2 sample per round.
    # Compare same-methodology columns across rounds
    # (BENCH/METHODOLOGY.md has the table).
    def _median(ts: list[float]) -> float:
        s = sorted(ts)
        m = len(s) // 2
        return s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2

    # query-PHASE contention tells (r7): the pipeline probes run in the
    # first minutes of the suite, but the query phase runs for many
    # minutes after them — a host phase that starts mid-suite (observed
    # r7: funnel_lsh 48 s in-bench, 6-8 s standalone minutes later)
    # left no in-artifact evidence.  Sample the same out-of-band disk
    # probe every Nth timed query so the verbose record brackets the
    # whole suite; run_bench_quiet pools these with the pipeline probes
    # for its retry criterion.
    query_probe_every = int(
        os.environ.get("SPARK_GRAFT_QUERY_PROBE_EVERY", "10"))
    query_probe_log: list[list] = []  # [preceding-query name, seconds]

    def _query_probe(name: str) -> None:
        scratch = tempfile.mkdtemp(prefix="lap_qprobe_")
        try:
            query_probe_log.append([name, disk_probe(scratch)])
        finally:
            shutil.rmtree(scratch, ignore_errors=True)

    def timed(name, fn, reps: int = 3):
        if reps < 1:
            raise ValueError(f"reps must be >= 1, got {reps}")
        if query_probe_every > 0 and len(timings) % query_probe_every == 0:
            _query_probe(name)
        ts = []
        out = None
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            ts.append(time.perf_counter() - t0)
        single_shot[name] = round(ts[0], 4)
        reps_log[name] = [round(t, 4) for t in ts]
        timings[name] = round(min(ts), 4)
        medians[name] = round(_median(ts), 4)
        spreads[name] = round(max(ts) - min(ts), 4)
        return out

    transcripts = transcripts_from_events(spark, sf_dir)
    n_turns = transcripts.count()

    repeats = int(os.environ.get("SPARK_GRAFT_REPEATS", "3"))
    if repeats < 1:
        raise ValueError(f"SPARK_GRAFT_REPEATS must be >= 1, got {repeats}")

    disk_probes: list[float] = []

    def timed_pipeline(name: str, df, reps: int) -> None:
        # FRESH out_dir per rep: a rerun into the same dir hits the
        # resume path (all hours committed) and measures a no-op —
        # r4's single-shot pipeline_e2e had no spread data and its one
        # sample landed in a host IO phase, which nothing in the
        # artifact could adjudicate (VERDICT r4 #1/#2)
        ts = []
        probes = []
        for _ in range(reps):
            out_dir = tempfile.mkdtemp(prefix=f"lap_bench_{name}_")
            try:
                # out-of-band disk probe alongside EACH rep: a slow rep
                # with a slow probe is host-phase; a slow rep with a
                # fast probe is the code — the artifact alone can now
                # adjudicate (VERDICT r5 next-round #3)
                probes.append(disk_probe(out_dir))
                t0 = time.perf_counter()
                run_pipeline(spark, df, out_dir)
                ts.append(time.perf_counter() - t0)
            finally:
                shutil.rmtree(out_dir, ignore_errors=True)
        disk_probes.extend(probes)
        single_shot[name] = round(ts[0], 4)
        reps_log[name] = [round(t, 4) for t in ts]
        reps_log[f"{name}_disk_probe"] = probes
        timings[name] = round(min(ts), 4)
        medians[name] = round(_median(ts), 4)
        spreads[name] = round(max(ts) - min(ts), 4)

    # headline: full parse -> enrich -> route -> aggregate, incl. sink IO
    timed_pipeline("pipeline_e2e", transcripts, repeats)

    # sustained: replicated input on warm workers — the number to
    # compare against the reference's logs/s claims.  Best-of-N: JVM
    # GC pauses add multi-second noise on this box (measured: same op
    # 3.6 s and 26 s back-to-back); noise is strictly additive, so min
    # is the honest throughput estimate.
    factor = int(os.environ.get("SPARK_GRAFT_REPL", "10"))
    big = replicate_transcripts(spark, sf_dir, factor)
    timed_pipeline("pipeline_sustained", big, repeats)
    n_sustained = n_turns * factor

    if not pipeline_only:
        def noop(df):
            df.write.format("noop").mode("overwrite").save()

        parsed = lambda: parse_transcripts(transcripts_from_events(spark, sf_dir))  # noqa: E731
        timed("parse_level_terms", lambda: noop(terms_agg(parsed(), "level")))
        timed("parse_native_terms", lambda: noop(terms_agg(
            parse_transcripts(transcripts_from_events(spark, sf_dir), impl="native"),
            "level")))
        timed("route_errors", lambda: noop(route_one(parsed(), "errors")))
        timed("agg_conv_hour_errors",
              lambda: noop(conv_hour_agg(route_one(parsed(), "errors"))))
        timed("agg_conv_hour_salted",
              lambda: noop(conv_hour_agg(parsed(), salted=True)))
        timed("enrich_rollup",
              lambda: noop(enrich(parsed()).groupBy("role_kind", "tool_family")
                           .agg(F.count("*").alias("n"))))
        timed("turn_order_window",
              lambda: noop(with_turn_order(
                  transcripts_from_events(spark, sf_dir), prev_text=True)))
        timed("date_histogram_hour",
              lambda: noop(date_histogram(
                  spark.read.parquet(f"{sf_dir}/events.parquet"), "ts", "hour")))

        # query engine + training-data operators
        from log_aggregation_pipeline_spark.operators.dedupe import (
            minhash_lsh_pairs,
        )
        from log_aggregation_pipeline_spark.operators.order import sessionize
        from log_aggregation_pipeline_spark.operators.query import (
            SearchQuery,
            search,
        )
        from log_aggregation_pipeline_spark.operators.similarity import (
            topk_mapinpandas,
        )

        timed("search_page", lambda: noop(search(
            transcripts_from_events(spark, sf_dir),
            SearchQuery(query="code=e", start="2024-01-05 00:00:00",
                        end="2024-01-20 00:00:00", limit=200, offset=50),
            tiebreakers=("conv_id", "turn_idx"))))
        timed("sessionize", lambda: noop(sessionize(
            transcripts_from_events(spark, sf_dir))))
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

        def _free_lap(df) -> None:
            # caller-owned cache lifetime (ADVICE r6): LSH pair plans
            # persist their shingle frame; free it after each rep so
            # the 3-rep loops don't accumulate cached blocks
            for f in getattr(df, "lap_persisted", ()):
                f.unpersist()

        def _minhash_lsh():
            pairs = minhash_lsh_pairs(docs)
            noop(pairs)
            _free_lap(pairs)

        timed("minhash_lsh_pairs", _minhash_lsh)
        from log_aggregation_pipeline_spark.operators.dedupe import (
            dropped_shingle_stats,
            embedding_near_dup_pairs_blocked,
            ngram_jaccard_pairs,
        )

        timed("ngram_jaccard_capped", lambda: noop(
            ngram_jaccard_pairs(docs, max_shingle_freq=1000)))
        # no-silent-caps: report what the frequency cap dropped
        n_sh, n_inst = dropped_shingle_stats(docs, max_shingle_freq=1000)
        print(
            f"[bench] shingle cap 1000 dropped {n_sh} distinct shingles "
            f"({n_inst} doc-instances)", file=sys.stderr,
        )
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        # 1000-vector slice (~500k exact pairs), labeled as such: the
        # operator is exact O(n²) by definition and the full-corpus
        # variant is the driver-checked query; benching a fixed slice
        # keeps the entry comparable across rounds (not a silent cap —
        # the label carries the size)
        emb1k = emb.filter("vec_id < 1000")
        timed("emb_near_dup_blocked_1k", lambda: noop(
            embedding_near_dup_pairs_blocked(emb1k, threshold=0.3)))
        qv = [float(x) for x in emb.first()["embedding"]]
        timed("ann_topk_blas", lambda: noop(topk_mapinpandas(emb, qv, 10)))
        # SemDeDup family over the FULL corpus (cluster scoping is the
        # scale path, so no slice needed) + semantic decontam
        from log_aggregation_pipeline_spark.operators.decontam import (
            eval_split,
            semantic_contaminated,
        )
        from log_aggregation_pipeline_spark.operators.dedupe import (
            semdedup_keep,
            semdedup_pairs,
        )
        from log_aggregation_pipeline_spark.operators.similarity import (
            train_ivf_centroids,
        )

        cent = train_ivf_centroids(emb, n_centroids=8)
        timed("emb_semdedup_pairs", lambda: noop(
            semdedup_pairs(emb, cent, threshold=0.3)))
        timed("emb_semdedup_keep", lambda: noop(
            semdedup_keep(emb, cent, threshold=0.3)))

        # single-scan form: fresh dir per rep (a reused dir would
        # re-read the previous rep's base and skip the write; the
        # write IS part of the measured work)
        def _semdedup_keep_mat():
            mat_root = tempfile.mkdtemp(prefix="lap_bench_sdk_")
            try:
                noop(semdedup_keep(
                    emb, cent, threshold=0.3,
                    materialize_dir=f"{mat_root}/base"))
            finally:
                shutil.rmtree(mat_root, ignore_errors=True)

        timed("emb_semdedup_keep_mat", _semdedup_keep_mat)
        ev = eval_split(emb, 20, id_col="vec_id")
        ev_rows = [
            (r["vec_id"], [float(x) for x in r["embedding"]])
            for r in ev.collect()
        ]
        timed("emb_semantic_decontam", lambda: noop(semantic_contaminated(
            emb.join(ev.select("vec_id"), "vec_id", "left_anti"),
            ev_rows, threshold=0.3)))
        from log_aggregation_pipeline_spark.operators.text_analysis import (
            lm_repetition_features,
        )

        timed("doc_lm_score", lambda: noop(
            lm_repetition_features(docs).select(
                "doc_id", "ttr", "top_tok_frac", "dup_bigram_frac", "lm_score")))
        from log_aggregation_pipeline_spark.operators.cluster import (
            dup_clusters,
        )
        from log_aggregation_pipeline_spark.operators.decontam import (
            contaminated_docs,
        )
        from log_aggregation_pipeline_spark.operators.redact import redact

        from log_aggregation_pipeline_spark.operators.text_analysis import (
            corpus_stats,
        )

        timed("doc_corpus_stats", lambda: noop(corpus_stats(docs)))
        from log_aggregation_pipeline_spark.plans.dataset_card import (
            dataset_card,
        )

        timed("dataset_card", lambda: noop(dataset_card(docs)))
        from log_aggregation_pipeline_spark.operators.text_analysis import (
            gopher_rules,
        )

        timed("doc_gopher_quality", lambda: noop(gopher_rules(docs).select(
            "doc_id", "mean_word_len", "alpha_word_frac", "stop_hits",
            "gopher_pass")))
        from log_aggregation_pipeline_spark.operators.quality_model import (
            score_quality_clf,
        )

        # model-based gate: literal integer weights, projection-only
        timed("doc_quality_clf", lambda: noop(score_quality_clf(docs).select(
            "doc_id", "quality_logit_nano", "clf_pass")))
        from log_aggregation_pipeline_spark.operators.text_analysis import (
            gopher_repetition_rules,
        )

        timed("doc_gopher_repetition", lambda: noop(
            gopher_repetition_rules(docs).select(
                "doc_id", "dup_line_frac", "dup_para_frac", "rep_pass")))
        timed("doc_redact", lambda: noop(redact(docs).select(
            "doc_id", "n_email", "n_ipv4", "n_secret", "redacted")))
        from log_aggregation_pipeline_spark.operators.text_analysis import (
            strip_markup,
        )

        timed("doc_markup_strip", lambda: noop(strip_markup(docs).select(
            "doc_id", "n_tags", "clean_text")))
        from log_aggregation_pipeline_spark.operators.text_analysis import (
            normalize_unicode,
        )

        timed("doc_unicode_nfc", lambda: noop(normalize_unicode(docs).select(
            "doc_id", "text_nfc", "nfc_changed")))
        from log_aggregation_pipeline_spark.operators.asof import (
            range_join_within,
        )

        ev_all = spark.read.parquet(f"{sf_dir}/events.parquet")
        timed("events_range_join_10m", lambda: noop(range_join_within(
            ev_all.filter("event_type = 'purchase'").select("user_id", "event_id", "ts"),
            ev_all.filter("event_type = 'error'").select("user_id", "event_id", "ts"),
        )))
        from log_aggregation_pipeline_spark.operators.decontam import (
            eval_split,
        )

        ev = eval_split(docs, 200)
        train = docs.join(ev.select("doc_id"), "doc_id", "left_anti")
        timed("doc_decontaminate", lambda: noop(
            contaminated_docs(train, ev, k=5)))
        from log_aggregation_pipeline_spark.operators.decontam import (
            eval_contamination_report,
        )

        timed("eval_contamination_report", lambda: noop(
            eval_contamination_report(train, ev, k=5)))
        # includes its jaccard pair-source sub-plan + CC iterations
        timed("doc_dup_clusters", lambda: noop(dup_clusters(
            ngram_jaccard_pairs(docs, max_shingle_freq=1000))))
        from log_aggregation_pipeline_spark.operators.cluster import (
            cluster_keepers,
        )

        # dedup endgame: clusters + quality join + per-cluster argmax
        timed("doc_cluster_keepers", lambda: noop(cluster_keepers(
            docs, ngram_jaccard_pairs(docs, max_shingle_freq=1000))))
        from log_aggregation_pipeline_spark.operators.text_analysis import (
            top_ngrams,
        )
        from log_aggregation_pipeline_spark.plans.corpus_prep import (
            corpus_prep_funnel,
        )

        timed("doc_top_ngrams", lambda: noop(top_ngrams(docs)))
        from log_aggregation_pipeline_spark.operators.text_analysis import (
            quality_percentile,
            vocab_stats,
        )

        timed("doc_quality_percentile", lambda: noop(quality_percentile(docs)))
        timed("doc_vocab_stats", lambda: noop(vocab_stats(docs)))
        from log_aggregation_pipeline_spark.operators.text_analysis import (
            ngram_novelty,
        )

        timed("doc_ngram_novelty", lambda: noop(ngram_novelty(docs)))
        from log_aggregation_pipeline_spark.operators.text_analysis import (
            line_dedup,
            ngram_logppl,
            substring_dedup,
            tfidf_keywords,
        )

        timed("doc_ngram_logppl", lambda: noop(ngram_logppl(docs)))
        timed("doc_tfidf_keywords", lambda: noop(tfidf_keywords(docs)))
        timed("doc_line_dedup", lambda: noop(line_dedup(docs)))
        timed("doc_substring_dedup", lambda: noop(substring_dedup(docs, k=5)))
        from log_aggregation_pipeline_spark.operators.text_analysis import (
            source_overlap,
        )

        timed("doc_source_overlap", lambda: noop(source_overlap(docs)))
        from log_aggregation_pipeline_spark.operators.sampling import (
            corpus_mix,
        )

        from __spark_entry__ import MIX_TOKEN_BUDGET, MIX_WEIGHTS

        timed("corpus_mix_weighted", lambda: noop(
            corpus_mix(docs, MIX_WEIGHTS, MIX_TOKEN_BUDGET)))
        from log_aggregation_pipeline_spark.operators.dedupe import (
            incremental_exact_new,
            minhash_lsh_pairs_cross,
        )

        # incremental dedup: 10% of docs as the "new" batch vs the rest
        # (a fraction split so the shape holds at any sf)
        seen_b = docs.filter("doc_id % 10 != 0")
        new_b = docs.filter("doc_id % 10 = 0")
        timed("doc_incremental_exact_new", lambda: noop(
            incremental_exact_new(new_b, seen_b)))
        def _neardup_cross():
            pairs = minhash_lsh_pairs_cross(new_b, seen_b)
            noop(pairs)
            # caller-owned cache lifetime: free the shingle blocks so
            # the 3-rep loop doesn't accumulate cached frames
            for f in pairs.lap_persisted:
                f.unpersist()

        timed("doc_incremental_neardup_new", _neardup_cross)
        from log_aggregation_pipeline_spark.operators.chunking import (
            chunk_documents,
        )

        # same params as the driver-contract doc_chunks query, so the
        # benched plan is the plan the correctness gate runs
        from __spark_entry__ import CHUNK_OVERLAP, CHUNK_TOKENS

        timed("doc_chunks", lambda: noop(
            chunk_documents(docs, CHUNK_TOKENS, CHUNK_OVERLAP)))
        # composed dedup+quality+decontam funnel — the multi-op plan
        timed("corpus_prep_funnel", lambda: noop(corpus_prep_funnel(docs)))
        from log_aggregation_pipeline_spark.plans.corpus_prep import (
            corpus_prep_funnel_neardup,
        )

        # v2: adds the jaccard-pairs + CC + keeper-election stage
        timed("corpus_prep_funnel_neardup",
              lambda: noop(corpus_prep_funnel_neardup(docs)))
        # LSH pair source — the 100 TB pair stage (banded buckets
        # instead of the exact shingle self-join)
        def _neardup_lsh():
            report = corpus_prep_funnel_neardup(docs, pairs="lsh")
            noop(report)
            _free_lap(report)

        timed("corpus_prep_funnel_neardup_lsh", _neardup_lsh)

        # materialized-keeper form: fresh dir per rep (a reused dir
        # would re-read the previous rep's files and skip the write)
        def _neardup_mat():
            mat_root = tempfile.mkdtemp(prefix="lap_bench_mat_")
            try:
                noop(corpus_prep_funnel_neardup(
                    docs, materialize_dir=f"{mat_root}/keepers"))
            finally:
                shutil.rmtree(mat_root, ignore_errors=True)

        timed("corpus_prep_funnel_neardup_mat", _neardup_mat)

        # the combined 100 TB form: banded LSH pair stage + keeper set
        # materialized once (one corpus shuffle, bounded candidates)
        def _neardup_lsh_mat():
            mat_root = tempfile.mkdtemp(prefix="lap_bench_lshmat_")
            try:
                report = corpus_prep_funnel_neardup(
                    docs, pairs="lsh",
                    materialize_dir=f"{mat_root}/keepers")
                noop(report)
                _free_lap(report)
            finally:
                shutil.rmtree(mat_root, ignore_errors=True)

        timed("corpus_prep_funnel_neardup_lsh_mat", _neardup_lsh_mat)
        # close the bracket: one probe AFTER the last query, so a
        # phase that starts late in the suite still leaves a tell
        _query_probe("_end_of_query_phase")

    spark.stop()
    total = round(sum(timings.values()), 4)
    return {
        "metric": "parse_route_aggregate_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_median": medians,
        # pipeline medians + spreads ON the contract line: the numbers
        # that adjudicate a cross-round headline delta as phase noise
        # (wide spread) vs regression (tight spread, slower median)
        "pipeline": {
            "e2e_median": medians["pipeline_e2e"],
            "e2e_spread": spreads["pipeline_e2e"],
            "sustained_median": medians["pipeline_sustained"],
            "sustained_spread": spreads["pipeline_sustained"],
            "reps": len(reps_log["pipeline_e2e"]),
            # host disk-phase summary over all per-rep probes (per-rep
            # values in the verbose record's *_disk_probe rows): a slow
            # pipeline median with a proportionally slow probe is the
            # host, not the code
            "disk_probe_median_s": round(_median(disk_probes), 4),
            "disk_probe_max_s": round(max(disk_probes), 4),
        },
        "sf": _sf_from_dir(sf_dir),
        "cores": cores,
        "n_turns": n_turns,
        "turns_per_sec": round(n_turns / timings["pipeline_e2e"], 1),
        "turns_per_sec_median": round(n_turns / medians["pipeline_e2e"], 1),
        "n_turns_sustained": n_sustained,
        "turns_per_sec_sustained": round(
            n_sustained / timings["pipeline_sustained"], 1
        ),
        "turns_per_sec_sustained_median": round(
            n_sustained / medians["pipeline_sustained"], 1
        ),
        # verbose per-rep evidence goes to BENCH/local_last_run.json,
        # NOT onto the printed line: r4's full-columns line overflowed
        # the driver's tail-capture buffer and the official artifact
        # recorded "parsed": null (VERDICT r4 #1)
        "_verbose": {
            "queries_single_shot": single_shot,
            "queries_spread": spreads,
            "queries_reps": reps_log,
            # [preceding-query, seconds] samples across the query
            # phase — the in-artifact tell for contention that starts
            # AFTER the pipeline reps (pooled into the quiet-retry
            # criterion by run_bench_quiet)
            "query_phase_disk_probes": query_probe_log,
        },
    }


def run_bench_quiet(sf_dir: str, cores: int, pipeline_only: bool = False) -> dict:
    """VERDICT r6 #4: the official per-round snapshot should come from
    the quiet band.  A run whose own disk probes disagree with each
    other (max > ~3x median) was captured under host contention — r6's
    driver artifact recorded 0.45→0.75 s deltas that were pure
    contention, adjudicated only by the builder's clean rerun.  Retry
    the full suite (SPARK_GRAFT_QUIET_RETRIES, default 1 extra
    attempt) and keep the attempt with the quietest probes; the retry
    count lands in the verbose record, never on the contract line.

    Two independent criteria (r7): the pipeline-rep probes AND the
    query-phase probe samples must each agree with themselves — a
    host phase that starts after the pipeline reps (observed r7)
    otherwise passes the pipeline criterion while the query columns
    are contaminated."""
    retries = int(os.environ.get("SPARK_GRAFT_QUIET_RETRIES", "1"))
    best = None
    best_worst = float("inf")
    attempts = 0
    for _ in range(retries + 1):
        report = run_bench(sf_dir, cores, pipeline_only)
        attempts += 1
        p = report["pipeline"]
        # the query phase gets its own criterion (r7): the pipeline
        # probes run in the suite's first minutes, and a host phase
        # that starts mid-suite (observed r7: funnel_lsh 48 s
        # in-bench, 6-8 s standalone minutes later) left them quiet.
        # A run is kept only when BOTH phases' probes agree with
        # themselves (each max <= ~3x its own median).
        qp = [s for _, s in report.get("_verbose", {}).get(
            "query_phase_disk_probes", [])]
        if qp:
            import statistics

            qp_med, qp_max = statistics.median(qp), max(qp)
        else:
            qp_med = qp_max = 0.0
        worst = max(p["disk_probe_max_s"], qp_max)
        if best is None or worst < best_worst:
            best, best_worst = report, worst
        pipeline_quiet = (
            p["disk_probe_max_s"] <= 3 * max(p["disk_probe_median_s"], 1e-9))
        query_quiet = (not qp) or qp_max <= 3 * max(qp_med, 1e-9)
        if pipeline_quiet and query_quiet:
            best = report
            break
        print(
            f"[bench] contended run (pipeline probe max "
            f"{p['disk_probe_max_s']} s vs median "
            f"{p['disk_probe_median_s']} s; query-phase probe max "
            f"{qp_max} s vs median {qp_med} s) — retrying",
            file=sys.stderr,
        )
    best.setdefault("_verbose", {})["quiet_retry_attempts"] = attempts
    return best


# The driver's stdout tail-capture is empirically 2000 bytes (every
# BENCH_r0*.json records tail_len=2000; r1-r3 lines fit and parsed,
# r4-r5 lines at 2.3-2.8 KB did not -> "parsed": null two rounds
# running, VERDICT r5 #1).  1800 leaves headroom for anything the
# runner appends after our line.
MAX_CONTRACT_LINE_BYTES = 1800

# Keys that must survive every degradation step — the headline
# metrics the driver records.  Everything else is droppable.
_HEADLINE_KEYS = (
    "metric", "value", "unit", "pipeline", "sf", "cores",
    "n_turns", "turns_per_sec", "turns_per_sec_median",
    "n_turns_sustained", "turns_per_sec_sustained",
    "turns_per_sec_sustained_median",
)


def contract_line(report: dict) -> str:
    """The ONE printed JSON line, guaranteed <= MAX_CONTRACT_LINE_BYTES:
    verbose columns stay in the side file, and if the line exceeds the
    budget the per-query maps degrade before the headline metrics do.
    The final fallback re-checks the bound (a headline-only dict that
    somehow overflowed would degrade to metric/value/unit alone) so the
    invariant the driver-contract test pins holds unconditionally."""
    compact = {k: v for k, v in report.items() if k != "_verbose"}
    line = json.dumps(compact)
    if len(line.encode()) <= MAX_CONTRACT_LINE_BYTES:
        return line
    # first degradation step: per-query values at 3dp (ms resolution)
    # on the LINE only — 4dp stays in the verbose record.  ~1 byte per
    # query, which is exactly the margin that keeps the FULL query map
    # on the line as the suite grows (r6 line: 1797/1800 at 4dp; one
    # added query would otherwise start pruning the cheapest entries)
    q = compact.get("queries")
    if isinstance(q, dict):
        compact["queries"] = {k: round(v, 3) for k, v in q.items()}
        line = json.dumps(compact)
        if len(line.encode()) <= MAX_CONTRACT_LINE_BYTES:
            return line
    # symmetric 3dp on the median map before dropping it wholesale —
    # it is the column METHODOLOGY says adjudicates cross-round
    # deltas, so it should survive whenever a few dozen bytes decide
    qm = compact.get("queries_median")
    if isinstance(qm, dict):
        compact["queries_median"] = {k: round(v, 3) for k, v in qm.items()}
        line = json.dumps(compact)
        if len(line.encode()) <= MAX_CONTRACT_LINE_BYTES:
            return line
    compact.pop("queries_median", None)
    # before dropping the per-query map wholesale, prune it to the
    # slowest entries that fit — the expensive queries are the ones a
    # cross-round reader needs on the parsed line (the full map is in
    # BENCH/local_last_run.json either way)
    q = compact.get("queries")
    if isinstance(q, dict) and q:
        by_cost = sorted(q.items(), key=lambda kv: (-kv[1], kv[0]))
        lo, hi = 0, len(by_cost)
        while lo < hi:  # largest prefix of the slowest that fits
            mid = (lo + hi + 1) // 2
            compact["queries"] = dict(sorted(by_cost[:mid]))
            if len(json.dumps(compact).encode()) <= MAX_CONTRACT_LINE_BYTES:
                lo = mid
            else:
                hi = mid - 1
        compact["queries"] = dict(sorted(by_cost[:lo]))
        if lo == 0:
            compact.pop("queries", None)
    line = json.dumps(compact)
    if len(line.encode()) <= MAX_CONTRACT_LINE_BYTES:
        return line
    compact = {k: compact[k] for k in _HEADLINE_KEYS if k in compact}
    line = json.dumps(compact)
    if len(line.encode()) <= MAX_CONTRACT_LINE_BYTES:
        return line
    return json.dumps({k: compact[k] for k in ("metric", "value", "unit")
                       if k in compact})


def write_verbose(report: dict, path: str | None = None) -> str:
    """Full record (incl. per-rep timings) to BENCH/local_last_run.json
    — the self-adjudication evidence the printed line points to."""
    repo = os.path.dirname(os.path.abspath(__file__))
    out = path or os.path.join(repo, "BENCH", "local_last_run.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    full = {k: v for k, v in report.items() if k != "_verbose"}
    full.update(report.get("_verbose", {}))
    with open(out, "w") as f:
        json.dump(full, f, indent=1)
    return out


DISK_PROBE_BYTES = 64 * 1024 * 1024  # 64 MiB — ~0.05-0.3 s in a clean
# phase on this host, multi-second in the IO phases that stamped the
# r3/r5 pipeline numbers; big enough to leave the page cache's write
# combining, small enough to not perturb the rep it adjudicates


def disk_probe(scratch_dir: str, n_bytes: int = DISK_PROBE_BYTES) -> float:
    """Fixed-size out-of-band write+fsync+read on the SAME filesystem
    the pipeline sinks to.  Emitted per rep so a reader of the bench
    artifact can attribute a slow rep to a host IO phase (probe slow
    too) vs the code (probe normal) without builder-side evidence —
    VERDICT r5 next-round #3.  Deterministic non-zero pattern (a
    zero page would be trivially served from cache on some FS).

    The read leg evicts the just-written file from the page cache
    first (posix_fadvise DONTNEED — ADVICE r6 #3): without the
    eviction the read was served from memory and the probe only
    adjudicated write/fsync phases; with it the probe covers both
    directions of the disk path.  The eviction is inside the timed
    window deliberately — it is itself writeback-bound work."""
    path = os.path.join(scratch_dir, "_disk_probe.bin")
    buf = bytes(range(256)) * (1024 * 1024 // 256)  # 1 MiB pattern
    t0 = time.perf_counter()
    with open(path, "wb") as f:
        for _ in range(n_bytes // len(buf)):
            f.write(buf)
        f.flush()
        os.fsync(f.fileno())
    with open(path, "rb") as f:
        if hasattr(os, "posix_fadvise"):  # Linux: drop cached pages
            os.posix_fadvise(f.fileno(), 0, 0, os.POSIX_FADV_DONTNEED)
        while f.read(8 * 1024 * 1024):
            pass
    elapsed = time.perf_counter() - t0
    os.remove(path)
    return round(elapsed, 4)


def _spin(n: int) -> int:
    x = 0
    for i in range(n):
        x ^= (i * 2654435761) & 0xFFFFFFFF
    return x


def cpu_probe(workers: int, n: int = 4_000_000) -> float:
    """Pure-CPU scaling probe: total spin-ops/s across ``workers``
    processes (no memory traffic, no IO).  On an uncontended host the
    per-worker rate is constant in ``workers``; a drop isolates
    hypervisor/steal noise from the job's own bandwidth ceiling —
    attach one probe pair per scaling round so each efficiency number
    carries its host-state evidence."""
    import multiprocessing as mp

    t0 = time.perf_counter()
    with mp.Pool(workers) as p:
        p.map(_spin, [n] * workers)
    return round(workers * n / (time.perf_counter() - t0), 0)


def run_scaling(sf_dir: str, levels: tuple[int, int] | None = None) -> dict:
    """Identical job, two parallelism levels (N and 4N cores), fresh
    JVM each, the whole process tree CPU-pinned per level (see one_run).
    Defaults to local[1] vs local[4] (SPARK_GRAFT_SCALING_LEVELS):
    this host's single memory bus + disk cap the pipeline at ~450-600k
    turns/s, so an 8-core level measures the host's ceiling rather
    than the job — the 1→4 pair keeps both levels under it (full
    analysis in BENCH/SCALING.md).  Input is replicated
    (SPARK_GRAFT_REPL, default 300) so fixed per-run costs (~5 s: job
    scheduling, commit, manifest) amortize — scaling efficiency is an
    asymptotic property of the job, not of JVM startup."""
    repo = os.path.dirname(os.path.abspath(__file__))
    repl = int(os.environ.get("SPARK_GRAFT_REPL", "300"))
    repeats = int(os.environ.get("SPARK_GRAFT_REPEATS", "2"))
    rounds = int(os.environ.get("SPARK_GRAFT_SCALING_ROUNDS", "2"))
    if levels is None:
        lv = os.environ.get("SPARK_GRAFT_SCALING_LEVELS", "1,4")
        levels = tuple(int(x) for x in lv.split(","))  # N, 4N
    # package + run THROUGH spark-submit --py-files (the north rule's
    # literal deployment mechanism), one fresh JVM per run
    zip_path = os.path.join(tempfile.mkdtemp(prefix="lap_dist_"), "lap.zip")
    subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "make_pyfiles.py"), zip_path],
        check=True, capture_output=True,
    )

    pin = os.environ.get("SPARK_GRAFT_PIN", "1") != "0"
    # compute-only ablation (SPARK_GRAFT_COMPUTE_ONLY=1): same DAG,
    # noop sinks — removes the shared-disk term so the pinned 1->4
    # pair measures the job's compute+shuffle scaling alone
    compute_only = os.environ.get("SPARK_GRAFT_COMPUTE_ONLY", "0") == "1"

    def one_run(cores: int) -> dict:
        out_dir = tempfile.mkdtemp(prefix=f"lap_scale_{cores}_")
        try:
            # taskset pins the WHOLE process tree (JVM + GC/JIT/shuffle
            # threads + Python workers) to exactly `cores` cpus — a
            # real N-core executor gets N cores for everything; without
            # the pin, helper threads spill onto idle host cores and
            # inflate the small level's throughput (measured: unpinned
            # local[8] ran ~40% faster than 8 cores' honest work).
            prefix = ["taskset", "-c", f"0-{cores - 1}"] if pin else []
            out = subprocess.run(
                prefix + [
                    "spark-submit", "--master", f"local[{cores}]",
                    "--driver-memory", os.environ.get("SPARK_DRIVER_MEM", "24g"),
                    "--conf", f"spark.sql.shuffle.partitions={cores}",
                    "--conf", "spark.sql.session.timeZone=UTC",
                    "--py-files", zip_path,
                    os.path.join(repo, "scripts", "submit_pipeline.py"),
                    "--events", sf_dir, "--out", os.path.join(out_dir, "out"),
                    "--replicate", str(repl), "--repeats", str(repeats),
                    # north-rule input is an Iceberg transcripts TABLE:
                    # materialize once (untimed) and time the pipeline
                    # from the columnar scan.  Measured (BENCH/
                    # SCALING.md round-2 A/B): this config scales best;
                    # native-JVM parse and uncompressed sinks both
                    # saturate single-host memory/disk bandwidth harder
                    # at 4N (0.52 / 0.30 vs 0.78 efficiency).
                    "--materialize-input",
                ]
                + (["--compute-only"] if compute_only else []),
                capture_output=True, text=True, check=True, cwd=repo,
            )
            return json.loads(
                [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
            )
        finally:
            shutil.rmtree(out_dir, ignore_errors=True)

    # INTERLEAVE the levels within each round: this host's throughput
    # drifts 2-3x over minutes, so measuring level A's runs in one
    # phase and B's in another manufactures fake (anti-)scaling.  Each
    # round yields its own adjacent-in-time (lo, hi) pair and
    # efficiency; the MEDIAN across rounds is the headline (the judge-
    # requested distribution), with best-per-level kept as the
    # noise-floor estimate (noise is strictly additive).
    lo, hi = levels
    per_round: list[dict] = []
    best: dict[int, dict] = {}
    for i in range(rounds):
        pair = {}
        probes = {}
        for cores in levels:
            probes[cores] = cpu_probe(cores)  # host-state evidence
            r = one_run(cores)
            pair[cores] = r
            if (
                cores not in best
                or r["turns_per_sec"] > best[cores]["turns_per_sec"]
            ):
                best[cores] = r
        eff_i = round(
            (pair[hi]["turns_per_sec"] / pair[lo]["turns_per_sec"]) / (hi / lo), 3
        )
        probe_eff = round(probes[hi] / probes[lo] / (hi / lo), 3)
        per_round.append(
            {
                "round": i + 1,
                f"local{lo}": pair[lo]["turns_per_sec"],
                f"local{hi}": pair[hi]["turns_per_sec"],
                "efficiency": eff_i,
                "cpu_probe_eff": probe_eff,
            }
        )
        print(f"[scaling] round {i+1}: {per_round[-1]}", file=sys.stderr)
    effs = sorted(p["efficiency"] for p in per_round)
    median_eff = effs[len(effs) // 2] if len(effs) % 2 else round(
        (effs[len(effs) // 2 - 1] + effs[len(effs) // 2]) / 2, 3
    )
    thr_lo = best[lo]["turns_per_sec"]
    thr_hi = best[hi]["turns_per_sec"]
    eff = round((thr_hi / thr_lo) / (hi / lo), 3)
    report = {
        "mode": "compute_only" if compute_only else "full_pipeline",
        "sf": _sf_from_dir(sf_dir),
        "n_turns": best[lo]["n_turns"],
        f"turns_per_sec_local{lo}": thr_lo,
        f"turns_per_sec_local{hi}": thr_hi,
        "speedup": round(thr_hi / thr_lo, 3),
        "cores_ratio": hi / lo,
        "scaling_efficiency": eff,
        "median_efficiency": median_eff,
        "rounds": per_round,
    }
    os.makedirs(os.path.join(os.path.dirname(__file__), "BENCH"), exist_ok=True)
    md = os.path.join(os.path.dirname(__file__), "BENCH", "SCALING.md")
    with open(md, "a") as f:
        f.write(
            f"\n| {report['mode']} | sf={report['sf']} | {report['n_turns']} turns "
            f"| local[{lo}]: {thr_lo} turns/s | local[{hi}]: {thr_hi} turns/s "
            f"| best-pair efficiency {eff} "
            f"| median of {len(per_round)} interleaved rounds: {median_eff} |\n"
        )
        for p in per_round:
            f.write(
                f"|   round {p['round']} | local[{lo}] {p[f'local{lo}']} "
                f"| local[{hi}] {p[f'local{hi}']} "
                f"| efficiency {p['efficiency']} "
                f"| cpu-probe eff {p.get('cpu_probe_eff', '-')} |\n"
            )
    return report


def run_scaling_multijvm(
    sf_dir: str, cores_per_exec: int = 2, n_exec: int = 4
) -> dict:
    """N vs 4N EXECUTORS: 1 JVM (local[c]) over the full input vs
    ``n_exec`` CONCURRENT JVMs (local[c] each) over disjoint conv_id
    shards — the closest single-host analog of adding executors, since
    each executor keeps its own heap/GC/Python workers exactly as on a
    real cluster.  Sharding by conv_id keeps every per-conv result
    exact per shard (routing is row-local; aggregates key on conv_id).
    Wall time of the 4-executor level = the slowest executor."""
    repo = os.path.dirname(os.path.abspath(__file__))
    repl = int(os.environ.get("SPARK_GRAFT_REPL", "300"))
    zip_path = os.path.join(tempfile.mkdtemp(prefix="lap_dist_"), "lap.zip")
    subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "make_pyfiles.py"), zip_path],
        check=True, capture_output=True,
    )

    def submit(cores: int, out_dir: str, shard: str | None, cpu_base: int = 0):
        # each executor JVM pinned to its OWN disjoint core set — the
        # faithful emulation of adding executors (a cluster executor
        # never shares cores with its peers); memory bus/disk remain
        # shared, which is exactly the single-host ceiling this mode
        # quantifies.
        cmd = [
            "taskset", "-c", f"{cpu_base}-{cpu_base + cores - 1}",
            "spark-submit", "--master", f"local[{cores}]",
            "--driver-memory", os.environ.get("SPARK_DRIVER_MEM", "12g"),
            "--conf", f"spark.sql.shuffle.partitions={cores}",
            "--conf", "spark.sql.session.timeZone=UTC",
            "--py-files", zip_path,
            os.path.join(repo, "scripts", "submit_pipeline.py"),
            "--events", sf_dir, "--out", out_dir, "--replicate", str(repl),
        ]
        if shard:
            cmd += ["--shard", shard]
        return subprocess.Popen(cmd, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
                                text=True, cwd=repo)

    def finish(procs):
        outs = []
        for p in procs:
            stdout, _ = p.communicate()
            if p.returncode != 0:
                raise RuntimeError("executor failed")
            outs.append(json.loads(
                [l for l in stdout.splitlines() if l.startswith("{")][-1]))
        return outs

    root = tempfile.mkdtemp(prefix="lap_mjvm_")
    try:
        # level A: one executor, full input (startup excluded by using
        # the in-JVM wall the job reports, which excludes session init)
        t0 = time.perf_counter()
        [a] = finish([submit(cores_per_exec, os.path.join(root, "a"), None)])
        n_total = a["n_turns"]
        thr_1 = a["turns_per_sec"]
        # level B: n_exec concurrent executors, one shard each
        t0 = time.perf_counter()
        procs = [
            submit(cores_per_exec, os.path.join(root, f"b{i}"),
                   f"{i}/{n_exec}", cpu_base=i * cores_per_exec)
            for i in range(n_exec)
        ]
        outs = finish(procs)
        wall = max(o["wall_sec"] for o in outs)
        n_b = sum(o["n_turns"] for o in outs)
        thr_4 = round(n_b / wall, 1)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    eff = round((thr_4 / thr_1) / n_exec, 3)
    report = {
        "mode": "multijvm_executors",
        "n_turns": n_total,
        "cores_per_executor": cores_per_exec,
        f"turns_per_sec_1x": thr_1,
        f"turns_per_sec_{n_exec}x": thr_4,
        "speedup": round(thr_4 / thr_1, 3),
        "executor_ratio": n_exec,
        "scaling_efficiency": eff,
    }
    md = os.path.join(repo, "BENCH", "SCALING.md")
    os.makedirs(os.path.dirname(md), exist_ok=True)
    with open(md, "a") as f:
        f.write(
            f"\n| executors 1→{n_exec} (local[{cores_per_exec}] each) "
            f"| {n_total} turns | 1x: {thr_1} turns/s | {n_exec}x: {thr_4} turns/s "
            f"| speedup {report['speedup']}x | efficiency {eff} |\n"
        )
    return report


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cores", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--pipeline-only", action="store_true")
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--scaling-multijvm", action="store_true")
    args = ap.parse_args()
    if args.scaling_multijvm:
        print(json.dumps(run_scaling_multijvm(args.sf_dir)))
    elif args.scaling:
        print(json.dumps(run_scaling(args.sf_dir)))
    else:
        report = run_bench_quiet(args.sf_dir, args.cores, args.pipeline_only)
        # pipeline-only (smoke) runs get their own verbose file so a
        # quick check can never clobber the round's full-suite record
        path = write_verbose(
            report,
            path=(os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "BENCH", "local_last_pipeline_only.json",
            ) if args.pipeline_only else None),
        )
        print(f"[bench] verbose record: {path}", file=sys.stderr)
        print(contract_line(report))


if __name__ == "__main__":
    main()
