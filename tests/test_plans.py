"""Physical-plan regression tests (SURVEY.md §4).

The scale contract is encoded here: filters/projection push to the
parquet scan, small dims broadcast, aggregates partial-combine before
the exchange, top-k plans as TakeOrderedAndProject, and unreferenced
expensive stages (pandas-UDF parse, window) are pruned away.  If a
refactor breaks one of these, a 100 TB run gets quietly slower — these
tests make that loud."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from log_aggregation_pipeline_spark.operators.agg import conv_hour_agg, terms_agg
from log_aggregation_pipeline_spark.operators.enrich import enrich
from log_aggregation_pipeline_spark.operators.parse import parse_transcripts
from log_aggregation_pipeline_spark.operators.similarity import brute_topk
from log_aggregation_pipeline_spark.sources.transcripts import transcripts_from_events

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def parsed(spark):
    return enrich(parse_transcripts(transcripts_from_events(spark, SF)))


def test_filter_pushdown_to_parquet(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    df = ev.filter(
        F.col("ts").between("2024-01-05", "2024-01-06")
        & (F.col("event_type") == "error")
    ).select("event_id")
    p = plan_of(df)
    assert "PushedFilters: [" in p
    assert "event_type" in p.split("PushedFilters:")[1].split("]")[0]


def test_column_pruning_reaches_scan(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet").select("event_id", "ts")
    read_schema = plan_of(ev).split("ReadSchema:")[1]
    assert "props" not in read_schema and "value" not in read_schema


def test_enrich_is_broadcast(parsed):
    p = plan_of(parsed)
    assert p.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in p


def test_agg_has_partial_combine(parsed):
    p = plan_of(conv_hour_agg(parsed))
    assert "partial_count" in p and "partial_min" in p
    # exactly one data exchange for the aggregate itself
    assert p.count("Exchange hashpartitioning") <= 2  # window + agg


def test_unused_parse_stage_is_pruned(spark, parsed):
    """Catalyst removes the Arrow parse UDF when its columns are
    unreferenced — aggregating only (conv_id, ts) must not pay for
    the regex stage."""
    p = plan_of(conv_hour_agg(parsed))
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p


def test_parse_stage_present_when_referenced(parsed):
    p = plan_of(terms_agg(parsed, "level"))
    assert "ArrowEvalPython" in p  # vectorized (Arrow), not row Python
    assert "BatchEvalPython" not in p


def test_topk_is_take_ordered(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = [float(x) for x in emb.first()["embedding"]]
    assert "TakeOrderedAndProject" in plan_of(brute_topk(emb, q, 10))


def test_no_cartesian_anywhere_in_pipeline(parsed):
    assert "CartesianProduct" not in plan_of(conv_hour_agg(parsed))


def test_blocked_near_dup_has_no_nested_loop(spark):
    """The driver-wired exact near-dup must plan as an equi-join on
    block-pair keys — a BroadcastNestedLoopJoin (the all-pairs plan)
    broadcasts a whole side and dies at corpus scale."""
    from log_aggregation_pipeline_spark.operators.dedupe import (
        embedding_near_dup_pairs_blocked,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    p = plan_of(embedding_near_dup_pairs_blocked(emb, threshold=0.3))
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p


def test_capped_jaccard_has_no_nested_loop(spark):
    from log_aggregation_pipeline_spark.operators.dedupe import ngram_jaccard_pairs

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = plan_of(ngram_jaccard_pairs(docs, max_shingle_freq=1000))
    assert "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p


def test_ivf_at_ingest_prunes_partitions(spark, tmp_path):
    """ivf_write partitions by cluster; the probe query's scan must
    show a PartitionFilters entry on cluster (directory-level pruning —
    nprobe/n_centroids of the bytes read, the IVF scale contract)."""
    from log_aggregation_pipeline_spark.operators.similarity import (
        ivf_topk_pruned,
        ivf_write,
        train_ivf_centroids,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cent = train_ivf_centroids(emb, n_centroids=8)
    path = str(tmp_path / "emb_ivf")
    ivf_write(emb, cent, path)
    q = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]
    plan = plan_of(ivf_topk_pruned(spark, path, q, cent, k=10, nprobe=4))
    pf = plan.split("PartitionFilters:")[1].split("]")[0]
    assert "cluster" in pf


def test_shingle_explode_has_no_inlined_hof_filter(spark):
    """explode (non-outer) pushes a vacuous non-empty filter below the
    shingle projection, inlining the whole nested-HOF expression into
    the Filter operator (evaluated 2 extra times per row outside
    codegen — measured 60-75 s vs 4-6 s cold at sf0.1).  Pin that no
    Filter condition contains a HOF after the explode_outer fix."""
    from log_aggregation_pipeline_spark.operators.dedupe import (
        ngram_jaccard_pairs,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = plan_of(ngram_jaccard_pairs(docs, max_shingle_freq=1000))
    bad = [l for l in p.splitlines()
           if "Filter" in l and "transform(" in l]
    assert bad == []


def test_decontam_broadcasts_eval_side(spark):
    """The 100 TB shape: eval shingles broadcast, train side scans with
    NO shuffle exchange feeding the join (a shuffled train side would
    move the whole corpus)."""
    from log_aggregation_pipeline_spark.operators.decontam import (
        contaminated_docs,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    ev = docs.limit(10)
    p = plan_of(contaminated_docs(docs, ev, k=5))
    assert "BroadcastHashJoin" in p
    # the ONLY shuffle is the final per-doc count (keyed on _id);
    # a shingle-keyed exchange would mean the corpus side shuffles
    ex_lines = [l for l in p.splitlines() if "Exchange hashpartitioning" in l]
    assert len(ex_lines) == 1 and "_id" in ex_lines[0]


def test_lm_repetition_is_projection(spark):
    """The repetition scorer is pure per-row HOF expressions — any
    Exchange/HashAggregate would mean a stray shuffle crept in."""
    from log_aggregation_pipeline_spark.operators.text_analysis import (
        lm_repetition_features,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = plan_of(lm_repetition_features(docs).select("doc_id", "lm_score"))
    assert "Exchange" not in p
    assert "HashAggregate" not in p


def test_minhash_signature_is_projection(spark):
    """The HOF signature path must not shuffle: no exchange between the
    scan and the signature projection (the old explode+32-agg form cost
    a shuffle plus ~12 s of cold codegen)."""
    from log_aggregation_pipeline_spark.operators.dedupe import minhash_signatures

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = plan_of(minhash_signatures(docs, 32))
    assert "Exchange" not in p
    assert "HashAggregate" not in p


def test_chunking_is_shuffle_free(spark):
    from log_aggregation_pipeline_spark.operators.chunking import (
        chunk_documents,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = plan_of(chunk_documents(docs))
    assert "Exchange" not in p  # projection + generate only


def test_trending_terms_single_count_shuffle(spark):
    """One aggregation exchange on (bucket, term) + the two window
    exchanges — no extra shuffles creep in."""
    from log_aggregation_pipeline_spark.operators.agg import trending_terms

    ev = spark.read.parquet(f"{SF}/events.parquet").withColumn(
        "error_code", F.col("event_type")
    )
    p = plan_of(trending_terms(ev, "error_code"))
    n_hash_exchanges = sum(
        1 for l in p.splitlines() if "Exchange hashpartitioning" in l
    )
    assert n_hash_exchanges <= 3
    assert "Exchange SinglePartition" not in p  # no global window


def test_gopher_rules_is_projection(spark):
    """The Gopher quality gates are per-row HOF/regexp expressions —
    any Exchange/HashAggregate would mean a stray shuffle crept in."""
    from log_aggregation_pipeline_spark.operators.text_analysis import (
        gopher_rules,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = plan_of(gopher_rules(docs))
    assert "Exchange" not in p
    assert "HashAggregate" not in p


def test_neardup_funnel_no_cartesian(spark):
    """The v2 funnel's only nested-loop joins are the 1x1 crossJoins
    of single-row report aggregates; a CartesianProduct would mean a
    data-sized join lost its equi-key."""
    from log_aggregation_pipeline_spark.plans.corpus_prep import (
        corpus_prep_funnel_neardup,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = plan_of(corpus_prep_funnel_neardup(docs))
    assert "CartesianProduct" not in p


def test_neardup_funnel_lsh_pair_source(spark):
    """pairs="lsh" swaps the exact shingle self-join for banded
    MinHash buckets + exact verify (the 100 TB pair stage).  At this
    corpus's qualifying-pair floor (jaccard >= 0.8) the 64x16-band
    miss probability is ~2e-4, so the funnel report must equal the
    uncapped exact form row-for-row; the plan must stay free of
    cartesian products."""
    import pytest

    from log_aggregation_pipeline_spark.plans.corpus_prep import (
        corpus_prep_funnel_neardup,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    lsh = corpus_prep_funnel_neardup(docs, pairs="lsh")
    assert "CartesianProduct" not in plan_of(lsh)
    exact = corpus_prep_funnel_neardup(docs, max_shingle_freq=None)
    assert lsh.collect() == exact.collect()
    with pytest.raises(ValueError, match="pairs"):
        corpus_prep_funnel_neardup(docs, pairs="bogus")


def test_neardup_funnel_materialized_single_keeper_scan(spark):
    """materialize_dir kills the 5x exact-keeper sub-plan recompute:
    the keeper set is written once at call time and every downstream
    stage re-reads the written parquet, so the FINAL plan contains no
    content-hash dedup window at all — only keeper-file scans — and
    the report matches the recomputed form exactly."""
    import shutil
    import tempfile

    from log_aggregation_pipeline_spark.plans.corpus_prep import (
        corpus_prep_funnel_neardup,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    # short path: Spark truncates FileScan Location strings, and the
    # marker below must survive into the printed plan
    root = tempfile.mkdtemp(prefix="lap_mat_")
    try:
        mat = f"{root}/keepers"
        rep_mat = corpus_prep_funnel_neardup(docs, materialize_dir=mat)
        p = plan_of(rep_mat)
        # the exact-dedup stage is a row_number window over the content
        # hash whose marker column is "_rn" (unique to exact_dedup_rows);
        # with the keeper set materialized that window ran eagerly at
        # call time and must be absent from the returned plan
        recomputed = plan_of(corpus_prep_funnel_neardup(docs))
        assert recomputed.count("_rn#") >= 2  # recomputed per reference
        assert "_rn#" not in p
        assert "CartesianProduct" not in p
        assert "/keepers" in p  # downstream stages scan the written files
        assert rep_mat.collect() == corpus_prep_funnel_neardup(docs).collect()
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_dataset_card_single_scan(spark):
    """The card's majority language is folded inside the one
    per-source aggregate — a second (source, lang) aggregate would
    re-evaluate the whole regexp/HOF projection on a second scan."""
    from log_aggregation_pipeline_spark.plans.dataset_card import (
        dataset_card,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = plan_of(dataset_card(docs))
    assert p.count("Scan parquet") == 1


def test_corpus_mix_single_source_shuffle(spark):
    """The mixer is ONE shuffle keyed on source (the cumsum window);
    the target CASE chain is literal so nothing else exchanges."""
    from log_aggregation_pipeline_spark.operators.sampling import corpus_mix

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = plan_of(corpus_mix(docs, {"src0": 2.0, "src1": 1.0}, 1000))
    assert p.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_quality_percentile_single_shuffle(spark):
    """Both windows (rank + per-source count) share the source
    partitioning: one Exchange, not two."""
    from log_aggregation_pipeline_spark.operators.text_analysis import (
        quality_percentile,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = plan_of(quality_percentile(docs))
    assert p.count("Exchange hashpartitioning") == 1


def test_vocab_stats_top_k_without_full_sort(spark):
    """Term counts partial-aggregate map-side and the top page plans
    as TakeOrderedAndProject — no global sort of the vocabulary."""
    from log_aggregation_pipeline_spark.operators.text_analysis import (
        vocab_stats,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = plan_of(vocab_stats(docs, top=50))
    assert "TakeOrderedAndProject" in p
    assert "Sort " not in p  # no standalone global Sort operator


def test_ngram_novelty_materialized_single_shingle_pass(spark):
    """materialize_dir feeds BOTH join sides from the written (id,
    gram) parquet: the final plan carries no shingle HOF at all (the
    transform(...) expression tree), and the output equals the
    recomputed form exactly."""
    import shutil
    import tempfile

    from log_aggregation_pipeline_spark.operators.text_analysis import (
        ngram_novelty,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    root = tempfile.mkdtemp(prefix="lap_nov_")
    try:
        mat = f"{root}/grams"
        out = ngram_novelty(docs, materialize_dir=mat)
        p = plan_of(out)
        recomputed = plan_of(ngram_novelty(docs))
        assert recomputed.count("transform(") >= 2  # shingled twice
        assert "transform(" not in p
        assert "/grams" in p
        a = sorted(map(tuple, out.collect()))
        b = sorted(map(tuple, ngram_novelty(docs).collect()))
        assert a == b
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_range_join_is_equi_join(spark):
    """The window correlation must plan as a shuffle equi-join on
    (by, bucket) — an inequality-only join would be a nested-loop
    broadcast of a whole side."""
    from log_aggregation_pipeline_spark.operators.asof import (
        range_join_within,
    )

    ev = spark.read.parquet(f"{SF}/events.parquet")
    l = ev.filter("event_type = 'purchase'").select("user_id", "event_id", "ts")
    r = ev.filter("event_type = 'error'").select("user_id", "event_id", "ts")
    p = plan_of(range_join_within(l, r))
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p


def test_semdedup_pair_stage_is_equi_join(spark):
    """SemDeDup's pair stage must plan as a join keyed on the cluster
    id (hash or sort-merge — AQE-splittable either way), never a
    BroadcastNestedLoopJoin/CartesianProduct: hot boilerplate clusters
    are exactly the skewed-key case a keyed join survives and an
    all-pairs plan does not."""
    from log_aggregation_pipeline_spark.operators.dedupe import semdedup_pairs
    from log_aggregation_pipeline_spark.operators.similarity import (
        train_ivf_centroids,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cent = train_ivf_centroids(emb, n_centroids=8)
    p = plan_of(semdedup_pairs(emb, cent, threshold=0.3))
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    assert "Join" in p  # keyed join present, not a collect-side scan


def test_semantic_decontam_is_pure_projection(spark):
    """The literal-eval semantic decontam must be shuffle-free end to
    end: eval vectors ride the closure, so the whole scorer is
    scan -> project -> filter — ZERO Exchange, zero joins.  This is
    the plan property that makes it free at 100 TB (one pass over the
    corpus, no data movement)."""
    from log_aggregation_pipeline_spark.operators.decontam import (
        semantic_contaminated,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    evals = [(0, [1.0] * 64), (1, [0.5] * 64)]
    p = plan_of(semantic_contaminated(emb, evals, threshold=0.3))
    assert "Exchange" not in p
    assert "Join" not in p


def test_neardup_funnel_lsh_mat_combined(spark, tmp_path_factory):
    """pairs="lsh" composes with materialize_dir (the combined 100 TB
    form: bounded banded candidates + the keeper set written once) —
    the report must equal the recomputed LSH form row-for-row, and the
    final plan must read keepers from the materialized parquet (no
    keeper-election window recompute: the _rn# marker is absent)."""
    from log_aggregation_pipeline_spark.plans.corpus_prep import (
        corpus_prep_funnel_neardup,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    # short tempdir: FileScan Location strings truncate long paths
    # out of the plan text (repo gotcha)
    mat = str(tmp_path_factory.mktemp("m")) + "/k"
    combined = corpus_prep_funnel_neardup(
        docs, pairs="lsh", materialize_dir=mat
    )
    rows = combined.collect()
    assert rows == corpus_prep_funnel_neardup(docs, pairs="lsh").collect()
    p = plan_of(combined)
    assert "_rn#" not in p
    assert "CartesianProduct" not in p


def _no_broadcast(spark):
    """Context manager: disable auto-broadcast so a no-Exchange
    assertion pins the BUCKETED co-location, not a trivially
    shuffle-free broadcast join."""
    import contextlib

    @contextlib.contextmanager
    def ctx():
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            yield
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    return ctx()


def test_semdedup_materialized_single_scan(spark, tmp_path_factory):
    """VERDICT r6 #1 made executable: with materialize_dir, the
    assignment base is written once and BOTH the pair stage and the
    member join read it back — the final plans contain NO centroid
    fold at all (array_position appears only in the assignment
    projection), and the outputs equal the recomputed forms
    row-for-row."""
    from log_aggregation_pipeline_spark.operators.dedupe import (
        semdedup_keep,
        semdedup_pairs,
    )
    from log_aggregation_pipeline_spark.operators.similarity import (
        train_ivf_centroids,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cent = train_ivf_centroids(emb, n_centroids=8)
    mat = str(tmp_path_factory.mktemp("sd")) + "/b"
    pairs_mat = semdedup_pairs(emb, cent, threshold=0.3, materialize_dir=mat)
    assert sorted(map(tuple, pairs_mat.collect())) == sorted(
        map(tuple, semdedup_pairs(emb, cent, threshold=0.3).collect())
    )
    p = plan_of(pairs_mat)
    assert "array_position" not in p  # assignment evaluated ONCE, at write
    assert "CartesianProduct" not in p

    mat2 = str(tmp_path_factory.mktemp("sk")) + "/b"
    keep_mat = semdedup_keep(emb, cent, threshold=0.3, materialize_dir=mat2)
    assert sorted(map(tuple, keep_mat.collect())) == sorted(
        map(tuple, semdedup_keep(emb, cent, threshold=0.3).collect())
    )
    assert "array_position" not in plan_of(keep_mat)


def test_semdedup_bucketed_pair_join_no_exchange(spark, tmp_path_factory):
    """The r6 CLAUDE.md gotcha made executable (VERDICT r6 #2): the
    materialized base is written bucketBy(cluster), so the pair
    stage's self-equi-join on cluster plans with ZERO Exchange on
    either side (broadcast disabled so the assertion pins the bucket
    co-location, not a broadcast).  partitionBy(cluster) would prune
    but still pay a full exchange here."""
    from log_aggregation_pipeline_spark.operators.dedupe import semdedup_pairs
    from log_aggregation_pipeline_spark.operators.similarity import (
        train_ivf_centroids,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cent = train_ivf_centroids(emb, n_centroids=8)
    mat = str(tmp_path_factory.mktemp("sb")) + "/b"
    with _no_broadcast(spark):
        p = plan_of(semdedup_pairs(emb, cent, threshold=0.3, materialize_dir=mat))
    assert "Exchange" not in p
    assert "SortMergeJoin" in p  # keyed join co-located by the buckets


def test_ivf_write_bucketed_self_join_no_exchange(spark, tmp_path_factory):
    """ivf_write(bucket_by=n) writes bucketBy(n, cluster) and returns
    the read-back frame; a self-join on cluster off that frame needs
    no Exchange (the SemDeDup/per-cluster-pass read-back shape).  The
    default partitioned form keeps PartitionFilters pruning (pinned
    elsewhere) — the two forms serve different read patterns."""
    from log_aggregation_pipeline_spark.operators.similarity import (
        ivf_write,
        train_ivf_centroids,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cent = train_ivf_centroids(emb, n_centroids=8)
    path = str(tmp_path_factory.mktemp("ib")) + "/t"
    t = ivf_write(emb, cent, path, bucket_by=8)
    assert t is not None and t.count() == emb.count()
    a, b = t.alias("a"), t.alias("b")
    j = a.join(b, "cluster").filter(F.col("a.vec_id") < F.col("b.vec_id"))
    with _no_broadcast(spark):
        p = plan_of(
            a.join(b, "cluster").filter(F.col("a.vec_id") < F.col("b.vec_id"))
        )
    assert "Exchange" not in p
    # and the join is real (row-level sanity, not just plan text)
    assert j.count() > 0


def test_semdedup_fold_not_inlined_into_filters(spark):
    """r8: the cluster id is non-nullable by construction (coalesce to
    a sentinel), so the pair join must NOT push an isnotnull(cluster)
    filter that inlines the centroid dot-fold into a Filter operator
    (the filter-on-nested-HOF gotcha — each row would pay the 8x64
    fold 2 extra times per join side, outside whole-stage codegen).
    Every Filter condition in the plan must be fold-free."""
    import re

    from log_aggregation_pipeline_spark.operators.dedupe import semdedup_pairs
    from log_aggregation_pipeline_spark.operators.similarity import (
        train_ivf_centroids,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cent = train_ivf_centroids(emb, n_centroids=8)
    p = plan_of(semdedup_pairs(emb, cent, threshold=0.3))
    # formatted/toString plans put each Filter's condition on its own
    # line ("+- Filter <cond>"); none may contain an aggregate() fold
    for line in p.splitlines():
        if re.search(r"\bFilter\b", line):
            assert "aggregate(" not in line, line[:200]


def test_ngram_jaccard_single_shingle_pass_shape(spark):
    """r8: the jaccard pair source feeds everything from the exploded
    shingle pass — the set size rides each row and pairs are GENERATED
    per shingle, so the plan holds exactly 2 evaluations of the
    documents scan (the count pre-filter + the member collect), not
    the 6 the self-join + sizes-join form needed (12 scans at r7)."""
    from log_aggregation_pipeline_spark.operators.dedupe import (
        ngram_jaccard_pairs,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = plan_of(ngram_jaccard_pairs(docs, max_shingle_freq=1000))
    assert p.count("FileScan") <= 2, p.count("FileScan")
    # and no join remains at all: pair counts come from an aggregate
    assert "SortMergeJoin" not in p and "ShuffledHashJoin" not in p


def test_connected_components_tolerates_duplicate_edges(spark):
    """r8 dropped the edge distinct() (every repo pair source is
    already duplicate-free); min-label propagation must stay correct
    if an external caller passes a duplicated pair list anyway."""
    from log_aggregation_pipeline_spark.operators.cluster import (
        connected_components,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 2), (2, 3), (10, 11), (10, 11)],
        ["a_id", "b_id"],
    )
    out = {
        (r["node"], r["component"])
        for r in connected_components(pairs).collect()
    }
    assert out == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}
