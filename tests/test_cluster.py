"""Connected-components duplicate-cluster resolution.

Constructed graphs exercise what the sf corpora cannot: long chains
(multi-round propagation — sf0.01's biggest cluster has diameter 2),
multiple components, id-order adversarial edges, and the hard
non-convergence guard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from log_aggregation_pipeline_spark.operators.cluster import (
    connected_components,
    dup_clusters,
)


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "a_id long, b_id long")


def _components(spark, edges, **kw):
    rows = connected_components(_pairs(spark, edges), **kw).collect()
    return {r.node: r.component for r in rows}


def test_chain_propagates_min_across_many_hops(spark):
    # a 9-hop chain with the min id at one END — worst case for
    # min propagation; pointer jumping must still converge fast
    chain = [(i + 1, i + 2) for i in range(9)] + [(10, 0)]
    got = _components(spark, chain)
    assert got == {i: 0 for i in range(11)}


def test_multiple_components_and_triangle(spark):
    edges = [(5, 3), (3, 8), (8, 5),        # triangle -> rep 3
             (20, 21),                       # pair -> rep 20
             (30, 31), (31, 32)]             # path -> rep 30
    got = _components(spark, edges)
    assert got == {3: 3, 5: 3, 8: 3, 20: 20, 21: 20, 30: 30, 31: 30, 32: 30}


def test_descending_id_chain(spark):
    # edges listed high->low so every round's neighbor-min actually
    # moves labels (catches a "only propagates one way" bug)
    edges = [(9, 7), (7, 5), (5, 3), (3, 1)]
    got = _components(spark, edges)
    assert set(got.values()) == {1}


def test_nonconvergence_raises_not_partial(spark):
    # diameter 10 cannot finish in 1 round: must RAISE, never return
    # partial clusters (no-silent-caps rule)
    chain = [(i, i + 1) for i in range(10)]
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(_pairs(spark, chain), max_iter=1)


def test_dup_clusters_sizes_and_reps(spark):
    edges = [(1, 2), (2, 3), (7, 8)]
    rows = dup_clusters(_pairs(spark, edges)).collect()
    got = {r.doc_id: (r.cluster_rep, r.cluster_size) for r in rows}
    assert got == {1: (1, 3), 2: (1, 3), 3: (1, 3), 7: (7, 2), 8: (7, 2)}


def test_deterministic_across_runs(spark):
    edges = [(4, 9), (9, 2), (11, 12), (2, 17)]
    a = _components(spark, edges)
    b = _components(spark, edges)
    assert a == b == {4: 2, 9: 2, 2: 2, 17: 2, 11: 11, 12: 11}


def test_works_on_string_ids(spark):
    pairs = spark.createDataFrame(
        [("b", "c"), ("c", "a"), ("x", "y")], "a_id string, b_id string"
    )
    rows = connected_components(pairs).collect()
    got = {r.node: r.component for r in rows}
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_connected_components_releases_checkpoints(spark):
    # long-lived-session hygiene: only the RETURNED labels checkpoint
    # may stay cached; edges and every superseded per-round checkpoint
    # are unpersisted on the way out
    from log_aggregation_pipeline_spark.operators.cluster import (
        connected_components,
    )

    sc = spark.sparkContext
    before = sc._jsc.getPersistentRDDs().size()
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "a_id long, b_id long"
    )
    cc = connected_components(pairs)
    assert cc.count() == 5
    after = sc._jsc.getPersistentRDDs().size()
    assert after - before <= 1


def test_cluster_keepers_quality_then_min_id(spark):
    # keeper = highest quality_score in the cluster (NOT min id);
    # quality ties fall back to min doc_id for determinism
    from log_aggregation_pipeline_spark.operators.cluster import (
        cluster_keepers,
    )

    good = (
        "the quick brown fox jumps over the lazy dog and keeps on "
        "running for a while longer"
    )
    docs = spark.createDataFrame(
        [(1, "x"), (2, good), (10, good), (11, good)],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (10, 11)], "a_id long, b_id long"
    )
    got = {r.cluster_rep: r for r in cluster_keepers(docs, pairs).collect()}
    assert got[1].keeper_id == 2  # better copy beats the min-id member
    assert got[1].cluster_size == 2
    assert got[10].keeper_id == 10  # equal quality -> min doc_id
    # both keepers carry the 'good' text -> identical quality score
    assert got[1].keeper_quality == got[10].keeper_quality > 0.5


def test_cluster_keepers_members_missing_from_docs(spark):
    # pairs may reference docs absent from the docs side (pre-filtered
    # corpus / stale pair snapshot): those members still compete but
    # rank after scored ones; an all-unscored cluster elects its
    # min-id member with a NULL keeper_quality disclosing it;
    # cluster_size always reports full pair-derived membership
    from log_aggregation_pipeline_spark.operators.cluster import (
        cluster_keepers,
    )

    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    pairs = spark.createDataFrame(
        [(1, 99), (50, 60)], "a_id long, b_id long"
    )
    got = {r.cluster_rep: r for r in cluster_keepers(docs, pairs).collect()}
    assert got[1].keeper_id == 1 and got[1].cluster_size == 2
    assert got[1].keeper_quality is not None
    assert got[50].keeper_id == 50 and got[50].keeper_quality is None
