"""Duplicate-cluster resolution: connected components over pair sets.

Near-dup operators (``operators.dedupe``) emit PAIRS; a real
training-data pipeline then needs the transitive closure — "these 9
docs are all one document, keep one" — i.e. connected components with
a deterministic representative (the minimum node id).  The reference's
blueprint stops at the dedup *filter* declaration
(/root/reference/log-aggregation-pipeline-blueprint.md:269-274); this
is the cluster-resolution step it would need next.

Algorithm: iterative min-label propagation with pointer jumping —
each round every node takes the min label over itself and its
neighbors (one shuffle join + one partial-agg groupBy), then labels
are short-circuited through themselves (``l(v) <- l(l(v))``, one more
join), which doubles the propagation distance per round.  Rounds
needed: O(log d) for component diameter d — near-dup graphs are
overwhelmingly star/clique shaped (d <= 2-3), so 2-3 rounds in
practice, with a hard ``max_iter`` that RAISES rather than silently
returning partial clusters (no-silent-caps rule).

Scale posture: all joins key on node/label ids (uniform hash keys, no
skew salting needed); per-round state is exactly one (node, label) row
per node — O(V) not O(E); ``localCheckpoint`` truncates the iterative
lineage each round so plan size stays constant at any round count
(the classic iterative-join failure mode on big clusters is Catalyst
re-planning an ever-growing tree).  The driver-side loop is control
flow only — each iteration's data work is fully distributed, and the
single ``.isEmpty()`` convergence probe per round is an early-exit
aggregate, not a collect of data rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _free_checkpoint(df: DataFrame) -> None:
    """Release a ``localCheckpoint``-ed DataFrame's storage blocks.

    ``DataFrame.unpersist()`` only clears CacheManager entries, and a
    checkpoint persists the underlying internal RDD directly — so the
    public call is a silent no-op and every superseded round's blocks
    would accumulate for the session's lifetime (measured: persistent-
    RDD count grows by rounds+2 per connected_components call without
    this).  The checkpointed Dataset's analyzed plan is a LogicalRDD
    wrapping exactly that RDD; unpersist it through the JVM handle."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:  # noqa: BLE001 — plan not a bare LogicalRDD
        df.unpersist()


def connected_components(
    pairs: DataFrame,
    a_col: str = "a_id",
    b_col: str = "b_id",
    max_iter: int = 16,
) -> DataFrame:
    """(node, component) for every node appearing in ``pairs``.

    ``component`` is the minimum node id in the node's connected
    component — deterministic, so downstream "keep the representative"
    filters are reproducible.  Nodes not in any pair are not emitted
    (singletons are already their own keeper by definition).
    """
    edges = pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v")).union(
        pairs.select(F.col(b_col).alias("u"), F.col(a_col).alias("v"))
    )
    # No distinct(): every pair source in this repo emits each
    # unordered pair once (jaccard/LSH/simhash/embedding pairs all
    # aggregate or distinct before returning), so the union of both
    # directions is already duplicate-free — the distinct was a full
    # extra shuffle+aggregate per CC call buying nothing.  Min-label
    # propagation is idempotent to duplicate edges anyway (a dup only
    # re-feeds the same min into the neighbor-min aggregate), so even
    # an external caller with a duplicated pair list gets identical
    # components — the cost would be edge-table size, not correctness.
    # edges participate in every round: materialize once
    edges = edges.localCheckpoint(eager=True)

    labels = edges.select("u").distinct().select(
        F.col("u").alias("node"), F.col("u").alias("label")
    )
    labels = labels.localCheckpoint(eager=True)
    labels_ck = labels  # the checkpoint handle backing ``labels``
    label_type = dict(labels.dtypes)["label"]

    # unpersist the edges checkpoint on EVERY exit (converged or not):
    # the final labels checkpoint's lineage is truncated, so the result
    # no longer references edges, and leaving it cached would
    # accumulate checkpoint blocks across repeated calls in a
    # long-lived session.  The RETURNED labels checkpoint stays cached
    # (its blocks ARE the result — lineage is cut); it is freed by the
    # ContextCleaner when the caller drops the DataFrame.
    try:
        for _ in range(max_iter):
            # 1) neighbor-min: min over own and all neighbors' labels.
            # The node's OWN (old) label rides the same aggregate in a
            # second min column (tagged rows from ``labels`` carry it,
            # neighbor rows carry NULL), so change detection needs no
            # separate join: the r7 form ran an extra shuffle join +
            # isEmpty scan per round just to compare new vs old.
            nbr = (
                edges.join(labels, edges.v == labels.node)
                .select(
                    edges.u.alias("node"),
                    "label",
                    F.lit(None).cast(label_type).alias("_own"),
                )
            )
            new_labels = (
                nbr.union(
                    labels.select("node", "label", F.col("label").alias("_own"))
                )
                .groupBy("node")
                .agg(
                    F.min("label").alias("label"),
                    # each node contributes exactly one non-null _own
                    F.min("_own").alias("_own"),
                )
            )
            # 2) pointer jump: l(v) <- l(l(v)) — doubles reach
            lbl2 = new_labels.select(
                F.col("node").alias("p_node"), F.col("label").alias("p_label")
            )
            new_labels = (
                new_labels.join(lbl2, new_labels.label == lbl2.p_node)
                .select(
                    "node",
                    F.col("p_label").alias("label"),
                    (F.col("p_label") != F.col("_own")).alias("_chg"),
                )
            )
            # checkpoint the frame WITH the change flag; keep the
            # checkpoint handle itself for _free_checkpoint (freeing a
            # projection over it would miss the underlying RDD blocks)
            ck = new_labels.localCheckpoint(eager=True)

            old_ck = labels_ck
            labels_ck = ck
            labels = ck.drop("_chg")
            # convergence probe over the CHECKPOINTED (in-memory) rows
            # — a filter scan of cached blocks, not a join
            if ck.where("_chg").isEmpty():
                _free_checkpoint(old_ck)
                return labels.select(
                    F.col("node"), F.col("label").alias("component")
                )
            _free_checkpoint(old_ck)

        _free_checkpoint(labels_ck)
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds — "
            "component diameter exceeds 2^max_iter; raise max_iter"
        )
    finally:
        _free_checkpoint(edges)


def dup_clusters(
    pairs: DataFrame, a_col: str = "a_id", b_col: str = "b_id"
) -> DataFrame:
    """(doc_id, cluster_rep, cluster_size) for every doc in a near-dup
    pair — the "which rows are one document" answer a dedup pipeline
    acts on.  ``cluster_rep`` is the component-min doc id (the keeper),
    ``cluster_size`` the component's row count.  One extra groupBy +
    shuffle join on component — component count is O(nodes) so the
    size table must NOT be broadcast; a giant component makes the join
    key hot, which AQE's skew split handles (same posture as A4).
    """
    cc = connected_components(pairs, a_col, b_col)
    sizes = cc.groupBy("component").agg(F.count("*").alias("cluster_size"))
    return (
        cc.join(sizes, "component")
        .select(
            F.col("node").alias("doc_id"),
            F.col("component").alias("cluster_rep"),
            "cluster_size",
        )
    )


def _ranked_members(
    docs: DataFrame,
    pairs: DataFrame,
    a_col: str,
    b_col: str,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Cluster membership + per-cluster quality rank (rn=1 is the
    keeper).  Shared core of cluster_keepers / cluster_drop_list so
    the election spec lives in exactly one window definition."""
    from pyspark.sql import Window

    from log_aggregation_pipeline_spark.operators.text_analysis import (
        quality_features,
    )

    clusters = dup_clusters(pairs, a_col, b_col)  # id column: doc_id
    qual = quality_features(docs, text_col).select(
        F.col(id_col).alias("doc_id"), "quality_score"
    )
    w = Window.partitionBy("cluster_rep").orderBy(
        F.desc("quality_score"), F.asc("doc_id")
    )
    # LEFT join: ``pairs`` may reference docs absent from ``docs``
    # (pre-filtered corpus, stale pair snapshot).  An inner join would
    # silently disqualify those members from the election — or drop a
    # whole cluster — while cluster_size still reported full
    # membership.  With the left join every member competes; unscored
    # members rank after scored ones (desc() is NULLS LAST), an
    # all-unscored cluster still elects its min-id member, and a
    # NULL keeper_quality discloses that the keeper was never scored.
    return clusters.join(qual, "doc_id", "left").withColumn(
        "rn", F.row_number().over(w)
    )


def cluster_keepers(
    docs: DataFrame,
    pairs: DataFrame,
    a_col: str = "a_id",
    b_col: str = "b_id",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The final step of the dedup story (pairs -> components ->
    KEEPER): one row per near-dup cluster naming the canonical
    document to keep — the member with the highest
    ``quality_features`` score, ties broken by minimum doc id so the
    choice is deterministic.  (Keeping the min-id member regardless of
    quality is what a naive ``cluster_rep`` filter does; choosing by
    quality is the curation-correct policy — you keep the cleanest
    copy, not the lexicographically first one.)

    Plan shape: dup_clusters (iterative CC) joined to the quality
    projection on doc_id (uniform key), then one row_number window
    partitioned by cluster — per-cluster state is the cluster's member
    count, bounded by the biggest near-dup cluster, with AQE skew
    handling as the backstop exactly as in dup_clusters.  Returns
    (cluster_rep, keeper_id, cluster_size, keeper_quality)."""
    return (
        _ranked_members(docs, pairs, a_col, b_col, id_col, text_col)
        .filter(F.col("rn") == 1)
        .select(
            "cluster_rep",
            F.col("doc_id").alias("keeper_id"),
            "cluster_size",
            F.col("quality_score").alias("keeper_quality"),
        )
    )


def cluster_drop_list(
    docs: DataFrame,
    pairs: DataFrame,
    a_col: str = "a_id",
    b_col: str = "b_id",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The complement of ``cluster_keepers``: every cluster member
    that LOST the election (rn > 1) — the ids a near-dup dedup pass
    anti-joins away.  Same election window, so keepers + drop list
    exactly partition the pair-derived membership."""
    return (
        _ranked_members(docs, pairs, a_col, b_col, id_col, text_col)
        .filter(F.col("rn") > 1)
        .select(F.col("doc_id").alias(id_col))
    )
