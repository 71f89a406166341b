"""Sequence packing: contiguous fill arithmetic, straddle flags, and
the sharded-window plan (the global-order variant would be a
one-partition scale-killer)."""

from __future__ import annotations

import pytest

from log_aggregation_pipeline_spark.operators.packing import pack_sequences


@pytest.fixture(scope="module")
def sf_docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def _one_shard_rows(spark, n_tokens_list, capacity):
    # n_shards=1 puts every doc in shard 0 -> deterministic fill order
    rows = [(i, " ".join(["w"] * n)) for i, n in enumerate(n_tokens_list)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = pack_sequences(df, capacity=capacity, n_shards=1)
    return {r.doc_id: r for r in out.collect()}


def test_contiguous_fill_and_straddle(spark):
    got = _one_shard_rows(spark, [100, 300, 200, 50], capacity=512)
    # cumsum-before: 0, 100, 400, 600
    assert (got[0].bin_id, got[0].bin_offset, got[0].straddles) == (0, 0, False)
    assert (got[1].bin_id, got[1].bin_offset, got[1].straddles) == (0, 100, False)
    # doc 2 spans 400..599 -> crosses the 512 boundary
    assert (got[2].bin_id, got[2].bin_offset, got[2].straddles) == (0, 400, True)
    assert (got[3].bin_id, got[3].bin_offset, got[3].straddles) == (1, 88, False)


def test_doc_longer_than_capacity_always_straddles(spark):
    got = _one_shard_rows(spark, [600], capacity=512)
    assert got[0].straddles and got[0].bin_id == 0


def test_empty_doc_occupies_no_space(spark):
    rows = [(0, "a b c"), (1, ""), (2, "d e")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in
           pack_sequences(df, capacity=4, n_shards=1).collect()}
    assert got[1].n_tokens == 0 and not got[1].straddles
    # doc 2 starts right where doc 0's 3 tokens ended
    assert (got[2].bin_id, got[2].bin_offset) == (0, 3)


def test_shards_are_deterministic_and_complete(spark, sf_docs):
    a = pack_sequences(sf_docs, n_shards=16).collect()
    b = pack_sequences(sf_docs, n_shards=16).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len(a) == sf_docs.count()
    assert {r.shard for r in a} <= set(range(16))


def test_window_is_sharded_not_global(spark, sf_docs):
    from tests.test_plans import plan_of

    p = plan_of(pack_sequences(sf_docs, n_shards=16))
    # the window exchange must key on shard — a global-order packing
    # would show Exchange SinglePartition feeding the Window
    assert "Exchange hashpartitioning(shard" in p
    assert "Exchange SinglePartition" not in p


def test_works_on_sf_corpus_bins_monotone(spark, sf_docs):
    rows = pack_sequences(sf_docs, capacity=512, n_shards=4).collect()
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    for shard_rows in by_shard.values():
        shard_rows.sort(key=lambda r: r.doc_id)
        # bin ids never decrease along the fill order
        bins = [r.bin_id for r in shard_rows]
        assert bins == sorted(bins)


def test_split_straddlers_partitions_each_doc(spark):
    from log_aggregation_pipeline_spark.operators.packing import (
        split_straddlers,
    )

    toks = [100, 300, 200, 50, 1200, 0]
    rows = [(i, " ".join(["w"] * n)) for i, n in enumerate(toks)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    packed = pack_sequences(df, capacity=512, n_shards=1)
    segs = split_straddlers(packed, capacity=512).collect()

    by_doc: dict[int, list] = {}
    for s in segs:
        by_doc.setdefault(s.doc_id, []).append(s)
    # zero-token doc emits nothing
    assert 5 not in by_doc
    for doc_id, ss in by_doc.items():
        ss.sort(key=lambda s: s.seg_idx)
        # segments tile [0, n_tokens) without gaps or overlap
        assert ss[0].tok_start == 0
        for a, b in zip(ss, ss[1:]):
            assert a.tok_end == b.tok_start
            assert b.bin_id == a.bin_id + 1  # consecutive bins
        assert ss[-1].tok_end == toks[doc_id]
    # the 1200-token doc (cumsum-before 650) spans bins 1..3 -> 3 segs
    assert len(by_doc[4]) == 3


def test_split_straddlers_bin_capacity_never_exceeded(spark):
    from log_aggregation_pipeline_spark.operators.packing import (
        split_straddlers,
    )

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    packed = pack_sequences(df, capacity=128, n_shards=4)
    segs = split_straddlers(packed, capacity=128).collect()
    fill: dict[tuple, int] = {}
    for s in segs:
        fill[(s.shard, s.bin_id)] = fill.get((s.shard, s.bin_id), 0) + (
            s.tok_end - s.tok_start
        )
    assert all(v <= 128 for v in fill.values())
    # every bin except each shard's last is filled EXACTLY to capacity
    last = {s: max(b for sh, b in fill if sh == s) for s, _ in fill}
    assert all(v == 128 for (sh, b), v in fill.items() if b < last[sh])


def test_split_straddlers_column_reorder_safe(spark):
    # id resolution is by name (id_col), not position: a reordered
    # projection of pack_sequences output yields identical segments
    from log_aggregation_pipeline_spark.operators.packing import (
        split_straddlers,
    )

    df = spark.createDataFrame(
        [(0, " ".join(["w"] * 700))], "doc_id long, text string"
    )
    packed = pack_sequences(df, capacity=512, n_shards=1)
    reordered = packed.select(
        "shard", "n_tokens", "bin_id", "bin_offset", "straddles", "doc_id"
    )
    key = lambda r: (r.doc_id, r.bin_id, r.tok_start, r.tok_end)  # noqa: E731
    a = sorted(map(key, split_straddlers(packed, 512).collect()))
    b = sorted(map(key, split_straddlers(reordered, 512).collect()))
    assert a == b and len(a) == 2


def test_adaptive_n_shards_policy():
    from log_aggregation_pipeline_spark.operators.packing import (
        adaptive_n_shards,
    )

    assert adaptive_n_shards(0) == 16  # floor keeps small inputs parallel
    assert adaptive_n_shards(16 * 50_000_000) == 16
    assert adaptive_n_shards(100 * 50_000_000) == 100
    # shard count grows with corpus size
    assert adaptive_n_shards(10**12) > adaptive_n_shards(10**11) > 16


def test_pack_sequences_adaptive_per_shard_mass_bounded(spark):
    # 500 docs x 20 tokens = 10k tokens at target 500/shard -> 20
    # shards; hashing is uniform so no shard carries a large multiple
    # of the target
    rows = [(i, " ".join(["w"] * 20)) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = pack_sequences(
        df, capacity=64, n_shards=None, target_tokens_per_shard=500
    )
    from pyspark.sql import functions as F

    agg = out.groupBy("shard").agg(F.sum("n_tokens").alias("m")).collect()
    assert 10 < len(agg) <= 20  # ~total/target shards actually used
    assert max(r.m for r in agg) < 4 * 500
