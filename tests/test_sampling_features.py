"""Sampling operators + per-conversation grouped-map features.

The features equality test runs on the skew generator (first convs get
16x the turns — ≥20% heavy hitters), pinning that the blocked
two-phase path is exact under skew, block boundaries included."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from log_aggregation_pipeline_spark.operators import sampling as SA
from log_aggregation_pipeline_spark.operators.features import (
    conv_features,
    conv_features_salted,
)
from log_aggregation_pipeline_spark.sources.transcripts import (
    transcripts_df,
    transcripts_from_events,
)

SF = "/root/testdata/sf0.001"
IDS = ["conv_id", "turn_idx"]


@pytest.fixture(scope="module")
def t(spark):
    return transcripts_from_events(spark, SF)


@pytest.fixture(scope="module")
def skewed(spark):
    # 2 hot convs at 16x => >=20% heavy hitters (FIXTURES.md §1)
    return transcripts_df(spark, n_convs=30, turns_per_conv=20, skew_convs=2,
                          skew_factor=16)


# ---------------------------------------------------------------------------
# sampling
# ---------------------------------------------------------------------------
def test_hash_sample_fraction_and_determinism(t):
    n = t.count()
    s1 = SA.hash_sample(t, 0.2, IDS)
    k = s1.count()
    assert abs(k / n - 0.2) < 0.05  # binomial tolerance
    assert s1.exceptAll(SA.hash_sample(t, 0.2, IDS)).count() == 0  # same seed
    # a different seed draws a genuinely different sample
    s2 = SA.hash_sample(t, 0.2, IDS, seed=99)
    assert s1.select(*IDS).exceptAll(s2.select(*IDS)).count() > 0


def test_hash_sample_is_shuffle_free(t):
    plan = SA.hash_sample(t, 0.2, IDS)._jdf.queryExecution().executedPlan().toString()
    # only the window from the transcripts derivation itself may shuffle;
    # the sample must add no exchange beyond it
    base = t._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == base.count("Exchange")


def test_stratified_exact_counts(t):
    frac = 0.1
    per_stratum = {r["role"]: r["n"] for r in
                   t.groupBy("role").agg(F.count("*").alias("n")).collect()}
    got = {r["role"]: r["n"] for r in
           SA.stratified_sample_exact(t, ["role"], frac, IDS)
           .groupBy("role").agg(F.count("*").alias("n")).collect()}
    assert got == {k: math.ceil(v * frac) for k, v in per_stratum.items()}


def test_reservoir_exact_k_and_uniformish(t):
    s = SA.reservoir_sample(t, 100, IDS)
    assert s.count() == 100
    # deterministic
    a = sorted((r.conv_id, r.turn_idx) for r in s.collect())
    b = sorted((r.conv_id, r.turn_idx) for r in SA.reservoir_sample(t, 100, IDS).collect())
    assert a == b
    # roughly role-balanced (hash-uniform): no stratum takes >60%
    shares = [r["n"] for r in s.groupBy("role").agg(F.count("*").alias("n")).collect()]
    assert max(shares) < 60


def test_stratified_reservoir_k_per_stratum(t):
    s = SA.stratified_reservoir(t, ["role"], 5, IDS)
    counts = {r["role"]: r["n"] for r in
              s.groupBy("role").agg(F.count("*").alias("n")).collect()}
    assert all(v == 5 for v in counts.values()) and len(counts) == 4


def test_reservoir_plans_take_ordered(t):
    plan = SA.reservoir_sample(t, 100, IDS)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


# ---------------------------------------------------------------------------
# conv features: plain grouped-map == blocked two-phase, under skew
# ---------------------------------------------------------------------------
def _rows(df):
    out = []
    for r in df.collect():
        d = r.asDict()
        for k in ("mean_gap_s", "max_gap_s", "frac_error"):
            d[k] = None if d[k] is None else round(d[k], 9)
        out.append(tuple(sorted(d.items())))
    return sorted(out)


def test_conv_features_plain_equals_salted_under_skew(skewed):
    plain = _rows(conv_features(skewed))
    for bs in (7, 64, 100000):  # mid-conv splits, multi-block hot convs, one-block
        blocked = _rows(conv_features_salted(skewed, block_size=bs))
        assert blocked == plain, f"block_size={bs}"


def test_conv_features_salted_non_monotonic_ts(spark):
    """ts NOT monotone in turn_idx: first_ts/last_ts are value min/max
    (not turn-order endpoints), gaps stay turn-order deltas — and the
    blocked form still matches the plain one exactly, including when a
    block's turn-order endpoint differs from its ts extreme."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = []
    for c in range(4):
        for i in range(11):
            # ts is a PERMUTATION of turn order: min lands at turn 7,
            # max at turn 4 — neither at the turn-order endpoints
            rows.append(
                (f"c{c}", i, "user" if i % 2 else "tool",
                 "x" * (i + 1),
                 base + dt.timedelta(minutes=10 * ((i * 37 + 5) % 11)))
            )
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, ts timestamp"
    )
    plain = _rows(conv_features(df))
    for bs in (3, 4, 100):
        assert _rows(conv_features_salted(df, block_size=bs)) == plain, bs
    # and the outputs really are value extremes, not turn-order endpoints
    r = {x.conv_id: x for x in conv_features(df).collect()}["c0"]
    tss = [t for (c, _, _, _, t) in rows if c == "c0"]
    assert r.first_ts == min(tss) and r.last_ts == max(tss)
    assert min(tss) != tss[0] or max(tss) != tss[-1]  # case is non-trivial


def test_conv_features_values(spark):
    import datetime as dt

    rows = [
        ("c1", 0, "user", "hello ERROR world", dt.datetime(2024, 1, 1, 0, 0, 0)),
        ("c1", 1, "assistant", "ok", dt.datetime(2024, 1, 1, 0, 0, 10)),
        ("c1", 2, "user", "fine", dt.datetime(2024, 1, 1, 0, 1, 0)),
        ("c2", 0, "tool", "solo", dt.datetime(2024, 1, 2, 0, 0, 0)),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, ts timestamp"
    )
    got = {r.conv_id: r for r in conv_features(df).collect()}
    c1 = got["c1"]
    assert (c1.n_turns, c1.n_roles, c1.n_error_turns) == (3, 2, 1)
    assert c1.mean_gap_s == 30.0 and c1.max_gap_s == 50.0
    assert abs(c1.frac_error - 1 / 3) < 1e-12
    c2 = got["c2"]
    assert c2.n_turns == 1 and c2.mean_gap_s is None and c2.max_gap_s is None


def test_blocked_partials_bound_group_size(skewed):
    """The scale property itself: with block_size=b no grouped-map task
    sees more than b rows, even for the 16x hot conversations."""
    from log_aggregation_pipeline_spark.operators.features import _prep

    b = 64
    blocked = _prep(skewed).withColumn(
        "_blk", (F.col("turn_idx") / b).cast("int")
    )
    mx = (
        blocked.groupBy("conv_id", "_blk")
        .agg(F.count("*").alias("n"))
        .agg(F.max("n"))
        .first()[0]
    )
    assert mx <= b


def test_corpus_mix_fills_per_source_targets(spark):
    """Hand-mirrored greedy draw: weights {A:2, B:1}, budget 90 ->
    targets A=60, B=30; docs ordered by the seeded md5 key inside each
    source, taken while the running token total fits.  Source C has no
    weight and must be absent; the draw is maximal (the next doc in
    key order would overflow the target) and deterministic."""
    import hashlib

    rows = (
        [(i, "w " * 20, "A") for i in range(1, 6)]      # 20 tokens each
        + [(i, "x " * 12, "B") for i in range(10, 15)]  # 12 tokens each
        + [(20, "y " * 5, "C")]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    weights = {"A": 2.0, "B": 1.0}
    targets = SA.mix_targets(weights, 90)
    assert targets == {"A": 60, "B": 30}
    got = SA.corpus_mix(df, weights, 90).collect()
    by_src: dict[str, list] = {}
    for r in got:
        by_src.setdefault(r.source, []).append(r)
    assert set(by_src) == {"A", "B"}

    def mirror(ids, per_doc, target):
        order = sorted(ids, key=lambda d: (hashlib.md5(f"{d}:17".encode()).hexdigest(), d))
        picked, cum = [], 0
        for d in order:
            if cum + per_doc > target:
                break
            cum += per_doc
            picked.append(d)
        return picked

    assert sorted(r.doc_id for r in by_src["A"]) == sorted(mirror(range(1, 6), 20, 60))
    assert sorted(r.doc_id for r in by_src["B"]) == sorted(mirror(range(10, 15), 12, 30))
    assert len(by_src["A"]) == 3 and len(by_src["B"]) == 2
    assert max(r.cum_tokens for r in by_src["A"]) == 60
    assert max(r.cum_tokens for r in by_src["B"]) == 24
    # deterministic: an independent run selects the identical set
    again = {(r.doc_id, r.cum_tokens) for r in SA.corpus_mix(df, weights, 90).collect()}
    assert again == {(r.doc_id, r.cum_tokens) for r in got}


def test_training_pairs_adjacency(spark):
    """Only immediately-adjacent (user -> assistant) turns pair; a
    tool turn in between or consecutive same-role turns produce no
    pair."""
    import datetime as dt

    from log_aggregation_pipeline_spark.operators.order import training_pairs

    ts = dt.datetime(2024, 1, 1)
    rows = [
        ("c1", 0, "user", "q1", ts),
        ("c1", 1, "assistant", "a1", ts),
        ("c1", 2, "user", "q2", ts),
        ("c1", 3, "tool", "t", ts),
        ("c1", 4, "assistant", "a2", ts),   # prev is tool -> no pair
        ("c1", 5, "user", "q3", ts),
        ("c1", 6, "user", "q4", ts),        # consecutive users
        ("c1", 7, "assistant", "a3", ts),   # pairs with q4 only
        ("c2", 0, "assistant", "orphan", ts),  # no preceding turn
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, ts timestamp"
    )
    got = sorted(
        ((r.conv_id, r.prompt_turn_idx, r.response_turn_idx, r.prompt, r.response)
         for r in training_pairs(df).collect())
    )
    assert got == [("c1", 0, 1, "q1", "a1"), ("c1", 6, 7, "q4", "a3")]


def test_range_join_within_window_edges(spark):
    """Bucketized range join == the naive |dt| <= w definition,
    including pairs that straddle a bucket boundary and the exact
    inclusive window edge; no duplicate pairs."""
    import datetime as dt

    from log_aggregation_pipeline_spark.operators.asof import (
        range_join_within,
    )

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def at(s):
        return t0 + dt.timedelta(seconds=s)

    left = spark.createDataFrame(
        [("u1", 1, at(0)), ("u1", 2, at(1000)), ("u2", 3, at(0))],
        "user_id string, event_id int, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", 10, at(-600)),   # exactly -w from left 1 -> included
            ("u1", 11, at(599)),    # bucket straddle vs left 1; also near 2
            ("u1", 12, at(601)),    # outside w of left 1, within of left 2
            ("u2", 13, at(3000)),   # outside for u2's left
            ("u3", 14, at(0)),      # no matching by-group
        ],
        "user_id string, event_id int, ts timestamp",
    )
    got = sorted(
        (r.user_id, r.event_id, r.event_id_r)
        for r in range_join_within(
            left, right, window_seconds=600
        ).collect()
    )
    # naive expectation
    lrows = [(u, i, t) for u, i, t in left.collect()]
    rrows = [(u, i, t) for u, i, t in right.collect()]
    exp = sorted(
        (lu, li, ri)
        for lu, li, lt in lrows
        for ru, ri, rt in rrows
        if lu == ru and abs((lt - rt).total_seconds()) <= 600
    )
    assert got == exp
    assert ("u1", 1, 10) in got and ("u1", 1, 11) in got
    assert ("u1", 2, 12) in got and ("u1", 1, 12) not in got
    assert len(got) == len(set(got))  # exactly-once per pair


def test_value_histogram_buckets(spark):
    """Floor-bucket histogram: boundary values land in their own
    bucket, negatives floor downward, nulls drop."""
    from log_aggregation_pipeline_spark.operators.agg import value_histogram

    vals = [0.0, 4.9, 5.0, 7.5, -0.1, -5.0, None, 12.0]
    df = spark.createDataFrame([(v,) for v in vals], "value double")
    got = {r.bucket: r["count"] for r in value_histogram(df, "value", 5.0).collect()}
    assert got == {0.0: 2, 5.0: 2, -5.0: 2, 10.0: 1}


def test_percentiles_agg_interpolation(spark):
    """Exact quantile_cont interpolation: values [10,20,30,40] ->
    p50 = 25.0, p90 = 37.0."""
    from log_aggregation_pipeline_spark.operators.agg import percentiles_agg

    df = spark.createDataFrame(
        [("a", float(v)) for v in (10, 20, 30, 40)], "g string, value double"
    )
    r = percentiles_agg(df, ["g"], "value", percentiles=(0.5, 0.9)).collect()[0]
    assert r.n == 4 and r.p50_v == 25.0 and r.p90_v == 37.0


def test_moving_avg_trailing_windows(spark):
    """Correct trailing mean (NOT the reference's (old+new)/2 decay):
    first rows disclose their short window via mavg_n."""
    from log_aggregation_pipeline_spark.operators.agg import moving_avg

    rows = [("c", i, v) for i, v in enumerate([10, 20, 60, 10, 0, 30])]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, v int")
    got = {
        r.turn_idx: (r.mavg, r.mavg_n)
        for r in moving_avg(df, ["conv_id"], ["turn_idx"], "v", n_rows=3).collect()
    }
    assert got[0] == (10.0, 1)
    assert got[1] == (15.0, 2)
    assert got[2] == (30.0, 3)
    assert got[3] == (30.0, 3)
    assert got[4] == (round(70 / 3, 6), 3)
    assert got[5] == (round(40 / 3, 6), 3)
