"""End-to-end pipeline + checkpoint/resume (SURVEY.md §5.4).

Mirrors the reference's tailer state save/restore contract
(/root/reference/internal/agent/tailer/tailer_test.go:186-286) at the
batch level: interrupt after one sink, restart, assert no duplicates
and byte-identical final outputs vs an uninterrupted run."""

from __future__ import annotations

import pandas as pd
import pytest

from log_aggregation_pipeline_spark.operators.route import ROUTES
from log_aggregation_pipeline_spark.plans import lineage as L
from log_aggregation_pipeline_spark.plans.pipeline import (
    InjectedFailure,
    read_agg,
    read_sink,
    run_pipeline,
)

KEY = ["conv_id", "turn_idx"]


def _sink_frames(spark, out_dir):
    out = {}
    for name in ROUTES:
        out[name] = (
            read_sink(spark, out_dir, name)
            .select("conv_id", "turn_idx", "id", "level", "text")
            .toPandas()
            .sort_values(KEY)
            .reset_index(drop=True)
        )
    return out


def test_clean_run(spark, transcripts, tmp_path):
    out = str(tmp_path / "clean")
    res = run_pipeline(spark, transcripts, out)
    assert set(res.sink_counts) == set(ROUTES)
    assert all(v > 0 for v in res.sink_counts.values())
    man = L.read_manifest(out)
    assert set(man["sink"]) == set(ROUTES)
    # lineage row-count totals equal sink counts (metrics correctness)
    totals = man.groupby("sink")["n_rows"].sum().to_dict()
    assert totals == res.sink_counts


def test_resume_after_failure(spark, transcripts, tmp_path):
    clean_dir = str(tmp_path / "clean")
    broken_dir = str(tmp_path / "broken")
    run_pipeline(spark, transcripts, clean_dir)

    with pytest.raises(InjectedFailure):
        run_pipeline(spark, transcripts, broken_dir, fail_after_sinks=1)
    # only the first sink committed
    man = L.read_manifest(broken_dir)
    assert set(man["sink"]) == {list(ROUTES)[0]}

    res = run_pipeline(spark, transcripts, broken_dir)  # resume
    first = list(ROUTES)[0]
    # resume skipped every already-committed hour of sink 1
    assert res.skipped[first] and not res.committed[first]

    got, exp = _sink_frames(spark, broken_dir), _sink_frames(spark, clean_dir)
    for name in ROUTES:
        pd.testing.assert_frame_equal(got[name], exp[name])


def test_rerun_is_noop(spark, transcripts, tmp_path):
    out = str(tmp_path / "rerun")
    run_pipeline(spark, transcripts, out)
    before = _sink_frames(spark, out)
    res = run_pipeline(spark, transcripts, out)  # full rerun
    assert all(not hours for hours in res.committed.values())  # nothing rewritten
    after = _sink_frames(spark, out)
    for name in ROUTES:
        pd.testing.assert_frame_equal(before[name], after[name])


def test_empty_input_is_clean_noop(spark, transcripts, tmp_path):
    out = str(tmp_path / "empty")
    empty = transcripts.filter("1 = 0")
    res = run_pipeline(spark, empty, out)
    assert res.sink_counts == {name: 0 for name in ROUTES}
    assert all(not v for v in res.committed.values())


def test_orphan_gc(spark, transcripts, tmp_path):
    import os

    from log_aggregation_pipeline_spark.plans.pipeline import gc_orphan_runs

    out = str(tmp_path / "gc")
    run_pipeline(spark, transcripts, out)
    # fake a crashed write: an unreferenced run dir + an uncommitted
    # sink subdir inside a live run
    orphan = os.path.join(out, "sinks", "run=deadbeef", "sink=errors")
    os.makedirs(orphan)
    live_run = next(
        d for d in os.listdir(os.path.join(out, "sinks")) if d != "run=deadbeef"
    )
    ghost_sink = os.path.join(out, "sinks", live_run, "sink=ghost")
    os.makedirs(ghost_sink)
    removed = gc_orphan_runs(out)
    assert "run=deadbeef" in removed
    assert f"{live_run}/sink=ghost" in removed
    assert not os.path.exists(orphan) and not os.path.exists(ghost_sink)
    # committed data untouched
    assert read_sink(spark, out, "errors").count() > 0


def test_zstd_codec(spark, transcripts, tmp_path):
    out = str(tmp_path / "z")
    res = run_pipeline(spark, transcripts, out, codec="zstd")
    assert read_sink(spark, out, "errors").count() == res.sink_counts["errors"]


def test_aggs_written(spark, transcripts, tmp_path):
    out = str(tmp_path / "aggs")
    run_pipeline(spark, transcripts, out)
    for name in ROUTES:
        agg = read_agg(spark, out, name)
        sink = read_sink(spark, out, name)
        assert agg.agg({"n_turns": "sum"}).first()[0] == sink.count()
