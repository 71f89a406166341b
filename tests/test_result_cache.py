"""Materialized result cache: hit/miss, stale-page fix, versioned
invalidation, crash invisibility, deterministic eviction."""

from __future__ import annotations

import os

from log_aggregation_pipeline_spark.plans.result_cache import (
    ResultCache,
    query_key,
    table_version,
)


def _df(spark, n):
    return spark.range(n).selectExpr("id", "id * 2 AS v")


def test_hit_serves_materialized_without_recompute(spark, tmp_path):
    cache = ResultCache(spark, str(tmp_path / "rc"))
    calls = []

    def compute():
        calls.append(1)
        return _df(spark, 10)

    spec = {"q": "level:ERROR", "limit": 10, "offset": 0}
    a = cache.get_or_compute(spec, "v1", compute).collect()
    b = cache.get_or_compute(spec, "v1", compute).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len(calls) == 1  # second call was a cache read


def test_limit_offset_in_key_fixes_stale_page_bug(spark, tmp_path):
    """Reference bug (query.go:52-58): key ignores limit/offset, so
    page 2 serves page 1.  Our key covers the full spec."""
    cache = ResultCache(spark, str(tmp_path / "rc"))
    p1 = {"q": "x", "limit": 10, "offset": 0}
    p2 = {"q": "x", "limit": 10, "offset": 10}
    assert query_key(p1) != query_key(p2)
    cache.get_or_compute(p1, "v1", lambda: _df(spark, 1))
    assert cache.lookup(p2, "v1") is None  # page 2 is NOT page 1's entry


def test_version_invalidation_on_new_commit(spark, tmp_path):
    cache = ResultCache(spark, str(tmp_path / "rc"))
    spec = {"q": "agg"}
    first = cache.get_or_compute(spec, "v1", lambda: _df(spark, 5)).count()
    assert first == 5
    # input advanced -> version changes -> recompute, entry replaced
    second = cache.get_or_compute(spec, "v2", lambda: _df(spark, 7)).count()
    assert second == 7
    assert cache.lookup(spec, "v1") is None
    assert cache.lookup(spec, "v2").count() == 7


def test_table_version_tracks_commits(spark, tmp_path, transcripts):
    from log_aggregation_pipeline_spark.plans.pipeline import run_pipeline

    out = str(tmp_path / "out")
    v0 = table_version(out)
    run_pipeline(spark, transcripts.limit(200), out, write_aggs=False,
                 emit_metrics=False)
    v1 = table_version(out)
    assert v0 == "empty" and v1 != v0
    assert table_version(out) == v1  # stable when nothing new commits


def test_crash_leaves_no_visible_entry(spark, tmp_path):
    cache = ResultCache(spark, str(tmp_path / "rc"))
    spec = {"q": "boom"}

    class Boom(RuntimeError):
        pass

    def explode():
        raise Boom()

    try:
        cache.get_or_compute(spec, "v1", explode)
    except Boom:
        pass
    assert cache.lookup(spec, "v1") is None  # no manifest => invisible


def test_invalidate_forces_recompute(spark, tmp_path):
    cache = ResultCache(spark, str(tmp_path / "rc"))
    spec = {"q": "inv"}
    calls = []

    def compute():
        calls.append(1)
        return _df(spark, 3)

    cache.get_or_compute(spec, "v1", compute)
    assert cache.invalidate(spec) is True
    assert cache.lookup(spec, "v1") is None
    cache.get_or_compute(spec, "v1", compute)
    assert len(calls) == 2
    assert cache.invalidate({"q": "never-written"}) is False


def test_ttl_commits_ages_entries_out(spark, tmp_path):
    """Per-entry age bound in COMMIT DISTANCE (no wall-clock): the
    entry survives ttl_commits later commits, misses after."""
    cache = ResultCache(spark, str(tmp_path / "rc"))
    spec = {"q": "old"}
    cache.get_or_compute(spec, "v1", lambda: _df(spark, 2), ttl_commits=2)
    cache.get_or_compute({"q": "a"}, "v", lambda: _df(spark, 1))
    cache.get_or_compute({"q": "b"}, "v", lambda: _df(spark, 1))
    assert cache.lookup(spec, "v1") is not None  # distance 2 == ttl
    cache.get_or_compute({"q": "c"}, "v", lambda: _df(spark, 1))
    assert cache.lookup(spec, "v1") is None  # distance 3 > ttl
    # recompute re-commits with a fresh seq
    n = cache.get_or_compute(spec, "v1", lambda: _df(spark, 9), ttl_commits=2).count()
    assert n == 9 and cache.lookup(spec, "v1") is not None


def test_externally_torn_entry_reads_as_miss(spark, tmp_path):
    import shutil

    cache = ResultCache(spark, str(tmp_path / "rc"))
    spec = {"q": "torn"}
    cache.get_or_compute(spec, "v1", lambda: _df(spark, 2))
    shutil.rmtree(os.path.join(cache._entry(query_key(spec)), "data"))
    assert cache.lookup(spec, "v1") is None  # miss, not a broken scan
    assert cache.get_or_compute(spec, "v1", lambda: _df(spark, 4)).count() == 4


def test_crash_between_data_swap_steps_is_invisible(spark, tmp_path, monkeypatch):
    """The ADVICE torn-write scenario: crash AFTER the old data dir is
    removed but BEFORE the new one is published.  Because the manifest
    is removed first, the entry reads as a plain miss and recomputes."""
    import shutil as sh

    cache = ResultCache(spark, str(tmp_path / "rc"))
    spec = {"q": "crash"}
    cache.get_or_compute(spec, "v1", lambda: _df(spark, 2))
    real = sh.rmtree

    def boom(path, *a, **k):
        real(path, *a, **k)
        raise RuntimeError("crash after old data removed")

    monkeypatch.setattr(
        "log_aggregation_pipeline_spark.plans.result_cache.shutil.rmtree", boom
    )
    try:
        cache.get_or_compute(spec, "v2", lambda: _df(spark, 5))
        raise AssertionError("expected injected crash")
    except RuntimeError:
        pass
    monkeypatch.undo()
    assert cache.lookup(spec, "v1") is None
    assert cache.lookup(spec, "v2") is None
    assert cache.get_or_compute(spec, "v2", lambda: _df(spark, 5)).count() == 5


def test_eviction_is_lru_by_commit_seq(spark, tmp_path):
    cache = ResultCache(spark, str(tmp_path / "rc"), max_entries=2)
    for i in range(3):
        cache.get_or_compute({"q": f"q{i}"}, "v", lambda i=i: _df(spark, i + 1))
    assert cache.lookup({"q": "q0"}, "v") is None  # oldest evicted
    assert cache.lookup({"q": "q1"}, "v") is not None
    assert cache.lookup({"q": "q2"}, "v") is not None
    entries = [d for d in os.listdir(cache.dir) if not d.startswith("_")]
    assert len(entries) == 2  # _seq clock file is not an entry


def test_recommitting_newest_entry_still_ages_others(spark, tmp_path):
    """Regression: the commit clock must tick on EVERY commit.  Deriving
    it from max(manifest seq) stalls when the HIGHEST-seq entry is
    replaced (remove-then-recommit reuses the number), so other
    entries' ttl_commits age is undercounted."""
    cache = ResultCache(spark, str(tmp_path / "rc"), ttl_commits=1)
    a, b = {"q": "a"}, {"q": "b"}
    cache.get_or_compute(a, "v", lambda: _df(spark, 1))   # commit 1
    cache.get_or_compute(b, "v1", lambda: _df(spark, 2))  # commit 2
    # b's input advances -> recompute b (the newest entry) -> commit 3
    cache.get_or_compute(b, "v2", lambda: _df(spark, 3))
    # 2 commits have happened since a was written: past ttl_commits=1
    assert cache.lookup(a, "v") is None
    assert cache.lookup(b, "v2") is not None
