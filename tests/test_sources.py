"""Sources: text scan + envelope lift + hour-partitioned store
(reference tailer/file collector + FileStore semantics)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from log_aggregation_pipeline_spark.functions.ids import deterministic_id
from log_aggregation_pipeline_spark.sources.readers import lift_lines, read_lines
from log_aggregation_pipeline_spark.sources.table import HourPartitionedTable


@pytest.fixture()
def logdir(tmp_path):
    (tmp_path / "app.log").write_text("line one\nline two\n")
    (tmp_path / "app.log.1").write_text("rotated line\n")
    (tmp_path / "debug.tmp").write_text("excluded\n")
    return tmp_path


def test_read_lines_glob_and_exclude(spark, logdir):
    df = read_lines(spark, f"{logdir}/*", exclude_glob="*.tmp")
    raws = {r.raw for r in df.collect()}
    assert raws == {"line one", "line two", "rotated line"}
    # exclude on basename, like file.go:100-107
    assert read_lines(spark, f"{logdir}/*", exclude_glob="app.*").count() == 1


def test_lift_lines_envelope(spark, logdir):
    df = lift_lines(read_lines(spark, f"{logdir}/app.log"), host="h1")
    rows = df.collect()
    assert {r.message for r in rows} == {"line one", "line two"}
    assert all(r.level == "INFO" and r.host == "h1" for r in rows)
    assert len({r.id for r in rows}) == 2  # content-derived, distinct
    # deterministic across reads (unlike the reference's now_ns ids)
    again = {r.id for r in lift_lines(read_lines(spark, f"{logdir}/app.log"), host="h1").collect()}
    assert again == {r.id for r in rows}


def test_hour_table_roundtrip_prune_expire(spark, transcripts, tmp_path):
    table = HourPartitionedTable(spark, str(tmp_path / "t"))
    table.write(transcripts.withColumn("id", deterministic_id()))
    assert len(table.hours()) > 72  # spans >72h (FIXTURES.md)

    total = transcripts.count()
    assert table.scan().count() == total

    # S8: closed-range prune
    got = table.scan("2024-01-01 00:00:00", "2024-01-01 23:59:59")
    exp = transcripts.filter(
        F.col("ts").between("2024-01-01 00:00:00", "2024-01-01 23:59:59")
    )
    assert got.count() == exp.count()
    # partition filter actually reached the plan
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "hour_key" in plan

    # S9: point lookup
    some = transcripts.withColumn("id", deterministic_id()).first()
    assert table.get(some.id).count() == 1

    # S10: retention drops whole partitions
    before = len(table.hours())
    dropped = table.expire("2024-01-02 00:00:00")
    assert dropped and len(table.hours()) == before - len(dropped)
    assert min(table.hours()) >= "2024-01-02-00"
    remaining = table.scan().count()
    kept = transcripts.filter(F.date_format("ts", "yyyy-MM-dd-HH") >= "2024-01-02-00")
    assert remaining == kept.count()


def test_bloom_filter_point_lookup(spark, transcripts, tmp_path):
    """S9 at scale: sink written with a bloom filter on the
    content-derived id; the point lookup pushes the id predicate to
    the scan (bloom row-group skipping happens inside the reader —
    pyarrow in this image does not expose the offsets, so the pinned
    contract is the pushed filter + exact result)."""
    table = HourPartitionedTable(spark, str(tmp_path / "tb"))
    with_id = transcripts.withColumn("id", deterministic_id())
    table.write(with_id, bloom_cols=("id",))
    some = with_id.first()
    got = table.get(some.id)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "id" in plan.split("PushedFilters:")[1].split("]")[0]
    rows = got.collect()
    assert len(rows) == 1 and rows[0]["conv_id"] == some.conv_id


def test_compact_merges_small_files_preserving_rows(spark, transcripts, tmp_path):
    """Three appends fragment each hour partition into 3 files;
    compact() rewrites them to 1, keeping rows, schema, pruning and
    untouched (healthy) partitions intact."""
    import glob
    import os

    table = HourPartitionedTable(spark, str(tmp_path / "tc"))
    third = transcripts.count() // 3
    parts = [
        transcripts.orderBy("conv_id", "turn_idx").limit(third),
        transcripts.orderBy("conv_id", "turn_idx").offset(third).limit(third),
        transcripts.orderBy("conv_id", "turn_idx").offset(2 * third),
    ]
    for p in parts:
        table.write(p)

    key = ["conv_id", "turn_idx"]
    before = spark.read.parquet(table.path)
    a = sorted(map(tuple, before.select(*key).collect()))
    n_before = len(a)
    hours = table.hours()
    frag = {
        hk: len(glob.glob(os.path.join(table.path, f"hour_key={hk}", "*.parquet")))
        for hk in hours
    }
    assert any(v >= 2 for v in frag.values())

    done = table.compact(target_rows_per_file=10_000_000, min_files=2)
    assert set(done) == {hk for hk, v in frag.items() if v >= 2}

    after = spark.read.parquet(table.path)
    assert after.count() == n_before
    for hk in done:
        files = glob.glob(os.path.join(table.path, f"hour_key={hk}", "*.parquet"))
        assert len(files) == 1
    # second pass is a no-op: everything already compacted
    assert table.compact(target_rows_per_file=10_000_000, min_files=2) == {}
    # content identical, not just counts
    b = sorted(map(tuple, after.select(*key).collect()))
    assert a == b


def test_compact_scratch_never_readable_and_debris_cleaned(spark, transcripts, tmp_path):
    """Crash debris from a dead compaction (_compact_old/_tmp dirs) is
    invisible to readers (outside the hour_key= namespace, _-prefixed)
    and cleaned up by the next compact() instead of wedging it."""
    import os

    table = HourPartitionedTable(spark, str(tmp_path / "td"))
    table.write(transcripts)
    table.write(transcripts.limit(10))  # fragment at least one partition
    hk = table.hours()[0]
    # simulate a crash that left both scratch dirs behind
    for d in (f"_compact_tmp_{hk}", f"_compact_old_{hk}"):
        p = os.path.join(table.path, d)
        os.makedirs(p)
        with open(os.path.join(p, "junk.parquet"), "w") as f:
            f.write("not parquet")
    # debris is not a partition: hours() clean, reads fine
    assert all("_compact" not in h for h in table.hours())
    n = spark.read.parquet(table.path).count()
    done = table.compact(target_rows_per_file=10_000_000, min_files=2)
    assert hk in done or done  # the fragmented partition compacts
    assert spark.read.parquet(table.path).count() == n
    assert not os.path.isdir(os.path.join(table.path, f"_compact_old_{hk}"))
    assert not os.path.isdir(os.path.join(table.path, f"_compact_tmp_{hk}"))


def test_iceberg_format_switch_gated_on_jar(spark, tmp_path):
    """SURVEY §1.3: the fmt='iceberg' switch is wired but environment-
    gated — with no runtime jar it must fail loudly (never silently
    fall back to parquet); the snapshot resume/retention tests activate
    when a jar appears."""
    import pytest

    from log_aggregation_pipeline_spark.sources.table import (
        HourPartitionedTable,
        iceberg_runtime_available,
    )

    if iceberg_runtime_available(spark):
        pytest.skip(
            "Iceberg jar present — wire the snapshot write path and "
            "replace this skip with real resume/retention tests"
        )
    # jar absent: the switch must fail loudly (this PASSES — the
    # skipped leg is only the jar-present snapshot suite above)
    with pytest.raises(NotImplementedError, match="Iceberg"):
        HourPartitionedTable(spark, str(tmp_path / "t"), fmt="iceberg")
