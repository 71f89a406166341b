"""Time-partitioned table store (SURVEY.md §2.1 S7-S10).

The reference's FileStore appends gob rows to one file per hour
partition (/root/reference/internal/server/storage/store.go:131-177,
partition key ``"2006-01-02-15"`` at :301), prunes partitions by query
time range (:327-337), keeps an id index for point lookups (:91-102)
and deletes expired partitions for retention (:253-272).

Spark-side, the same semantics on columnar storage:

- Write: hour-partitioned parquet (hive layout) — or Iceberg
  ``PARTITIONED BY (hours(ts))`` when a catalog with the runtime jar
  exists (not in this image; the switch is ``format="iceberg"``).
- Pruned scan: ``WHERE ts BETWEEN`` — Catalyst prunes hour dirs via
  the partition column, row groups via parquet min/max stats.
- Point lookup: predicate on the content-derived id; parquet column
  stats replace the in-memory index.
- Retention: partition-level delete (metadata-only directory drop).

The pipeline's high-throughput sink path uses the run-manifest layout
in ``plans.pipeline`` instead; this class is the query-store
abstraction for standalone table management.
"""

from __future__ import annotations

import os
import shutil
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

HOUR_KEY_FMT = "yyyy-MM-dd-HH"
_HOUR_PY_FMT = "%Y-%m-%d-%H"


def iceberg_runtime_available(spark: SparkSession) -> bool:
    """True when the Iceberg Spark runtime jar is on the JVM
    classpath.  The environment this repo builds in has no jar
    (re-verified each round), so the ``fmt='iceberg'`` switch fails
    loudly instead of half-working; when a jar appears this probe
    flips and the snapshot-based resume/retention path can be wired
    and tested (SURVEY.md §1.3)."""
    try:
        spark.sparkContext._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:  # noqa: BLE001 — ClassNotFound via py4j
        return False


class HourPartitionedTable:
    def __init__(self, spark: SparkSession, path: str, fmt: str = "parquet"):
        if fmt == "iceberg" and not iceberg_runtime_available(spark):
            raise NotImplementedError(
                "Iceberg runtime jar not on the classpath; use fmt='parquet' "
                "(identical layout/semantics, SURVEY.md §7)"
            )
        if fmt == "iceberg":  # pragma: no cover - jar not in this image
            raise NotImplementedError(
                "Iceberg jar detected but the snapshot write path is not "
                "wired yet — implement write/scan/expire via the Iceberg "
                "catalog API before using fmt='iceberg'"
            )
        self.spark = spark
        self.path = path
        self.fmt = fmt

    # -- S7 write ------------------------------------------------------
    def write(
        self,
        df: DataFrame,
        ts_col: str = "ts",
        mode: str = "append",
        bloom_cols: tuple[str, ...] = (),
    ) -> None:
        """``bloom_cols`` adds parquet bloom filters for those columns
        — the store.go:91-102 id-index analog: a point lookup on a
        high-cardinality column then skips row groups whose bloom
        excludes the value, instead of scanning min/max ranges that a
        hash-shaped id never narrows."""
        w = (
            df.withColumn("hour_key", F.date_format(ts_col, HOUR_KEY_FMT))
            .repartition(F.col("hour_key"))
            .write.mode(mode)
            .option("partitionOverwriteMode", "dynamic")
        )
        for c in bloom_cols:
            w = w.option(f"parquet.bloom.filter.enabled#{c}", "true")
        w.partitionBy("hour_key").parquet(self.path)

    # -- S8 pruned scan --------------------------------------------------
    def scan(self, start=None, end=None) -> DataFrame:
        """Closed [start, end] range (common.go:53-55); the predicate on
        both the partition key and ts gives dir-level pruning plus
        row-group skipping."""
        df = self.spark.read.parquet(self.path)
        if start is not None:
            df = df.filter(
                (F.col("hour_key") >= _hour_key(start, floor=True))
                & (F.col("ts") >= F.lit(start))
            )
        if end is not None:
            df = df.filter(
                (F.col("hour_key") <= _hour_key(end, floor=True))
                & (F.col("ts") <= F.lit(end))
            )
        return df

    # -- S9 point lookup --------------------------------------------------
    def get(self, entry_id: str, id_col: str = "id") -> DataFrame:
        return self.spark.read.parquet(self.path).filter(
            F.col(id_col) == F.lit(entry_id)
        ).limit(1)

    # -- S10 retention ------------------------------------------------------
    def expire(self, cutoff: datetime | str) -> list[str]:
        """Drop whole partitions strictly older than cutoff's hour —
        metadata-only, like store.go:253-272 (file unlink per
        partition).  Returns dropped hour keys."""
        cut = _hour_key_str(cutoff)
        dropped = []
        if not os.path.isdir(self.path):
            return dropped
        for d in sorted(os.listdir(self.path)):
            if d.startswith("hour_key=") and d.split("=", 1)[1] < cut:
                shutil.rmtree(os.path.join(self.path, d), ignore_errors=True)
                dropped.append(d.split("=", 1)[1])
        return dropped

    # -- maintenance: small-file compaction ------------------------------
    def compact(
        self, target_rows_per_file: int = 1_000_000, min_files: int = 2
    ) -> dict[str, int]:
        """Rewrite fragmented hour partitions into few right-sized
        files — the maintenance op every append-heavy store needs
        (each micro-batch/append lands its own file; thousands of tiny
        files turn scans into metadata storms).  Iceberg calls this
        rewrite_data_files; on the hive layout it is a per-partition
        rewrite + directory swap.

        Per partition with >= ``min_files`` data files: read, coalesce
        to ceil(rows/target_rows_per_file) files, write beside the
        live dir, then swap via two renames.  A crash between the
        renames can leave the partition momentarily absent — this is a
        single-writer MAINTENANCE op (run it like retention, from one
        scheduler slot), not the pipeline's crash-safe manifest sink.
        Healthy partitions cost one listdir.  The driver loop is
        control flow; each rewrite is a distributed job, and partitions
        are independent — at very large partition counts run batches
        of them from a thread pool.

        Returns {hour_key: n_files_before} for compacted partitions."""
        import math

        done: dict[str, int] = {}
        for hk in self.hours():
            pdir = os.path.join(self.path, f"hour_key={hk}")
            # scratch dirs live OUTSIDE the hour_key= namespace with a
            # leading underscore: Spark's file index skips _-prefixed
            # paths, hours()/expire() prefix-match only hour_key=, and
            # a crash can never leave scratch readable as a partition
            tmp = os.path.join(self.path, f"_compact_tmp_{hk}")
            old = os.path.join(self.path, f"_compact_old_{hk}")
            shutil.rmtree(tmp, ignore_errors=True)  # stale crash debris
            shutil.rmtree(old, ignore_errors=True)
            files = [f for f in os.listdir(pdir) if f.endswith(".parquet")]
            if len(files) < min_files:
                continue
            df = self.spark.read.parquet(pdir)
            n_out = max(1, math.ceil(df.count() / target_rows_per_file))
            df.coalesce(n_out).write.mode("overwrite").parquet(tmp)
            os.rename(pdir, old)
            os.rename(tmp, pdir)
            shutil.rmtree(old, ignore_errors=True)
            done[hk] = len(files)
        return done

    def hours(self) -> list[str]:
        if not os.path.isdir(self.path):
            return []
        return sorted(
            d.split("=", 1)[1]
            for d in os.listdir(self.path)
            if d.startswith("hour_key=")
        )


def _hour_key(ts, floor: bool = True):
    return F.lit(_hour_key_str(ts))


def _hour_key_str(ts) -> str:
    if isinstance(ts, str):
        ts = datetime.fromisoformat(ts)
    return ts.strftime(_HOUR_PY_FMT)
