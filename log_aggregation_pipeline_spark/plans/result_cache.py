"""Materialized query-result cache (reference parity: the query
service's in-memory result cache, /root/reference/internal/server/
query/query.go:40-51,265-307 — 5-minute TTL, mutex-guarded map).

The Spark analog is a tiny materialized-view layer: a query's result
DataFrame is written once as parquet under a key derived from the FULL
query spec, committed atomically (write to tmp dir + ``os.replace`` of
a manifest file — the same commit protocol as plans.lineage), and
served from the parquet scan on every later call with the same
(key, version).

Two reference bugs are deliberately fixed, not reproduced:

- **Stale-page bug**: the reference's cache key ignores limit/offset
  (query.go:52-58 builds the key from filters only), so page 2 can be
  served page 1's rows.  Here the caller passes the full spec and the
  key is md5 over ALL of it.
- **Staleness**: the reference serves up-to-TTL-old results regardless
  of writes.  Here ``version`` ties an entry to the input's state —
  pass the sink's lineage manifest fingerprint
  (``table_version(out_dir)``) and any new committed run invalidates
  the entry deterministically.  No wall-clock in the decision path.

Eviction: ``max_entries`` LRU by commit sequence number (a counter
persisted in each manifest — not mtime, so eviction order is
deterministic too).  On top of version invalidation, entries can be
bounded by AGE — ``ttl_commits`` (per entry, or a cache-wide default)
expires an entry once more than that many commits have happened since
it was written (commit distance, not wall-clock — deterministic) —
and dropped explicitly via ``invalidate(spec)``.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import lineage as L


def query_key(spec: dict | str) -> str:
    """md5 over the FULL query spec (filters AND limit/offset AND
    projection — the stale-page fix)."""
    blob = spec if isinstance(spec, str) else json.dumps(spec, sort_keys=True)
    return hashlib.md5(blob.encode()).hexdigest()


def table_version(out_dir: str) -> str:
    """Deterministic fingerprint of a sink table's committed state:
    md5 over the sorted (sink, hour, run_id) manifest rows.  Any new
    commit changes it; identical state always hashes identically."""
    man = L.read_manifest(out_dir)
    if man.empty:
        return "empty"
    rows = sorted(
        zip(man["sink"], man["hour_key"], man["run_id"], man["n_rows"])
    )
    return hashlib.md5(json.dumps(rows, default=str).encode()).hexdigest()


class ResultCache:
    def __init__(
        self,
        spark: SparkSession,
        cache_dir: str,
        max_entries: int = 64,
        ttl_commits: int | None = None,
    ):
        self.spark = spark
        self.dir = cache_dir
        self.max_entries = max_entries
        # default age bound (commit distance) for entries that don't
        # set their own; None = entries never age out
        self.ttl_commits = ttl_commits
        os.makedirs(cache_dir, exist_ok=True)

    # -- internal layout: <dir>/<key>/{manifest.json, data/} ------------
    def _entry(self, key: str) -> str:
        return os.path.join(self.dir, key)

    def _manifest(self, key: str) -> dict | None:
        p = os.path.join(self._entry(key), "manifest.json")
        if not os.path.isfile(p):
            return None
        with open(p) as f:
            return json.load(f)

    # -- commit clock ---------------------------------------------------
    # A single persisted counter (<dir>/_seq) is the cache's commit
    # clock: ticked on EVERY commit, including one that replaces or
    # re-commits the highest-seq entry — deriving the clock from
    # max(manifest seq) instead would stall it in exactly that case
    # (remove-then-recommit reuses the number), undercounting
    # ttl_commits age for every other entry.  It also makes the age
    # check one file read instead of an O(entries) manifest sweep per
    # lookup.  Single-writer, like the rest of the commit protocol.
    def _seq_path(self) -> str:
        return os.path.join(self.dir, "_seq")

    def _clock(self) -> int:
        """Commit count so far (0 for a fresh cache).  Migrates a
        pre-counter cache dir by deriving from existing manifests."""
        p = self._seq_path()
        if os.path.isfile(p):
            with open(p) as f:
                return int(f.read())
        seqs = [
            m["seq"]
            for k in os.listdir(self.dir)
            if (m := self._manifest(k)) is not None
        ]
        return max(seqs, default=0)

    def _tick(self) -> int:
        """Advance the clock; returns the new commit's seq."""
        c = self._clock() + 1
        tmp = os.path.join(self.dir, "_tmp_seq")
        with open(tmp, "w") as f:
            f.write(str(c))
        os.replace(tmp, self._seq_path())
        return c

    def lookup(self, spec: dict | str, version: str) -> DataFrame | None:
        """Committed result for (spec, version), else None.  Misses on
        version mismatch, on an aged-out entry (commit distance beyond
        its ttl), and — belt and braces — on a torn entry whose data
        dir is missing (the write ordering makes that state unreachable
        via this code, but an external deletion must read as a miss,
        not a broken DataFrame)."""
        key = query_key(spec)
        m = self._manifest(key)
        if m is None or m["version"] != version:
            return None
        ttl = m.get("ttl", self.ttl_commits)
        if ttl is not None and self._clock() - m["seq"] > ttl:
            return None
        data = os.path.join(self._entry(key), "data")
        if not os.path.isdir(data):
            return None
        return self.spark.read.parquet(data)

    def invalidate(self, spec: dict | str) -> bool:
        """Explicitly drop the entry for ``spec`` (any version).
        Manifest goes first so a crash mid-invalidate still reads as a
        miss.  Returns whether an entry existed."""
        entry = self._entry(query_key(spec))
        man = os.path.join(entry, "manifest.json")
        existed = os.path.isfile(man)
        if existed:
            os.remove(man)
        shutil.rmtree(entry, ignore_errors=True)
        return existed

    def get_or_compute(
        self,
        spec: dict | str,
        version: str,
        compute: Callable[[], DataFrame],
        ttl_commits: int | None = None,
    ) -> DataFrame:
        """Serve the materialized result, or compute-materialize-serve.

        A version mismatch (input advanced) recomputes and atomically
        replaces the entry; a crash mid-write leaves the entry either
        fully old or invisible, never torn: the OLD manifest is removed
        BEFORE the old data dir is touched, so no interleaving leaves a
        manifest pointing at missing/half-replaced data.

        ``ttl_commits`` (else the cache default) is stored in the
        manifest: once more than that many commits have happened since,
        lookups miss and the next call recomputes.
        """
        hit = self.lookup(spec, version)
        if hit is not None:
            return hit
        key = query_key(spec)
        entry = self._entry(key)
        data = os.path.join(entry, "data")
        man = os.path.join(entry, "manifest.json")
        tmp = os.path.join(entry, "_tmp_data")
        os.makedirs(entry, exist_ok=True)
        compute().write.mode("overwrite").parquet(tmp)
        # commit order matters: invalidate (remove manifest) -> swap
        # data -> publish new manifest.  A crash at any point leaves
        # either the intact old entry or a manifest-less (= invisible,
        # recomputed next call) one — never a manifest over missing data.
        if os.path.isfile(man):
            os.remove(man)
        shutil.rmtree(data, ignore_errors=True)
        os.replace(tmp, data)
        man_tmp = os.path.join(entry, "_tmp_manifest.json")
        ttl = self.ttl_commits if ttl_commits is None else ttl_commits
        with open(man_tmp, "w") as f:
            json.dump(
                {"version": version, "seq": self._tick(), "key": key,
                 "ttl": ttl},
                f,
            )
        os.replace(man_tmp, man)
        self._evict()
        return self.spark.read.parquet(data)

    def _evict(self) -> list[str]:
        """Drop oldest-committed entries beyond max_entries (LRU by
        commit sequence — deterministic, no wall-clock)."""
        entries = sorted(
            (
                (m["seq"], k)
                for k in os.listdir(self.dir)
                if (m := self._manifest(k)) is not None
            ),
        )
        dropped = []
        while len(entries) > self.max_entries:
            _, k = entries.pop(0)
            shutil.rmtree(self._entry(k), ignore_errors=True)
            dropped.append(k)
        return dropped
