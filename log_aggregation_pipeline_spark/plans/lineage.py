"""Lineage manifest + checkpoint-based resume (SURVEY.md §2.9 R3).

The reference checkpoints file byte-offsets
(/root/reference/internal/agent/tailer/tailer.go:47-55, 403-435:
``FileState{path, offset, inode}`` JSON, resume-seek at :228-237).  The
batch analog is an Iceberg-style **snapshot commit**: each sink write
publishes ONE manifest file (atomic ``os.replace``) containing a
lineage record per hour partition written (n_rows, min/max ts).  On
restart, hours present in any committed manifest are skipped — same
"don't redo what's done" semantics.

Crash safety: rows land directly in the sink table via *dynamic
partition overwrite*, so a write that crashed before its manifest
landed leaves orphan hour dirs which the next run simply overwrites
(they are recomputed — publish is idempotent).  Committed hours are
filtered out before the write and therefore never touched again.

The manifest doubles as the **lineage/metrics** table (rows per
partition per sink).  On real Iceberg this file is replaced by the
table's own snapshot/manifest machinery; the protocol is deliberately
format-agnostic (SURVEY.md §7).
"""

from __future__ import annotations

import json
import os
import time
import uuid

import pandas as pd

MANIFEST_DIRNAME = "_lineage"

_COLUMNS = [
    "sink", "hour_key", "n_rows", "min_ts", "max_ts", "run_id", "committed_unix",
]


def manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, MANIFEST_DIRNAME)


def _iter_records(out_dir: str):
    d = manifest_dir(out_dir)
    if not os.path.isdir(d):
        return
    for fn in sorted(os.listdir(d)):
        if fn.endswith(".json"):
            with open(os.path.join(d, fn)) as f:
                yield from json.load(f)["records"]


def committed_hours(out_dir: str, sink: str) -> set[str]:
    """hour_keys already committed for a sink."""
    return {r["hour_key"] for r in _iter_records(out_dir) if r["sink"] == sink}


def read_manifest(out_dir: str) -> pd.DataFrame:
    """The lineage table: one row per committed (sink, hour)."""
    return pd.DataFrame(list(_iter_records(out_dir)), columns=_COLUMNS)


def commit_sink_run(out_dir: str, sink: str, run_id: str, records: list[dict]) -> None:
    """Atomically publish one sink write's lineage records."""
    d = manifest_dir(out_dir)
    os.makedirs(d, exist_ok=True)
    doc = {
        "sink": sink,
        "run_id": run_id,
        "committed_unix": time.time(),  # ops metadata only, never data-plane
        "records": [
            {"sink": sink, "run_id": run_id, "committed_unix": time.time(), **r}
            for r in records
        ],
    }
    tmp = os.path.join(d, f".tmp_{uuid.uuid4().hex}")
    with open(tmp, "w") as f:
        json.dump(doc, f)
    os.replace(tmp, os.path.join(d, f"{sink}__{run_id}.json"))
