#!/usr/bin/env python
"""Cold-plan band sweep: fresh JVM per rep, single-shot per query.

Usage: python scripts/coldplan_sweep.py [--sf DIR] [--reps N] name...

Each (query, rep) runs in its OWN subprocess/JVM so every measurement
pays the query's full codegen cost — the cost the driver's
correctness single-shots pay (cross-query codegen-cache warming hides
it inside a shared session; repo gotcha since r3).  Session startup
and input-count warmup are excluded from the timing.  Prints one JSON
line per query: {"name", "sf", "reps": [...], "best", "median"} —
paste the bands into BENCH/METHODOLOGY.md so cross-round deltas on
these entries are adjudicable.
"""

from __future__ import annotations

import argparse
import json
import statistics
import subprocess
import sys

_CHILD = r"""
import sys, time
sys.path.insert(0, sys.argv[3])  # repo root, passed by the parent
name, sf = sys.argv[1], sys.argv[2]
from log_aggregation_pipeline_spark.session import get_spark
import __spark_entry__ as E
spark = get_spark(app_name=f"coldplan-{name}", cores=8,
                  shuffle_partitions=8)
spark.range(1_000_000).count()  # JVM warmup outside the timing
t0 = time.perf_counter()
df = E.queries()[name](spark, sf)
df.write.format("noop").mode("overwrite").save()
print(f"COLDPLAN {time.perf_counter() - t0:.4f}")
for f in getattr(df, "lap_persisted", ()):
    f.unpersist()
spark.stop()
"""


def one_rep(name: str, sf: str) -> float:
    import pathlib

    repo = str(pathlib.Path(__file__).resolve().parents[1])
    # no check=True: a nonzero child (query-name typo, Spark failure)
    # must surface its captured stderr tail, not a bare exit code
    out = subprocess.run(
        [sys.executable, "-c", _CHILD, name, sf, repo],
        capture_output=True, text=True,
    )
    for line in out.stdout.splitlines():
        if line.startswith("COLDPLAN "):
            return float(line.split()[1])
    raise RuntimeError(
        f"no timing line for {name} (exit {out.returncode}): "
        f"{out.stderr[-500:]}"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()
    for name in args.names:
        reps = [round(one_rep(name, args.sf), 3) for _ in range(args.reps)]
        print(json.dumps({
            "name": name, "sf": args.sf, "reps": reps,
            "best": min(reps), "median": round(statistics.median(reps), 3),
        }), flush=True)


if __name__ == "__main__":
    main()
