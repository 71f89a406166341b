#!/usr/bin/env python
"""Benchmark harness.

Default mode (driver contract): run the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and print ONE JSON line::

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "turns_per_sec": ...}

``--scaling`` mode: run the identical end-to-end pipeline at local[8]
and local[32] in fresh subprocesses (one JVM each — two parallelism
levels standing in for N and 4N executors, per BASELINE.md), print both
throughputs and the normalized scaling efficiency, and append the table
to BENCH/SCALING.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time


def _sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def run_bench(sf_dir: str, cores: int, pipeline_only: bool = False) -> dict:
    from pyspark.sql import functions as F

    from log_aggregation_pipeline_spark.session import get_spark
    from log_aggregation_pipeline_spark.operators.agg import (
        conv_hour_agg,
        date_histogram,
        terms_agg,
    )
    from log_aggregation_pipeline_spark.operators.enrich import enrich
    from log_aggregation_pipeline_spark.operators.order import with_turn_order
    from log_aggregation_pipeline_spark.operators.parse import parse_transcripts
    from log_aggregation_pipeline_spark.operators.route import route_one
    from log_aggregation_pipeline_spark.plans.pipeline import run_pipeline
    from log_aggregation_pipeline_spark.sources.transcripts import (
        transcripts_from_events,
    )

    spark = get_spark(app_name=f"lap-bench-{cores}", cores=cores)
    spark.range(1_000_000).count()  # JVM warmup outside all timings

    timings: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        out = fn()
        timings[name] = round(time.perf_counter() - t0, 4)
        return out

    transcripts = transcripts_from_events(spark, sf_dir)
    n_turns = transcripts.count()

    # headline: full parse -> enrich -> route -> aggregate, incl. sink IO
    out_dir = tempfile.mkdtemp(prefix="lap_bench_")
    try:
        timed("pipeline_e2e", lambda: run_pipeline(spark, transcripts, out_dir))
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)

    if not pipeline_only:
        def noop(df):
            df.write.format("noop").mode("overwrite").save()

        parsed = lambda: parse_transcripts(transcripts_from_events(spark, sf_dir))  # noqa: E731
        timed("parse_level_terms", lambda: noop(terms_agg(parsed(), "level")))
        timed("route_errors", lambda: noop(route_one(parsed(), "errors")))
        timed("agg_conv_hour_errors",
              lambda: noop(conv_hour_agg(route_one(parsed(), "errors"))))
        timed("agg_conv_hour_salted",
              lambda: noop(conv_hour_agg(parsed(), salted=True)))
        timed("enrich_rollup",
              lambda: noop(enrich(parsed()).groupBy("role_kind", "tool_family")
                           .agg(F.count("*").alias("n"))))
        timed("turn_order_window",
              lambda: noop(with_turn_order(
                  transcripts_from_events(spark, sf_dir), prev_text=True)))
        timed("date_histogram_hour",
              lambda: noop(date_histogram(
                  spark.read.parquet(f"{sf_dir}/events.parquet"), "ts", "hour")))

    spark.stop()
    total = round(sum(timings.values()), 4)
    return {
        "metric": "parse_route_aggregate_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": _sf_from_dir(sf_dir),
        "cores": cores,
        "n_turns": n_turns,
        "turns_per_sec": round(n_turns / timings["pipeline_e2e"], 1),
    }


def run_scaling(sf_dir: str, levels: tuple[int, int] = (8, 32)) -> dict:
    """Identical job, two parallelism levels, fresh JVM each."""
    results = {}
    for cores in levels:
        out = subprocess.run(
            [sys.executable, __file__, "--cores", str(cores), "--sf-dir", sf_dir,
             "--pipeline-only"],
            capture_output=True, text=True, check=True, cwd=os.path.dirname(__file__),
        )
        results[cores] = json.loads(out.stdout.strip().splitlines()[-1])
    lo, hi = levels
    thr_lo = results[lo]["turns_per_sec"]
    thr_hi = results[hi]["turns_per_sec"]
    eff = round((thr_hi / thr_lo) / (hi / lo), 3)
    report = {
        "sf": results[lo]["sf"],
        "n_turns": results[lo]["n_turns"],
        f"turns_per_sec_local{lo}": thr_lo,
        f"turns_per_sec_local{hi}": thr_hi,
        "speedup": round(thr_hi / thr_lo, 3),
        "cores_ratio": hi / lo,
        "scaling_efficiency": eff,
    }
    os.makedirs(os.path.join(os.path.dirname(__file__), "BENCH"), exist_ok=True)
    md = os.path.join(os.path.dirname(__file__), "BENCH", "SCALING.md")
    with open(md, "a") as f:
        f.write(
            f"\n| sf={report['sf']} | {report['n_turns']} turns "
            f"| local[{lo}]: {thr_lo} turns/s | local[{hi}]: {thr_hi} turns/s "
            f"| speedup {report['speedup']}x / {hi//lo}x cores "
            f"| efficiency {eff} |\n"
        )
    return report


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cores", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--pipeline-only", action="store_true")
    ap.add_argument("--scaling", action="store_true")
    args = ap.parse_args()
    if args.scaling:
        print(json.dumps(run_scaling(args.sf_dir)))
    else:
        print(json.dumps(run_bench(args.sf_dir, args.cores, args.pipeline_only)))


if __name__ == "__main__":
    main()
