"""SparkSession factory tuned for this engine.

Defaults follow the scale posture in SURVEY.md §4: AQE on (runtime
re-plan + skew-join splitting), Arrow on (every pandas UDF is an Arrow
batch exchange), UTC session timezone (the DuckDB oracle compares
UTC-naive timestamps), and shuffle partitions sized to cores instead of
the 200 default.  On a real cluster the same builder is used with
``master=None`` so spark-submit's ``--master`` wins.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Arrow batch size: 10k rows/batch keeps each pandas-UDF invocation in
# L2-friendly territory while amortizing the Python call overhead.
_ARROW_BATCH = "10000"


def get_spark(
    app_name: str = "log_aggregation_pipeline_spark",
    master: str | None = None,
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    ``cores`` only matters for local mode; on a cluster the resource
    manager decides.  ``shuffle_partitions`` defaults to cores in local
    mode (no network shuffle, so more buys nothing) and should be set
    to ~2-3x total executor cores on a real cluster.
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cores}]")
    if shuffle_partitions is None:
        shuffle_partitions = cores

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", _ARROW_BATCH)
        # local mode = single JVM; driver memory is the only knob.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # PySpark's per-API-call site capture (error-message
        # enrichment) costs a Python stack inspection PLUS 1-2 extra
        # py4j round-trips on EVERY DataFrame/Column call — measured
        # (r8): plan CONSTRUCTION of the literal-heavy embedding
        # queries dropped 4.2 s -> 1.8 s with it off, and every query
        # builder gets proportionally cheaper.  Pure diagnostics (the
        # error itself is unchanged, only the "called from user
        # line N" decoration is lost) — the production default for an
        # engine, not a benchmark-only trick.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
