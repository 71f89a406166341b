"""Socket ingress — the reference's listening sources, streamed.

The reference runs TCP/UDP syslog listeners
(/root/reference/internal/agent/collector/syslog.go:91-185) and an
HTTP push endpoint (internal/server/api/http.go:115-214) whose lines
feed the parse pipeline.  Structured Streaming's socket source is the
same ingress shape: a line-oriented TCP feed lifted into the envelope
and run through the SAME parse/route stages as the batch engine — one
code path, three execution modes (batch scan, file stream, socket
stream).

Scale posture: the socket source is a single-receiver dev/demo source
(Spark docs say as much); at production scale the ingress is a
partitioned log (Kafka source — same DataFrame surface, swap
``format("socket")`` for ``format("kafka")`` and the parse/route
stages are untouched).  That swap-point is the whole design: ingress
is a FORMAT, the engine is the DAG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.parse import parse_syslog


def read_socket_lines(
    spark: SparkSession, host: str = "127.0.0.1", port: int = 9999
) -> DataFrame:
    """One row per received line, with the envelope columns the file
    reader produces (id is content-derived — SURVEY.md §7: never
    wall-clock — so replays dedup instead of duplicating)."""
    raw = (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
    )  # column: value
    src = F.lit(f"socket://{host}:{port}")
    return raw.select(
        F.md5(F.concat_ws(":", src, F.col("value"))).alias("id"),
        F.col("value").alias("raw"),
        src.alias("source"),
    )


def start_syslog_ingress(
    spark: SparkSession,
    out_dir: str,
    host: str = "127.0.0.1",
    port: int = 9999,
    checkpoint_dir: str | None = None,
):
    """RFC3164 syslog over TCP -> parse -> per-severity parquet sinks.

    The parse stage is the batch engine's ``parse_syslog`` verbatim
    (PRI decode, severity->level table, tag/pid split) applied inside
    ``foreachBatch`` — reference syslog.go's listener+parse loop as
    one streaming DAG."""
    import os

    checkpoint_dir = checkpoint_dir or os.path.join(out_dir, "_checkpoint")
    lines = read_socket_lines(spark, host, port)

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        parsed = parse_syslog(batch_df, raw_col="raw")
        (
            parsed.write.mode("overwrite")
            .partitionBy("level")
            .parquet(os.path.join(out_dir, f"epoch={epoch_id}"))
        )

    return (
        lines.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
