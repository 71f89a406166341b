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

Sink contract note: the demo sinks write ``epoch={id}`` dirs with no
manifest gating — idempotent under replay (overwrite) but an in-flight
epoch IS visible to readers.  That is fine for a demo tail; anything
production-shaped must go through the batch sink's manifest commit
(plans.lineage) instead, which keeps half-written data invisible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.levels import normalize_level
from ..operators.parse import parse_syslog

# the push payload shape (reference models.LogEntry, the JSON the HTTP
# endpoint accepts — http.go:156-185)
PUSH_SCHEMA = (
    "id string, source string, host string, ts timestamp, "
    "level string, message string"
)


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


def _syslog_sink(out_dir: str):
    """foreachBatch body shared by every syslog ingress mode: the
    batch engine's ``parse_syslog`` verbatim (PRI decode,
    severity->level table, tag/pid split) -> per-severity parquet."""
    import os

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        parsed = parse_syslog(batch_df, raw_col="raw")
        (
            parsed.write.mode("overwrite")
            .partitionBy("level")
            .parquet(os.path.join(out_dir, f"epoch={epoch_id}"))
        )

    return process


def start_syslog_ingress(
    spark: SparkSession,
    out_dir: str,
    host: str = "127.0.0.1",
    port: int = 9999,
    checkpoint_dir: str | None = None,
):
    """RFC3164 syslog over TCP -> parse -> per-severity parquet sinks
    — reference syslog.go's listener+parse loop as one streaming DAG."""
    import os

    checkpoint_dir = checkpoint_dir or os.path.join(out_dir, "_checkpoint")
    lines = read_socket_lines(spark, host, port)
    return (
        lines.writeStream.foreachBatch(_syslog_sink(out_dir))
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def start_udp_receiver(
    drop_dir: str, host: str = "127.0.0.1", port: int = 0
):
    """Reference syslog.go:96-130 — the 64 KiB UDP datagram listener.

    Spark's socket source is TCP-only, so the datagram leg is a
    receiver thread that spools each datagram to its own file in
    ``drop_dir`` (tmp-write + rename; Spark's file source ignores the
    ``_``-prefixed tmp names) — the standard edge-collector shape
    (receiver -> spool -> engine).  UDP's actual semantics live at the
    receiver where they belong: one datagram = one message (no stream
    framing to split), and a datagram dropped by the network is simply
    never spooled (lossy, no retransmit — unlike the TCP path).

    Returns ``(bound_port, stop_event, thread)``; set the event to
    stop the receiver."""
    import os
    import socket
    import threading

    sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    sock.bind((host, port))
    sock.settimeout(0.2)
    bound = sock.getsockname()[1]
    stop = threading.Event()

    # first start on a fresh drop_dir: create it before the resume scan
    os.makedirs(drop_dir, exist_ok=True)
    # resume the spool index past existing files: restarting at 0 with
    # a persistent drop_dir would os.replace over an unread datagram
    # AND hide the new one (Spark's file source never re-reads a path
    # it has seen)
    start_i = 1 + max(
        (
            int(f[len("dgram_"):-len(".log")])
            for f in os.listdir(drop_dir)
            if f.startswith("dgram_") and f.endswith(".log")
        ),
        default=-1,
    )

    def run():
        i = start_i
        while not stop.is_set():
            try:
                data, _ = sock.recvfrom(65536)  # 64 KiB, syslog.go:96
            except TimeoutError:
                continue
            msg = data.decode("utf-8", "replace").rstrip("\n")
            tmp = os.path.join(drop_dir, f"_tmp_{i}")
            with open(tmp, "w") as f:
                f.write(msg + "\n")
            os.replace(tmp, os.path.join(drop_dir, f"dgram_{i:06d}.log"))
            i += 1
        sock.close()

    t = threading.Thread(target=run, daemon=True)
    t.start()
    return bound, stop, t


def start_udp_syslog_ingress(
    spark: SparkSession,
    drop_dir: str,
    out_dir: str,
    checkpoint_dir: str | None = None,
):
    """The engine half of the UDP path: file-stream over the receiver's
    spool dir -> envelope lift -> the SAME parse/sink stage as the TCP
    ingress (one datagram = one row by construction)."""
    import os

    checkpoint_dir = checkpoint_dir or os.path.join(out_dir, "_checkpoint")
    src = F.lit(f"udp-spool://{drop_dir}")
    lines = spark.readStream.text(drop_dir).select(
        F.md5(F.concat_ws(":", src, F.col("value"))).alias("id"),
        F.col("value").alias("raw"),
        src.alias("source"),
    )
    return (
        lines.writeStream.foreachBatch(_syslog_sink(out_dir))
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def lift_push_entries(
    lines: DataFrame,
    source: str = "http-push",
    host: str = "collector-01",
    default_ts: str = "2024-01-01 00:00:00",
) -> DataFrame:
    """Reference S5 default-filling (http.go handleJSONIngest:169-182 /
    handleTextIngest:192-205) as ONE set of coalesce projections over a
    line feed:

    - a line that parses as a JSON entry takes the JSON path: every
      missing field falls back per-entry (id -> content hash of the
      raw line, source/host -> collector config, level -> INFO);
    - a line that does NOT parse falls through the SAME coalesces to
      the text path (message = raw line, level = INFO) because
      ``from_json`` yields NULL for it — two reference handlers, one
      projection.

    Deliberate divergence: the reference stamps missing timestamps
    with time.Now(); this repo's data plane is wall-clock-free (SURVEY
    §7 determinism rule), so a missing ts gets the configured
    ``default_ts`` literal and replays stay byte-identical."""
    j = F.from_json("value", PUSH_SCHEMA)
    return lines.select(
        j.alias("_j"), F.col("value")
    ).select(
        F.coalesce(F.col("_j.id"), F.md5("value")).alias("id"),
        F.coalesce(F.col("_j.source"), F.lit(source)).alias("source"),
        F.coalesce(F.col("_j.host"), F.lit(host)).alias("host"),
        F.coalesce(
            F.col("_j.ts"), F.lit(default_ts).cast("timestamp")
        ).alias("ts"),
        normalize_level(F.coalesce(F.col("_j.level"), F.lit("INFO"))).alias(
            "level"
        ),
        F.coalesce(F.col("_j.message"), F.col("value")).alias("message"),
        F.col("value").alias("raw"),
    )


def start_http_push_ingress(
    spark: SparkSession,
    drop_dir: str,
    out_dir: str,
    checkpoint_dir: str | None = None,
    **lift_kwargs,
):
    """HTTP-push ingress demo: payload drops (one JSON entry or raw
    text line per row, the body shapes http.go accepts) land as files
    in ``drop_dir`` — the file stream is the webhook receiver analog —
    then default-fill + level normalization + per-level sinks run as
    one streaming DAG.  Production swap-point: the receiver becomes a
    Kafka topic, ``lift_push_entries`` onward is untouched."""
    import os

    checkpoint_dir = checkpoint_dir or os.path.join(out_dir, "_checkpoint")
    lines = spark.readStream.text(drop_dir)
    entries = lift_push_entries(lines, **lift_kwargs)

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        (
            batch_df.write.mode("overwrite")
            .partitionBy("level")
            .parquet(os.path.join(out_dir, f"epoch={epoch_id}"))
        )

    return (
        entries.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
