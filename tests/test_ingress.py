"""Socket ingress: RFC3164 lines over TCP -> envelope -> syslog parse
-> per-severity sinks, exercising the reference's listener surface
(syslog.go:91-185) through Structured Streaming's socket source."""

from __future__ import annotations

import glob
import os
import socket
import threading
import time

LINES = [
    "<34>Jan  5 10:15:00 web01 sshd[123]: auth failure root",   # sev 2 -> FATAL
    "<11>Jan  5 10:15:01 web01 app: boom code=E042",            # sev 3 -> ERROR
    "<13>Jan  5 10:15:02 db01 cron[7]: job ok",                 # sev 5 -> INFO
    "<15>Jan  5 10:15:03 db01 dbg: verbose detail",             # sev 7 -> DEBUG
]


def _serve_once(port: int, payload: bytes) -> threading.Thread:
    """Accept one client (the Spark socket receiver) and write the
    payload, keeping the connection open long enough to be read."""
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", port))
    srv.listen(1)

    def run():
        conn, _ = srv.accept()
        try:
            conn.sendall(payload)
            time.sleep(8)  # keep open until the micro-batch drains
        finally:
            conn.close()
            srv.close()

    t = threading.Thread(target=run, daemon=True)
    t.start()
    return t


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_udp_syslog_ingress(spark, tmp_path):
    """UDP datagram leg (syslog.go:96-130): receiver thread spools one
    file per datagram (datagram framing, no stream splitting), the
    file stream runs the same parse/sink stage as the TCP path."""
    from log_aggregation_pipeline_spark.streaming.ingress import (
        start_udp_receiver,
        start_udp_syslog_ingress,
    )

    drop = tmp_path / "udp_drop"
    drop.mkdir()
    out = str(tmp_path / "udp_out")
    port, stop, _t = start_udp_receiver(str(drop))
    cli = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    try:
        for line in LINES:
            cli.sendto(line.encode(), ("127.0.0.1", port))
        deadline = time.time() + 10
        while (time.time() < deadline
               and len(glob.glob(str(drop / "dgram_*.log"))) < len(LINES)):
            time.sleep(0.1)
        assert len(glob.glob(str(drop / "dgram_*.log"))) == len(LINES)
    finally:
        cli.close()

    q = start_udp_syslog_ingress(spark, str(drop), out)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        stop.set()

    rows = spark.read.option("basePath", out).parquet(
        os.path.join(out, "epoch=*")
    ).collect()
    assert sorted(r.level for r in rows) == ["DEBUG", "ERROR", "FATAL", "INFO"]
    by_level = {r.level: r for r in rows}
    assert by_level["FATAL"].syslog_host == "web01"
    assert by_level["ERROR"].message == "app: boom code=E042"
    assert len({r.id for r in rows}) == len(LINES)


def test_http_push_ingress_default_filling(spark, tmp_path):
    """S5 demo: JSON/text payload drops -> coalesce default-filling ->
    per-level sinks, live across two micro-batches (a second drop
    arrives while the stream runs)."""
    import json

    from log_aggregation_pipeline_spark.streaming.ingress import (
        start_http_push_ingress,
    )

    drop = tmp_path / "drop"
    drop.mkdir()
    out = str(tmp_path / "push_out")
    full = {"id": "given-1", "source": "svcA", "host": "h9",
            "ts": "2024-02-01 12:00:00", "level": "err", "message": "boom"}
    sparse = {"message": "partial entry"}  # everything else defaulted
    batch1 = [json.dumps(full), json.dumps(sparse), "plain text, not json"]
    (drop / "b1.txt").write_text("\n".join(batch1) + "\n")

    q = start_http_push_ingress(spark, str(drop), out)
    try:
        q.processAllAvailable()
        # live feed: a second payload lands while the stream is up
        (drop / "b2.txt").write_text(json.dumps({"message": "late"}) + "\n")
        q.processAllAvailable()
    finally:
        q.stop()

    rows = spark.read.option("basePath", out).parquet(
        os.path.join(out, "epoch=*")
    ).collect()
    assert len(rows) == 4
    by_msg = {r.message if r.message in ("boom", "partial entry", "late")
              else "text": r for r in rows}
    # JSON path, all fields present: passed through (level normalized)
    f = by_msg["boom"]
    assert (f.id, f.source, f.host, f.level) == ("given-1", "svcA", "h9", "ERROR")
    assert str(f.ts) == "2024-02-01 12:00:00"
    # JSON path, missing fields: per-field defaults incl. content id
    s = by_msg["partial entry"]
    assert s.source == "http-push" and s.host == "collector-01"
    assert s.level == "INFO" and str(s.ts) == "2024-01-01 00:00:00"
    assert s.id and s.id != "given-1"
    # text path: unparseable line -> message = raw, defaults filled
    t = by_msg["text"]
    assert t.raw == "plain text, not json" and t.message == t.raw
    assert t.level == "INFO" and t.id
    # ids are content-derived and unique
    assert len({r.id for r in rows}) == 4


def test_socket_syslog_ingress(spark, tmp_path):
    from log_aggregation_pipeline_spark.streaming.ingress import (
        start_syslog_ingress,
    )

    port = _free_port()
    _serve_once(port, ("\n".join(LINES) + "\n").encode())
    out = str(tmp_path / "ingress")

    q = start_syslog_ingress(spark, out, port=port)
    try:
        deadline = time.time() + 30
        done = False
        while time.time() < deadline and not done:
            q.processAllAvailable()
            files = glob.glob(os.path.join(out, "epoch=*", "level=*", "*.parquet"))
            if files:
                got = spark.read.option("basePath", out).parquet(
                    os.path.join(out, "epoch=*")
                )
                done = got.count() >= len(LINES)
            time.sleep(0.5)
    finally:
        q.stop()

    rows = spark.read.option("basePath", out).parquet(
        os.path.join(out, "epoch=*")
    ).collect()
    assert sorted(r.level for r in rows) == ["DEBUG", "ERROR", "FATAL", "INFO"]
    by_level = {r.level: r for r in rows}
    assert by_level["FATAL"].syslog_host == "web01"
    assert by_level["FATAL"].message == "sshd[123]: auth failure root"
    assert by_level["ERROR"].message == "app: boom code=E042"
    assert by_level["DEBUG"].severity == 7
    assert str(by_level["INFO"].parsed_ts) == "2024-01-05 10:15:02"
    # content-derived ids: stable across replays
    assert len({r.id for r in rows}) == len(LINES)


def test_udp_receiver_resumes_spool_index(tmp_path):
    """Restarting the receiver over a persistent drop_dir must continue
    past existing spool files: reusing dgram_000000.log would destroy
    an unread datagram AND hide the new one (the file source never
    re-reads a seen path)."""
    from log_aggregation_pipeline_spark.streaming.ingress import (
        start_udp_receiver,
    )

    drop = tmp_path / "drop"
    drop.mkdir()
    (drop / "dgram_000003.log").write_text("old datagram\n")

    port, stop, _t = start_udp_receiver(str(drop))
    cli = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    try:
        cli.sendto(b"fresh datagram", ("127.0.0.1", port))
        deadline = time.time() + 10
        while time.time() < deadline and not (drop / "dgram_000004.log").exists():
            time.sleep(0.05)
    finally:
        cli.close()
        stop.set()
    assert (drop / "dgram_000004.log").read_text() == "fresh datagram\n"
    assert (drop / "dgram_000003.log").read_text() == "old datagram\n"


def test_udp_receiver_creates_missing_drop_dir(tmp_path):
    # fresh start: the spool-index resume scan must not require the
    # drop dir to pre-exist
    from log_aggregation_pipeline_spark.streaming.ingress import (
        start_udp_receiver,
    )

    drop = tmp_path / "fresh" / "udp_drop"
    port, stop, t = start_udp_receiver(str(drop))
    try:
        assert drop.is_dir() and port > 0
    finally:
        stop.set()
        t.join(timeout=5)
