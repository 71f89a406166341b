"""PySpark-native log/telemetry analytics engine.

A from-scratch rebuild of the capabilities of
``UmangDiyora/Log-Aggregation-Pipeline`` (Go agent/server/query engine,
surveyed in SURVEY.md) as an idiomatic Spark DAG:

    parse -> enrich -> route -> aggregate

over tables of multi-turn conversation/agent transcripts
``(conv_id, turn_idx, role, text, tool, ts)``.

Layout:

- ``session``    — tuned SparkSession builder (AQE, Arrow, UTC).
- ``schema``     — fixed schemas (transcripts, parsed envelope, lookups).
- ``sources``    — scans/sinks: transcript synthesis, text readers,
                   hour-partitioned table abstraction (reference
                   store.go semantics).
- ``functions``  — scalar expression library (level normalization,
                   multi-format timestamps, deterministic ids).
- ``operators``  — parse (JSON/grok/nginx/syslog), processors,
                   broadcast enrich, fan-out route, aggregations,
                   ordering, query engine, dedup, similarity, text
                   analysis, multimodal plumbing.
- ``plans``      — end-to-end pipeline job + lineage/resume.
- ``streaming``  — Structured Streaming variant.

Everything is DataFrame/SQL-first; Python touches data only through
Arrow-vectorized pandas UDFs (never per-row).
"""

__version__ = "0.1.0"
