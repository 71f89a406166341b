"""Fixed schemas for the engine.

The data model mirrors the reference's ``LogEntry``
(/root/reference/pkg/models/log_entry.go:19-49) mapped to columnar
Spark types per SURVEY.md §1.1: a fixed envelope plus a
``map<string,string>`` dynamic-fields escape hatch (all reference
parsers insert string values from capture groups; the raw line is kept
losslessly in ``raw``).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Input: transcripts table (BASELINE.json input_hint).
# ---------------------------------------------------------------------------
TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

# ---------------------------------------------------------------------------
# LogEntry envelope (the parsed view).  Columns added by the parse
# stage on top of the transcript columns.
# ---------------------------------------------------------------------------
LOG_LEVELS = ["DEBUG", "INFO", "WARN", "ERROR", "FATAL"]

PARSED_EXTRACT_SCHEMA = T.StructType(
    [
        T.StructField("level_raw", T.StringType(), True),
        T.StructField("error_code", T.StringType(), True),
        T.StructField("tool_sig", T.StringType(), True),
        T.StructField("tool_args", T.StringType(), True),
    ]
)

# Full parsed-row schema = transcript cols + envelope.
PARSED_SCHEMA = T.StructType(
    list(TRANSCRIPT_SCHEMA.fields)
    + [
        T.StructField("id", T.StringType(), False),
        T.StructField("level", T.StringType(), True),
        T.StructField("error_code", T.StringType(), True),
        T.StructField("tool_sig", T.StringType(), True),
        T.StructField("tool_args", T.StringType(), True),
        T.StructField("parse_ok", T.BooleanType(), False),
    ]
)

# ---------------------------------------------------------------------------
# Broadcast-enrich lookup tables (FIXTURES.md §2).
# ---------------------------------------------------------------------------
ROLE_LOOKUP_SCHEMA = T.StructType(
    [
        T.StructField("role", T.StringType(), False),
        T.StructField("role_kind", T.StringType(), True),
        T.StructField("is_human", T.BooleanType(), True),
    ]
)
ROLE_LOOKUP_ROWS = [
    ("user", "human", True),
    ("assistant", "model", False),
    ("system", "control", False),
    ("tool", "machine", False),
]

TOOL_LOOKUP_SCHEMA = T.StructType(
    [
        T.StructField("tool", T.StringType(), False),
        T.StructField("tool_family", T.StringType(), True),
        T.StructField("is_sideeffecting", T.BooleanType(), True),
    ]
)
TOOL_LOOKUP_ROWS = [
    ("search", "retrieval", False),
    ("exec", "compute", True),
    ("browse", "retrieval", False),
    ("calc", "compute", False),
    ("paint", "media", True),  # never appears in data: left-join null path
]
