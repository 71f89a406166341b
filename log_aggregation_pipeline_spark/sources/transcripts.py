"""Transcript table synthesis — deterministic, no wall-clock.

Two producers of the canonical input table
``(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp)``:

1. ``transcripts_from_events`` — derives transcripts from the
   driver-provided ``events.parquet`` via ONE SQL string
   (``TRANSCRIPTS_SQL``) that is valid in both Spark SQL and DuckDB, so
   the Spark pipeline and the DuckDB oracle consume byte-identical
   inputs at every scale factor.  The text column embeds grok-parseable
   payloads (level token incl. aliases, ``code=E\\d{3}`` error codes,
   ``call:tool(args)`` signatures) with ~10% deliberately unparseable
   lines so the parse stage is total.

2. ``generate_transcripts`` — a pure-numpy generator for unit tests
   (FIXTURES.md §1) with explicit conv_id-skew knobs.

The reference stamps wall-clock ids/timestamps
(/root/reference/internal/agent/collector/file.go:157-166); both
producers here are fully deterministic instead (SURVEY.md §7).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..schema import TRANSCRIPT_SCHEMA

# ---------------------------------------------------------------------------
# Shared Spark-SQL / DuckDB derivation.
#
# Dialect-portable subset only: printf, lpad, md5, concat via ||,
# CASE, row_number() OVER, CAST, floor.  Level words include aliases
# (WARNING, ERR, FATAL, TRACE) to exercise normalization
# (reference parser.go:92-108); event_id % 10 = 9 rows are garbled
# (no leading level token) so parse_ok=false paths are real.
# ---------------------------------------------------------------------------
TRANSCRIPTS_SQL = """
SELECT
  printf('conv_%05d', user_id)                                        AS conv_id,
  CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1
       AS INT)                                                        AS turn_idx,
  CASE event_type
    WHEN 'click'    THEN 'user'
    WHEN 'view'     THEN 'user'
    WHEN 'signup'   THEN 'assistant'
    WHEN 'error'    THEN 'system'
    ELSE 'tool'
  END                                                                 AS role,
  CASE
    WHEN event_id % 10 = 9 THEN
      'garbled ' || substr(md5(CAST(event_id AS STRING)), 1, 8) || ' noise line'
    ELSE
      CASE
        WHEN event_type = 'error' THEN
          CASE CAST(event_id % 3 AS INT)
            WHEN 0 THEN 'ERROR' WHEN 1 THEN 'FATAL' ELSE 'ERR' END
        ELSE
          CASE CAST(event_id % 5 AS INT)
            WHEN 0 THEN 'INFO' WHEN 1 THEN 'DEBUG' WHEN 2 THEN 'WARN'
            WHEN 3 THEN 'WARNING' ELSE 'TRACE' END
      END
      || ' svc=api'
      || CASE WHEN event_type = 'error'
              THEN ' code=E' || lpad(CAST(event_id % 1000 AS STRING), 3, '0')
              ELSE '' END
      || CASE WHEN event_type = 'purchase'
              THEN ' call:' ||
                   CASE CAST(event_id % 4 AS INT)
                     WHEN 0 THEN 'search' WHEN 1 THEN 'exec'
                     WHEN 2 THEN 'browse' ELSE 'calc' END
                   || '(q' || CAST(event_id % 100 AS STRING) || ')'
              ELSE '' END
      || ' took value=' || CAST(CAST(floor(value) AS BIGINT) AS STRING) || 'ms'
  END                                                                 AS text,
  CASE WHEN event_type = 'purchase' THEN
    CASE CAST(event_id % 4 AS INT)
      WHEN 0 THEN 'search' WHEN 1 THEN 'exec' WHEN 2 THEN 'browse' ELSE 'calc'
    END
  ELSE NULL END                                                       AS tool,
  ts
FROM {events}
"""


def transcripts_sql(events_relation: str = "events") -> str:
    """The shared derivation over a named events relation."""
    return TRANSCRIPTS_SQL.format(events=events_relation)


def transcripts_cte(events_relation: str = "events") -> str:
    """``WITH transcripts AS (...)`` prefix for oracle queries."""
    return f"WITH transcripts AS ({transcripts_sql(events_relation)})"


def transcripts_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive the transcripts table from ``{sf_dir}/events.parquet``.

    Returned partitioning: whatever the parquet scan yields — callers
    that aggregate by conv_id should rely on the shuffle (or salt, see
    operators.agg) rather than pre-repartitioning here.
    """
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    events.createOrReplaceTempView("__lap_events")
    return spark.sql(transcripts_sql("__lap_events"))


# ---------------------------------------------------------------------------
# Pure-numpy generator for unit tests (FIXTURES.md §1).
# ---------------------------------------------------------------------------
ROLES = np.array(["user", "assistant", "system", "tool"])
TOOLS = np.array(["search", "exec", "browse", "calc"])
LEVEL_WORDS = np.array(
    ["INFO", "DEBUG", "WARN", "WARNING", "TRACE", "ERROR", "FATAL", "ERR", "CRITICAL"]
)


def generate_transcripts(
    n_convs: int = 50,
    turns_per_conv: int = 40,
    skew_convs: int = 2,
    skew_factor: int = 16,
    seed: int = 7,
) -> pd.DataFrame:
    """Deterministic transcripts with heavy-hitter conv_ids.

    The first ``skew_convs`` conversations get ``skew_factor``× the
    turns of the rest, so ≥20%-of-total heavy hitters exist at the
    default settings (exercises salting/AQE paths).
    Timestamps span >72h from a fixed 2024-01-01 base; monotone in
    turn_idx within each conversation.
    """
    rng = np.random.default_rng(seed)
    counts = np.full(n_convs, turns_per_conv, dtype=np.int64)
    counts[:skew_convs] = turns_per_conv * skew_factor

    conv_idx = np.repeat(np.arange(n_convs), counts)
    turn_idx = np.concatenate([np.arange(c) for c in counts]).astype(np.int32)
    n = len(conv_idx)

    conv_id = np.char.add("conv_", np.char.zfill(conv_idx.astype(str), 5))
    role = ROLES[rng.integers(0, len(ROLES), n)]
    is_tool_turn = role == "tool"
    tool = np.where(is_tool_turn, TOOLS[rng.integers(0, len(TOOLS), n)], None)

    level = LEVEL_WORDS[rng.integers(0, len(LEVEL_WORDS), n)]
    code = rng.integers(0, 1000, n)
    has_code = rng.random(n) < 0.3
    garbled = rng.random(n) < 0.1

    texts = []
    for i in range(n):
        if garbled[i]:
            texts.append(f"~~noise {i} %% unparseable line")
            continue
        parts = [level[i], "svc=api"]
        if has_code[i]:
            parts.append(f"code=E{code[i]:03d}")
        if is_tool_turn[i]:
            parts.append(f"call:{tool[i]}(q{i % 100})")
        parts.append(f"took value={i % 500}ms")
        texts.append(" ".join(parts))

    # per-conv monotone timestamps spanning ~100 hours
    base = np.datetime64("2024-01-01T00:00:00")
    conv_offset = (conv_idx * 7919) % (100 * 3600)  # seconds, spread over 100h
    ts = base + ((conv_offset + turn_idx.astype(np.int64) * 61) * 1000).astype(
        "timedelta64[ms]"
    )

    return pd.DataFrame(
        {
            "conv_id": conv_id,
            "turn_idx": turn_idx,
            "role": role,
            "text": texts,
            "tool": tool,
            "ts": ts,
        }
    )


def transcripts_df(spark: SparkSession, pdf: pd.DataFrame | None = None, **kw) -> DataFrame:
    """Spark DataFrame over the generated transcripts (Arrow path)."""
    if pdf is None:
        pdf = generate_transcripts(**kw)
    return spark.createDataFrame(pdf, schema=TRANSCRIPT_SCHEMA)
