"""DuckDB oracle SQL builders.

Assembles ANSI-SQL twins of the Spark operators from the SAME pattern
constants and routing predicates the Spark code uses
(operators.parse / operators.route / functions.levels), so the oracle
can't silently drift from the implementation.  Used by
``__spark_entry__.oracle_sql()`` — the driver runs these in DuckDB
against the sf0.01 parquet views and hash-compares with the Spark
results.
"""

from __future__ import annotations

from .functions.ids import ID_SQL
from .functions.levels import normalize_level_sql
from .operators.parse import CODE_PATTERN, LEVEL_PATTERN, TOOL_PATTERN
from .operators.route import ROUTES
from .sources.transcripts import transcripts_sql


def parsed_cte(events_relation: str = "events") -> str:
    """WITH chain: events -> transcripts -> parsed (id, level, codes)."""
    level_norm = normalize_level_sql("level_raw")
    return f"""
WITH transcripts AS ({transcripts_sql(events_relation)}),
raw_parsed AS (
  SELECT *,
    {ID_SQL} AS id,
    NULLIF(regexp_extract(text, '{LEVEL_PATTERN}', 1), '') AS level_raw,
    NULLIF(regexp_extract(text, '{CODE_PATTERN}', 1), '') AS error_code,
    NULLIF(regexp_extract(text, '{TOOL_PATTERN}', 1), '') AS tool_sig,
    CASE WHEN NULLIF(regexp_extract(text, '{TOOL_PATTERN}', 1), '') IS NOT NULL
         THEN regexp_extract(text, '{TOOL_PATTERN}', 2) END AS tool_args
  FROM transcripts
),
parsed AS (
  SELECT *,
    {level_norm} AS level,
    (level_raw IS NOT NULL) AS parse_ok
  FROM raw_parsed
)
"""


def route_where(sink: str) -> str:
    return ROUTES[sink].sql_pred


def conv_hour_agg_sql(sink: str, events_relation: str = "events") -> str:
    return f"""{parsed_cte(events_relation)}
SELECT conv_id,
       date_trunc('hour', ts) AS hour,
       count(*)  AS n_turns,
       min(ts)   AS min_ts,
       max(ts)   AS max_ts
FROM parsed
WHERE {route_where(sink)}
GROUP BY conv_id, date_trunc('hour', ts)
"""


def routed_rows_sql(sink: str, events_relation: str = "events") -> str:
    return f"""{parsed_cte(events_relation)}
SELECT id, conv_id, turn_idx, role, tool, level, error_code, text, ts
FROM parsed
WHERE {route_where(sink)}
"""
