"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship parse→enrich→route→aggregate query.
``queries()`` / ``oracle_sql()`` — per-operator Spark/DuckDB pairs;
the driver hash-compares them at sf=0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from log_aggregation_pipeline_spark import oracle
from log_aggregation_pipeline_spark.operators.agg import (
    conv_hour_agg,
    date_histogram,
    terms_agg,
)
from log_aggregation_pipeline_spark.operators.enrich import enrich
from log_aggregation_pipeline_spark.operators.order import with_turn_order
from log_aggregation_pipeline_spark.operators.parse import parse_transcripts
from log_aggregation_pipeline_spark.operators.route import ROUTES, route_one
from log_aggregation_pipeline_spark.sources.transcripts import (
    transcripts_cte,
    transcripts_from_events,
)

_ROUTED_COLS = ["id", "conv_id", "turn_idx", "role", "tool", "level", "error_code", "text", "ts"]


def _parsed(spark: SparkSession, sf_dir: str) -> DataFrame:
    return parse_transcripts(transcripts_from_events(spark, sf_dir))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: errors-sink conv-hour aggregate at sf0.001."""
    parsed = enrich(_parsed(spark, "/root/testdata/sf0.001"))
    return conv_hour_agg(route_one(parsed, "errors")).orderBy("conv_id", "hour")


# ---------------------------------------------------------------------------
# queries(): Spark side uses the real operator implementations
# (pandas-UDF parse etc.); oracle_sql() is independent SQL.
# ---------------------------------------------------------------------------

def _q_transcripts(spark, sf_dir):
    return transcripts_from_events(spark, sf_dir)


def _q_parse_level_terms(spark, sf_dir):
    return terms_agg(_parsed(spark, sf_dir), "level")


def _q_parse_error_codes(spark, sf_dir):
    return terms_agg(_parsed(spark, sf_dir), "error_code", limit=20)


def _mk_routed_rows(sink):
    def q(spark, sf_dir):
        return route_one(_parsed(spark, sf_dir), sink).select(*_ROUTED_COLS)

    return q


def _mk_conv_hour(sink, salted):
    def q(spark, sf_dir):
        return conv_hour_agg(route_one(_parsed(spark, sf_dir), sink), salted=salted)

    return q


def _q_enrich_rollup(spark, sf_dir):
    df = enrich(_parsed(spark, sf_dir))
    return (
        df.groupBy("role_kind", "is_human", "tool_family")
        .agg(F.count("*").alias("n"))
    )


def _q_turn_order(spark, sf_dir):
    df = with_turn_order(transcripts_from_events(spark, sf_dir))
    return df.select("conv_id", "turn_idx", "turn_rank", "text")


def _q_date_histogram(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return date_histogram(ev, "ts", "day")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable] = {
        "transcripts_derivation": _q_transcripts,
        "parse_level_terms": _q_parse_level_terms,
        "parse_error_codes": _q_parse_error_codes,
        "enrich_rollup": _q_enrich_rollup,
        "turn_order_window": _q_turn_order,
        "date_histogram_day": _q_date_histogram,
    }
    for sink in ROUTES:
        q[f"routed_rows_{sink}"] = _mk_routed_rows(sink)
        q[f"agg_conv_hour_{sink}"] = _mk_conv_hour(sink, salted=False)
    q["agg_conv_hour_errors_salted"] = _mk_conv_hour("errors", salted=True)
    return q


def oracle_sql() -> dict[str, str]:
    P = oracle.parsed_cte("events")
    o: dict[str, str] = {
        "transcripts_derivation": transcripts_cte("events")
        + " SELECT conv_id, turn_idx, role, text, tool, ts FROM transcripts",
        "parse_level_terms": P
        + """SELECT level AS key, count(*) AS count FROM parsed
             WHERE level IS NOT NULL AND level <> ''
             GROUP BY level ORDER BY count DESC, key ASC""",
        "parse_error_codes": P
        + """SELECT error_code AS key, count(*) AS count FROM parsed
             WHERE error_code IS NOT NULL AND error_code <> ''
             GROUP BY error_code ORDER BY count DESC, key ASC LIMIT 20""",
        "enrich_rollup": P
        + """SELECT
               CASE role WHEN 'user' THEN 'human' WHEN 'assistant' THEN 'model'
                         WHEN 'system' THEN 'control' WHEN 'tool' THEN 'machine' END AS role_kind,
               (role = 'user') AS is_human,
               CASE tool WHEN 'search' THEN 'retrieval' WHEN 'browse' THEN 'retrieval'
                         WHEN 'exec' THEN 'compute' WHEN 'calc' THEN 'compute' END AS tool_family,
               count(*) AS n
             FROM parsed GROUP BY 1, 2, 3""",
        "turn_order_window": transcripts_cte("events")
        + """ SELECT conv_id, turn_idx,
                CAST(row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx) AS INT) AS turn_rank,
                text
              FROM transcripts""",
        "date_histogram_day": """SELECT date_trunc('day', ts) AS bucket, count(*) AS count
                                 FROM events GROUP BY 1 ORDER BY bucket""",
    }
    for sink in ROUTES:
        o[f"routed_rows_{sink}"] = oracle.routed_rows_sql(sink)
        o[f"agg_conv_hour_{sink}"] = oracle.conv_hour_agg_sql(sink)
    o["agg_conv_hour_errors_salted"] = oracle.conv_hour_agg_sql("errors")
    return o
