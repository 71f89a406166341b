"""Route stage: tag-driven fan-out to per-sink tables (SURVEY.md F6).

The reference *declares* predicate routing
(/root/reference/log-aggregation-pipeline-blueprint.md:282-291) but its
server actually makes pipelines compete for entries on one shared
channel (cmd/server/main.go:84-100 — each entry consumed by exactly one
arbitrary pipeline).  We implement the declared semantics: ONE scan of
the parsed view, N filtered writes; a row may land in several sinks
(fan-out, not partition).

The ``ROUTES`` dict is the single source of truth — the Spark job, the
pandas fixture twin (tests) and the DuckDB oracle all derive their
predicates from it.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Route:
    name: str
    spark_pred: Callable[[], Column]
    pandas_pred: Callable[[pd.DataFrame], "pd.Series"]
    sql_pred: str  # DuckDB/ANSI twin over the parsed view


ROUTES: dict[str, Route] = {
    "errors": Route(
        name="errors",
        spark_pred=lambda: F.col("level").isin("ERROR", "FATAL"),
        pandas_pred=lambda pdf: pdf["level"].isin(["ERROR", "FATAL"]),
        sql_pred="level IN ('ERROR', 'FATAL')",
    ),
    "tool_calls": Route(
        name="tool_calls",
        spark_pred=lambda: F.col("tool").isNotNull() & (F.col("tool") != ""),
        pandas_pred=lambda pdf: pdf["tool"].notna() & (pdf["tool"] != ""),
        sql_pred="tool IS NOT NULL AND tool <> ''",
    ),
    "user_turns": Route(
        name="user_turns",
        spark_pred=lambda: F.col("role") == "user",
        pandas_pred=lambda pdf: pdf["role"] == "user",
        sql_pred="role = 'user'",
    ),
}


def route_one(parsed: DataFrame, route: str) -> DataFrame:
    """The routed row set for one sink."""
    return parsed.filter(ROUTES[route].spark_pred())


def route_all(parsed: DataFrame, persist: bool = True) -> dict[str, DataFrame]:
    """One scan, N sink DataFrames.

    ``persist=True`` caches the parsed view before the fan-out so the
    (expensive) parse runs once, not once per sink — the Spark analog
    of the reference's single store feeding every query
    (SURVEY.md §4 "query result cache" row).  Caller unpersists.
    """
    if persist:
        parsed = parsed.persist()
    return {name: parsed.filter(r.spark_pred()) for name, r in ROUTES.items()}


def route_pandas(parsed_pdf: pd.DataFrame) -> dict[str, pd.DataFrame]:
    """Fixture twin: same predicates over a pandas frame (tests)."""
    return {name: parsed_pdf[r.pandas_pred(parsed_pdf)] for name, r in ROUTES.items()}
