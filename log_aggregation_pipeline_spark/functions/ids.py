"""Deterministic row identity.

The reference derives ids from wall-clock nanoseconds
(/root/reference/internal/agent/collector/file.go:163-166:
``md5(source, time.Now().UnixNano(), line)``) which is unreproducible
by design.  We define identity purely from content so routed-row
equality is checkable across runs and cluster sizes (SURVEY.md §7):

    id = md5(conv_id || ':' || turn_idx || ':' || text)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def deterministic_id(
    conv_id: str = "conv_id", turn_idx: str = "turn_idx", text: str = "text"
) -> Column:
    return F.md5(
        F.concat_ws(":", F.col(conv_id), F.col(turn_idx).cast("string"), F.col(text))
    )


# DuckDB/ANSI twin for oracle queries.
ID_SQL = "md5(concat_ws(':', conv_id, CAST(turn_idx AS STRING), text))"
