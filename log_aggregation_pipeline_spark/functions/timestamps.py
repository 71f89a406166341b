"""Multi-format timestamp parsing (reference P3).

The reference tries a configured format then a fixed fallback list
(/root/reference/pkg/pipeline/parser/parser.go:111-136 for JSON,
:220-240 for regex), accepting unix-seconds floats as well.  In Spark
this is one ``coalesce`` of ``to_timestamp`` attempts — Catalyst
constant-folds the format list and the whole thing stays in codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Go layout -> Spark datetime pattern equivalents of the reference's
# fallback chain (RFC3339, RFC3339Nano, millis+offset, plain,
# slashed, syslog-style without year).
DEFAULT_FORMATS: tuple[str, ...] = (
    "yyyy-MM-dd'T'HH:mm:ssXXX",          # RFC3339
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSSSSSXXX",  # RFC3339Nano (ns truncated to us)
    "yyyy-MM-dd'T'HH:mm:ss.SSSXXX",
    "yyyy-MM-dd'T'HH:mm:ss'Z'",
    "yyyy-MM-dd HH:mm:ss",
    "yyyy/MM/dd HH:mm:ss",
)


def multi_format_ts(
    col: Column | str,
    formats: tuple[str, ...] = DEFAULT_FORMATS,
    accept_unix_seconds: bool = True,
) -> Column:
    """First format that parses wins; unix-seconds accepted last."""
    c = F.col(col) if isinstance(col, str) else col
    attempts = [F.try_to_timestamp(c, F.lit(fmt)) for fmt in formats]
    if accept_unix_seconds:
        # numeric strings = seconds since epoch (parser.go:132 time.Unix)
        attempts.append(
            F.when(
                c.rlike(r"^\d+(\.\d+)?$"),
                F.timestamp_seconds(c.cast("double")),
            )
        )
    return F.coalesce(*attempts)
