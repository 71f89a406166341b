"""Log-level normalization (reference P2).

Mirrors the superset alias table of the reference's JSON parser
(/root/reference/pkg/pipeline/parser/parser.go:92-108; the regex
parser's table at parser.go:201-217 is a strict subset):

    DEBUG, DBG, TRACE          -> DEBUG
    INFO, INFORMATION          -> INFO
    WARN, WARNING              -> WARN
    ERROR, ERR                 -> ERROR
    FATAL, CRITICAL, PANIC     -> FATAL
    anything else (non-null)   -> INFO

A NULL input stays NULL (no level token was extracted — the reference
never reaches normalization in that case because the row errors out;
our parse is total instead, SURVEY.md §5.5).

Implemented as a single JVM-side CASE expression so it stays inside
whole-stage codegen — never a UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

LEVEL_ALIASES: dict[str, tuple[str, ...]] = {
    "DEBUG": ("DEBUG", "DBG", "TRACE"),
    "INFO": ("INFO", "INFORMATION"),
    "WARN": ("WARN", "WARNING"),
    "ERROR": ("ERROR", "ERR"),
    "FATAL": ("FATAL", "CRITICAL", "PANIC"),
}


def normalize_level(col: Column | str) -> Column:
    """Normalized level column; NULL-preserving, unknown -> INFO."""
    c = F.upper(F.col(col) if isinstance(col, str) else col)
    expr = F.when(c.isNull(), F.lit(None).cast("string"))
    for canonical, aliases in LEVEL_ALIASES.items():
        expr = expr.when(c.isin(*aliases), F.lit(canonical))
    return expr.otherwise(F.lit("INFO"))


def normalize_level_sql(col_sql: str) -> str:
    """The same normalization as portable ANSI SQL (for oracles)."""
    branches = "\n".join(
        "    WHEN upper({c}) IN ({names}) THEN '{canon}'".format(
            c=col_sql,
            names=", ".join(f"'{a}'" for a in aliases),
            canon=canonical,
        )
        for canonical, aliases in LEVEL_ALIASES.items()
    )
    return (
        f"CASE WHEN {col_sql} IS NULL THEN NULL\n{branches}\n    ELSE 'INFO' END"
    )
