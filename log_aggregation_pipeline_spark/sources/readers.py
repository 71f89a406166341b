"""Text/file sources (SURVEY.md §2.1 S1-S3, S5-S6).

The reference's agent collectors (file tailer, HTTP push, syslog
listeners) continuously lift raw lines into LogEntry envelopes.  In
batch Spark, "collect" is a scan: ``spark.read.text`` with glob +
exclude selection, and the envelope lift is a projection.  The
streaming analog (``readStream`` file source) lives in
``streaming.stream``.

Compression (the shipper's gzip, shipper.go:309-322) needs no
operator: Spark reads .gz/.zst text and parquet codecs natively.
"""

from __future__ import annotations

import posixpath

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.ids import deterministic_id  # noqa: F401  (re-export)


def read_lines(
    spark: SparkSession,
    paths: str | list[str],
    exclude_glob: str | None = None,
    modified_after: str | None = None,
) -> DataFrame:
    """S1/S2: glob-expanded text scan with basename excludes.

    Mirrors collector/file.go:85-112 (glob include + exclude patterns);
    returns columns (raw, source) where source is the file path — the
    reference stamps the source pattern string (file.go:152).
    ``modified_after`` maps the tailer's "only new data" posture onto
    the batch file-source option.
    """
    reader = spark.read
    if modified_after:
        reader = reader.option("modifiedAfter", modified_after)
    df = reader.text(paths).select(
        F.col("value").alias("raw"),
        F.input_file_name().alias("source"),
    )
    if exclude_glob:
        # exclude matches the basename, like filepath.Match in file.go:100-107
        df = df.filter(
            ~F.expr(
                f"substring_index(source, '/', -1) like '{_glob_to_like(exclude_glob)}'"
            )
        )
    return df


def _glob_to_like(pattern: str) -> str:
    """Shell glob -> SQL LIKE (supports * and ? only)."""
    return (
        pattern.replace("%", r"\%").replace("_", r"\_")
        .replace("*", "%").replace("?", "_")
    )


def lift_lines(
    df: DataFrame,
    source: str | None = None,
    host: str = "",
    default_level: str = "INFO",
) -> DataFrame:
    """S3: raw line -> LogEntry envelope (file.go:149-166).

    The reference id is md5(source, now_ns, line) — wall-clock, so
    unreproducible; ours is content-derived:
    md5(source || ':' || raw) + a per-file line ordinal is NOT used
    because batch scans don't expose stable line numbers; dedup-safe
    identity needs the content itself.
    """
    src = F.lit(source) if source is not None else F.col("source")
    return df.select(
        F.md5(F.concat_ws(":", src, F.col("raw"))).alias("id"),
        F.col("raw"),
        F.col("raw").alias("message"),
        F.lit(default_level).alias("level"),
        src.alias("source"),
        F.lit(host).alias("host"),
    )


def file_basename(col: str = "source") -> F.Column:
    return F.substring_index(F.col(col), posixpath.sep, -1)
