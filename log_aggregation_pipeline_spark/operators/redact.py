"""PII / secret redaction — the scrub stage of a training-data pipeline.

The reference's transform stage declares add/rename/drop/filter
processors (/root/reference/internal/pipeline/processor.go) but no
content scrubbing; a corpus pipeline needs one before anything ships
to training.  Pure JVM-side ``regexp_count`` / ``regexp_replace``
expressions — single projection, no shuffle, whole-stage codegen, so
it rides along any scan at 100 TB for free.

Pattern dialect: the intersection of Java regex (Spark), RE2 (the
DuckDB oracle), and Python ``re`` — no lookahead, no backreferences
(repo invariant, see CLAUDE.md).  Counts are computed per pattern on
the ORIGINAL text (order-independent: an IP inside an email address
counts as both), while the redacted string applies the replacements
sequentially in ``REDACTIONS`` order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_PATTERN = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
SECRET_PATTERN = r"(?i)(?:api[_-]?key|secret|token|bearer)[=: ]+[A-Za-z0-9_\-]{8,}"

# (name, pattern, replacement) — replacement order matters for the
# redacted string (earlier entries win overlapping spans)
REDACTIONS: tuple[tuple[str, str, str], ...] = (
    ("email", EMAIL_PATTERN, "[EMAIL]"),
    ("ipv4", IPV4_PATTERN, "[IP]"),
    ("secret", SECRET_PATTERN, "[SECRET]"),
)


def redacted_text(col: Column | str) -> Column:
    """The scrubbed string: every REDACTIONS pattern replaced, in order."""
    c = F.col(col) if isinstance(col, str) else col
    for _, pat, repl in REDACTIONS:
        c = F.regexp_replace(c, pat, repl)
    return c


def redact(
    df: DataFrame, text_col: str = "text", out_col: str = "redacted"
) -> DataFrame:
    """Adds ``n_<name>`` match counts per pattern (on the original
    text) and the scrubbed ``out_col``."""
    c = F.col(text_col)
    cols = {
        f"n_{name}": F.regexp_count(c, F.lit(pat))
        for name, pat, _ in REDACTIONS
    }
    cols[out_col] = redacted_text(c)
    return df.withColumns(cols)
