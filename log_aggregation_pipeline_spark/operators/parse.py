"""Parse stage: string -> structured projection (SURVEY.md §2.3).

Re-expresses the reference's ``Parser`` plugins
(/root/reference/pkg/pipeline/parser/parser.go:14-20, factory
:296-311) as vectorized column producers:

- P1 JSON parse        -> ``parse_json``      (built-in ``from_json``)
- P2 level normalize   -> ``functions.levels`` (CASE expression)
- P3 multi-format ts   -> ``functions.timestamps`` (coalesce chain)
- P4 named-group regex -> ``parse_regex``     (Arrow pandas UDF,
                          ``pd.Series.str.extract`` — one compiled
                          regex, zero per-row Python)
- P5 nginx combined    -> ``parse_nginx``     (P4 with fixed pattern)
- P6 syslog RFC3164    -> ``parse_syslog``    (P4 + priority bit math)
- P7 grok              -> ``grok_to_regex``   (pattern-library expansion;
                          declared-only in the reference, blueprint.md:221-245)

plus the canonical transcript parse (``parse_transcripts``) used by the
pipeline: extracts level / error_code / tool-call signature from
``text`` and adds the deterministic id and ``parse_ok``.

Parsing is TOTAL: unmatched rows yield NULL extracts + parse_ok=false
(the reference instead errors the row out and counts it failed,
pipeline.go:115-117 — our metrics keep that count without dropping
data).

Two implementations of the hot path are provided and benchmarked:
``impl="pandas"`` (Arrow-batched ``str.extract``, the north-star
surface) and ``impl="native"`` (JVM ``regexp_extract`` inside
whole-stage codegen, zero Python in the plan).  Semantics are
identical; pick per deployment.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.ids import deterministic_id
from ..functions.levels import normalize_level
from ..functions.timestamps import multi_format_ts

# ---------------------------------------------------------------------------
# Canonical transcript-text patterns (shared with the DuckDB oracle —
# keep to the RE2 ∩ Python-re dialect subset: no backrefs/lookaround).
# ---------------------------------------------------------------------------
LEVEL_PATTERN = r"^([A-Z]+)\b"
CODE_PATTERN = r"code=E(\d{3})"
TOOL_PATTERN = r"call:([a-z]+)\(([^)]*)\)"

_TRANSCRIPT_STRUCT = T.StructType(
    [
        T.StructField("level_raw", T.StringType()),
        T.StructField("error_code", T.StringType()),
        T.StructField("tool_sig", T.StringType()),
        T.StructField("tool_args", T.StringType()),
    ]
)


# ---------------------------------------------------------------------------
# P4: generic named-group regex parse (vectorized).
# ---------------------------------------------------------------------------
def regex_struct_udf(pattern: str):
    """Arrow pandas UDF extracting every named group of ``pattern``.

    The regex compiles once per executor process; ``str.extract`` runs
    a single C loop per Arrow batch — no per-row Python (reference
    does per-row ``FindStringSubmatch``, parser.go:168).
    """
    compiled = re.compile(pattern)
    names = list(compiled.groupindex)
    if not names:
        raise ValueError("pattern must contain named groups")
    struct = T.StructType([T.StructField(n, T.StringType()) for n in names])

    @F.pandas_udf(struct)
    def extract(s: pd.Series) -> pd.DataFrame:
        out = s.str.extract(compiled)
        out.columns = names
        return out

    return extract, names


def parse_regex(df: DataFrame, pattern: str, raw_col: str = "text") -> DataFrame:
    """P4: every named capture group becomes a column; groups named
    ``message``/``level``/``timestamp`` additionally set the envelope
    (mirrors parser.go:170-190).  No-match rows -> NULLs + parse_ok=false."""
    udf, names = regex_struct_udf(pattern)
    df = df.withColumn("_ex", udf(F.col(raw_col)))
    for n in names:
        df = df.withColumn(n, F.col(f"_ex.{n}"))
    df = df.drop("_ex")
    df = df.withColumn("parse_ok", F.col(names[0]).isNotNull())
    if "level" in names:
        df = df.withColumn("level", normalize_level("level"))
    if "timestamp" in names:
        df = df.withColumn("parsed_ts", multi_format_ts("timestamp"))
    if "message" in names and raw_col != "message":
        df = df.withColumn("message", F.coalesce(F.col("message"), F.col(raw_col)))
    return df


# ---------------------------------------------------------------------------
# Canonical transcript parse (the pipeline's hot stage).
# ---------------------------------------------------------------------------
_tp_level = re.compile(LEVEL_PATTERN)
_tp_code = re.compile(CODE_PATTERN)
_tp_tool = re.compile(TOOL_PATTERN)


@F.pandas_udf(_TRANSCRIPT_STRUCT)
def _transcript_extract(s: pd.Series) -> pd.DataFrame:
    lvl = s.str.extract(_tp_level)
    code = s.str.extract(_tp_code)
    tool = s.str.extract(_tp_tool)
    return pd.DataFrame(
        {
            "level_raw": lvl[0],
            "error_code": code[0],
            "tool_sig": tool[0],
            "tool_args": tool[1],
        }
    )


def parse_transcripts(
    df: DataFrame, impl: str = "pandas", with_fields: bool = False
) -> DataFrame:
    """transcripts -> parsed view (LogEntry-envelope equivalent).

    Adds: id (deterministic md5), level_raw, level (normalized),
    error_code, tool_sig, tool_args, parse_ok; with_fields=True also
    attaches the LogEntry ``fields`` map<string,string> (every k=v
    token in the text — the dynamic-payload escape hatch of
    log_entry.go:42, SURVEY.md §1.1).
    """
    if impl == "pandas":
        df = df.withColumn("_ex", _transcript_extract(F.col("text")))
        df = df.select(
            "*",
            F.col("_ex.level_raw").alias("level_raw"),
            F.col("_ex.error_code").alias("error_code"),
            F.col("_ex.tool_sig").alias("tool_sig"),
            F.col("_ex.tool_args").alias("tool_args"),
        ).drop("_ex")
    elif impl == "native":
        # JVM twin: regexp_extract returns '' on no-match -> NULLIF.
        df = (
            df.withColumn(
                "level_raw", F.nullif(F.regexp_extract("text", LEVEL_PATTERN, 1), F.lit(""))
            )
            .withColumn(
                "error_code", F.nullif(F.regexp_extract("text", CODE_PATTERN, 1), F.lit(""))
            )
            .withColumn(
                "tool_sig", F.nullif(F.regexp_extract("text", TOOL_PATTERN, 1), F.lit(""))
            )
            .withColumn(
                "tool_args",
                F.when(
                    F.col("tool_sig").isNotNull(),
                    F.regexp_extract("text", TOOL_PATTERN, 2),
                ),
            )
        )
    else:  # pragma: no cover
        raise ValueError(f"unknown impl {impl!r}")

    out = (
        df.withColumn("id", deterministic_id())
        .withColumn("level", normalize_level("level_raw"))
        .withColumn("parse_ok", F.col("level_raw").isNotNull())
    )
    if with_fields:
        out = out.withColumn("fields", kv_fields("text"))
    return out


# ---------------------------------------------------------------------------
# P1: JSON parse.
# ---------------------------------------------------------------------------
def parse_json(
    df: DataFrame,
    raw_col: str = "raw",
    time_field: str | None = "timestamp",
    time_formats: tuple[str, ...] | None = None,
) -> DataFrame:
    """Unmarshal a JSON line: top-level keys -> ``fields`` map;
    ``message``/``msg`` -> message; ``level`` -> normalized level;
    ``time_field`` -> parsed_ts (multi-format + unix seconds), exactly
    the envelope rules of parser.go:51-84.  Keeps the raw string for
    lossless round-trip (SURVEY.md §1.1)."""
    df = df.withColumn("fields", F.from_json(F.col(raw_col), "map<string,string>"))
    df = df.withColumn("parse_ok", F.col("fields").isNotNull())
    df = df.withColumn(
        "message",
        F.coalesce(
            F.element_at("fields", "message"),
            F.element_at("fields", "msg"),
            F.col(raw_col),
        ),
    )
    df = df.withColumn("level", normalize_level(F.element_at("fields", "level")))
    if time_field:
        kwargs = {} if time_formats is None else {"formats": time_formats}
        df = df.withColumn(
            "parsed_ts", multi_format_ts(F.element_at("fields", time_field), **kwargs)
        )
    return df


# ---------------------------------------------------------------------------
# P5: nginx combined log format.
# ---------------------------------------------------------------------------
# Reference pattern at parser.go:246-249 (10 capture groups).
NGINX_PATTERN = (
    r'^(?P<remote_addr>\S+) - (?P<remote_user>\S+) \[(?P<time_local>[^\]]+)\] '
    r'"(?P<request_method>\S+) (?P<request_path>\S+) (?P<request_protocol>[^"]+)" '
    r'(?P<status>\d{3}) (?P<body_bytes_sent>\d+) '
    r'"(?P<http_referer>[^"]*)" "(?P<http_user_agent>[^"]*)"'
)
NGINX_TIME_FORMAT = "dd/MMM/yyyy:HH:mm:ss Z"  # 02/Jan/2006:15:04:05 -0700


def parse_nginx(df: DataFrame, raw_col: str = "raw") -> DataFrame:
    """Nginx combined parse + status->level rule.

    The reference compares status as a *string* (parser.go:279:
    ``matches[7] >= "500"``); we cast to int — numerically identical
    for 3-digit codes and robust beyond them (SURVEY.md P5 note)."""
    df = parse_regex(df, NGINX_PATTERN, raw_col=raw_col)
    status = F.col("status").cast("int")
    df = df.withColumn(
        "level",
        F.when(status >= 500, "ERROR").when(status >= 400, "WARN").otherwise("INFO"),
    )
    df = df.withColumn(
        "message",
        F.when(
            F.col("parse_ok"),
            F.format_string(
                "%s %s %s - %s",
                F.col("request_method"),
                F.col("request_path"),
                F.col("request_protocol"),
                F.col("status"),
            ),
        ).otherwise(F.col(raw_col)),
    )
    return df.withColumn(
        "parsed_ts", F.try_to_timestamp(F.col("time_local"), F.lit(NGINX_TIME_FORMAT))
    )


# ---------------------------------------------------------------------------
# P6: syslog RFC3164.
# ---------------------------------------------------------------------------
SYSLOG_PATTERN = (
    r"^<(?P<priority>\d{1,3})>"
    r"(?P<stamp>[A-Z][a-z]{2}\s+\d{1,2} \d{2}:\d{2}:\d{2}) "
    r"(?P<syslog_host>\S+) (?P<message>.*)$"
)


def parse_syslog(df: DataFrame, raw_col: str = "raw", assume_year: int = 2024) -> DataFrame:
    """RFC3164 parse (syslog.go:188-244): severity = priority & 7 ->
    level (0-2 FATAL, 3 ERROR, 4 WARN, 5-6 INFO, 7 DEBUG); ``Jan  2``
    stamps get ``assume_year`` (the reference stamps the *current*
    year, syslog.go:215 — wall-clock is banned here, so the year is an
    explicit parameter).  Unparsed rows keep raw as message, INFO."""
    df = parse_regex(df, SYSLOG_PATTERN, raw_col=raw_col)
    sev = F.col("priority").cast("int") % 8
    df = df.withColumn("severity", sev)
    df = df.withColumn(
        "level",
        F.when(~F.col("parse_ok"), "INFO")
        .when(sev <= 2, "FATAL")
        .when(sev == 3, "ERROR")
        .when(sev == 4, "WARN")
        .when(sev <= 6, "INFO")
        .otherwise("DEBUG"),
    )
    df = df.withColumn(
        "message", F.coalesce(F.col("message"), F.col(raw_col))
    )
    # "Jan  2 15:04:05" — collapse the double space, prepend the year.
    return df.withColumn(
        "parsed_ts",
        F.try_to_timestamp(
            F.concat_ws(
                " ",
                F.lit(str(assume_year)),
                F.regexp_replace(F.col("stamp"), r"\s+", " "),
            ),
            F.lit("yyyy MMM d HH:mm:ss"),
        ),
    )


# ---------------------------------------------------------------------------
# P7: grok pattern library -> regex expansion.
# ---------------------------------------------------------------------------
GROK_PATTERNS: dict[str, str] = {
    "WORD": r"\w+",
    "NOTSPACE": r"\S+",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "INT": r"[+-]?\d+",
    "NUMBER": r"[+-]?\d+(?:\.\d+)?",
    "BASE16NUM": r"(?:0[xX])?[0-9a-fA-F]+",
    "IPV4": r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}",
    "IP": r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}",
    "HOSTNAME": r"[a-zA-Z0-9._-]+",
    "USER": r"[a-zA-Z0-9._-]+",
    "USERNAME": r"[a-zA-Z0-9._-]+",
    "LOGLEVEL": r"[A-Za-z]+",
    "TIMESTAMP_ISO8601": r"\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(?:\.\d+)?(?:Z|[+-]\d{2}:?\d{2})?",
    "HTTPDATE": r"\d{2}/\w{3}/\d{4}:\d{2}:\d{2}:\d{2} [+-]\d{4}",
    "SYSLOGTIMESTAMP": r"[A-Z][a-z]{2}\s+\d{1,2} \d{2}:\d{2}:\d{2}",
    "QUOTEDSTRING": r'"[^"]*"',
    "UUID": r"[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}",
    # extended library (round 2).  All RE2 ∩ Python-re dialect — no
    # lookarounds/backrefs, so patterns stay valid in DuckDB oracles.
    "POSINT": r"[1-9]\d*",
    "NONNEGINT": r"\d+",
    "SPACE": r"\s*",
    "IPV6": r"[0-9a-fA-F:]+:[0-9a-fA-F:.]+",
    "IPORHOST": r"(?:%{IP}|%{HOSTNAME})",
    "HOSTPORT": r"%{IPORHOST}:%{POSINT}",
    "MAC": r"(?:[0-9a-fA-F]{2}[:-]){5}[0-9a-fA-F]{2}",
    "EMAILADDRESS": r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+",
    "UNIXPATH": r"(?:/[\w.-]+)+/?",
    "WINPATH": r"(?:[A-Za-z]:)?(?:\\[\w. -]+)+",
    "PATH": r"(?:%{UNIXPATH}|%{WINPATH})",
    "URIPROTO": r"[A-Za-z][A-Za-z0-9+.-]*",
    "URIPATH": r"(?:/[A-Za-z0-9$.+!*'(){},~:;=@#%_&-]*)+",
    "URIPARAM": r"\?[A-Za-z0-9$.+!*'|(){},~@#%&/=:;_?\[\]<>-]*",
    "PROG": r"[\w._/%-]+",
    "SYSLOGPROG": r"%{PROG}(?:\[%{POSINT}\])?",
    "JAVACLASS": r"(?:[a-zA-Z$_][a-zA-Z$_0-9]*\.)+[a-zA-Z$_][a-zA-Z$_0-9]*",
    "COMMONAPACHELOG": (
        r'%{IPORHOST:clientip} %{USER:ident} %{USER:auth} '
        r'\[%{HTTPDATE:timestamp}\] "%{WORD:verb} %{NOTSPACE:request}'
        r'(?: HTTP/%{NUMBER:httpversion})?" %{NONNEGINT:response} '
        r'(?:%{NONNEGINT:bytes}|-)'
    ),
    "COMBINEDAPACHELOG": (
        r'%{COMMONAPACHELOG} %{QUOTEDSTRING:referrer} %{QUOTEDSTRING:agent}'
    ),
}

_GROK_REF = re.compile(r"%\{(\w+)(?::(\w+))?\}")
_MAX_GROK_DEPTH = 16


def grok_to_regex(pattern: str, extra: dict[str, str] | None = None) -> str:
    """Expand ``%{NAME:field}`` references into a named-group regex,
    RECURSIVELY (library patterns may reference other patterns, e.g.
    COMBINEDAPACHELOG -> COMMONAPACHELOG -> IPORHOST -> IP); bounded
    depth guards against reference cycles in user-supplied ``extra``.

    Grok is declared-but-unimplemented in the reference
    (blueprint.md:221-245, README.md:285); grok ≡ named-group regex, so
    this expansion + ``parse_regex`` honors the declared surface."""
    lib = {**GROK_PATTERNS, **(extra or {})}

    def sub(m: re.Match) -> str:
        base = lib[m.group(1)]
        return f"(?P<{m.group(2)}>{base})" if m.group(2) else f"(?:{base})"

    for _ in range(_MAX_GROK_DEPTH):
        expanded = _GROK_REF.sub(sub, pattern)
        if expanded == pattern:
            return expanded
        pattern = expanded
    raise ValueError("grok pattern reference cycle (or depth > 16)")


def parse_grok(df: DataFrame, grok: str, raw_col: str = "text", **kw) -> DataFrame:
    return parse_regex(df, grok_to_regex(grok, **kw), raw_col=raw_col)


# ---------------------------------------------------------------------------
# KV / CSV parsers (declared-only in the reference: blueprint.md:226-233,
# README.md:58-59 list them as planned sources/parsers).
# ---------------------------------------------------------------------------
KV_PATTERN = r"(\w+)=(\S+)"


def kv_fields(col: Column | str) -> Column:
    """All ``key=value`` tokens as a map<string,string> — pure JVM.
    Duplicate keys keep the LAST occurrence (logfmt convention),
    enforced explicitly with an index-aware filter: under Spark's
    default ``spark.sql.mapKeyDedupPolicy=EXCEPTION`` a bare
    map_from_arrays would throw DUPLICATED_MAP_KEY on 'a=1 b=2 a=3',
    and relying on a session-level LAST_WIN knob would break under
    the driver's own session.  O(pairs²) per row — pairs are few."""
    c = F.col(col) if isinstance(col, str) else col
    pairs = F.regexp_extract_all(c, F.lit(KV_PATTERN), F.lit(0))
    entries = F.transform(
        pairs,
        lambda p, i: F.struct(
            F.split(p, "=")[0].alias("key"),
            F.substring_index(p, "=", -1).alias("value"),
            i.alias("_i"),
        ),
    )
    last_wins = F.filter(
        entries,
        lambda e: ~F.exists(
            entries, lambda e2: (e2["key"] == e["key"]) & (e2["_i"] > e["_i"])
        ),
    )
    return F.map_from_entries(
        F.transform(
            last_wins,
            lambda e: F.struct(e["key"].alias("key"), e["value"].alias("value")),
        )
    )


def parse_kv(df: DataFrame, raw_col: str = "text") -> DataFrame:
    """logfmt-style parse: fields map + parse_ok (any pair found)."""
    df = df.withColumn("fields", kv_fields(raw_col))
    return df.withColumn("parse_ok", F.size(F.map_keys("fields")) > 0)


def parse_csv_lines(
    df: DataFrame,
    schema: str,
    raw_col: str = "raw",
    sep: str = ",",
) -> DataFrame:
    """CSV line parse via ``from_csv`` (native, codegen).  ``schema``
    is a DDL string like ``'a INT, b STRING'``."""
    parsed = F.from_csv(F.col(raw_col), F.lit(schema), {"sep": sep})
    df = df.withColumn("_csv", parsed)
    for field in df.select("_csv.*").columns:
        df = df.withColumn(field, F.col(f"_csv.{field}"))
    return df.drop("_csv").withColumn("parse_ok", F.col(raw_col).isNotNull())
