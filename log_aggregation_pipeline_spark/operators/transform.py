"""Processor library: per-row transforms (SURVEY.md §2.2, T1-T6).

Re-expresses the reference's ``Processor`` plugins
(/root/reference/pkg/pipeline/processor/processor.go:10-17, factory at
:202-257) as pure ``DataFrame -> DataFrame`` functions, composable with
``df.transform`` — the UDF-free plugin surface promised in SURVEY.md
§2.11.  Each works on envelope columns when the name matches a real
column, else on the ``fields`` map<string,string> column (the
reference's dynamic payload).

Map upserts avoid ``map_concat``'s duplicate-key pitfall by filtering
old keys first, so behavior is independent of
``spark.sql.mapKeyDedupPolicy``.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

FIELDS_COL = "fields"


def _has_col(df: DataFrame, name: str) -> bool:
    return name in df.columns


def _fields(df: DataFrame) -> Column:
    """fields map, NULL-safe (missing/NULL map -> empty map)."""
    if not _has_col(df, FIELDS_COL):
        return F.create_map().cast("map<string,string>")
    return F.coalesce(
        F.col(FIELDS_COL), F.create_map().cast("map<string,string>")
    )


def _map_without(m: Column, keys: list[str]) -> Column:
    return F.map_filter(m, lambda k, _: ~k.isin(*keys) if keys else F.lit(True))


# ---------------------------------------------------------------------------
# T1 add_fields (processor.go:31-54): upsert constant key/values.
# ---------------------------------------------------------------------------
def add_fields(values: dict[str, str]) -> Callable[[DataFrame], DataFrame]:
    def apply(df: DataFrame) -> DataFrame:
        new = F.create_map(
            *[x for k, v in values.items() for x in (F.lit(k), F.lit(str(v)))]
        )
        return df.withColumn(
            FIELDS_COL, F.map_concat(_map_without(_fields(df), list(values)), new)
        )

    return apply


# ---------------------------------------------------------------------------
# T2 rename_fields (processor.go:56-83): copy old->new, delete old;
# no-op when the old key is absent.
# ---------------------------------------------------------------------------
def rename_fields(mapping: dict[str, str]) -> Callable[[DataFrame], DataFrame]:
    def apply(df: DataFrame) -> DataFrame:
        m = _fields(df)
        for old, new in mapping.items():
            moved = F.when(
                F.map_contains_key(m, F.lit(old)),
                F.create_map(F.lit(new), F.element_at(m, F.lit(old))),
            ).otherwise(F.create_map().cast("map<string,string>"))
            m = F.map_concat(_map_without(m, [old, new]), moved)
        return df.withColumn(FIELDS_COL, m)

    return apply


# ---------------------------------------------------------------------------
# T3 drop_fields (processor.go:85-108).
# ---------------------------------------------------------------------------
def drop_fields(keys: list[str]) -> Callable[[DataFrame], DataFrame]:
    def apply(df: DataFrame) -> DataFrame:
        return df.withColumn(FIELDS_COL, _map_without(_fields(df), keys))

    return apply


# ---------------------------------------------------------------------------
# T4 lowercase / T5 trim (processor.go:110-166): apply to the named
# envelope columns when present, else to the map entries of that name.
# ---------------------------------------------------------------------------
def _string_op(names: list[str], fn) -> Callable[[DataFrame], DataFrame]:
    def apply(df: DataFrame) -> DataFrame:
        map_names = [n for n in names if not _has_col(df, n)]
        for n in names:
            if _has_col(df, n):
                df = df.withColumn(n, fn(F.col(n)))
        if map_names and _has_col(df, FIELDS_COL):
            df = df.withColumn(
                FIELDS_COL,
                F.transform_values(
                    _fields(df),
                    lambda k, v: F.when(k.isin(*map_names), fn(v)).otherwise(v),
                ),
            )
        return df

    return apply


def lowercase(names: list[str]) -> Callable[[DataFrame], DataFrame]:
    return _string_op(names, F.lower)


def trim(names: list[str]) -> Callable[[DataFrame], DataFrame]:
    return _string_op(names, F.trim)


# ---------------------------------------------------------------------------
# T6 filter (processor.go:168-200): drop/keep by substring match.
# The reference signals a filtered row as an *error* and conflates it
# with failures in stats (pipeline.go:115-117) — we just filter, and
# metrics count dropped separately (SURVEY.md T6 note).
# ---------------------------------------------------------------------------
def filter_contains(
    field: str, pattern: str, drop_if_match: bool = True
) -> Callable[[DataFrame], DataFrame]:
    def apply(df: DataFrame) -> DataFrame:
        col = F.col(field) if _has_col(df, field) else F.element_at(
            _fields(df), F.lit(field)
        )
        hit = col.contains(F.lit(pattern))
        # NULL value -> no match -> kept when dropping, dropped when keeping
        keep = (~F.coalesce(hit, F.lit(False))) if drop_if_match else F.coalesce(
            hit, F.lit(False)
        )
        return df.filter(keep)

    return apply


# ---------------------------------------------------------------------------
# T7 conditional processor (declared-only in the reference:
# ProcessorConfig.Condition exists but is never evaluated,
# processor.go:27-29) — apply a transform only to matching rows.
# ---------------------------------------------------------------------------
def conditional_project(
    condition: Column | str, **col_exprs: Column
) -> Callable[[DataFrame], DataFrame]:
    """One-pass conditional for COLUMN-PRESERVING transforms: each
    named column becomes ``when(cond, expr).otherwise(col)`` — a single
    projection, no filter-split/union double scan.  Use ``conditional``
    only when the transform changes the schema or row count."""

    def apply(df: DataFrame) -> DataFrame:
        cond = F.expr(condition) if isinstance(condition, str) else condition
        return df.withColumns(
            {c: F.when(cond, e).otherwise(F.col(c)) for c, e in col_exprs.items()}
        )

    return apply


def conditional(
    condition: Column | str, transform: Callable[[DataFrame], DataFrame]
) -> Callable[[DataFrame], DataFrame]:
    """Rows matching ``condition`` go through ``transform``; the rest
    pass untouched.  Implemented as transform-then-union-complement so
    arbitrary transforms (including column-adding ones) compose; both
    branches come from one filter split, no join.  For column-
    preserving transforms prefer ``conditional_project`` (one pass)."""

    def apply(df: DataFrame) -> DataFrame:
        cond = F.expr(condition) if isinstance(condition, str) else condition
        hit = df.filter(cond).transform(transform)
        miss = df.filter(~F.coalesce(cond, F.lit(False)))
        for c in hit.columns:
            if c not in miss.columns:
                miss = miss.withColumn(c, F.lit(None).cast(hit.schema[c].dataType))
        return hit.unionByName(miss.select(*hit.columns))

    return apply


# ---------------------------------------------------------------------------
# F7 dedup / sampling filters (declared-only: blueprint.md:269-274).
# ---------------------------------------------------------------------------
def dedup_filter(keys: list[str] | None = None) -> Callable[[DataFrame], DataFrame]:
    """Drop duplicate rows by key (default: the id column)."""

    def apply(df: DataFrame) -> DataFrame:
        return df.dropDuplicates(keys or ["id"])

    return apply


def sample_filter(fraction: float, seed: int = 17) -> Callable[[DataFrame], DataFrame]:
    """Bernoulli row sampling — seeded, so runs are reproducible
    (never unseeded randomness, SURVEY.md §7)."""

    def apply(df: DataFrame) -> DataFrame:
        return df.sample(fraction=fraction, seed=seed)

    return apply


# ---------------------------------------------------------------------------
# Tags array ops (LogEntry.Tags surface, log_entry.go:78-93:
# AddTag appends-if-absent, HasTag membership).
# ---------------------------------------------------------------------------
TAGS_COL = "tags"


def _tags(df: DataFrame) -> Column:
    if not _has_col(df, TAGS_COL):
        return F.array().cast("array<string>")
    return F.coalesce(F.col(TAGS_COL), F.array().cast("array<string>"))


def add_tags(tags: list[str]) -> Callable[[DataFrame], DataFrame]:
    """Append-if-absent (set semantics, like AddTag's contains check)."""

    def apply(df: DataFrame) -> DataFrame:
        return df.withColumn(
            TAGS_COL, F.array_union(_tags(df), F.array(*[F.lit(t) for t in tags]))
        )

    return apply


def has_tag(tag: str) -> Column:
    return F.array_contains(F.col(TAGS_COL), tag)


def filter_by_tag(tag: str, keep: bool = True) -> Callable[[DataFrame], DataFrame]:
    def apply(df: DataFrame) -> DataFrame:
        hit = F.coalesce(F.array_contains(_tags(df), tag), F.lit(False))
        return df.filter(hit if keep else ~hit)

    return apply


# ---------------------------------------------------------------------------
# Factory: config-driven chain (mirror of processor.go:202-257).
# ---------------------------------------------------------------------------
_FACTORY: dict[str, Callable[..., Callable[[DataFrame], DataFrame]]] = {
    "add_fields": lambda cfg: add_fields(cfg["fields"]),
    "rename_fields": lambda cfg: rename_fields(cfg["fields"]),
    "drop_fields": lambda cfg: drop_fields(cfg["fields"]),
    "lowercase": lambda cfg: lowercase(cfg["fields"]),
    "trim": lambda cfg: trim(cfg["fields"]),
    "filter": lambda cfg: filter_contains(
        cfg["field"], cfg["pattern"], cfg.get("drop_if_match", True)
    ),
    "add_tags": lambda cfg: add_tags(cfg["tags"]),
    "filter_by_tag": lambda cfg: filter_by_tag(cfg["tag"], cfg.get("keep", True)),
    "dedup": lambda cfg: dedup_filter(cfg.get("keys")),
    "sample": lambda cfg: sample_filter(cfg["fraction"], cfg.get("seed", 17)),
}


def build_chain(configs: list[dict]) -> Callable[[DataFrame], DataFrame]:
    """[{type: ..., ...}, ...] -> one composed transform.

    Unknown type raises, like the reference factory (processor.go:254-256).
    """
    steps = []
    for cfg in configs:
        kind = cfg["type"]
        if kind not in _FACTORY:
            raise ValueError(f"unknown processor type: {kind!r}")
        steps.append(_FACTORY[kind](cfg))

    def apply(df: DataFrame) -> DataFrame:
        for step in steps:
            df = df.transform(step)
        return df

    return apply
