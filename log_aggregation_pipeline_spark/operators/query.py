"""Query engine: search / sort / paginate / point-lookup / aggregate
(SURVEY.md §2.7-2.8 and §3.2-3.3).

The reference's query surface is a struct, not a language
(/root/reference/pkg/models/common.go:63-87 ``SearchQuery``), executed
by /root/reference/internal/server/query/query.go.  This module maps
it onto Catalyst:

- F1 closed time range      -> ``ts BETWEEN`` (partition-prunable)
- F2 ci substring search    -> ``contains(lower(text), q)``
- F3 field filters [decl]   -> equality conjunction (the reference
                               declares but never applies them)
- O1 sort by timestamp      -> orderBy (the reference bubble-sorts a
                               page, query.go:228-246)
- O2/O3 limit+offset        -> global order-then-paginate (the
                               reference paginates a page-local sort —
                               corrected, SURVEY.md O3 note)
- O4 clamps                 -> limit<=0→100, >10000→10000, offset<0→0
                               (query.go:203-215)
- O5 field projection [decl]-> select
- S9 point lookup by id     -> filter + limit(1)

The reference's query cache (query.go:40-51, TTL 5 min, key that
ignores limit/offset — a stale-page bug) is deliberately NOT
replicated; persist() covers intra-job reuse (SURVEY.md §4).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dfield
from datetime import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .agg import count_all, date_histogram, terms_agg

MAX_LIMIT = 10_000
DEFAULT_LIMIT = 100


@dataclass
class SearchQuery:
    """Mirror of models.SearchQuery (common.go:63-87)."""

    query: str = ""
    start: datetime | str | None = None
    end: datetime | str | None = None
    filters: dict[str, object] = dfield(default_factory=dict)
    limit: int = DEFAULT_LIMIT
    offset: int = 0
    sort_by: str = "timestamp"
    sort_order: str = "desc"
    fields: list[str] | None = None


def clamp(q: SearchQuery) -> SearchQuery:
    """query.go:203-225 validation rules."""
    if q.limit <= 0:
        q.limit = DEFAULT_LIMIT
    if q.limit > MAX_LIMIT:
        q.limit = MAX_LIMIT
    if q.offset < 0:
        q.offset = 0
    if q.sort_by not in ("timestamp",):
        q.sort_by = "timestamp"
    if q.sort_order not in ("asc", "desc"):
        q.sort_order = "desc"
    return q


def apply_filters(
    df: DataFrame, q: SearchQuery, ts_col: str = "ts", text_col: str = "text"
) -> DataFrame:
    """Time range (closed, common.go:53-55) + substring + field filters."""
    if q.start is not None and q.end is not None:
        df = df.filter(F.col(ts_col).between(F.lit(q.start), F.lit(q.end)))
    elif q.start is not None:
        df = df.filter(F.col(ts_col) >= F.lit(q.start))
    elif q.end is not None:
        df = df.filter(F.col(ts_col) <= F.lit(q.end))
    if q.query:
        # reference: ASCII-lower substring scan (store.go:411-442);
        # lower() is Unicode-aware — identical on ASCII (SURVEY F2 note)
        df = df.filter(F.contains(F.lower(F.col(text_col)), F.lit(q.query.lower())))
    for k, v in q.filters.items():
        df = df.filter(F.col(k) == F.lit(v))
    return df


def search(
    df: DataFrame,
    q: SearchQuery,
    ts_col: str = "ts",
    text_col: str = "text",
    tiebreakers: tuple[str, ...] = (),
) -> DataFrame:
    """Full search path: filter -> global sort -> offset/limit -> project.

    ``tiebreakers`` make pagination deterministic when timestamps tie
    (the reference's sort is unstable and page-local; ours is a total
    order when tiebreakers are supplied).
    """
    q = clamp(q)
    df = apply_filters(df, q, ts_col, text_col)
    keys = [F.col(ts_col)] + [F.col(c) for c in tiebreakers]
    keys = [k.desc() if q.sort_order == "desc" else k.asc() for k in keys]
    df = df.orderBy(*keys)
    if q.offset:
        df = df.offset(q.offset)
    df = df.limit(q.limit)
    if q.fields:
        df = df.select(*q.fields)
    return df


def get_by_id(df: DataFrame, entry_id: str, id_col: str = "id") -> DataFrame:
    """S9 point lookup (store.go:222-250): metadata/stats pruning plays
    the role of the reference's in-memory id index."""
    return df.filter(F.col(id_col) == F.lit(entry_id)).limit(1)


def aggregate(
    df: DataFrame,
    q: SearchQuery,
    agg_type: str,
    agg_field: str | None = None,
    interval: str = "hour",
    ts_col: str = "ts",
    text_col: str = "text",
) -> DataFrame:
    """Aggregate path (query.go:106-127) over the FULL filtered set —
    not the post-limit page (deliberate fix, SURVEY.md §2.5)."""
    filtered = apply_filters(df, clamp(q), ts_col, text_col)
    if agg_type == "count":
        return count_all(filtered)
    if agg_type == "terms":
        if not agg_field:
            raise ValueError("terms aggregation requires a field")
        return terms_agg(filtered, agg_field)
    if agg_type == "date_histogram":
        return date_histogram(filtered, ts_col, interval)
    raise ValueError(f"unsupported aggregation type: {agg_type!r}")  # query.go:124-126
