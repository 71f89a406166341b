"""As-of (point-in-time) join — a custom operator Spark lacks.

Semantics: for each left row, attach the single right row with the
largest ``on`` value ≤ the left's (direction='backward'; 'forward' is
the mirror), within the same ``by`` group.  Classic uses here: "the
most recent prior error for this purchase", "conversation state as of
this turn".

Implementation follows the preference order in SURVEY.md §2.11 /
pyspark_guide: no built-in composition expresses one-row-per-left-row
nearest-match efficiently, so this is a **cogrouped-pandas** operator:
``left.groupBy(by).cogroup(right.groupBy(by)).applyInPandas(merge_asof)``
— both sides hash-shuffle once on the group key, each group pair is
merged by pandas' C merge_asof.  Scale notes: state per task is one
group pair; skewed ``by`` keys split via operators.skew upstream.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str | list[str] = "user_id",
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
    direction: str = "backward",
    tolerance: pd.Timedelta | None = None,
) -> DataFrame:
    """Left as-of join; right value columns arrive suffixed.

    ``right_cols`` defaults to every right column except ``by``; the
    right ``on`` column is always attached as ``{on}{suffix}``.
    """
    from pyspark.sql import functions as F

    by_cols = [by] if isinstance(by, str) else list(by)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in by_cols]
    if on not in right_cols:
        right_cols = [on] + right_cols
    # Re-alias every right column: when left and right derive from the
    # SAME scan (self-as-of-join), they share attribute exprIds and the
    # cogroup plan's dedup silently drops the clashing right columns.
    # Alias mints fresh exprIds and makes the plan self-join-safe.
    right = right.select(
        *[F.col(c).alias(c) for c in by_cols + right_cols]
    )

    out_fields = list(left.schema.fields)
    rschema = {f.name: f for f in right.schema.fields}
    for c in right_cols:
        f = rschema[c]
        out_fields.append(T.StructField(f"{c}{suffix}", f.dataType, True))
    schema = T.StructType(out_fields)
    left_cols = [f.name for f in left.schema.fields]

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        assert on in rpdf.columns or rpdf.empty, (
            f"DBG lcols={list(lpdf.columns)} rcols={list(rpdf.columns)} "
            f"ln={len(lpdf)} rn={len(rpdf)} on={on} right_cols={right_cols}"
        )
        if lpdf.empty:
            return pd.DataFrame(columns=[f.name for f in out_fields])
        lsorted = lpdf.sort_values(on, kind="mergesort")
        if rpdf.empty:
            out = lsorted.copy()
            for c in right_cols:
                out[f"{c}{suffix}"] = None
            return out[[f.name for f in out_fields]]
        # deterministic tie-break: among right rows sharing the same
        # ``on`` value, the greatest (right_cols) tuple wins — a bare
        # sort on ``on`` preserves arbitrary shuffle arrival order and
        # merge_asof attaches whichever sorted last (nondeterministic)
        r_sort_keys = [on] + [c for c in right_cols if c != on]
        rsorted = rpdf.sort_values(r_sort_keys, kind="mergesort")[right_cols].rename(
            columns={c: f"{c}{suffix}" for c in right_cols}
        )
        out = pd.merge_asof(
            lsorted,
            rsorted,
            left_on=on,
            right_on=f"{on}{suffix}",
            direction=direction,
            tolerance=tolerance,
        )
        return out[[f.name for f in out_fields]]

    return (
        left.groupBy(*by_cols)
        .cogroup(right.groupBy(*by_cols))
        .applyInPandas(lambda l, r: merge(l, r), schema)
    )


def range_join_within(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str | list[str] = "user_id",
    window_seconds: int = 600,
    right_cols: list[str] | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Time-window correlation join — every (left, right) pair in the
    same ``by`` group whose ``on`` values lie within
    ``window_seconds`` of each other (|l.ts - r.ts| <= w, inclusive).
    The log-analytics classic: "errors within 10 minutes of this
    purchase" — the ALL-matches complement of ``asof_join``'s
    single-nearest-match.

    Implementation is a BUCKETIZED equi-join, not an inequality join:
    naive ``ON |l.ts - r.ts| <= w`` has no equi-key and Spark plans it
    as a broadcast-nested-loop/cartesian — the all-pairs scale-killer.
    Instead each right row lands in time bucket floor(us / w_us) and
    each left row EXPLODES to its three candidate buckets
    {b-1, b, b+1}; the join is then a plain shuffle equi-join on
    (by, bucket) followed by the exact |dt| filter.  Any qualifying
    right row's bucket differs from the left's by at most 1, and a
    right row has exactly ONE bucket, so every qualifying pair is
    produced exactly once — no dedup pass.  Replication factor is 3
    on the LEFT side only (pass the smaller side as ``left``).

    Timestamps compare in integer MICROSECONDS on both engines (the
    conv_features idiom), so the window edge is exact — no float
    epoch drift.  One shuffle per side, keys (by, bucket): time
    buckets spread hot ``by`` groups across the window axis, and AQE
    splits any residual skew.
    """
    from pyspark.sql import functions as F

    by_cols = [by] if isinstance(by, str) else list(by)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in by_cols]
    if on not in right_cols:
        right_cols = right_cols + [on]
    w_us = int(window_seconds) * 1_000_000

    l_us = F.unix_micros(F.col(on).cast("timestamp"))
    lb = left.withColumn("_us", l_us).withColumn(
        "_bkt",
        F.explode(
            F.array(*[F.floor(F.col("_us") / w_us) + d for d in (-1, 0, 1)])
        ),
    )
    rb = (
        right.select(
            *by_cols,
            *[
                F.col(c).alias(f"{c}{suffix}" if c != on else f"{on}{suffix}")
                for c in right_cols
            ],
        )
        .withColumn("_us_r", F.unix_micros(F.col(f"{on}{suffix}").cast("timestamp")))
        .withColumn("_bkt", F.floor(F.col("_us_r") / w_us))
    )
    return (
        lb.join(rb, by_cols + ["_bkt"])
        .filter(F.abs(F.col("_us") - F.col("_us_r")) <= w_us)
        .drop("_us", "_us_r", "_bkt")
    )
