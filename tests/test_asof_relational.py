"""As-of join (cogrouped pandas) + big-big relational joins."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from log_aggregation_pipeline_spark.operators.asof import asof_join

SF = "/root/testdata/sf0.001"


def test_asof_backward_semantics(spark):
    left = spark.createDataFrame(
        [("u1", 1, "2024-01-01 10:00:00"), ("u1", 2, "2024-01-01 12:00:00"),
         ("u2", 3, "2024-01-01 10:00:00")],
        "user_id string, event_id long, ts_s string",
    ).select("user_id", "event_id", F.to_timestamp("ts_s").alias("ts"))
    right = spark.createDataFrame(
        [("u1", 100, "2024-01-01 09:00:00"), ("u1", 101, "2024-01-01 11:00:00"),
         ("u3", 102, "2024-01-01 08:00:00")],
        "user_id string, err_id long, ts_s string",
    ).select("user_id", "err_id", F.to_timestamp("ts_s").alias("ts"))

    out = {r.event_id: r for r in
           asof_join(left, right, on="ts", by="user_id", right_cols=["err_id"]).collect()}
    assert out[1].err_id_asof == 100      # 09:00 is latest <= 10:00
    assert out[2].err_id_asof == 101      # 11:00 is latest <= 12:00
    assert out[3].err_id_asof is None     # u2 has no right rows
    assert len(out) == 3                  # every left row survives


def test_asof_matches_duckdb(spark):
    import duckdb

    ev = spark.read.parquet(f"{SF}/events.parquet")
    purchases = ev.filter("event_type = 'purchase'").select("user_id", "event_id", "ts")
    errors = ev.filter("event_type = 'error'").select(
        "user_id", F.col("event_id").alias("err_id"), "ts"
    )
    sp = (
        asof_join(purchases, errors, on="ts", by="user_id", right_cols=["err_id"])
        .toPandas().sort_values(["user_id", "event_id"]).reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(f"create view events as select * from '{SF}/events.parquet'")
    dk = con.sql("""
        SELECT p.user_id, p.event_id, p.ts, e.ts AS ts_asof, e.event_id AS err_id_asof
        FROM (SELECT * FROM events WHERE event_type='purchase') p
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type='error') e
          ON p.user_id = e.user_id AND p.ts >= e.ts
    """).df().sort_values(["user_id", "event_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        sp.fillna(-1), dk[sp.columns].fillna(-1), check_dtype=False
    )


def test_shuffle_join_revenue(spark):
    """Big-big join path (sort-merge/shuffle-hash, not broadcast):
    lineitem x orders revenue per order priority vs pandas truth."""
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        got = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("rev"))
            .toPandas().set_index("o_orderpriority")["rev"]
        )
        plan = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    lp = li.toPandas().merge(orders.toPandas(), left_on="l_orderkey", right_on="o_orderkey")
    exp = (
        (lp["l_extendedprice"] * (1 - lp["l_discount"]))
        .groupby(lp["o_orderpriority"]).sum().round(2)
    )
    pd.testing.assert_series_equal(got.sort_index(), exp.sort_index(),
                                   check_names=False, rtol=1e-6)
