"""Enrich stage: broadcast lookup joins (SURVEY.md §2.4 J2).

The reference has no relational join; its blueprint declares a lookup
enrich stage (/root/reference/log-aggregation-pipeline-blueprint.md:263-268)
and the north-star requires role/tool metadata attachment.  Small
dimension tables are always broadcast — the probe side never shuffles,
which is the only join strategy that survives a 100 TB fact side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schema import (
    ROLE_LOOKUP_ROWS,
    ROLE_LOOKUP_SCHEMA,
    TOOL_LOOKUP_ROWS,
    TOOL_LOOKUP_SCHEMA,
)


def role_lookup_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(ROLE_LOOKUP_ROWS, schema=ROLE_LOOKUP_SCHEMA)


def tool_lookup_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(TOOL_LOOKUP_ROWS, schema=TOOL_LOOKUP_SCHEMA)


def enrich(
    df: DataFrame,
    role_lookup: DataFrame | None = None,
    tool_lookup: DataFrame | None = None,
) -> DataFrame:
    """Left broadcast joins on role and tool.

    Left (not inner) so unmatched rows survive — enrich never drops
    data; tool-less turns get NULL tool metadata.
    """
    spark = df.sparkSession
    role_lookup = role_lookup if role_lookup is not None else role_lookup_df(spark)
    tool_lookup = tool_lookup if tool_lookup is not None else tool_lookup_df(spark)
    return df.join(F.broadcast(role_lookup), on="role", how="left").join(
        F.broadcast(tool_lookup), on="tool", how="left"
    )
