from __future__ import annotations

import pandas as pd
import pytest

from log_aggregation_pipeline_spark.session import get_spark
from log_aggregation_pipeline_spark.sources.transcripts import (
    generate_transcripts,
    transcripts_df,
)


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="lap-tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def transcripts_pdf() -> pd.DataFrame:
    return generate_transcripts()


@pytest.fixture(scope="session")
def transcripts(spark, transcripts_pdf):
    return transcripts_df(spark, transcripts_pdf)
