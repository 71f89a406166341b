"""Token-window document chunking — the within-doc splitter.

``packing`` answers "which docs share a training bin"; chunking
answers "how does ONE long document become model-sized pieces": fixed
token windows of ``chunk_tokens`` advancing by ``chunk_tokens -
overlap``, the standard RAG / long-context-training shape (overlap
preserves context across cuts).

Scale shape: a pure projection — materialized token array, a
``sequence`` of window starts, explode, ``slice`` per window.  No
shuffle, no UDF; chunking rides the scan, and a doc's chunk count is
ceil(n/stride) so output size is predictable from token counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from log_aggregation_pipeline_spark.operators.dedupe import normalize_text


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 128,
    overlap: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, chunk_idx, n_tokens, chunk_text) — whitespace-token windows
    over normalized text.  Window i covers tokens
    [i*stride, i*stride + chunk_tokens); the final windows may be
    short (tail), and every token belongs to >= 1 chunk.  Docs whose
    normalized text is empty emit no chunks."""
    if overlap >= chunk_tokens:
        raise ValueError(
            f"overlap={overlap} must be < chunk_tokens={chunk_tokens} "
            "(stride would be <= 0)"
        )
    stride = chunk_tokens - overlap
    toks = (
        df.select(
            F.col(id_col),
            F.split(normalize_text(text_col), " ").alias("_t"),
            normalize_text(text_col).alias("_norm"),
        )
        .filter(F.col("_norm") != "")
        .select(F.col(id_col), "_t", F.size("_t").alias("_n"))
    )
    starts = toks.select(
        id_col,
        "_t",
        "_n",
        F.explode(
            F.sequence(F.lit(0), F.col("_n") - 1, F.lit(stride))
        ).alias("_s"),
    )
    chunk = F.slice(F.col("_t"), F.col("_s") + 1, chunk_tokens)
    return starts.select(
        id_col,
        (F.col("_s") / stride).cast("int").alias("chunk_idx"),
        F.least(F.lit(chunk_tokens), F.col("_n") - F.col("_s")).alias(
            "n_tokens"
        ),
        F.array_join(chunk, " ").alias("chunk_text"),
    )
