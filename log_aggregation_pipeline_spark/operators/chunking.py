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
    tokenizer: str = "whitespace",
) -> DataFrame:
    """(id, chunk_idx, n_tokens, chunk_text) — token windows.  Window
    i covers tokens [i*stride, i*stride + chunk_tokens); the final
    window may be short (tail), every token belongs to >= 1 chunk, and
    no chunk is a strict suffix of its predecessor (a start inside the
    last window's overlap region would duplicate already-covered
    text — poison for a dedup-centric corpus).  Docs whose trimmed
    text is empty emit no chunks.

    ``tokenizer``: "whitespace" (normalized words — the packing/stats
    suite's unit) or "bpeish" (the GPT-2-style pre-tokenizer pieces of
    ``text_analysis.BPEISH_PATTERN`` over RAW text — closer to what a
    real tokenizer bills, since punctuation costs its own tokens;
    every non-space char matches one alternative, so any doc passing
    the trim filter has >= 1 token).  ``chunk_text`` joins tokens with
    single spaces in both modes — the token sequence is the training
    payload, not the original byte spacing."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"need 0 <= overlap < chunk_tokens, got overlap={overlap}, "
            f"chunk_tokens={chunk_tokens} (stride would be <= 0 or "
            "tokens would silently fall between windows)"
        )
    if tokenizer == "whitespace":
        tok_arr = F.split(normalize_text(text_col), " ")
    elif tokenizer == "bpeish":
        from log_aggregation_pipeline_spark.operators.text_analysis import (
            BPEISH_PATTERN,
        )

        tok_arr = F.regexp_extract_all(
            F.col(text_col), F.lit(BPEISH_PATTERN), F.lit(0)
        )
    else:
        raise ValueError(
            f"tokenizer must be whitespace or bpeish, got {tokenizer!r}"
        )
    stride = chunk_tokens - overlap
    # cheap pre-projection filter (trim(text) empty iff zero tokens in
    # both modes): filtering on the token column itself would be
    # pushed below the projection and re-run the regex per row
    toks = (
        df.filter(F.trim(F.col(text_col)) != "")
        .select(F.col(id_col), tok_arr.alias("_t"))
        .select(F.col(id_col), "_t", F.size("_t").alias("_n"))
    )
    # last start: the largest stride multiple <= n - overlap - 1 —
    # any later start yields a chunk fully contained in the previous
    # one; coverage still holds (last_start + chunk_tokens >= n)
    starts = toks.select(
        id_col,
        "_t",
        "_n",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("_n") - overlap - 1, F.lit(0)),
                F.lit(stride),
            )
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
