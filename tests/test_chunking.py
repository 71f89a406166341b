"""Token-window chunking: exact windows, tail, overlap reconstruction."""

from __future__ import annotations

import pytest

from log_aggregation_pipeline_spark.operators.chunking import chunk_documents

TOKS = "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"


def _chunks(spark, text, chunk_tokens, overlap):
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    rows = chunk_documents(df, chunk_tokens, overlap).collect()
    return sorted(rows, key=lambda r: r.chunk_idx)


def test_exact_windows_and_tail(spark):
    got = _chunks(spark, TOKS, chunk_tokens=4, overlap=1)  # stride 3
    # NO fourth chunk "t9": a start inside the last window's overlap
    # would be a strict suffix of chunk 2 (duplicate text)
    assert [(r.chunk_idx, r.n_tokens, r.chunk_text) for r in got] == [
        (0, 4, "t0 t1 t2 t3"),
        (1, 4, "t3 t4 t5 t6"),
        (2, 4, "t6 t7 t8 t9"),
    ]


def test_true_tail_still_emitted(spark):
    # 11 tokens, chunk 4, overlap 1: start 9 adds token t10 -> kept
    got = _chunks(spark, TOKS + " t10", chunk_tokens=4, overlap=1)
    assert got[-1].chunk_text == "t9 t10" and got[-1].n_tokens == 2
    # union of chunks covers every token exactly
    seen = {t for r in got for t in r.chunk_text.split(" ")}
    assert seen == {f"t{i}" for i in range(11)}


def test_no_overlap_partitions_exactly(spark):
    got = _chunks(spark, TOKS, chunk_tokens=5, overlap=0)
    assert " ".join(r.chunk_text for r in got) == TOKS
    assert [r.n_tokens for r in got] == [5, 5]


def test_overlap_reconstruction(spark):
    # dropping each chunk's first `overlap` tokens (except chunk 0)
    # reconstructs the doc exactly — every token in >= 1 chunk, no loss
    overlap = 2
    got = _chunks(spark, TOKS, chunk_tokens=6, overlap=overlap)
    parts = [got[0].chunk_text.split(" ")] + [
        r.chunk_text.split(" ")[overlap:] for r in got[1:]
    ]
    assert " ".join(t for p in parts for t in p) == TOKS


def test_short_and_empty_docs(spark):
    assert [(r.n_tokens, r.chunk_text) for r in
            _chunks(spark, "only three tokens", 128, 32)] == [
        (3, "only three tokens")
    ]
    assert _chunks(spark, "   ", 128, 32) == []


def test_invalid_overlap_raises(spark):
    df = spark.createDataFrame([(0, TOKS)], "doc_id long, text string")
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, chunk_tokens=4, overlap=4)
    with pytest.raises(ValueError, match="overlap"):
        # negative overlap -> stride > chunk -> silent token loss
        chunk_documents(df, chunk_tokens=4, overlap=-1)


def test_bpeish_tokenizer_bills_punctuation(spark):
    """bpeish mode splits on the GPT-2-style pre-tok pieces — each
    punctuation mark is its own token, so punctuation-heavy text
    yields MORE chunks than whitespace mode, matching a Python re
    model of the same pattern."""
    import re

    from log_aggregation_pipeline_spark.operators.text_analysis import (
        BPEISH_PATTERN,
    )

    text = "a-b c.d e!f " * 8  # 24 ws tokens, 72 bpeish pieces
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    ws = chunk_documents(df, chunk_tokens=8, overlap=2).collect()
    bp = chunk_documents(
        df, chunk_tokens=8, overlap=2, tokenizer="bpeish"
    ).collect()
    pieces = re.findall(BPEISH_PATTERN, text)
    assert len(pieces) == 72 and sum(r.n_tokens for r in ws) < sum(
        r.n_tokens for r in bp
    )
    bp.sort(key=lambda r: r.chunk_idx)
    # chunk 0 is the first 8 pieces joined with spaces
    assert bp[0].chunk_text == " ".join(pieces[:8])
    # full coverage: last chunk ends at the final piece
    assert bp[-1].chunk_text.endswith(pieces[-1])


def test_unknown_tokenizer_raises(spark):
    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="tokenizer"):
        chunk_documents(df, tokenizer="sentencepiece")


def test_pack_sequences_bpeish_tokenizer(spark):
    """Packing bills by the chosen tokenizer: punctuation-dense text
    has more bpeish pieces than whitespace tokens, so the same doc
    fills more of its bin; budgets stay capacity-consistent."""
    import re

    from log_aggregation_pipeline_spark.operators.packing import (
        pack_sequences,
    )
    from log_aggregation_pipeline_spark.operators.text_analysis import (
        BPEISH_PATTERN,
    )

    text = "a-b c.d e!f " * 4  # 12 ws tokens, 36 bpeish pieces
    df = spark.createDataFrame(
        [(i, text) for i in range(6)], "doc_id long, text string"
    )
    ws = {r.doc_id: r for r in pack_sequences(
        df, capacity=24, n_shards=1).collect()}
    bp = {r.doc_id: r for r in pack_sequences(
        df, capacity=24, n_shards=1, tokenizer="bpeish").collect()}
    n_pieces = len(re.findall(BPEISH_PATTERN, text))
    assert all(r.n_tokens == 12 for r in ws.values())
    assert all(r.n_tokens == n_pieces == 36 for r in bp.values())
    # ws: two 12-token docs per 24-capacity bin; bpeish: each 36-piece
    # doc straddles (36 > 24) and bins advance faster
    assert max(r.bin_id for r in ws.values()) == 2
    assert max(r.bin_id for r in bp.values()) == 7  # start bin of doc 6: floor(5*36/24)
    assert not any(r.straddles for r in ws.values())
    assert all(r.straddles for r in bp.values())
