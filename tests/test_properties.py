"""Property-based tests (SURVEY.md §5.5, hypothesis).

Parse is TOTAL over arbitrary text, and routing partitions exactly by
the predicate truth table — on randomized inputs, batched per example
so Spark runs once per hypothesis case."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from log_aggregation_pipeline_spark.operators.parse import parse_transcripts
from log_aggregation_pipeline_spark.operators.route import ROUTES, route_pandas
from log_aggregation_pipeline_spark.schema import TRANSCRIPT_SCHEMA

_spark = None  # set by the fixture-less hypothesis path via conftest's session


def _get_spark():
    global _spark
    if _spark is None:
        from log_aggregation_pipeline_spark.session import get_spark

        _spark = get_spark(app_name="lap-tests", cores=8, shuffle_partitions=8)
    return _spark


text_strategy = st.one_of(
    st.text(max_size=80),
    st.from_regex(r"(ERROR|INFO|garbled|WARN)[ a-z=0-9]{0,40}", fullmatch=True),
    st.from_regex(r"[A-Z]{1,8} svc=\w{1,5} code=E\d{3}", fullmatch=True),
)

rows_strategy = st.lists(
    st.tuples(
        st.sampled_from(["c1", "c2", "c3"]),
        st.integers(0, 500),
        st.sampled_from(["user", "assistant", "system", "tool", ""]),
        text_strategy,
        st.sampled_from([None, "", "search", "exec"]),
    ),
    min_size=1,
    max_size=60,
)


def _to_df(rows):
    pdf = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool"]
    ).astype({"turn_idx": "int32"})
    pdf["ts"] = pd.Timestamp("2024-01-01") + pd.to_timedelta(
        pdf["turn_idx"], unit="m"
    )
    return _get_spark().createDataFrame(pdf, schema=TRANSCRIPT_SCHEMA)


@settings(max_examples=12, deadline=None)
@given(rows=rows_strategy)
def test_parse_is_total(rows):
    df = _to_df(rows)
    parsed = parse_transcripts(df)
    out = parsed.select("level", "parse_ok").toPandas()
    assert len(out) == len(rows)  # never throws, never drops
    # parse_ok=false <=> no level extracted
    assert (out["level"].notna() == out["parse_ok"]).all()


@settings(max_examples=12, deadline=None)
@given(rows=rows_strategy)
def test_route_matches_truth_table(rows):
    df = _to_df(rows)
    parsed = parse_transcripts(df)
    pdf = parsed.toPandas()
    expected = route_pandas(pdf)
    for name, route in ROUTES.items():
        got = parsed.filter(route.spark_pred()).count()
        assert got == len(expected[name])


@settings(max_examples=8, deadline=None)
@given(rows=rows_strategy, frac=st.sampled_from([0.1, 0.33, 0.8]))
def test_sampling_properties(rows, frac):
    import math

    from log_aggregation_pipeline_spark.operators import sampling as SA

    # unique row identity per (conv, turn) — duplicates collapse to one
    uniq = {(r[0], r[1]): r for r in rows}
    df = _to_df(list(uniq.values()))
    n = df.count()
    ids = ["conv_id", "turn_idx"]

    strat = SA.stratified_sample_exact(df, ["conv_id"], frac, ids)
    got = {r["conv_id"]: r["n"] for r in
           strat.groupBy("conv_id").agg(F.count("*").alias("n")).collect()}
    per = {r["conv_id"]: r["n"] for r in
           df.groupBy("conv_id").agg(F.count("*").alias("n")).collect()}
    assert got == {k: math.ceil(v * frac) for k, v in per.items()}
    # sample ⊆ input
    assert strat.select(*ids).exceptAll(df.select(*ids)).count() == 0

    k = 5
    res = SA.reservoir_sample(df, k, ids)
    assert res.count() == min(k, n)
    # determinism across invocations
    a = sorted(map(tuple, res.select(*ids).collect()))
    b = sorted(map(tuple, SA.reservoir_sample(df, k, ids).select(*ids).collect()))
    assert a == b


@settings(max_examples=8, deadline=None)
@given(rows=rows_strategy)
def test_conv_features_blocked_equals_plain_property(rows):
    from log_aggregation_pipeline_spark.operators.features import (
        conv_features,
        conv_features_salted,
    )

    uniq = {(r[0], r[1]): r for r in rows}  # unique turn_idx per conv
    df = _to_df(list(uniq.values()))

    def norm(out):
        rows_ = []
        for r in out.collect():
            d = r.asDict()
            rows_.append(tuple(sorted(d.items())))
        return sorted(rows_)

    assert norm(conv_features_salted(df, block_size=4)) == norm(conv_features(df))


# ---------------------------------------------------------------------------
# packing vs a pure-Python sequential model
# ---------------------------------------------------------------------------
@given(
    toks=st.lists(st.integers(0, 40), min_size=1, max_size=25),
    capacity=st.sampled_from([8, 32, 512]),
)
@settings(max_examples=8, deadline=None)
def test_packing_matches_sequential_model(toks, capacity):
    from log_aggregation_pipeline_spark.operators.packing import pack_sequences

    spark = _get_spark()
    rows = [(i, " ".join(["w"] * n)) for i, n in enumerate(toks)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in
           pack_sequences(df, capacity=capacity, n_shards=1).collect()}

    before = 0
    for i, n in enumerate(toks):
        r = got[i]
        assert r.n_tokens == n
        assert r.bin_id == before // capacity
        assert r.bin_offset == before % capacity
        expect_straddle = n > 0 and (before + n - 1) // capacity > before // capacity
        assert r.straddles == expect_straddle
        before += n


# ---------------------------------------------------------------------------
# connected components vs a union-find reference
# ---------------------------------------------------------------------------
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 20), st.integers(0, 20)),
        min_size=1, max_size=25,
    ).filter(lambda es: any(a != b for a, b in es)),
)
@settings(max_examples=8, deadline=None)
def test_connected_components_match_union_find(edges):
    from log_aggregation_pipeline_spark.operators.cluster import (
        connected_components,
    )

    edges = [(a, b) for a, b in edges if a != b]
    spark = _get_spark()
    pairs = spark.createDataFrame(edges, "a_id long, b_id long")
    got = {r.node: r.component for r in connected_components(pairs).collect()}

    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = {n for e in edges for n in e}
    expect = {}
    for n in nodes:
        comp = min(m for m in nodes if find(m) == find(n))
        expect[n] = comp
    assert got == expect


# ---------------------------------------------------------------------------
# redaction: Spark (Java regex) vs Python re on random text — pins the
# patterns to the cross-dialect subset
# ---------------------------------------------------------------------------
redact_text = st.lists(
    st.one_of(
        st.text(alphabet="abcdefghij @.:=_-0123456789", max_size=30),
        st.just("mail me at user@example.com ok"),
        st.just("from 10.2.3.44 and 256.1.1.1"),
        st.just("api_key=abcdef0123456789"),
        st.just("token=short"),
        st.just("Bearer XYZsecretvalue99"),
    ),
    min_size=1, max_size=8,
).map(" ".join)


@given(texts=st.lists(redact_text, min_size=1, max_size=6))
@settings(max_examples=10, deadline=None)
def test_redact_counts_match_python_re(texts):
    import re

    from log_aggregation_pipeline_spark.operators.redact import (
        REDACTIONS,
        redact,
    )

    spark = _get_spark()
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {r.doc_id: r for r in redact(df).collect()}
    for i, t in enumerate(texts):
        red = t
        for name, pat, repl in REDACTIONS:
            assert got[i][f"n_{name}"] == len(re.findall(pat, t)), (name, t)
            red = re.sub(pat, repl, red)
        assert got[i].redacted == red, t


# ---------------------------------------------------------------------------
# corpus_stats quantiles vs numpy linear interpolation
# ---------------------------------------------------------------------------
@given(toks=st.lists(st.integers(1, 60), min_size=1, max_size=20))
@settings(max_examples=8, deadline=None)
def test_corpus_stats_quantiles_match_numpy(toks):
    import numpy as np

    from log_aggregation_pipeline_spark.operators.text_analysis import (
        corpus_stats,
    )

    spark = _get_spark()
    rows = [(i, " ".join(["w"] * n), "s") for i, n in enumerate(toks)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    r = corpus_stats(df).first()
    assert r.p50_tokens == round(float(np.percentile(toks, 50)), 6)
    assert r.p95_tokens == round(float(np.percentile(toks, 95)), 6)
    assert r.total_tokens == sum(toks) and r.n_docs == len(toks)


# ---------------------------------------------------------------------------
# chunking vs a pure-Python window model
# ---------------------------------------------------------------------------
@given(
    n_toks=st.lists(st.integers(1, 50), min_size=1, max_size=8),
    params=st.sampled_from([(4, 0), (4, 1), (8, 3), (128, 32)]),
)
@settings(max_examples=8, deadline=None)
def test_chunking_matches_window_model(n_toks, params):
    from log_aggregation_pipeline_spark.operators.chunking import (
        chunk_documents,
    )

    chunk_tokens, overlap = params
    stride = chunk_tokens - overlap
    spark = _get_spark()
    texts = [" ".join(f"w{d}_{j}" for j in range(n)) for d, n in enumerate(n_toks)]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got: dict[int, list] = {}
    for r in chunk_documents(df, chunk_tokens, overlap).collect():
        got.setdefault(r.doc_id, []).append(r)
    for d, n in enumerate(n_toks):
        toks = texts[d].split(" ")
        expect = [
            (s // stride, toks[s:s + chunk_tokens])
            for s in range(0, max(n - overlap, 1), stride)
        ]
        rows = sorted(got[d], key=lambda r: r.chunk_idx)
        assert [(r.chunk_idx, r.chunk_text.split(" ")) for r in rows] == expect
        assert all(r.n_tokens == len(e[1]) for r, e in zip(rows, expect))


# ---------------------------------------------------------------------------
# cluster keeper election vs a union-find + argmax reference
# ---------------------------------------------------------------------------
_GOOD_TEXT = (
    "the quick brown fox jumps over the lazy dog and then it runs far "
    "away into the woods to rest for a while in the shade of an oak"
)
_BAD_TEXT = "x"
_qcache: dict[str, float] = {}


def _quality_of(text: str) -> float:
    if text not in _qcache:
        from log_aggregation_pipeline_spark.operators.text_analysis import (
            quality_features,
        )

        df = _get_spark().createDataFrame(
            [(0, text)], "doc_id long, text string"
        )
        _qcache[text] = quality_features(df).collect()[0].quality_score
    return _qcache[text]


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)),
        min_size=1, max_size=20,
    ).filter(lambda es: any(a != b for a, b in es)),
    good=st.sets(st.integers(0, 15)),
)
@settings(max_examples=6, deadline=None)
def test_cluster_keepers_match_model(edges, good):
    from log_aggregation_pipeline_spark.operators.cluster import (
        cluster_keepers,
    )

    edges = [(a, b) for a, b in edges if a != b]
    nodes = sorted({n for e in edges for n in e})
    spark = _get_spark()
    docs = spark.createDataFrame(
        [(n, _GOOD_TEXT if n in good else _BAD_TEXT) for n in nodes],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(edges, "a_id long, b_id long")
    got = {
        r.cluster_rep: (r.keeper_id, r.cluster_size)
        for r in cluster_keepers(docs, pairs).collect()
    }

    qg, qb = _quality_of(_GOOD_TEXT), _quality_of(_BAD_TEXT)
    assert qg > qb  # precondition of the model

    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comps: dict[int, list[int]] = {}
    for n in nodes:
        comps.setdefault(
            min(m for m in nodes if find(m) == find(n)), []
        ).append(n)
    expect = {
        rep: (
            min(ms, key=lambda n: (-(qg if n in good else qb), n)),
            len(ms),
        )
        for rep, ms in comps.items()
    }
    assert got == expect


@settings(max_examples=10, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["u1", "u2"]),
            st.booleans(),                  # side: left / right
            st.integers(-2000, 2000),       # seconds offset
        ),
        min_size=2,
        max_size=30,
    ),
    window=st.sampled_from([1, 60, 600]),
)
def test_range_join_equals_naive_definition(rows, window):
    """Bucketized range join == the |dt| <= w definition on arbitrary
    timestamp layouts — bucket boundaries, exact edges, empty sides."""
    import datetime as dt

    from log_aggregation_pipeline_spark.operators.asof import (
        range_join_within,
    )

    spark = _get_spark()
    t0 = dt.datetime(2024, 1, 1)
    lrows, rrows = [], []
    for i, (u, is_left, s) in enumerate(rows):
        (lrows if is_left else rrows).append((u, i, t0 + dt.timedelta(seconds=s)))
    if not lrows or not rrows:
        return
    schema = "user_id string, event_id int, ts timestamp"
    left = spark.createDataFrame(lrows, schema)
    right = spark.createDataFrame(rrows, schema)
    got = sorted(
        (r.user_id, r.event_id, r.event_id_r)
        for r in range_join_within(
            left, right, window_seconds=window
        ).collect()
    )
    exp = sorted(
        (lu, li, ri)
        for lu, li, lt in lrows
        for ru, ri, rt in rrows
        if lu == ru and abs((lt - rt).total_seconds()) <= window
    )
    assert got == exp


@settings(max_examples=8, deadline=None)
@given(
    docs=st.lists(
        st.tuples(
            st.integers(0, 200),                    # doc_id (dedup below)
            st.sampled_from(["A", "B", "C"]),       # source
            st.integers(1, 40),                     # token count
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    ),
    budget=st.sampled_from([0, 50, 300, 10_000]),
)
def test_corpus_mix_budget_properties(docs, budget):
    """Invariants on arbitrary corpora: per-source selected tokens
    never exceed the integer target; the draw is greedy-maximal in
    hash order (the first unselected doc would overflow); unweighted
    sources never appear."""
    import hashlib

    from log_aggregation_pipeline_spark.operators.sampling import (
        corpus_mix,
        mix_targets,
    )

    spark = _get_spark()
    weights = {"A": 2.0, "B": 1.0}  # C unweighted
    targets = mix_targets(weights, budget)
    rows = [(i, "w " * n, src) for i, src, n in docs]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = corpus_mix(df, weights, budget)
    sel = {}
    for r in got.collect():
        sel.setdefault(r.source, []).append(r)
    assert "C" not in sel
    by_src_all = {}
    for i, src, n in docs:
        by_src_all.setdefault(src, []).append((i, n))
    for src, rows_sel in sel.items():
        tot = sum(r.n_tokens for r in rows_sel)
        assert tot <= targets[src]
        assert max(r.cum_tokens for r in rows_sel) == tot
    # greedy-maximality: walk each source in hash order; the selected
    # set must be exactly the maximal prefix under the running total
    for src in ("A", "B"):
        order = sorted(
            by_src_all.get(src, []),
            key=lambda t: (hashlib.md5(f"{t[0]}:17".encode()).hexdigest(), t[0]),
        )
        cum, expect = 0, []
        for i, n in order:
            cum += n
            if cum > targets.get(src, 0):
                break
            expect.append(i)
        assert sorted(r.doc_id for r in sel.get(src, [])) == sorted(expect)


# -- quality-classifier feature dialect parity (r7) -------------------------
# The classifier's six integer features must agree between the Spark
# expressions and the DuckDB twin on ARBITRARY unicode text, not just
# the corpus and the hand-picked edge rows — any divergence here is a
# Java-vs-RE2 regex or split-semantics drift that would eventually
# surface as a driver hash mismatch on some future corpus.
clf_text_strategy = st.one_of(
    st.text(max_size=120),  # arbitrary unicode incl. controls
    st.from_regex(r"[ \t\n\x0b\f\r]{0,6}", fullmatch=True),
    st.from_regex(
        r"(the|a|of|zz|única|#|\.\.\.|[0-9]{1,4})([ \t]"
        r"(the|a|of|zz|única|#|\.\.\.|[0-9]{1,4})){0,20}",
        fullmatch=True,
    ),
)


@settings(max_examples=12, deadline=None)
@given(texts=st.lists(clf_text_strategy, min_size=1, max_size=30))
def test_quality_clf_features_match_duckdb(texts):
    import duckdb

    from log_aggregation_pipeline_spark import oracle
    from log_aggregation_pipeline_spark.operators.quality_model import (
        QUALITY_CLF_BIAS_NANO,
        QUALITY_CLF_FEATURES,
        QUALITY_CLF_WEIGHTS_NANO,
        clf_features,
    )
    from log_aggregation_pipeline_spark.operators.text_analysis import (
        STOPWORDS,
    )

    pdf = pd.DataFrame(
        {"doc_id": range(len(texts)), "text": texts}
    )
    sp = (
        clf_features(_get_spark().createDataFrame(pdf))
        .select("doc_id", *QUALITY_CLF_FEATURES)
        .orderBy("doc_id")
        .toPandas()
    )
    con = duckdb.connect()
    con.register("documents", pdf)
    sql = oracle.quality_clf_sql(
        QUALITY_CLF_WEIGHTS_NANO, QUALITY_CLF_BIAS_NANO, STOPWORDS
    )
    dk = con.sql(
        f"SELECT doc_id, {', '.join(QUALITY_CLF_FEATURES)} FROM ({sql}) "
        "ORDER BY doc_id"
    ).df()
    pd.testing.assert_frame_equal(
        sp.reset_index(drop=True), dk.reset_index(drop=True),
        check_dtype=False,
    )


@settings(max_examples=10, deadline=None)
@given(texts=st.lists(st.one_of(
    st.text(max_size=150),
    st.from_regex(
        r"((the|and|of|to|zz|-|\*|•|#|\.\.\.|…|wörd|[0-9]{1,3})"
        r"[ \t\n]){0,30}", fullmatch=True),
), min_size=1, max_size=25))
def test_gopher_rules_match_duckdb(texts):
    """The Gopher gate is load-bearing (the funnels and dataset_card
    compose on it) — its six metrics + pass flag must agree with the
    SQL twin on arbitrary unicode, incl. newlines, bullets, ellipses
    and non-ASCII words, not just the corpus."""
    import duckdb

    from log_aggregation_pipeline_spark import oracle
    from log_aggregation_pipeline_spark.operators.text_analysis import (
        GOPHER_STOPS,
        gopher_rules,
    )

    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    cols = ["doc_id", "n_tokens", "mean_word_len", "symbol_ratio",
            "bullet_frac", "ellipsis_frac", "alpha_word_frac",
            "stop_hits", "gopher_pass"]
    sp = (
        gopher_rules(_get_spark().createDataFrame(pdf))
        .select(*cols)
        .orderBy("doc_id")
        .toPandas()
    )
    con = duckdb.connect()
    con.register("documents", pdf)
    dk = con.sql(
        f"SELECT {', '.join(cols)} FROM ({oracle.gopher_sql(GOPHER_STOPS)}) "
        "ORDER BY doc_id"
    ).df()
    pd.testing.assert_frame_equal(
        sp.reset_index(drop=True), dk.reset_index(drop=True),
        check_dtype=False,
    )
