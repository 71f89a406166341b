"""Deduplication operators for training-data pipelines.

Beyond the reference (its blueprint only *declares* a dedup filter
stage, /root/reference/log-aggregation-pipeline-blueprint.md:269-274),
these are the operators a 100 TB corpus pipeline needs:

- exact dedup        — hash-groupBy (one shuffle)
- n-gram Jaccard     — shingle explode + self-join on shingle
- MinHash + LSH      — signature -> banded bucket join -> verified pairs
- SimHash            — numpy-vectorized 64-bit signatures + banded
                       candidate join + Hamming filter
- embedding cosine   — exact pair scan (small n) / LSH bucket path in
                       operators.similarity for scale

Scale posture: every operator keys its shuffle on content-derived
values (hash, shingle, band) — uniform by construction, no skew
salting needed; the one hot spot is frequent shingles in the Jaccard
join, bounded by ``max_shingle_freq`` (drop stop-shingles, the
standard cap for O(n·f²) blowup).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


# ---------------------------------------------------------------------------
# shared text normalization (also mirrored in oracle SQL)
# ---------------------------------------------------------------------------
def normalize_text(col: Column | str) -> Column:
    # whitespace spelled out instead of \s: Java's \s includes \x0B,
    # RE2's (DuckDB) does not — the explicit class keeps the oracle
    # twin exact on corpora containing vertical tabs (repo gotcha)
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.lower(F.trim(c)), r"[ \t\n\x0B\f\r]+", " ")


def content_hash(col: Column | str) -> Column:
    return F.md5(normalize_text(col))


def shingles_from_tokens(toks: Column | str, k: int = 3) -> Column:
    """Distinct word k-grams from a MATERIALIZED token-array column.

    The tokens must be a plain column reference, not an inline
    expression: the transform lambda references them ~3·|shingles|
    times, and Catalyst inlines (re-evaluates) expression arguments
    per reference — an inline split(regexp_replace(...)) makes the
    shingle step O(words²) regex work (measured 19 s for 5k docs vs
    0.3 s materialized)."""
    toks = F.col(toks) if isinstance(toks, str) else toks
    n = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(0), n - k),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(k)]
        ),
    )
    return F.array_distinct(F.when(n >= k, grams).otherwise(F.array()))


def word_shingles(col: Column | str, k: int = 3) -> Column:
    """Distinct word k-grams as an array<string> — pure expressions.

    Convenience form over an inline text column; prefer
    ``_shingle_df``/``shingles_from_tokens`` in loops and joins (see
    the O(words²) note there)."""
    return shingles_from_tokens(F.split(normalize_text(col), " "), k)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------
def exact_dedup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(content_hash, n_copies, keeper) — keeper = min id per group."""
    return (
        df.select(content_hash(text_col).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(F.count("*").alias("n_copies"), F.min(id_col).alias("keeper"))
    )


def exact_dedup_rows(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one row (lowest id) per identical normalized text.

    Window over the hash — single shuffle, no join-back."""
    w = Window.partitionBy(content_hash(text_col)).orderBy(F.col(id_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


# ---------------------------------------------------------------------------
# incremental dedup (new batch vs existing corpus)
# ---------------------------------------------------------------------------
def seen_content_hashes(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Distinct content hashes of an existing corpus — the (tiny
    relative to the corpus) state an incremental dedup needs.  At
    scale this is computed ONCE at ingest and stored as its own
    table; passing raw docs here recomputes it from a column-pruned
    scan."""
    return df.select(content_hash(text_col).alias("content_hash")).distinct()


def incremental_exact_new(
    new_docs: DataFrame,
    seen: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact dedup of a NEW batch against an existing corpus — the
    daily-crawl increment pattern: never re-pair the corpus with
    itself, only the new batch within itself (window, lowest id wins)
    and against the seen hash set (left_anti join).

    ``seen`` is either raw documents or a precomputed
    ``seen_content_hashes`` table (detected by its ``content_hash``
    column).  Returns the surviving new rows with ``content_hash``
    attached (the state to append to the seen table for the next
    increment — the operator is its own state maintainer).

    Scale shape: one window shuffle over the NEW batch only (batch
    sized, not corpus sized) + one anti-join keyed on the hash.  The
    anti-join shuffles the seen hash set once; at 100 TB keep the
    seen table bucketed by content_hash so only the new side moves."""
    seen_h = (
        seen.select("content_hash")
        if "content_hash" in seen.columns
        else seen_content_hashes(seen, text_col)
    )
    w = Window.partitionBy("content_hash").orderBy(F.col(id_col))
    batch_keep = (
        new_docs.withColumn("content_hash", content_hash(text_col))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    return batch_keep.join(seen_h, "content_hash", "left_anti")


# ---------------------------------------------------------------------------
# n-gram Jaccard pairs (exact near-dup)
# ---------------------------------------------------------------------------
def ngram_jaccard_pairs(
    df: DataFrame,
    k: int = 3,
    threshold: float = 0.4,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_shingle_freq: int | None = 1000,
) -> DataFrame:
    """Pairs (a_id < b_id) with shingle-set Jaccard >= threshold.

    Exact: every qualifying pair shares >=1 shingle, so the shingle
    self-join finds all of them.  ``max_shingle_freq`` (default 1000 —
    the scale guardrail, None disables) drops shingles occurring in
    more than that many docs before the join: at corpus scale a
    handful of stop-shingles otherwise dominate it (f² candidate pairs
    each).  With the cap active, n_common counts only sub-cap common
    shingles (denominators stay uncapped), so exactness holds for
    pairs whose common shingles are all sub-cap; use
    ``dropped_shingle_stats`` to log what the cap removed (no silent
    truncation).
    """
    # r8 shape: ONE explode pass feeds everything.  The r7 form built
    # four independent references to the shingle subtree (freq table,
    # both self-join sides, and a separate per-doc ``sizes`` table
    # joined back twice) — Catalyst does not dedupe subplans, so the
    # physical plan evaluated the scan + shingle HOFs SIX times (12
    # FileScans, 16 Exchanges at sf0.1).  Here the doc's shingle-set
    # size rides each exploded row (one int column), the self-join is
    # replaced by per-shingle pair GENERATION (collect the shingle's
    # member list — bounded by ``max_shingle_freq`` — and emit the
    # ordered pairs with one HOF), and the two size joins disappear
    # because na/nb are constant per group.  Candidate volume is the
    # same sum-of-f² the join produced; the work just no longer
    # re-derives its inputs per reference.  2 evaluations of the
    # shingle projection remain (the freq pre-filter below) vs 6.
    sh = _shingle_df(df, k, text_col, id_col)
    ex = sh.select(
        "_id", F.size("_sh").alias("_n"), F.explode_outer("_sh").alias("_s")
    )
    if max_shingle_freq is not None:
        # count-first pre-filter, THEN collect: the collect_list
        # aggregate below must never buffer a super-cap stop-shingle's
        # full membership (at corpus scale that is the OOM path); the
        # count aggregate's state is O(1) per key and the semi-join
        # drops hot shingles before any list exists.
        freq = ex.groupBy("_s").agg(F.count("*").alias("_f"))
        ex = ex.join(freq.filter(F.col("_f") <= max_shingle_freq), "_s", "left_semi")
    members = (
        ex.groupBy("_s")
        .agg(F.collect_list(F.struct("_id", "_n")).alias("_ms"))
        .filter(F.size("_ms") >= 2)
        .select("_ms")
    )
    # ordered pairs (a_id < b_id) per shingle, by id comparison inside
    # the pair HOF — each unordered pair is emitted exactly once with
    # a < b regardless of collect order, so no sort is needed (and the
    # filter/transform nesting codegens far better cold than a
    # slice-per-position form: 8.0 s vs 2.8 s first run at sf0.1).
    pairs = members.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("_ms"),
                    lambda m1: F.transform(
                        F.filter(
                            F.col("_ms"), lambda m2: m2["_id"] > m1["_id"]
                        ),
                        lambda m2: F.struct(
                            m1["_id"].alias("a_id"),
                            m1["_n"].alias("na"),
                            m2["_id"].alias("b_id"),
                            m2["_n"].alias("nb"),
                        ),
                    ),
                )
            )
        ).alias("_p")
    ).select("_p.a_id", "_p.na", "_p.b_id", "_p.nb")
    common = pairs.groupBy("a_id", "b_id").agg(
        F.count("*").alias("n_common"),
        F.min("na").alias("na"),  # constant per a_id — min == the value
        F.min("nb").alias("nb"),
    )
    out = (
        common.withColumn(
            "jaccard",
            F.round(
                F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "n_common", "jaccard")
    )
    return out


def dropped_shingle_stats(
    df: DataFrame,
    k: int = 3,
    max_shingle_freq: int = 1000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[int, int]:
    """(n_distinct_shingles_dropped, n_instances_dropped) under the
    frequency cap — the observability twin of ``max_shingle_freq`` so
    pipelines can log rather than silently truncate."""
    ex = _explode_shingles(_shingle_df(df, k, text_col, id_col))
    row = (
        ex.groupBy("_s")
        .agg(F.count("*").alias("_f"))
        .filter(F.col("_f") > max_shingle_freq)
        .agg(F.count("*").alias("n_shingles"), F.sum("_f").alias("n_instances"))
        .first()
    )
    return int(row["n_shingles"] or 0), int(row["n_instances"] or 0)


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------
def _shingle_df(df: DataFrame, k: int, text_col: str, id_col: str) -> DataFrame:
    # two projections: tokens materialize first, shingles reference
    # them as an attribute (see shingles_from_tokens perf note).
    # The non-empty filter is expressed on the TOKEN count, not on
    # size(_sh): a filter on _sh gets pushed below the projection,
    # inlining the whole nested-HOF shingle expression into the Filter
    # operator where it drops out of whole-stage codegen (measured 11x
    # slower).  size(_toks) >= k is exactly equivalent: the gram array
    # has n-k+1 >= 1 elements iff n >= k, and array_distinct of a
    # non-empty array is non-empty.
    return (
        df.select(
            F.col(id_col).alias("_id"),
            F.split(normalize_text(text_col), " ").alias("_toks"),
        )
        .filter(F.size("_toks") >= k)
        .select("_id", shingles_from_tokens("_toks", k).alias("_sh"))
    )


def _explode_shingles(sh: DataFrame) -> DataFrame:
    """(_id, _s) rows from a ``_shingle_df`` output — via explode_OUTER.

    Plain ``explode`` plants an implicit ``size(col) > 0 AND
    isnotnull(col)`` filter that Catalyst pushes below the projection,
    INLINING the whole nested-HOF shingle expression into the Filter
    operator — evaluated 2 extra times per row, outside whole-stage
    codegen (measured: 60-75 s cold vs 4-6 s for the identical
    jaccard query at sf0.1; the filter is also vacuous, since
    ``_shingle_df`` already guarantees non-empty arrays via the cheap
    ``size(_toks) >= k`` guard).  ``explode_outer`` generates no such
    filter; it would emit a null ``_s`` for an empty array, but none
    can occur — and every consumer joins or groups on ``_s``, where a
    null key is inert anyway."""
    return sh.select("_id", F.explode_outer("_sh").alias("_s"))


def minhash_signatures(
    df: DataFrame,
    num_hashes: int = 32,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingles: DataFrame | None = None,
) -> DataFrame:
    """(id, sig array<bigint>): sig[i] = min over shingles of
    xxhash64(shingle, seed=i).  Pure projection — nested higher-order
    functions (transform over seeds -> array_min over shingles): no
    explode, no shuffle, and none of the ~12 s cold codegen a 32-way
    min-aggregate stage costs.  Identical hashes to the explode+agg
    form: the seed is an int in both (lit(i) vs sequence element)."""
    sh = shingles if shingles is not None else _shingle_df(df, k, text_col, id_col)
    seeds = F.sequence(F.lit(0), F.lit(num_hashes - 1))
    return sh.select(
        "_id",
        F.transform(
            seeds,
            lambda i: F.array_min(
                F.transform(F.col("_sh"), lambda s: F.xxhash64(s, i))
            ),
        ).alias("sig"),
    )


def _band_df(sig: DataFrame, bands: int, r: int) -> DataFrame:
    """(_id, band, bh) — one row per (doc, band), bh = hash of the
    band's r signature slots.  Shared by the self-join and the
    incremental cross-join forms."""
    return sig.select(
        "_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.xxhash64(
                            *[F.element_at("sig", bi * r + j + 1) for j in range(r)]
                        ).alias("bh"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("_id", "bb.band", "bb.bh")


def minhash_lsh_pairs_cross(
    new_docs: DataFrame,
    seen_docs: DataFrame,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.4,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Incremental near-dup: NEW docs that near-duplicate the EXISTING
    corpus, via banded MinHash buckets joined ACROSS the two tables +
    exact Jaccard verify.  Returns (seen_id, new_id, jaccard) — the
    complement of ``minhash_lsh_pairs`` for the daily-crawl increment:
    the corpus is never re-paired with itself, only new-vs-seen
    buckets collide.  (In-batch new-vs-new dups are
    ``minhash_lsh_pairs`` over the batch; exact copies are
    ``incremental_exact_new``.)

    Scale shape: the seen side's signatures/bands depend only on the
    seen docs — at 100 TB compute them ONCE at ingest and store the
    band table bucketed by (band, bh), so each increment shuffles
    only the (batch-sized) new side; the verify join fetches shingle
    arrays for candidates only.  Same recall arithmetic as
    ``minhash_lsh_pairs``: miss probability (1-j^r)^b per true pair.

    Cache lifetime is CALLER-OWNED (ADVICE r5): the two shingle frames
    are persisted (consumed by both the signature and the verify legs)
    and exposed as ``result.lap_persisted`` — after materializing the
    result, ``for f in result.lap_persisted: f.unpersist()`` frees the
    blocks; otherwise they live until session end (repeated calls,
    e.g. bench loops, accumulate cached blocks)."""
    r = num_hashes // bands
    sh_new = _shingle_df(new_docs, k, text_col, id_col).persist()
    sh_seen = _shingle_df(seen_docs, k, text_col, id_col).persist()
    band_new = _band_df(
        minhash_signatures(new_docs, num_hashes, k, text_col, id_col,
                           shingles=sh_new),
        bands, r,
    )
    band_seen = _band_df(
        minhash_signatures(seen_docs, num_hashes, k, text_col, id_col,
                           shingles=sh_seen),
        bands, r,
    )
    cand = (
        band_seen.alias("a")
        .join(
            band_new.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh")),
        )
        .select(F.col("a._id").alias("seen_id"), F.col("b._id").alias("new_id"))
        .distinct()
    )
    out = (
        cand.join(sh_seen.withColumnsRenamed({"_id": "seen_id", "_sh": "sha"}),
                  "seen_id")
        .join(sh_new.withColumnsRenamed({"_id": "new_id", "_sh": "shb"}),
              "new_id")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("sha", "shb"))
                / F.size(F.array_union("sha", "shb")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("seen_id", "new_id", "jaccard")
    )
    out.lap_persisted = (sh_new, sh_seen)
    return out


def minhash_lsh_pairs(
    df: DataFrame,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.4,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup pairs via banded MinHash LSH, then EXACT Jaccard verify.

    bands of r = num_hashes/bands rows; candidate iff some band agrees
    (P[candidate] = 1-(1-j^r)^b).  Verification keeps only true
    Jaccard >= threshold, so false positives are filtered; false
    negatives are the usual LSH miss probability (tested for recall).
    Returns (a_id, b_id, jaccard).

    Cache lifetime is CALLER-OWNED (same contract as
    ``minhash_lsh_pairs_cross``): the shingle frame is persisted
    (consumed by both the signature and the verify legs) and exposed
    as ``result.lap_persisted`` — after materializing the result,
    ``for f in result.lap_persisted: f.unpersist()`` frees the
    blocks; otherwise they live until session end (repeated calls,
    e.g. bench rep loops and the funnel LSH forms, accumulate cached
    frames).
    """
    r = num_hashes // bands
    # shingle arrays are consumed twice (signatures + exact verify):
    # compute once, persist — the expression tree (split/sequence/
    # element_at x k) is the expensive part, not the data volume.
    sh = _shingle_df(df, k, text_col, id_col).persist()
    sig = minhash_signatures(df, num_hashes, k, text_col, id_col, shingles=sh)
    # the band table feeds BOTH sides of the candidate self-join, and
    # each reference re-runs the full signature computation
    # (num_hashes xxhash64 evaluations per shingle — the heavy leg);
    # persist it too (r8, measured 2.6 -> 2.1 s at sf0.1).  Same
    # caller-owned lifetime as the shingle frame below.
    banded = _band_df(sig, bands, r).persist()
    cand = (
        banded.alias("a")
        .join(
            banded.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("a_id"), F.col("b._id").alias("b_id"))
        .distinct()
    )
    # exact verify on the (small) candidate set
    out = (
        cand.join(sh.withColumnsRenamed({"_id": "a_id", "_sh": "sha"}), "a_id")
        .join(sh.withColumnsRenamed({"_id": "b_id", "_sh": "shb"}), "b_id")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("sha", "shb"))
                / F.size(F.array_union("sha", "shb")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "jaccard")
    )
    out.lap_persisted = (sh, banded)
    return out


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------
_SIMHASH_OUT = T.StructType(
    [T.StructField("simhash", T.LongType())]
)


def simhash_from_texts(texts: pd.Series) -> np.ndarray:
    """64-bit SimHash, numpy-vectorized across the whole batch: tokens
    of all rows are flattened, hashed in one C pass (pd.util.hash_array
    — deterministic for a fixed pandas major), and bit-votes are
    accumulated with bincount — no per-row Python.

    This is the SHARED CORE: the Spark pandas UDF and the DuckDB
    oracle (signature literals in ``oracle.simhash_pairs_sql``) both
    call it, so the non-SQL-portable hash is computed once and the
    chunk-join/XOR/bit_count logic is verified independently.
    Returns the signatures as an int64 view (Spark LongType layout)."""
    # mirror normalize_text exactly: Python re's \s is unicode-wide,
    # Java's includes \x0B — the explicit class is the 3-engine
    # intersection; strip(" ") matches Spark/DuckDB trim (spaces only)
    norm = (
        texts.fillna("")
        .str.lower()
        .str.strip(" ")
        .str.replace(r"[ \t\n\x0B\f\r]+", " ", regex=True)
    )
    tok_lists = norm.str.split(" ")
    lens = tok_lists.str.len().fillna(0).astype(np.int64).to_numpy()
    flat = np.concatenate([t if isinstance(t, list) else [] for t in tok_lists]) if lens.sum() else np.array([], dtype=object)
    if len(flat) == 0:
        return np.zeros(len(texts), dtype=np.int64)
    hashes = pd.util.hash_array(flat.astype("U"))  # uint64, vectorized
    doc_idx = np.repeat(np.arange(len(texts)), lens)
    # bit votes: for each of 64 bits, sum(+1/-1) per doc
    sims = np.zeros(len(texts), dtype=np.uint64)
    for bit in range(64):
        votes = ((hashes >> np.uint64(bit)) & np.uint64(1)).astype(np.int64) * 2 - 1
        per_doc = np.bincount(doc_idx, weights=votes, minlength=len(texts))
        sims |= (per_doc > 0).astype(np.uint64) << np.uint64(bit)
    return sims.view(np.int64)


@F.pandas_udf(T.LongType())
def _simhash_udf(texts: pd.Series) -> pd.Series:
    return pd.Series(simhash_from_texts(texts))


def simhash(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("simhash", _simhash_udf(F.col(text_col)))


def simhash_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunks: int = 4,
    allow_partial_recall: bool = False,
) -> DataFrame:
    """Candidate pairs sharing one of ``chunks`` signature chunks,
    filtered to bit_count(xor) <= max_hamming.

    Pigeonhole guarantee: ``max_hamming`` bit flips can touch at most
    ``max_hamming`` chunks, so every pair at distance <= chunks-1 shares
    an identical chunk and IS found.  The defaults (4 chunks of 16
    bits, max_hamming=3) keep the filter inside the guarantee, so
    recall is exactly 1.0.  Asking for max_hamming > chunks-1 would
    silently under-recall in the [chunks, max_hamming] band (and
    shrinking chunk width to widen the guarantee explodes the candidate
    join — a 4-bit chunk has 16 values, ~n²/16 collisions per chunk);
    per the repo's no-silent-caps rule that combination raises unless
    ``allow_partial_recall=True`` explicitly opts into best-effort
    recall beyond the guaranteed radius (measured in tests)."""
    if max_hamming > chunks - 1 and not allow_partial_recall:
        raise ValueError(
            f"max_hamming={max_hamming} exceeds the pigeonhole guarantee of "
            f"chunks-1={chunks - 1}: pairs at distance in "
            f"[{chunks}, {max_hamming}] are found only best-effort. Pass "
            "allow_partial_recall=True to accept that, or raise chunks."
        )
    sh = simhash(df, text_col).select(F.col(id_col).alias("_id"), "simhash")
    width = 64 // chunks
    chunked = sh.select(
        "_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("ci"),
                        F.shiftright("simhash", i * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("cv"),
                    )
                    for i in range(chunks)
                ]
            )
        ).alias("c"),
    ).select("_id", "simhash", "c.ci", "c.cv")
    a, b = chunked.alias("a"), chunked.alias("b")
    return (
        a.join(
            b,
            (F.col("a.ci") == F.col("b.ci"))
            & (F.col("a.cv") == F.col("b.cv"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("a_id"),
            F.col("b._id").alias("b_id"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# embedding-cosine near-dup (exact pair scan; LSH path in similarity.py)
# ---------------------------------------------------------------------------
def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """All pairs with cosine >= threshold — exact O(n²) scan, fine up
    to ~10^5 vectors per executor-partition pair; beyond that use
    similarity.random_hyperplane_buckets to pre-bucket."""
    from .similarity import cosine_expr

    # cast to array<double> BEFORE scoring: float32 multiplies drift
    # ~1e-9 from the DuckDB double path and flip 6dp rounding boundaries
    vec = F.col(vec_col).cast("array<double>")
    a = df.select(F.col(id_col).alias("a_id"), vec.alias("va"))
    b = df.select(F.col(id_col).alias("b_id"), vec.alias("vb"))
    return (
        a.join(b, F.col("a_id") < F.col("b_id"))
        .withColumn("cosine", F.round(cosine_expr("va", "vb"), 6))
        .filter(F.col("cosine") >= threshold)
        .select("a_id", "b_id", "cosine")
    )


def adaptive_n_blocks(
    n: int, target_scores_per_task: int = 20_000_000, min_blocks: int = 8
) -> int:
    """Block count policy for the blocked exact scan: each of the
    ~n_blocks²/2 block-pair tasks scores (n/n_blocks)² pairs, so
    n_blocks = ceil(n / sqrt(target)) keeps per-task work at
    ~``target_scores_per_task`` dot products (a ~1 s task at 64 dims)
    no matter how large n grows — a static block count would cap
    parallelism and let task size blow up O(n²).  ``min_blocks`` keeps
    small inputs parallel across local cores."""
    import math

    return max(min_blocks, math.ceil(n / math.sqrt(target_scores_per_task)))


def embedding_near_dup_pairs_blocked(
    df: DataFrame,
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_blocks: int | None = None,
    target_scores_per_task: int = 20_000_000,
) -> DataFrame:
    """Exact all-pairs cosine >= threshold as a blocked self-join —
    same output as ``embedding_near_dup_pairs`` with a scalable plan.

    Vectors hash into ``n_blocks`` blocks; every unordered block pair
    (i <= j) becomes one equi-join key, with each vector replicated to
    the ~(n_blocks+1)/2 keys its block participates in.  The join is a
    plain shuffled equi-join on the key — NO BroadcastNestedLoopJoin /
    cartesian: neither side is broadcast whole, tasks are bounded at
    |block_i|x|block_j| score evaluations, and AQE can split stragglers.
    Work stays inherently O(n²) scores (it is the exact operator — the
    approximate scale path is minhash/simhash/sign-LSH bucketing);
    shuffle volume is n*(n_blocks+1) rows.  Scoring uses the same
    JVM ``cosine_expr`` double fold, so results bit-match the plain
    variant and the DuckDB oracle.

    ``n_blocks=None`` (default) sizes itself from a cheap count via
    ``adaptive_n_blocks`` so per-task score work stays bounded at any
    n; the output is bit-identical for EVERY block count (blocking
    only partitions the pair space — pinned by tests), so the policy
    is pure task sizing.
    """
    from .similarity import dot_expr, norm_expr

    if n_blocks is None:
        n_blocks = adaptive_n_blocks(df.count(), target_scores_per_task)
    vec = F.col(vec_col).cast("array<double>")
    bid = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).cast("int")
    # norms once per ROW (n of them), not once per PAIR (n²/2): the
    # pair-side work drops to one dot product + one multiply/divide.
    # cosine = dot/(norm_a*norm_b) is the same double expression order
    # as cosine_expr, so results stay bit-identical to the plain scan.
    base = df.select(
        F.col(id_col).alias("_id"),
        vec.alias("_v"),
        bid.alias("_b"),
    ).withColumn("_n", norm_expr("_v"))
    # block b joins: as LEFT of keys (b, j) for j >= b; as RIGHT of
    # keys (i, b) for i <= b — each unordered block pair meets exactly
    # once, so each id pair appears exactly once (twice for same-block,
    # deduped by the id residual below).
    left = base.select(
        "_id",
        "_v",
        "_n",
        "_b",
        F.explode(F.sequence(F.col("_b"), F.lit(n_blocks - 1))).alias("_kj"),
    ).withColumnsRenamed({"_id": "l_id", "_v": "l_v", "_n": "l_n", "_b": "_ki"})
    right = base.select(
        "_id",
        "_v",
        "_n",
        F.explode(F.sequence(F.lit(0), F.col("_b"))).alias("_ki"),
        F.col("_b").alias("_kj"),
    ).withColumnsRenamed({"_id": "r_id", "_v": "r_v", "_n": "r_n"})
    joined = left.join(right, ["_ki", "_kj"]).filter(
        (F.col("_ki") < F.col("_kj")) | (F.col("l_id") < F.col("r_id"))
    )
    cosine = dot_expr("l_v", "r_v") / (F.col("l_n") * F.col("r_n"))
    return (
        joined.withColumn("cosine", F.round(cosine, 6))
        .filter(F.col("cosine") >= threshold)
        .select(
            F.least("l_id", "r_id").alias("a_id"),
            F.greatest("l_id", "r_id").alias("b_id"),
            "cosine",
        )
    )


def semdedup_pairs(
    df: DataFrame,
    centroids,
    threshold: float = 0.3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    materialize_dir: str | None = None,
    n_buckets: int = 8,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540) candidate pairs:
    semantic near-duplicates scored ONLY within k-means clusters — the
    published scale path for embedding dedup, where the coarse
    quantizer bounds the pair space instead of blocking the exact
    O(n²) scan.

    Each vector is assigned to its nearest centroid (argmax of
    centroid dot products — |v| is constant per row, so dot order
    equals cosine order; first max wins on ties, matching DuckDB's
    ``list_position(dl, list_max(dl))``), then pairs with
    ``cosine >= threshold`` are emitted per cluster.  Output is
    exactly ``embedding_near_dup_pairs`` restricted to same-cluster
    pairs (pinned by tests) — the approximation IS the cluster
    scoping, disclosed per the paper.

    Assignment runs as a JVM codegen projection (zip_with+aggregate
    folds against centroid literal arrays — sequential double
    accumulation, the same order as DuckDB's ``list_dot_product``, so
    the oracle twin re-derives identical assignments; no Python in
    the hot path, unlike ``ivf_assign``'s numpy gemm which exists for
    ingest-time batch throughput).

    100 TB posture: assignment rides the scan (projection-only); the
    pair stage is a shuffled self-equi-join on the cluster id — no
    BNLJ/cartesian, AQE splits hot clusters; per-task work is bounded
    by the cluster-size distribution, and at corpus scale n_centroids
    grows ~n/target_cluster_size (the paper's regime) so candidate
    volume stays ~n x target_cluster_size, linear in n.

    With the default ``materialize_dir=None`` the assignment
    projection is referenced by both join sides, and Catalyst does not
    dedupe subplans — two full evaluations of the centroid folds (fine
    at audit scale).  **Passing ``materialize_dir`` is the 100 TB
    form**: the assignment base is written ONCE as a parquet table
    BUCKETED by cluster (``semdedup_base_write``) and both join sides
    re-read it column-pruned — the final plan contains no centroid
    fold at all, and the self-join is exchange-free because the
    bucketed scan already hash-partitions on the join key (plain
    ``partitionBy`` parquet prunes but does NOT co-locate a join —
    the r6 gotcha, made executable in tests/test_plans.py)."""
    base = _semdedup_base(df, centroids, vec_col, id_col)
    if materialize_dir is not None:
        base = semdedup_base_write(
            base, materialize_dir, n_buckets=n_buckets
        )
    return _semdedup_pairs_from_base(base, threshold)


def _semdedup_base(
    df: DataFrame, centroids, vec_col: str, id_col: str
) -> DataFrame:
    """Shared assignment projection: (_id, _v, _n, cluster, _ccos)
    where _ccos is the 6dp-rounded cosine to the ASSIGNED centroid —
    free given the dot array (centroids are unit vectors, so it is
    array_max(dl)/|v|)."""
    from .similarity import dot_expr, double_array_lit, norm_expr

    vec = F.col(vec_col).cast("array<double>")
    dl = F.array(
        *[dot_expr(F.col("_v"), double_array_lit(c)) for c in centroids]
    )
    return (
        df.select(F.col(id_col).alias("_id"), vec.alias("_v"))
        .withColumn("_n", norm_expr("_v"))
        .withColumn("_dl", dl)
        .withColumn(
            "cluster",
            # coalesce makes the column NON-NULLABLE (r8): the pair
            # stage equi-joins on cluster, and a nullable join key
            # makes Catalyst push an isnotnull(cluster) filter below
            # this projection — inlining the ENTIRE centroid fold
            # (twice: array_position + array_max) into a Filter
            # operator on both join sides (the repo's
            # filter-on-nested-HOF gotcha, measured 11x).  cluster is
            # only ever null for a null embedding, whose pairs are
            # dropped downstream anyway (null cosine fails the
            # threshold filter), so mapping that row to sentinel -1
            # changes no output row on any input.
            F.coalesce(
                (F.array_position("_dl", F.array_max("_dl")) - 1).cast("int"),
                F.lit(-1),
            ),
        )
        .withColumn("_ccos", F.round(F.array_max("_dl") / F.col("_n"), 6))
        .select("_id", "_v", "_n", "cluster", "_ccos")
    )


def semdedup_base_write(
    base: DataFrame, path: str, n_buckets: int = 8
) -> DataFrame:
    """Write a ``_semdedup_base`` frame ONCE as an external parquet
    table BUCKETED (and sorted) by the cluster id, and return the
    read-back frame.  Eager (write happens at call time — the
    plans/pipeline.py write-then-reread idiom, measured faster than
    persist() for wide frames).  Delegates to
    ``similarity.write_bucketed_by_cluster`` — bucketing (not
    partitionBy) is what makes the downstream cluster self-join
    exchange-free."""
    from .similarity import write_bucketed_by_cluster

    return write_bucketed_by_cluster(base, path, n_buckets=n_buckets)


def _semdedup_pairs_from_base(base: DataFrame, threshold: float) -> DataFrame:
    from .similarity import dot_expr

    a = base.select("cluster", F.col("_id").alias("a_id"),
                    F.col("_v").alias("_va"), F.col("_n").alias("_na"))
    b = base.select("cluster", F.col("_id").alias("b_id"),
                    F.col("_v").alias("_vb"), F.col("_n").alias("_nb"))
    cosine = dot_expr("_va", "_vb") / (F.col("_na") * F.col("_nb"))
    return (
        a.join(b, ["cluster"])
        .filter(F.col("a_id") < F.col("b_id"))
        .withColumn("cosine", F.round(cosine, 6))
        .filter(F.col("cosine") >= threshold)
        .select("a_id", "b_id", "cluster", "cosine")
    )


def semdedup_keep(
    df: DataFrame,
    centroids,
    threshold: float = 0.3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    materialize_dir: str | None = None,
    n_buckets: int = 8,
) -> DataFrame:
    """SemDeDup endgame — the paper's keep rule: within each duplicate
    GROUP (connected component of ``semdedup_pairs`` edges; components
    cannot span clusters since edges never do), keep exactly the
    member with the LOWEST cosine to its cluster centroid (ties to
    the min id) — survivors are biased toward cluster-atypical
    examples, the opposite election from ``cluster_keepers``'s
    quality-argmax, which is why this is its own operator.

    Output: one row per GROUPED member — (vec_id, group_rep,
    group_size, centroid_cos, keep); unpaired vectors are absent (the
    pair-family convention — they are all trivially kept).

    100 TB posture: assignment + centroid cosine ride the scan
    (projection-only).  With the default ``materialize_dir=None`` the
    pair stage and the member join EACH evaluate the assignment
    projection — Catalyst does not dedupe subplans, so that is 2-3
    full scans of the embedding table (fine at audit scale, weak at
    100 TB).  **Passing ``materialize_dir`` is the 100 TB form**: the
    assignment base is written once, bucketed by cluster
    (``semdedup_base_write``), and the pair stage AND the member join
    both re-read it column-pruned — no centroid fold survives in the
    final plan (pinned in tests/test_plans.py), and the pair
    self-join is exchange-free off the bucketed scan.  Grouping is
    the pointer-jumping CC (O(V) state per round); the election is
    one row_number window partitioned by group — group sizes are
    bounded by cluster sizes, so no unsplittable hot partition beyond
    what the pair stage already tolerates."""
    from .cluster import dup_clusters

    base = _semdedup_base(df, centroids, vec_col, id_col)
    if materialize_dir is not None:
        base = semdedup_base_write(base, materialize_dir, n_buckets=n_buckets)
    pairs = _semdedup_pairs_from_base(base, threshold)
    groups = dup_clusters(pairs, "a_id", "b_id")
    members = groups.join(
        base.select(F.col("_id").alias("doc_id"), F.col("_ccos")), "doc_id"
    )
    w = Window.partitionBy("cluster_rep").orderBy(
        F.col("_ccos").asc(), F.col("doc_id").asc()
    )
    return (
        members.withColumn("_rn", F.row_number().over(w))
        .select(
            F.col("doc_id").alias(id_col),
            F.col("cluster_rep").alias("group_rep"),
            F.col("cluster_size").alias("group_size"),
            F.col("_ccos").alias("centroid_cos"),
            (F.col("_rn") == 1).alias("keep"),
        )
    )
