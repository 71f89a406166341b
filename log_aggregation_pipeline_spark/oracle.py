"""DuckDB oracle SQL builders.

Assembles ANSI-SQL twins of the Spark operators from the SAME pattern
constants and routing predicates the Spark code uses
(operators.parse / operators.route / functions.levels), so the oracle
can't silently drift from the implementation.  Used by
``__spark_entry__.oracle_sql()`` — the driver runs these in DuckDB
against the sf0.01 parquet views and hash-compares with the Spark
results.
"""

from __future__ import annotations

from .functions.ids import ID_SQL
from .functions.levels import normalize_level_sql
from .operators.parse import CODE_PATTERN, LEVEL_PATTERN, TOOL_PATTERN
from .operators.route import ROUTES
from .sources.transcripts import transcripts_cte, transcripts_sql


def parsed_cte(events_relation: str = "events") -> str:
    """WITH chain: events -> transcripts -> parsed (id, level, codes)."""
    level_norm = normalize_level_sql("level_raw")
    return f"""
WITH transcripts AS ({transcripts_sql(events_relation)}),
raw_parsed AS (
  SELECT *,
    {ID_SQL} AS id,
    NULLIF(regexp_extract(text, '{LEVEL_PATTERN}', 1), '') AS level_raw,
    NULLIF(regexp_extract(text, '{CODE_PATTERN}', 1), '') AS error_code,
    NULLIF(regexp_extract(text, '{TOOL_PATTERN}', 1), '') AS tool_sig,
    CASE WHEN NULLIF(regexp_extract(text, '{TOOL_PATTERN}', 1), '') IS NOT NULL
         THEN regexp_extract(text, '{TOOL_PATTERN}', 2) END AS tool_args
  FROM transcripts
),
parsed AS (
  SELECT *,
    {level_norm} AS level,
    (level_raw IS NOT NULL) AS parse_ok
  FROM raw_parsed
)
"""


def route_where(sink: str) -> str:
    return ROUTES[sink].sql_pred


def conv_hour_agg_sql(sink: str, events_relation: str = "events") -> str:
    return f"""{parsed_cte(events_relation)}
SELECT conv_id,
       date_trunc('hour', ts) AS hour,
       count(*)  AS n_turns,
       min(ts)   AS min_ts,
       max(ts)   AS max_ts
FROM parsed
WHERE {route_where(sink)}
GROUP BY conv_id, date_trunc('hour', ts)
"""


def routed_rows_sql(sink: str, events_relation: str = "events") -> str:
    return f"""{parsed_cte(events_relation)}
SELECT id, conv_id, turn_idx, role, tool, level, error_code, text, ts
FROM parsed
WHERE {route_where(sink)}
"""


# ---------------------------------------------------------------------------
# Sampling + per-conversation features over transcripts.
# ---------------------------------------------------------------------------
def _sample_key_sql(id_cols: list[str], seed: int) -> str:
    """md5(id:...:seed) — the same rank key operators.sampling builds;
    turn ints to VARCHAR the way Spark's concat_ws does."""
    parts = " || ':' || ".join(f"CAST({c} AS VARCHAR)" for c in id_cols)
    return f"md5({parts} || ':{seed}')"


def hash_sample_sql(
    fraction: float, id_cols: list[str], seed: int = 17,
    events_relation: str = "events", select: str = "*",
) -> str:
    threshold = int(fraction * (16**8))
    key = _sample_key_sql(id_cols, seed)
    return f"""{transcripts_cte(events_relation)}
SELECT {select} FROM transcripts
WHERE ('0x' || substr({key}, 1, 8))::BIGINT < {threshold}
"""


def stratified_sample_sql(
    strata_cols: list[str], fraction: float, id_cols: list[str],
    seed: int = 17, events_relation: str = "events", select: str = "*",
) -> str:
    key = _sample_key_sql(id_cols, seed)
    strata = ", ".join(strata_cols)
    order = ", ".join([key] + id_cols)
    return f"""{transcripts_cte(events_relation)}
SELECT {select} FROM (
  SELECT *,
         row_number() OVER (PARTITION BY {strata} ORDER BY {order}) AS _rk,
         count(*)     OVER (PARTITION BY {strata}) AS _n
  FROM transcripts)
WHERE _rk <= ceil(_n * {fraction})
"""


def reservoir_sample_sql(
    k: int, id_cols: list[str], seed: int = 17,
    events_relation: str = "events", select: str = "*",
) -> str:
    key = _sample_key_sql(id_cols, seed)
    order = ", ".join([key] + id_cols)
    return f"""{transcripts_cte(events_relation)}
SELECT {select} FROM transcripts ORDER BY {order} LIMIT {k}
"""


def corpus_mix_sql(targets: dict[str, int], seed: int = 17) -> str:
    """Twin of sampling.corpus_mix over the documents table: same
    seeded md5 rank order, same running-total window, same integer
    target literals (computed ONCE by sampling.mix_targets and passed
    in — no float math inside either engine).  cast(... AS BIGINT) on
    the window sum: DuckDB's sum(BIGINT) is HUGEINT and would
    hash-diverge from Spark's long (repo pivot gotcha)."""
    key = _sample_key_sql(["doc_id"], seed)
    case = " ".join(f"WHEN '{s}' THEN {t}" for s, t in targets.items())
    return f"""
WITH t AS (
  SELECT doc_id, source, {N_TOKENS_SQL} AS n_tokens, {key} AS k
  FROM documents
),
c AS (
  SELECT doc_id, source, n_tokens,
         cast(sum(n_tokens) OVER (PARTITION BY source ORDER BY k, doc_id
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
  FROM t
)
SELECT doc_id, source, n_tokens, cum_tokens FROM c
WHERE cum_tokens <= CASE source {case} ELSE 0 END
  AND n_tokens > 0
"""


def conv_features_sql(events_relation: str = "events") -> str:
    """GROUP BY twin of operators.features.conv_features: gaps in
    integer microseconds, each ratio a single integer double-division
    in the same formula order as the Spark/pandas sides."""
    err = "count(CASE WHEN contains(lower(text), 'error') THEN 1 END)"
    return f"""{transcripts_cte(events_relation)},
g AS (
  SELECT conv_id, role, text, ts,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY conv_id ORDER BY turn_idx) AS gap_us
  FROM transcripts)
SELECT conv_id,
  count(*) AS n_turns,
  CAST(count(DISTINCT role) AS INT) AS n_roles,
  {err} AS n_error_turns,
  CAST(sum(length(text)) AS BIGINT) AS total_chars,
  CASE WHEN count(*) > 1
       THEN (CAST(sum(gap_us) AS BIGINT) / (count(*) - 1)) / 1000000.0 END
    AS mean_gap_s,
  CASE WHEN count(*) > 1 THEN max(gap_us) / 1000000.0 END AS max_gap_s,
  {err} / count(*) AS frac_error,
  min(ts) AS first_ts,
  max(ts) AS last_ts
FROM g GROUP BY conv_id
"""


def trending_terms_sql(
    field: str = "error_code",
    interval: str = "day",
    top_k: int = 5,
    events_relation: str = "events",
) -> str:
    """Trending twin: rank over ALL per-bucket values, lag per value,
    then the top-k cut — same order as the Spark operator."""
    return f"""{parsed_cte(events_relation)},
daily AS (
  SELECT date_trunc('{interval}', ts) AS bucket, {field} AS term,
         count(*) AS n
  FROM parsed WHERE {field} IS NOT NULL AND {field} != ''
  GROUP BY 1, 2
),
ranked AS (
  SELECT *,
    cast(row_number() OVER (PARTITION BY bucket ORDER BY n DESC, term)
         AS INTEGER) AS rank
  FROM daily
),
lagged AS (
  SELECT *,
    CASE WHEN lag(bucket) OVER (PARTITION BY term ORDER BY bucket)
              = bucket - INTERVAL 1 {interval}
         THEN cast(lag(rank) OVER (PARTITION BY term ORDER BY bucket)
                   AS INTEGER) END AS prev_rank
  FROM ranked
)
SELECT bucket, term, n, rank, prev_rank,
       rank - prev_rank AS rank_delta
FROM lagged WHERE rank <= {top_k}
"""


# ---------------------------------------------------------------------------
# Training-data operators over documents / embeddings (DuckDB twins of
# operators.dedupe / text_analysis / similarity).  The normalization
# and constants mirror the Spark expressions exactly.
# ---------------------------------------------------------------------------
# whitespace spelled out instead of \s (Java \s has \x0B, RE2's does
# not) — must stay in lockstep with dedupe.normalize_text
# trim(text, ' ') NOT bare trim(): DuckDB's default trim strips
# Unicode spaces (U+00A0 etc. — found by the r7 gopher property test:
# norm of a lone NBSP was '' in DuckDB, the NBSP itself in Spark,
# flipping n_tokens 0 vs 1) while Spark's F.trim strips ASCII space
# only.  The engine is the spec, so the twin pins the char set.
NORM_SQL = r"regexp_replace(lower(trim(text, ' ')), '[ \t\n\x0B\f\r]+', ' ', 'g')"
# DuckDB twin of text_analysis.whitespace_token_count — ONE definition;
# five oracle builders share it, and drift in any copy would break one
# oracle while the others stay green
N_TOKENS_SQL = (
    f"CASE WHEN {NORM_SQL} = '' THEN 0 "
    f"ELSE len(string_split({NORM_SQL}, ' ')) END"
)


def exact_dedup_groups_sql() -> str:
    return f"""
SELECT md5({NORM_SQL}) AS content_hash,
       count(*) AS n_copies,
       min(doc_id) AS keeper
FROM documents GROUP BY 1
"""


def ngram_jaccard_sql(
    k: int = 3,
    threshold: float = 0.4,
    max_shingle_freq: int | None = None,
    include_common: bool = True,
    from_sql: str = "documents",
) -> str:
    """Exact shingle-Jaccard pairs.  ``max_shingle_freq`` mirrors the
    Spark operator's stop-shingle cap (shingles in more than that many
    docs are excluded from the join AND from n_common, denominators
    stay uncapped — exactly the Spark semantics).  ``include_common``
    False drops the n_common column (the minhash-LSH oracle shape).
    ``from_sql`` is the source relation (a table name or aliased
    subquery with doc_id + text columns) — the single-source rule:
    composed oracles (corpus_prep_neardup_sql) reuse THIS builder
    instead of inlining a drift-prone copy of the shingle CTEs."""
    gram = " || ' ' || ".join(f"t[i+{j}]" for j in range(k))
    cap_cte = ""
    join_src = "ex"
    if max_shingle_freq is not None:
        cap_cte = f""",
capped AS (
  SELECT * FROM ex WHERE s IN (
    SELECT s FROM ex GROUP BY s HAVING count(*) <= {max_shingle_freq})
)"""
        join_src = "capped"
    common_col = "n_common, " if include_common else ""
    return f"""
WITH toks AS (
  SELECT doc_id, string_split({NORM_SQL}, ' ') AS t FROM {from_sql}
),
sh AS (
  SELECT doc_id,
         list_distinct([ {gram} for i in range(1, len(t) - {k - 2}) ]) AS shingles
  FROM toks WHERE len(t) >= {k}
),
ex AS (SELECT doc_id, unnest(shingles) AS s, len(shingles) AS n FROM sh){cap_cte},
common AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         count(*) AS n_common, any_value(a.n) AS na, any_value(b.n) AS nb
  FROM {join_src} a JOIN {join_src} b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT a_id, b_id, {common_col}
       round(n_common * 1.0 / (na + nb - n_common), 6) AS jaccard
FROM common
WHERE round(n_common * 1.0 / (na + nb - n_common), 6) >= {threshold}
"""


def dup_clusters_sql(pairs_sql: str) -> str:
    """Connected components over an arbitrary pairs query (columns
    a_id, b_id) via a recursive min-reachability CTE — an independent
    algorithm from the Spark side's label propagation: ``reach``
    enumerates every (node, reachable node) pair over the symmetric
    edge set (UNION dedups, so it terminates), and the component
    representative is the min reachable id."""
    return f"""
WITH RECURSIVE pairs AS (
  SELECT a_id, b_id FROM ({pairs_sql})
),
edges AS (
  SELECT a_id AS u, b_id AS v FROM pairs
  UNION
  SELECT b_id, a_id FROM pairs
),
reach(id, r) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
  UNION
  SELECT e.u, reach.r FROM edges e JOIN reach ON reach.id = e.v
),
comp AS (SELECT id AS doc_id, min(r) AS cluster_rep FROM reach GROUP BY id)
SELECT doc_id, cluster_rep,
       count(*) OVER (PARTITION BY cluster_rep) AS cluster_size
FROM comp
"""


def cluster_keepers_sql(pairs_sql: str, quality_sql_text: str) -> str:
    """Keeper-selection twin: clusters from the recursive-CTE
    component query, quality from the quality twin, keeper = per
    cluster the max-quality member with min-doc_id ties — the same
    row_number spec as the Spark window."""
    return f"""
WITH clusters AS (SELECT * FROM ({dup_clusters_sql(pairs_sql)})),
qual AS (SELECT doc_id, quality_score FROM ({quality_sql_text})),
ranked AS (
  SELECT c.cluster_rep, c.doc_id, c.cluster_size, q.quality_score,
         row_number() OVER (PARTITION BY c.cluster_rep
                            ORDER BY q.quality_score DESC NULLS LAST,
                                     c.doc_id ASC) AS rn
  FROM clusters c LEFT JOIN qual q USING (doc_id)
)
SELECT cluster_rep, doc_id AS keeper_id, cluster_size,
       quality_score AS keeper_quality
FROM ranked WHERE rn = 1
"""


def corpus_stats_sql(group_col: str = "source") -> str:
    """Per-group composition twin.  ``quantile_cont`` is DuckDB's
    interpolated quantile — the same definition as Spark's exact
    ``percentile`` (linear at rank (n-1)*p)."""
    n_sql = N_TOKENS_SQL
    return f"""
WITH toks AS (SELECT {group_col}, {n_sql} AS n FROM documents)
SELECT {group_col},
       count(*) AS n_docs,
       cast(sum(n) AS BIGINT) AS total_tokens,
       min(n) AS min_tokens,
       max(n) AS max_tokens,
       round(quantile_cont(n, 0.5), 6) AS p50_tokens,
       round(quantile_cont(n, 0.95), 6) AS p95_tokens,
       round(sum(n) * 1.0 / count(*), 6) AS mean_tokens
FROM toks GROUP BY {group_col}
"""


def _pack_cte(n_shards: int) -> str:
    """Shared packing CTEs: md5-idiom shard + per-shard running cumsum
    (rows unbounded-preceding to 1 preceding) in doc_id order."""
    n_sql = N_TOKENS_SQL
    return f"""
WITH toks AS (
  SELECT doc_id,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
           % {n_shards} AS shard,
         {n_sql} AS n_tokens
  FROM documents
),
c AS (
  SELECT *,
         coalesce(sum(n_tokens) OVER (
           PARTITION BY shard ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
  FROM toks
)"""


def pack_sequences_sql(capacity: int, n_shards: int) -> str:
    """Packing twin: bin = cumsum div capacity."""
    return f"""{_pack_cte(n_shards)}
SELECT doc_id, cast(shard AS INTEGER) AS shard, n_tokens,
       cast(before // {capacity} AS INTEGER) AS bin_id,
       cast(before % {capacity} AS INTEGER) AS bin_offset,
       ((before + n_tokens - 1) // {capacity}) > (before // {capacity})
         AS straddles
FROM c
"""


def pack_segments_sql(capacity: int, n_shards: int) -> str:
    """split_straddlers twin: one row per (doc, bin) segment with
    doc-relative token offsets, via generate_series over the doc's
    bin span."""
    C = capacity
    return f"""{_pack_cte(n_shards)},
segs AS (
  SELECT doc_id, shard, n_tokens, before,
         unnest(generate_series(cast(before // {C} AS BIGINT),
                cast((before + n_tokens - 1) // {C} AS BIGINT))) AS seg_bin
  FROM c WHERE n_tokens > 0
)
SELECT doc_id,
       cast(shard AS INTEGER) AS shard,
       cast(seg_bin AS INTEGER) AS bin_id,
       cast(seg_bin - before // {C} AS INTEGER) AS seg_idx,
       cast(greatest(before, seg_bin * {C}) - before AS INTEGER) AS tok_start,
       cast(least(before + n_tokens, (seg_bin + 1) * {C}) - before
            AS INTEGER) AS tok_end
FROM segs
"""


def spike_detection_sql(
    window_hours: int = 24, z_thresh: float = 3.0, min_history: int = 6
) -> str:
    """Spike twin: identical exact-integer window sums and double
    formula (no built-in stddev — engines differ in the last ulps);
    trailing RANGE frame on epoch seconds."""
    secs = window_hours * 3600
    return f"""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket, count(*) AS n,
         epoch(date_trunc('hour', ts))::BIGINT AS ep
  FROM events GROUP BY 1, 2
),
win AS (
  SELECT event_type, bucket, n,
    cast(sum(n) OVER w AS BIGINT) AS sum_n,
    cast(sum(n * n) OVER w AS BIGINT) AS sum_sq,
    count(n) OVER w AS cnt
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY ep
               RANGE BETWEEN {secs} PRECEDING AND 1 PRECEDING)
),
scored AS (
  SELECT event_type, bucket, n, cnt,
    (cast(sum_sq AS DOUBLE) - cast(sum_n AS DOUBLE) * sum_n / cnt)
      / (cnt - 1) AS var,
    round((n - cast(sum_n AS DOUBLE) / cnt)
          / sqrt((cast(sum_sq AS DOUBLE) - cast(sum_n AS DOUBLE) * sum_n / cnt)
                 / (cnt - 1)), 6) AS z_score
  FROM win
)
SELECT event_type, bucket, n, z_score, z_score > {z_thresh} AS is_spike
FROM scored
WHERE cnt >= {min_history} AND var > 0
"""


def corpus_prep_sql(
    stopwords, quality_min: float, k: int, n_eval: int
) -> str:
    """Funnel twin: nests the quality and decontamination oracles as
    subqueries (per-doc properties, so flag-then-intersect equals
    filter-then-flag) around the keeper/eval CTEs."""
    n_sql = N_TOKENS_SQL
    return f"""
WITH keep AS (
  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5({NORM_SQL})
),
qual AS (
  SELECT q.doc_id FROM ({quality_sql(stopwords)}) q
  JOIN keep USING (doc_id)
  WHERE q.quality_score >= {quality_min}
),
eval_ids AS (
  SELECT doc_id FROM documents
  ORDER BY md5(cast(doc_id AS VARCHAR)), doc_id LIMIT {n_eval}
),
cont AS (SELECT doc_id FROM ({decontaminate_sql(k, n_eval)})),
clean AS (
  SELECT d.doc_id, {n_sql} AS n
  FROM documents d
  JOIN qual USING (doc_id)
  WHERE d.doc_id NOT IN (SELECT doc_id FROM eval_ids)
    AND d.doc_id NOT IN (SELECT doc_id FROM cont)
)
SELECT (SELECT count(*) FROM documents) AS n_docs,
       (SELECT count(*) FROM keep) AS n_keepers,
       (SELECT count(*) FROM qual) AS n_quality,
       (SELECT count(*) FROM clean) AS n_clean,
       (SELECT cast(coalesce(sum(n), 0) AS BIGINT) FROM clean)
         AS clean_tokens
"""


def corpus_prep_neardup_sql(
    stopwords,
    quality_min: float,
    jaccard_k: int,
    jaccard_t: float,
    max_shingle_freq: int,
    k: int,
    n_eval: int,
) -> str:
    """Near-dup funnel twin: exact keepers -> jaccard pairs over the
    keeper subset (REUSES ngram_jaccard_sql via its from_sql hook —
    single-source rule) -> recursive-CTE components (REUSES
    dup_clusters_sql) -> quality-elected drop list (DESC NULLS LAST
    matches Spark's desc() null ordering — DuckDB's bare DESC is
    NULLS FIRST) -> quality floor -> eval removal -> decontamination.
    ``max_shingle_freq=None`` disables the cap exactly as the Spark
    operator and the base jaccard oracle do."""
    pairs_sql = ngram_jaccard_sql(
        jaccard_k,
        jaccard_t,
        max_shingle_freq=max_shingle_freq,
        include_common=False,
        from_sql="(SELECT d.doc_id, d.text FROM documents d "
                 "JOIN keep USING (doc_id)) AS kd",
    )
    clusters_sql = dup_clusters_sql(pairs_sql)
    return f"""
WITH
keep AS (
  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5({NORM_SQL})
),
clusters AS (SELECT doc_id, cluster_rep FROM ({clusters_sql})),
qscore AS (
  SELECT doc_id, quality_score FROM ({quality_sql(stopwords)})
),
ranked AS (
  SELECT c.doc_id,
         row_number() OVER (PARTITION BY c.cluster_rep
                            ORDER BY q.quality_score DESC NULLS LAST,
                                     c.doc_id ASC) AS rn
  FROM clusters c LEFT JOIN qscore q USING (doc_id)
),
nd AS (
  SELECT doc_id FROM keep
  WHERE doc_id NOT IN (SELECT doc_id FROM ranked WHERE rn > 1)
),
qual AS (
  SELECT q.doc_id FROM qscore q JOIN nd USING (doc_id)
  WHERE q.quality_score >= {quality_min}
),
eval_ids AS (
  SELECT doc_id FROM documents
  ORDER BY md5(cast(doc_id AS VARCHAR)), doc_id LIMIT {n_eval}
),
cont AS (SELECT doc_id FROM ({decontaminate_sql(k, n_eval)})),
clean AS (
  SELECT d.doc_id, {N_TOKENS_SQL} AS n
  FROM documents d
  JOIN qual USING (doc_id)
  WHERE d.doc_id NOT IN (SELECT doc_id FROM eval_ids)
    AND d.doc_id NOT IN (SELECT doc_id FROM cont)
)
SELECT (SELECT count(*) FROM documents) AS n_docs,
       (SELECT count(*) FROM keep) AS n_exact,
       (SELECT count(*) FROM nd) AS n_neardup,
       (SELECT count(*) FROM qual) AS n_quality,
       (SELECT count(*) FROM clean) AS n_clean,
       (SELECT cast(coalesce(sum(n), 0) AS BIGINT) FROM clean)
         AS clean_tokens
"""


def chunk_documents_sql(
    chunk_tokens: int, overlap: int, tokenizer: str = "whitespace"
) -> str:
    """Chunking twin: range(0, n, stride) window starts, 1-based
    inclusive list slice per window.  ``tokenizer`` mirrors the Spark
    operator's whitespace/bpeish modes (same trim-empty filter on
    both — normalized-empty iff trim-empty, and any non-empty trimmed
    text has >= 1 bpeish token)."""
    if tokenizer == "whitespace":
        tok_expr = f"string_split({NORM_SQL}, ' ')"
    elif tokenizer == "bpeish":
        from log_aggregation_pipeline_spark.operators.text_analysis import (
            BPEISH_PATTERN,
        )

        tok_expr = f"regexp_extract_all(text, '{BPEISH_PATTERN}')"
    else:
        raise ValueError(f"unknown tokenizer {tokenizer!r}")
    stride = chunk_tokens - overlap
    return f"""
WITH toks AS (
  SELECT doc_id, {tok_expr} AS t
  FROM documents WHERE trim(text, ' ') != ''
),
starts AS (
  SELECT doc_id, t, len(t) AS n,
         unnest(range(0, greatest(len(t) - {overlap}, 1), {stride})) AS s
  FROM toks
)
SELECT doc_id,
       cast(s // {stride} AS INTEGER) AS chunk_idx,
       cast(least({chunk_tokens}, n - s) AS INTEGER) AS n_tokens,
       array_to_string(t[s + 1 : least(s + {chunk_tokens}, n)], ' ')
         AS chunk_text
FROM starts
"""


def top_ngrams_sql(k: int, top: int) -> str:
    """Document-frequency top-k-grams twin (same shingle CTE family as
    the jaccard oracle; per-doc shingles distinct, so count(*) is doc
    frequency)."""
    gram = " || ' ' || ".join(f"t[i+{j}]" for j in range(k))
    return f"""
WITH toks AS (
  SELECT doc_id, string_split({NORM_SQL}, ' ') AS t FROM documents
),
sh AS (
  SELECT doc_id,
         list_distinct([ {gram} for i in range(1, len(t) - {k - 2}) ]) AS shingles
  FROM toks WHERE len(t) >= {k}
),
ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh)
SELECT s AS ngram, count(*) AS doc_freq
FROM ex
GROUP BY 1
ORDER BY doc_freq DESC, ngram ASC
LIMIT {top}
"""


def incremental_exact_sql(
    split_id: int, clone_seen_every: int, clone_seen_offset: int,
    clone_new_every: int, clone_new_offset: int,
) -> str:
    """Twin of dedupe.incremental_exact_new over the deterministic
    increment construction both sides build from doc_id: seen = docs
    below the split; the new batch = docs at/above the split, plus
    clones of every ``clone_seen_every``-th seen doc (re-labeled
    +offset — must be dropped by the anti-join) and of every
    ``clone_new_every``-th new doc (+offset — must lose the in-batch
    lowest-id window).  min(doc_id) per hash == the window's
    lowest-id winner."""
    return f"""
WITH h AS (SELECT doc_id, md5({NORM_SQL}) AS ch FROM documents),
seen AS (SELECT ch FROM h WHERE doc_id < {split_id}),
new_batch AS (
  SELECT doc_id, ch FROM h WHERE doc_id >= {split_id}
  UNION ALL
  SELECT doc_id + {clone_seen_offset}, ch FROM h
  WHERE doc_id < {split_id} AND doc_id % {clone_seen_every} = 0
  UNION ALL
  SELECT doc_id + {clone_new_offset}, ch FROM h
  WHERE doc_id >= {split_id} AND doc_id % {clone_new_every} = 0
),
keep AS (SELECT ch, min(doc_id) AS doc_id FROM new_batch GROUP BY ch)
-- NOT EXISTS, not NOT IN: a NULL hash in seen (NULL-text doc) would
-- make NOT IN return zero rows, while the Spark left_anti join keeps
-- null-keyed new rows (ADVICE r5) -- null-safe twin
SELECT doc_id, ch AS content_hash FROM keep
WHERE NOT EXISTS (SELECT 1 FROM seen WHERE seen.ch = keep.ch)
"""


def cross_jaccard_sql(k: int, threshold: float, split_id: int) -> str:
    """Twin of dedupe.minhash_lsh_pairs_cross (seen = below the split,
    new = at/above): exact cross-side Jaccard — valid as the LSH
    oracle for the same reason as doc_minhash_lsh_pairs (64x16 bands
    push the per-pair miss probability at the corpus's 0.8 jaccard
    floor to ~2e-4, so LSH+verify equals the exact pair set)."""
    gram = " || ' ' || ".join(f"t[i+{j}]" for j in range(k))
    return f"""
WITH toks AS (
  SELECT doc_id, string_split({NORM_SQL}, ' ') AS t FROM documents
),
sh AS (
  SELECT doc_id,
         list_distinct([ {gram} for i in range(1, len(t) - {k - 2}) ]) AS shingles
  FROM toks WHERE len(t) >= {k}
),
ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
sz AS (SELECT doc_id, len(shingles) AS n FROM sh),
p AS (
  SELECT a.doc_id AS seen_id, b.doc_id AS new_id, count(*) AS nc
  FROM ex a JOIN ex b ON a.s = b.s
  WHERE a.doc_id < {split_id} AND b.doc_id >= {split_id}
  GROUP BY 1, 2
)
SELECT seen_id, new_id,
       round(nc * 1.0 / (sa.n + sb.n - nc), 6) AS jaccard
FROM p
JOIN sz sa ON sa.doc_id = seen_id
JOIN sz sb ON sb.doc_id = new_id
WHERE round(nc * 1.0 / (sa.n + sb.n - nc), 6) >= {threshold}
"""


def ngram_novelty_sql(
    k: int, rare_max_df: int, common_min_df: int
) -> str:
    """Twin of text_analysis.ngram_novelty — same shingle CTE family
    as the jaccard/top_ngrams oracles; count(CASE ...) (not sum) so
    the conditional counts come back BIGINT like Spark's
    sum(cast(long)), not HUGEINT (repo pivot gotcha); ratio = single
    integer-numerator division rounded to 6dp, bucket from the
    ROUNDED value."""
    gram = " || ' ' || ".join(f"t[i+{j}]" for j in range(k))
    return f"""
WITH toks AS (
  SELECT doc_id, string_split({NORM_SQL}, ' ') AS t FROM documents
),
sh AS (
  SELECT doc_id,
         list_distinct([ {gram} for i in range(1, len(t) - {k - 2}) ]) AS shingles
  FROM toks WHERE len(t) >= {k}
),
ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
dfreq AS (SELECT s, count(*) AS df FROM ex GROUP BY s),
agg AS (
  SELECT doc_id,
         count(*) AS n_grams,
         count(CASE WHEN df = 1 THEN 1 END) AS n_unique,
         count(CASE WHEN df <= {rare_max_df} THEN 1 END) AS n_rare,
         count(CASE WHEN df >= {common_min_df} THEN 1 END) AS n_common
  FROM ex JOIN dfreq USING (s)
  GROUP BY doc_id
),
r AS (
  SELECT doc_id, n_grams, n_unique, n_rare, n_common,
         round(n_rare * 1.0 / n_grams, 6) AS novelty_ratio,
         round(n_common * 1.0 / n_grams, 6) AS common_ratio
  FROM agg
)
SELECT doc_id, n_grams, n_unique, n_rare, n_common, novelty_ratio,
       common_ratio,
       CASE WHEN novelty_ratio >= 0.8 THEN 'novel'
            WHEN novelty_ratio >= 0.3 THEN 'mixed'
            ELSE 'common' END AS novelty_bucket
FROM r
"""


def ngram_logppl_sql(
    k: int,
    micronats: list[int],
    novel_max_u: int,
    common_min_u: int,
) -> str:
    """Twin of text_analysis.ngram_logppl: same shingle CTE family,
    the SAME Python-computed micronat table embedded as a list literal
    (single source — the caller passes text_analysis.log_df_micronats'
    output to both engines), integer SUM, integer ``//`` division
    (operands non-negative, so DuckDB's trunc == Spark's div floor),
    bucket from the integer average.  No float log runs in either
    engine."""
    gram = " || ' ' || ".join(f"t[i+{j}]" for j in range(k))
    cap = len(micronats)
    table = "[" + ", ".join(str(v) for v in micronats) + "]"
    return f"""
WITH toks AS (
  SELECT doc_id, string_split({NORM_SQL}, ' ') AS t FROM documents
),
sh AS (
  SELECT doc_id,
         list_distinct([ {gram} for i in range(1, len(t) - {k - 2}) ]) AS shingles
  FROM toks WHERE len(t) >= {k}
),
ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
dfreq AS (SELECT s, count(*) AS df FROM ex GROUP BY s),
agg AS (
  SELECT doc_id,
         count(*) AS n_grams,
         cast(sum({table}[least(df, {cap})]) AS BIGINT) AS sum_log_df_u
  FROM ex JOIN dfreq USING (s)
  GROUP BY doc_id
),
r AS (
  SELECT doc_id, n_grams, sum_log_df_u,
         sum_log_df_u // n_grams AS avg_log_df_u
  FROM agg
)
SELECT doc_id, n_grams, sum_log_df_u, avg_log_df_u,
       CASE WHEN avg_log_df_u <= {novel_max_u} THEN 'novel'
            WHEN avg_log_df_u >= {common_min_u} THEN 'common'
            ELSE 'mixed' END AS ppl_bucket
FROM r
"""


def tfidf_keywords_sql(top_m: int, micronats: list[int]) -> str:
    """Twin of text_analysis.tfidf_keywords: same normalized
    whitespace tokenization, tf then df hash aggregates (df counts
    rows of the already-distinct (doc, term) tf relation), the SAME
    micronat table literal, integer score, row_number with the
    identical (score DESC, term) order."""
    cap = len(micronats)
    table = "[" + ", ".join(str(v) for v in micronats) + "]"
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split({NORM_SQL}, ' ')) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, count(*) AS tf
  FROM toks WHERE term <> '' GROUP BY doc_id, term
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
         cast(tf.tf * ({micronats[cap - 1]} - {table}[least(df, {cap})])
              AS BIGINT) AS tfidf_u
  FROM tf JOIN dfreq USING (term)
),
r AS (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY tfidf_u DESC, term
  ) AS kw_rank FROM scored
)
SELECT doc_id, term, tf, df, tfidf_u, kw_rank FROM r WHERE kw_rank <= {top_m}
"""


def line_dedup_sql(min_df: int) -> str:
    """Twin of text_analysis.line_dedup: positions via a struct list
    comprehension (DuckDB's unnest has no ordinality), trim-keyed
    distinct-doc counts, ordered string_agg reassembly (skips the
    dropped lines' NULLs exactly as collect_list does)."""
    return f"""
WITH lx AS (
  SELECT doc_id,
         unnest([{{'pos': i, 'line': l[i]}} for i in range(1, len(l) + 1)]) AS s
  FROM (SELECT doc_id, string_split(text, chr(10)) AS l FROM documents)
),
lines AS (
  SELECT doc_id, s.pos AS pos, s.line AS line, trim(s.line, ' ') AS k FROM lx
),
drops AS (
  SELECT k FROM lines WHERE k <> ''
  GROUP BY k HAVING count(DISTINCT doc_id) >= {min_df}
),
marked AS (
  SELECT l.doc_id, l.pos, l.line, d.k IS NOT NULL AS dropped
  FROM lines l LEFT JOIN drops d ON l.k = d.k
)
SELECT doc_id,
       count(*) AS n_lines,
       cast(sum(CASE WHEN dropped THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       coalesce(
         string_agg(CASE WHEN NOT dropped THEN line END, chr(10) ORDER BY pos),
         ''
       ) AS clean_text
FROM marked GROUP BY doc_id
"""


def substring_dedup_sql(k: int) -> str:
    """Twin of text_analysis.substring_dedup: positions via struct-list
    comprehensions (the line_dedup technique), gram df = count DISTINCT
    doc + min-doc canonical, covered positions from a literal offset
    list, islands via the same NULL-falls-to-1 lag CASE, ordered
    string_agg reassembly over the kept tokens."""
    gram = " || ' ' || ".join(f"t[i+{j}]" for j in range(k))
    offsets = "[" + ", ".join(str(j) for j in range(k)) + "]"
    return f"""
WITH arr AS (
  SELECT doc_id, string_split(norm, ' ') AS t
  FROM (SELECT doc_id, {NORM_SQL} AS norm FROM documents)
  WHERE norm <> ''
),
tok AS (
  SELECT doc_id, s.pos AS pos, s.term AS term FROM (
    SELECT doc_id,
           unnest([{{'pos': i, 'term': t[i]}} for i in range(1, len(t) + 1)]) AS s
    FROM arr)
),
g2 AS (
  SELECT doc_id, s.start AS start, s.g AS g FROM (
    SELECT doc_id,
           unnest([{{'start': i, 'g': {gram}}}
                   for i in range(1, len(t) - {k - 2})]) AS s
    FROM arr WHERE len(t) >= {k})
),
gfreq AS (
  SELECT g, count(DISTINCT doc_id) AS gdf, min(doc_id) AS canon
  FROM g2 GROUP BY g
),
dup AS (
  SELECT g2.doc_id, g2.start FROM g2 JOIN gfreq USING (g)
  WHERE gdf >= 2 AND g2.doc_id <> canon
),
cov AS (
  SELECT DISTINCT doc_id, pos FROM (
    SELECT doc_id, start + unnest({offsets}) AS pos FROM dup)
),
cov2 AS (
  SELECT doc_id, pos,
         CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) = pos - 1
              THEN 0 ELSE 1 END AS new_span
  FROM cov
)
SELECT t.doc_id AS doc_id,
       count(*) AS n_tokens,
       cast(sum(CASE WHEN c.new_span IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_tokens,
       cast(sum(coalesce(c.new_span, 0)) AS BIGINT) AS n_spans,
       coalesce(
         string_agg(CASE WHEN c.new_span IS NULL THEN t.term END, ' '
                    ORDER BY t.pos),
         ''
       ) AS clean_text
FROM tok t LEFT JOIN cov2 c ON t.doc_id = c.doc_id AND t.pos = c.pos
GROUP BY t.doc_id
"""


def training_pairs_sql(
    prompt_role: str = "user",
    response_role: str = "assistant",
    events_relation: str = "events",
) -> str:
    """Twin of order.training_pairs: adjacency via lag over the stable
    turn order."""
    return f"""{transcripts_cte(events_relation)}
SELECT conv_id, prompt_turn_idx, response_turn_idx, prompt, response
FROM (
  SELECT conv_id, turn_idx AS response_turn_idx, role,
         text AS response,
         lag(role) OVER w AS prev_role,
         lag(text) OVER w AS prompt,
         lag(turn_idx) OVER w AS prompt_turn_idx
  FROM transcripts
  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
)
WHERE role = '{response_role}' AND prev_role = '{prompt_role}'
"""


def eval_contamination_report_sql(k: int, n_eval: int) -> str:
    """Per-eval-item twin of decontaminate_sql's flagging join: group
    the shared-shingle hits by the EVAL doc instead of the train doc."""
    gram = " || ' ' || ".join(f"t[i+{j}]" for j in range(k))
    return f"""
WITH toks AS (
  SELECT doc_id, string_split({NORM_SQL}, ' ') AS t FROM documents
),
sh AS (
  SELECT doc_id,
         list_distinct([ {gram} for i in range(1, len(t) - {k - 2}) ]) AS shingles
  FROM toks WHERE len(t) >= {k}
),
eval_ids AS (
  SELECT doc_id FROM documents
  ORDER BY md5(cast(doc_id AS VARCHAR)), doc_id LIMIT {n_eval}
),
ev AS (
  SELECT doc_id AS eval_id, unnest(shingles) AS s
  FROM sh JOIN eval_ids USING (doc_id)
),
tr AS (
  SELECT doc_id, unnest(shingles) AS s FROM sh
  WHERE doc_id NOT IN (SELECT doc_id FROM eval_ids)
)
SELECT eval_id AS eval_doc_id,
       count(DISTINCT tr.doc_id) AS n_train_docs,
       count(*) AS n_hits
FROM tr JOIN ev USING (s)
GROUP BY eval_id
"""


def gopher_repetition_sql() -> str:
    """Twin of text_analysis.gopher_repetition_rules via exploded
    group-counts (the Spark side is a sorted-run projection — a
    different shape computing the same integers: per distinct unit u
    with count c, duplicates contribute c-1 instances and
    (c-1)*len(u) characters)."""
    unit = """
{x} AS (SELECT doc_id, unnest({col}) AS u FROM base),
{g} AS (SELECT doc_id, u, count(*) AS c FROM {x} GROUP BY 1, 2),
{a} AS (SELECT doc_id,
          cast(sum(c) AS BIGINT) AS n,
          cast(count(*) AS BIGINT) AS nd,
          cast(sum((c - 1) * len(u)) AS BIGINT) AS dupch,
          cast(sum(c * len(u)) AS BIGINT) AS totch
        FROM {g} GROUP BY 1)"""
    # empty units filtered like the Spark side (blank lines are
    # separators, not content); LEFT JOIN from documents + coalesce so
    # an all-blank doc keeps its row (Spark is a projection — it never
    # drops rows)
    return f"""
WITH base AS (
  SELECT doc_id,
         list_filter(string_split(text, chr(10)), x -> x != '') AS lines,
         list_filter(string_split_regex(text, '\\n{{2,}}'), x -> x != '')
           AS paras
  FROM documents
),{unit.format(x="lx", col="lines", g="lg", a="la")},{unit.format(x="px", col="paras", g="pg", a="pa")},
r AS (
  SELECT d.doc_id,
    cast(coalesce(la.n, 0) AS BIGINT) AS n_lines,
    cast(coalesce(pa.n, 0) AS BIGINT) AS n_paras,
    CASE WHEN coalesce(la.n, 0) = 0 THEN 0.0
         ELSE round((la.n - la.nd) * 1.0 / la.n, 6) END AS dup_line_frac,
    CASE WHEN coalesce(la.n, 0) = 0 THEN 0.0
         ELSE round(la.dupch * 1.0 / greatest(la.totch, 1), 6)
         END AS dup_line_char_frac,
    CASE WHEN coalesce(pa.n, 0) = 0 THEN 0.0
         ELSE round((pa.n - pa.nd) * 1.0 / pa.n, 6) END AS dup_para_frac,
    CASE WHEN coalesce(pa.n, 0) = 0 THEN 0.0
         ELSE round(pa.dupch * 1.0 / greatest(pa.totch, 1), 6)
         END AS dup_para_char_frac
  FROM documents d
  LEFT JOIN la USING (doc_id)
  LEFT JOIN pa USING (doc_id)
)
SELECT doc_id, n_lines, n_paras, dup_line_frac, dup_line_char_frac,
       dup_para_frac, dup_para_char_frac,
       (dup_line_frac <= 0.30 AND dup_para_frac <= 0.30
        AND dup_line_char_frac <= 0.20 AND dup_para_char_frac <= 0.20)
         AS rep_pass
FROM r
"""


def decontaminate_sql(k: int, n_eval: int, min_overlap: int = 1) -> str:
    """Eval-overlap contamination flags.  The eval set is the first
    ``n_eval`` docs by md5(doc_id) (the repo's standard deterministic
    sampling key) — both sides derive it identically from the data."""
    gram = " || ' ' || ".join(f"t[i+{j}]" for j in range(k))
    return f"""
WITH toks AS (
  SELECT doc_id, string_split({NORM_SQL}, ' ') AS t FROM documents
),
sh AS (
  SELECT doc_id,
         list_distinct([ {gram} for i in range(1, len(t) - {k - 2}) ]) AS shingles
  FROM toks WHERE len(t) >= {k}
),
eval_ids AS (
  SELECT doc_id FROM documents
  ORDER BY md5(cast(doc_id AS VARCHAR)), doc_id LIMIT {n_eval}
),
ev AS (
  SELECT DISTINCT unnest(shingles) AS s
  FROM sh JOIN eval_ids USING (doc_id)
),
tr AS (
  SELECT doc_id, unnest(shingles) AS s FROM sh
  WHERE doc_id NOT IN (SELECT doc_id FROM eval_ids)
)
SELECT doc_id, count(*) AS n_shared
FROM tr JOIN ev USING (s)
GROUP BY doc_id
HAVING count(*) >= {min_overlap}
"""


# deterministic markup augmentation (strip_markup twin): the synthetic
# corpus has no natural HTML, so both sides wrap the text in the same
# doc_id-derived tags/entities and the strip chain is actually
# exercised (same idiom as the redaction AUG_SQL below)
MARKUP_AUG_SQL = (
    "'<div id=\"d' || cast(doc_id AS VARCHAR) || '\"><p>' || text || "
    "'</p>' || "
    "CASE WHEN doc_id % 2 = 0 THEN '<script>var x = 1;</script>' "
    "ELSE '' END || "
    "CASE WHEN doc_id % 3 = 0 THEN '<!-- dropped -->' ELSE '' END || "
    "' &amp; tail &lt;ok&gt;</div>'"
)


def strip_markup_sql(
    blocks: tuple[str, ...],
    tag: str,
    entities: tuple[tuple[str, str], ...],
    ws_steps: tuple[tuple[str, str], ...],
) -> str:
    """Twin of text_analysis.strip_markup over the augmented text:
    identical regex chain in the same order, 'g' flag matching Spark's
    replace-all default.  ``ws_steps`` is text_analysis._WS_NORM_STEPS
    verbatim (newline-preserving collapse); a literal LF replacement is
    embedded as a raw newline inside the SQL string literal — RE2's
    rewrite parser has no \\n escape."""
    red = "t"
    for pat in blocks:
        red = f"regexp_replace({red}, '{pat}', ' ', 'g')"
    red = f"regexp_replace({red}, '{tag}', ' ', 'g')"
    for ent, repl in entities:
        r = repl.replace("'", "''")
        red = f"regexp_replace({red}, '{ent}', '{r}', 'g')"
    for pat, repl in ws_steps:
        r = repl.replace("'", "''")
        red = f"regexp_replace({red}, '{pat}', '{r}', 'g')"
    return f"""
WITH aug AS (SELECT doc_id, {MARKUP_AUG_SQL} AS t FROM documents)
SELECT doc_id,
  cast(len(regexp_extract_all(t, '{tag}')) AS BIGINT) AS n_tags,
  md5({red}) AS clean_md5
FROM aug
"""


AUG_SQL = (
    "concat_ws(' ', text, "
    "'contact user' || cast(doc_id AS VARCHAR) || '@example.com', "
    "'from 10.0.' || cast(doc_id % 256 AS VARCHAR) || '.7', "
    "CASE WHEN doc_id % 3 = 0 THEN "
    "'api_key=SECRET' || cast(doc_id AS VARCHAR) || 'TOKENVALUE' END)"
)


def redact_stats_sql(redactions) -> str:
    """Redaction twin over the deterministically PII-augmented text
    (the synthetic corpus has no natural PII; both sides derive the
    same augmented string from doc_id, so the patterns are actually
    exercised).  DuckDB needs the explicit 'g' flag to match Spark's
    replace-all default."""
    counts = ",\n  ".join(
        f"len(regexp_extract_all(t, '{pat}')) AS n_{name}"
        for name, pat, _ in redactions
    )
    red = "t"
    for _, pat, repl in redactions:
        red = f"regexp_replace({red}, '{pat}', '{repl}', 'g')"
    return f"""
WITH aug AS (SELECT doc_id, {AUG_SQL} AS t FROM documents)
SELECT doc_id,
  {counts},
  md5({red}) AS redacted_md5
FROM aug
"""


def token_counts_sql(bpeish_pattern: str) -> str:
    return f"""
SELECT doc_id,
  {N_TOKENS_SQL} AS n_ws_tokens,
  len(regexp_extract_all(text, '{bpeish_pattern}')) AS n_bpeish_tokens
FROM documents
"""


def gopher_sql(stops: tuple[str, ...]) -> str:
    """Twin of text_analysis.gopher_rules — same integer numerators,
    same single-division-then-round formulas, pass flag from the
    ROUNDED ratios.  Line metrics split RAW text on chr(10) exactly as
    the Spark side splits the raw column on \\n."""
    stop_sum = " + ".join(
        f"(CASE WHEN list_contains(t, '{w}') THEN 1 ELSE 0 END)"
        for w in stops
    )
    return f"""
WITH base AS (
  SELECT doc_id, text,
    {N_TOKENS_SQL} AS n,
    string_split({NORM_SQL}, ' ') AS t,
    string_split(text, chr(10)) AS lines
  FROM documents
),
m AS (
  SELECT doc_id, n,
    list_sum(list_transform(t, x -> len(x))) AS sum_len,
    len(regexp_extract_all(text, '#'))
      + len(regexp_extract_all(text, '\\.\\.\\.')) AS n_symbols,
    len(list_filter(t, x -> regexp_matches(x, '\\p{{L}}'))) AS n_alpha_w,
    len(list_filter(lines, l -> regexp_matches(l, '^[ \t]*[-*•]'))) AS n_bullet,
    len(list_filter(lines,
                    l -> regexp_matches(l, '(\\.\\.\\.|…)[ \t]*$'))) AS n_ellipsis,
    greatest(len(lines), 1) AS n_lines,
    {stop_sum} AS stop_hits
  FROM base
),
r AS (
  SELECT doc_id, n AS n_tokens,
    round(coalesce(sum_len, 0) * 1.0 / greatest(n, 1), 6) AS mean_word_len,
    round(n_symbols * 1.0 / greatest(n, 1), 6) AS symbol_ratio,
    round(n_bullet * 1.0 / n_lines, 6) AS bullet_frac,
    round(n_ellipsis * 1.0 / n_lines, 6) AS ellipsis_frac,
    round(n_alpha_w * 1.0 / greatest(n, 1), 6) AS alpha_word_frac,
    stop_hits
  FROM m
)
SELECT doc_id, n_tokens, mean_word_len, symbol_ratio, bullet_frac,
  ellipsis_frac, alpha_word_frac, stop_hits,
  (n_tokens BETWEEN 50 AND 100000 AND mean_word_len BETWEEN 3 AND 10
   AND symbol_ratio <= 0.1 AND bullet_frac <= 0.9
   AND ellipsis_frac <= 0.3 AND alpha_word_frac >= 0.8
   AND stop_hits >= 2) AS gopher_pass
FROM r
"""


def quality_sql(stopwords: tuple[str, ...]) -> str:
    stop_list = ", ".join(f"'{w}'" for w in stopwords)
    return f"""
WITH base AS (
  SELECT doc_id,
    length(text) AS n_chars_m,
    {N_TOKENS_SQL} AS n_tokens,
    len(regexp_extract_all(text, '[^\\w \\t\\n\\x0B\\f\\r]')) AS n_punct,
    len(regexp_extract_all(text, '[A-Za-z]')) AS n_alpha,
    len(list_filter(string_split({NORM_SQL}, ' '), x -> x IN ({stop_list}))) AS n_stop
  FROM documents
),
ratios AS (
  SELECT doc_id, n_chars_m, n_tokens,
    round(n_punct * 1.0 / greatest(n_chars_m, 1), 6) AS punct_ratio,
    round(n_alpha * 1.0 / greatest(n_chars_m, 1), 6) AS alpha_ratio,
    round(n_stop * 1.0 / greatest(n_tokens, 1), 6) AS stop_ratio,
    round(n_chars_m * 1.0 / greatest(n_tokens, 1), 6) AS mean_tok_len
  FROM base
)
SELECT doc_id, n_chars_m, n_tokens, punct_ratio, alpha_ratio, stop_ratio,
  mean_tok_len,
  round(
    (CASE WHEN n_chars_m BETWEEN 50 AND 10000 THEN 0.4 ELSE 0.0 END)
    + (CASE WHEN punct_ratio <= 0.1 THEN 0.2 ELSE 0.0 END)
    + (CASE WHEN stop_ratio >= 0.05 THEN 0.2 ELSE 0.0 END)
    + (CASE WHEN mean_tok_len BETWEEN 3 AND 12 THEN 0.2 ELSE 0.0 END), 6
  ) AS quality_score
FROM ratios
"""


def quality_percentile_sql(stopwords: tuple[str, ...]) -> str:
    """Twin of text_analysis.quality_percentile: same deterministic
    (quality DESC, doc_id) row_number order — NOT percent_rank(),
    whose tie handling would differ from the pinned unique order —
    and the same single integer-ratio division for q_pct.
    row_number cast to INT (Spark's row_number is IntegerType)."""
    return f"""
WITH q AS (SELECT doc_id, quality_score FROM ({quality_sql(stopwords)})),
r AS (
  SELECT d.doc_id, d.source, q.quality_score,
         row_number() OVER (PARTITION BY d.source
                            ORDER BY q.quality_score DESC, d.doc_id) AS rk,
         count(*) OVER (PARTITION BY d.source) AS n
  FROM documents d JOIN q USING (doc_id)
)
SELECT doc_id, source, quality_score,
       CAST(rk AS INT) AS q_rank,
       CASE WHEN n = 1 THEN 0.0
            ELSE round((rk - 1) * 1.0 / (n - 1), 6) END AS q_pct
FROM r
"""


def quality_clf_sql(
    weights_nano: tuple[int, ...],
    bias_nano: int,
    stopwords: tuple[str, ...],
) -> str:
    """Twin of quality_model.score_quality_clf: the same six integer
    features (true integer division ``//`` — identical to Spark's
    ``div`` because every numerator is non-negative) dotted with the
    same literal nano-unit weights.  Pure integers end to end, so the
    hash compare has no float to disagree on."""
    stop_list = ", ".join(f"'{w}'" for w in stopwords)
    f_names = ("f_ntok", "f_nchars", "f_mtl_c100",
               "f_punct_ppm", "f_stop_ppm", "f_uniq_ppm")
    dot = " + ".join(
        f"({f} * CAST({int(w)} AS BIGINT))"
        for f, w in zip(f_names, weights_nano)
    )
    return f"""
WITH base AS (
  SELECT doc_id,
    CAST({N_TOKENS_SQL} AS BIGINT) AS n_tok,
    CAST(length(text) AS BIGINT) AS n_chars,
    len(regexp_extract_all(text, '[^\\w \\t\\n\\x0B\\f\\r]')) AS n_punct,
    len(list_filter(string_split({NORM_SQL}, ' '),
                    x -> x IN ({stop_list}))) AS n_stop,
    len(list_distinct(string_split({NORM_SQL}, ' '))) AS n_uniq
  FROM documents
),
f AS (
  SELECT doc_id,
    n_tok AS f_ntok,
    n_chars AS f_nchars,
    (100 * n_chars) // greatest(n_tok, 1) AS f_mtl_c100,
    (1000000 * n_punct) // greatest(n_chars, 1) AS f_punct_ppm,
    (1000000 * n_stop) // greatest(n_tok, 1) AS f_stop_ppm,
    (1000000 * n_uniq) // greatest(n_tok, 1) AS f_uniq_ppm
  FROM base
)
SELECT doc_id, f_ntok, f_nchars, f_mtl_c100, f_punct_ppm, f_stop_ppm,
  f_uniq_ppm,
  CAST({int(bias_nano)} AS BIGINT) + {dot} AS quality_logit_nano,
  (CAST({int(bias_nano)} AS BIGINT) + {dot}) >= 0 AS clf_pass
FROM f
"""


def vocab_stats_sql(top: int) -> str:
    """Twin of text_analysis.vocab_stats: occurrences via unnest of
    the full (non-distinct) token list, doc frequency via
    count(DISTINCT doc_id), ties on the token."""
    return f"""
WITH t AS (
  SELECT doc_id, {NORM_SQL} AS norm FROM documents
),
ex AS (
  SELECT doc_id, unnest(string_split(norm, ' ')) AS token
  FROM t WHERE norm != ''
)
SELECT token, count(*) AS n_occurrences,
       count(DISTINCT doc_id) AS n_docs
FROM ex
GROUP BY token
ORDER BY n_occurrences DESC, token ASC
LIMIT {top}
"""


def dataset_card_sql(
    stopwords, markers, gopher_stops, quality_min: float
) -> str:
    """Per-source dataset-card twin: the quality / gopher / lang twins
    joined on doc_id, ONE per-source rollup (quantile_cont == Spark
    percentile) computing per-language counts in the same aggregate,
    then the identical strictly-greater ascending-language fold as the
    Spark side (== count DESC, lang ASC ties).  count(CASE ...) not
    sum(CASE ...): sum yields HUGEINT and hash-diverges from Spark's
    long (the pivot gotcha)."""
    langs = tuple(sorted(markers)) + ("und",)
    lang_cols = ",\n         ".join(
        f"count(CASE WHEN lang_pred = '{lg}' THEN 1 END) AS n_{lg}"
        for lg in langs
    )
    best = f"'{langs[0]}'"
    best_n = f"n_{langs[0]}"
    for lg in langs[1:]:
        best = f"CASE WHEN n_{lg} > {best_n} THEN '{lg}' ELSE {best} END"
        best_n = f"CASE WHEN n_{lg} > {best_n} THEN n_{lg} ELSE {best_n} END"
    return f"""
WITH q AS (SELECT doc_id, quality_score FROM ({quality_sql(stopwords)})),
g AS (SELECT doc_id, n_tokens, gopher_pass FROM ({gopher_sql(gopher_stops)})),
l AS (SELECT doc_id, lang_pred FROM ({lang_id_sql(markers)})),
base AS (
  SELECT d.source, d.doc_id, g.n_tokens, q.quality_score, g.gopher_pass,
         l.lang_pred
  FROM documents d
  JOIN q USING (doc_id) JOIN g USING (doc_id) JOIN l USING (doc_id)
),
per AS (
  SELECT source, count(*) AS n_docs,
         cast(sum(n_tokens) AS BIGINT) AS total_tokens,
         round(quantile_cont(n_tokens, 0.5), 6) AS p50_tokens,
         round(quantile_cont(n_tokens, 0.95), 6) AS p95_tokens,
         count(CASE WHEN quality_score >= {quality_min} THEN 1 END)
           AS n_quality,
         count(CASE WHEN gopher_pass THEN 1 END) AS n_gopher_pass,
         {lang_cols}
  FROM base GROUP BY source
)
SELECT source, n_docs, total_tokens, p50_tokens, p95_tokens,
       n_quality, n_gopher_pass, {best} AS top_lang
FROM per
"""


def lm_repetition_sql() -> str:
    """Twin of text_analysis.lm_repetition_features — every output a
    single integer-ratio double division in the same formula order."""
    return f"""
WITH toks AS (
  SELECT doc_id, {NORM_SQL} AS norm, string_split({NORM_SQL}, ' ') AS t
  FROM documents
),
base AS (
  SELECT doc_id,
    CASE WHEN norm = '' THEN 0 ELSE len(t) END AS n,
    len(list_distinct(t)) AS d,
    list_max(list_transform(list_distinct(t),
                            x -> len(list_filter(t, y -> y = x)))) AS maxcnt,
    CASE WHEN norm = '' OR len(t) < 2 THEN []
         ELSE [t[i] || ' ' || t[i+1] for i in range(1, len(t))] END AS bg
  FROM toks
),
r AS (
  SELECT doc_id, n,
    CASE WHEN n >= 1 THEN round(d * 1.0 / n, 6) END AS ttr,
    CASE WHEN n >= 1 THEN round(maxcnt * 1.0 / n, 6) END AS top_tok_frac,
    CASE WHEN n >= 2
         THEN round((len(bg) - len(list_distinct(bg))) * 1.0 / len(bg), 6)
         WHEN n = 1 THEN 0.0 END AS dup_bigram_frac
  FROM base
)
SELECT doc_id, n AS n_tokens, ttr, top_tok_frac, dup_bigram_frac,
  CASE WHEN n = 0 THEN 0.0 ELSE round(
    (CASE WHEN dup_bigram_frac <= 0.2 THEN 0.4 ELSE 0.0 END)
    + (CASE WHEN top_tok_frac <= 0.1 THEN 0.3 ELSE 0.0 END)
    + (CASE WHEN ttr >= 0.4 THEN 0.3 ELSE 0.0 END), 6) END AS lm_score
FROM r
"""


def lang_id_sql(markers: dict[str, tuple[str, ...]]) -> str:
    hit_cols = []
    for lang, words in markers.items():
        wl = ", ".join(f"'{w}'" for w in words)
        hit_cols.append(
            f"len(list_filter(string_split({NORM_SQL}, ' '), x -> x IN ({wl}))) AS h_{lang}"
        )
    langs = list(markers)
    # same fixed-order strictly-greater fold as the Spark expression
    best = "'und'"
    best_n = "0"
    for lang in langs:
        best = f"CASE WHEN h_{lang} > {best_n} THEN '{lang}' ELSE {best} END"
        best_n = f"CASE WHEN h_{lang} > {best_n} THEN h_{lang} ELSE {best_n} END"
    return f"""
WITH hits AS (SELECT doc_id, {', '.join(hit_cols)} FROM documents)
SELECT doc_id, {best} AS lang_pred, {best_n} AS lang_hits FROM hits
"""


def fingerprint_sql() -> str:
    return f"SELECT doc_id, md5({NORM_SQL}) AS fp FROM documents"


def embedding_near_dup_sql(threshold: float) -> str:
    # ::DOUBLE[] — list_cosine_similarity on FLOAT[] computes in
    # float32 and flips 6th-decimal boundary values vs Spark's
    # array<double> fold; cast before scoring to match exactly.
    return f"""
SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= {threshold}
"""


def simhash_pairs_sql(sigs, chunks: int = 4, max_hamming: int = 3) -> str:
    """Independent DuckDB twin of dedupe.simhash_pairs: the signatures
    ride on pandas' hash_array (no portable SQL twin), so the CALLER
    computes (doc_id, simhash) through the shared core
    ``dedupe.simhash_from_texts`` and passes them in as literals —
    DuckDB then independently does the chunk split (``>>`` is an
    arithmetic shift on BIGINT in both engines; the mask makes the two
    forms agree on every chunk incl. the sign-extended top one), the
    candidate self-join, XOR + bit_count, and the threshold filter —
    the join/filter logic is what this oracle actually checks."""
    width = 64 // chunks
    mask = (1 << width) - 1
    values = ", ".join(f"({int(i)}, {int(s)})" for i, s in sigs)
    return f"""
WITH sigs(doc_id, simhash) AS (VALUES {values}),
chunked AS (
  SELECT doc_id, simhash, ci, (simhash >> (ci * {width})) & {mask} AS cv
  FROM sigs CROSS JOIN range({chunks}) r(ci)
)
SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
       bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM chunked a JOIN chunked b
  ON a.ci = b.ci AND a.cv = b.cv AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
"""


def lsh_topk_sql(
    planes, query_vec_id: int, k: int, probe_radius: int = 1
) -> str:
    """Independent DuckDB twin of similarity.lsh_topk: the hyperplanes
    depend only on (dim, seed) — not on data — so they are embedded as
    literals and DuckDB recomputes the sign buckets itself.  A row is
    a candidate iff bit_count(bucket XOR query_bucket) <= probe_radius,
    which is exactly the Spark side's bucket+bit-flip probe set."""
    terms = []
    for i, h in enumerate(planes):
        lit = "[" + ", ".join(repr(float(x)) for x in h) + "]"
        terms.append(
            f"(CASE WHEN list_dot_product(embedding::DOUBLE[], {lit}) > 0 "
            f"THEN {1 << i} ELSE 0 END)"
        )
    bucket = " + ".join(terms)
    return f"""
WITH b AS (
  SELECT vec_id, embedding, {bucket} AS bucket FROM embeddings
),
q AS (SELECT embedding::DOUBLE[] AS e, bucket AS qb FROM b WHERE vec_id = {query_vec_id})
SELECT vec_id,
       round(list_cosine_similarity(embedding::DOUBLE[], (SELECT e FROM q)), 6) AS cosine
FROM b
WHERE bit_count(xor(bucket::BIGINT, (SELECT qb FROM q)::BIGINT)) <= {probe_radius}
ORDER BY cosine DESC, vec_id ASC
LIMIT {k}
"""


def rp_project_sql(planes, out_dim: int) -> str:
    """Random-projection twin: the Gaussian directions depend only on
    (dim, seed) — embedded as literals, DuckDB recomputes every
    projected coordinate itself (list_dot_product sums left-to-right
    like the Spark fold)."""
    import math

    scale = repr(1.0 / math.sqrt(out_dim))
    cols = []
    for j, h in enumerate(planes):
        lit = "[" + ", ".join(repr(float(x)) for x in h) + "]"
        # + 0.0 maps IEEE -0.0 -> 0.0 (mirrors the Spark side): a
        # coordinate rounding to zero from below otherwise hashes as
        # "-0.0" in one engine and "0.0" in the other
        cols.append(
            f"(round(list_dot_product(embedding::DOUBLE[], {lit}) * {scale}, 6)"
            f" + 0.0) AS rp_{j}"
        )
    sel = ",\n       ".join(cols)
    return f"SELECT vec_id,\n       {sel}\nFROM embeddings"


def ivf_topk_sql(centroids, probes: list[int], query_vec_id: int, k: int) -> str:
    """Independent DuckDB twin of similarity.ivf_topk: centroids are
    deterministic given the data (seeded k-means over the lowest-id
    sample — recomputed by the CALLER via the shared pandas core and
    passed in as literals), so DuckDB re-derives each row's cluster as
    argmax of centroid dot products (list_position of list_max = first
    max, matching numpy argmax) and scans only the probed clusters."""
    dots = ", ".join(
        "list_dot_product(embedding::DOUBLE[], ["
        + ", ".join(repr(float(x)) for x in c)
        + "])"
        for c in centroids
    )
    probe_list = ", ".join(str(p) for p in probes)
    return f"""
WITH d AS (SELECT vec_id, embedding, [{dots}] AS dl FROM embeddings),
a AS (SELECT vec_id, embedding,
             list_position(dl, list_max(dl)) - 1 AS cluster FROM d),
q AS (SELECT embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id = {query_vec_id})
SELECT vec_id,
       round(list_cosine_similarity(embedding::DOUBLE[], (SELECT e FROM q)), 6) AS cosine
FROM a
WHERE cluster IN ({probe_list})
ORDER BY cosine DESC, vec_id ASC
LIMIT {k}
"""


def semdedup_pairs_sql(centroids, threshold: float) -> str:
    """Independent DuckDB twin of dedupe.semdedup_pairs: centroids are
    deterministic given the data (seeded k-means over the lowest-id
    sample, recomputed by the CALLER via the shared pandas core and
    passed in as literals — the ivf_topk_sql discipline); DuckDB then
    independently re-derives each row's cluster as argmax of centroid
    dot products (list_position of list_max = first max, the same
    tie-break as Spark's array_position/array_max) and emits the
    same-cluster pairs at the 6dp-rounded cosine threshold."""
    dots = ", ".join(
        "list_dot_product(v, ["
        + ", ".join(repr(float(x)) for x in c)
        + "])"
        for c in centroids
    )
    return f"""
WITH d AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
a AS (SELECT vec_id, v,
             list_position(dl, list_max(dl)) - 1 AS cluster
      FROM (SELECT vec_id, v, [{dots}] AS dl FROM d))
SELECT x.vec_id AS a_id, y.vec_id AS b_id, x.cluster AS cluster,
       round(list_cosine_similarity(x.v, y.v), 6) AS cosine
FROM a x JOIN a y ON x.cluster = y.cluster AND x.vec_id < y.vec_id
WHERE round(list_cosine_similarity(x.v, y.v), 6) >= {threshold}
"""


def semantic_contaminated_sql(n_eval: int, threshold: float) -> str:
    """Independent twin of decontam.semantic_contaminated: the eval
    slice re-derived via the shared md5-rank idiom (the eval_ids CTE
    verbatim, on vec_id), train = the anti-joined remainder, scoring
    as an explicit cross join + row_number argmax — rounding before
    the ordering, ties to the lowest eval id, matching Spark's
    struct array_max on (round(cos,6), -eval_id)."""
    return f"""
WITH ev AS (
  SELECT vec_id AS eval_id, embedding::DOUBLE[] AS ve FROM embeddings
  ORDER BY md5(cast(vec_id AS VARCHAR)), vec_id LIMIT {n_eval}
),
tr AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
  WHERE vec_id NOT IN (SELECT eval_id FROM ev)
),
s AS (
  SELECT tr.vec_id, ev.eval_id,
         round(list_cosine_similarity(v, ve), 6) AS cos
  FROM tr CROSS JOIN ev
)
SELECT vec_id, eval_id AS nearest_eval_id, cos AS max_cosine
FROM (SELECT *, row_number() OVER (
        PARTITION BY vec_id ORDER BY cos DESC, eval_id) AS rn FROM s)
WHERE rn = 1 AND cos >= {threshold}
"""


def semdedup_keep_sql(centroids, threshold: float) -> str:
    """Twin of dedupe.semdedup_keep: groups from the recursive-CTE
    component query over the semdedup pair twin, per-vector centroid
    cosine re-derived as list_max(dl)/sqrt(dot(v,v)) (centroids are
    unit vectors), election = row_number over (centroid_cos ASC,
    id ASC) — the paper's farthest-from-centroid keep rule."""
    dots = ", ".join(
        "list_dot_product(v, ["
        + ", ".join(repr(float(x)) for x in c)
        + "])"
        for c in centroids
    )
    return f"""
WITH clusters AS (SELECT * FROM ({dup_clusters_sql(semdedup_pairs_sql(centroids, threshold))})),
d AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cc AS (SELECT vec_id,
              round(list_max(dl) / sqrt(list_dot_product(v, v)), 6) AS ccos
       FROM (SELECT vec_id, v, [{dots}] AS dl FROM d)),
ranked AS (
  SELECT c.doc_id, c.cluster_rep, c.cluster_size, cc.ccos,
         row_number() OVER (PARTITION BY c.cluster_rep
                            ORDER BY cc.ccos ASC, c.doc_id ASC) AS rn
  FROM clusters c JOIN cc ON cc.vec_id = c.doc_id
)
SELECT doc_id AS vec_id, cluster_rep AS group_rep,
       cluster_size AS group_size, ccos AS centroid_cos,
       rn = 1 AS keep
FROM ranked
"""


def source_overlap_sql(k: int) -> str:
    """Twin of text_analysis.source_overlap: per-doc distinct grams
    via the list_distinct comprehension (the jaccard idiom), DISTINCT
    to (source, gram), self-join a.source < b.source, counts joined
    back, containment as integer ppm of the smaller side."""
    gram = " || ' ' || ".join(f"t[i+{j}]" for j in range(k))
    return f"""
WITH arr AS (
  SELECT source, string_split({NORM_SQL}, ' ') AS t FROM documents
),
g AS (
  SELECT source,
         unnest(list_distinct([ {gram} for i in range(1, len(t) - {k - 2}) ])) AS s
  FROM arr WHERE len(t) >= {k}
),
sg AS (SELECT DISTINCT source, s FROM g),
cnt AS (SELECT source, count(*) AS n FROM sg GROUP BY source),
sh AS (
  SELECT a.source AS source_a, b.source AS source_b,
         count(*) AS shared_shingles
  FROM sg a JOIN sg b ON a.s = b.s AND a.source < b.source
  GROUP BY 1, 2
)
SELECT source_a, source_b, shared_shingles, ca.n AS n_a, cb.n AS n_b,
       (shared_shingles * 1000000) // least(ca.n, cb.n) AS containment_ppm
FROM sh
JOIN cnt ca ON ca.source = sh.source_a
JOIN cnt cb ON cb.source = sh.source_b
"""


def media_features_sql() -> str:
    """Oracle for the byte-level media features: the fake media payload
    is exactly the UTF-8 bytes of documents.text, so n_bytes/sig are
    octet_length/md5-prefix in DuckDB (byte_entropy has no portable SQL
    twin and is pinned by pytest instead)."""
    return """
SELECT doc_id AS media_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio'
            ELSE 'video' END AS kind,
       CAST(octet_length(encode(text)) AS INT) AS n_bytes,
       CASE WHEN octet_length(encode(text)) = 0 THEN ''
            ELSE substr(md5(text), 1, 16) END AS sig
FROM documents
"""


def ann_topk_sql(query_vec_id: int, k: int) -> str:
    return f"""
WITH q AS (SELECT embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id = {query_vec_id})
SELECT vec_id,
       round(list_cosine_similarity(embedding::DOUBLE[], (SELECT e FROM q)), 6) AS cosine
FROM embeddings
ORDER BY cosine DESC, vec_id ASC
LIMIT {k}
"""
