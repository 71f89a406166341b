"""Text analysis for training-data curation: language-ID, quality
scoring, token counting, document fingerprinting.

All pure JVM expressions (regexp counts, splits, hashes) so the whole
stage stays inside whole-stage codegen; every operator has an exact
ANSI-SQL twin in ``oracle.py``.  Float outputs are rounded to 6
decimals so cross-engine hashes agree.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedupe import normalize_text

# ---------------------------------------------------------------------------
# token counting
# ---------------------------------------------------------------------------
# BPE-ish pre-tokenizer: word pieces, numbers, or single non-space
# symbols (the classic GPT-2 pre-tok shape, simplified to the
# RE2 ∩ java.regex dialect).  Whitespace is spelled out in the negated
# class instead of \s: Java's \s includes \x0B, RE2's does not, so the
# shorthand would tokenize a vertical tab differently across engines.
BPEISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\x0B\f\r]"


def whitespace_token_count(col: Column | str) -> Column:
    c = normalize_text(col)
    return F.when(c == "", 0).otherwise(F.size(F.split(c, " ")))


def bpeish_token_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    # regexp_count == size(regexp_extract_all(..., 0)) for every
    # pattern (both count non-overlapping matches) without
    # materializing the match array (r8)
    return F.regexp_count(c, F.lit(BPEISH_PATTERN))


def with_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn(
        "n_ws_tokens", whitespace_token_count(text_col)
    ).withColumn("n_bpeish_tokens", bpeish_token_count(text_col))


# ---------------------------------------------------------------------------
# quality scoring
# ---------------------------------------------------------------------------
STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "was", "at", "by",
)


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """length / punctuation / stopword / alpha ratios + a composite
    score in [0,1].  Heuristics follow the usual corpus-quality
    recipes (length window, low symbol noise, natural stopword rate).
    """
    c = F.col(text_col)
    # materialize the normalized text, token array and token count in
    # their own projections (r8): the ratio and score expressions each
    # referenced the inline normalize+split chain, and Catalyst
    # re-evaluates inline expression args per reference (the
    # shingles_from_tokens gotcha) — cold-plan 3.4 s -> 0.8 s,
    # warm 0.58 -> 0.49 s at sf0.1; outputs bit-identical.
    base = (
        df.withColumn("_qn", normalize_text(text_col))
        .withColumn("_qt", F.split("_qn", " "))
        .withColumn(
            "_qntok",
            F.when(F.col("_qn") == "", 0).otherwise(F.size("_qt")),
        )
    )
    n_chars = F.length(c)
    n_tokens = F.col("_qntok")
    # \w agrees across Java/RE2; whitespace is spelled out (\s does not)
    # regexp_count == size(regexp_extract_all(..., 0)) without the
    # match-array materialization (r8)
    n_punct = F.regexp_count(c, F.lit(r"[^\w \t\n\x0B\f\r]"))
    n_alpha = F.regexp_count(c, F.lit(r"[A-Za-z]"))
    n_stop = F.size(F.filter(F.col("_qt"), lambda t: t.isin(*STOPWORDS)))

    punct_ratio = F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6)
    alpha_ratio = F.round(n_alpha / F.greatest(n_chars, F.lit(1)), 6)
    stop_ratio = F.round(n_stop / F.greatest(n_tokens, F.lit(1)), 6)
    mean_tok_len = F.round(n_chars / F.greatest(n_tokens, F.lit(1)), 6)

    length_ok = (n_chars >= 50) & (n_chars <= 10_000)
    out = (
        base.withColumn("n_chars_m", n_chars)
        .withColumn("n_tokens", n_tokens)
        .withColumn("punct_ratio", punct_ratio)
        .withColumn("alpha_ratio", alpha_ratio)
        .withColumn("stop_ratio", stop_ratio)
        .withColumn("mean_tok_len", mean_tok_len)
    )
    # score reads the MATERIALIZED ratio columns, not the inline
    # expressions — same values, no re-evaluation
    score = (
        F.when(length_ok, F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when(F.col("punct_ratio") <= 0.1, F.lit(0.2)).otherwise(F.lit(0.0))
        + F.when(F.col("stop_ratio") >= 0.05, F.lit(0.2)).otherwise(F.lit(0.0))
        + F.when(
            (F.col("mean_tok_len") >= 3) & (F.col("mean_tok_len") <= 12),
            F.lit(0.2),
        ).otherwise(F.lit(0.0))
    )
    return out.withColumn("quality_score", F.round(score, 6)).drop(
        "_qn", "_qt", "_qntok"
    )


# ---------------------------------------------------------------------------
# n-gram repetition / diversity scorer ("perplexity-ish" LM proxy)
# ---------------------------------------------------------------------------
def lm_repetition_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality v2: token/n-gram diversity statistics of the Gopher
    repetition-filter family — the train-free stand-in for an LM
    perplexity gate (repetitive, low-diversity text is exactly what a
    real LM scores as degenerate).  A true n-gram LM log-score needs
    float log sums whose libm/JVM 1-ulp drift breaks cross-engine
    hashing, so every output here is a SINGLE integer-ratio double
    division (exact on all engines), matching quality_features:

    - ttr              type-token ratio: distinct/total tokens
    - top_tok_frac     most frequent token's share
    - dup_bigram_frac  share of word bigrams that are repeats
    - lm_score         composite in [0,1] from thresholded terms

    Pure expressions (split/HOFs), no shuffle; token, sorted-token and
    run-boundary arrays are materialized in their own projections (the
    Catalyst re-evaluates-inline-lambda-args trap, see dedupe).
    Per-doc work is O(n log n): the top-token count is the longest
    equal-run in the SORTED token array (run starts -> adjacent
    differences), not a per-distinct-token scan — the naive
    O(distinct·total) form is a straggler factory on 100k-token
    pretraining docs (~10⁹ HOF ops per doc)."""
    out = (
        df.withColumn("_norm", normalize_text(text_col))
        .withColumn("_toks", F.split("_norm", " "))
        .withColumn(
            "_n",
            F.when(F.col("_norm") == "", F.lit(0)).otherwise(F.size("_toks")),
        )
        .withColumn("_dt", F.array_distinct("_toks"))
        .withColumn("_st", F.array_sort("_toks"))
        .withColumn(
            # 1-based positions where a new equal-run starts in _st;
            # size("_st") >= 1 always (split of "" is [""]), so the
            # sequence is never descending
            "_rb",
            F.filter(
                F.sequence(F.lit(1), F.size("_st")),
                lambda i: (i == 1)
                | (
                    F.element_at("_st", i.cast("int"))
                    != F.element_at("_st", (i - 1).cast("int"))
                ),
            ),
        )
        .withColumn(
            "_bg",
            F.when(
                F.col("_n") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.col("_n") - 1),
                    lambda i: F.concat(
                        F.element_at("_toks", i.cast("int")),
                        F.lit(" "),
                        F.element_at("_toks", (i + 1).cast("int")),
                    ),
                ),
            ).otherwise(F.array().cast("array<string>")),
        )
    )
    n = F.col("_n")
    # run length = next run's start - this run's start (the sentinel
    # size+1 closes the last run); max run length == max token count
    maxcnt = F.array_max(
        F.zip_with(
            F.concat(
                F.slice(F.col("_rb"), 2, F.size("_rb") - 1),
                F.array(F.size("_st") + 1),
            ),
            F.col("_rb"),
            lambda nxt, start: nxt - start,
        )
    )
    n_bg, d_bg = F.size("_bg"), F.size(F.array_distinct("_bg"))
    ttr = F.when(n >= 1, F.round(F.size("_dt") / n, 6))
    top = F.when(n >= 1, F.round(maxcnt / n, 6))
    dup = F.when(n >= 2, F.round((n_bg - d_bg) / n_bg, 6)).when(
        n == 1, F.lit(0.0)
    )
    out = (
        out.withColumn("n_tokens", n)
        .withColumn("ttr", ttr)
        .withColumn("top_tok_frac", top)
        .withColumn("dup_bigram_frac", dup)
    )
    score = (
        F.when(F.col("dup_bigram_frac") <= 0.2, F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when(F.col("top_tok_frac") <= 0.1, F.lit(0.3)).otherwise(F.lit(0.0))
        + F.when(F.col("ttr") >= 0.4, F.lit(0.3)).otherwise(F.lit(0.0))
    )
    return out.withColumn(
        "lm_score",
        F.when(F.col("n_tokens") == 0, F.lit(0.0)).otherwise(F.round(score, 6)),
    ).drop("_norm", "_toks", "_n", "_dt", "_st", "_rb", "_bg")


# ---------------------------------------------------------------------------
# Gopher-style document quality rules
# ---------------------------------------------------------------------------
# The published MassiveText/Gopher curation recipe's stop set (Rae et
# al. 2021, table A1): a doc must contain at least 2 of these to pass.
GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The Gopher/MassiveText repetition-independent quality gates as
    one codegen projection — the published rule thresholds:

    - 50 <= word count <= 100,000
    - 3 <= mean word length <= 10
    - symbol-to-word ratio (``#`` chars + ``...`` runs) <= 0.1
    - <= 90% of lines start with a bullet, <= 30% end with an ellipsis
    - >= 80% of words contain an alphabetic character
    - >= 2 distinct stop words present (GOPHER_STOPS)

    Line metrics split the RAW text on newlines (normalize_text
    collapses them); word metrics share the whitespace-token
    definition with the rest of the suite.  Every ratio is a single
    integer-numerator division rounded to 6dp and the pass flag is
    derived from the ROUNDED values, so the boolean reproduces
    bit-identically in the DuckDB twin (repo float-oracle rule).
    Pure HOF/regexp expressions, no shuffle — rides any scan."""
    c = F.col(text_col)
    out = (
        df.withColumn("_norm", normalize_text(text_col))
        .withColumn("_toks", F.split("_norm", " "))
        .withColumn(
            "_n",
            F.when(F.col("_norm") == "", F.lit(0)).otherwise(F.size("_toks")),
        )
        .withColumn("_lines", F.split(c, "\n"))
    )
    n = F.col("_n")
    n1 = F.greatest(n, F.lit(1))
    n_lines = F.greatest(F.size("_lines"), F.lit(1))
    sum_len = F.aggregate(
        F.col("_toks"), F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    n_symbols = F.regexp_count(c, F.lit("#")) + F.regexp_count(
        c, F.lit(r"\.\.\.")
    )
    # \p{L} (any Unicode letter — supported by both Java regex and
    # RE2) instead of [a-z]: accented / non-Latin words must count as
    # alphabetic or every es/de/fr doc fails the 80% alpha-word gate
    n_alpha_w = F.size(F.filter(F.col("_toks"), lambda w: w.rlike(r"\p{L}")))
    # explicit [ \t] instead of \s: Java's \s includes \x0B, RE2's
    # does not — the one dialect divergence that would flip the
    # DuckDB-twin hash on a corpus containing vertical tabs
    n_bullet = F.size(
        F.filter(F.col("_lines"), lambda l: l.rlike(r"^[ \t]*[-*•]"))
    )
    n_ellipsis = F.size(
        F.filter(F.col("_lines"), lambda l: l.rlike(r"(\.\.\.|…)[ \t]*$"))
    )
    stop_hits = sum(
        (F.array_contains("_toks", w).cast("int") for w in GOPHER_STOPS),
        start=F.lit(0),
    )
    out = (
        out.withColumn("n_tokens", n)
        .withColumn("mean_word_len", F.round(sum_len / n1, 6))
        .withColumn("symbol_ratio", F.round(n_symbols / n1, 6))
        .withColumn("bullet_frac", F.round(n_bullet / n_lines, 6))
        .withColumn("ellipsis_frac", F.round(n_ellipsis / n_lines, 6))
        .withColumn("alpha_word_frac", F.round(n_alpha_w / n1, 6))
        .withColumn("stop_hits", stop_hits)
    )
    gate = (
        F.col("n_tokens").between(50, 100_000)
        & F.col("mean_word_len").between(3, 10)
        & (F.col("symbol_ratio") <= 0.1)
        & (F.col("bullet_frac") <= 0.9)
        & (F.col("ellipsis_frac") <= 0.3)
        & (F.col("alpha_word_frac") >= 0.8)
        & (F.col("stop_hits") >= 2)
    )
    return out.withColumn("gopher_pass", gate).drop(
        "_norm", "_toks", "_n", "_lines"
    )


def gopher_repetition_rules(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The Gopher/MassiveText REPETITION gates (Rae et al. 2021, table
    A1) — the complement of ``gopher_rules``' quality gates and
    ``lm_repetition_features``' token statistics, over document
    STRUCTURE units:

    - duplicate line fraction       <= 0.30
    - duplicate paragraph fraction  <= 0.30
    - duplicate line CHAR fraction  <= 0.20
    - duplicate paragraph CHAR frac <= 0.20

    "Duplicate" counts instances beyond the first occurrence of each
    distinct unit ((n - n_distinct)/n); the char fractions weight
    those instances by their length (boilerplate lines repeated 50x
    dominate by characters long before they dominate by count).
    Paragraphs split on blank-line runs (``\\n{2,}``); EMPTY units are
    dropped before counting — blank lines are separators, not content,
    and counting them would flag every multi-paragraph doc as
    line-duplicated.

    Pure projection via the lm_repetition sorted-run technique
    (array_sort -> run boundaries -> per-run counts), extended with
    char weights: each run contributes (run_len - 1) * len(value)
    duplicate chars.  O(u log u) per doc in its unit count, no
    shuffle, rides any scan; every ratio is one integer-numerator
    division rounded to 6dp, pass flag from ROUNDED values (the
    DuckDB twin groups exploded units instead — different shape, same
    integers)."""
    c = F.col(text_col)
    out = df.withColumn(
        "_lines", F.filter(F.split(c, "\n"), lambda l: l != "")
    ).withColumn(
        "_paras", F.filter(F.split(c, r"\n{2,}"), lambda l: l != "")
    )

    def run_boundaries(sl: str) -> Column:
        # single-arg lambda REQUIRED: PySpark dispatches on lambda
        # arity, and a second (even defaulted) parameter turns it into
        # the (element, index) form.  Empty-array guard: sequence(1, 0)
        # DESCENDS ([1, 0]) and element_at(_, 0) is a runtime error.
        return F.when(
            F.size(sl) == 0, F.array().cast("array<int>")
        ).otherwise(
            F.filter(
                F.sequence(F.lit(1), F.size(sl)),
                lambda i: (i == 1)
                | (
                    F.element_at(sl, i.cast("int"))
                    != F.element_at(sl, (i - 1).cast("int"))
                ),
            )
        )

    for p in ("l", "p"):
        src = "_lines" if p == "l" else "_paras"
        out = out.withColumn(f"_sl{p}", F.array_sort(src))
        out = out.withColumn(f"_rb{p}", run_boundaries(f"_sl{p}"))

    def metrics(p: str) -> tuple[Column, Column, Column]:
        sl, rb = f"_sl{p}", f"_rb{p}"
        n = F.size(sl)
        n_runs = F.size(rb)
        run_lens = F.zip_with(
            F.concat(F.slice(F.col(rb), 2, F.size(rb) - 1), F.array(n + 1)),
            F.col(rb),
            lambda nxt, start: nxt - start,
        )
        dup_chars = F.aggregate(
            F.zip_with(
                run_lens,
                F.col(rb),
                lambda cnt, start: (cnt - 1)
                * F.length(F.element_at(F.col(sl), start.cast("int"))),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        tot_chars = F.aggregate(
            F.col(sl), F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
        )
        zero = F.size(sl) == 0  # all-blank doc: defined as 0.0, not null
        dup_frac = F.when(zero, F.lit(0.0)).otherwise(
            F.round((n - n_runs) / n, 6)
        )
        char_frac = F.when(zero, F.lit(0.0)).otherwise(
            F.round(dup_chars / F.greatest(tot_chars, F.lit(1)), 6)
        )
        return n, dup_frac, char_frac

    n_l, dl, dlc = metrics("l")
    n_p, dp, dpc = metrics("p")
    out = (
        out.withColumn("n_lines", n_l)
        .withColumn("n_paras", n_p)
        .withColumn("dup_line_frac", dl)
        .withColumn("dup_line_char_frac", dlc)
        .withColumn("dup_para_frac", dp)
        .withColumn("dup_para_char_frac", dpc)
    )
    gate = (
        (F.col("dup_line_frac") <= 0.30)
        & (F.col("dup_para_frac") <= 0.30)
        & (F.col("dup_line_char_frac") <= 0.20)
        & (F.col("dup_para_char_frac") <= 0.20)
    )
    return out.withColumn("rep_pass", gate).drop(
        "_lines", "_paras", "_sll", "_rbl", "_slp", "_rbp"
    )


# ---------------------------------------------------------------------------
# language ID (n-gram/stopword heuristic)
# ---------------------------------------------------------------------------
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is", "that", "with"),
    "es": ("el", "la", "los", "que", "por", "una"),
    "de": ("der", "die", "und", "das", "nicht", "ein"),
    "fr": ("le", "les", "des", "une", "est", "dans"),
}


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Pick the language with the most marker-word hits; 'und'
    (undetermined) when nothing matches.  Ties break by the fixed
    language order — deterministic.  (The test corpus's text is
    synthetic English-ish word salad, so the interesting check is
    determinism + oracle parity, not linguistic accuracy.)"""
    # materialize the token array ONCE and each language's hit count
    # as its own column BEFORE the argmax fold (r8): the fold
    # references every hit count several times (the comparison, the
    # replacement, and transitively every later language's
    # comparison), and inline expressions re-evaluate per reference —
    # the inlined form re-ran normalize+split+filter a dozen times
    # per row (measured 2.4 s -> 0.7 s at sf0.1 for the projection).
    toks = df.withColumn("_lang_toks", F.split(normalize_text(text_col), " "))

    def _hits_col(words: tuple[str, ...]) -> Column:
        # factory function, NOT a defaulted lambda arg: PySpark HOF
        # lambdas dispatch on arity, and a second (even defaulted)
        # parameter selects the (element, index) form (r5 gotcha)
        return F.size(
            F.filter(F.col("_lang_toks"), lambda t: t.isin(*words))
        )

    hits_df = toks.withColumns(
        {f"_lh_{lang}": _hits_col(w) for lang, w in LANG_MARKERS.items()}
    )
    best = F.lit("und")
    best_n = F.lit(0)
    for lang in LANG_MARKERS:  # fixed order = deterministic ties
        h = F.col(f"_lh_{lang}")
        take = h > best_n
        best = F.when(take, F.lit(lang)).otherwise(best)
        best_n = F.when(take, h).otherwise(best_n)
    out = (
        hits_df.withColumn("lang_pred", best)
        .withColumn("lang_hits", best_n)
        .drop("_lang_toks", *[f"_lh_{lang}" for lang in LANG_MARKERS])
    )
    return out


# ---------------------------------------------------------------------------
# markup / boilerplate stripping
# ---------------------------------------------------------------------------
# All patterns in the Java ∩ RE2 dialect (no lookaround/backrefs;
# inline (?i) and [\s\S] non-greedy blocks are fine in both).  The
# whitespace class is written out explicitly ([ \t\n\x0B\f\r]) instead
# of \s — Java's \s includes \x0B, RE2's does not (repo gotcha).
_MARKUP_BLOCKS = (
    r"(?i)<script[^>]*>[\s\S]*?</script>",
    r"(?i)<style[^>]*>[\s\S]*?</style>",
    r"<!--[\s\S]*?-->",
)
_MARKUP_TAG = r"</?[a-zA-Z][^>]*>"
# unescape order matters: &amp; LAST, or '&amp;lt;' double-unescapes
_MARKUP_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)
# Whitespace normalization that PRESERVES line structure: horizontal
# runs collapse to one space, newline runs (CR/CRLF normalized first)
# collapse to one LF.  Newlines must survive cleaning because the
# line-based Gopher gates (bullet_frac, ellipsis_frac) run on
# clean_text in the streaming curation leg — a single-line collapse
# would degenerate them to whole-document checks.  \A/\z (not ^/$) for
# the trim step: Java's $ also matches BEFORE a final newline, RE2's
# does not — \z is the dialect-exact end-of-text in both.
_WS_NORM_STEPS = (
    (r"\r\n?", "\n"),            # CR / CRLF -> LF
    (r"[ \t\x0B\f]+", " "),      # horizontal whitespace runs -> one space
    (r" ?\n[ \n]*", "\n"),       # newline runs (+ flanking spaces) -> one LF
    (r"\A[ \n]+|[ \n]+\z", ""),  # trim leading/trailing whitespace
)


def strip_markup(
    df: DataFrame, text_col: str = "text", out_col: str = "clean_text"
) -> DataFrame:
    """HTML/markup boilerplate removal — the cleaning pass a web-crawl
    pretraining corpus runs before tokenization: drop script/style
    blocks and comments wholesale, strip remaining tags, unescape the
    common entities, collapse whitespace (newline-preserving — see
    ``_WS_NORM_STEPS``).  Adds ``out_col`` plus
    ``n_tags`` (tag count BEFORE stripping — the signal for "was this
    doc markup-heavy").  Pure chained regexp_replace codegen — rides
    any scan, no shuffle; identical regex chain in the DuckDB twin
    (oracle.strip_markup_sql).

    Regex-level stripping, not an HTML parser: an attribute value
    containing ``>`` splits its tag early (the classic regex/HTML
    limit) — the right trade for corpus cleaning throughput; route
    documents needing DOM fidelity through a parser UDF instead."""
    c = F.col(text_col)
    n_tags = F.regexp_count(c, F.lit(_MARKUP_TAG))
    cleaned = c
    for pat in _MARKUP_BLOCKS:
        cleaned = F.regexp_replace(cleaned, pat, " ")
    cleaned = F.regexp_replace(cleaned, _MARKUP_TAG, " ")
    for ent, repl in _MARKUP_ENTITIES:
        # literal replacement: escape nothing — entity strings are
        # regex-safe except '&', which is literal in both dialects
        cleaned = F.regexp_replace(cleaned, ent, repl)
    for pat, repl in _WS_NORM_STEPS:
        cleaned = F.regexp_replace(cleaned, pat, repl)
    return df.withColumn("n_tags", n_tags).withColumn(out_col, cleaned)


# ---------------------------------------------------------------------------
# unicode normalization
# ---------------------------------------------------------------------------
def normalize_unicode(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "text_nfc",
    form: str = "NFC",
) -> DataFrame:
    """Unicode normalization (NFC by default) — the step a multilingual
    corpus runs before ANY hashing/dedup/tokenizing: 'é' composed
    (U+00E9) and 'e'+combining-acute (U+0301) are different strings to
    every md5/shingle/minhash operator until normalized, so the same
    sentence from two crawls silently fails exact dedup.

    pyspark.sql.functions exposes no ICU normalizer, so this is the
    UDF tier done right: a VECTORIZED pandas UDF (Arrow batches,
    ``Series.str.normalize`` — stdlib unicodedata underneath), not a
    row-at-a-time Python UDF.  Pure projection — rides any scan, no
    shuffle.  DuckDB twin: ``nfc_normalize`` (NFC only — other forms
    are pytest-covered, no SQL twin)."""
    import pandas as pd  # noqa: F401 — pandas_udf signature
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _norm(s):
        return s.str.normalize(form)

    c = F.col(text_col)
    return df.withColumn(out_col, _norm(c)).withColumn(
        "nfc_changed", F.col(out_col) != c
    )


# ---------------------------------------------------------------------------
# document fingerprinting
# ---------------------------------------------------------------------------
def fingerprint(col: Column | str) -> Column:
    """Whole-content fingerprint over normalized text."""
    return F.md5(normalize_text(col))


def rolling_fingerprint(col: Column | str, window: int = 16, keep: int = 4) -> Column:
    """Winnowing-lite: hash every ``window``-char rolling substring
    (xxhash64), keep the ``keep`` smallest — a compact sketch that two
    near-identical documents mostly share.  Pure expressions:
    sequence -> substr -> hash -> array_sort -> slice.

    ``col`` should be a MATERIALIZED normalized-text column reference:
    the transform lambda references it once per window position, and
    Catalyst re-evaluates inline expression arguments per reference
    (same O(len²) trap as dedupe.shingles_from_tokens)."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c)
    hashes = F.transform(
        F.sequence(F.lit(1), F.greatest(n - window + 1, F.lit(1))),
        lambda i: F.xxhash64(F.substring(c, i, window)),
    )
    return F.slice(F.array_sort(hashes), 1, keep)


def with_fingerprints(df: DataFrame, text_col: str = "text") -> DataFrame:
    return (
        df.withColumn("_norm", normalize_text(text_col))
        .withColumn("fp", F.md5(F.col("_norm")))
        .withColumn("fp_sketch", rolling_fingerprint(F.col("_norm")))
        .drop("_norm")
    )


def corpus_stats(
    df: DataFrame, group_col: str = "source", exact: bool = True
) -> DataFrame:
    """Per-group corpus composition report — the dataset card a
    training run starts from: doc counts, token totals, and the token-
    count distribution (exact interpolated p50/p95 via Spark's
    ``percentile``, which matches DuckDB's ``quantile_cont``
    definition: linear interpolation at rank (n-1)*p).

    One shuffle keyed on the group column (sources are few and the
    partial aggregation is map-side).  ``exact=True`` (default, the
    oracle-checked form) gathers each group's values — fine for a
    per-SOURCE rollup where groups are few and bounded.
    ``exact=False`` is the high-cardinality scale path: Spark's
    ``approx_percentile`` (Greenwald-Khanna sketch, mergeable so it
    partial-aggregates map-side like any other partial agg; relative
    rank error <= 1/accuracy=1e-4).  The sketch picks an OBSERVED
    value rather than interpolating, so it has no cross-engine SQL
    twin — keep it out of oracle paths and bound it against the exact
    form instead (tests).  Ratios use integer numerators and a single
    6dp round so the doubles are bit-identical to the SQL twin (repo
    float-oracle rule)."""
    if exact:
        p50 = F.percentile("n_ws_tokens", F.lit(0.5))
        p95 = F.percentile("n_ws_tokens", F.lit(0.95))
    else:
        p50 = F.approx_percentile("n_ws_tokens", F.lit(0.5), F.lit(10_000))
        p95 = F.approx_percentile("n_ws_tokens", F.lit(0.95), F.lit(10_000))
    toks = with_token_counts(df)
    return toks.groupBy(group_col).agg(
        F.count("*").alias("n_docs"),
        F.sum("n_ws_tokens").alias("total_tokens"),
        F.min("n_ws_tokens").alias("min_tokens"),
        F.max("n_ws_tokens").alias("max_tokens"),
        F.round(p50.cast("double"), 6).alias("p50_tokens"),
        F.round(p95.cast("double"), 6).alias("p95_tokens"),
        F.round(F.sum("n_ws_tokens") / F.count("*"), 6).alias("mean_tokens"),
    )


def quality_percentile(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-source quality position — the primitive behind "keep the
    top X% of each source": rank docs inside each source by
    quality_score DESC (ties broken by id — the score is a coarse
    0.0-1.0 lattice, so ties are the COMMON case and an undefined
    order would make top-X% selection nondeterministic), then the
    percent-rank-style position q_pct = (q_rank-1)/(n-1) as one
    integer-ratio division rounded to 6dp (0.0 for a 1-doc source).
    ``filter(q_pct <= x)`` keeps the top x fraction exactly.

    One shuffle keyed on the source (both windows share the
    partitioning); same per-stratum sort caveat as
    stratified_sample_exact."""
    q = quality_features(df, text_col)
    w = Window.partitionBy(group_col).orderBy(
        F.desc("quality_score"), F.col(id_col)
    )
    wn = Window.partitionBy(group_col)
    return (
        q.withColumn("q_rank", F.row_number().over(w))
        .withColumn("_n", F.count("*").over(wn))
        .withColumn(
            "q_pct",
            F.when(F.col("_n") == 1, F.lit(0.0)).otherwise(
                F.round((F.col("q_rank") - 1) / (F.col("_n") - 1), 6)
            ),
        )
        .select(id_col, group_col, "quality_score", "q_rank", "q_pct")
    )


def vocab_stats(
    df: DataFrame,
    top: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus vocabulary by TERM frequency — the table a tokenizer/BPE
    training prep starts from: the ``top`` tokens by total occurrence
    count, with document frequency alongside (``top_ngrams`` is the
    DOC-frequency complement over k-grams).  Ties break on the token
    for a deterministic page.

    Shape: token explode (occurrences, NOT distinct) -> one shuffle on
    the token (uniform content key, map-side partial counts; the
    distinct-doc count rides the same shuffle) ->
    TakeOrderedAndProject.  count_distinct per token is exact here;
    at extreme vocabulary scale swap approx_count_distinct and state
    the error bound."""
    norm = normalize_text(text_col)
    ex = (
        df.select(F.col(id_col).alias("_id"), norm.alias("_norm"))
        .filter(F.col("_norm") != "")
        # explode_OUTER: plain explode plants an implicit size>0
        # filter that Catalyst pushes below the projection (the
        # dedupe._explode_shingles gotcha); the array is non-empty by
        # the _norm != '' guard, so the filter would be vacuous anyway
        .select("_id", F.explode_outer(F.split("_norm", " ")).alias("token"))
    )
    return (
        ex.groupBy("token")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.count_distinct("_id").alias("n_docs"),
        )
        .orderBy(F.desc("n_occurrences"), F.asc("token"))
        .limit(top)
    )


def ngram_novelty(
    df: DataFrame,
    k: int = 3,
    rare_max_df: int = 2,
    common_min_df: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
    materialize_dir: str | None = None,
) -> DataFrame:
    """Count-based n-gram novelty score — the "perplexity-ish" corpus
    scorer expressed entirely in INTEGER corpus frequencies (the
    blueprint's quality-filter stage, log-aggregation-pipeline-
    blueprint.md:269-274, next to the Gopher repetition family): a doc
    whose k-grams are mostly corpus-unique is novel (or noise); one
    whose k-grams are all high-frequency is boilerplate an LM already
    saw many times.  A true n-gram LM log-probability needs float log
    sums whose libm/JVM 1-ulp drift breaks cross-engine hashing, so
    novelty is bucketed by document-frequency THRESHOLDS instead
    (integer counts -> one integer-ratio division -> 6dp round ->
    bucket from the rounded value, the gopher_rules technique):

    - n_grams        distinct k-grams in the doc
    - n_unique       grams appearing in NO other doc (corpus df = 1)
    - n_rare         grams with df <= rare_max_df
    - n_common       grams with df >= common_min_df
    - novelty_ratio  n_rare / n_grams      (rounded, exact both engines)
    - common_ratio   n_common / n_grams
    - novelty_bucket 'novel' / 'mixed' / 'common' from the rounded ratio

    Docs with < k tokens have no k-grams and are absent (the jaccard-
    family convention; the exact-dedup stage owns tiny docs).

    Plan shape / 100 TB posture: shingle projection (explode_outer —
    see dedupe._explode_shingles) -> gram document-frequency count
    (one shuffle on the gram, uniform content key, map-side partial)
    -> equi-join grams->df (shuffle join on the gram; the df table is
    the corpus vocabulary, far too big to broadcast at scale and never
    collected) -> per-doc aggregate (one shuffle on the doc id).
    Hot stop-grams skew the join key, which is why this is a JOIN
    (AQE splits skewed join partitions at runtime) and not a
    count-over-window — a window partition cannot be split, and a
    billion-row stop-gram partition would straggle or OOM.  The
    shingle projection feeds both join sides, so with the default
    ``materialize_dir=None`` Catalyst computes it twice (the df side's
    exchange carries map-side partial counts — different payload, no
    exchange reuse).  Passing ``materialize_dir`` writes the exploded
    (id, gram) table once and feeds the written parquet to both sides
    — the 100 TB form (one corpus-wide shingle pass instead of two;
    same write-then-reread idiom as corpus_prep_funnel_neardup)."""
    from log_aggregation_pipeline_spark.operators.dedupe import (
        _explode_shingles,
        _shingle_df,
    )

    ex = _explode_shingles(_shingle_df(df, k, text_col, id_col))
    if materialize_dir is not None:
        ex.write.mode("overwrite").parquet(materialize_dir)
        ex = df.sparkSession.read.parquet(materialize_dir)
    dfreq = ex.groupBy("_s").agg(F.count("*").alias("_df"))
    agg = (
        ex.join(dfreq, "_s")
        .groupBy("_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum((F.col("_df") == 1).cast("long")).alias("n_unique"),
            F.sum((F.col("_df") <= rare_max_df).cast("long")).alias("n_rare"),
            F.sum((F.col("_df") >= common_min_df).cast("long")).alias("n_common"),
        )
    )
    novelty = F.round(F.col("n_rare") / F.col("n_grams"), 6)
    common = F.round(F.col("n_common") / F.col("n_grams"), 6)
    return (
        agg.select(
            F.col("_id").alias(id_col),
            "n_grams",
            "n_unique",
            "n_rare",
            "n_common",
            novelty.alias("novelty_ratio"),
            common.alias("common_ratio"),
        )
        .withColumn(
            "novelty_bucket",
            F.when(F.col("novelty_ratio") >= 0.8, F.lit("novel"))
            .when(F.col("novelty_ratio") >= 0.3, F.lit("mixed"))
            .otherwise(F.lit("common")),
        )
    )


LOGPPL_DF_CAP = 1024  # df clamp for the micronat table (beyond this a
# gram is saturated "common"; ln is flat there — ln(1024) vs ln(2048)
# differs by 0.69 nat on a scale the buckets cut at whole nats)
LOGPPL_NOVEL_MAX_U = 693_147  # avg ln(df) <= ln(2): mostly-rare grams
LOGPPL_COMMON_MIN_U = 2_079_442  # avg ln(df) >= ln(8): boilerplate


def log_df_micronats(cap: int = LOGPPL_DF_CAP) -> list[int]:
    """ln(df) quantized to integer MICRONATS for df = 1..cap, computed
    ONCE here in Python and embedded as a literal array in BOTH the
    Spark plan and the DuckDB oracle — the single-source fixed-point
    table that sidesteps the cross-engine float-log blocker (libm vs
    JVM Math.log can differ by 1 ulp; an integer table cannot)."""
    import math

    return [round(1e6 * math.log(d)) for d in range(1, cap + 1)]


def ngram_logppl(
    df: DataFrame,
    k: int = 3,
    cap: int = LOGPPL_DF_CAP,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Log-space n-gram scorer in FIXED POINT — the true-log sibling of
    ``ngram_novelty`` (which buckets by df thresholds).  Per doc, over
    its distinct k-grams: sum and average of ln(corpus document
    frequency) in integer micronats, via the Python-computed literal
    table ``log_df_micronats`` (df clamped to ``cap``).  Low average
    log-df = the doc's grams are corpus-rare (novel or noise); high =
    boilerplate.  Under the df unigram model P(g) = df(g)/N the true
    per-gram surprisal is ln N - ln df: N is a per-corpus constant, so
    avg_log_df ranks docs identically to average surprisal while
    needing no in-engine log at all.

    Integer discipline end-to-end (the ngram_novelty/gopher technique):
    integer micronat lookup -> integer SUM -> integer ``div`` for the
    average -> bucket from the integer.  Both engines run the same
    integer arithmetic on the same literal table, so the twins cannot
    drift by rounding.

    Columns: (doc_id, n_grams, sum_log_df_u, avg_log_df_u, ppl_bucket)
    with bucket cuts at ln(2)/ln(8) micronats (novel/mixed/common).
    Docs with < k tokens have no k-grams and are absent (the
    jaccard-family convention).

    Plan shape / 100 TB posture: identical to ``ngram_novelty`` — the
    gram-df equi-join (AQE-splittable, never count-over-window), one
    shuffle per stage; the micronat table is a foldable array literal
    riding the join projection (element_at on a constant — no UDF, no
    broadcast needed)."""
    from log_aggregation_pipeline_spark.operators.dedupe import (
        _explode_shingles,
        _shingle_df,
    )

    from log_aggregation_pipeline_spark.operators.similarity import (
        int_array_lit,
    )

    table = log_df_micronats(cap)
    ex = _explode_shingles(_shingle_df(df, k, text_col, id_col))
    dfreq = ex.groupBy("_s").agg(F.count("*").alias("_df"))
    # constant-folded ArrayType literal, built in ONE py4j call
    # (F.lit(list) expands to one JVM round-trip per element — ~1 s
    # of plan-build for the 1024-entry table; see double_array_lit)
    lit_table = int_array_lit(table)
    mu = F.element_at(lit_table, F.least(F.col("_df"), F.lit(cap)).cast("int"))
    agg = (
        ex.join(dfreq, "_s")
        .groupBy("_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(mu.cast("long")).alias("sum_log_df_u"),
        )
    )
    return (
        agg.select(
            F.col("_id").alias(id_col),
            "n_grams",
            "sum_log_df_u",
            # integer division: both operands non-negative (ln(df)>=0),
            # so Spark's div and DuckDB's // agree (trunc == floor)
            F.expr("sum_log_df_u div n_grams").alias("avg_log_df_u"),
        )
        .withColumn(
            "ppl_bucket",
            F.when(F.col("avg_log_df_u") <= LOGPPL_NOVEL_MAX_U, F.lit("novel"))
            .when(F.col("avg_log_df_u") >= LOGPPL_COMMON_MIN_U, F.lit("common"))
            .otherwise(F.lit("mixed")),
        )
    )


def tfidf_keywords(
    df: DataFrame,
    top_m: int = 5,
    cap: int = LOGPPL_DF_CAP,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document distinctive terms by fixed-point TF-IDF.

    score_u = tf * (ln(cap) - ln(min(df, cap))) in integer MICRONATS
    via the same Python-computed ``log_df_micronats`` table both
    engines embed (the ``ngram_logppl`` discipline — no in-engine
    float log, no 1-ulp drift).  The idf reference is the CLAMP
    ceiling, not corpus size N: ln(N/df) needs a data-dependent
    literal (N differs per scale factor and would force a pre-count
    into plan build), while ln(cap/df) is corpus-size independent —
    terms at or beyond the cap are "everywhere" and score 0; within
    the cap the two differ by the per-corpus constant ln(N/cap),
    which is invariant across a document's terms only in the additive
    sense, so rankings differ from textbook tf-idf exactly where df
    saturates — the regime where both agree the term is noise.

    Top ``top_m`` per doc by (score DESC, term ASC) row_number — the
    ``quality_percentile`` determinism rule (ties are common: every
    zero-score term ties).  Docs whose normalized text is empty have
    no terms and are absent.

    Columns: (doc_id, term, tf, df, tfidf_u, kw_rank).

    100 TB posture: two hash aggregates (doc-term tf, then term df —
    the df input is already one row per (doc, term), so the df count
    needs no countDistinct) + an AQE-splittable equi-join + a per-doc
    window bounded by the doc's distinct-term count.  The micronat
    table is a foldable literal riding the join projection."""
    from log_aggregation_pipeline_spark.operators.similarity import (
        int_array_lit,
    )

    table = log_df_micronats(cap)
    toks = (
        df.select(
            F.col(id_col).alias("_id"),
            F.split(normalize_text(text_col), " ").alias("_toks"),
        )
        .select("_id", F.explode_outer("_toks").alias("term"))
        .filter(F.col("term") != "")
    )
    tf = toks.groupBy("_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    idf_u = F.lit(table[cap - 1]) - F.element_at(
        int_array_lit(table), F.least(F.col("df"), F.lit(cap)).cast("int")
    )
    scored = tf.join(dfreq, "term").withColumn(
        "tfidf_u", (F.col("tf") * idf_u).cast("long")
    )
    w = Window.partitionBy("_id").orderBy(F.desc("tfidf_u"), F.asc("term"))
    return (
        scored.withColumn("kw_rank", F.row_number().over(w))
        .filter(F.col("kw_rank") <= top_m)
        .select(
            F.col("_id").alias(id_col), "term", "tf", "df", "tfidf_u", "kw_rank"
        )
    )


def line_dedup(
    df: DataFrame,
    min_df: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet-style cross-document line deduplication (Wenzek et al.
    2020): drop every line whose trimmed content appears in at least
    ``min_df`` DISTINCT documents — the shared headers / footers /
    cookie banners that survive per-document dedup because each doc
    is otherwise unique.  Within-doc repetition is NOT this operator's
    job (``gopher_repetition_rules`` gates that); a line repeated 50×
    inside one doc has df=1 here.

    Lines split on ``\\n`` with positions preserved; the match key is
    ``trim(line, ' ')`` in the twin — DuckDB's bare trim also strips
    Unicode spaces, Spark's F.trim is ASCII-space only (so CRLF
    residue behaves identically); empty-trim lines are separators,
    never dropped, and never counted in the drop set.  ``clean_text``
    reassembles the KEPT lines' original (untrimmed) text in document
    order; a doc that is entirely boilerplate keeps its row with
    ``clean_text = ''`` (disclosed, not silently vanished).

    Columns: (doc_id, n_lines, n_dropped, clean_text).

    100 TB posture: posexplode is linear; the drop-set build is one
    hash aggregate over (doc, key) distinct pairs then a key count
    (map-side combined); the mark join is an equi-join on the line
    key — AQE broadcasts it when the boilerplate set is small (the
    common case: drop-set cardinality « line cardinality) and splits
    hot keys (the "Home" line) otherwise; reassembly is one shuffle
    back to doc_id.  CCNet runs this per shard — compose by filtering
    to a source/snapshot before calling for shard-scoped semantics."""
    ex = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(F.col(text_col), "\n", -1)).alias("pos", "line"),
    ).withColumn("_k", F.trim(F.col("line")))
    drops = (
        ex.filter(F.col("_k") != "")
        .select("_id", "_k")
        .distinct()
        .groupBy("_k")
        .agg(F.count("*").alias("_df"))
        .filter(F.col("_df") >= min_df)
        .select("_k", F.lit(True).alias("_drop"))
    )
    return (
        ex.join(drops, "_k", "left")
        .groupBy("_id")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.when(F.col("_drop"), 1).otherwise(0)).alias("n_dropped"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("_drop").isNull(),
                                F.struct("pos", "line"),
                            )
                        )
                    ),
                    lambda s: s["line"],
                ),
                "\n",
            ).alias("clean_text"),
        )
        .select(F.col("_id").alias(id_col), "n_lines", "n_dropped", "clean_text")
    )


def substring_dedup(
    df: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact duplicated-substring removal (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better") — the
    span-level sibling of ``line_dedup``: cut every token span that is
    an exact k-token duplicate of text in ANOTHER document, keeping
    one canonical copy corpus-wide.  Catches the quote/chain-letter/
    license-block duplication that document-level dedup misses (the
    docs differ) and line-level dedup misses (the span crosses or
    sits inside lines).

    Semantics (deterministic, both engines):

    - tokens = split of the normalized text (``dedupe.normalize_text``
      — the corpus-wide key discipline); docs whose normalized text is
      empty are absent (the tfidf convention).
    - a k-gram is DUPLICATED iff it occurs in >= 2 distinct documents;
      its canonical holder is the min doc_id containing it.  Within-doc
      repetition is NOT this operator's job (df=1 here) —
      ``gopher_repetition_rules`` gates that, the ``line_dedup``
      scoping rule.
    - in every non-canonical doc, all token positions covered by any
      duplicated k-gram occurrence are removed; overlapping/adjacent
      covered ranges merge into spans.  The canonical doc keeps its
      copy untouched — "all but one occurrence" with a deterministic
      survivor, no order-of-processing dependence.
    - ``clean_text`` is the kept tokens of the NORMALIZED text joined
      with single spaces (normalization is the match key, so the
      reassembly is in key space; disclosed, not hidden).

    Columns: (doc_id, n_tokens, n_dup_tokens, n_spans, clean_text) —
    a doc that is entirely duplicated text keeps its row with
    ``clean_text = ''`` (disclosed, the line_dedup rule).

    100 TB posture: gram generation is a per-row HOF projection
    (materialized token array — the shingles_from_tokens perf rule);
    the gram table build is one hash aggregate on the gram (count
    DISTINCT doc + min doc, two-phase, map-side partial); the dup-mark
    is an AQE-splittable equi-join on the gram (hot boilerplate grams
    are exactly the skewed-key case — a join splits, a window would
    not: the ngram_novelty rule); covered-position expansion is
    bounded by k x dup-occurrences (dup spans only, not the corpus);
    reassembly is one shuffle back to the doc id.  Span counting
    rides the covered-position frame as a lag window bounded by doc
    length.  Nothing is collected; no all-pairs stage exists —
    candidate volume is linear in dup-gram occurrences."""
    from log_aggregation_pipeline_spark.operators.dedupe import normalize_text

    base = df.select(
        F.col(id_col).alias("_id"), normalize_text(text_col).alias("_norm")
    ).filter(F.col("_norm") != "")
    arr = base.select("_id", F.split("_norm", " ").alias("_t"))
    toks = arr.select(
        "_id", F.posexplode("_t").alias("_p0", "term")
    ).select("_id", (F.col("_p0") + 1).alias("pos"), "term")
    # guard BEFORE sequence: F.sequence(1, 0) DESCENDS (repo gotcha)
    grams = (
        arr.filter(F.size("_t") >= k)
        .select(
            "_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("_t") - (k - 1)),
                    lambda i: F.struct(
                        i.alias("start"),
                        F.concat_ws(
                            " ", F.slice("_t", i.cast("int"), k)
                        ).alias("g"),
                    ),
                )
            ).alias("_s"),
        )
        .select("_id", F.col("_s.start").alias("start"), F.col("_s.g").alias("g"))
    )
    gfreq = grams.groupBy("g").agg(
        F.countDistinct("_id").alias("_gdf"), F.min("_id").alias("_canon")
    )
    dup = (
        grams.join(gfreq, "g")
        .filter((F.col("_gdf") >= 2) & (F.col("_id") != F.col("_canon")))
        .select("_id", "start")
    )
    cov = dup.select(
        "_id",
        F.explode(F.sequence(F.col("start"), F.col("start") + (k - 1))).alias(
            "pos"
        ),
    ).distinct()
    w = Window.partitionBy("_id").orderBy("pos")
    # NULL lag (first covered pos) falls to otherwise() = 1 — the same
    # three-valued fall-through as the oracle's CASE WHEN lag = pos-1
    cov2 = cov.withColumn(
        "_new",
        F.when(F.lag("pos").over(w) == F.col("pos") - 1, F.lit(0)).otherwise(
            F.lit(1)
        ),
    )
    return (
        toks.join(cov2, ["_id", "pos"], "left")
        .groupBy("_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(
                F.when(F.col("_new").isNotNull(), 1).otherwise(0)
            ).alias("n_dup_tokens"),
            F.sum(F.coalesce(F.col("_new"), F.lit(0))).alias("n_spans"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("_new").isNull(),
                                F.struct("pos", "term"),
                            )
                        )
                    ),
                    lambda s: s["term"],
                ),
                " ",
            ).alias("clean_text"),
        )
        .select(
            F.col("_id").alias(id_col),
            "n_tokens",
            F.col("n_dup_tokens").cast("long").alias("n_dup_tokens"),
            F.col("n_spans").cast("long").alias("n_spans"),
            "clean_text",
        )
    )


def top_ngrams(
    df: DataFrame,
    k: int = 3,
    top: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus vocabulary stats: the ``top`` word-k-grams by DOCUMENT
    frequency (distinct docs containing the gram — the quantity that
    drives stop-shingle caps and contamination audits), ties broken by
    the gram itself for a deterministic page.

    Shape: shingle projection (explode_outer — see dedupe's
    _explode_shingles note) -> one count shuffle keyed on the gram
    (uniform content key) -> TakeOrderedAndProject for the global
    top-k (no full sort).  Per-doc shingles are distinct by
    construction, so count(*) IS document frequency."""
    from log_aggregation_pipeline_spark.operators.dedupe import (
        _explode_shingles,
        _shingle_df,
    )

    ex = _explode_shingles(_shingle_df(df, k, text_col, id_col))
    return (
        ex.groupBy(F.col("_s").alias("ngram"))
        .agg(F.count("*").alias("doc_freq"))
        .orderBy(F.desc("doc_freq"), F.asc("ngram"))
        .limit(top)
    )


def source_overlap(
    df: DataFrame,
    k: int = 3,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Cross-source contamination matrix: for every unordered source
    pair, how many distinct word-k-gram shingles the two sources
    share — the "is my fresh crawl recycling my old dump?" diagnostic
    that decides whether cross-source dedup is worth a pipeline stage.

    Columns: (source_a, source_b, shared_shingles, n_a, n_b,
    containment_ppm) with a < b lexicographically; ``containment_ppm``
    = shared * 10^6 div min(n_a, n_b) (integer-ratio discipline —
    containment of the smaller side, parts per million).  Pairs
    sharing zero shingles are absent (the pair-family convention).

    100 TB posture: the heavy stage is ONE distinct aggregate to
    (source, shingle) — corpus-shingle-scale shuffle, map-side
    partial; the self-join keys on the shingle where per-key
    cardinality is bounded by the SOURCE COUNT after the distinct
    (each gram appears at most once per source), so join output is
    <= |grams| x sources² with no hot keys regardless of how common a
    gram is in the raw corpus — the stop-gram skew never reaches the
    join.  The pair aggregate's cardinality is sources², driver-tiny."""
    from .dedupe import normalize_text, shingles_from_tokens

    toks = df.select(
        F.col(source_col).alias("_src"),
        F.split(normalize_text(text_col), " ").alias("_toks"),
    ).filter(F.size("_toks") >= k)
    # r8 shape: ONE aggregate to the per-shingle source-membership
    # list (collect_set dedups in the aggregate, replacing the r7
    # distinct + three independent references to the distinct
    # subtree — 8 FileScans / 10 Exchanges at sf0.1).  Per-key state
    # is bounded by the SOURCE COUNT (each gram contributes each
    # source once), so the membership list is driver-tiny no matter
    # how common the gram — the same bound the r7 self-join relied
    # on.  Pair counts and per-source totals both derive from the
    # membership table (2 evaluations of the aggregate subtree vs 4
    # of the distinct subtree before).
    members = (
        toks.select("_src", shingles_from_tokens("_toks", k).alias("_sh"))
        .select("_src", F.explode_outer("_sh").alias("_s"))
        .groupBy("_s")
        .agg(F.collect_set("_src").alias("_srcs"))
        .select("_srcs")
    )
    cnt = (
        members.select(F.explode("_srcs").alias("_src"))
        .groupBy("_src")
        .agg(F.count("*").alias("_n"))
    )
    # ordered source pairs per shingle by string comparison inside the
    # pair HOF — each unordered pair emitted once with a < b, no sort
    # needed (the ngram_jaccard_pairs pair-generation shape)
    shared = (
        members.filter(F.size("_srcs") >= 2)
        .select(
            F.explode(
                F.flatten(
                    F.transform(
                        F.col("_srcs"),
                        lambda s1: F.transform(
                            F.filter(F.col("_srcs"), lambda s2: s2 > s1),
                            lambda s2: F.struct(
                                s1.alias("source_a"), s2.alias("source_b")
                            ),
                        ),
                    )
                )
            ).alias("_p")
        )
        .groupBy(F.col("_p.source_a").alias("source_a"),
                 F.col("_p.source_b").alias("source_b"))
        .agg(F.count("*").alias("shared_shingles"))
    )
    return (
        shared.join(
            cnt.withColumnsRenamed({"_src": "source_a", "_n": "n_a"}),
            "source_a",
        )
        .join(
            cnt.withColumnsRenamed({"_src": "source_b", "_n": "n_b"}),
            "source_b",
        )
        .withColumn(
            "containment_ppm",
            F.expr("(shared_shingles * 1000000) div least(n_a, n_b)"),
        )
        .select(
            "source_a", "source_b", "shared_shingles",
            "n_a", "n_b", "containment_ppm",
        )
    )
