"""Driver-contract registration invariants.

The driver hash-checks only the FIRST ``DRIVER_WINDOW`` entries of
``queries()`` per round, so registration ORDER is part of the
correctness surface: a query pushed past the window silently loses its
driver evidence (this bit round 3 — 13 queries including a brand-new
operator went unverified).  These tests pin the rotation policy.
"""

from __future__ import annotations

import __spark_entry__ as E

# the 13 entries CORRECTNESS_r03 did NOT verify (positions 51-63 in
# the round-3 registration order) plus every operator new in round 4 —
# all of these MUST sit inside the driver window this round
MUST_BE_IN_WINDOW = [
    # round-3 unverified tail
    "doc_lang_id",
    "doc_lm_score",
    "doc_fingerprint",
    "emb_near_dup_pairs",
    "ann_cosine_topk",
    "ann_cosine_topk_blas",
    "doc_minhash_lsh_pairs",
    "doc_simhash_pairs",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "ann_ivf_topk_ingest",
    "bloom_point_lookup",
    "media_decode_features",
    # new in round 4
    "doc_cluster_keepers",
    "doc_gopher_quality",
    "corpus_prep_funnel_neardup",
    "doc_markup_strip",
    "emb_dup_clusters",
    "dataset_card",
]


def test_unverified_and_new_queries_inside_driver_window():
    window = list(E.queries())[: E.DRIVER_WINDOW]
    missing = [k for k in MUST_BE_IN_WINDOW if k not in window]
    assert not missing, f"outside the driver window: {missing}"


def test_rotated_out_entries_still_registered():
    # rotation defers a query's driver row; it must never drop the
    # query (or its oracle) from the contract, and the tail must be
    # exactly entries the driver verified last round (max staleness
    # one round by induction)
    q = E.queries()
    o = E.oracle_sql()
    done = E._verified_last_round()
    assert done, "driver correctness files missing from the repo"
    tail = list(q)[E.DRIVER_WINDOW:]
    for k in tail:
        assert k in done and k in o


def test_rotation_without_correctness_files(tmp_path, monkeypatch):
    # fresh-clone behavior: no CORRECTNESS files -> build order intact
    import log_aggregation_pipeline_spark  # noqa: F401 — imported for path

    monkeypatch.setattr(E, "_verified_last_round", lambda: set())
    assert list(E.queries())  # no raise; deterministic order


def test_query_and_oracle_keys_in_sync():
    q = set(E.queries())
    o = set(E.oracle_sql())
    # every oracle has a query; queries without an oracle are the
    # documented rows-only set (data-derived oracles degrade lazily)
    assert o <= q
    rows_only_ok = {"ann_ivf_topk", "ann_ivf_topk_ingest", "doc_simhash_pairs"}
    assert q - o <= rows_only_ok
