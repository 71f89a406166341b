"""Dedup + similarity operators: exact semantics on constructed
corpora, recall of the approximate (LSH) paths against the exact ones."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from log_aggregation_pipeline_spark.operators import dedupe as D
from log_aggregation_pipeline_spark.operators import similarity as S

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy cat"),  # near-dup of 0
    (2, "The  Quick Brown Fox jumps over the lazy dog"),  # exact dup of 0 (norm)
    (3, "completely different text about spark partitions"),
    (4, ""),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


@pytest.fixture(scope="module")
def sf_docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


@pytest.fixture(scope="module")
def sf_emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def test_exact_dedup(docs):
    groups = {r.content_hash: r for r in D.exact_dedup_groups(docs).collect()}
    dup_group = [g for g in groups.values() if g.n_copies == 2]
    assert len(dup_group) == 1 and dup_group[0].keeper == 0  # 0 and 2 normalize equal
    kept = D.exact_dedup_rows(docs).select("doc_id").toPandas()["doc_id"].tolist()
    assert sorted(kept) == [0, 1, 3, 4]  # keeps min id of the dup group


def test_ngram_jaccard_known_value(docs):
    pairs = {(r.a_id, r.b_id): r.jaccard for r in
             D.ngram_jaccard_pairs(docs, k=3, threshold=0.1).collect()}
    # docs 0/1: 7 shingles each, 6 common -> j = 6/8 = 0.75
    assert pairs[(0, 1)] == 0.75
    assert pairs[(0, 2)] == 1.0  # exact dup after normalization
    assert (0, 3) not in pairs


def test_minhash_lsh_recall_and_precision(sf_docs):
    exact = {(r.a_id, r.b_id) for r in
             D.ngram_jaccard_pairs(sf_docs, threshold=0.4).collect()}
    approx = {(r.a_id, r.b_id): r.jaccard for r in
              D.minhash_lsh_pairs(sf_docs, threshold=0.4).collect()}
    assert set(approx) <= exact                      # verified => precision 1.0
    assert len(approx) >= 0.8 * len(exact)           # LSH recall
    assert all(j >= 0.4 for j in approx.values())


def test_simhash_properties(spark, sf_docs):
    two = spark.createDataFrame(
        [(0, "alpha beta gamma delta"), (1, "ALPHA  beta GAMMA delta")],
        "doc_id long, text string",
    )
    h = {r.doc_id: r.simhash for r in D.simhash(two).collect()}
    assert h[0] == h[1]  # case/whitespace-normalized => identical signature
    pairs = D.simhash_pairs(two, max_hamming=0).collect()
    assert [(p.a_id, p.b_id, p.hamming) for p in pairs] == [(0, 1, 0)]
    # on the corpus: pair list is deterministic across invocations
    a = sorted((r.a_id, r.b_id) for r in D.simhash_pairs(sf_docs).collect())
    b = sorted((r.a_id, r.b_id) for r in D.simhash_pairs(sf_docs).collect())
    assert a == b and len(a) > 0


def _exact_hamming_pairs(sf_docs, max_hamming):
    """Ground truth: all-pairs bit_count(xor) join, no chunk pruning."""
    sh = D.simhash(sf_docs).select(F.col("doc_id").alias("_id"), "simhash")
    a, b = sh.alias("a"), sh.alias("b")
    return {
        (r.a_id, r.b_id, r.hamming)
        for r in a.join(b, F.col("a._id") < F.col("b._id"))
        .select(
            F.col("a._id").alias("a_id"),
            F.col("b._id").alias("b_id"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .collect()
    }


def test_simhash_recall_exact_within_guarantee(sf_docs):
    """Inside the pigeonhole radius (chunks-1 = 3) the chunked join is
    EXACT: recall 1.0 vs the all-pairs bit_count ground truth."""
    exact = _exact_hamming_pairs(sf_docs, 3)
    got = {(r.a_id, r.b_id, r.hamming)
           for r in D.simhash_pairs(sf_docs, max_hamming=3).collect()}
    assert got == exact and len(exact) > 0


def test_simhash_partial_recall_beyond_guarantee(sf_docs):
    """Beyond the radius the default RAISES (no silent under-recall);
    opting in measures honest best-effort recall on this corpus."""
    with pytest.raises(ValueError, match="pigeonhole"):
        D.simhash_pairs(sf_docs, max_hamming=8)
    exact = _exact_hamming_pairs(sf_docs, 8)
    got = {(r.a_id, r.b_id, r.hamming)
           for r in D.simhash_pairs(
               sf_docs, max_hamming=8, allow_partial_recall=True).collect()}
    assert got <= exact  # precision stays 1.0 (verified filter)
    assert got >= {t for t in exact if t[2] <= 3}  # guarantee still holds
    recall = len(got) / len(exact)
    # measured on sf0.001: 0.44 — best-effort recall beyond the radius
    # genuinely loses most of the hamming-4..8 band on this corpus,
    # which is exactly why the default RAISES instead of silently
    # under-recalling.  Pin the measured band (hash is deterministic
    # for a fixed pandas major; loose edges absorb a major bump).
    assert 0.3 <= recall <= 0.7, recall


def test_minhash_oracle_precondition_jaccard_floor(spark):
    """The driver oracles for doc_minhash_lsh_pairs AND the funnel LSH
    forms (corpus_prep_funnel_neardup(pairs="lsh"), ADVICE r6 #2) are
    exact-set equality, sound only because the checked corpus's
    qualifying pairs sit at jaccard >= 0.8, where the 64x16-band LSH
    per-pair miss probability is ~2e-4.  At the 0.4 threshold itself
    the miss probability would be ~66% and the gates would flip
    probabilistically — so assert the data precondition on the corpus
    the driver checks, for BOTH pair domains: the full doc set (the
    doc_minhash query) and the exact-dedup keepers (the funnel's pair
    stage runs over keepers).  If the corpus generator ever changes,
    THIS named test flips instead of the funnel oracle."""
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    rows = D.ngram_jaccard_pairs(
        docs, threshold=0.4, max_shingle_freq=None
    ).collect()
    assert rows and min(r.jaccard for r in rows) >= 0.8
    keepers = D.exact_dedup_rows(docs)
    krows = D.ngram_jaccard_pairs(
        keepers, threshold=0.4, max_shingle_freq=None
    ).collect()
    assert krows and min(r.jaccard for r in krows) >= 0.8


def test_embedding_near_dup_matches_bruteforce(sf_emb):
    pairs = D.embedding_near_dup_pairs(sf_emb, threshold=0.3)
    rows = pairs.collect()
    assert all(r.cosine >= 0.3 and r.a_id < r.b_id for r in rows)
    n = sf_emb.count()
    assert 0 < len(rows) < n * (n - 1) / 2


def test_blocked_near_dup_equals_plain(sf_emb):
    """The blocked equi-join variant (the driver-wired plan) must be
    bit-identical to the all-pairs scan, including block-boundary
    pairs, at several block counts."""
    plain = sorted(
        (r.a_id, r.b_id, r.cosine)
        for r in D.embedding_near_dup_pairs(sf_emb, threshold=0.3).collect()
    )
    for nb in (1, 3, 8, None):  # None = the adaptive driver default
        blocked = sorted(
            (r.a_id, r.b_id, r.cosine)
            for r in D.embedding_near_dup_pairs_blocked(
                sf_emb, threshold=0.3, n_blocks=nb
            ).collect()
        )
        assert blocked == plain, f"n_blocks={nb}"


def test_adaptive_n_blocks_policy():
    """Task-sizing policy: block counts grow with n so per-task score
    work stays bounded at target_scores_per_task (the round-2 static
    n_blocks=8 capped parallelism at 36 tasks of O((n/8)²) work)."""
    target = 20_000_000
    ns = [10**3, 10**4, 10**5, 10**6, 10**7, 10**8]
    nbs = [D.adaptive_n_blocks(n, target) for n in ns]
    assert nbs == sorted(nbs) and nbs[-1] > nbs[0]  # grows with n
    for n, nb in zip(ns, nbs):
        if nb > 8:  # above the small-n parallelism floor
            assert (n / nb) ** 2 <= target * 1.05, (n, nb)
    assert D.adaptive_n_blocks(10**8, target) >= 20_000  # ~n/sqrt(target)


def test_minhash_driver_config_equals_exact(sf_docs):
    """The driver contract wires 64 hashes x 16 bands and claims the
    output equals the exact Jaccard pair set — pin that here."""
    exact = sorted(
        (r.a_id, r.b_id, r.jaccard)
        for r in D.ngram_jaccard_pairs(sf_docs, threshold=0.4, max_shingle_freq=None)
        .select("a_id", "b_id", "jaccard")
        .collect()
    )
    lsh = sorted(
        (r.a_id, r.b_id, r.jaccard)
        for r in D.minhash_lsh_pairs(
            sf_docs, num_hashes=64, bands=16, threshold=0.4
        ).collect()
    )
    assert lsh == exact


def test_shingle_cap_semantics_and_stats(spark):
    """With the frequency cap binding, capped-shingle matches drop out
    of n_common and the stats helper reports exactly what was cut."""
    rows = [
        (0, "x y z a b c"),
        (1, "x y z d e f"),
        (2, "x y z g h i"),  # 'x y z' occurs in 3 docs
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = {(r.a_id, r.b_id) for r in
                D.ngram_jaccard_pairs(df, threshold=0.1, max_shingle_freq=None).collect()}
    assert uncapped == {(0, 1), (0, 2), (1, 2)}  # share 'x y z'
    capped = D.ngram_jaccard_pairs(df, threshold=0.1, max_shingle_freq=2).collect()
    assert capped == []  # the only common shingle is over-cap
    n_sh, n_inst = D.dropped_shingle_stats(df, max_shingle_freq=2)
    assert (n_sh, n_inst) == (1, 3)


def test_topk_brute_vs_blas(sf_emb):
    q = [float(x) for x in sf_emb.filter("vec_id = 0").first()["embedding"]]
    a = [(r.vec_id, r.cosine) for r in S.brute_topk(sf_emb, q, 10).collect()]
    b = [(r.vec_id, r.cosine) for r in S.topk_mapinpandas(sf_emb, q, 10).collect()]
    assert a == b
    assert a[0] == (0, 1.0)  # the query vector itself


def test_lsh_topk_subset_semantics(sf_emb):
    q = [float(x) for x in sf_emb.filter("vec_id = 0").first()["embedding"]]
    brute = {r.vec_id: r.cosine for r in S.brute_topk(sf_emb, q, 50).collect()}
    lsh = S.lsh_topk(sf_emb, q, 10, bits=8, probe_radius=2).collect()
    assert lsh[0].vec_id == 0  # own bucket always probed
    for r in lsh:  # scores must agree with the exact scorer
        if r.vec_id in brute:
            assert abs(r.cosine - brute[r.vec_id]) < 1e-9


def test_ivf_topk(sf_emb):
    q = [float(x) for x in sf_emb.filter("vec_id = 0").first()["embedding"]]
    cent = S.train_ivf_centroids(sf_emb, n_centroids=8)
    assert cent.shape[1] == 64
    # cluster assignment is total and deterministic
    a = S.ivf_assign(sf_emb, cent).groupBy("cluster").count().orderBy("cluster")
    b = S.ivf_assign(sf_emb, cent).groupBy("cluster").count().orderBy("cluster")
    assert a.collect() == b.collect()
    assert S.ivf_assign(sf_emb, cent).count() == sf_emb.count()

    brute = {r.vec_id: r.cosine for r in S.brute_topk(sf_emb, q, 10).collect()}
    ivf = S.ivf_topk(sf_emb, q, cent, k=10, nprobe=4).collect()
    assert ivf[0].vec_id == 0  # the query vector's own cluster is probed first
    for r in ivf:  # exact within probed clusters
        if r.vec_id in brute:
            assert abs(r.cosine - brute[r.vec_id]) < 1e-9
    # probing everything = exact brute force
    full = S.ivf_topk(sf_emb, q, cent, k=10, nprobe=8).collect()
    assert [(r.vec_id, r.cosine) for r in full] == sorted(
        brute.items(), key=lambda kv: (-kv[1], kv[0])
    )


def test_ivf_at_ingest_equals_per_query_assignment(spark, sf_emb, tmp_path):
    """ivf_write + ivf_topk_pruned (assignment at ingest, partition-
    pruned scan) must return exactly what ivf_topk (assignment per
    query) returns."""
    q = [float(x) for x in sf_emb.filter("vec_id = 0").first()["embedding"]]
    cent = S.train_ivf_centroids(sf_emb, n_centroids=8)
    path = str(tmp_path / "emb_ivf")
    S.ivf_write(sf_emb, cent, path)
    a = [(r.vec_id, r.cosine) for r in
         S.ivf_topk(sf_emb, q, cent, k=10, nprobe=4).collect()]
    b = [(r.vec_id, r.cosine) for r in
         S.ivf_topk_pruned(spark, path, q, cent, k=10, nprobe=4).collect()]
    assert a == b
    # the layout really is one directory per cluster
    import os

    dirs = [d for d in os.listdir(path) if d.startswith("cluster=")]
    assert len(dirs) == len({r.cluster for r in
                             S.ivf_assign(sf_emb, cent).select("cluster").distinct().collect()})


def test_bucket_count_bounded(sf_emb):
    b = S.random_hyperplane_buckets(sf_emb, bits=8)
    assert b.select("bucket").distinct().count() <= 256
    # deterministic across calls (seeded hyperplanes)
    x = b.groupBy("bucket").count().orderBy("bucket").collect()
    y = S.random_hyperplane_buckets(sf_emb, bits=8).groupBy("bucket").count().orderBy("bucket").collect()
    assert x == y


def test_rp_project_preserves_distances_loosely(spark, sf_emb):
    """JL sanity on real vectors: squared distances in the projected
    space track the originals in aggregate (loose 2x band — out_dim=8
    is aggressive; the point is catching a broken projection, scale
    bug, or non-determinism, not proving JL)."""
    import numpy as np

    pdf = sf_emb.limit(40).toPandas()
    proj = {r.vec_id: [r[f"rp_{j}"] for j in range(8)]
            for r in S.rp_project(sf_emb.limit(40)).collect()}
    orig = {v: np.array(e, dtype=float) for v, e in
            zip(pdf.vec_id, pdf.embedding)}
    ratios = []
    ids = sorted(orig)
    for i in range(0, len(ids) - 1, 2):
        a, b = ids[i], ids[i + 1]
        d_o = float(np.sum((orig[a] - orig[b]) ** 2))
        d_p = float(np.sum((np.array(proj[a]) - np.array(proj[b])) ** 2))
        if d_o > 0:
            ratios.append(d_p / d_o)
    mean_ratio = sum(ratios) / len(ratios)
    assert 0.5 < mean_ratio < 2.0


def test_rp_project_deterministic_and_shuffle_free(spark, sf_emb):
    from tests.test_plans import plan_of

    a = S.rp_project(sf_emb).collect()
    b = S.rp_project(sf_emb).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert "Exchange" not in plan_of(S.rp_project(sf_emb))


def test_incremental_exact_new(spark):
    """New-batch-vs-corpus exact dedup: a new doc whose normalized
    content the corpus already holds is dropped by the anti-join; an
    in-batch duplicate pair keeps only its lowest id; genuinely new
    content survives with its content_hash attached."""
    seen = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "delta epsilon zeta")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (10, "Alpha  Beta gamma"),   # normalizes equal to seen 0 -> drop
            (11, "brand new content"),
            (12, "brand  NEW content"),  # in-batch dup of 11 -> window drop
            (13, "another fresh doc"),
        ],
        "doc_id long, text string",
    )
    out = D.incremental_exact_new(new, seen).collect()
    assert sorted(r.doc_id for r in out) == [11, 13]
    assert all(r.content_hash for r in out)
    # precomputed-hash-table form of the seen side is equivalent
    out2 = D.incremental_exact_new(new, D.seen_content_hashes(seen)).collect()
    assert sorted(r.doc_id for r in out2) == [11, 13]


def test_incremental_minhash_cross_equals_exact_cross(sf_docs):
    """The incremental banded form finds exactly the cross-side subset
    of the full corpus's near-dup pairs: pairs(new <-> seen) ==
    full-corpus pairs with one endpoint on each side, and never a
    within-side pair."""
    split = 25
    seen = sf_docs.filter(F.col("doc_id") < split)
    new = sf_docs.filter(F.col("doc_id") >= split)
    got = {
        (r.seen_id, r.new_id): r.jaccard
        for r in D.minhash_lsh_pairs_cross(
            new, seen, num_hashes=64, bands=16, threshold=0.4
        ).collect()
    }
    full = {
        (r.a_id, r.b_id): r.jaccard
        for r in D.minhash_lsh_pairs(
            sf_docs, num_hashes=64, bands=16, threshold=0.4
        ).collect()
    }
    expected = {}
    for (a, b), j in full.items():
        lo, hi = (a, b) if a < b else (b, a)
        if lo < split <= hi:
            expected[(lo, hi)] = j
    assert got == expected
    assert all(s < split <= n for s, n in got)


def test_semdedup_pairs_is_cluster_scoped_exact(sf_emb):
    """SemDeDup = the exact pair scan restricted to same-cluster pairs
    (the approximation IS the cluster scoping): every emitted pair is
    an exact near-dup pair with both ends assigned to the emitted
    cluster, cosines bit-match the exact scan, and the pair set equals
    the exact set minus cross-cluster pairs."""
    cent = S.train_ivf_centroids(sf_emb, n_centroids=8)
    sem = {(r.a_id, r.b_id): (r.cluster, r.cosine)
           for r in D.semdedup_pairs(sf_emb, cent, threshold=0.3).collect()}
    exact = {(r.a_id, r.b_id): r.cosine
             for r in D.embedding_near_dup_pairs(
                 sf_emb, threshold=0.3).collect()}
    assert set(sem) <= set(exact)
    assert all(cos == exact[p] for p, (_, cos) in sem.items())
    # independent assignment: numpy argmax over the same centroids
    import numpy as np
    import pandas as pd

    pdf = sf_emb.toPandas()
    m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    assign = dict(zip(pdf["vec_id"], (m @ cent.T).argmax(axis=1)))
    same_cluster = {p for p in exact if assign[p[0]] == assign[p[1]]}
    assert set(sem) == same_cluster
    assert all(assign[a] == c == assign[b] for (a, b), (c, _) in sem.items())
    # the scoping must actually bite on this corpus (cross-cluster
    # pairs exist), else the test proves nothing
    assert len(sem) < len(exact)


def test_semdedup_keep_rule(sf_emb):
    """The paper's election: exactly one keeper per duplicate group,
    and it is the member with the LOWEST centroid cosine (ties min
    id); membership = the nodes of the pair graph; group_rep is the
    component-min id; sizes agree with the actual member count."""
    cent = S.train_ivf_centroids(sf_emb, n_centroids=8)
    pairs = D.semdedup_pairs(sf_emb, cent, threshold=0.3).collect()
    rows = D.semdedup_keep(sf_emb, cent, threshold=0.3).collect()
    assert {r.vec_id for r in rows} == (
        {p.a_id for p in pairs} | {p.b_id for p in pairs}
    )
    by_group: dict[int, list] = {}
    for r in rows:
        by_group.setdefault(r.group_rep, []).append(r)
    for g, ms in by_group.items():
        assert all(m.group_size == len(ms) for m in ms)
        assert g == min(m.vec_id for m in ms)
        keeps = [m for m in ms if m.keep]
        assert len(keeps) == 1
        assert (keeps[0].centroid_cos, keeps[0].vec_id) == min(
            (m.centroid_cos, m.vec_id) for m in ms
        )
    # the election must be live (some group has >1 member)
    assert any(len(ms) > 1 for ms in by_group.values())


def test_minhash_lsh_pairs_caller_owned_cache(sf_docs):
    """ADVICE r6 #1: minhash_lsh_pairs persists its shingle frame
    (consumed by the signature AND verify legs) and must expose the
    handle as result.lap_persisted — mirroring _cross — so rep-loop
    callers can free the blocks instead of accumulating them until
    session end."""
    pairs = D.minhash_lsh_pairs(sf_docs, num_hashes=64, bands=16, threshold=0.4)
    pairs.count()  # materialize (the persists fill here)
    # r8: the band table joins against itself, so it is persisted too
    # (a second handle) — the caller frees BOTH through the same
    # surface
    assert len(pairs.lap_persisted) == 2
    for f in pairs.lap_persisted:
        assert f.storageLevel.useMemory  # persisted while in use
        f.unpersist()
        assert not f.storageLevel.useMemory  # freed by the caller


def test_semdedup_assignment_near_tie_order_equivalence(spark):
    """ADVICE r6 #4: semdedup cluster assignment argmaxes UNROUNDED
    centroid dot products on both engines, so the oracle twin is sound
    only if Spark's zip_with+aggregate fold and DuckDB's
    list_dot_product accumulate in the identical (left-to-right)
    order.  Pin that measured equivalence on adversarial data where
    the argmax is decided entirely by the last ulp:

    - v=[1,1,1,1] vs c0=[.1,.2,.3,.4] / c1=[.4,.3,.2,.1]: the TRUE
      dots are equal, but sequential IEEE accumulation yields 1.0 vs
      0.9999999999999999 — a 1-ulp separation that flips with any
      reordering;
    - exact ties (bit-identical dots) must resolve first-max on BOTH
      sides (array_position/array_max == list_position/list_max);
    - the mirrored centroid order flips the ulp case to cluster 1.

    If either engine ever changes its accumulation or tie-break, THIS
    test flips instead of the emb_semdedup_* driver oracles."""
    import duckdb
    import pandas as pd

    vecs = [
        (0, [1.0, 1.0, 1.0, 1.0]),  # 1-ulp separation -> cluster 0
        (1, [1.0, 0.0, 0.0, 1.0]),  # exact tie -> first max (0)
        (2, [0.0, 1.0, 1.0, 0.0]),  # exact tie -> first max (0)
        (3, [3.0, 1.0, 1.0, 3.0]),  # exact tie at larger magnitude
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    con = duckdb.connect()
    con.register("emb_tie", pd.DataFrame(
        {"vec_id": [v[0] for v in vecs], "embedding": [v[1] for v in vecs]}
    ))
    for cents, expect in (
        ([[0.1, 0.2, 0.3, 0.4], [0.4, 0.3, 0.2, 0.1]], {0: 0, 1: 0, 2: 0, 3: 0}),
        ([[0.4, 0.3, 0.2, 0.1], [0.1, 0.2, 0.3, 0.4]], {0: 1, 1: 0, 2: 0, 3: 0}),
    ):
        got_spark = {
            r._id: r.cluster
            for r in D._semdedup_base(df, cents, "embedding", "vec_id")
            .select("_id", "cluster").collect()
        }
        dots = ", ".join(
            "list_dot_product(v, [" + ", ".join(repr(x) for x in c) + "])"
            for c in cents
        )
        got_duck = {
            int(r[0]): int(r[1])
            for r in con.sql(
                "SELECT vec_id, list_position(dl, list_max(dl)) - 1 "
                "FROM (SELECT vec_id, embedding::DOUBLE[] AS v, "
                f"[{dots}] AS dl FROM emb_tie)"
            ).fetchall()
        }
        assert got_spark == expect, (cents, got_spark)
        assert got_duck == expect, (cents, got_duck)
