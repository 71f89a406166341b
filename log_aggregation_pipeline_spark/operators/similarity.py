"""Similarity search over embedding columns (array<float>).

Two paths, one semantics:

- ``brute_topk`` — exact cosine top-k via pure expressions
  (``zip_with`` + ``aggregate``), planned as scan -> project ->
  TakeOrderedAndProject: fully distributed, no shuffle beyond top-k
  merge.  The correctness baseline.
- ``topk_mapinpandas`` — same computation as one numpy matrix-vector
  product per Arrow batch (BLAS): the throughput path.
- ``random_hyperplane_buckets`` / ``lsh_topk`` — sign-LSH: b seeded
  hyperplanes -> b-bit bucket; probe the query's bucket plus all
  Hamming<=probe_radius neighbors.  The 100 TB path: candidates
  shrink ~2^b-fold; recall is tested against brute force.

Determinism: hyperplanes derive from a fixed numpy seed; no
wall-clock, no unseeded randomness (SURVEY.md §7).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def double_array_lit(values) -> Column:
    """A literal ``array<double>`` built in ONE py4j call.

    ``F.array(*[F.lit(float(x)).cast("double") for x in v])`` costs
    2+ JVM round-trips PER ELEMENT — measured (r8) 47 ms vs 3 ms for a
    64-dim vector, and the literal-heavy embedding queries (20x64
    eval vectors, 8x64 centroid arrays) spent 2-4 s per plan BUILD in
    that chatter.  A single ``F.expr("array(<v>D, ...)")`` parses
    JVM-side; the ``D`` suffix makes each element a DoubleType
    literal, and ``repr(float)`` round-trips every finite double
    exactly (both sides parse correctly-rounded — bit-equality
    verified incl. -0.0/denormals/17-digit values), so the folded
    plan is bit-identical to the per-element form.  Non-finite
    values fall back to the per-element path (repr('inf') is not
    valid SQL)."""
    import math

    vals = [float(x) for x in values]
    if not all(map(math.isfinite, vals)):
        return F.array(*[F.lit(v).cast("double") for v in vals])
    return F.expr("array(" + ",".join(repr(v) + "D" for v in vals) + ")")


def int_array_lit(values) -> Column:
    """Literal ``array<int>`` in one py4j call (``double_array_lit``
    rationale; int literals in Spark SQL are IntegerType when they
    fit, matching the per-element ``F.lit(int)`` form)."""
    vals = [int(x) for x in values]
    assert all(-(2**31) <= v < 2**31 for v in vals)
    return F.expr("array(" + ",".join(str(v) for v in vals) + ")")


def dot_expr(a: Column | str, b: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


# NOTE (measured, round 2): unrolling the dot into 128 element_at
# terms for a known dim is 2.3x SLOWER than the zip_with+aggregate
# fold — the generated method blows past JIT inlining limits and runs
# interpreted.  The HOF fold is the fast JVM form; keep it.


def norm_expr(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, x: acc + x * x)
    )


def cosine_expr(a: Column | str, b: Column | str) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def brute_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k against a literal query vector.

    The query vector is a Catalyst literal array — broadcast for free
    with the plan, no Python in the score path.  orderBy+limit plans
    as TakeOrderedAndProject (per-partition heap + driver merge)."""
    q = double_array_lit(query_vec)
    scored = df.select(
        F.col(id_col),
        F.round(cosine_expr(F.col(vec_col).cast("array<double>"), q), 6).alias(
            "cosine"
        ),
    )
    return scored.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)


def topk_mapinpandas(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Same result as brute_topk, scored as one BLAS gemv per Arrow
    batch — the per-row expression tree becomes a single
    ``M @ q / (|M| |q|)``.  Per-partition top-k then global top-k."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = np.linalg.norm(q)
    schema = T.StructType(
        [T.StructField(id_col, T.LongType()), T.StructField("cosine", T.DoubleType())]
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            sims = (m @ q) / (np.linalg.norm(m, axis=1) * qn)
            out = pd.DataFrame({id_col: pdf[id_col], "cosine": np.round(sims, 6)})
            yield out.nlargest(k, "cosine")  # per-batch prune

    scored = df.select(id_col, vec_col).mapInPandas(score, schema)
    return scored.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)


# ---------------------------------------------------------------------------
# sign-LSH bucketing
# ---------------------------------------------------------------------------
def _hyperplanes(dim: int, bits: int, seed: int = 13) -> np.ndarray:
    return np.random.default_rng(seed).standard_normal((bits, dim))


def bucket_expr(vec_col: str, planes: np.ndarray) -> Column:
    """b-bit sign bucket as pure expressions: bit i = (v . h_i) > 0."""
    bits = []
    for i, h in enumerate(planes):
        lit_h = double_array_lit(h)
        bits.append(
            F.when(dot_expr(F.col(vec_col).cast("array<double>"), lit_h) > 0, 1)
            .otherwise(0)
            .cast("long")
            * F.lit(1 << i).cast("long")
        )
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def random_hyperplane_buckets(
    df: DataFrame,
    bits: int = 8,
    vec_col: str = "embedding",
    seed: int = 13,
    dim: int | None = None,
) -> DataFrame:
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    return df.withColumn("bucket", bucket_expr(vec_col, _hyperplanes(dim, bits, seed)))


def _kmeans_unit(x: np.ndarray, n_centroids: int, iters: int, seed: int) -> np.ndarray:
    """Spherical k-means on unit rows — seeded init, fixed iterations,
    fully deterministic for a given sample."""
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)]
    for _ in range(iters):
        assign = (x @ cent.T).argmax(axis=1)
        for c in range(len(cent)):
            members = x[assign == c]
            if len(members):
                v = members.mean(axis=0)
                cent[c] = v / (np.linalg.norm(v) or 1.0)
    return cent


def train_ivf_centroids_from_pandas(
    pdf,
    n_centroids: int = 16,
    sample_size: int = 2048,
    iters: int = 8,
    seed: int = 29,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """Centroids from an in-memory frame — the shared core, so the
    DuckDB oracle (which reads the same parquet with pandas) derives
    byte-identical centroids to the Spark path."""
    pdf = pdf.sort_values(id_col).head(sample_size)
    x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
    x = x / np.linalg.norm(x, axis=1, keepdims=True)
    return _kmeans_unit(x, n_centroids, iters, seed)


def train_ivf_centroids(
    df: DataFrame,
    n_centroids: int = 16,
    sample_size: int = 2048,
    iters: int = 8,
    seed: int = 29,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """IVF coarse quantizer: k-means on a deterministic driver-side
    sample (lowest ids — seeded numpy init, fixed iterations).  At
    corpus scale the sample is a LIMIT over any partition; the k-means
    itself is O(sample x k x iters) on the driver — never distributed
    work."""
    pdf = (
        df.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(sample_size)
        .toPandas()
    )
    return train_ivf_centroids_from_pandas(
        pdf, n_centroids, sample_size, iters, seed, vec_col, id_col
    )


def ivf_assign(
    df: DataFrame, centroids: np.ndarray, vec_col: str = "embedding"
) -> DataFrame:
    """Attach the nearest-centroid cluster id — one numpy argmax gemm
    per Arrow batch.  At scale this runs once at ingest and the table
    is written partitioned/bucketed by cluster, so queries scan only
    probed clusters (partition pruning does the candidate cut)."""
    cent = centroids  # closure; broadcast with the serialized task

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            m = m / np.linalg.norm(m, axis=1, keepdims=True)
            pdf = pdf.copy()
            pdf["cluster"] = (m @ cent.T).argmax(axis=1).astype(np.int32)
            yield pdf

    # fresh StructType — StructType.add mutates in place, corrupting
    # the source df's cached Python-side schema
    schema = T.StructType(
        list(df.schema.fields) + [T.StructField("cluster", T.IntegerType())]
    )
    return df.mapInPandas(assign, schema)


def ivf_probes(
    query_vec: list[float], centroids: np.ndarray, nprobe: int
) -> list[int]:
    """The ``nprobe`` clusters nearest the query, best first."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / np.linalg.norm(q)
    return [int(p) for p in np.argsort(-(centroids @ qn))[:nprobe]]


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    centroids: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF search: score only the ``nprobe`` clusters nearest the
    query.  Recall follows nprobe/n_centroids; exact within probed
    clusters (scores match brute_topk)."""
    probes = ivf_probes(query_vec, centroids, nprobe)
    cand = ivf_assign(df, centroids, vec_col).filter(
        F.col("cluster").isin(*probes)
    )
    return brute_topk(cand, query_vec, k, vec_col, id_col)


def write_bucketed_by_cluster(
    df: DataFrame, path: str, n_buckets: int = 8
) -> DataFrame:
    """Write ``df`` (which must carry a ``cluster`` column) as an
    external parquet table BUCKETED and sorted by cluster, and return
    the read-back frame.  A bucketed scan reports
    ``HashPartitioning(cluster, n_buckets)`` to the planner, so a
    downstream self-equi-join on cluster needs NO Exchange on either
    side — plain ``partitionBy(cluster)`` parquet gives partition
    PRUNING but does not co-locate a join (the r6 gotcha; the
    no-Exchange property is pinned in tests/test_plans.py).  External
    table: data lives under ``path``, only metadata enters the session
    catalog, under a name derived from the path so materializations to
    different dirs coexist.

    Catalog lifetime (ADVICE r7): the table entry outlives the
    returned frame — a caller that deletes ``path`` afterwards (bench
    rep loops with mkdtemp scratch dirs) leaves a dangling catalog
    entry until session end; ``spark.sql(f"DROP TABLE IF EXISTS
    {name}")`` with the path-derived name clears it once the frame is
    no longer needed.  Repeated writes to the SAME path reuse the one
    entry (mode overwrite), so long-lived fixed-path callers do not
    accumulate."""
    import hashlib

    spark = df.sparkSession
    name = "lap_bucketed_" + hashlib.md5(path.encode()).hexdigest()[:12]
    (
        df.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, "cluster")
        .sortBy("cluster")
        .saveAsTable(name)
    )
    return spark.table(name)


def ivf_write(
    df: DataFrame,
    centroids: np.ndarray,
    path: str,
    vec_col: str = "embedding",
    bucket_by: int | None = None,
) -> DataFrame | None:
    """IVF-at-ingest: assign once, write the table PARTITIONED BY
    cluster.  Queries then prune to the probed partitions at the scan
    (PartitionFilters — pinned by tests/test_plans.py), so a probe of
    nprobe/n_centroids clusters reads ~that fraction of the bytes.

    ``bucket_by=n`` writes ``bucketBy(n, "cluster")`` instead (via
    ``write_bucketed_by_cluster``) and returns the read-back frame:
    the form for workloads that SELF-JOIN on the cluster id (SemDeDup
    pair stages, per-cluster passes) — pruning alone leaves a full
    exchange on every read-back join, bucketing removes it.  The
    default partitioned form remains the right call for probe-style
    point reads (partition pruning cuts bytes; buckets do not)."""
    assigned = ivf_assign(df, centroids, vec_col)
    if bucket_by is not None:
        return write_bucketed_by_cluster(assigned, path, n_buckets=bucket_by)
    assigned.write.mode("overwrite").partitionBy("cluster").parquet(path)
    return None


def ivf_topk_pruned(
    spark,
    path: str,
    query_vec: list[float],
    centroids: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Query side of IVF-at-ingest: scan only the probed cluster
    partitions of a table written by ``ivf_write``.  Same results as
    ``ivf_topk`` (assignment happened at ingest instead of per query)."""
    probes = ivf_probes(query_vec, centroids, nprobe)
    cand = spark.read.parquet(path).filter(F.col("cluster").isin(*probes))
    return brute_topk(cand, query_vec, k, vec_col, id_col)


def lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    bits: int = 8,
    probe_radius: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 13,
) -> DataFrame:
    """Approximate top-k: score only vectors whose bucket is within
    ``probe_radius`` bit flips of the query's bucket.  With bits=8 and
    radius=1 that's 9/256 of the corpus on uniform buckets."""
    planes = _hyperplanes(len(query_vec), bits, seed)
    qbits = (planes @ np.asarray(query_vec, dtype=np.float64)) > 0
    qbucket = int(sum(1 << i for i, b in enumerate(qbits) if b))
    probes = {qbucket}
    if probe_radius >= 1:
        probes |= {qbucket ^ (1 << i) for i in range(bits)}
    if probe_radius >= 2:
        probes |= {
            qbucket ^ (1 << i) ^ (1 << j)
            for i in range(bits)
            for j in range(i + 1, bits)
        }
    bucketed = df.withColumn("bucket", bucket_expr(vec_col, planes))
    cand = bucketed.filter(F.col("bucket").isin(*sorted(probes)))
    return brute_topk(cand, query_vec, k, vec_col, id_col)


def rp_project(
    df: DataFrame,
    in_dim: int = 64,
    out_dim: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 13,
) -> DataFrame:
    """Johnson-Lindenstrauss random projection: embed ``in_dim``
    vectors into ``out_dim`` via deterministic Gaussian directions
    (the same seeded ``_hyperplanes`` the sign-LSH uses), scaled
    1/sqrt(out_dim) so expected pairwise distances are preserved.

    The cheap first stage of every embedding pipeline at scale —
    shrink 100 TB of float vectors before clustering/ANN.  Pure
    per-row zip_with+aggregate folds (one per output dim), so the
    projection rides the scan: no shuffle, no UDF, whole-stage
    codegen.  Output dims are rounded to 6dp — the repo's float-oracle
    rule; the fold and DuckDB's list_dot_product sum left-to-right
    identically (proven by the green emb/ANN oracles).

    Output columns: id, rp_0 .. rp_{out_dim-1} (double).
    """
    import math

    planes = _hyperplanes(in_dim, out_dim, seed)
    v = F.col(vec_col).cast("array<double>")
    scale = 1.0 / math.sqrt(out_dim)
    cols = [
        # + 0.0 normalizes IEEE signed zero: a coordinate that rounds
        # to zero from below is -0.0 in one engine and 0.0 in the
        # other (hit at sf0.1, vec 585), and the value-hash compare
        # distinguishes them; adding +0.0 is exact for every double
        # and maps -0.0 -> 0.0 on BOTH sides (twin does the same)
        (F.round(
            dot_expr(v, double_array_lit(h)) * scale, 6
        ) + F.lit(0.0)).alias(f"rp_{j}")
        for j, h in enumerate(planes)
    ]
    return df.select(F.col(id_col), *cols)
