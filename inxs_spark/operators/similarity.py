"""Similarity search over an embedding column (array<float>).

- ``cosine_topk`` — brute-force cosine top-k against a query vector,
  entirely JVM-side (zip_with + aggregate; whole-stage codegen). The
  correctness baseline: one scan, one narrow top-k (TakeOrdered), no
  shuffle of the embedding column.
- ``hyperplane_lsh_buckets`` / ``ann_topk`` — the scale path: random-
  hyperplane LSH (sign bits of H dot products → bucket key). At 100 TB
  you pre-bucket once (one shuffle, or bucketed table layout), then a
  query probes its own bucket + hamming-1 neighbors instead of scanning
  everything. Planes are seeded numpy → deterministic.
- ``pairwise_ann_candidates`` — all-pairs near-neighbor candidates via
  shared bucket, for embedding-cosine near-dup detection.
"""

from __future__ import annotations

import logging
import math
from typing import Optional, Sequence

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F

logger = logging.getLogger(__name__)


def derive_n_planes(n_rows: int, target_bucket: int = 32,
                    lo: int = 4, hi: int = 24) -> int:
    """Plane count from corpus size: 2^p buckets sized ~target_bucket
    (p = ceil(log2(n / target_bucket)), clamped to [lo, hi]). Round 1
    hardcoded 6 planes = 64 buckets, which stops pruning anything
    beyond ~2k vectors; at 100 TB the bucket count must grow with the
    corpus or within-bucket work is quadratic in n."""
    if n_rows <= target_bucket:
        planes = lo
    else:
        planes = math.ceil(math.log2(n_rows / target_bucket))
    return min(max(planes, lo), hi)


def _lit_vec(vec: Sequence[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in vec])


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id: Optional[int] = None,
) -> DataFrame:
    """Brute-force cosine top-k. The plan is scan → project → TakeOrdered
    (no full sort, no shuffle of embeddings)."""
    import math

    q = _lit_vec(query_vec)
    # query norm folded driver-side — visible in .explain as a literal
    # instead of a per-row aggregate over the literal array
    qnorm = math.sqrt(sum(float(x) * float(x) for x in query_vec))
    v = F.col(vec_col).cast("array<double>")
    out = df.select(
        F.col(id_col),
        F.round(dot(v, q) / (norm(v) * F.lit(qnorm)), 4).alias("cos"),
    )
    if exclude_id is not None:
        out = out.filter(F.col(id_col) != exclude_id)
    return out.orderBy(F.desc("cos"), F.col(id_col)).limit(k)


def hyperplanes(dim: int, n_planes: int = 16, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def bucket_key(vec_col: str, planes: np.ndarray) -> Column:
    """Sign-bit bucket id: bit h set iff dot(vec, plane_h) > 0.

    Literal-tree variant: emits n_planes x dim scalar literals into
    one Catalyst expression — fine at test dims, but at production
    dim (768 x 24 planes ≈ 18k literal nodes) planning+codegen cost
    dominates (measured: tools/stress_dim768.py, PLANS.md).
    :func:`hyperplane_lsh_buckets` auto-selects the vectorized
    matmul UDF (:func:`bucket_key_udf`) above ``_LITERAL_BUDGET``
    total literals."""
    key = F.lit(0).cast("long")
    v = F.col(vec_col).cast("array<double>")
    for h, plane in enumerate(planes):
        bit = F.when(dot(v, _lit_vec(plane)) > 0, F.lit(1)).otherwise(F.lit(0))
        key = key + (bit.cast("long") * F.lit(int(2 ** h)))
    # null / wrong-dim rows get a NULL bucket (dirty data must not
    # silently land in bucket 0 — and the matmul UDF variant can't
    # compute them at all, so both paths agree on the contract)
    return F.when(
        v.isNotNull() & (F.size(v) == planes.shape[1]), key
    ).otherwise(F.lit(None).cast("long"))


# above this many embedded scalar literals (planes: n_planes x dim;
# centroids: n_cells x dim) the expression-tree variants pay more in
# Catalyst planning + codegen than the Arrow hop costs — measured at
# dim 768 in tools/stress_dim768.py (see PLANS.md)
_LITERAL_BUDGET = 4096


def bucket_key_udf(vec_col: str, planes: np.ndarray) -> Column:
    """Sign-bit bucket id as ONE vectorized matrix multiply per Arrow
    batch (the MinHash precedent: numpy beats a giant expression
    tree). Same planes, same >0 test on float64 as
    :func:`bucket_key`; summation order differs, so a vector whose
    dot product is within float rounding of zero may land one bucket
    over — irrelevant to LSH semantics (bucket boundaries are
    arbitrary), and the driver-side query bucket in :func:`ann_topk`
    uses the same numpy order."""
    from pyspark.sql.types import LongType

    P = np.ascontiguousarray(planes, dtype=np.float64)
    weights = (1 << np.arange(P.shape[0], dtype=np.uint64))

    dim = P.shape[1]

    @F.pandas_udf(LongType())
    def key(vecs: pd.Series) -> pd.Series:
        if not len(vecs):
            return pd.Series([], dtype="int64")
        vals = vecs.to_numpy()
        # null / wrong-dim rows → NULL bucket (matches the literal
        # path's guard); np.vstack would crash the whole Arrow batch
        valid = np.array(
            [v is not None and len(v) == dim for v in vals], dtype=bool
        )
        out = np.full(len(vals), np.nan)
        if valid.any():
            # Arrow hands list<float> cells over as per-row ndarrays;
            # vstack is the no-python-loop batch assembly (tolist()
            # was 6x slower at dim 768 — see tools/stress_dim768.py)
            X = np.vstack(vals[valid]).astype(np.float64, copy=False)
            bits = (X @ P.T) > 0
            out[valid] = (bits.astype(np.uint64) * weights).sum(axis=1).astype(
                np.int64
            )
        return pd.Series(out).astype("Int64")

    return key(F.col(vec_col))


def hyperplane_lsh_buckets(
    df: DataFrame,
    dim: int,
    n_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    planes = hyperplanes(dim, n_planes, seed)
    key = (
        bucket_key_udf(vec_col, planes)
        if planes.size > _LITERAL_BUDGET
        else bucket_key(vec_col, planes)
    )
    return df.select(F.col(id_col), F.col(vec_col), key.alias("bucket"))


def ann_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    n_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate top-k: probe the query's bucket (+ hamming-1
    neighbors) and rank by exact cosine inside the candidate set. At
    scale the bucketed table is precomputed; candidates are a ~2^-p
    fraction of the corpus."""
    qv = np.asarray(list(query_vec), dtype=float)
    planes = hyperplanes(len(qv), n_planes, seed)
    qbucket = 0
    for h, plane in enumerate(planes):
        if float(np.dot(qv, plane)) > 0:
            qbucket |= 1 << h
    probes = [qbucket]
    if multiprobe:
        # hamming-1 and hamming-2 probes: hyperplane LSH's collision
        # probability per plane is 1 - angle/pi, so for far neighbors
        # (angle ≳ 60°) single-bucket recall collapses — deeper
        # multiprobe trades back recall for candidates. Recall is a
        # function of the data's cluster structure: near-dup search
        # (cos > 0.9) works at depth 1; uniform-ish corpora need
        # depth 2 and few planes (see tests + PLANS.md).
        probes += [qbucket ^ (1 << h) for h in range(n_planes)]
        probes += [
            qbucket ^ (1 << h1) ^ (1 << h2)
            for h1 in range(n_planes)
            for h2 in range(h1 + 1, n_planes)
        ]
    bucketed = hyperplane_lsh_buckets(df, len(qv), n_planes, id_col, vec_col, seed)
    cands = bucketed.filter(F.col("bucket").isin(probes))
    return cosine_topk(cands, qv, k, id_col, vec_col)


def pairwise_ann_candidates(
    df: DataFrame,
    dim: int,
    n_planes: Optional[int] = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    min_cos: float = 0.9,
    seed: int = 42,
    n_rows: Optional[int] = None,
) -> DataFrame:
    """Embedding-cosine near-dup pairs: same LSH bucket → exact cosine
    ≥ min_cos. One shuffle on the bucket key; quadratic only within
    buckets (expected size corpus/2^p). ``n_planes=None`` (default)
    derives the plane count from the corpus size — pass ``n_rows`` (an
    external corpus-size hint, e.g. from table metadata) to skip the
    probe entirely; otherwise a saturating probe runs, exact below its
    536.9M-row saturation point (32·2^24 — round-3 advice fix: the
    docstring previously claimed 16.7M). The probe is a distributed
    JVM count clamped on the driver — a full (zero-column, codegen,
    metadata-fast on plain parquet scans) pass, so a ``n_rows``
    metadata hint is always the cheaper path at scale. A saturated
    probe logs and uses the probe bound (planes err LOW:
    too-few planes costs bucket size, never recall — too MANY planes
    is the recall killer for single-table hyperplane LSH)."""
    if n_planes is None:
        if n_rows is None:
            from .dedup import clamped_count

            # derive_n_planes' hi clamp saturates at target_bucket·2^hi
            # = 32·2^24 rows, so a probe bounded there yields the
            # IDENTICAL parameter as a full count for EVERY corpus
            # size (same alignment as the minhash max_bucket probe —
            # a smaller bound would silently under-plane corpora in
            # the 16.7M–536M range by up to 32x bucket size)
            saturation = 32 * (1 << 24)
            n_rows = clamped_count(df, saturation)
        n_planes = derive_n_planes(n_rows)
        logger.info(
            "pairwise_ann_candidates: n=%d -> n_planes=%d "
            "(ceil(log2(n/32)) clamped to [4,24]; 2^p=%d buckets)",
            n_rows, n_planes, 2 ** n_planes,
        )
    bucketed = hyperplane_lsh_buckets(df, dim, n_planes, id_col, vec_col, seed)
    return _within_group_cosine_pairs(
        bucketed, "bucket", id_col, vec_col, min_cos
    ).distinct()


def _within_group_cosine_pairs(
    grouped: DataFrame,
    key_col: str,
    id_col: str,
    vec_col: str,
    min_cos: float,
) -> DataFrame:
    """Shared within-group pair machinery for every bucketed/celled
    cosine near-dup path: self-join on the group key, id_a < id_b,
    threshold on the RAW cosine (rounding before the filter would
    flip pairs at e.g. the 0.44995 boundary — round-4 review
    finding; the rounded value is emitted for display/oracle only)."""
    a = grouped.select(
        F.col(key_col), F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("v_a"),
    )
    b = grouped.select(
        F.col(key_col), F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("v_b"),
    )
    raw = cosine(F.col("v_a").cast("array<double>"),
                 F.col("v_b").cast("array<double>"))
    return (
        a.join(b, key_col)
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(raw >= min_cos)
        .select("id_a", "id_b", F.round(raw, 4).alias("cos"))
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the FAISS-IVF-flat shape on DataFrames
# ---------------------------------------------------------------------------

def ivf_train_centroids(
    df: DataFrame,
    dim: int,
    n_cells: int = 16,
    vec_col: str = "embedding",
    max_sample: int = 4096,
    iters: int = 12,
    seed: int = 42,
) -> np.ndarray:
    """Coarse quantizer: Lloyd k-means on a bounded driver-side sample
    (deterministic seed). At 100 TB the sample is still `max_sample`
    rows — training cost is O(sample), never O(corpus); only the
    assignment pass below touches every row.

    Sampling is a deterministic hash-ordered global top-k
    (TakeOrdered on xxhash64 of the vector): position-independent, so
    the codebook never trains on a corpus PREFIX — a fraction-based
    sample + limit() takes whatever the first partitions yield, which
    on a time-ordered corpus is the oldest 1-2% of the data (round-3
    review finding). One scan, map-side heaps of max_sample rows."""
    rows = (
        df.select(vec_col)
        .orderBy(F.xxhash64(F.col(vec_col).cast("array<double>"), F.lit(seed)))
        .limit(max_sample)
        .collect()
    )
    X = np.asarray([list(r[0]) for r in rows], dtype=np.float64)
    rng = np.random.default_rng(seed)
    cents = X[rng.choice(len(X), size=min(n_cells, len(X)), replace=False)]
    for _ in range(iters):
        d2 = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(len(cents)):
            members = X[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return cents


def _cell_expr(vec_col: str, centroids: np.ndarray) -> Column:
    """argmin_c ||v - c||^2 == argmax_c (dot(v, c) - ||c||^2 / 2),
    computed JVM-side (codegen'd expression, no Python hop)."""
    v = F.col(vec_col).cast("array<double>")
    scores = F.array(*[
        dot(v, _lit_vec(c)) - F.lit(float(np.dot(c, c)) / 2.0)
        for c in centroids
    ])
    cell = (F.array_position(scores, F.array_max(scores)) - 1).cast("int")
    # null / wrong-dim rows → NULL cell (same contract as _cell_udf)
    return F.when(
        v.isNotNull() & (F.size(v) == centroids.shape[1]), cell
    ).otherwise(F.lit(None).cast("int"))


def _cell_udf(centroids: np.ndarray):
    """Vectorized cell assignment: one (batch x dim) @ (dim x cells)
    matmul per Arrow batch — the scale path for production dims where
    :func:`_cell_expr`'s n_cells x dim literal tree is codegen-hostile
    (measured in tools/stress_dim768.py)."""
    from pyspark.sql.types import IntegerType

    C = np.ascontiguousarray(centroids, dtype=np.float64)
    half_norms = 0.5 * (C * C).sum(axis=1)

    dim = C.shape[1]

    @F.pandas_udf(IntegerType())
    def cell(vecs: pd.Series) -> pd.Series:
        if not len(vecs):
            return pd.Series([], dtype="int32")
        vals = vecs.to_numpy()
        valid = np.array(
            [v is not None and len(v) == dim for v in vals], dtype=bool
        )
        out = np.full(len(vals), np.nan)
        if valid.any():
            X = np.vstack(vals[valid]).astype(np.float64, copy=False)
            scores = X @ C.T - half_norms[None, :]
            out[valid] = scores.argmax(axis=1).astype(np.int32)
        return pd.Series(out).astype("Int32")

    return cell


def ivf_assign(
    df: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector to its nearest centroid cell. At scale,
    write this out partitioned by `cell` (or bucketed) so queries
    prune to nprobe cells at the SCAN — the IVF inverted lists ARE the
    partition layout; no shuffle at query time. Auto-selects the
    vectorized matmul UDF above ``_LITERAL_BUDGET`` total centroid
    literals (production dims), the codegen expression below it."""
    if centroids.size > _LITERAL_BUDGET:
        cell = _cell_udf(centroids)(F.col(vec_col))
    else:
        cell = _cell_expr(vec_col, centroids)
    return df.select(F.col(id_col), F.col(vec_col), cell.alias("cell"))


def ivf_write_index(
    df: DataFrame,
    centroids: np.ndarray,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize the IVF layout: cell assignments written
    PARTITIONED BY cell — the inverted lists ARE the directory
    structure, so a query's nprobe filter prunes at the scan (no
    assignment recompute, no shuffle, IO = nprobe/n_cells of the
    corpus). This is the 100 TB serving shape; :func:`ivf_topk`
    recomputes assignments inline and is the ad-hoc shape."""
    ivf_assign(df, centroids, id_col, vec_col).write.mode(
        "overwrite"
    ).partitionBy("cell").parquet(path)


def ivf_topk_indexed(
    spark,
    index_path: str,
    centroids: np.ndarray,
    query_vec: Sequence[float],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k against a materialized IVF index: rank cells
    driver-side (numpy over the centroid matrix), scan ONLY the nprobe
    matching partition directories (PartitionFilters — test-asserted),
    exact cosine inside."""
    qv = np.asarray(list(query_vec), dtype=np.float64)
    d2 = ((centroids - qv[None, :]) ** 2).sum(axis=1)
    probes = [int(c) for c in d2.argsort()[:nprobe]]
    cands = spark.read.parquet(index_path).filter(F.col("cell").isin(probes))
    return cosine_topk(cands, qv, k, id_col, vec_col)


def ivf_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    centroids: Optional[np.ndarray] = None,
) -> DataFrame:
    """IVF approximate top-k: rank the query's `nprobe` nearest cells
    driver-side, scan only those inverted lists, exact cosine inside.
    Recall follows the corpus's cluster structure — clustered corpora
    reach high recall at nprobe ≪ n_cells; near-uniform corpora need
    nprobe ≈ n_cells/2 (tested)."""
    qv = np.asarray(list(query_vec), dtype=np.float64)
    if centroids is None:
        centroids = ivf_train_centroids(
            df, len(qv), n_cells, vec_col=vec_col, seed=seed
        )
    d2 = ((centroids - qv[None, :]) ** 2).sum(axis=1)
    probes = [int(c) for c in d2.argsort()[:nprobe]]
    assigned = ivf_assign(df, centroids, id_col, vec_col)
    cands = assigned.filter(F.col("cell").isin(probes))
    return cosine_topk(cands, qv, k, id_col, vec_col)


# ---------------------------------------------------------------------------
# SemDeDup-style semantic dedup — cluster-then-prune (Abbas et al.
# 2023, "SemDeDup: Data-efficient learning at web-scale through
# semantic deduplication" — public paper)
# ---------------------------------------------------------------------------

def semantic_dedup_pairs(
    df: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    min_cos: float = 0.95,
    n_cells: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Semantic near-dup pairs the SemDeDup way: k-means the
    embeddings into ``n_cells`` coarse clusters (bounded driver-side
    sample — O(sample) training, never O(corpus)), then compare
    pairs WITHIN each cluster only (exact cosine ≥ ``min_cos``).
    Quadratic cost is bounded per cell (expected corpus/n_cells²
    pairs per cell vs corpus²/2 all-pairs); pairs straddling a cell
    boundary are missed by design — the paper's documented trade,
    acceptable because semantic duplicates sit deep inside clusters
    at the 0.95+ cosine band this targets. One shuffle on the cell
    key; cell assignment is JVM codegen below the literal budget and
    the vectorized matmul UDF above it (same plumbing as IVF)."""
    cents = ivf_train_centroids(
        df, dim, n_cells=n_cells, vec_col=vec_col, seed=seed
    )
    assigned = ivf_assign(df, cents, id_col, vec_col)
    return _within_group_cosine_pairs(
        assigned, "cell", id_col, vec_col, min_cos
    )


def semantic_dedup(
    df: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    min_cos: float = 0.95,
    n_cells: int = 64,
    seed: int = 42,
) -> DataFrame:
    """SemDeDup end-to-end: within-cluster cosine pairs → connected
    components → keep the min-id representative of every semantic
    cluster (singletons always survive). Component semantics matter
    here exactly as in text near-dup: chains A~B~C must collapse to
    ONE survivor, not pairwise-drop to zero.

    The cell-assigned frame is PERSISTED for the pair self-join
    (round-4 review: uncached, the corpus scan + matmul assignment
    ran once per join side) and released as soon as connected
    components has materialized the edge set; the survivor anti-join
    then reads the input once more — two passes over the corpus
    total, matching curate()'s staged-cache discipline."""
    from pyspark import StorageLevel

    from .dedup import dedup_keep_one_per_cluster

    cents = ivf_train_centroids(
        df, dim, n_cells=n_cells, vec_col=vec_col, seed=seed
    )
    assigned = ivf_assign(df, cents, id_col, vec_col).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    pairs = _within_group_cosine_pairs(
        assigned, "cell", id_col, vec_col, min_cos
    )
    # dedup_keep_one_per_cluster materializes the edge set eagerly
    # (localCheckpoint inside connected_components), so the assigned
    # cache has served its purpose once it returns
    survivors = dedup_keep_one_per_cluster(df, pairs, id_col)
    assigned.unpersist()
    return survivors
