"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: dot products as pure Catalyst expressions
  (``aggregate``/``zip_with`` — JVM-side, codegen) — the correctness
  baseline and the small-query path.
- LSH-bucketed ANN: random-hyperplane signatures from a seed-derived
  plane matrix (numpy inside a pandas UDF, one matmul per Arrow batch),
  Hamming-prefix buckets, exact re-rank within candidates. The scale
  path: the bucket join shuffles signatures, not vectors.
- IVF ANN: spherical-k-means coarse quantizer over a bounded driver
  sample, broadcast (n_cells, dim) centroid matrix, narrow matmul
  assignment, nprobe-cell candidate equi-join, exact re-rank — the
  other standard scale path (probes ~nprobe/n_cells of the corpus).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot_expr(a: Column, b: Column) -> Column:
    # cast BEFORE multiplying: float*float would accumulate float32 error
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def brute_force_topk(
    embeddings: DataFrame,
    query: list[float],
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k by cosine against a literal query vector — one narrow pass +
    a k-row ordered take (Spark's takeOrdered under LIMIT)."""
    q = F.array(*[F.lit(float(x)) for x in query])
    scored = embeddings.select(
        F.col(id_col), cosine_expr(F.col(vec_col), q).alias("cosine")
    )
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col).asc()).limit(k)


def _planes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    return np.random.default_rng([seed, dim, n_planes]).standard_normal((dim, n_planes))


def lsh_signature_udf(dim: int, n_planes: int = 16, seed: int = 7):
    planes = _planes(dim, n_planes, seed)
    weights = (1 << np.arange(n_planes, dtype=np.int64))

    @F.pandas_udf("long")
    def _sig(vec: pd.Series) -> pd.Series:
        mat = np.vstack(vec.to_numpy())  # (batch, dim) — one matmul per batch
        bits = (mat @ planes) > 0
        return pd.Series((bits @ weights).astype(np.int64))

    return _sig


def ann_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int,
    dim: int,
    n_planes: int = 8,
    n_tables: int = 8,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k per query: multi-table hyperplane LSH.

    ``n_tables`` independent plane sets; a vector is a candidate if it
    shares a bucket with the query in ANY table (standard L-table LSH:
    recall = 1-(1-p^n_planes)^n_tables). Candidates are unioned via one
    equi-join on (table, bucket), deduped, and exactly re-ranked by cosine.
    """
    sigs = [lsh_signature_udf(dim, n_planes, seed + 1000 * t) for t in range(n_tables)]

    # The bucket join carries (id, table, bucket) ONLY — at dim~1k a float
    # vector riding the posexplode x n_tables exchange would amplify
    # shuffle bytes by ~8x. Vectors are re-joined once, by id, after the
    # candidate pairs are deduped.
    def bucketed(df: DataFrame, vec: str, keep: list[str]) -> DataFrame:
        tables = F.array(*[s(F.col(vec)) for s in sigs])
        return df.select(*keep, F.posexplode(tables).alias("_t", "_b"))

    base = bucketed(embeddings, vec_col, [id_col])
    qs = bucketed(
        queries.select(F.col(q_id_col), F.col(q_vec_col).alias("_qv")), "_qv", [q_id_col]
    )
    cand_ids = qs.join(base, ["_t", "_b"]).select(q_id_col, id_col).dropDuplicates(
        [q_id_col, id_col]
    )
    cand = (
        cand_ids.join(embeddings.select(id_col, vec_col), id_col)
        .join(queries.select(F.col(q_id_col), F.col(q_vec_col).alias("_qv")), q_id_col)
        .withColumn("cosine", cosine_expr(F.col(vec_col), F.col("_qv")))
    )
    w = Window.partitionBy(q_id_col).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select(q_id_col, id_col, "cosine", "rk")
    )


def ivf_centroids(
    embeddings: DataFrame,
    n_cells: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
    iters: int = 5,
    sample_cap: int = 20_000,
    seed_ids: list[int] | None = None,
) -> np.ndarray:
    """Coarse-quantizer centroids for IVF, as a (n_cells, dim) unit-norm
    numpy array (spherical k-means — cosine == dot after normalization).

    Two modes:
    - ``seed_ids``: centroids are EXACTLY those rows' vectors (normalized,
      in list order), with NO Lloyd refinement. Deterministic and
      replayable in plain SQL — the correctness-oracle configuration.
    - default: a bounded deterministic sample (hash-ordered, ``sample_cap``
      rows — driver memory is O(sample), never O(corpus)) initializes
      k-means++-lite (first ``n_cells`` of the shuffled sample), then
      ``iters`` Lloyd steps in numpy. The centroid matrix is tiny
      (n_cells x dim) and ships to executors as a UDF-closure broadcast.
    """
    if seed_ids is not None:
        rows = {
            r[0]: r[1]
            for r in embeddings.where(F.col(id_col).isin(list(seed_ids)))
            .select(id_col, vec_col)
            .collect()
        }
        missing = [i for i in seed_ids if i not in rows]
        if missing:
            raise ValueError(f"ivf_centroids: seed ids not found: {missing}")
        cents = np.array([rows[i] for i in seed_ids], dtype=np.float64)
    else:
        sample = (
            embeddings.select(vec_col)
            .orderBy(F.xxhash64(F.col(id_col), F.lit(seed)))
            .limit(sample_cap)
            .collect()
        )
        mat = np.array([r[0] for r in sample], dtype=np.float64)
        if len(mat) < n_cells:
            raise ValueError(f"ivf_centroids: {len(mat)} vectors < n_cells={n_cells}")
        cents = mat[:n_cells].copy()
    cents /= np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
    if iters and seed_ids is None:
        sample_mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        for _ in range(iters):
            assign = np.argmax(sample_mat @ cents.T, axis=1)
            for c in range(n_cells):
                members = sample_mat[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
            cents /= np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
    return cents


def _ivf_cell_expr(vec: Column, cents: np.ndarray) -> Column:
    """Catalyst argmax-by-rounded-cosine cell id (1-based, first-wins tie)
    — the SQL-replayable assignment used by the oracle configuration."""
    scores = F.array(
        *[
            F.round(cosine_expr(vec, F.array(*[F.lit(float(x)) for x in c])), 4)
            for c in cents
        ]
    )
    return F.array_position(scores, F.array_max(scores)).alias("_cell")


def _ivf_assign_udf(cents: np.ndarray):
    @F.pandas_udf("long")
    def _assign(vec: pd.Series) -> pd.Series:
        mat = np.vstack(vec.to_numpy()).astype(np.float64)
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(mat @ cents.T, axis=1).astype(np.int64) + 1)

    return _assign


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int,
    n_cells: int = 64,
    nprobe: int = 8,
    centroids: np.ndarray | None = None,
    seed: int = 7,
    iters: int = 5,
    seed_ids: list[int] | None = None,
    exact_assign: bool = False,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k per query: coarse-quantize the corpus into
    ``n_cells`` inverted lists, probe each query's ``nprobe`` nearest
    cells, exact-rerank only the probed candidates.

    Scale shape: assignment is one narrow pass (a batch matmul per Arrow
    batch against the broadcast (n_cells, dim) centroid matrix — or pure
    Catalyst with ``exact_assign``); the candidate equi-join shuffles on
    ``_cell``, carrying ids + vectors for the probed fraction only
    (~nprobe/n_cells of the corpus per query). No all-pairs path.

    ``exact_assign`` routes assignment through a rounded-cosine Catalyst
    argmax so an external SQL engine replays cell membership and probe
    order bit-for-bit (the oracle configuration; slower — n_cells literal
    expressions per row)."""
    if centroids is None:
        centroids = ivf_centroids(
            embeddings, n_cells, id_col, vec_col, seed, iters, seed_ids=seed_ids
        )
    n_cells = len(centroids)
    nprobe = min(nprobe, n_cells)

    if exact_assign:
        base = embeddings.select(
            F.col(id_col), F.col(vec_col), _ivf_cell_expr(F.col(vec_col), centroids)
        )
        qscores = F.array(
            *[
                F.round(
                    cosine_expr(F.col("_qv"), F.array(*[F.lit(float(x)) for x in c])), 4
                )
                for c in centroids
            ]
        )
    else:
        assign = _ivf_assign_udf(centroids)
        base = embeddings.select(F.col(id_col), F.col(vec_col), assign(F.col(vec_col)).alias("_cell"))
        qscores = None

    q = queries.select(F.col(q_id_col), F.col(q_vec_col).alias("_qv"))
    if exact_assign:
        scored = q.select(
            q_id_col, "_qv", F.posexplode(qscores).alias("_ci0", "_s")
        ).select(q_id_col, "_qv", (F.col("_ci0") + 1).alias("_cell"), "_s")
        wq = Window.partitionBy(q_id_col).orderBy(F.col("_s").desc(), F.col("_cell").asc())
        probes = (
            scored.withColumn("_pr", F.row_number().over(wq))
            .where(F.col("_pr") <= nprobe)
            .select(q_id_col, "_qv", "_cell")
        )
    else:
        cents_b = centroids

        @F.pandas_udf("array<long>")
        def _probe(vec: pd.Series) -> pd.Series:
            mat = np.vstack(vec.to_numpy()).astype(np.float64)
            mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            order = np.argsort(-(mat @ cents_b.T), axis=1, kind="stable")[:, :nprobe]
            return pd.Series(list((order + 1).astype(np.int64)))

        probes = q.select(
            q_id_col, "_qv", F.explode(_probe(F.col("_qv"))).alias("_cell")
        )

    cand = probes.join(base, "_cell").withColumn(
        "cosine", cosine_expr(F.col(vec_col), F.col("_qv"))
    )
    w = Window.partitionBy(q_id_col).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select(q_id_col, id_col, "cosine", "rk")
    )


def quantize_embeddings(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric per-vector int8 quantization: ``q = floor(v * scale +
    0.5)`` with ``scale = 127 / max(|v|)`` — a 4x storage/shuffle
    reduction for 100-TB embedding tables (the vector rides every ANN
    bucket exchange; int8 cuts those bytes 4x and dequantizes exactly as
    ``q / scale``).

    Pure Catalyst (transform/array_max — no Python, no shuffle); bias
    rounding (``floor(x+0.5)``) instead of round-half-to-even because it
    evaluates identically in every SQL engine, making the quantizer
    output externally replayable. All-zero vectors quantize to zeros
    with ``scale = 0`` (dequantize with ``q * 0 = 0``). Max dequant
    error is ``0.5/scale = max(|v|)/254``; cosine is preserved to ~1e-4
    at dim 64."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    out = embeddings.select(F.col(id_col), v.alias("_v")).select(
        id_col,
        "_v",
        F.array_max(F.transform("_v", F.abs)).alias("_amax"),
    )
    scale = F.when(F.col("_amax") > 0.0, F.lit(127.0) / F.col("_amax")).otherwise(F.lit(0.0))
    return out.select(
        F.col(id_col),
        F.transform(
            "_v", lambda x: F.floor(x * scale + F.lit(0.5)).cast("int")
        ).alias("qvec"),
        scale.alias("scale"),
    )


def dequantize_expr(qvec: Column, scale: Column) -> Column:
    """Inverse of :func:`quantize_embeddings`: ``q / scale`` as
    array<double> (all-zero vectors carry scale 0 -> all-zero output)."""
    return F.when(
        scale > 0.0,
        F.transform(qvec, lambda q: q.cast("double") / scale),
    ).otherwise(F.transform(qvec, lambda q: F.lit(0.0)))


def pairwise_neighbors(
    embeddings: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    by_label: str | None = None,
) -> DataFrame:
    """Exact k nearest neighbors for every vector (self-join; optionally
    blocked by a label/bucket column to bound the quadratic term)."""
    blk = [F.col(by_label).alias("_blk")] if by_label else []
    a = embeddings.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), *blk)
    b = embeddings.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), *blk)
    joined = a.join(b, "_blk") if by_label else a.crossJoin(b)
    joined = joined.where(F.col("id_a") != F.col("id_b"))
    scored = joined.withColumn("cosine", cosine_expr(F.col("va"), F.col("vb")))
    w = Window.partitionBy("id_a").orderBy(F.col("cosine").desc(), F.col("id_b").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("id_a", "id_b", "cosine", "rk")
    )
