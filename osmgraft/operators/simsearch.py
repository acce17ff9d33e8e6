"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: dot products as pure Catalyst expressions
  (``aggregate``/``zip_with`` — JVM-side, codegen) — the correctness
  baseline and the small-query path.
- LSH-bucketed ANN: random-hyperplane signatures from a seed-derived
  plane matrix (numpy inside a pandas UDF, one matmul per Arrow batch),
  Hamming-prefix buckets, exact re-rank within candidates. The scale
  path: the bucket join shuffles signatures, not vectors.
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
