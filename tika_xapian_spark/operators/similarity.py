"""Approximate-nearest-neighbor search over an embedding column.

Two paths over ``embeddings(vec_id, embedding: array<float>, label)``:

  brute-force cosine top-k   exact baseline — JVM-side higher-order functions
                             (zip_with product + aggregate sum), no Python.
  sign-LSH bucketed top-k    scale path — bucket every vector by the sign
                             pattern of ``n_bits`` fixed dimensions (an
                             axis-aligned random-hyperplane LSH whose planes
                             are deterministic), probe only the query's
                             bucket. At 10^9+ vectors the bucket column is a
                             partition key: the probe prunes to 1/2^bits of
                             the data before any distance math.

All math is folded left over the array in double precision, so the DuckDB
oracle (same fold order) agrees to well past the 1e-6 rounding used for
comparison.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

LSH_DIMS = (0, 7, 19, 31, 43, 55)  # fixed probe dimensions (deterministic)


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def _as_double(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (vec_id, cos_micro) by descending similarity,
    ties by ascending id. Whole-stage-codegen column math ending in
    TakeOrderedAndProject — the distributed bounded heap."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    emb = _as_double(vec_col)
    cos = _dot(emb, q) / (_norm(emb) * _norm(q))
    return (
        embeddings.select(
            F.col(id_col).alias("vec_id"),
            F.round(cos * 1_000_000).cast("long").alias("cos_micro"),
        )
        .orderBy(F.desc("cos_micro"), F.asc("vec_id"))
        .limit(k)
    )


def sign_bucket(vec_col: str | Column, dims: tuple[int, ...] = LSH_DIMS) -> Column:
    """Deterministic sign-LSH bucket id: bit i set iff vec[dims[i]] >= 0.
    (element_at is 1-based.)"""
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    bucket = F.lit(0)
    for i, d in enumerate(dims):
        bit = F.when(F.element_at(c, d + 1) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        bucket = bucket + bit
    return bucket


def lsh_cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: tuple[int, ...] = LSH_DIMS,
) -> DataFrame:
    """Bucketed ANN: restrict to the query's sign bucket, then exact cosine
    within it. Recall < 1 by construction; the bucket predicate is a plain
    column filter that pushes down to a bucket-partitioned table at scale."""
    qbucket = 0
    for i, d in enumerate(dims):
        if query_vec[d] >= 0:
            qbucket |= 1 << i
    in_bucket = embeddings.filter(sign_bucket(vec_col, dims) == F.lit(qbucket))
    return cosine_topk(in_bucket, query_vec, k, id_col, vec_col)


def pairwise_cosine_dedup(
    embeddings: DataFrame,
    threshold_micro: int = 990_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: tuple[int, ...] = LSH_DIMS,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: candidate pairs share a sign-LSH
    bucket (prunes the O(n^2) cross join to per-bucket blocks), verified by
    exact cosine >= threshold. Returns (id_a, id_b, cos_micro)."""
    with_bucket = embeddings.select(
        F.col(id_col).alias("id"),
        _as_double(vec_col).alias("v"),
        sign_bucket(vec_col, dims).alias("bucket"),
    )
    a = with_bucket.select(
        F.col("id").alias("id_a"), F.col("v").alias("va"), "bucket"
    )
    b = with_bucket.select(
        F.col("id").alias("id_b"), F.col("v").alias("vb"), "bucket"
    )
    pairs = a.join(b, "bucket").filter(F.col("id_a") < F.col("id_b"))
    cos = _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))
    return (
        pairs.select(
            "id_a", "id_b", F.round(cos * 1_000_000).cast("long").alias("cos_micro")
        )
        .filter(F.col("cos_micro") >= threshold_micro)
        .orderBy("id_a", "id_b")
    )
