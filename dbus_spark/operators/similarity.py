"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the correctness baseline; random-hyperplane
LSH bucketing as the scale path (bucket-join instead of the full cross
product). The dot product / norms run as Catalyst higher-order
functions (``aggregate``/``zip_with``) in the JVM — no Python in the
hot path; at extreme dims swap in a vectorized pandas UDF, the plan
shape stays identical.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dvec(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a, b) -> Column:
    return F.aggregate(
        F.zip_with(_dvec(a), _dvec(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a, b) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def knn_bruteforce(
    df: DataFrame,
    query_ids: list[int],
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for the given query ids.

    The query side is tiny by construction → broadcast, so the scan of
    the big side is embarrassingly parallel (no shuffle until the
    per-query top-k, which is a k-row-per-partition aggregation).
    """
    q = df.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    )
    cand = df.select(
        F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec")
    )
    scored = (
        F.broadcast(q)
        .crossJoin(cand)
        .filter(F.col("q_id") != F.col("n_id"))
        .select(
            "q_id",
            "n_id",
            cosine("q_vec", "n_vec").alias("_sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("_sim").desc(), F.col("n_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "q_id", "n_id", "rank", F.round("_sim", 4).alias("sim")
        )
    )


def neardup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with cosine > threshold (brute force baseline)."""
    a = df.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")
    )
    b = df.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")
    )
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b", F.round(cosine("va", "vb"), 4).alias("sim")
        )
        .filter(F.col("sim") > threshold)
    )


def _hyperplanes(n_planes: int, dim: int, seed: int = 7) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_bucket(
    df: DataFrame,
    dim: int,
    n_planes: int = 8,
    seed: int = 7,
    vec_col: str = "embedding",
    out_col: str = "bucket",
) -> DataFrame:
    """Random-hyperplane (SRP) bucket id per vector: bit i = sign of
    <v, plane_i>. Deterministic planes from the seed; computed as a
    literal-array zip_with — map-side only."""
    planes = _hyperplanes(n_planes, dim, seed)
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane_col = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(
            dot(F.col(vec_col), plane_col) > 0,
            F.shiftleft(F.lit(1).cast("long"), i),
        ).otherwise(F.lit(0).cast("long"))
        bucket = bucket + bit
    return df.withColumn(out_col, bucket)


def knn_lsh(
    df: DataFrame,
    query_ids: list[int],
    dim: int,
    k: int = 3,
    n_planes: int = 8,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's SRP
    bucket — the scale path: the bucket-join shuffles |docs| rows into
    2^n_planes groups instead of scanning everything per query."""
    bucketed = lsh_bucket(df, dim, n_planes, seed, vec_col)
    q = bucketed.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        F.col("bucket"),
    )
    cand = bucketed.select(
        F.col(id_col).alias("n_id"),
        F.col(vec_col).alias("n_vec"),
        F.col("bucket"),
    )
    scored = (
        F.broadcast(q)
        .join(cand, on="bucket")
        .filter(F.col("q_id") != F.col("n_id"))
        .select("q_id", "n_id", cosine("q_vec", "n_vec").alias("_sim"))
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("_sim").desc(), F.col("n_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "rank", F.round("_sim", 4).alias("sim"))
    )
