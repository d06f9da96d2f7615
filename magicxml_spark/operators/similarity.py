"""Similarity search over an embedding column (array<float>).

* ``cosine_topk_bruteforce`` — exact top-k by cosine: self cross-join +
  window. Correctness baseline; O(n^2) pairs, fine for dimension-table
  sized corpora and as the verify step for the approximate path.
* ``cosine_topk_lsh`` — the scale path: random-hyperplane LSH buckets
  (sign sketch of dot products with fixed pseudo-random planes), then
  brute force only within buckets. At 100 TB the bucket join replaces
  the quadratic cross-join with one shuffle on the bucket key.

All arithmetic is elementwise zip_with/aggregate over array<double> —
JVM-side, no Python. Plane coefficients are derived deterministically
from md5 of (plane, dim) so results are reproducible with no RNG state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk_bruteforce(
    df: DataFrame, id_col: str, vec_col: str, k: int = 5
) -> DataFrame:
    """Exact top-k neighbors per vector: (vec_id, neighbor_id, rank, sim).

    Deterministic tie-break: (sim DESC, neighbor_id ASC). sim is rounded
    only in the output — ranking uses full precision.
    """
    base = df.select(F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v"))
    a = base.alias("qa")
    b = base.alias("qb")
    sim = cosine(F.col("qa.v"), F.col("qb.v"))
    pairs = (
        a.join(b, F.col("qa.id") != F.col("qb.id"))
        .select(
            F.col("qa.id").alias("vec_id"),
            F.col("qb.id").alias("neighbor_id"),
            sim.alias("sim"),
        )
    )
    w = W.partitionBy("vec_id").orderBy(F.desc("sim"), "neighbor_id")
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("vec_id", "neighbor_id", "rank", F.round("sim", 4).alias("sim"))
    )


def _hyperplane(plane: int, dim: int) -> list[float]:
    """Deterministic pseudo-random unit-free plane: coefficient j is
    (md5-derived int in [0, 2^31)) mapped to [-1, 1). No RNG state —
    same plane on every executor, every run, every engine."""
    import hashlib

    coeffs = []
    for j in range(dim):
        h = hashlib.md5(f"plane{plane}|{j}".encode()).hexdigest()
        coeffs.append((int(h[:8], 16) / float(2**31)) - 1.0)
    return coeffs


def lsh_bucket(vec: Column, dim: int, n_planes: int = 8) -> Column:
    """Sign sketch: bit b = 1 iff dot(vec, plane_b) > 0."""
    out = F.lit(0)
    for p in range(n_planes):
        plane = F.array(*[F.lit(c) for c in _hyperplane(p, dim)])
        out = out + F.when(dot(vec, plane) > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return out.cast("int")


def cosine_topk_lsh(
    df: DataFrame, id_col: str, vec_col: str, k: int = 5, dim: int = 64, n_planes: int = 8
) -> DataFrame:
    """Approximate top-k: exact cosine ranking within LSH buckets.
    Recall improves with fewer planes (bigger buckets); n_planes=8 on
    random data keeps buckets ~corpus/256."""
    base = df.select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v")
    ).withColumn("bucket", lsh_bucket(F.col("v"), dim, n_planes))
    a = base.alias("la")
    b = base.alias("lb")
    sim = cosine(F.col("la.v"), F.col("lb.v"))
    pairs = (
        a.join(
            b,
            (F.col("la.bucket") == F.col("lb.bucket")) & (F.col("la.id") != F.col("lb.id")),
        )
        .select(
            F.col("la.id").alias("vec_id"),
            F.col("lb.id").alias("neighbor_id"),
            sim.alias("sim"),
        )
    )
    w = W.partitionBy("vec_id").orderBy(F.desc("sim"), "neighbor_id")
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("vec_id", "neighbor_id", "rank", F.round("sim", 4).alias("sim"))
    )


def embedding_near_dup(
    df: DataFrame, id_col: str, vec_col: str, threshold: float = 0.95
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, sim >= t)."""
    base = df.select(F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v"))
    a = base.alias("na")
    b = base.alias("nb")
    sim = cosine(F.col("na.v"), F.col("nb.v"))
    return (
        a.join(b, F.col("na.id") < F.col("nb.id"))
        .select(
            F.col("na.id").alias("id_a"),
            F.col("nb.id").alias("id_b"),
            sim.alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", F.round("sim", 4).alias("sim"))
    )
