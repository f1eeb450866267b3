"""Approximate-nearest-neighbor search over an embedding column.

- ``ann_brute_force_topk``: exact cosine top-k (the correctness
  baseline; one scan + one top-k, no shuffle of vectors).
- ``lsh_bucketed_topk``: random-hyperplane LSH buckets; only the probe
  buckets are scanned — the 100-TB path (bucket column becomes the
  table's partition/cluster key so partition pruning skips the rest).
"""

from __future__ import annotations

import random
from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from grokspark.operators.dedup import cosine

__all__ = ["ann_brute_force_topk", "hyperplanes", "lsh_bucket_col", "lsh_bucketed_topk"]


def ann_brute_force_topk(
    df: DataFrame,
    query: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k against one query vector. The query ships as
    a literal array; score computed JVM-side; ties broken by id for
    determinism."""
    qlit = F.array(*[F.lit(float(x)) for x in query])
    scored = df.withColumn("score", cosine(F.col(vec_col), qlit))
    return (
        scored.select(id_col, "score")
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def hyperplanes(dim: int, n_planes: int = 8, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes for sign-LSH."""
    rng = random.Random(f"grokspark:lsh:{seed}")
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]
def lsh_bucket_col(vec_col: str, planes: list[list[float]]):
    """Sign-pattern bucket id (0..2^n_planes-1) of a vector column —
    pure built-ins: per plane, the sign of the dot product."""
    bucket = F.lit(0)
    for i, plane in enumerate(planes):
        plit = F.array(*[F.lit(float(x)) for x in plane])
        dot = F.aggregate(
            F.zip_with(F.col(vec_col), plit, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(dot >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def lsh_bucketed_topk(
    df: DataFrame,
    query: Sequence[float],
    k: int = 10,
    n_planes: int = 8,
    probe_hamming: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """ANN top-k scanning only LSH buckets within ``probe_hamming`` bits
    of the query's bucket. Recall grows with probe_hamming (probes
    C(n_planes, <=h) buckets); at h = n_planes it degrades to exact."""
    dim = len(query)
    planes = hyperplanes(dim, n_planes, seed)

    def bucket_of(vec: Sequence[float]) -> int:
        b = 0
        for i, plane in enumerate(planes):
            if sum(float(x) * p for x, p in zip(vec, plane)) >= 0:
                b |= 1 << i
        return b

    qb = bucket_of(query)
    probes = [qb]
    if probe_hamming >= 1:
        probes += [qb ^ (1 << i) for i in range(n_planes)]
    if probe_hamming >= 2:
        probes += [
            qb ^ (1 << i) ^ (1 << j)
            for i in range(n_planes)
            for j in range(i + 1, n_planes)
        ]

    bucketed = df.withColumn("_bucket", lsh_bucket_col(vec_col, planes))
    candidates = bucketed.filter(F.col("_bucket").isin(probes))
    qlit = F.array(*[F.lit(float(x)) for x in query])
    return (
        candidates.withColumn("score", cosine(F.col(vec_col), qlit))
        .select(id_col, "score")
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )
