"""Approximate-nearest-neighbor search over an embedding column.

- ``ann_brute_force_topk``: exact cosine top-k (the correctness
  baseline; one scan + one top-k, no shuffle of vectors).
- ``build_lsh_index`` + ``lsh_index_topk``: the 100-TB path — the
  random-hyperplane bucket is MATERIALIZED as the table's partition
  column at index-build time, so a query's ``_bucket IN (probes)``
  filter becomes real partition pruning (PartitionFilters in the scan;
  non-probed buckets are never read, plan-asserted in
  tests/test_plans.py).
- ``lsh_bucketed_topk``: the index-free variant — computes buckets on
  the fly and filters. Same results, but it still scans every vector;
  use it only when the corpus isn't worth indexing.
"""

from __future__ import annotations

import itertools
import math
import random
import warnings
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from grokspark.operators.dedup import cosine

__all__ = [
    "ann_brute_force_topk",
    "hyperplanes",
    "lsh_bucket_col",
    "bucket_of",
    "hamming_probes",
    "recommended_n_planes",
    "build_lsh_index",
    "lsh_index_topk",
    "lsh_bucketed_topk",
    "knn_join",
    "embedding_lsh_pairs",
]

# dim * n_planes above which the per-plane literal-array fold would
# bloat the plan (and its codegen) — switch to a broadcast numpy matrix
# inside an Arrow-batched pandas UDF instead
LSH_UDF_LITERAL_THRESHOLD = 4096

# candidate joins go effectively quadratic when buckets get this full
MAX_BUCKET_ROWS = 10_000


def recommended_n_planes(n_rows: int, target_bucket_rows: int = 1024) -> int:
    """Hyperplane count that keeps the EXPECTED bucket population near
    ``target_bucket_rows``: 2^n_planes buckets over n_rows vectors ->
    n_planes = ceil(log2(n_rows / target)). The LSH candidate join is
    ~quadratic WITHIN a bucket, so bucket population — not corpus size
    — is what must stay bounded; n_planes has to GROW with the corpus
    (e.g. 1e9 rows at 1k/bucket -> 20 planes / 1M buckets)."""
    if n_rows <= target_bucket_rows:
        return 1
    return max(1, math.ceil(math.log2(n_rows / target_bucket_rows)))


def _warn_if_buckets_overfull(n_rows: int, n_planes: int, op: str) -> None:
    expected = n_rows / (1 << n_planes)
    if expected > MAX_BUCKET_ROWS:
        warnings.warn(
            f"{op}: ~{expected:,.0f} vectors per LSH bucket expected "
            f"({n_rows:,} rows over 2^{n_planes} buckets) — the within-"
            f"bucket candidate join is quadratic at this occupancy; use "
            f"n_planes>={recommended_n_planes(n_rows)} (or n_planes=None "
            f"to auto-size)",
            stacklevel=3,
        )


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


def bucket_of(vec: Sequence[float], planes: list[list[float]]) -> int:
    """Sign-pattern bucket of one vector (driver-side; mirrors
    ``lsh_bucket_col`` bit for bit — sequential left-to-right double
    accumulation, same as F.aggregate's fold)."""
    b = 0
    for i, plane in enumerate(planes):
        acc = 0.0
        for x, p in zip(vec, plane):
            acc += float(x) * p
        if acc >= 0:
            b |= 1 << i
    return b


def _probe_masks(n_planes: int, probe_hamming: int) -> list[int]:
    """XOR masks for all buckets within ``probe_hamming`` bit flips."""
    masks = [0]
    for h in range(1, probe_hamming + 1):
        for bits in itertools.combinations(range(n_planes), h):
            m = 0
            for i in bits:
                m |= 1 << i
            masks.append(m)
    return masks


def hamming_probes(qb: int, n_planes: int, probe_hamming: int) -> list[int]:
    """All buckets within ``probe_hamming`` bit flips of ``qb``
    (C(n_planes, <=h) probes), sorted for deterministic plans."""
    return sorted({qb ^ m for m in _probe_masks(n_planes, probe_hamming)})


def _lsh_bucket_udf(planes: list[list[float]]):
    """Bucket assignment via one broadcast numpy matrix product per
    Arrow batch — the high-dim path: ``lsh_bucket_col`` embeds
    dim x n_planes float literals in the plan, which past
    ``LSH_UDF_LITERAL_THRESHOLD`` bloats analysis/codegen. numpy's
    blocked summation can differ from the expression fold in the last
    ulp, so a dot product within ~1e-12 of zero may land in a
    different bucket than the fold path — irrelevant for recall (both
    are valid LSH assignments) but the reason the exact-oracle queries
    stay on the fold path."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    mat = np.array(planes, dtype=np.float64).T  # dim x n_planes
    weights = (np.int64(1) << np.arange(len(planes))).astype(np.int64)

    def bucket(vecs):
        if len(vecs) == 0:
            # np.array([]) is shape (0,), not (0, dim) — `@ mat` raises
            return pd.Series([], dtype="int64")
        arr = np.array(vecs.tolist(), dtype=np.float64)
        return pd.Series(((arr @ mat >= 0) * weights).sum(axis=1))

    return pandas_udf(bucket, "long")


def _bucketed_vectors(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    planes: list[list[float]],
    via_udf: Optional[bool] = None,
) -> DataFrame:
    """(id, vec, _bucket) — the shared first stage of every bucket-LSH
    batch operator. ``via_udf=None`` auto-selects: the JVM literal fold
    below ``LSH_UDF_LITERAL_THRESHOLD`` plan literals (bit-reproducible
    vs driver-side ``bucket_of``), the broadcast-matrix pandas UDF
    above it."""
    if via_udf is None:
        via_udf = len(planes) * len(planes[0]) > LSH_UDF_LITERAL_THRESHOLD
    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    if via_udf:
        return base.withColumn("_bucket", _lsh_bucket_udf(planes)(F.col("vec")))
    return base.withColumn("_bucket", lsh_bucket_col("vec", planes))


def _bucket_candidate_pairs(
    bucketed: DataFrame, masks: list[int], ordered: bool
) -> DataFrame:
    """Distinct candidate id pairs whose buckets differ by one of the
    probe ``masks`` — ONE bucket equi-join over (id, probe) rows; the
    vectors never ride the xmasks explode. ``ordered=True`` emits each
    unordered pair once (qid < nid, dedup semantics); ``False`` emits
    both directions (qid != nid, per-query kNN semantics)."""
    probes = (
        bucketed.select("id", "_bucket")
        .withColumn("_mask", F.explode(F.array(*[F.lit(m) for m in masks])))
        .select(
            F.col("id").alias("qid"),
            F.col("_bucket").bitwiseXOR(F.col("_mask")).alias("_probe"),
        )
    )
    right = bucketed.select(F.col("id").alias("nid"), "_bucket")
    pair_cond = F.col("qid") < F.col("nid") if ordered else F.col("qid") != F.col("nid")
    return (
        probes.join(right, (probes["_probe"] == right["_bucket"]) & pair_cond)
        .select("qid", "nid")
        .dropDuplicates()
    )


def _score_candidates(cand: DataFrame, bucketed: DataFrame) -> DataFrame:
    """Join vectors back narrowly for both pair sides and score cosine
    — (qid, nid, score)."""
    return (
        cand.join(
            bucketed.select(F.col("id").alias("qid"), F.col("vec").alias("qv")),
            "qid",
        )
        .join(
            bucketed.select(F.col("id").alias("nid"), F.col("vec").alias("nv")),
            "nid",
        )
        .withColumn("score", cosine(F.col("qv"), F.col("nv")))
    )


def build_lsh_index(
    df: DataFrame,
    index_path: str,
    n_planes: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[float]]:
    """Materialize ``df`` as a parquet table PARTITIONED BY its LSH
    bucket. This is what makes LSH-ANN actually prune at scale: the
    bucket is a physical partition column, so a probe query's
    ``_bucket IN (...)`` reaches the scan as PartitionFilters and
    non-probed buckets are never opened. (On a real cluster the same
    layout is an Iceberg table partitioned/clustered by ``_bucket``.)

    Returns the hyperplanes used (regenerate with ``hyperplanes(dim,
    n_planes, seed)`` — they are a pure function of the seed)."""
    dim = df.select(F.size(F.col(vec_col))).head()[0]
    planes = hyperplanes(dim, n_planes, seed)
    (
        df.withColumn("_bucket", lsh_bucket_col(vec_col, planes))
        # cluster rows by bucket before the partitioned write: one file
        # per bucket instead of (input partitions x buckets) shards —
        # index builds shuffle once so every probe later reads one file
        .repartition(F.col("_bucket"))
        .write.mode("overwrite")
        .partitionBy("_bucket")
        .parquet(index_path)
    )
    return planes


def lsh_index_topk(
    spark: SparkSession,
    index_path: str,
    query: Sequence[float],
    k: int = 10,
    n_planes: int = 8,
    probe_hamming: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """ANN top-k over a materialized LSH index: reads ONLY the probe
    partitions (partition pruning — C(n_planes, <=h) buckets of 2^n),
    scores them, returns cosine top-k. Recall grows with
    ``probe_hamming``; at h = n_planes it degrades to exact."""
    planes = hyperplanes(len(query), n_planes, seed)
    probes = hamming_probes(bucket_of(query, planes), n_planes, probe_hamming)
    candidates = spark.read.parquet(index_path).filter(
        F.col("_bucket").isin(probes)
    )
    qlit = F.array(*[F.lit(float(x)) for x in query])
    return (
        candidates.withColumn("score", cosine(F.col(vec_col), qlit))
        .select(id_col, "score")
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def knn_join(
    df: DataFrame,
    k: int = 5,
    n_planes: Optional[int] = 8,
    probe_hamming: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """Approximate k-nearest-neighbors for EVERY row (the batch ANN op
    a training pipeline runs corpus-wide): ``(id, neighbor_id, score,
    rank)`` with rank 1..k by cosine within the probed LSH buckets.

    Scale shape (the same narrow-candidates discipline as the dedup
    ops): buckets are computed once per row; the query side explodes to
    C(n_planes, <=h) probe buckets carrying ONLY (id, probe_bucket) —
    the 256-float embedding never rides the xprobes explode. Candidates
    come from one equi-join on the bucket (no inequality/cartesian
    join), then embeddings join back narrowly for scoring, then a
    per-id top-k window. Semantically identical to filtering all pairs
    on hamming(bucket_a, bucket_b) <= h, without the all-pairs plan.

    ``n_planes`` must GROW with corpus size — the candidate join is
    quadratic within a bucket, so it's the expected bucket population
    n_rows/2^n_planes that has to stay bounded (see
    ``recommended_n_planes``). Pass ``n_planes=None`` to auto-size
    from the corpus rowcount (costs one count() of the id column —
    noise next to the join); an explicit value is trusted as-is, no
    extra scan — check it against ``recommended_n_planes`` yourself."""
    if n_planes is None:
        n_planes = recommended_n_planes(df.count())
    planes = hyperplanes(
        df.select(F.size(F.col(vec_col))).head()[0], n_planes, seed
    )
    bucketed = _bucketed_vectors(df, vec_col, id_col, planes)
    cand = _bucket_candidate_pairs(
        bucketed, _probe_masks(n_planes, probe_hamming), ordered=False
    )
    scored = _score_candidates(cand, bucketed)
    from pyspark.sql.window import Window

    w = Window.partitionBy("qid").orderBy(
        F.col("score").desc(), F.col("nid").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias(id_col),
            F.col("nid").alias("neighbor_id"),
            "score",
            "rank",
        )
    )


def embedding_lsh_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    n_planes: Optional[int] = 8,
    probe_hamming: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """Embedding near-duplicate pairs at scale: the LSH twin of
    ``grokspark.operators.dedup.embedding_cosine_pairs`` (which is the
    quadratic exactness baseline). Candidates are pairs whose sign-LSH
    buckets differ in <= ``probe_hamming`` bits — produced by ONE
    bucket equi-join over XOR-mask probes carrying ids only — then
    verified by exact cosine >= threshold (precision is exact; recall
    is governed by n_planes/probe_hamming and measured against the
    baseline in tests). Deterministic: the candidate rule itself is
    recomputable (the driver oracle mirrors it in SQL). ``n_planes``
    sizing follows the same rule as ``knn_join`` (None = auto via one
    count(); explicit values are trusted without an extra scan)."""
    if n_planes is None:
        n_planes = recommended_n_planes(df.count())
    planes = hyperplanes(
        df.select(F.size(F.col(vec_col))).head()[0], n_planes, seed
    )
    bucketed = _bucketed_vectors(df, vec_col, id_col, planes)
    cand = _bucket_candidate_pairs(
        bucketed, _probe_masks(n_planes, probe_hamming), ordered=True
    )
    scored = _score_candidates(cand, bucketed)
    return scored.filter(F.col("score") >= threshold).select(
        F.col("qid").alias("id_a"),
        F.col("nid").alias("id_b"),
        F.col("score").alias("cos"),
    )


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
    """Index-free LSH ANN: buckets computed on the fly, probe filter
    applied per row. Same candidate set and results as
    ``lsh_index_topk`` but NO pruning — every vector is still scanned;
    prefer the materialized index at scale."""
    planes = hyperplanes(len(query), n_planes, seed)
    probes = hamming_probes(bucket_of(query, planes), n_planes, probe_hamming)
    bucketed = df.withColumn("_bucket", lsh_bucket_col(vec_col, planes))
    candidates = bucketed.filter(F.col("_bucket").isin(probes))
    qlit = F.array(*[F.lit(float(x)) for x in query])
    return (
        candidates.withColumn("score", cosine(F.col(vec_col), qlit))
        .select(id_col, "score")
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )
