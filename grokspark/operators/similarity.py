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
    "knn_join_blocked",
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


def _resolve_n_planes(
    df: DataFrame,
    n_planes: Optional[int],
    op: str,
    target_bucket_rows: int = 1024,
) -> int:
    """Auto-size ``n_planes=None`` from the corpus rowcount (one
    count(); the chosen value keeps expected bucket population near
    ``target_bucket_rows``, re-checked through the occupancy guard so
    a future target/guard mismatch warns loudly). An explicit value is
    trusted as-is — no extra scan at 10^12 rows — which is why the
    guard cannot fire for it; callers own that check.

    The target matters: candidate volume is ``n_rows x probes x
    bucket_rows``, and the hamming-probe count grows with n_planes
    (so with log n under auto-sizing) — a target sized for near-dup
    recall (1024) makes corpus-wide kNN superlinear (measured 6.3x
    per-row cost at 10x corpus, BENCH/SCALE_PROBES.md). Top-k search
    needs only a few x k candidates per probe, so ``knn_join`` passes
    a k-scaled target."""
    if n_planes is not None:
        return n_planes
    n_rows = df.count()
    chosen = recommended_n_planes(n_rows, target_bucket_rows)
    _warn_if_buckets_overfull(n_rows, chosen, op)
    return chosen


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
    extra scan — check it against ``recommended_n_planes`` yourself.

    DEFAULT PATH: prefer ``knn_join_blocked`` for production scoring —
    identical candidate rule and ranking, but each vector ships once
    per probe instead of once per candidate (~100x less verify shuffle)
    and scoring is one BLAS matmul per bucket slice (measured 10x cost
    curvature 0.17 vs this fold path's 0.56). This fold formulation is
    retained as the oracle twin: its per-pair ``zip_with`` double fold
    is the FP-parity reference against DuckDB (rank-equality asserted
    in tests/test_operators.py), the role ``_lsh_bucket_udf`` plays for
    bucketing."""
    n_planes = _resolve_n_planes(
        df, n_planes, "knn_join", target_bucket_rows=max(64, 16 * k)
    )
    planes = hyperplanes(
        df.select(F.size(F.col(vec_col))).head()[0], n_planes, seed
    )
    # the bucketed table is referenced FOUR times below (both sides of
    # the candidate join, both vector rejoins); the per-row bucket fold
    # is n_planes x dim interpreted lambda evals, so materialize it
    # once (measured: the recompute dominated the 10x scale probe)
    bucketed = _bucketed_vectors(df, vec_col, id_col, planes).localCheckpoint()
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


def knn_join_blocked(
    df: DataFrame,
    k: int = 5,
    n_planes: Optional[int] = 8,
    probe_hamming: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    salt_members: int = 1,
) -> DataFrame:
    """Corpus-wide kNN with BUCKET-LOCAL BLOCKED SCORING — the
    100-TB-shaped twin of ``knn_join``.

    ``knn_join``'s verify stage joins BOTH embedding vectors onto every
    candidate pair, so shuffle volume is ``candidates x 2 x
    vector_width`` and scoring is an interpreted per-row fold — at 50k
    x 64-dim that is ~27 GB through the join and the stage spills
    (measured 6x superlinear per-row cost at 10x corpus,
    BENCH/SCALE_PROBES.md). Here the data moves bucket-wise instead:

    - each QUERY vector ships once per probe (``probes x width`` per
      query, not per candidate — ~100x less bytes at the probe's
      occupancy), via a cogroup on (probe bucket == member bucket);
    - each MEMBER vector ships exactly once;
    - scoring inside the cogrouped kernel is one numpy normalized
      matmul per bucket (C speed, Arrow-batched), emitting only each
      query's bucket-local top-k;
    - the global top-k window then sees <= probes x k rows per query.

    Each (query, member) pair lands in exactly one group — the member's
    bucket, probed by exactly one XOR mask — so no dedup pass is
    needed. Same candidate rule and same results as ``knn_join`` up to
    floating-point tie-breaks: blocked matmul sums in a different
    order than the sequential fold, so scores can differ in the last
    ulp; the driver-oracle query stays on the fold path for that
    reason (same policy as ``_lsh_bucket_udf``).

    ``salt_members`` is the skew control: real embedding distributions
    can pile into few buckets (measured: a degenerate corpus put all
    50k vectors into 20 of 1024 buckets and one straggler task carried
    the stage). Salting splits each bucket's MEMBERS into S slices
    (hash of the member id) and replicates the probe side xS; each
    pair still lands in exactly one (bucket, slice) group, per-slice
    top-k stays correct because top-k merges (the global window sees
    every slice's winners). Neighbor sets and ranks are IDENTICAL for
    any S (ties break on nid via the stable sort below); scores can
    move by a BLAS-blocking ulp since the matmul shape changes. Cost:
    probe-side shuffle xS; use a few slices when bucket histograms are
    known-skewed."""
    import numpy as np
    import pandas as pd

    n_planes = _resolve_n_planes(
        df, n_planes, "knn_join_blocked", target_bucket_rows=max(64, 16 * k)
    )
    planes = hyperplanes(
        df.select(F.size(F.col(vec_col))).head()[0], n_planes, seed
    )
    # bucket via the numpy matrix UDF regardless of literal count: this
    # path makes no fold-parity promise (scores are blocked matmuls
    # anyway), and the interpreted per-row fold costs n_planes x dim
    # lambda evals; materialized once for the two references below
    bucketed = _bucketed_vectors(
        df, vec_col, id_col, planes, via_udf=True
    ).localCheckpoint()
    masks = _probe_masks(n_planes, probe_hamming)
    probes = (
        bucketed.withColumn("_mask", F.explode(F.array(*[F.lit(m) for m in masks])))
        .select(
            F.col("id").alias("qid"),
            F.col("vec").alias("qv"),
            F.col("_bucket").bitwiseXOR(F.col("_mask")).alias("_probe"),
        )
    )
    members = bucketed.select(
        F.col("id").alias("nid"), F.col("vec").alias("nv"), "_bucket"
    )
    if salt_members > 1:
        members = members.withColumn(
            "_salt", F.pmod(F.xxhash64("nid"), F.lit(salt_members)).cast("int")
        )
        probes = probes.withColumn(
            "_salt",
            F.explode(F.array(*[F.lit(s) for s in range(salt_members)])),
        )
        group_l, group_r = ["_probe", "_salt"], ["_bucket", "_salt"]
    else:
        group_l, group_r = ["_probe"], ["_bucket"]

    def score(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if not len(lpdf) or not len(rpdf):
            return pd.DataFrame({"qid": [], "nid": [], "score": []})
        # members sorted by nid so the STABLE score argsort below
        # inherits nid-ascending tie-break — the same (score desc, nid
        # asc) order the global window uses; an order-oblivious
        # argpartition would keep an arbitrary member of a score tie
        # and make results depend on group slicing (caught by the
        # salting-invariance test: the testdata corpus has duplicate
        # embeddings, i.e. exact ties)
        rpdf = rpdf.sort_values("nid")
        # cells arrive as per-row numpy arrays (Arrow list<double>);
        # np.stack copies them C-side — `np.array(col.tolist())` would
        # round-trip every float through a Python object (measured: it
        # dominated the whole stage at 550k x 64-dim probe rows)
        q = np.stack(lpdf["qv"].to_numpy()).astype(np.float64, copy=False)
        m = np.stack(rpdf["nv"].to_numpy()).astype(np.float64, copy=False)
        qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = qn @ mn.T  # nq x nm
        qids = lpdf["qid"].to_numpy()
        nids = rpdf["nid"].to_numpy()
        # self-pairs (a query probing its own bucket) are dropped here
        sims[qids[:, None] == nids[None, :]] = -np.inf
        kk = min(k, sims.shape[1])
        top = np.argsort(-sims, axis=1, kind="stable")[:, :kk]
        rows_q = np.repeat(qids, kk)
        rows_n = nids[top.ravel()]
        rows_s = np.take_along_axis(sims, top, axis=1).ravel()
        keep = rows_s > -np.inf
        return pd.DataFrame(
            {"qid": rows_q[keep], "nid": rows_n[keep], "score": rows_s[keep]}
        )

    scored = (
        probes.groupBy(*group_l)
        .cogroup(members.groupBy(*group_r))
        .applyInPandas(score, "qid long, nid long, score double")
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("nid").asc())
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
    n_planes = _resolve_n_planes(df, n_planes, "embedding_lsh_pairs")
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
