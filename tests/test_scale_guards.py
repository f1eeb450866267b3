"""Occupancy-guard behavior at realistic corpus sizes: auto-sizing
must choose more hyperplanes as the corpus grows (the expected-bucket-
population invariant), and the guard must warn when an explicit plane
count would leave buckets quadratic-join-sized."""

from __future__ import annotations

import warnings

import pytest
from pyspark.sql import functions as F


def _vec_df(spark, n: int, dim: int = 8):
    # xxhash-uniform features: decorrelated dims -> buckets spread
    # (sin(id*13+i) traces a 1-D curve and collapses the bucket space)
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            lambda i: F.pmod(F.xxhash64(F.col("id"), i), F.lit(1_000_000))
            .cast("double")
            / 1_000_000.0
            - 0.5,
        ).alias("embedding"),
    )


def test_auto_sizing_grows_with_corpus(spark):
    from grokspark.operators.similarity import (
        _resolve_n_planes,
        recommended_n_planes,
    )

    small, large = _vec_df(spark, 5_000), _vec_df(spark, 50_000)
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # auto-sizing must never warn
        p_small = _resolve_n_planes(small, None, "test")
        p_large = _resolve_n_planes(large, None, "test")
    assert p_small == recommended_n_planes(5_000) == 3
    assert p_large == recommended_n_planes(50_000) == 6
    assert p_small < p_large
    # explicit values pass through untouched (and unscanned)
    assert _resolve_n_planes(small, 11, "test") == 11


def test_knn_join_auto_sized_runs_at_10x(spark):
    """End-to-end: knn_join with n_planes=None on a 50k-vector corpus
    (10x the sf0.1 embeddings rowcount per probe design) — the
    auto-sized bucket join must complete and return k neighbors per
    queried id."""
    from grokspark.operators import knn_join

    df = _vec_df(spark, 50_000).localCheckpoint()
    out = knn_join(df, k=3, n_planes=None, probe_hamming=0)
    sample = out.filter(F.col("vec_id") < 100)
    counts = sample.groupBy("vec_id").count().collect()
    assert counts, "no neighbors at all — bucketing broke"
    assert all(r["count"] <= 3 for r in counts)


def test_knn_join_blocked_matches_fold_path(spark, sf_dir):
    """knn_join_blocked (cogrouped bucket-local matmul) must agree with
    knn_join (per-candidate fold scoring) on the real embeddings table:
    same candidate rule, so identical neighbor sets per query; scores
    equal to within summation-order ulps."""
    from grokspark.operators import knn_join, knn_join_blocked

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").localCheckpoint()
    a = knn_join(emb, k=3, n_planes=6, probe_hamming=1).collect()
    b = knn_join_blocked(emb, k=3, n_planes=6, probe_hamming=1).collect()

    def by_query(rows):
        out: dict = {}
        for r in rows:
            out.setdefault(r["vec_id"], []).append(
                (r["rank"], r["neighbor_id"], r["score"])
            )
        return {q: sorted(v) for q, v in out.items()}

    qa, qb = by_query(a), by_query(b)
    assert qa.keys() == qb.keys()
    for q in qa:
        for (ra, na, sa), (rb, nb, sb) in zip(qa[q], qb[q]):
            assert (ra, na) == (rb, nb), (q, qa[q], qb[q])
            assert abs(sa - sb) < 1e-9


def test_knn_blocked_member_salting_is_result_invariant(spark, sf_dir):
    """salt_members only changes group fan-out (skew control): the
    returned (query, neighbor, rank) triples must be identical for any
    S; scores agree to within BLAS-blocking ulps (matmul vectorization
    depends on matrix shape, so the last bit can differ)."""
    from grokspark.operators import knn_join_blocked

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").localCheckpoint()
    base = sorted(
        (r["vec_id"], r["neighbor_id"], r["rank"], r["score"])
        for r in knn_join_blocked(emb, k=3, n_planes=5, probe_hamming=1).collect()
    )
    salted = sorted(
        (r["vec_id"], r["neighbor_id"], r["rank"], r["score"])
        for r in knn_join_blocked(
            emb, k=3, n_planes=5, probe_hamming=1, salt_members=4
        ).collect()
    )
    assert [t[:3] for t in base] == [t[:3] for t in salted]
    for (*_, sa), (*_, sb) in zip(base, salted):
        assert abs(sa - sb) < 1e-9


def test_overfull_warning_fires_for_undersized_explicit_planes():
    from grokspark.operators.similarity import (
        MAX_BUCKET_ROWS,
        _warn_if_buckets_overfull,
    )

    with pytest.warns(UserWarning, match="quadratic"):
        _warn_if_buckets_overfull(MAX_BUCKET_ROWS * 8, 2, "op")
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        _warn_if_buckets_overfull(MAX_BUCKET_ROWS * 8, 8, "op")
