"""Deterministic distinct-count sketching: K-minimum-values (KMV).

Approximate distinct counts at 10^12 scale normally reach for
HyperLogLog (``F.approx_count_distinct``) — available, but its
estimate is engine-internal and not reproducible in an external
oracle. KMV (Bar-Yossef et al.) gives the same O(k) memory / one-pass
shape with a FULLY DETERMINISTIC estimate both Spark and DuckDB can
compute bit-for-bit from md5: keep the k smallest distinct 48-bit
hash values; if fewer than k distinct hashes exist the count is exact,
else estimate (k-1) / R_k where R_k = kth_min / 2^48. Relative error
~1/sqrt(k-2).

Cross-engine exactness: md5 is identical everywhere; the 48-bit prefix
fits a signed 64-bit int; and the estimate is ONE double division of
two exactly-representable values ((k-1)*2^48 has <= 53 significant
bits for k <= 2^20), so the driver oracle compares it exactly — no
tolerance band.

Scale shape: hash + distinct + global top-k — the distinct's partial
aggregation collapses duplicates map-side, and the k-smallest
selection is a TakeOrdered over k values per partition; nothing wide
shuffles. The sketch is mergeable (union the hash sets, re-take k),
which is what makes it a sketch and not just a sample.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["kmv_distinct", "KMV_SPACE_BITS"]

KMV_SPACE_BITS = 48


def kmv_hash_col(col: str):
    """48-bit uniform hash of a column: first 12 hex chars of md5 of
    the value's string form — reproducible in any engine with md5."""
    return F.conv(
        F.substring(F.md5(F.col(col).cast("string")), 1, 12), 16, 10
    ).cast("long")


def kmv_distinct(df: DataFrame, col: str, k: int = 256) -> DataFrame:
    """One-row distinct-count sketch of ``col``:
    ``(n_used, kth_hash, estimate)``.

    - ``n_used`` < k: every distinct hash fit in the sketch — the
      estimate IS the exact distinct count (as a double).
    - ``n_used`` = k: estimate = (k-1) * 2^48 / kth_hash, standard
      KMV, relative error ~1/sqrt(k-2)."""
    if not 2 <= k <= (1 << 20):
        raise ValueError(f"k must be in [2, 2^20], got {k}")
    space = 1 << KMV_SPACE_BITS
    mins = (
        df.select(kmv_hash_col(col).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
    )
    return mins.agg(
        F.count(F.lit(1)).alias("n_used"),
        F.max("h").alias("kth_hash"),
    ).select(
        "n_used",
        "kth_hash",
        F.when(F.col("n_used") < k, F.col("n_used").cast("double"))
        .otherwise(
            F.lit(float((k - 1) * space)) / F.col("kth_hash").cast("double")
        )
        .alias("estimate"),
    )
