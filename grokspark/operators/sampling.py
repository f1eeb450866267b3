"""Deterministic splitting & sampling — the bookkeeping ops every
training-data pipeline runs last.

Both assign rows by a uniform 48-bit md5-prefix hash of a SALTED id
(same cross-engine-reproducible hash family as the KMV sketch), so:

- assignments are a pure function of the id — stable under reruns,
  repartitioning, and incremental corpus growth (a doc keeps its split
  forever; new docs land i.i.d.), unlike ``DataFrame.randomSplit``
  whose output depends on partitioning;
- distinct salts decorrelate different uses (the sample of the train
  split is unbiased);
- thresholds are exact integers (weights quantized to parts-per-
  million, threshold = SPACE * ppm // 10^6 in arbitrary-precision
  Python), so the DuckDB oracle reproduces every assignment
  bit-for-bit — no float boundary ambiguity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from grokspark.operators.sketches import KMV_SPACE_BITS

__all__ = ["hash_split", "hash_sample", "split_thresholds"]

_SPACE = 1 << KMV_SPACE_BITS
_PPM = 1_000_000


def _salted_hash(id_col: str, salt: str) -> Column:
    return F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))),
            1,
            12,
        ),
        16,
        10,
    ).cast("long")


def split_thresholds(weights: dict[str, float]) -> list[tuple[str, int]]:
    """(label, exclusive upper hash bound) pairs in declaration order.
    Weights are quantized to ppm and must sum to 1 (+-1e-6)."""
    ppms = {k: round(w * _PPM) for k, w in weights.items()}
    total = sum(ppms.values())
    if abs(total - _PPM) > 1:
        raise ValueError(f"weights must sum to 1, got {total / _PPM}")
    out = []
    acc = 0
    for label, ppm in ppms.items():
        acc += ppm
        out.append((label, _SPACE * acc // _PPM))
    # guard against ppm rounding leaving a sliver of unassigned space
    out[-1] = (out[-1][0], _SPACE)
    return out


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Adds a ``split`` label column assigning each row to one of the
    ``weights`` keys by salted id hash — deterministic, partition-
    independent, stable under corpus growth."""
    h = _salted_hash(id_col, salt)
    expr = None
    for label, bound in split_thresholds(weights):
        cond = h < F.lit(bound)
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
    return df.withColumn("split", expr)


def hash_sample(
    df: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Deterministic ~``fraction`` sample by salted id hash: the SAME
    rows are kept on every run and on any cluster layout, and samples
    at different fractions nest (a 1% sample is a subset of the 10%
    one — same salt, larger threshold)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    bound = _SPACE * round(fraction * _PPM) // _PPM
    return df.filter(_salted_hash(id_col, salt) < F.lit(bound))
