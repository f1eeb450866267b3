"""As-of join — attach to each left row the single nearest right row
per key (most recent at-or-before its timestamp), the temporal-join
primitive Spark's built-in joins can't express without a range
explode.  Reference has no temporal layer; semantics follow the
standard as-of contract (DuckDB `ASOF JOIN`, pandas `merge_asof`):
``direction="backward"`` matches the largest right ts <= left ts,
``"forward"`` the smallest right ts >= left ts, ties inclusive.

Dataflow (NOT a range join): tag both sides, union, and take a
running ``last(right_payload, ignorenulls=True)`` over a per-key
window ordered by (ts, side) — one shuffle on the key, no candidate
explosion, cost O(n log n) per key partition.  At equal timestamps
the right row sorts before the left row, which realizes the inclusive
bound.

100-TB shape: the default single-window path shuffles each row once
and sorts within key partitions — correct at any scale but a single
hot key serializes into one task.  ``bucket_width`` switches to the
two-pass variant: pass A runs the same window per (key, time-bucket)
— task size is bounded by rows per key-bucket, which the caller
controls via the width — and pass B as-of joins the per-bucket right
summaries (bucket-granularity rows, orders of magnitude smaller) to
produce each bucket's carry-in, coalesced under the pass-A result.
Both variants return identical rows (asserted in tests).

Determinism: among right rows sharing (key, ts) the window order is
unspecified; pass ``right_tiebreak`` (any totally-ordering column,
e.g. an event id) to pin the winner — required for cross-engine
oracle equality.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str = "ts",
    direction: str = "backward",
    tolerance_micros: int | None = None,
    suffix: str = "_r",
    right_tiebreak: str | None = None,
    bucket_width_micros: int | None = None,
) -> DataFrame:
    """Left as-of join: every left row, plus the nearest right row's
    columns (suffixed) or NULLs when no right row qualifies.

    ``tolerance_micros`` additionally requires |left.ts - right.ts|
    to be within the bound (matches outside it become NULL, the row
    is kept).  ``bucket_width_micros`` enables the bounded-task
    two-pass plan; results are identical to the default path.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if tolerance_micros is not None and tolerance_micros < 0:
        raise ValueError("tolerance_micros must be >= 0")

    # Work on a micros-since-epoch axis: integer total order, exact
    # tolerance arithmetic, and sign-flippable for direction.
    # The explicit cast admits TIMESTAMP_NTZ columns (session tz is
    # pinned to UTC in grokspark.session, so the cast is a monotone
    # identity on instants).
    def _axis(df: DataFrame) -> Column:
        t = F.unix_micros(F.col(ts).cast("timestamp"))
        return t if direction == "backward" else -t

    from pyspark.sql import types as T

    rcols = [c for c in right.columns if c != on]
    rstruct = F.struct(*[F.col(c).alias(c) for c in rcols])
    rtype = T.StructType([right.schema[c] for c in rcols])

    ltagged = left.select(
        F.col(on).alias("_k"),
        _axis(left).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast("long").alias("_tb"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        F.lit(None).cast(rtype).alias("_r"),
    )
    tb = (
        F.col(right_tiebreak).cast("long")
        if right_tiebreak
        else F.lit(0).cast("long")
    )
    rtagged = right.select(
        F.col(on).alias("_k"),
        _axis(right).alias("_t"),
        F.lit(0).alias("_side"),
        tb.alias("_tb"),
        F.lit(None).cast(ltagged.schema["_l"].dataType).alias("_l"),
        rstruct.alias("_r"),
    )
    union = ltagged.unionByName(rtagged)

    # Window order: (t, side, tiebreak). Right rows (_side=0) sort
    # before left rows at equal t -> inclusive bound; among equal
    # right rows the tiebreak's LARGEST value wins (it is the last
    # one the running window sees), matching MAX_BY semantics.
    order = [F.col("_t").asc(), F.col("_side").asc(), F.col("_tb").asc()]

    if bucket_width_micros is None:
        w = (
            Window.partitionBy("_k")
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = union.withColumn("_m", F.last("_r", ignorenulls=True).over(w))
    else:
        if bucket_width_micros <= 0:
            raise ValueError("bucket_width_micros must be > 0")
        bkt = F.floor(F.col("_t") / F.lit(int(bucket_width_micros)))
        union = union.withColumn("_b", bkt)
        # Pass A: running last WITHIN each (key, bucket) — task size
        # bounded by rows per key-bucket.
        wa = (
            Window.partitionBy("_k", "_b")
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        in_bucket = union.withColumn("_m0", F.last("_r", ignorenulls=True).over(wa))
        # Pass B: per-(key, bucket) last right row (deterministic via
        # the (t, tiebreak) struct order), then the same union-window
        # trick at BUCKET granularity gives each left bucket the last
        # summary from a strictly earlier bucket.
        summaries = (
            union.filter(F.col("_side") == 0)
            .groupBy("_k", "_b")
            .agg(F.max_by("_r", F.struct(F.col("_t"), F.col("_tb"))).alias("_s"))
        )
        lb = (
            union.filter(F.col("_side") == 1)
            .select("_k", "_b")
            .distinct()
            .withColumn("_bs", F.lit(0))
            .withColumn("_s", F.lit(None).cast(rtagged.schema["_r"].dataType))
        )
        u2 = summaries.withColumn("_bs", F.lit(1)).unionByName(lb)
        # left bucket markers (_bs=0) sort before the same bucket's
        # summary (_bs=1): carry-in sees strictly-earlier buckets only
        wb = (
            Window.partitionBy("_k")
            .orderBy(F.col("_b").asc(), F.col("_bs").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carry = (
            u2.withColumn("_c", F.last("_s", ignorenulls=True).over(wb))
            .filter(F.col("_bs") == 0)
            .select("_k", "_b", "_c")
        )
        matched = (
            in_bucket.filter(F.col("_side") == 1)
            .join(carry, ["_k", "_b"], "left")
            .withColumn("_m", F.coalesce(F.col("_m0"), F.col("_c")))
        )

    out = matched.filter(F.col("_side") == 1)
    if tolerance_micros is not None:
        # _t axis is already direction-signed: left _t - right _t >= 0
        # for any match, in both directions.
        lag = F.col("_t") - F.unix_micros(F.col(f"_m.{ts}").cast("timestamp")) * (
            1 if direction == "backward" else -1
        )
        out = out.withColumn(
            "_m",
            F.when(lag <= F.lit(int(tolerance_micros)), F.col("_m")),
        )
    return out.select(
        *[F.col(f"_l.{c}").alias(c) for c in left.columns],
        *[F.col(f"_m.{c}").alias(c + suffix) for c in rcols],
    )
