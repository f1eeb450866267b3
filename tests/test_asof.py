"""as-of join: semantics vs a hand-computed truth, bucketed-path
equality, directions, tolerance, ties, and the one-shuffle plan."""

from __future__ import annotations

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from grokspark.operators.asof import asof_join

EPOCH = dt.datetime(2024, 1, 1)


def _ts(seconds: float) -> dt.datetime:
    return EPOCH + dt.timedelta(seconds=seconds)


def _frames(spark, left_rows, right_rows):
    ldf = spark.createDataFrame(
        [(i, k, _ts(t)) for i, k, t in left_rows],
        "event_id long, user_id long, ts timestamp",
    )
    rdf = spark.createDataFrame(
        [(i, k, _ts(t)) for i, k, t in right_rows],
        "event_id long, user_id long, ts timestamp",
    )
    return ldf, rdf


def _pairs(df):
    return sorted((r["event_id"], r["event_id_r"]) for r in df.collect())


def _reference(left_rows, right_rows, direction="backward", tol=None):
    """Driver-side truth: nearest right per left, max event_id ties."""
    out = []
    for li, lk, lt in left_rows:
        cands = [
            (rt, ri)
            for ri, rk, rt in right_rows
            if rk == lk
            and ((rt <= lt) if direction == "backward" else (rt >= lt))
        ]
        if tol is not None:
            cands = [(rt, ri) for rt, ri in cands if abs(lt - rt) * 1e6 <= tol]
        if not cands:
            out.append((li, None))
        elif direction == "backward":
            out.append((li, max(cands)[1]))
        else:
            rt = min(t for t, _ in cands)
            out.append((li, max(i for t, i in cands if t == rt)))
    return sorted(out)


L = [(0, 1, 10.0), (1, 1, 20.0), (2, 1, 5.0), (3, 2, 7.0), (4, 3, 1.0)]
R = [(100, 1, 10.0), (101, 1, 15.0), (102, 2, 7.5), (103, 9, 0.0),
     # two right rows at the same (key, ts): tiebreak picks 105
     (104, 1, 4.0), (105, 1, 4.0)]


def test_asof_backward_semantics_and_ties(spark):
    ldf, rdf = _frames(spark, L, R)
    got = _pairs(asof_join(ldf, rdf, on="user_id", right_tiebreak="event_id"))
    assert got == _reference(L, R)
    # the equal-ts case: left at t=10 matches the right AT t=10
    assert dict(got)[0] == 100
    # the duplicate-ts tie at t=4 resolves to the larger event_id
    assert dict(got)[2] == 105
    # unmatched left keys yield NULL right columns, row preserved
    assert dict(got)[4] is None


def test_asof_forward_and_tolerance(spark):
    ldf, rdf = _frames(spark, L, R)
    fwd = _pairs(
        asof_join(ldf, rdf, on="user_id", direction="forward",
                  right_tiebreak="event_id")
    )
    assert fwd == _reference(L, R, direction="forward")
    tol = _pairs(
        asof_join(ldf, rdf, on="user_id", right_tiebreak="event_id",
                  tolerance_micros=2_000_000)
    )
    assert tol == _reference(L, R, tol=2_000_000)
    # tolerance NULLs the match but keeps the left row
    assert len(tol) == len(L)


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_bucketed_equals_default(spark, direction):
    rng = random.Random(11)
    lrows = [(i, rng.randrange(5), rng.uniform(0, 500)) for i in range(300)]
    rrows = [(1000 + i, rng.randrange(5), rng.uniform(0, 500)) for i in range(200)]
    ldf, rdf = _frames(spark, lrows, rrows)
    base = _pairs(
        asof_join(ldf, rdf, on="user_id", direction=direction,
                  right_tiebreak="event_id")
    )
    assert base == _reference(lrows, rrows, direction=direction)
    for width in (7_000_000, 100_000_000, 10**15):
        bucketed = _pairs(
            asof_join(ldf, rdf, on="user_id", direction=direction,
                      right_tiebreak="event_id",
                      bucket_width_micros=width)
        )
        assert bucketed == base, f"width={width}"


def test_asof_default_path_single_shuffle(spark):
    ldf, rdf = _frames(spark, L, R)
    plan = (
        asof_join(ldf, rdf, on="user_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1, plan
    assert "Join" not in plan  # union-window, not a join


def test_asof_validation(spark):
    ldf, rdf = _frames(spark, L, R)
    with pytest.raises(ValueError):
        asof_join(ldf, rdf, on="user_id", direction="nearest")
    with pytest.raises(ValueError):
        asof_join(ldf, rdf, on="user_id", tolerance_micros=-1)
    with pytest.raises(ValueError):
        asof_join(ldf, rdf, on="user_id", bucket_width_micros=0)
