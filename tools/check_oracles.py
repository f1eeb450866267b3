"""Local replica of the driver's correctness gate: run every
__spark_entry__.queries() entry on Spark and its oracle_sql() in DuckDB
over the same sf dir; compare row count, column names, and
order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(rows, columns):
    out = []
    for row in rows:
        d = dict(zip(columns, row))
        out.append(tuple(_norm(d[c]) for c in sorted(columns)))
    # rows may contain NULLs (e.g. rollup/cube totals) — sort None-safely
    return sorted(out, key=lambda t: tuple((v is None, str(v)) for v in t))


def _norm(v):
    import datetime
    import decimal

    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, float):
        return round(v, 9)
    return v


def main() -> int:
    import time

    import duckdb

    import __spark_entry__ as entry
    from grokspark.session import get_spark

    t_start = time.monotonic()
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # sf-scaled VALUES oracles (grok_route_counts_sf) must be built for
    # the same sf dir the Spark queries run on
    import os

    os.environ[entry.ORACLE_SF_ENV] = sf_dir

    spark = get_spark(app_name="check-oracles", cores=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entry.queries()
    t0 = time.monotonic()
    oracles = entry.oracle_sql()
    print(f"setup {time.monotonic() - t_start:6.1f}s (oracle_sql() build {time.monotonic() - t0:.1f}s)")
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            df = fn(spark, sf_dir)
            spark_cols = df.columns
            spark_rows = [tuple(r) for r in df.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL  {name}: spark error: {e}")
            continue
        t_spark = time.monotonic() - t0
        sql = oracles.get(name)
        if sql is None:
            print(f"rows  {name}: {len(spark_rows)} rows (no oracle) [spark {t_spark:.1f}s]")
            continue
        t0 = time.monotonic()
        try:
            rel = con.sql(sql)
            duck_cols = [d[0] for d in rel.description]
            duck_rows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        t_duck = time.monotonic() - t0
        problems = []
        if sorted(spark_cols) != sorted(duck_cols):
            problems.append(f"columns {sorted(spark_cols)} != {sorted(duck_cols)}")
        if len(spark_rows) != len(duck_rows):
            problems.append(f"rowcount {len(spark_rows)} != {len(duck_rows)}")
        if not problems:
            a = normalize(spark_rows, spark_cols)
            b = normalize(duck_rows, duck_cols)
            if a != b:
                diff = [x for x in a if x not in b][:3]
                diff2 = [x for x in b if x not in a][:3]
                problems.append(f"values differ; spark-only={diff} duck-only={diff2}")
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"FAIL  {name}: {'; '.join(problems)}")
        else:
            print(
                f"OK    {name}: {len(spark_rows)} rows"
                f" [spark {t_spark:.1f}s duck {t_duck:.1f}s]"
            )

    print(f"\n{len(failures)} failures  total {time.monotonic() - t_start:.1f}s")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
