"""Driver-contract static checks: the invariants the correctness gate
relies on, testable without running Spark queries — every queries()
entry must have an oracle_sql() entry, and every oracle must at least
parse/plan in DuckDB against the registered views (catches SQL typos
and schema drift long before the full sweep)."""

from __future__ import annotations

from pathlib import Path

import duckdb
import pytest

import __spark_entry__ as entry

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
SF_DIR = "/root/testdata/sf0.01"


def test_every_query_has_an_oracle_and_vice_versa():
    qs = set(entry.queries())
    oracles = set(entry.oracle_sql())
    assert qs == oracles, (
        f"queries without oracle: {sorted(qs - oracles)}; "
        f"oracles without query: {sorted(oracles - qs)}"
    )


def test_entry_callable_and_query_signatures():
    qs = entry.queries()
    assert callable(entry.entry)
    assert len(qs) >= 40
    for name, fn in qs.items():
        assert callable(fn), name


@pytest.mark.skipif(not Path(SF_DIR).exists(), reason="driver testdata absent")
def test_all_oracle_sql_parses_in_duckdb():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    for name, sql in entry.oracle_sql().items():
        assert sql and sql.strip(), name
        try:
            con.sql(f"EXPLAIN {sql}")
        except Exception as e:  # noqa: BLE001
            raise AssertionError(f"oracle {name} failed to plan: {e}") from e
