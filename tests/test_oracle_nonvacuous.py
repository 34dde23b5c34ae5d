"""Guard against vacuous driver passes (round-4 verdict finding #2).

Round 4's ``facet_prefix_offset_page`` filtered on a prefix that matched
nothing in the fixture corpus, so the driver compared 0 rows to 0 rows and
recorded a green — but vacuous — CORRECTNESS row.  Round 2's
``dedup_exact_groups`` did the same (the fixture corpus has no exact
duplicates).  This guard runs every registry entry's DuckDB oracle at the
driver's sf0.01 tier (DuckDB only — cheap, no Spark) and asserts it
returns at least one row, so an entry whose predicate silently stops
matching fixture data can never ship as "green" again.

Entries where emptiness IS the semantics are allowlisted with a reason.
"""

from __future__ import annotations

import duckdb
import pytest

from sparklucene.driver_queries import TABLES, registry

SF_DIR = "/root/testdata/sf0.01"

#: emptiness is the documented semantics of these entries, not a fixture
#: accident — each asserts that a query correctly matches NOTHING.
EMPTY_IS_SEMANTICS = {
    # conjunctive query with a term absent from the corpus: MUST match
    # no documents (tests the AND short-circuit path).
    "bm25_and_missing_term",
}

ORACLE_ENTRIES = sorted(
    (name, sql) for name, (_fn, sql) in registry().items() if sql is not None
)


@pytest.fixture(scope="module")
def con() -> duckdb.DuckDBPyConnection:
    import os

    c = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return c


@pytest.mark.parametrize("name,sql", ORACLE_ENTRIES,
                         ids=[n for n, _ in ORACLE_ENTRIES])
def test_oracle_returns_rows(con, name, sql):
    n = len(con.execute(sql).fetchall())
    if name in EMPTY_IS_SEMANTICS:
        assert n == 0, (f"{name} is allowlisted as empty-by-semantics but "
                        f"returned {n} rows — update EMPTY_IS_SEMANTICS")
    else:
        assert n > 0, (f"{name}'s oracle returned 0 rows at {SF_DIR}: the "
                       "driver comparison would be vacuous (0 == 0). Point "
                       "the entry at data that exists in the fixture, or "
                       "allowlist it with a reason if emptiness is the "
                       "semantics.")
